from origin_tpu.core.containers import Cube, Image, Spectrum  # noqa: F401
from origin_tpu.core.coords import WCS, WaveCoord  # noqa: F401
