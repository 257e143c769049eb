"""Pipeline orchestration: the Step framework and the ORIGIN session."""

from .session import ORIGIN
from .spectra_io import load_spectra, save_spectra
from .steps import STEPS, Status, Step

__all__ = ["ORIGIN", "STEPS", "Status", "Step", "load_spectra", "save_spectra"]
