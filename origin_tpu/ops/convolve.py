"""FFT-based convolutions on device.

The reference uses scipy.signal.fftconvolve per spectral channel inside a
joblib process pool (lib_origin.py:1027-1066).  Here the whole cube is
convolved in one batched device call: 2-D real FFTs over the spatial axes
(one independent kernel per channel for the wavelength-dependent FSF), and
1-D real FFTs over the spectral axis for the line-profile matched filter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy.fft import next_fast_len

__all__ = ["fftconvolve2d_same", "next_fast_len", "fft2_shape"]


def next_smooth(n, factors=(2, 3, 5)):
    """Smallest integer >= n whose prime factors are all in ``factors``.

    The TPU FFT slows down sharply on sizes with a factor of 7 (which
    scipy's next_fast_len allows), so convolution paddings here are kept
    5-smooth.
    """
    n = int(n)
    while True:
        m = n
        for f in factors:
            while m % f == 0:
                m //= f
        if m == 1:
            return n
        n += 1


def fft2_shape(shape_img, shape_kern):
    """TPU-friendly padded FFT shape for a linear 2-D convolution."""
    return tuple(
        next_smooth(int(a) + int(b) - 1)
        for a, b in zip(shape_img, shape_kern)
    )


@partial(jax.jit, static_argnames=("fshape",))
def fftconvolve2d_same(cube, kern, fshape):
    """'same' linear convolution of each channel with its own 2-D kernel.

    Parameters
    ----------
    cube : (..., Ny, Nx)
    kern : (..., Ph, Pw) broadcastable against cube's leading axes
    fshape : tuple
        Padded FFT shape, must be >= (Ny+Ph-1, Nx+Pw-1).
    """
    ny, nx = cube.shape[-2:]
    ph, pw = kern.shape[-2:]
    cf = jnp.fft.rfft2(cube, fshape)
    kf = jnp.fft.rfft2(kern, fshape)
    full = jnp.fft.irfft2(cf * kf, fshape)
    y0 = (ph - 1) // 2
    x0 = (pw - 1) // 2
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(full, y0, y0 + ny, axis=-2), x0, x0 + nx, axis=-1
    )
