"""Matmul-precision helpers shared by the fused Pallas GLR kernels.

Mosaic lowers only DEFAULT/HIGHEST dot precision, so XLA's 3-pass bf16
scheme (``Precision.HIGH``) is emulated by operand splitting: each float32
operand a is decomposed into bf16 high/low halves (a = ah + al to bf16
round-off) and ``a @ b ~ ah@bh + ah@bl + al@bh`` — half the MXU passes of
HIGHEST at ~1e-5 relative error through the GLR chains (the dropped al@bl
term is O(eps^2)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["make_dot", "split_bf16"]


def split_bf16(a):
    """Split float32 ``a`` into (high, low) bf16 halves."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def make_dot(precision):
    """Return ``(sp, d3)`` for a kernel body at the given precision.

    ``sp(a)`` prepares an operand (split once, reuse everywhere);
    ``d3(sp_a, sp_b)`` contracts the last axis of a with the first of b.
    For the string ``"bf16x3"`` the pair implements the emulated 3-pass
    scheme; for a :class:`jax.lax.Precision` it is a plain dot.
    """
    if precision == "bf16x3":
        sp = split_bf16

        def d3(ap, bp):
            d = lambda u, v: jax.lax.dot_general(
                u, v, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32,
            )
            return d(ap[0], bp[0]) + d(ap[0], bp[1]) + d(ap[1], bp[0])
    else:
        sp = lambda a: (a,)

        def d3(ap, bp):
            return jax.lax.dot_general(
                ap[0], bp[0], (((1,), (0,)), ((), ())),
                precision=precision, preferred_element_type=jnp.float32,
            )
    return sp, d3
