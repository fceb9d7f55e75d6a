"""Accurate f32 transcendentals for TPU.

The TPU VPU's hardware approximations are fast but loose — measured on
v5e against f64 (see CLAUDE.md):

    jnp.exp   ~5e-6  relative      jnp.sqrt/rsqrt  ~1.5e-7 (fine)
    jnp.log   ~3.6e-4 relative     jnp.tanh        ~8e-5

3.6e-4 in log is fatal for thin-plate-spline parity (phi = 0.5 s log s
feeds the interpolation SYSTEM, and solve conditioning amplifies assembly
error well past the 5e-5 displacement budget).  These replacements use
classic bit-level argument reduction + short polynomials, cost ~10 VPU ops,
reach ~2 ulp, and lower cleanly in both XLA and Pallas/Mosaic.

exp is provided for completeness / tighter-budget users; the default
pipeline keeps hardware exp (5e-6 relative on phi <= 1 stays well inside
budget) and wires precise_log into the thin-plate path only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Plain python floats: jnp constants at module scope would be captured as
# tracer constants inside pallas kernels (pallas_call rejects those).
_LN2_HI = 0.6931381225585938      # high bits of ln 2 (exactly f32)
_LN2_LO = 9.058047490547385e-06   # ln 2 - _LN2_HI
_INV_LN2 = 1.4426950408889634
_SQRT2 = 1.4142135623730951


def precise_log(x: jnp.ndarray) -> jnp.ndarray:
    """~2-ulp f32 natural log for strictly positive finite inputs.

    Reduction: x = m * 2^e with m in [sqrt(2)/2, sqrt(2)), then
    log(m) = 2 atanh(t) with t = (m-1)/(m+1) via a 5-term odd series
    (t^2 < 0.03 -> truncation ~1e-9).  e * ln2 is applied with a split
    constant so large exponents don't swamp the mantissa part.
    """
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    e = (jnp.right_shift(bits, jnp.uint32(23)) & jnp.uint32(0xFF)).astype(
        jnp.int32
    ) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x3F800000), jnp.float32
    )  # mantissa in [1, 2)
    big = m > _SQRT2
    m = jnp.where(big, 0.5 * m, m)
    e = e + big.astype(jnp.int32)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    p = 1.0 + t2 * (
        jnp.float32(1.0 / 3.0)
        + t2 * (
            jnp.float32(1.0 / 5.0)
            + t2 * (jnp.float32(1.0 / 7.0) + t2 * jnp.float32(1.0 / 9.0))
        )
    )
    log_m = 2.0 * t * p
    ef = e.astype(jnp.float32)
    return ef * _LN2_HI + (ef * _LN2_LO + log_m)


def precise_exp(x: jnp.ndarray) -> jnp.ndarray:
    """~2-ulp f32 exp for |x| within the normal range.

    Reduction: x = k ln2 + r with k = round(x / ln2), |r| <= ln2/2; exp(r)
    by a degree-6 Taylor/minimax-ish polynomial (truncation ~4e-10); 2^k
    applied by exponent-field addition.
    """
    x = x.astype(jnp.float32)
    k = jnp.round(x * _INV_LN2)
    r = (x - k * _LN2_HI) - k * _LN2_LO
    # Horner over exp(r) = 1 + r (1 + r/2 (1 + r/3 (...)))
    p = 1.0 + r * (
        1.0 + r * (
            jnp.float32(0.5) + r * (
                jnp.float32(1.0 / 6.0) + r * (
                    jnp.float32(1.0 / 24.0) + r * (
                        jnp.float32(1.0 / 120.0) + r * jnp.float32(1.0 / 720.0)
                    )
                )
            )
        )
    )
    ki = jnp.clip(k, -126.0, 127.0).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        jnp.left_shift((ki + 127).astype(jnp.uint32), jnp.uint32(23)), jnp.float32
    )
    out = p * scale
    # flush to 0 below the normal range (gaussian tails)
    return jnp.where(x < -87.0, 0.0, out)
