"""Double-float (df) arithmetic toolkit for f32-only hardware.

A df value is an (hi, lo) pair of f32 arrays with value hi + lo and
|lo| <= ulp(hi)/2 — ~2^-45 effective relative precision for the EFT
arithmetic (add/mul/div/sqrt; the transcendental df_log/df_exp carry
their own ~1e-9 budgets, documented per function).  Built from the
classic error-free transforms (Knuth TwoSum, Dekker split products), all
branch-free, vectorized, and XLA/Mosaic-lowerable.  Used by the precise
evaluation path (ops/precise_eval.py) and the double-float system assembly
(ops/assemble.assemble_system_df) that growing-kernel fits refine against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from facedeform_tpu.config import RBFKernel
from facedeform_tpu.ops.kernels import apply_kernel

# Shorthand: the EFT guard, pinning rounding-critical intermediates as
# opaque values against exact-arithmetic rewrites.
#
# Compiler-interference findings (measured, this machine):
#   * XLA:TPU preserves the transforms exactly — a jitted df chain matches
#     eager to 1e-14 relative.  The production path is sound.
#   * XLA:CPU strips stablehlo.optimization_barrier early AND its fusion
#     pass REMATERIALIZES cheap producers (p = a*b) inside consumer
#     fusions directly from the raw operands, where LLVM then contracts
#     mul+add into FMA.  The re-rounded duplicate no longer equals the
#     p whose rounding error the transform compensates, costing up to one
#     f32 ulp of the df value (measured: an isolated two-op chain at
#     5.9e-8 relative vs 1e-14 eager).  No public flag disables the
#     rematerialization (xla_cpu_enable_fast_math already defaults false).
# Consequence: on CPU the df machinery is ~1 ulp accurate rather than
# exact; the end-to-end growing-kernel parity suite (tests/test_precise)
# still passes the 5e-5 displacement budget on CPU and enforces it in CI,
# and full df accuracy holds on the TPU target.  The barriers stay: they
# are free, and compilers that honor them get the exact behavior.
#
# Pallas/Mosaic has no optimization_barrier lowering; kernels wrap their
# body in `with no_barrier():` (Mosaic preserves the transforms without
# guards — verified on hardware, see tests/test_precise).
import contextlib as _contextlib
import threading as _threading

_tls = _threading.local()


def _ob(x):
    if getattr(_tls, "off", False):
        return x
    return jax.lax.optimization_barrier(x)


@_contextlib.contextmanager
def no_barrier():
    """Trace-time switch: make the EFT guards identity (Pallas kernels)."""
    prev = getattr(_tls, "off", False)
    _tls.off = True
    try:
        yield
    finally:
        _tls.off = prev


def _split_hi(a: jnp.ndarray) -> jnp.ndarray:
    """Dekker split: high part of `a` with the low 12 mantissa bits zeroed,
    so hi*hi products of two split operands are exact in f32."""
    bits = jax.lax.bitcast_convert_type(a, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFFF000), jnp.float32
    )

_LN2_HI = 0.6931381225585938      # exactly representable split of ln 2
_LN2_LO = 9.058047490547385e-06
_SQRT2 = 1.4142135623730951


# ------------------------------------------------------------ df primitives
def _two_sum(a, b):
    """Exact a + b = s + e (Knuth, branch-free)."""
    s = _ob(a + b)
    bb = _ob(s - a)
    t1 = _ob(s - bb)
    return s, (a - t1) + (b - bb)


def _quick_two_sum(a, b):
    """Exact a + b = s + e assuming |a| >= |b|."""
    s = _ob(a + b)
    t = _ob(s - a)
    return s, b - t


def _two_prod(a, b):
    """Exact a * b = p + e via Dekker splits (no FMA dependence)."""
    # Mosaic's bitcast needs vector operands: promote python/0-d scalars
    # to the broadcast shape before the splits.
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim != b.ndim or a.shape != b.shape:
        a, b = jnp.broadcast_arrays(a, b)
    p = _ob(a * b)
    ah = _split_hi(a)
    al = a - ah
    bh = _split_hi(b)
    bl = b - bh
    d = _ob(ah * bh - p)  # guarded: cancellation carries the error bits
    e = (d + ah * bl + al * bh) + al * bl
    return p, e


def df(hi, lo=None):
    hi = jnp.asarray(hi, jnp.float32)
    return (hi, jnp.zeros_like(hi) if lo is None else jnp.asarray(lo, jnp.float32))


def df_add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    return _quick_two_sum(s, e)


def df_sub(x, y):
    return df_add(x, (-y[0], -y[1]))


def df_mul(x, y):
    p, e = _two_prod(x[0], y[0])
    e = e + (x[0] * y[1] + x[1] * y[0])
    return _quick_two_sum(p, e)


def df_mul_f32(x, c):
    p, e = _two_prod(x[0], c)
    e = e + x[1] * c
    return _quick_two_sum(p, e)


def df_div(x, y):
    """x / y to ~u^2: f32 quotient + one Newton-style correction."""
    q0 = x[0] / y[0]
    # r = x - q0 * y, exactly-ish in df
    q0y = df_mul_f32(y, q0)
    r = df_sub(x, q0y)
    q1 = (r[0] + r[1]) / y[0]
    return _quick_two_sum(q0, q1)


def df_recip(y):
    return df_div(df(jnp.ones_like(y[0])), y)


def df_sqrt(x):
    """sqrt(x) to ~u^2 for x >= 0: f32 root + one Heron correction."""
    y0 = jnp.sqrt(jnp.maximum(x[0], 0.0))
    y0y0 = _two_prod(y0, y0)
    r = df_sub(x, y0y0)
    safe = jnp.maximum(y0, 1e-30)
    corr = (r[0] + r[1]) / (2.0 * safe)
    hi, lo = _quick_two_sum(y0, corr)
    zero = x[0] <= 0.0
    return jnp.where(zero, 0.0, hi), jnp.where(zero, 0.0, lo)


def df_log(x):
    """ln(x) to ~1e-9 relative for strictly positive f32-ranged x.

    ln(hi + lo) = ln(hi) + ln(1 + lo/hi) ~= ln_df(hi) + lo/hi.
    ln_df(hi): reduce hi = m * 2^e with m in [sqrt2/2, sqrt2); m - 1 is
    EXACT in f32 (Sterbenz, 0.5 <= m <= 2), m + 1 via TwoSum; then
    ln m = 2 atanh(t), t = (m-1)/(m+1): the 2t main term in df, the odd
    series tail (|t| < 0.172 -> tail < 1e-2 of ln m) in f32.

    Accuracy budget (round-5 review corrected an earlier ~1e-14 claim):
    the truncated series' worst term is 2t^15/15 ~ 1e-12 relative at the
    reduction boundary, and the F32 tail arithmetic itself rounds at
    ~eps32 * t^2/3 ~ 1e-9 relative — the honest floor.  That is ~100x
    better than hardware log (3.6e-4) and two orders below the df TPS
    phi budget that consumes it; callers needing more would have to
    carry the tail in df.
    """
    hi = x[0]
    bits = jax.lax.bitcast_convert_type(hi, jnp.uint32)
    e = (jnp.right_shift(bits, jnp.uint32(23)) & jnp.uint32(0xFF)).astype(
        jnp.int32
    ) - 127
    m = jax.lax.bitcast_convert_type(
        (bits & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x3F800000), jnp.float32
    )
    big = m > _SQRT2
    m = jnp.where(big, 0.5 * m, m)  # exact (exponent shift)
    e = e + big.astype(jnp.int32)
    num = df(m - 1.0)               # exact by Sterbenz
    den = _two_sum(m, jnp.ones_like(m))
    t = df_div(num, den)
    t2 = t[0] * t[0]
    # odd-series tail in f32 through the t^13 term (the t^9 truncation
    # left a 2e-9 relative bias at the reduction boundary — above the
    # f32 tail's own ~1e-9 rounding floor; two more terms push the
    # truncation to ~1e-12, below it)
    tail = (2.0 * t[0]) * t2 * (
        jnp.float32(1.0 / 3.0)
        + t2 * (
            jnp.float32(1.0 / 5.0)
            + t2 * (
                jnp.float32(1.0 / 7.0)
                + t2 * (
                    jnp.float32(1.0 / 9.0)
                    + t2 * (
                        jnp.float32(1.0 / 11.0)
                        + t2 * jnp.float32(1.0 / 13.0)
                    )
                )
            )
        )
    )
    log_m = df_add(df_mul_f32(t, 2.0), df(tail))
    ef = e.astype(jnp.float32)
    e_ln2 = df_add(df(ef * _LN2_HI), df(ef * jnp.float32(_LN2_LO)))
    out = df_add(e_ln2, log_m)
    # + lo/hi correction for the df argument
    return df_add(out, df(x[1] / jnp.maximum(hi, 1e-38)))


# ------------------------------------------------------------------ phi df
def _phi_df(kernel: RBFKernel, s):
    """phi((r/eps)^2) in double-float, s a df pair (any shape)."""
    kernel = RBFKernel(kernel)
    if kernel == RBFKernel.THIN_PLATE:
        tiny = s[0] <= 1e-30
        safe = (jnp.maximum(s[0], 1e-30), jnp.where(tiny, 0.0, s[1]))
        out = df_mul_f32(df_mul(safe, df_log(safe)), 0.5)
        return jnp.where(tiny, 0.0, out[0]), jnp.where(tiny, 0.0, out[1])
    if kernel == RBFKernel.MULTIQUADRIC:
        return df_sqrt(df_add(df(jnp.ones_like(s[0])), s))
    if kernel == RBFKernel.LINEAR:
        return df_sqrt(s)
    if kernel == RBFKernel.CUBIC:
        return df_mul(s, df_sqrt(s))
    # Decaying kernels have no cancellation cliff; f32 phi promoted to df
    # keeps this path total (used when callers force backend="dense_precise").
    return df(apply_kernel(kernel, s[0] * 1.0, 1.0))


def _sqdist_df(pts, ctrl_blk):
    """Pairwise squared distances (c, B) in double-float, exact diffs."""
    d2 = df(jnp.zeros((pts.shape[0], ctrl_blk.shape[0]), jnp.float32))
    for k in range(3):
        dx, e = _two_sum(pts[:, k:k + 1], -ctrl_blk[None, :, k])
        sq = df_mul((dx, e), (dx, e))
        d2 = df_add(d2, sq)
    return d2


def _df_sum_axis0(hi, lo):
    """Compensated pairwise-tree sum of a df array over axis 0."""
    while hi.shape[0] > 1:
        n = hi.shape[0]
        if n % 2:
            pad = [(0, 1)] + [(0, 0)] * (hi.ndim - 1)
            hi = jnp.pad(hi, pad)
            lo = jnp.pad(lo, pad)
        s, e = _two_sum(hi[0::2], hi[1::2])
        hi, lo = s, lo[0::2] + lo[1::2] + e
    return hi[0], lo[0]


