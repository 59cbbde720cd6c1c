"""Pallas TPU kernel for batched Montgomery multiplication (f32 digits).

The XLA path (`field.limb.mont_mul`) expresses one 254-bit multiply as a
few hundred HLO ops on (..., 32)-shaped arrays; under big fan-out (NTT
stages, MSM point adds) that costs compile time and leaves the minor
dimension at 32 of 128 lanes.  This kernel runs the whole separated-SOS
Montgomery pipeline in VMEM on a *lane-major* layout:

    digits on the sublane axis, batch on the 128-wide lane axis —
    a_ref[i, :] is digit i of a whole tile of elements.

Everything is float32: 8-bit digits make every partial product (< 2^16)
and every 32-term accumulation (< 2^21) exact, and f32 multiplies run at
the full VPU rate (the TPU has no native 32-bit integer multiplier).
Carries ripple once over the digit rows with exact floor-splits —
sequential but tiny, since the batch axis is the vector axis.

API: `mont_mul_pallas(ctx, a, b)` — drop-in for `limb.mont_mul` on 2-D
inputs (N, L).  interpret=True runs the kernel body on plain arrays via
_EmuRef (the CPU test harness detaches the TPU platform, which breaks
pallas interpret mode itself — so the pallas_call below always runs
compiled, never interpreted).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..field import params
from ..field.limb import MontCtx

L = params.NUM_LIMBS          # 32 digits
BASE = float(1 << params.LIMB_BITS)
INV_BASE = 1.0 / BASE
TILE = 512  # batch elements per kernel instance (lane axis)


def _ripple(digits, start=0.0):
    """Sequential exact carry ripple over a list of f32 digit rows."""
    out = []
    carry = start
    for v in digits:
        v = v + carry
        carry = jnp.floor(v * INV_BASE)
        out.append(v - carry * BASE)
    return out, carry


def _kernel_body(p_limbs, nprime_limbs, pcomp_limbs, a_ref, b_ref, o_ref):
    a = [a_ref[i, :] for i in range(L)]
    b = [b_ref[i, :] for i in range(L)]
    zero = jnp.zeros_like(a[0])

    # t = a * b (2L digit rows, values < 2^21: exact f32)
    t = [zero for _ in range(2 * L)]
    for i in range(L):
        ai = a[i]
        for j in range(L):
            t[i + j] = t[i + j] + ai * b[j]
    t, _ = _ripple(t)

    # m = t_lo * (-p^-1 mod R) mod R
    m = [zero for _ in range(L)]
    for i in range(L):
        ti = t[i]
        for j in range(L - i):
            m[i + j] = m[i + j] + ti * nprime_limbs[j]
    m, _ = _ripple(m)

    # s = t + m * p; low L digits become zero; result is s[L:2L]
    s = list(t)
    for i in range(L):
        mi = m[i]
        for j in range(L):
            s[i + j] = s[i + j] + mi * p_limbs[j]
    s, _ = _ripple(s)
    res = s[L:2 * L]

    # conditional subtract p: add the precomputed 2^256 - p digits; the
    # final carry is 1 exactly when res >= p
    cur, ge = _ripple([res[k] + pcomp_limbs[k] for k in range(L)])
    take_sub = ge > 0.5
    for k in range(L):
        o_ref[k, :] = jnp.where(take_sub, cur[k], res[k])


class _EmuRef:
    """Minimal pallas Ref emulation so the kernel body can run on plain
    arrays (the CPU test harness detaches the TPU platform, which breaks
    even *importing* jax.experimental.pallas there)."""

    def __init__(self, arr):
        self.arr = arr

    def __getitem__(self, key):
        return self.arr[key]

    def __setitem__(self, key, value):
        self.arr = self.arr.at[key].set(value)


def mont_mul_pallas(ctx: MontCtx, a: jnp.ndarray, b: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Batched Montgomery multiply via the Pallas kernel.

    a, b: (N, L) f32 digit vectors in Montgomery form; padded to TILE
    internally.  Returns (N, L).  interpret=True runs the kernel body on
    plain arrays (CPU harness; no pallas import)."""
    n = a.shape[0]
    pad = (-n) % TILE
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, L), a.dtype)])
        b = jnp.concatenate([b, jnp.zeros((pad, L), b.dtype)])
    at = a.T  # (L, N) lane-major
    bt = b.T

    p_limbs = [float(x) for x in ctx.p_np]
    np_limbs = [float(x) for x in params.to_limbs(ctx.nprime_int)]
    pc_limbs = [float(x)
                for x in params.to_limbs((1 << 256) - ctx.p)]

    kernel = partial(_kernel_body, p_limbs, np_limbs, pc_limbs)
    if interpret:
        o_ref = _EmuRef(jnp.zeros(at.shape, at.dtype))
        kernel(_EmuRef(at), _EmuRef(bt), o_ref)
        res = o_ref.arr.T
        return res[:n] if pad else res

    from jax.experimental import pallas as pl

    grid = (at.shape[1] // TILE,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(at.shape, at.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, TILE), lambda i: (0, i)),
            pl.BlockSpec((L, TILE), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((L, TILE), lambda i: (0, i)),
    )(at, bt)
    res = out.T
    return res[:n] if pad else res


import os as _os

_FORCE = _os.environ.get("ZK_NTT_PALLAS")
# Dispatch floor for the Pallas montmul kernel.  1: on TPU every field
# multiply goes to Mosaic — the XLA limb fallback costs ~100 s of remote
# compile per distinct call-site shape (measured: one fresh 2^10 montmul
# graph = 125 s on the axon endpoint) vs ~3 s for the Mosaic kernel, and
# the padded-tile runtime overhead for small batches is microseconds.
_MIN_BATCH = 1


def enabled() -> bool:
    """Kernel-backed field multiplies on?  Default: TPU backends only
    (ZK_NTT_PALLAS=0/1 overrides) — measured 8x over the XLA limb path at
    2^15-element batches on a v5e."""
    if _FORCE == "0":
        return False
    if _FORCE == "1":
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def mont_mul_auto(ctx: MontCtx, a: jnp.ndarray, b: jnp.ndarray
                  ) -> jnp.ndarray:
    """`field.limb.mont_mul` with Pallas dispatch for big flat batches.

    Broadcasts, flattens leading axes to (N, L), and routes to the kernel
    when on a TPU backend and N >= _MIN_BATCH; the XLA limb path is the
    fallback and the bit-exactness oracle (tests/test_montmul_pallas.py)."""
    from ..field import limb

    a, b = jnp.broadcast_arrays(a, b)
    n = 1
    for s in a.shape[:-1]:
        n *= s
    if n < _MIN_BATCH or not enabled():
        return limb.mont_mul(ctx, a, b)
    out = mont_mul_pallas(ctx, a.reshape(n, L), b.reshape(n, L))
    return out.reshape(a.shape)


def from_mont_auto(ctx: MontCtx, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery -> standard form, kernel-routed for big batches.

    The XLA limb path materializes a (batch, L, 2L+1) skew-convolution
    intermediate (~8 GB at 2^20 wires — an HBM OOM); the Pallas kernel
    streams 512-element tiles instead."""
    one = jnp.zeros_like(a).at[..., 0].set(1.0)
    return mont_mul_auto(ctx, a, one)
