"""Pallas TPU kernel for batched Montgomery multiplication.

The XLA path (`field.limb.mont_mul`) expresses one 254-bit multiply as ~150
HLO ops; under big fan-out (NTT stages, MSM point adds) that costs both
compile time and HBM round-trips between fused segments.  This kernel runs
the whole separated-SOS Montgomery pipeline in VMEM on a *lane-major*
layout:

    limbs on the sublane axis, batch on the 128-wide lane axis —
    a_ref[i, :] is limb i of a whole tile of elements.

All partial products are exact in uint32 (16-bit limbs), every accumulator
stays < 2^22, carries ripple once over 2L+1 sublane rows (sequential but
tiny — the batch axis is the vector axis).

API: `mont_mul_pallas(ctx, a, b)` — drop-in for `limb.mont_mul` on 2-D
inputs (N, L); used by the kernel-backed NTT/MSM variants and benchmarked
against the XLA path in bench.py.  Falls back to interpret mode off-TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..field import params
from ..field.limb import MontCtx

L = params.NUM_LIMBS
MASK32 = (1 << params.LIMB_BITS) - 1
TILE = 512  # batch elements per kernel instance (lane axis)


def _kernel_body(p_limbs, nprime_limbs, a_ref, b_ref, o_ref):
    mask = jnp.uint32(MASK32)
    a = [a_ref[i, :] for i in range(L)]
    b = [b_ref[i, :] for i in range(L)]

    # t = a * b (2L+1 digit rows, values < 2^21)
    t = [jnp.zeros_like(a[0]) for _ in range(2 * L + 1)]
    for i in range(L):
        for j in range(L):
            p = a[i] * b[j]
            t[i + j] = t[i + j] + (p & mask)
            t[i + j + 1] = t[i + j + 1] + (p >> 16)

    # normalize t
    carry = jnp.zeros_like(a[0])
    for k in range(2 * L + 1):
        v = t[k] + carry
        t[k] = v & mask
        carry = v >> 16

    # m = t_lo * (-p^-1 mod R) mod R
    m = [jnp.zeros_like(a[0]) for _ in range(L + 1)]
    for i in range(L):
        for j in range(L - i):
            p = t[i] * jnp.uint32(nprime_limbs[j])
            m[i + j] = m[i + j] + (p & mask)
            if i + j + 1 < L:
                m[i + j + 1] = m[i + j + 1] + (p >> 16)
    carry = jnp.zeros_like(a[0])
    for k in range(L):
        v = m[k] + carry
        m[k] = v & mask
        carry = v >> 16

    # s = t + m * p; low L limbs become zero; result is s[L:2L]
    s = list(t)
    for i in range(L):
        for j in range(L):
            p = m[i] * jnp.uint32(p_limbs[j])
            s[i + j] = s[i + j] + (p & mask)
            s[i + j + 1] = s[i + j + 1] + (p >> 16)
    carry = jnp.zeros_like(a[0])
    for k in range(2 * L + 1):
        v = s[k] + carry
        s[k] = v & mask
        carry = v >> 16

    res = s[L:2 * L]

    # conditional subtract p (two's complement add of ~p + 1)
    cur = [jnp.zeros_like(a[0])] * L
    c = jnp.ones_like(a[0])  # +1 of two's complement folded into limb 0
    for k in range(L):
        v = res[k] + (mask - jnp.uint32(p_limbs[k])) + c
        cur[k] = v & mask
        c = v >> 16
    # c == 1 <=> res >= p
    ge = c
    for k in range(L):
        o_ref[k, :] = jnp.where(ge.astype(bool), cur[k], res[k])


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

    a, b: (N, L) uint32 Montgomery limbs, N a multiple of TILE (pad
    upstream).  Returns (N, L).  interpret=True runs the kernel body on
    plain arrays via _EmuRef (the CPU harness detaches the TPU platform,
    which breaks pallas interpret mode itself — so the real pallas_call
    below always runs compiled, never interpreted).
    """
    n = a.shape[0]
    pad = (-n) % TILE
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, L), jnp.uint32)])
        b = jnp.concatenate([b, jnp.zeros((pad, L), jnp.uint32)])
    at = a.T  # (L, N) lane-major
    bt = b.T

    p_limbs = [int(x) for x in ctx.p_np]
    np_limbs = [int(x) for x in params.to_limbs(ctx.nprime_int)]

    kernel = partial(_kernel_body, p_limbs, np_limbs)
    if interpret:
        o_ref = _EmuRef(jnp.zeros(at.shape, jnp.uint32))
        kernel(_EmuRef(at), _EmuRef(bt), o_ref)
        res = o_ref.arr.T
        return res[:n] if pad else res

    from jax.experimental import pallas as pl

    grid = (at.shape[1] // TILE,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(at.shape, jnp.uint32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, TILE), lambda i: (0, i)),
            pl.BlockSpec((L, TILE), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((L, TILE), lambda i: (0, i)),
    )(at, bt)
    res = out.T
    return res[:n] if pad else res
