"""Pallas TPU kernel for batched Montgomery multiplication (f32 digits).

The XLA path (`field.limb.mont_mul`) expresses one 254-bit multiply as a
few hundred HLO ops on (..., 32)-shaped arrays; under big fan-out (NTT
stages, MSM point adds) that costs compile time and leaves the minor
dimension at 32 of 128 lanes.  This kernel runs the separated-SOS
Montgomery pipeline of `ops.fieldcore` in VMEM on a *digit-major* layout:

    digits on the sublane axis, batch on the lane axis —
    a_ref[i, :] is digit i of a whole tile of elements.

The fieldcore pipeline puts the two fixed-operand convolution passes
(x n' mod R, x p) on the MXU as banded-Toeplitz matmuls and resolves
carries with parallel folds + a Kogge-Stone prefix — no serial ripple
(the round-4 kernel's 64-step dependency chains were the measured
bottleneck: 27 Mmul/s standalone).  Everything is float32: 8-bit digits
keep every partial product and accumulation exact (see fieldcore's bound
bookkeeping).

API: `mont_mul_pallas(ctx, a, b)` — drop-in for `limb.mont_mul` on 2-D
inputs (N, L).  interpret=True runs the same fieldcore math on plain
arrays (the CPU test harness detaches the TPU platform, which breaks
pallas interpret mode itself — so the pallas_call below always runs
compiled, never interpreted).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ..field import params
from ..field.limb import MontCtx
from . import fieldcore as fc

L = params.NUM_LIMBS          # 32 digits
TILE = 512  # batch elements per kernel instance (lane axis)


def _kernel_body(consts_ref, a_ref, b_ref, o_ref):
    # element-major (TILE, L) blocks; the digit-major transpose happens
    # in VMEM (measured ~7x cheaper than an XLA transpose of the whole
    # array around the kernel)
    with fc.kernel_mode():
        cc = fc.unpack_consts(consts_ref[:])
        o_ref[:] = fc.mont_mul_dm(a_ref[:].T, b_ref[:].T, cc).T


@lru_cache(maxsize=None)
def _pallas_fn(n_padded: int):
    import jax.experimental.pallas as pl

    grid = (n_padded // TILE,)

    def fn(consts, a, b):
        spec = pl.BlockSpec((TILE, L), lambda i: (i, 0))
        return pl.pallas_call(
            _kernel_body,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((fc.CONST_ROWS, fc.CONST_COLS),
                             lambda i: (0, 0)),
                spec,
                spec,
            ],
            out_specs=spec,
        )(consts, a, b)

    return jax.jit(fn)


def mont_mul_pallas(ctx: MontCtx, a: jnp.ndarray, b: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Batched Montgomery multiply via the Pallas fieldcore kernel.

    a, b: (N, L) f32 digit vectors in Montgomery form; padded to TILE
    internally.  Returns (N, L).  interpret=True runs the fieldcore math
    on plain arrays (CPU harness; no pallas import)."""
    n = a.shape[0]
    pad = (-n) % TILE
    if pad:
        a = jnp.concatenate([a, jnp.zeros((pad, L), a.dtype)])
        b = jnp.concatenate([b, jnp.zeros((pad, L), b.dtype)])

    if interpret:
        cc = fc.make_consts(ctx)
        res = fc.mont_mul_dm(a.T, b.T, cc).T
        return res[:n] if pad else res

    consts = jnp.asarray(fc.pack_consts_np(ctx.p))
    out = _pallas_fn(a.shape[0])(consts, a, b)
    return out[:n] if pad else out


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
    (ZK_NTT_PALLAS=0/1 overrides)."""
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
