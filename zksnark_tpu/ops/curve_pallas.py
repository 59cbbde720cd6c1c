"""Fused Pallas TPU kernels for Jacobian point add/double (G1 and G2).

One complete EC point addition is ~24 field multiplies; on the XLA path
each multiply is its own fused-op cluster with HBM round-trips between
clusters and a giant HLO graph (minutes of compile per MSM).  These
kernels run the ENTIRE add/double formula in VMEM:

- layout: digit-major 2D tiles — digit rows on the sublane axis, batch
  on the lane axis ((L, TILE) f32 for Fq, (2L, TILE) for Fq2, both
  hardware-aligned: sublanes multiple of 8, lanes multiple of 128);
- field ops are the `ops.fieldcore` Montgomery pipeline: the two
  fixed-operand convolution passes run on the MXU as banded-Toeplitz
  matmuls, carries resolve via parallel folds + a Kogge-Stone prefix
  (no serial ripple — the round-4 bottleneck), everything exact f32;
- per-modulus constant matrices cannot be captured by Pallas kernels as
  array literals, so they enter as ONE extra (3L, 128) input ref
  (`fieldcore.pack_consts_np`) shared by every grid step;
- the complete-add edge cases (P=inf, Q=inf, P=Q, P=-Q) are resolved
  with per-lane masks inside the kernel, mirroring `curve.jacobian.add`;
- Fq2 (G2) elements stack their two components on the digit axis
  (2L = 64 rows), so one kernel template serves both curves.

`curve.jacobian.add/double` dispatch here automatically on TPU (or when
ZKSNARK_TPU_PALLAS=1); the XLA path remains the oracle and the CPU-mesh
fallback.  Formulas: EFD dbl-2009-l and add-2007-bl (a = 0 curves).
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from ..field import params
from ..field.limb import FQ_CTX
from . import fieldcore as fc

L = params.NUM_LIMBS                 # 32 digits


def _tile(nrows: int) -> int:
    """Batch elements per kernel instance: the G2 kernel (64 digit rows,
    Karatsuba Fq2 temporaries) overflows the 16 MB VMEM scoped limit at
    512 lanes — halve its tile."""
    return 512 if nrows == L else 256


# ---------------------------------------------------------------------------
# in-kernel field tables: an Fq value is an (L, B) digit-major array,
# an Fq2 value is (2L, B) with c0 = rows[:L], c1 = rows[L:]
# ---------------------------------------------------------------------------

class _KFq:
    rows = L

    def __init__(self, cc: fc.CoreConsts):
        self.cc = cc

    def mul(self, a, b):
        return fc.mont_mul_dm(a, b, self.cc)

    def sqr(self, a):
        return fc.mont_mul_dm(a, a, self.cc)

    def add(self, a, b):
        return fc.add_dm(a, b, self.cc)

    def sub(self, a, b):
        return fc.sub_dm(a, b, self.cc)

    def dbl(self, a):
        return fc.add_dm(a, a, self.cc)

    def is_zero(self, a):
        return fc.is_zero_dm(a)

    @staticmethod
    def select(mask, a, b):
        return jnp.where(mask[None, :], a, b)

    def one(self, like):
        return jnp.broadcast_to(self.cc.r_col, (L, like.shape[-1]))


class _KFq2:
    rows = 2 * L

    def __init__(self, cc: fc.CoreConsts):
        self.cc = cc
        self._fq = _KFq(cc)

    def mul(self, a, b):
        f = self._fq
        a0, a1, b0, b1 = a[:L], a[L:], b[:L], b[L:]
        t0 = f.mul(a0, b0)
        t1 = f.mul(a1, b1)
        t2 = f.mul(f.add(a0, a1), f.add(b0, b1))
        r0 = f.sub(t0, t1)
        r1 = f.sub(f.sub(t2, t0), t1)
        return jnp.concatenate([r0, r1], axis=0)

    def sqr(self, a):
        f = self._fq
        a0, a1 = a[:L], a[L:]
        r0 = f.mul(f.add(a0, a1), f.sub(a0, a1))
        r1 = f.mul(f.dbl(a0), a1)
        return jnp.concatenate([r0, r1], axis=0)

    def add(self, a, b):
        f = self._fq
        return jnp.concatenate(
            [f.add(a[:L], b[:L]), f.add(a[L:], b[L:])], axis=0)

    def sub(self, a, b):
        f = self._fq
        return jnp.concatenate(
            [f.sub(a[:L], b[:L]), f.sub(a[L:], b[L:])], axis=0)

    def dbl(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        return jnp.logical_and(fc.is_zero_dm(a[:L]), fc.is_zero_dm(a[L:]))

    @staticmethod
    def select(mask, a, b):
        return jnp.where(mask[None, :], a, b)

    def one(self, like):
        b = like.shape[-1]
        return jnp.concatenate(
            [jnp.broadcast_to(self.cc.r_col, (L, b)),
             jnp.zeros((L, b), like.dtype)], axis=0)


def _double_core(K, x, y, z):
    """dbl-2009-l on kernel field values."""
    a = K.sqr(x)
    b = K.sqr(y)
    c = K.sqr(b)
    d = K.sub(K.sqr(K.add(x, b)), K.add(a, c))
    d = K.dbl(d)
    e = K.add(K.dbl(a), a)
    f = K.sqr(e)
    x3 = K.sub(f, K.dbl(d))
    c8 = K.dbl(K.dbl(K.dbl(c)))
    y3 = K.sub(K.mul(e, K.sub(d, x3)), c8)
    z3 = K.dbl(K.mul(y, z))
    return x3, y3, z3


def _double_affine_core(K, x, y):
    """dbl-2009-l specialized to Z = 1 (6 field muls; Z3 = 2Y)."""
    a = K.sqr(x)
    b = K.sqr(y)
    c = K.sqr(b)
    d = K.dbl(K.sub(K.sqr(K.add(x, b)), K.add(a, c)))
    e = K.add(K.dbl(a), a)
    f = K.sqr(e)
    x3 = K.sub(f, K.dbl(d))
    c8 = K.dbl(K.dbl(K.dbl(c)))
    y3 = K.sub(K.mul(e, K.sub(d, x3)), c8)
    z3 = K.dbl(y)
    return x3, y3, z3


def _madd_core(K, px, py, pz, qx, qy, qz):
    """Complete mixed add (madd-2007-bl): Q MUST satisfy Z2 in {0, 1}
    (`curve.jacobian.batch_normalize` invariant).  10 field muls on the
    generic path + 6 for the P=Q branch vs 16 + 7 for `_add_core`."""
    z1z1 = K.sqr(pz)
    u2 = K.mul(qx, z1z1)
    s2 = K.mul(K.mul(qy, pz), z1z1)
    h = K.sub(u2, px)                      # U1 = X1 (Z2 = 1)
    hh = K.sqr(h)
    i = K.dbl(K.dbl(hh))
    j = K.mul(h, i)
    rsub = K.sub(s2, py)                   # S1 = Y1
    rr = K.dbl(rsub)
    v = K.mul(px, i)
    x3 = K.sub(K.sub(K.sqr(rr), j), K.dbl(v))
    y3 = K.sub(K.mul(rr, K.sub(v, x3)), K.dbl(K.mul(py, j)))
    z3 = K.mul(K.dbl(pz), h)               # (Z1+H)^2 - Z1Z1 - HH

    h_zero = K.is_zero(h)
    r_zero = K.is_zero(rsub)
    p_inf = K.is_zero(pz)
    q_inf = K.is_zero(qz)

    # P = Q (both finite): double the AFFINE q — cheaper than doubling P
    dx, dy, dz = _double_affine_core(K, qx, qy)
    both = jnp.logical_and(h_zero, r_zero)
    x3 = K.select(both, dx, x3)
    y3 = K.select(both, dy, y3)
    z3 = K.select(both, dz, z3)

    # P = -Q (h=0, r!=0, neither inf): infinity
    cancel = jnp.logical_and(
        jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
        jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf)))
    one = K.one(px)
    zero = jnp.zeros_like(px)
    x3 = K.select(cancel, one, x3)
    y3 = K.select(cancel, one, y3)
    z3 = K.select(cancel, zero, z3)

    # Q = inf -> P ; P = inf -> Q (Q's own Z is already one-or-zero)
    x3 = K.select(q_inf, px, x3)
    y3 = K.select(q_inf, py, y3)
    z3 = K.select(q_inf, pz, z3)
    x3 = K.select(p_inf, qx, x3)
    y3 = K.select(p_inf, qy, y3)
    z3 = K.select(p_inf, qz, z3)
    return x3, y3, z3


def _add_core(K, px, py, pz, qx, qy, qz):
    """Complete add-2007-bl with edge-case masks (mirrors jacobian.add)."""
    z1z1 = K.sqr(pz)
    z2z2 = K.sqr(qz)
    u1 = K.mul(px, z2z2)
    u2 = K.mul(qx, z1z1)
    s1 = K.mul(K.mul(py, qz), z2z2)
    s2 = K.mul(K.mul(qy, pz), z1z1)

    h = K.sub(u2, u1)
    i = K.sqr(K.dbl(h))
    j = K.mul(h, i)
    rr = K.dbl(K.sub(s2, s1))
    v = K.mul(u1, i)
    x3 = K.sub(K.sub(K.sqr(rr), j), K.dbl(v))
    y3 = K.sub(K.mul(rr, K.sub(v, x3)), K.dbl(K.mul(s1, j)))
    z3 = K.mul(K.sub(K.sqr(K.add(pz, qz)), K.add(z1z1, z2z2)), h)

    h_zero = K.is_zero(h)
    r_zero = K.is_zero(K.sub(s2, s1))
    p_inf = K.is_zero(pz)
    q_inf = K.is_zero(qz)

    dx, dy, dz = _double_core(K, px, py, pz)
    both = jnp.logical_and(h_zero, r_zero)
    x3 = K.select(both, dx, x3)
    y3 = K.select(both, dy, y3)
    z3 = K.select(both, dz, z3)

    # P = -Q (h=0, r!=0, neither inf): infinity (z=0; x=y=1 in Mont form)
    cancel = jnp.logical_and(
        jnp.logical_and(h_zero, jnp.logical_not(r_zero)),
        jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf)))
    one = K.one(px)
    zero = jnp.zeros_like(px)
    x3 = K.select(cancel, one, x3)
    y3 = K.select(cancel, one, y3)
    z3 = K.select(cancel, zero, z3)

    # Q = inf -> P ; P = inf -> Q
    x3 = K.select(q_inf, px, x3)
    y3 = K.select(q_inf, py, y3)
    z3 = K.select(q_inf, pz, z3)
    x3 = K.select(p_inf, qx, x3)
    y3 = K.select(p_inf, qy, y3)
    z3 = K.select(p_inf, qz, z3)
    return x3, y3, z3


# ---------------------------------------------------------------------------
# kernels + host wrappers
# ---------------------------------------------------------------------------

def _make_k(nrows, consts_ref):
    cc = fc.unpack_consts(consts_ref[:])
    return _KFq(cc) if nrows == L else _KFq2(cc)


# kernels read element-major (TILE, nrows) blocks and transpose to the
# digit-major compute layout in VMEM — measured ~7x cheaper than XLA
# transposes of the whole arrays around the kernel

def _add_kernel(nrows, cref, px, py, pz, qx, qy, qz, ox, oy, oz):
    with fc.kernel_mode():
        K = _make_k(nrows, cref)
        x3, y3, z3 = _add_core(K, px[:].T, py[:].T, pz[:].T,
                               qx[:].T, qy[:].T, qz[:].T)
        ox[:] = x3.T
        oy[:] = y3.T
        oz[:] = z3.T


def _madd_kernel(nrows, cref, px, py, pz, qx, qy, qz, ox, oy, oz):
    with fc.kernel_mode():
        K = _make_k(nrows, cref)
        x3, y3, z3 = _madd_core(K, px[:].T, py[:].T, pz[:].T,
                                qx[:].T, qy[:].T, qz[:].T)
        ox[:] = x3.T
        oy[:] = y3.T
        oz[:] = z3.T


def _double_kernel(nrows, cref, px, py, pz, ox, oy, oz):
    with fc.kernel_mode():
        K = _make_k(nrows, cref)
        x3, y3, z3 = _double_core(K, px[:].T, py[:].T, pz[:].T)
        ox[:] = x3.T
        oy[:] = y3.T
        oz[:] = z3.T


def _to_lane_major(arr, nrows):
    """(batch..., elem..., L) -> ((n_padded, nrows), batch_shape, n).
    Element-major (a reshape + pad only — no XLA transpose; kernels
    transpose in VMEM)."""
    elem_nd = 1 if nrows == L else 2
    batch_shape = arr.shape[:arr.ndim - elem_nd]
    n = 1
    for s in batch_shape:
        n *= s
    flat = arr.reshape((n, nrows))     # Fq2 folds (2, L) -> 2L rows
    pad = (-n) % _tile(nrows)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, nrows), flat.dtype)])
    return flat, batch_shape, n


def _from_lane_major(lm, nrows, batch_shape, n):
    flat = lm[:n]
    elem_shape = (L,) if nrows == L else (2, L)
    return flat.reshape(batch_shape + elem_shape)


def _consts_arr():
    return jnp.asarray(fc.pack_consts_np(FQ_CTX.p))


@lru_cache(maxsize=None)
def _point_call(kernel, nrows, n_in):
    import jax.experimental.pallas as pl

    def fn(consts, *lms):
        tile = _tile(nrows)
        n_tiles = lms[0].shape[0] // tile
        spec = pl.BlockSpec((tile, nrows), lambda i: (i, 0))
        cspec = pl.BlockSpec((fc.CONST_ROWS, fc.CONST_COLS),
                             lambda i: (0, 0))
        return pl.pallas_call(
            partial(kernel, nrows),
            out_shape=tuple(
                jax.ShapeDtypeStruct(lms[0].shape, lms[0].dtype)
                for _ in range(3)),
            grid=(n_tiles,),
            in_specs=[cspec] + [spec] * n_in,
            out_specs=(spec, spec, spec),
        )(consts, *lms)

    return jax.jit(fn)


def _nrows(ops):
    return L if ops.elem_ndim == 1 else 2 * L


_FORCE = os.environ.get("ZKSNARK_TPU_PALLAS", "")


def enabled() -> bool:
    """Pallas point kernels are on for TPU backends (or forced by env)."""
    if _FORCE == "0":
        return False
    if _FORCE == "1":
        return True
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _run_binary(kernel, ops, p, q):
    nr = _nrows(ops)
    lms = []
    meta = None
    for arr in (p.x, p.y, p.z, q.x, q.y, q.z):
        lm, bs, n = _to_lane_major(arr, nr)
        lms.append(lm)
        meta = (bs, n)
    ox, oy, oz = _point_call(kernel, nr, 6)(_consts_arr(), *lms)
    bs, n = meta
    from ..curve.jacobian import JPoint

    return JPoint(_from_lane_major(ox, nr, bs, n),
                  _from_lane_major(oy, nr, bs, n),
                  _from_lane_major(oz, nr, bs, n))


def jac_add(ops, p, q):
    """Fused complete point add; p, q: JPoint-like triples of arrays."""
    return _run_binary(_add_kernel, ops, p, q)


def jac_madd(ops, p, q):
    """Fused complete MIXED add: q.z must be in {0, one} (see
    `curve.jacobian.madd`)."""
    return _run_binary(_madd_kernel, ops, p, q)


def jac_double(ops, p):
    nr = _nrows(ops)
    lms = []
    meta = None
    for arr in (p.x, p.y, p.z):
        lm, bs, n = _to_lane_major(arr, nr)
        lms.append(lm)
        meta = (bs, n)
    ox, oy, oz = _point_call(_double_kernel, nr, 3)(_consts_arr(), *lms)
    bs, n = meta
    from ..curve.jacobian import JPoint

    return JPoint(_from_lane_major(ox, nr, bs, n),
                  _from_lane_major(oy, nr, bs, n),
                  _from_lane_major(oz, nr, bs, n))
