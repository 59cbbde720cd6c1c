"""Fused Pallas TPU kernels for Jacobian point add/double (G1 and G2).

One complete EC point addition is ~24 field multiplies; on the XLA path
each multiply is its own fused-op cluster with HBM round-trips between
clusters and a giant HLO graph (minutes of compile per MSM).  These
kernels run the ENTIRE add/double formula in VMEM:

- layout: digits on sublanes, batch on (8, 128) f32 registers — each
  digit row of a tile is exactly one full VPU register, so every f32 op
  runs at full vector width;
- field ops are the same separated-SOS Montgomery pipeline as
  `field.limb` / `ops.montmul` (8-bit digits in f32, exact by
  construction), with sequential exact carry ripples (cheap: the batch
  axis is the vector axis);
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

L = params.NUM_LIMBS                 # 32 digits
BASE = float(1 << params.LIMB_BITS)  # 256.0
INV_BASE = 1.0 / BASE
SUB = 8                              # sublanes per digit row
LANE = 128
TILE = SUB * LANE                    # 1024 batch elements per instance

_P = [float(x) for x in params.to_limbs(FQ_CTX.p)]
_NP = [float(x) for x in params.to_limbs(FQ_CTX.nprime_int)]
_PC = [float(x) for x in params.to_limbs((1 << 256) - FQ_CTX.p)]

# Pallas kernels may not capture array constants (only scalar literals are
# inlined into the kernel jaxpr), so the (L, 1, 1) digit-row constants for
# the in-kernel convolutions are BUILT INSIDE the kernel from scalar
# literals — once per kernel trace, stashed in `_KC` by the kernel entry
# points (tracing is single-threaded, and each pallas_call re-traces).
_KC: dict = {}


def _const_rows(vals) -> jnp.ndarray:
    """(len(vals), SUB, LANE) f32 digit rows from python floats, as traced
    ops (scalar splats + one concat), never a jaxpr const.  Full tiles:
    Mosaic cannot broadcast a (1, 1) minor tile in both sublanes and
    lanes, but a scalar splat is free."""
    return jnp.concatenate(
        [jnp.full((1, SUB, LANE), v, jnp.float32) for v in vals], axis=0)


def _bind_kernel_consts():
    _KC["p"] = _const_rows(_P)
    _KC["np"] = _const_rows(_NP)


# ---------------------------------------------------------------------------
# in-kernel field helpers: an Fq value is a list of L (SUB, LANE) f32 rows
# ---------------------------------------------------------------------------

def _ripple(digits, start=None):
    out = []
    carry = start
    for v in digits:
        if carry is not None:
            v = v + carry
        carry = jnp.floor(v * INV_BASE)
        out.append(v - carry * BASE)
    return out, carry


def _conv_arr(a_arr: jnp.ndarray, b_arr: jnp.ndarray) -> jnp.ndarray:
    """Digit convolution of stacked digit-row arrays via outer product +
    the pad/flatten/reshape skew trick (see field.limb._skew_sum) — a
    handful of Mosaic loop nests instead of ~1000 unrolled mul-adds,
    which keeps kernel compile time in seconds.  a: (la, ...) rows,
    b: (lb, ...) rows (broadcastable) -> (la+lb, ...) un-normalized."""
    la, lb = a_arr.shape[0], b_arr.shape[0]
    prod = a_arr[:, None] * b_arr[None, :]        # (la, lb, sub, lane)
    v = la + lb
    tail = prod.shape[2:]
    pad = jnp.zeros((la, la + 1) + tail, prod.dtype)
    padded = jnp.concatenate([prod, pad], axis=1)
    flat = padded.reshape((la * (v + 1),) + tail)[: la * v]
    return flat.reshape((la, v) + tail).sum(axis=0)


def _fq_mul(a, b):
    """Montgomery product of two Fq values (lists of L digit rows):
    separated SOS with all three convolution passes as `_conv_arr`."""
    aa = jnp.stack(a)
    bb = jnp.stack(b)
    t_arr = _conv_arr(aa, bb)                     # (2L, sub, lane) < 2^21
    t, _ = _ripple([t_arr[i] for i in range(2 * L)])
    m_arr = _conv_arr(jnp.stack(t[:L]), _KC["np"])[:L]   # mod R
    m, _ = _ripple([m_arr[i] for i in range(L)])
    s_arr = _conv_arr(jnp.stack(m), _KC["p"])     # (2L, ...) m*p
    s, _ = _ripple([s_arr[i] + t[i] for i in range(2 * L)])
    return _fq_cond_sub_p(s[L:2 * L])


def _fq_cond_sub_p(res):
    """res < 2p (canonical digits) -> res mod p."""
    cur, ge = _ripple([res[k] + _PC[k] for k in range(L)])
    take = ge > 0.5
    return [jnp.where(take, cur[k], res[k]) for k in range(L)]


def _fq_add(a, b):
    s, _ = _ripple([a[k] + b[k] for k in range(L)])
    return _fq_cond_sub_p(s)


def _fq_sub(a, b):
    v = [a[k] + ((BASE - 1.0) - b[k]) for k in range(L)]
    v[0] = v[0] + 1.0
    cur, carry = _ripple(v)
    borrow = carry < 0.5     # borrow <=> no carry out <=> a < b
    plus_p, _ = _ripple([cur[k] + _P[k] for k in range(L)])
    return [jnp.where(borrow, plus_p[k], cur[k]) for k in range(L)]


def _fq_dbl(a):
    return _fq_add(a, a)


def _fq_is_zero(a):
    acc = a[0] == 0
    for k in range(1, L):
        acc = jnp.logical_and(acc, a[k] == 0)
    return acc


def _fq_select(mask, a, b):
    return [jnp.where(mask, a[k], b[k]) for k in range(L)]


# ---------------------------------------------------------------------------
# generic field-op table: Fq uses the helpers above; Fq2 builds on them
# ---------------------------------------------------------------------------

class _KFq:
    rows = L

    mul = staticmethod(_fq_mul)
    add = staticmethod(_fq_add)
    sub = staticmethod(_fq_sub)
    dbl = staticmethod(_fq_dbl)
    is_zero = staticmethod(_fq_is_zero)
    select = staticmethod(_fq_select)

    @staticmethod
    def sqr(a):
        return _fq_mul(a, a)


class _KFq2:
    """Fq2 value = list of 2L rows: c0 = rows[:L], c1 = rows[L:]."""

    rows = 2 * L

    @staticmethod
    def mul(a, b):
        a0, a1, b0, b1 = a[:L], a[L:], b[:L], b[L:]
        t0 = _fq_mul(a0, b0)
        t1 = _fq_mul(a1, b1)
        t2 = _fq_mul(_fq_add(a0, a1), _fq_add(b0, b1))
        r0 = _fq_sub(t0, t1)
        r1 = _fq_sub(_fq_sub(t2, t0), t1)
        return r0 + r1

    @staticmethod
    def sqr(a):
        a0, a1 = a[:L], a[L:]
        r0 = _fq_mul(_fq_add(a0, a1), _fq_sub(a0, a1))
        r1 = _fq_mul(_fq_dbl(a0), a1)
        return r0 + r1

    @staticmethod
    def add(a, b):
        return _fq_add(a[:L], b[:L]) + _fq_add(a[L:], b[L:])

    @staticmethod
    def sub(a, b):
        return _fq_sub(a[:L], b[:L]) + _fq_sub(a[L:], b[L:])

    @staticmethod
    def dbl(a):
        return _fq_dbl(a[:L]) + _fq_dbl(a[L:])

    @staticmethod
    def is_zero(a):
        return jnp.logical_and(_fq_is_zero(a[:L]), _fq_is_zero(a[L:]))

    @staticmethod
    def select(mask, a, b):
        return [jnp.where(mask, x, y) for x, y in zip(a, b)]


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


def _one_mont(K, like):
    r_digits = [float(v) for v in params.to_limbs(FQ_CTX.r_int)]
    one = [jnp.full_like(like, d) for d in r_digits]
    if K.rows == 2 * L:
        one = one + [jnp.zeros_like(like)] * L
    return one


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
    one = _one_mont(K, px[0])
    zero = [jnp.zeros_like(px[0])] * K.rows
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
    one = _one_mont(K, px[0])
    zero = [jnp.zeros_like(px[0])] * K.rows
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

def _rows(ref, n):
    return [ref[k] for k in range(n)]


def _write(ref, rows):
    for k, r in enumerate(rows):
        ref[k] = r


def _add_kernel(nrows, px, py, pz, qx, qy, qz, ox, oy, oz):
    _bind_kernel_consts()
    K = _KFq if nrows == L else _KFq2
    x3, y3, z3 = _add_core(K, _rows(px, nrows), _rows(py, nrows),
                           _rows(pz, nrows), _rows(qx, nrows),
                           _rows(qy, nrows), _rows(qz, nrows))
    _write(ox, x3)
    _write(oy, y3)
    _write(oz, z3)


def _madd_kernel(nrows, px, py, pz, qx, qy, qz, ox, oy, oz):
    _bind_kernel_consts()
    K = _KFq if nrows == L else _KFq2
    x3, y3, z3 = _madd_core(K, _rows(px, nrows), _rows(py, nrows),
                            _rows(pz, nrows), _rows(qx, nrows),
                            _rows(qy, nrows), _rows(qz, nrows))
    _write(ox, x3)
    _write(oy, y3)
    _write(oz, z3)


def _double_kernel(nrows, px, py, pz, ox, oy, oz):
    _bind_kernel_consts()
    K = _KFq if nrows == L else _KFq2
    x3, y3, z3 = _double_core(K, _rows(px, nrows), _rows(py, nrows),
                              _rows(pz, nrows))
    _write(ox, x3)
    _write(oy, y3)
    _write(oz, z3)


def _to_lane_major(arr, nrows):
    """(batch..., elem..., L) -> ((n_tiles, nrows, SUB, LANE), batch_shape,
    n).  Pads the flattened batch to a TILE multiple."""
    elem_nd = 1 if nrows == L else 2
    batch_shape = arr.shape[:arr.ndim - elem_nd]
    n = 1
    for s in batch_shape:
        n *= s
    flat = arr.reshape((n, nrows))     # Fq2 folds (2, L) -> 2L rows
    pad = (-n) % TILE
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad, nrows), flat.dtype)])
    m = flat.shape[0]
    lm = flat.T.reshape(nrows, m // LANE, LANE)
    return lm, batch_shape, n


def _from_lane_major(lm, nrows, batch_shape, n):
    m = lm.shape[1] * LANE
    flat = lm.reshape(nrows, m).T[:n]
    elem_shape = (L,) if nrows == L else (2, L)
    return flat.reshape(batch_shape + elem_shape)


@lru_cache(maxsize=None)
def _add_call(nrows):
    import jax.experimental.pallas as pl

    def fn(*lms):
        n_tiles = lms[0].shape[1] // SUB
        spec = pl.BlockSpec((nrows, SUB, LANE), lambda i: (0, i, 0))
        return pl.pallas_call(
            partial(_add_kernel, nrows),
            out_shape=tuple(
                jax.ShapeDtypeStruct(lms[0].shape, lms[0].dtype)
                for _ in range(3)),
            grid=(n_tiles,),
            in_specs=[spec] * 6,
            out_specs=(spec, spec, spec),
        )(*lms)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _madd_call(nrows):
    import jax.experimental.pallas as pl

    def fn(*lms):
        n_tiles = lms[0].shape[1] // SUB
        spec = pl.BlockSpec((nrows, SUB, LANE), lambda i: (0, i, 0))
        return pl.pallas_call(
            partial(_madd_kernel, nrows),
            out_shape=tuple(
                jax.ShapeDtypeStruct(lms[0].shape, lms[0].dtype)
                for _ in range(3)),
            grid=(n_tiles,),
            in_specs=[spec] * 6,
            out_specs=(spec, spec, spec),
        )(*lms)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _double_call(nrows):
    import jax.experimental.pallas as pl

    def fn(*lms):
        n_tiles = lms[0].shape[1] // SUB
        spec = pl.BlockSpec((nrows, SUB, LANE), lambda i: (0, i, 0))
        return pl.pallas_call(
            partial(_double_kernel, nrows),
            out_shape=tuple(
                jax.ShapeDtypeStruct(lms[0].shape, lms[0].dtype)
                for _ in range(3)),
            grid=(n_tiles,),
            in_specs=[spec] * 3,
            out_specs=(spec, spec, spec),
        )(*lms)

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


def jac_add(ops, p, q):
    """Fused complete point add; p, q: JPoint-like triples of arrays."""
    nr = _nrows(ops)
    lms = []
    meta = None
    for arr in (p.x, p.y, p.z, q.x, q.y, q.z):
        lm, bs, n = _to_lane_major(arr, nr)
        lms.append(lm)
        meta = (bs, n)
    ox, oy, oz = _add_call(nr)(*lms)
    bs, n = meta
    from ..curve.jacobian import JPoint

    return JPoint(_from_lane_major(ox, nr, bs, n),
                  _from_lane_major(oy, nr, bs, n),
                  _from_lane_major(oz, nr, bs, n))


def jac_madd(ops, p, q):
    """Fused complete MIXED add: q.z must be in {0, one} (see
    `curve.jacobian.madd`)."""
    nr = _nrows(ops)
    lms = []
    meta = None
    for arr in (p.x, p.y, p.z, q.x, q.y, q.z):
        lm, bs, n = _to_lane_major(arr, nr)
        lms.append(lm)
        meta = (bs, n)
    ox, oy, oz = _madd_call(nr)(*lms)
    bs, n = meta
    from ..curve.jacobian import JPoint

    return JPoint(_from_lane_major(ox, nr, bs, n),
                  _from_lane_major(oy, nr, bs, n),
                  _from_lane_major(oz, nr, bs, n))


def jac_double(ops, p):
    nr = _nrows(ops)
    lms = [_to_lane_major(arr, nr)[0] for arr in (p.x, p.y, p.z)]
    _, bs, n = _to_lane_major(p.z, nr)
    ox, oy, oz = _double_call(nr)(*lms)
    from ..curve.jacobian import JPoint

    return JPoint(_from_lane_major(ox, nr, bs, n),
                  _from_lane_major(oy, nr, bs, n),
                  _from_lane_major(oz, nr, bs, n))
