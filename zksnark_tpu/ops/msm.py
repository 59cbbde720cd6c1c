"""Multi-scalar multiplication and batched scalar multiplication (device).

The prover's hot loops #4/#6 (A/B/C sigma-point sums,
/root/reference/src/groth16/mod.rs:255-293) and setup's powers-of-tau
encryption (:165-194) become these kernels.

TPU/XLA-first Pippenger formulation (no scalar gather loops, no
data-dependent control flow, and — because XLA compile cost scales with
graph size — a *bounded number of point-add instantiations* regardless of
problem size):

- window size c = 16 bits == one scalar limb, so the window digits ARE the
  scalar's limb columns: exactly 16 windows, no cross-limb bit surgery;
- per window, points are sorted by digit and bucket sums are read off a
  prefix scan of the sorted points (EC addition is associative).  The scan
  is a two-level Hillis-Steele network driven by ``lax.fori_loop`` — three
  instantiations of the combine total, O(log) depth;
- the weighted bucket reduction uses Abel summation:
      sum_j j*B_j  =  2^16 * E_top - sum_j E_j
  where E_j is the forward-filled prefix at the end of bucket j — this
  removes the suffix scan and every per-bucket scalar multiplication
  (E_top is just the window's total point sum; 2^16 * x is 16 doublings);
- the 16 windows run under one ``lax.scan``; the cross-window Horner tail
  is another scan with a fori-doubling body.

All scalars are STANDARD-form (non-Montgomery) 16x16-bit limb vectors;
points are batched Jacobian pytrees (`curve.jacobian.JPoint`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..curve import jacobian as jac
from ..curve.jacobian import JPoint
from ..field import params

L = params.NUM_LIMBS
WINDOW_BITS = params.LIMB_BITS  # default window; msm() picks per-size


def _concat(ops, a: JPoint, b: JPoint) -> JPoint:
    return JPoint(jnp.concatenate([a.x, b.x]), jnp.concatenate([a.y, b.y]),
                  jnp.concatenate([a.z, b.z]))


def _reshape(p: JPoint, shape, batch_ndim: int) -> JPoint:
    """Reshape the leading `batch_ndim` axes to `shape`."""
    return JPoint(p.x.reshape(shape + p.x.shape[batch_ndim:]),
                  p.y.reshape(shape + p.y.shape[batch_ndim:]),
                  p.z.reshape(shape + p.z.shape[batch_ndim:]))


def _roll(p: JPoint, shift, axis) -> JPoint:
    return JPoint(jnp.roll(p.x, shift, axis=axis),
                  jnp.roll(p.y, shift, axis=axis),
                  jnp.roll(p.z, shift, axis=axis))


def _hs_scan_axis(ops, pts: JPoint, combine, axis: int, size: int) -> JPoint:
    """Inclusive Hillis-Steele prefix scan along `axis` (identity =
    infinity): ONE combine instantiation, ceil(log2(size)) fori rounds."""
    if size <= 1:
        return pts
    log = (size - 1).bit_length()
    batch_shape = pts.z.shape[:pts.z.ndim - ops.elem_ndim]
    idx_shape = [1] * len(batch_shape)
    idx_shape[axis] = size
    pos = jax.lax.broadcasted_iota(jnp.int32, tuple(idx_shape), axis)
    inf = jac.infinity(ops, batch_shape)

    def body(i, x):
        shift = jnp.int32(1) << i
        partner = _roll(x, shift, axis)
        vmask = jnp.broadcast_to(pos >= shift, batch_shape)
        partner = jac.select(ops, vmask, partner, inf)
        return combine(partner, x)

    return jax.lax.fori_loop(0, log, body, pts)


def _prefix_scan(ops, pts: JPoint, combine=None, chunk: int = 128) -> JPoint:
    """Two-level work-reduced inclusive prefix scan over axis 0.

    combine=None means Jacobian add; any associative combine with identity
    = infinity works (e.g. the keep-last fill combine)."""
    comb = (partial(jac.add, ops)) if combine is None else combine
    n = pts.z.shape[0]
    c = min(chunk, n)
    b = -(-n // c)
    pad = b * c - n
    if pad:
        pts = _concat(ops, pts, jac.infinity(ops, (pad,)))
    grid = _reshape(pts, (b, c), 1)
    within = _hs_scan_axis(ops, grid, comb, axis=1, size=c)
    totals = JPoint(within.x[:, -1], within.y[:, -1], within.z[:, -1])
    # exclusive scan of chunk totals: shift right, then inclusive scan
    shifted = _concat(ops, jac.infinity(ops, (1,)),
                      JPoint(totals.x[:-1], totals.y[:-1], totals.z[:-1]))
    carry = _hs_scan_axis(ops, shifted, comb, axis=0, size=b)
    carry_b = JPoint(carry.x[:, None], carry.y[:, None], carry.z[:, None])
    full = comb(_broadcast_like(ops, carry_b, within), within)
    out = _reshape(full, (b * c,), 2)
    return JPoint(out.x[:n], out.y[:n], out.z[:n])


def _broadcast_like(ops, a: JPoint, ref: JPoint) -> JPoint:
    return JPoint(jnp.broadcast_to(a.x, ref.x.shape),
                  jnp.broadcast_to(a.y, ref.y.shape),
                  jnp.broadcast_to(a.z, ref.z.shape))


def _last(p: JPoint) -> JPoint:
    return JPoint(p.x[-1], p.y[-1], p.z[-1])


def tree_sum(ops, pts: JPoint) -> JPoint:
    """Total sum of a batch of points (last element of the prefix scan)."""
    return _last(_prefix_scan(ops, pts))


def _keep_last(ops):
    def combine(a: JPoint, b: JPoint) -> JPoint:
        return jac.select(ops, jac.is_infinity(ops, b), a, b)

    return combine


def batch_scalar_mul(ops, pts: JPoint, scalar_limbs: jnp.ndarray) -> JPoint:
    """[s_i] P_i for every i — MSB-first double-and-add under lax.scan.

    scalar_limbs: (N, L) standard-form uint32 limbs.  Used for CRS
    generation (powers-of-tau encryption, setup hot loop #2).
    """
    n_bits = WINDOW_BITS * L  # 256; top bits of field scalars are zero
    acc0 = jac.infinity(ops, (pts.z.shape[0],))

    def body(acc, t):
        bit_t = n_bits - 1 - t
        limb = jax.lax.dynamic_index_in_dim(
            scalar_limbs, bit_t // WINDOW_BITS, axis=1, keepdims=False)
        bit = (limb >> (bit_t % WINDOW_BITS)) & 1
        acc = jac.double(ops, acc)
        added = jac.add(ops, acc, pts)
        return jac.select(ops, bit.astype(bool), added, acc), None

    acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_bits))
    return acc


def _double_n(ops, p: JPoint, n: int) -> JPoint:
    return jax.lax.fori_loop(0, n, lambda _, x: jac.double(ops, x), p)


def _take_points(pts: JPoint, idx) -> JPoint:
    return JPoint(jnp.take(pts.x, idx, axis=0),
                  jnp.take(pts.y, idx, axis=0),
                  jnp.take(pts.z, idx, axis=0))


def _digit_columns(scalar_limbs: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, L) 16-bit limbs -> (n_windows, N) c-bit digit columns (LSB
    window first).  c must divide 16."""
    per = params.LIMB_BITS // c
    cols = []
    for w in range(L * per):
        limb = scalar_limbs[:, w // per]
        cols.append((limb >> (c * (w % per))) & ((1 << c) - 1))
    return jnp.stack(cols)


def _bucket_window(ops, pts: JPoint, digits: jnp.ndarray,
                   num_buckets: int) -> JPoint:
    """sum_i digit_i * P_i for one c-bit window (see module doc)."""
    order = jnp.argsort(digits)
    d_sorted = jnp.take(digits, order)
    p_sorted = _take_points(pts, order)

    prefix = _prefix_scan(ops, p_sorted)

    # run-end mask: position k closes its digit's run
    nxt = jnp.concatenate(
        [d_sorted[1:], jnp.full((1,), num_buckets, d_sorted.dtype)])
    run_end = d_sorted != nxt

    # scatter run-end prefixes to bucket slots, then forward-fill
    ends = jac.infinity(ops, (num_buckets,))
    tgt = jnp.where(run_end, d_sorted.astype(jnp.int32),
                    jnp.int32(num_buckets))
    ends = JPoint(
        ends.x.at[tgt].set(prefix.x, mode="drop"),
        ends.y.at[tgt].set(prefix.y, mode="drop"),
        ends.z.at[tgt].set(prefix.z, mode="drop"),
    )
    filled = _prefix_scan(ops, ends, combine=_keep_last(ops))

    # Abel: sum_j j*B_j = num_buckets * E_top - sum_j E_j
    e_top = _last(prefix)
    lhs = _double_n(ops, e_top, num_buckets.bit_length() - 1)
    rhs = tree_sum(ops, filled)
    return jac.add(ops, lhs, jac.neg(ops, rhs))


@partial(jax.jit, static_argnums=(0, 3))
def _msm_windowed(ops, pts: JPoint, scalar_limbs: jnp.ndarray,
                  window_bits: int) -> JPoint:
    digit_cols = _digit_columns(scalar_limbs, window_bits)
    n_win = digit_cols.shape[0]

    def window_body(_, digits):
        return None, _bucket_window(ops, pts, digits, 1 << window_bits)

    _, window_sums = jax.lax.scan(window_body, None, digit_cols)

    # Horner across windows, MSB window first: acc = 2^c * acc + W_w
    def horner_body(acc, w):
        acc = _double_n(ops, acc, window_bits)
        wp = JPoint(window_sums.x[n_win - 1 - w],
                    window_sums.y[n_win - 1 - w],
                    window_sums.z[n_win - 1 - w])
        return jac.add(ops, acc, wp), None

    acc, _ = jax.lax.scan(horner_body, jac.infinity(ops), jnp.arange(n_win))
    return acc


def msm(ops, pts: JPoint, scalar_limbs: jnp.ndarray,
        window_bits: int = 0) -> JPoint:
    """Pippenger MSM: returns the single point sum_i s_i * P_i.

    pts: JPoint batch of N points; scalar_limbs: (N, L) standard form.
    window_bits 0 = auto (8 below ~2^18 points, 16 above: balances the
    per-window bucket-array scans against per-point work)."""
    if window_bits == 0:
        window_bits = 16 if pts.z.shape[0] >= (1 << 18) else 8
    return _msm_windowed(ops, pts, scalar_limbs, window_bits)


@partial(jax.jit, static_argnums=0)
def msm_naive(ops, pts: JPoint, scalar_limbs: jnp.ndarray) -> JPoint:
    """Reference MSM: batched scalar-mul then tree reduction.  O(bits * N)
    point ops — the correctness oracle for `msm` and the small-N fallback."""
    return tree_sum(ops, batch_scalar_mul(ops, pts, scalar_limbs))
