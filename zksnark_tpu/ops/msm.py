"""Multi-scalar multiplication and batched scalar multiplication (device).

The prover's hot loops #4/#6 (A/B/C sigma-point sums,
/root/reference/src/groth16/mod.rs:255-293) and setup's powers-of-tau
encryption (:165-194) become these kernels.

TPU/XLA-first Pippenger formulation (no scalar gather loops, no
data-dependent control flow, and — because XLA compile cost scales with
graph size — a *bounded number of point-add instantiations* regardless of
problem size):

- generic c-bit windows (digits are extracted across the 8-bit digit
  boundaries with shift-or chains); ONE batched argsort orders all
  windows' digit columns at once;
- per window, bucket sums are read off a prefix scan of the sorted
  points (EC addition is associative).  The scan is *work-efficient*:
  points are laid out as (chunks, 64) and a ``lax.scan`` walks the 64
  sequential positions with all chunks in vector lanes — ~2N point-adds
  total versus N log N for a Hillis-Steele network; ALL windows ride the
  batch axis together (vmap), so each scan step is one dispatch covering
  every window at full VPU width (`win_group` caps how many windows are
  live at once — the HBM knob for huge N);
- the weighted bucket reduction uses Abel summation:
      sum_j j*B_j  =  2^c * E_top - sum_j E_j
  where E_j is the forward-filled prefix at the end of bucket j — this
  removes the suffix scan and every per-bucket scalar multiplication
  (E_top is just the window's total point sum; 2^c * x is c doublings);
- the windows run under one ``lax.scan``; the cross-window Horner tail
  is another scan with a fori-doubling body;
- **why no GLV endomorphism split**: with the BN254 cube-root
  endomorphism, k = k1 + k2*lambda halves the scalar width (256 -> 128
  bits) but doubles the point count (P and phi(P)).  In THIS formulation
  the per-window cost is N_points scan-adds + O(2^c) bucket adds, so the
  total is n_windows * N + ...: GLV gives (128/c) * 2N = (256/c) * N —
  exactly the same add count; only the c Horner doublings per window
  halve (~0.1% at 2^20).  GLV pays on serial double-and-add ladders
  (halves the doubling chain) and on bucket-bound small-N MSMs, neither
  of which is this kernel's regime — measured wins here come from the
  fieldcore multiply (ops/fieldcore.py) instead;
- the prover's four G1 MSMs are padded to a common size so they share
  ONE compiled `_msm_windowed` kernel by shape (groth16/prover.py
  `_pad_msm`) — same-compile sharing without an extra stacking scan.

All scalars are STANDARD-form (non-Montgomery) 32x8-bit digit vectors in
f32; points are batched Jacobian pytrees (`curve.jacobian.JPoint`).  The
point adds dispatch to the fused Pallas kernels (`ops/curve_pallas.py`)
on TPU backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import jacobian as jac
from ..curve.jacobian import JPoint
from ..field import params

L = params.NUM_LIMBS
WINDOW_BITS = params.LIMB_BITS  # default window; msm() picks per-size
# sequential steps per scan level (lanes = n / _CHUNK): total scan work
# is ~N combines regardless; _CHUNK trades sequential kernel launches
# against chunk-carry fixup width (ZK_MSM_CHUNK overrides for tuning)
_CHUNK = int(__import__("os").environ.get("ZK_MSM_CHUNK", "64"))


def _concat(ops, a: JPoint, b: JPoint) -> JPoint:
    return JPoint(jnp.concatenate([a.x, b.x]), jnp.concatenate([a.y, b.y]),
                  jnp.concatenate([a.z, b.z]))


def _reshape(p: JPoint, shape, batch_ndim: int) -> JPoint:
    """Reshape the leading `batch_ndim` axes to `shape`."""
    return JPoint(p.x.reshape(shape + p.x.shape[batch_ndim:]),
                  p.y.reshape(shape + p.y.shape[batch_ndim:]),
                  p.z.reshape(shape + p.z.shape[batch_ndim:]))


def _moveaxis(p: JPoint, src: int, dst: int) -> JPoint:
    return JPoint(jnp.moveaxis(p.x, src, dst), jnp.moveaxis(p.y, src, dst),
                  jnp.moveaxis(p.z, src, dst))


def _roll(p: JPoint, shift, axis) -> JPoint:
    return JPoint(jnp.roll(p.x, shift, axis=axis),
                  jnp.roll(p.y, shift, axis=axis),
                  jnp.roll(p.z, shift, axis=axis))


def _hs_scan(ops, pts: JPoint, combine) -> JPoint:
    """Inclusive Hillis-Steele prefix scan along axis 0 (identity =
    infinity): ONE combine instantiation, ceil(log2(size)) fori rounds.
    Only used for small sizes (level-2 chunk totals)."""
    size = pts.z.shape[0]
    if size <= 1:
        return pts
    log = (size - 1).bit_length()
    batch_shape = pts.z.shape[:pts.z.ndim - ops.elem_ndim]
    pos = jax.lax.broadcasted_iota(jnp.int32, (size,) + (1,) * (
        len(batch_shape) - 1), 0)
    inf = jac.infinity(ops, batch_shape)

    def body(i, x):
        shift = jnp.int32(1) << i
        partner = _roll(x, shift, 0)
        vmask = jnp.broadcast_to(pos >= shift, batch_shape)
        partner = jac.select(ops, vmask, partner, inf)
        return combine(partner, x)

    return jax.lax.fori_loop(0, log, body, pts)


def _pad_to(ops, pts: JPoint, m: int) -> JPoint:
    n = pts.z.shape[0]
    if m == n:
        return pts
    inf = jac.infinity(ops, (m - n,))
    if inf.z.dtype != pts.z.dtype:  # compress_z'd CRS batches
        inf = JPoint(inf.x, inf.y, inf.z.astype(pts.z.dtype))
    return _concat(ops, pts, inf)


def _scan_chunks(ops, pts: JPoint, combine, c: int, collect: bool):
    """Reshape (B*c,) -> (B, c) and lax.scan the c sequential positions
    with all B chunks in vector lanes.  Returns (totals(B,), within(B,c))
    — `within` only when collect (prefix values), else None."""
    n = pts.z.shape[0]
    b = -(-n // c)
    pts = _pad_to(ops, pts, b * c)
    grid = _moveaxis(_reshape(pts, (b, c), 1), 1, 0)  # (c, B, elem)
    carry0 = jac.infinity(ops, (b,))

    def body(carry, col):
        nxt = combine(carry, JPoint(*col))
        return nxt, (tuple(nxt) if collect else None)

    last, ys = jax.lax.scan(body, carry0, tuple(grid))
    within = _moveaxis(JPoint(*ys), 0, 1) if collect else None  # (B, c)
    return last, within


def _prefix_scan(ops, pts: JPoint, combine=None) -> JPoint:
    """Work-efficient inclusive prefix scan over axis 0 (~2N combines).

    combine=None means Jacobian add; any associative combine with identity
    = infinity works (e.g. the keep-last fill combine)."""
    comb = (partial(jac.add, ops)) if combine is None else combine
    n = pts.z.shape[0]
    if n <= 2 * _CHUNK:
        return _hs_scan(ops, pts, comb)
    totals, within = _scan_chunks(ops, pts, comb, _CHUNK, collect=True)
    b = totals.z.shape[0]
    # exclusive scan of chunk totals: shift right, then inclusive scan
    shifted = _concat(ops, jac.infinity(ops, (1,)),
                      JPoint(totals.x[:-1], totals.y[:-1], totals.z[:-1]))
    carry = _prefix_scan(ops, shifted, comb)
    carry_b = JPoint(carry.x[:, None], carry.y[:, None], carry.z[:, None])
    full = comb(_broadcast_like(ops, carry_b, within), within)
    out = _reshape(full, (b * _CHUNK,), 2)
    return JPoint(out.x[:n], out.y[:n], out.z[:n])


def _broadcast_like(ops, a: JPoint, ref: JPoint) -> JPoint:
    return JPoint(jnp.broadcast_to(a.x, ref.x.shape),
                  jnp.broadcast_to(a.y, ref.y.shape),
                  jnp.broadcast_to(a.z, ref.z.shape))


def _last(p: JPoint) -> JPoint:
    return JPoint(p.x[-1], p.y[-1], p.z[-1])


def tree_sum(ops, pts: JPoint) -> JPoint:
    """Total sum of a batch of points: repeated chunked scan-sums (work N,
    ONE add instantiation per level, <= 3 levels for n <= 2^18)."""
    pts = jac.field_z(pts)
    comb = partial(jac.add, ops)
    while pts.z.shape[0] > 1:
        n = pts.z.shape[0]
        c = min(_CHUNK, n)
        pts, _ = _scan_chunks(ops, pts, comb, c, collect=False)
    return JPoint(pts.x[0], pts.y[0], pts.z[0])


def batch_scalar_mul(ops, pts: JPoint, scalar_limbs: jnp.ndarray) -> JPoint:
    """[s_i] P_i for every i — MSB-first double-and-add under lax.scan.

    scalar_limbs: (N, L) standard-form digit vectors.  The small-N /
    correctness-oracle path (msm_naive)."""
    n_bits = params.LIMB_BITS * L  # 256; top bits of field scalars are zero
    pts = jac.field_z(pts)
    acc0 = jac.infinity(ops, (pts.z.shape[0],))
    limbs_i = scalar_limbs.astype(jnp.int32)

    def body(acc, t):
        bit_t = n_bits - 1 - t
        limb = jax.lax.dynamic_index_in_dim(
            limbs_i, bit_t // params.LIMB_BITS, axis=1, keepdims=False)
        bit = (limb >> (bit_t % params.LIMB_BITS)) & 1
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


def _digit_columns(scalar_limbs: jnp.ndarray, c: int,
                   scalar_bits: int = 0) -> jnp.ndarray:
    """(N, L) 8-bit digit scalars -> (n_windows, N) c-bit window columns
    (LSB window first).  Window w covers scalar bits [w*c, (w+1)*c);
    windows may straddle digit boundaries (multi-digit shift-or; only
    cheap integer shift/or ops — no integer multiplies).

    scalar_bits > 0 statically bounds the scalars: windows above the
    bound are all-zero and skipped entirely (small-exponent workloads —
    bit-validity scalars, bucketed digits — pay for the bits they use)."""
    lb = params.LIMB_BITS
    n_bits = min(scalar_bits, lb * L) if scalar_bits > 0 else lb * L
    n_win = -(-n_bits // c)
    mask = jnp.uint32((1 << c) - 1)
    ints = scalar_limbs.astype(jnp.uint32)
    if c % lb == 0:
        # byte-aligned windows never straddle digits: window w is just
        # digits [w*r, (w+1)*r) recombined — a reshape + shift-sum, no
        # per-window column extraction (which costs a minor-axis
        # relayout per window)
        r = c // lb
        need = n_win * r
        if need != L:
            pad = jnp.zeros(ints.shape[:-1] + (max(0, need - L),),
                            jnp.uint32)
            ints = jnp.concatenate([ints[..., :min(L, need)], pad],
                                   axis=-1)
        grp = ints.reshape(ints.shape[:-1] + (n_win, r))
        d = grp[..., 0]
        for j in range(1, r):
            d = d | (grp[..., j] << (lb * j))
        return jnp.moveaxis(d, -1, 0)
    extra = -(-(c + lb - 1) // lb)  # digits a window can straddle, minus 1
    padded = jnp.concatenate(
        [ints, jnp.zeros(ints.shape[:-1] + (extra,), jnp.uint32)], axis=-1)
    cols = []
    for w in range(n_win):
        bit0 = w * c
        lo, sh = bit0 // lb, bit0 % lb
        d = padded[:, lo] >> sh
        t = 1
        while sh + c > t * lb:
            d = d | (padded[:, lo + t] << (t * lb - sh))
            t += 1
        cols.append(d & mask)
    return jnp.stack(cols)


def _pack_points(ops, pts: JPoint) -> jnp.ndarray:
    """JPoint batch -> ONE (N, 3 * elem_size) f32 array [X | Y | Z].

    The per-window sorted-point gathers are the dominant MSM cost on TPU
    (measured at 2^19: 84 ms per window as three row gathers vs ~45 ms
    for the window's million point-adds) and the cost is per-ROW, not
    per-byte — XLA row gathers run far below HBM bandwidth.  Packing the
    three coordinates into one array makes each window ONE gather over
    3x-wider rows for ~3x less gather overhead; `_unpack_points` slices
    the coordinates back out with contiguous (cheap) minor-axis slices."""
    n = pts.z.shape[0]
    z = jac.field_z(pts).z
    return jnp.concatenate(
        [pts.x.reshape(n, -1), pts.y.reshape(n, -1), z.reshape(n, -1)],
        axis=1)


def _unpack_points(ops, packed: jnp.ndarray, elem_shape) -> JPoint:
    w = packed.shape[-1] // 3
    lead = packed.shape[:-1]
    return JPoint(
        packed[..., :w].reshape(lead + elem_shape),
        packed[..., w:2 * w].reshape(lead + elem_shape),
        packed[..., 2 * w:].reshape(lead + elem_shape))


def _bucket_window_sorted(ops, packed: jnp.ndarray, elem_shape,
                          order: jnp.ndarray,
                          d_sorted: jnp.ndarray, num_buckets: int,
                          affine: bool = False) -> JPoint:
    """sum_i digit_i * P_i for one c-bit window, given the sort permutation
    and pre-sorted digits (see module doc).

    The global point prefix is never materialized: the chunked scan gives
    within-chunk prefixes (~N combines) and each BUCKET (not each point)
    gets its chunk carry added — prefix_at_run_end = chunk_carry + within
    — so the carry fixup costs 2^c adds instead of N.  With `affine=True`
    (points satisfy the batch_normalize invariant Z in {0, one}) the N
    scan combines run the cheap fused mixed-add kernel.

    packed: `_pack_points` layout — one gather per window (see there)."""
    p_sorted = _unpack_points(ops, jnp.take(packed, order, axis=0),
                              elem_shape)
    n = p_sorted.z.shape[0]
    comb = partial(jac.madd if affine else jac.add, ops)

    cdim = min(_CHUNK, n)
    totals, within = _scan_chunks(ops, p_sorted, comb, cdim, collect=True)
    b = totals.z.shape[0]

    # exclusive chunk carries (b = n/64 points; ~2b general adds)
    shifted = _concat(ops, jac.infinity(ops, (1,)),
                      JPoint(totals.x[:-1], totals.y[:-1], totals.z[:-1]))
    carry = _prefix_scan(ops, shifted)
    flat_w = _reshape(within, (b * cdim,), 2)
    flat_w = JPoint(flat_w.x[:n], flat_w.y[:n], flat_w.z[:n])

    # run-end mask: position k closes its digit's run
    nxt = jnp.concatenate(
        [d_sorted[1:], jnp.full((1,), num_buckets, d_sorted.dtype)])
    run_end = d_sorted != nxt
    tgt = jnp.where(run_end, d_sorted.astype(jnp.int32),
                    jnp.int32(num_buckets))

    # scatter run-end within-prefixes and run-end chunk indices to bucket
    # slots; empty buckets keep (infinity, chunk 0) and carry[0] = infinity.
    # Points are packed [X | Y | Z] so the N-row scatter (the same
    # row-overhead-bound operation as the window gather) runs ONCE, not
    # three times; ditto the per-bucket carry gather.
    w = 1
    for s in elem_shape:
        w *= s
    fw_cat = jnp.concatenate(
        [flat_w.x.reshape(n, w), flat_w.y.reshape(n, w),
         flat_w.z.reshape(n, w)], axis=1)
    inf_b = jac.infinity(ops, (num_buckets,))
    inf_cat = jnp.concatenate(
        [inf_b.x.reshape(num_buckets, w), inf_b.y.reshape(num_buckets, w),
         inf_b.z.reshape(num_buckets, w)], axis=1)
    ends_w = _unpack_points(ops, inf_cat.at[tgt].set(fw_cat, mode="drop"),
                            elem_shape)
    pos_chunk = jnp.arange(n, dtype=jnp.int32) // cdim
    bucket_chunk = jnp.zeros((num_buckets,), jnp.int32).at[tgt].set(
        pos_chunk, mode="drop")
    carry_cat = jnp.concatenate(
        [carry.x.reshape(b, w), carry.y.reshape(b, w),
         carry.z.reshape(b, w)], axis=1)
    ends_c = _unpack_points(
        ops, jnp.take(carry_cat, bucket_chunk, axis=0), elem_shape)
    ends = jac.add(ops, ends_c, ends_w)

    # forward-fill E_j = prefix at the end of the last NON-EMPTY bucket
    # <= j.  Emptiness is an explicit validity flag (scattered alongside
    # the prefixes), NOT the infinity sentinel: a non-empty bucket whose
    # prefix legitimately sums to infinity (an exactly-cancelling point
    # set) must still overwrite the fill.  An int prefix-max over bucket
    # indices + one gather replaces the point-typed keep-last scan.
    valid = jnp.zeros((num_buckets,), jnp.int32).at[tgt].set(1, mode="drop")
    src = jnp.where(valid > 0,
                    jnp.arange(num_buckets, dtype=jnp.int32),
                    jnp.int32(-1))
    last_valid = jax.lax.associative_scan(jnp.maximum, src)
    ends_cat = jnp.concatenate(
        [ends.x.reshape(num_buckets, w), ends.y.reshape(num_buckets, w),
         ends.z.reshape(num_buckets, w)], axis=1)
    filled = _unpack_points(
        ops, jnp.take(ends_cat, jnp.maximum(last_valid, 0), axis=0),
        elem_shape)
    before_any = last_valid < 0            # buckets before the first run
    filled = jac.select(ops, before_any, jac.infinity(ops, (num_buckets,)),
                        filled)

    # Abel: sum_j j*B_j = num_buckets * E_top - sum_j E_j.  E_top is the
    # global point total, computed EXACTLY as last-chunk-carry + last
    # chunk total (also immune to the cancelling-prefix case).
    e_top = jac.add(ops, _last(carry), _last(totals))
    lhs = _double_n(ops, e_top, num_buckets.bit_length() - 1)
    rhs = tree_sum(ops, filled)
    return jac.add(ops, lhs, jac.neg(ops, rhs))


def _msm_impl(ops, pts: JPoint, scalar_limbs: jnp.ndarray,
              window_bits: int, win_group: int = 0,
              affine: bool = False, scalar_bits: int = 0) -> JPoint:
    digit_cols = _digit_columns(scalar_limbs, window_bits,
                                scalar_bits)  # (n_win, N)
    n_win = digit_cols.shape[0]
    # ONE batched sort for all windows, with the position iota as the
    # sort PAYLOAD: sorted digits and the permutation come out of the
    # same lax.sort (a separate take_along_axis for d_sorted measured
    # 122 ms at (16, 2^19) — minor-axis gathers are expensive).
    # Unstable sort is sound: EC addition is commutative/associative and
    # every field op is exact-canonical, so any order within an
    # equal-digit run yields bit-identical bucket sums.
    iota = jnp.broadcast_to(
        jnp.arange(digit_cols.shape[1], dtype=jnp.int32)[None],
        digit_cols.shape)
    d_sorted, order = jax.lax.sort(
        (digit_cols, iota), dimension=1, num_keys=1, is_stable=False)
    packed = _pack_points(ops, pts)
    elem_shape = pts.x.shape[1:]

    # All windows ride the batch axis of every point op (vmap), so one
    # prefix-scan step processes every window at once — the dispatch count
    # per MSM is independent of the window count.  `win_group` bounds how
    # many windows are materialized together (memory knob for huge N):
    # groups run under lax.scan, windows within a group under vmap.
    if win_group <= 0 or win_group >= n_win:
        win_group = n_win
    else:
        # shrink to the smallest group size with the same group count:
        # padded phantom windows cost real scan work
        n_grp = -(-n_win // win_group)
        win_group = -(-n_win // n_grp)
    vbucket = jax.vmap(
        lambda o, d: _bucket_window_sorted(ops, packed, elem_shape, o, d,
                                           1 << window_bits, affine))
    if win_group == n_win:
        window_sums = vbucket(order, d_sorted)
    else:
        n_grp = -(-n_win // win_group)
        pad = n_grp * win_group - n_win
        if pad:  # zero-digit windows sum to infinity: harmless at the MSB
            order = jnp.concatenate(
                [order, jnp.zeros((pad,) + order.shape[1:], order.dtype)])
            d_sorted = jnp.concatenate(
                [d_sorted,
                 jnp.zeros((pad,) + d_sorted.shape[1:], d_sorted.dtype)])
        o_g = order.reshape(n_grp, win_group, -1)
        d_g = d_sorted.reshape(n_grp, win_group, -1)

        def group_body(_, xs):
            return None, tuple(vbucket(*xs))

        _, sums = jax.lax.scan(group_body, None, (o_g, d_g))
        window_sums = JPoint(*(a.reshape((n_grp * win_group,) + a.shape[2:])
                               for a in sums))
        n_win = n_grp * win_group

    # Horner across windows, MSB window first: acc = 2^c * acc + W_w
    def horner_body(acc, w):
        acc = _double_n(ops, acc, window_bits)
        wp = JPoint(window_sums.x[n_win - 1 - w],
                    window_sums.y[n_win - 1 - w],
                    window_sums.z[n_win - 1 - w])
        return jac.add(ops, acc, wp), None

    acc, _ = jax.lax.scan(horner_body, jac.infinity(ops), jnp.arange(n_win))
    return acc


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def _msm_windowed(ops, pts: JPoint, scalar_limbs: jnp.ndarray,
                  window_bits: int, win_group: int = 0,
                  affine: bool = False, scalar_bits: int = 0) -> JPoint:
    return _msm_impl(ops, pts, scalar_limbs, window_bits, win_group, affine,
                     scalar_bits)


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def _msm_windowed_many(ops, pts: JPoint, scalar_limbs: jnp.ndarray,
                       window_bits: int, win_group: int = 0,
                       affine: bool = False,
                       scalar_bits: int = 0) -> JPoint:
    """M independent same-size MSMs in ONE vmapped kernel.

    pts: JPoint batch of shape (M, N, elem); scalar_limbs: (M, N, L).
    Returns a JPoint batch of M results.  For batch-of-proofs workloads
    (many small MSMs over DIFFERENT point sets) where per-stage batch
    width, not HBM, is the limit.  The single-prove pipeline does NOT
    use it: fusing its four G1 MSMs measured slower (the 4x gather/scan
    intermediates blow the HBM working set), and sequential same-shape
    MSMs already share one compiled executable via the jit cache."""
    return jax.vmap(
        lambda px, py, pz, s: _msm_impl(
            ops, JPoint(px, py, pz), s, window_bits, win_group, affine,
            scalar_bits))(pts.x, pts.y, pts.z, scalar_limbs)


def pick_win_group(ops, n: int) -> int:
    """Windows materialized together (the vmap width inside the MSM).
    Bounded so the ~4 live (win_group, N, elem) f32 buffers stay under a
    ~1 GiB *unpadded* budget; 0 (= all windows) below that.

    The budget looks conservative against 16 GB of HBM but is not: XLA
    tiles f32 arrays as T(8, 128), so the minor digit dim (32) pads 4x —
    a "1 GiB" buffer physically occupies 4 GiB (measured: win_group=8 at
    2^20 OOMs at 25.2 G physical for 7.2 G logical)."""
    elem_bytes = 4 * 3 * L * (1 if ops.elem_ndim == 1 else 2)
    g = (1 << 30) // max(1, n * elem_bytes)
    return 0 if g >= 32 else max(1, g)


def pick_window_bits(n: int) -> int:
    """Balance per-window point work (~2N adds regardless of c) against
    bucket-side work (~3 * 2^c adds): c ~ log2(N) - 2, clamped to [4, 16].
    Fewer windows = fewer sequential passes over the points."""
    return max(4, min(16, n.bit_length() - 3))


def msm(ops, pts: JPoint, scalar_limbs: jnp.ndarray,
        window_bits: int = 0, win_group: int = -1,
        affine: bool = False, scalar_bits: int = 0) -> JPoint:
    """Pippenger MSM: returns the single point sum_i s_i * P_i.

    pts: JPoint batch of N points; scalar_limbs: (N, L) standard form.
    window_bits 0 = auto (pick_window_bits); win_group -1 = auto
    (pick_win_group).  N is padded up to the next power of two (>= 64)
    with infinity/zero terms so different small instances share one
    compiled graph.  affine=True asserts the batch_normalize invariant
    (every Z in {0, one}) and runs the bucket scans on the cheap fused
    mixed-add kernel.

    scalar_bits > 0 is a CALLER-GUARANTEED static bound: every scalar
    must be < 2^scalar_bits.  Windows above the bound are never computed
    — a scalar exceeding it has its high windows silently dropped and
    the result is WRONG.  Use it only for structurally-bounded scalar
    sets (bit-validity scalars, pre-split window digits); leave 0 for
    general field scalars."""
    n = pts.z.shape[0]
    m = max(64, 1 << (n - 1).bit_length())
    if m != n:
        pts = _pad_to(ops, pts, m)
        scalar_limbs = jnp.concatenate(
            [scalar_limbs,
             jnp.zeros((m - n, L), scalar_limbs.dtype)])
    if window_bits == 0:
        window_bits = pick_window_bits(m)
    if win_group < 0:
        win_group = pick_win_group(ops, m)
    return _msm_windowed(ops, pts, scalar_limbs, window_bits, win_group,
                         affine, scalar_bits)


@partial(jax.jit, static_argnums=0)
def msm_naive(ops, pts: JPoint, scalar_limbs: jnp.ndarray) -> JPoint:
    """Reference MSM: batched scalar-mul then tree reduction.  O(bits * N)
    point ops — the correctness oracle for `msm` and the small-N fallback."""
    return tree_sum(ops, batch_scalar_mul(ops, pts, scalar_limbs))
