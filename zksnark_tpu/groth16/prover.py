"""The TPU prover: Groth16 setup/prove over device arrays (NTT + MSM).

This is the production path that replaces every hot loop of the reference
prover (SURVEY.md §3.3/§3.4) with device kernels:

  reference (host Rust, O(n^2))           here (JAX device, O(n log n))
  -------------------------------------   --------------------------------
  Lagrange interpolation over roots 1..n  radix-2 evaluation domain, iNTT
  u_sum = sum w_i * u_i (poly scalar)     ELL gather + Montgomery mul + sum
  h = (u v - w) / t via conv + long div   coset NTT divide_by_vanishing
  per-coefficient exp_encrypted + fold    Pippenger MSM kernels (G1 and G2)
  setup's per-element encrypt loops       batched fixed-base scalar mul

Domain choice: gates are laid out on a 2^k subgroup D of Fr*, the QAP's
vanishing polynomial is t = x^n - 1, and unused slots hold all-zero
constraint rows (0 * 0 = 0).  This changes the QAP polynomials relative to
the reference's {1..n} interpolation domain, which is sound for any
distinct-roots choice; the host tier (`qap.from_r1cs` with explicit roots =
the domain points) reproduces the exact same QAP for cross-checking —
tests pin the trapdoor and compare host and device CRS/proof bit-for-bit.

Only randomness sampling and the final (few-point) proof assembly run on
host; pairings stay host-side (verify is 4 pairings regardless of circuit
size, /root/reference/src/groth16/mod.rs:299-320).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import bn254 as hc
from ..curve import jacobian as jac
from ..curve.field_ops import FQ2_OPS, FQ_OPS
from ..curve.jacobian import JPoint
from ..field import params
from ..field.limb import (
    DT as l_DT, FR_CTX, add as l_add,
)
from ..ops.montmul import from_mont_auto as from_mont, mont_mul_auto as mont_mul
from ..frontend.r1cs import R1CS
from ..ops import msm as msmod
from ..ops import ntt as nttmod
from .protocol import Proof, SigmaG1, SigmaG2

L = params.NUM_LIMBS


# ---------------------------------------------------------------------------
# Circuit compilation: R1CS -> device tables over a radix-2 domain
# ---------------------------------------------------------------------------

@dataclass
class EllMatrix:
    """Gate-major padded sparse matrix: row g holds the (wire, value) pairs
    contributing to constraint g.  Padding entries point at wire 0 with
    value 0."""

    idx: jnp.ndarray   # (n, k) int32 wire indices
    val: jnp.ndarray   # (n, k, L) f32 digit Montgomery Fr values


@dataclass
class DeviceQAP:
    domain: nttmod.Domain
    u: EllMatrix
    v: EllMatrix
    w: EllMatrix
    num_wires: int
    input: int

    @property
    def n(self) -> int:
        return self.domain.n


def _to_ell(rows: List[List[Tuple[int, int]]], root_index, n: int,
            num_wires: int) -> EllMatrix:
    """Per-wire sparse rows -> gate-major ELL tables."""
    per_gate: List[List[Tuple[int, int]]] = [[] for _ in range(n)]
    for wire, points in enumerate(rows):
        for root, value in points:
            per_gate[root_index[root]].append((wire, value))
    k = max(1, max((len(g) for g in per_gate), default=1))
    idx = np.zeros((n, k), dtype=np.int32)
    vals = np.zeros((n, k), dtype=object)
    for g, entries in enumerate(per_gate):
        for j, (wire, value) in enumerate(entries):
            idx[g, j] = wire
            vals[g, j] = value
    val_limbs = FR_CTX.to_mont_np(vals)
    return EllMatrix(idx=jnp.asarray(idx), val=jnp.asarray(val_limbs))


def compile_r1cs(r1cs: R1CS, min_log_n: int = 1) -> DeviceQAP:
    """Lay the constraint system out on the smallest 2^k >= num_gates."""
    n_gates = r1cs.num_gates
    log_n = max(min_log_n, max(1, (n_gates - 1).bit_length()))
    domain = nttmod.get_domain(log_n)
    root_index = {r: i for i, r in enumerate(r1cs.roots)}
    return DeviceQAP(
        domain=domain,
        u=_to_ell(r1cs.u, root_index, domain.n, r1cs.num_wires),
        v=_to_ell(r1cs.v, root_index, domain.n, r1cs.num_wires),
        w=_to_ell(r1cs.w, root_index, domain.n, r1cs.num_wires),
        num_wires=r1cs.num_wires,
        input=r1cs.input,
    )


def domain_roots(domain: nttmod.Domain) -> List[int]:
    """The domain points as python ints (for host-tier cross-checks)."""
    out, acc, p = [], 1, FR_CTX.p
    for _ in range(domain.n):
        out.append(acc)
        acc = acc * domain.omega % p
    return out


# ---------------------------------------------------------------------------
# Device CRS
# ---------------------------------------------------------------------------

@dataclass
class DeviceCRS:
    """Device-resident CRS arrays for the prover + small host Sigma parts
    (protocol.verify consumes the host parts unchanged)."""

    xi_g1: JPoint          # n points  E1(x^i)
    xi_t_g1: JPoint        # n-1 points E1(x^i t(x)/delta)
    sum_delta_g1: JPoint   # num_wires - input - 1 points
    xi_g2: JPoint          # n points  E2(x^i)
    sigmag1: SigmaG1       # host (alpha/beta/delta + sum_gamma; xi=None)
    sigmag2: SigmaG2       # host (beta/gamma/delta; xi=None)


def _host_points_to_jac(ops, pts) -> JPoint:
    """List of host affine points (or None) -> device JPoint batch."""
    xs, ys, infs = [], [], []
    zero = 0 if ops.elem_ndim == 1 else (0, 0)
    for p in pts:
        if p is None:
            xs.append(zero)
            ys.append(zero)
            infs.append(True)
        else:
            xs.append(p[0])
            ys.append(p[1])
            infs.append(False)
    x = jnp.asarray(ops.to_mont_np(xs))
    y = jnp.asarray(ops.to_mont_np(ys))
    z = ops.one((len(pts),))
    mask = jnp.asarray(np.array(infs))
    z = jnp.where(ops.bmask(mask), jnp.zeros_like(z), z)
    return JPoint(x, y, z)


_COMB_BITS = 8
_comb_cache: dict = {}


def _comb_table(ops, base_affine) -> JPoint:
    """Host-precomputed fixed-base comb table as a device JPoint batch of
    shape (n_windows, 2^c): T[w, d] = d * 2^(c*w) * base.

    Each row is built incrementally (T[w, d] = T[w, d-1] + step), ~2^c
    host adds per window — cheap because the base is FIXED (the 69/96
    generators of fr.rs:106-113 times the CRS trapdoor happens later on
    device).  Cached per (curve, base)."""
    key = (ops.elem_ndim, base_affine)
    hit = _comb_cache.get(key)
    if hit is not None:
        return hit
    g1 = ops.elem_ndim == 1
    addf = hc.g1_add if g1 else hc.g2_add
    n_win = (params.LIMB_BITS * L) // _COMB_BITS
    flat = []
    step = base_affine
    for _ in range(n_win):
        row = [None]
        for _ in range(1, 1 << _COMB_BITS):
            row.append(addf(row[-1], step))
        flat.extend(row)
        for _ in range(_COMB_BITS):
            step = addf(step, step)
    pts = _host_points_to_jac(ops, flat)
    table = JPoint(
        pts.x.reshape((n_win, 1 << _COMB_BITS) + pts.x.shape[1:]),
        pts.y.reshape((n_win, 1 << _COMB_BITS) + pts.y.shape[1:]),
        pts.z.reshape((n_win, 1 << _COMB_BITS) + pts.z.shape[1:]))
    _comb_cache[key] = table
    return table


def _digits8(scalars_std: jnp.ndarray) -> jnp.ndarray:
    """(m, L) standard-form 8-bit digit scalars -> (m, L) int32 comb
    digits (with 8-bit digits the comb windows ARE the digits)."""
    return scalars_std.astype(jnp.int32)


def _comb_encrypt_impl(ops, table: JPoint, scalars_std: jnp.ndarray
                       ) -> JPoint:
    """E(s_i) = s_i * base via the comb table: one gather + one complete
    add per 8-bit digit window (32 adds per element total) instead of 256
    double-and-add steps.  scalars_std: (m, L) standard-form limbs."""
    digits = _digits8(scalars_std)
    m = digits.shape[0]

    def body(acc, inp):
        tx, ty, tz, dw = inp
        pt = JPoint(jnp.take(tx, dw, axis=0), jnp.take(ty, dw, axis=0),
                    jnp.take(tz, dw, axis=0))
        # comb-table entries are affine-or-infinity -> cheap mixed add
        return jac.madd(ops, acc, pt), None

    acc0 = jac.infinity(ops, (m,))
    acc, _ = jax.lax.scan(
        body, acc0, (table.x, table.y, table.z, digits.T))
    return acc


@partial(jax.jit, static_argnums=0)
def _comb_encrypt(ops, table: JPoint, scalars_std: jnp.ndarray) -> JPoint:
    return _comb_encrypt_impl(ops, table, scalars_std)


@lru_cache(maxsize=None)
def _comb_encrypt_sharded_fn(ops, mesh, axis: str):
    """Mesh-sharded comb encryption: the per-element comb scan is
    embarrassingly point-parallel, so each chip encrypts its scalar
    stripe against the replicated (tiny: 32 x 256 points) table.
    One jitted shard_map per (ops, mesh) — the four CRS pieces share it."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local(tx, ty, tz, scalars_l):
        out = _comb_encrypt_impl(ops, JPoint(tx, ty, tz), scalars_l)
        return out.x, out.y, out.z

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_rep=False,
    )
    return jax.jit(fn)


def _fixed_base_encrypt(ops, base_affine, scalars_std: jnp.ndarray,
                        pad_to: int = 0, mesh=None,
                        axis: str = "shard") -> JPoint:
    """Batched fixed-base scalar-mul: E(s_i) = s_i * base.

    scalars_std: device (m, L) standard-form limbs.  pad_to: round the
    batch up (zero scalars) so different CRS pieces share one compiled
    kernel; pad rows are sliced off.  mesh: shard the comb scan over the
    mesh (setup's dominant cost; see _comb_encrypt_sharded_fn) — the
    batch_normalize stays global (its cost is ~2 field muls per point vs
    the scan's ~32 point adds, and it needs one host inversion)."""
    n = scalars_std.shape[0]
    m = max(n, pad_to)
    if mesh is not None:
        m += (-m) % mesh.shape[axis]
    if m != n:
        scalars_std = jnp.concatenate(
            [scalars_std, jnp.zeros((m - n, L), l_DT)])
    table = _comb_table(ops, base_affine)
    if mesh is not None:
        fn = _comb_encrypt_sharded_fn(ops, mesh, axis)
        out = JPoint(*fn(table.x, table.y, table.z, scalars_std))
    else:
        out = _comb_encrypt(ops, table, scalars_std)
    # normalize BEFORE slicing so every same-padded piece shares one
    # compiled graph; the DeviceCRS invariant (Z in {0, one}) is what
    # lets every prover MSM run mixed adds (msm affine=True).  Z is then
    # stored as uint8 digits (exact for {0, one}) — at 2^20 the four f32
    # Z arrays would cost ~2.4 GB of physical HBM for one bit per point
    out = jac.batch_normalize(ops, out)
    if m != n:
        out = JPoint(out.x[:n], out.y[:n], out.z[:n])
    return jac.compress_z(out)


@partial(jax.jit, static_argnums=(0, 1))
def _setup_scalars(domain, num_wires: int, ells, dt, xi_mont: jnp.ndarray,
                   alpha_mont: jnp.ndarray, beta_mont: jnp.ndarray,
                   txd_mont: jnp.ndarray, dinv_mont: jnp.ndarray):
    """Device stage of setup: all CRS scalar vectors in one jit.

    - Lagrange-basis values at the trapdoor point x in ONE iNTT:
      L_g(x) = (1/n) sum_j w^{-gj} x^j = iNTT(xi)[g]  — replaces the
      reference's per-wire polynomial evaluations (mod.rs:147-164);
    - combined_i = beta*u_i(x) + alpha*v_i(x) + w_i(x) per wire as a
      segmented field sum over the ELL entries (ops/scans.py);
    - xi_t and sum_delta scalars as pointwise Montgomery products.

    Returns standard-form (xi, xi_t, sum_delta scalars, combined head).
    """
    from ..ops import scans

    lag = nttmod.intt(domain, xi_mont, dt)  # (n, L) Montgomery L_g(x)

    def prods(ell_idx, ell_val, scale):
        lg = lag if scale is None else mont_mul(FR_CTX, lag, scale[None, :])
        pr = mont_mul(FR_CTX, ell_val, lg[:, None, :])   # (n, k, L)
        return pr.reshape(-1, L), ell_idx.reshape(-1)

    (u_idx, u_val), (v_idx, v_val), (w_idx, w_val) = ells
    pu, iu = prods(u_idx, u_val, beta_mont)
    pv, iv = prods(v_idx, v_val, alpha_mont)
    pw, iw = prods(w_idx, w_val, None)
    combined = scans.field_segment_sums(
        FR_CTX, jnp.concatenate([iu, iv, iw]),
        jnp.concatenate([pu, pv, pw]), num_wires)   # (num_wires, L) mont

    xi_std = from_mont(FR_CTX, xi_mont)
    xi_t_std = from_mont(
        FR_CTX, mont_mul(FR_CTX, xi_mont[:-1], txd_mont[None, :]))
    sum_delta_std = from_mont(
        FR_CTX, mont_mul(FR_CTX, combined, dinv_mont[None, :]))
    return xi_std, xi_t_std, sum_delta_std, combined


def device_setup(
    dqap: DeviceQAP,
    trapdoor: Optional[Tuple[int, int, int, int, int]] = None,
    rng=None,
    mesh=None,
) -> DeviceCRS:
    """CRS generation: the powers-of-tau/encryption loops (reference hot
    loop #2, groth16/mod.rs:139-194) as device kernels end-to-end —
    one iNTT for the Lagrange values, a segmented field sum for the
    per-wire combination, and batched fixed-base comb scalar-muls for
    every encryption.  Host work is O(n) bigint powers + O(input) sigma
    points.

    mesh: a jax.sharding.Mesh — the comb encryptions (the dominant cost,
    ~32 point adds per CRS point) run shard_map'd over the mesh with each
    chip encrypting its scalar stripe; single-chip HBM then caps only the
    per-chip CRS stripe instead of the whole CRS."""
    import os as _os
    import random as _random
    import sys as _sys
    import time as _time

    _t0 = _time.time()
    _verbose = bool(_os.environ.get("ZKSNARK_TPU_SETUP_TRACE"))

    def _mark(label, *arrs):
        if _verbose:  # sync only when tracing: keeps stages overlapped
            for a in arrs:
                jax.block_until_ready(a)
            print(f"[setup] {label} +{_time.time() - _t0:.1f}s",
                  file=_sys.stderr, flush=True)

    f = FR_CTX.p
    if trapdoor is None:
        r = rng or _random
        trapdoor = tuple(r.randrange(1, f) for _ in range(5))
    alpha, beta, gamma, delta, x = (t % f for t in trapdoor)
    n = dqap.n

    # xi = x^0 .. x^{n-1} as an outer Montgomery product of two host
    # power chains of length ~sqrt(n): xi[a*k + b] = (x^k)^a * x^b.
    # Replaces O(n) host bigint mults + an O(n) host Montgomery codec
    # (~11 s at 2^20) with O(sqrt n) host work and one device montmul;
    # bit-exact because REDC returns canonical digits.
    k = 1 << (n.bit_length() // 2)       # k | n (n is a power of two)
    k = min(k, n)
    m = n // k
    lo = [1] * k
    for i in range(1, k):
        lo[i] = lo[i - 1] * x % f
    xk = lo[-1] * x % f                  # x^k
    hi = [1] * m
    for i in range(1, m):
        hi[i] = hi[i - 1] * xk % f
    lo_m = jnp.asarray(FR_CTX.to_mont_np(lo))
    hi_m = jnp.asarray(FR_CTX.to_mont_np(hi))
    xi_mont = mont_mul(FR_CTX, hi_m[:, None, :],
                       lo_m[None, :, :]).reshape(n, L)

    t_x = (pow(x, n, f) - 1) % f
    gamma_inv = pow(gamma, -1, f)
    delta_inv = pow(delta, -1, f)
    _mark("xi host powers")

    ells = ((dqap.u.idx, dqap.u.val), (dqap.v.idx, dqap.v.val),
            (dqap.w.idx, dqap.w.val))
    to_m = lambda v: jnp.asarray(FR_CTX.to_mont_np([v])[0])  # noqa: E731
    xi_std, xi_t_std, sum_delta_std, _ = _setup_scalars(
        dqap.domain, dqap.num_wires, ells, dqap.domain.t, xi_mont,
        to_m(alpha), to_m(beta), to_m(t_x * delta_inv % f),
        to_m(delta_inv))
    _mark("setup scalars (iNTT + segmented sum)", xi_std)

    g1_base = hc.g1_scalar_mul(hc.G1_GEN_PT, params.ENCRYPT_G1_SCALE)
    g2_base = hc.g2_scalar_mul(hc.G2_GEN, params.ENCRYPT_G2_SCALE)

    # small host parts: sum_gamma needs the first input+1 combined values
    head = sum_delta_std[:dqap.input + 1]
    head_ints = FR_CTX.from_limbs_np(np.asarray(head))
    sum_gamma = [
        hc.g1_scalar_mul(g1_base, int(c) * delta % f * gamma_inv % f)
        for c in head_ints
    ]
    sigmag1 = SigmaG1(
        alpha=hc.g1_scalar_mul(g1_base, alpha),
        beta=hc.g1_scalar_mul(g1_base, beta),
        delta=hc.g1_scalar_mul(g1_base, delta),
        xi=None, sum_gamma=sum_gamma, sum_delta=None, xi_t=None)
    sigmag2 = SigmaG2(
        beta=hc.g2_scalar_mul(g2_base, beta),
        gamma=hc.g2_scalar_mul(g2_base, gamma),
        delta=hc.g2_scalar_mul(g2_base, delta),
        xi=None)
    _mark("host sigma")

    # big device parts; G1 pieces padded to n to share ONE compiled kernel
    xi_g1 = _fixed_base_encrypt(FQ_OPS, g1_base, xi_std, mesh=mesh)
    _mark("xi_g1 encrypt", xi_g1.x)
    xi_g2 = _fixed_base_encrypt(FQ2_OPS, g2_base, xi_std, mesh=mesh)
    _mark("xi_g2 encrypt", xi_g2.x)
    xi_t_g1 = _fixed_base_encrypt(FQ_OPS, g1_base, xi_t_std, pad_to=n,
                                  mesh=mesh)
    sum_delta_g1 = _fixed_base_encrypt(
        FQ_OPS, g1_base, sum_delta_std[dqap.input + 1:], pad_to=n,
        mesh=mesh)
    _mark("xi_t+sum_delta encrypt", xi_t_g1.x, sum_delta_g1.x)
    return DeviceCRS(
        xi_g1=xi_g1, xi_t_g1=xi_t_g1, sum_delta_g1=sum_delta_g1,
        xi_g2=xi_g2, sigmag1=sigmag1, sigmag2=sigmag2)


# ---------------------------------------------------------------------------
# Device prove
# ---------------------------------------------------------------------------

def _weighted_evals(idx: jnp.ndarray, val: jnp.ndarray,
                    weights_mont: jnp.ndarray) -> jnp.ndarray:
    """Evaluations of sum_i w_i * row_i on the domain: ELL gather-mul-sum."""
    gathered = jnp.take(weights_mont, idx, axis=0)       # (n, k, L)
    prods = mont_mul(FR_CTX, gathered, val)              # (n, k, L)
    acc = prods[:, 0]
    for j in range(1, prods.shape[1]):
        acc = l_add(FR_CTX, acc, prods[:, j])
    return acc


@partial(jax.jit, static_argnums=(0, 1))
def _witness_quotient(domain, n_input: int, ell_arrays,
                      weights_mont: jnp.ndarray, dt=None):
    """Jitted stage 1: ELL witness reduction -> iNTT -> coset quotient.
    Returns standard-form scalar vectors (u, v, h, tail-witness).

    dt: the DomainTables pytree, passed through the jit boundary so the
    twiddle/coset tables are arguments, not embedded HLO constants."""
    (u_idx, u_val), (v_idx, v_val), (w_idx, w_val) = ell_arrays
    dom = domain
    if dt is None:
        dt = dom.t

    u_evals = _weighted_evals(u_idx, u_val, weights_mont)
    v_evals = _weighted_evals(v_idx, v_val, weights_mont)
    w_evals = _weighted_evals(w_idx, w_val, weights_mont)

    u_c = nttmod.intt(dom, u_evals, dt)
    v_c = nttmod.intt(dom, v_evals, dt)
    h_c = nttmod.divide_by_vanishing(dom, u_evals, v_evals, w_evals, dt)

    u_std = from_mont(FR_CTX, u_c)
    v_std = from_mont(FR_CTX, v_c)
    h_std = from_mont(FR_CTX, h_c)
    wit_std = from_mont(FR_CTX, weights_mont[n_input + 1:])
    return u_std, v_std, h_std, wit_std


def _pad_msm(ops, pts: JPoint, scalars: jnp.ndarray, n: int):
    """Pad an MSM instance to exactly n terms (infinity points, zero
    scalars) so same-size MSMs share one compiled kernel.  Points and
    scalars are padded independently (their lengths may differ when the
    caller over-provisioned the point table)."""
    if pts.z.shape[0] < n:
        inf = jac.infinity(ops, (n - pts.z.shape[0],))
        pts = JPoint(jnp.concatenate([pts.x, inf.x]),
                     jnp.concatenate([pts.y, inf.y]),
                     jnp.concatenate(
                         [pts.z, inf.z.astype(pts.z.dtype)]))
    if scalars.shape[0] < n:
        scalars = jnp.concatenate(
            [scalars,
             jnp.zeros((n - scalars.shape[0], L), dtype=l_DT)])
    return pts, scalars


def _prove_core(domain, n_input: int, window_bits: int, ell_arrays,
                crs_arrays, weights_box: list):
    """Device pipeline orchestrator.  Stage 1 (NTT quotient) is one jit;
    the four G1 MSMs are padded to a common size so they all hit ONE
    compiled Pippenger kernel; the G2 MSM is the fifth call.

    weights_box: a single-element list holding the (num_wires, L)
    Montgomery witness vector; the list is emptied here so the buffer's
    last reference dies as soon as stage 1 has consumed it.  HBM at the
    big sizes is tight (the 2^20 CRS alone is ~5 GB physical), so every
    intermediate is dropped at its last use — the XLA runtime keeps each
    buffer alive until its queued computations finish, so deleting a
    reference right after dispatch is safe and exact."""
    xi_g1, xi_t_g1, sum_delta_g1, xi_g2 = crs_arrays
    n = domain.n
    # accept either the owning single-element list or a raw array (tests
    # and the sharded cross-check pass arrays; only the boxed form frees)
    weights_mont = (weights_box.pop() if isinstance(weights_box, list)
                    else weights_box)
    u_std, v_std, h_std, wit_std = _witness_quotient(
        domain, n_input, ell_arrays, weights_mont, domain.t)
    del weights_mont  # dead after stage 1
    if n >= (1 << 19):
        # sequence the two HBM peaks: at 2^20 the quotient's planned
        # buffers + CRS fill most of the chip, and the eager MSM prep
        # allocations below would otherwise be requested WHILE the
        # quotient executes (the round-5 OOM).  One scalar transfer is
        # the only reliable completion barrier through the remote-TPU
        # tunnel (jax.block_until_ready returns early there — measured).
        # The barrier's own tiny slice needs a device allocation that
        # can itself fail while the queued pipeline holds its
        # high-water mark, so retry until the queue drains.
        import time as _time
        for _try in range(150):
            try:
                np.asarray(u_std[0, 0])
                break
            except Exception as e:  # jaxlib runtime error types vary
                if "RESOURCE_EXHAUSTED" not in repr(e) or _try == 149:
                    raise
                _time.sleep(2.0)

    wb = window_bits
    # the four G1 MSMs are padded to one common size m so they share ONE
    # compiled executable (same shapes + static args -> one jit cache
    # entry).  They run SEQUENTIALLY on purpose: a vmapped 4-way fusion
    # (msmod._msm_windowed_many) was measured SLOWER at 2^16 (5.2 s vs
    # 3.25 s prove) — the 4x gather/scan intermediates blow the HBM
    # working set without reducing the per-MSM critical path.
    m = max(n, sum_delta_g1.z.shape[0], wit_std.shape[0])
    xi_p, u_p = _pad_msm(FQ_OPS, xi_g1, u_std, m)
    _, v_p = _pad_msm(FQ_OPS, xi_g1, v_std, m)
    hp, hs = _pad_msm(FQ_OPS, xi_t_g1, h_std[:n - 1], m)
    dp, ds = _pad_msm(FQ_OPS, sum_delta_g1, wit_std, m)
    del h_std, wit_std  # padded copies supersede them
    wg1 = msmod.pick_win_group(FQ_OPS, m)
    wg2 = msmod.pick_win_group(FQ2_OPS, n)
    # affine=True: DeviceCRS point sets satisfy the batch_normalize
    # invariant (device_setup/serialization guarantee Z in {0, one})
    a_g1 = msmod._msm_windowed(FQ_OPS, xi_p, u_p, wb, wg1, True)
    del u_p, u_std
    b_g1 = msmod._msm_windowed(FQ_OPS, xi_p, v_p, wb, wg1, True)
    del xi_p, v_p
    h_xt = msmod._msm_windowed(FQ_OPS, hp, hs, wb, wg1, True)
    del hp, hs
    c_delta = msmod._msm_windowed(FQ_OPS, dp, ds, wb, wg1, True)
    del dp, ds
    b_g2 = msmod._msm_windowed(FQ2_OPS, xi_g2, v_std, wb, wg2, True)

    return a_g1, b_g1, b_g2, h_xt, c_delta


def device_prove(
    dqap: DeviceQAP,
    crs: DeviceCRS,
    weights: Sequence[int],
    blinding: Optional[Tuple[int, int]] = None,
    rng=None,
    mesh=None,
) -> Proof:
    """Full prover: device pipeline + host final assembly (mirrors
    groth16/mod.rs:213-296 term by term).

    mesh: a jax.sharding.Mesh — the device pipeline runs the distributed
    four-step quotient + point-sharded MSMs (`parallel.prove_sharded`)
    instead of the single-chip kernels; requires domain n >= mesh_size^2
    (the four-step split).  Host assembly is identical either way."""
    import random as _random

    f = FR_CTX.p
    if blinding is None:
        rr = rng or _random
        blinding = (rr.randrange(1, f), rr.randrange(1, f))
    r, s = (b % f for b in blinding)

    w_full = list(weights) + [0] * (dqap.num_wires - len(weights))
    # standard-form digits on host (bytes codec), Montgomery scaling on
    # device (one montmul by R^2): the host python `(x << 256) % p` per
    # wire was ~3 s of the 2^20 prove
    w_std = jnp.asarray(FR_CTX.to_limbs_np(w_full))
    weights_mont = mont_mul(FR_CTX, w_std, FR_CTX.r2_limbs)
    del w_std

    crs_arrays = (crs.xi_g1, crs.xi_t_g1, crs.sum_delta_g1, crs.xi_g2)
    ell_arrays = ((dqap.u.idx, dqap.u.val), (dqap.v.idx, dqap.v.val),
                  (dqap.w.idx, dqap.w.val))
    if mesh is not None:
        from ..parallel import prove_sharded as psh

        n_dev = mesh.devices.size
        window_bits = msmod.pick_window_bits(max(64, dqap.n // n_dev))
        a_g1, b_g1, b_g2, h_xt, c_delta = psh.sharded_prove_step(
            mesh, dqap.domain, dqap.input, window_bits, ell_arrays,
            crs_arrays, weights_mont, num_wires=dqap.num_wires)
    else:
        window_bits = msmod.pick_window_bits(dqap.n)
        wbox = [weights_mont]
        del weights_mont  # _prove_core owns (and frees) the buffer now
        a_g1, b_g1, b_g2, h_xt, c_delta = _prove_core(
            dqap.domain, dqap.input, window_bits, ell_arrays, crs_arrays,
            wbox)

    a_aff = jac.to_affine_np(FQ_OPS, a_g1)
    b1_aff = jac.to_affine_np(FQ_OPS, b_g1)
    b2_aff = jac.to_affine_np(FQ2_OPS, b_g2)
    hxt_aff = jac.to_affine_np(FQ_OPS, h_xt)
    cdelta_aff = jac.to_affine_np(FQ_OPS, c_delta)

    sg1, sg2 = crs.sigmag1, crs.sigmag2
    a = hc.g1_add(hc.g1_add(a_aff, sg1.alpha),
                  hc.g1_scalar_mul(sg1.delta, r))
    b = hc.g2_add(hc.g2_add(b2_aff, sg2.beta),
                  hc.g2_scalar_mul(sg2.delta, s))

    c = hc.g1_add(hxt_aff, cdelta_aff)
    c = hc.g1_add(c, hc.g1_scalar_mul(a, s))
    inner = hc.g1_add(hc.g1_add(sg1.beta, b1_aff),
                      hc.g1_scalar_mul(sg1.delta, s))
    c = hc.g1_add(c, hc.g1_scalar_mul(inner, r))
    c = hc.g1_add(c, hc.g1_neg(hc.g1_scalar_mul(sg1.delta, r * s % f)))

    return Proof(a=a, b=b, c=c)
