"""Multi-chip Groth16 prove step over a jax.sharding.Mesh.

Scale-out layout (SURVEY.md §2 #21/#22: the reference has no parallelism
at all — this axis is new):

- **witness reduction** (ELL gather-mul-sum): gate-sharded ("shard" axis),
  with the constraint rows pre-permuted to the four-step NTT's evaluation
  layout so the reduction output is *already* in distributed-NTT order —
  no gather, no reshuffle;
- **NTT quotient**: the four-step (Bailey) factorization from
  `ntt_sharded` — every transform does 1/d of the butterflies per chip and
  ONE all-to-all over ICI.  The full quotient pipeline
  (3 iNTT -> coset scale -> 3 NTT -> pointwise -> 1 iNTT) runs inside one
  shard_map: 7 all-to-alls total, never a full-vector all_gather;
- **MSMs**: point-sharded per chip (local Pippenger) with the per-chip
  partial sums gathered and folded (see `msm_sharded`).  The CRS point
  arrays are permuted ONCE (per prove call here; at setup in a production
  deployment) into the same four-step coefficient order the quotient
  emits, so scalars and points stay aligned shard-by-shard.

Compile economics: every shard_map callable here is built once per
(mesh, domain) configuration and cached, so the four same-shape G1 MSMs
and repeated prove steps reuse compiled executables.

`sharded_prove_step` returns the same Jacobian partials as the single-chip
`groth16.prover._prove_core`, so `device_prove` semantics carry over.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curve.field_ops import FQ2_OPS, FQ_OPS
from ..curve.jacobian import JPoint
from ..field import params
from ..field.limb import FR_CTX, sub as l_sub
from ..ops.montmul import from_mont_auto as from_mont, mont_mul_auto as mont_mul
from ..groth16 import prover as prover_mod
from ..ops import ntt as nttmod
from . import ntt_sharded as nsh
from .msm_sharded import msm_sharded

L = params.NUM_LIMBS


@lru_cache(maxsize=None)
def _sharded_domain(log_n: int, n_dev: int) -> nsh.ShardedDomain:
    """Split 2^log_n = n1 * n2 with d | n1 and d | n2 (requires
    log_n >= 2*log2(d))."""
    log_d = (n_dev - 1).bit_length()
    assert n_dev == 1 << log_d, "mesh size must be a power of two"
    log_n1 = max(log_n // 2, log_d)
    log_n2 = log_n - log_n1
    assert log_n2 >= log_d, (
        f"need domain n >= mesh_size^2 for the four-step split "
        f"(log_n={log_n}, n_dev={n_dev})")
    return nsh.ShardedDomain(log_n1, log_n2)


@lru_cache(maxsize=None)
def _quotient_fn(mesh: Mesh, sd: nsh.ShardedDomain, n_input: int,
                 num_wires: int, axis: str):
    """The distributed witness-reduction + quotient pipeline (one jit)."""
    n, n1, n2 = sd.n, sd.n1, sd.n2
    d = mesh.shape[axis]
    dom = sd.dom_full
    vinv = dom.vanishing_inv_mont

    def local(u_idx, u_val, v_idx, v_val, w_idx, w_val, weights,
              tw, tw_inv, coset, coset_inv):
        # ELL rows arrive pre-permuted to eval_perm order, gate-sharded:
        # the local (n/d, L) reduction output IS the C-layout block.
        def evals_c(idx, val):
            e = prover_mod._weighted_evals(idx, val, weights)
            return e.reshape(n1 // d, n2, L)

        u_c = evals_c(u_idx, u_val)
        v_c = evals_c(v_idx, v_val)
        w_c = evals_c(w_idx, w_val)

        # coefficients (M-layout, coeff_perm order when flattened)
        u_m = nsh.intt_local_block(sd, axis, u_c, tw_inv)
        v_m = nsh.intt_local_block(sd, axis, v_c, tw_inv)
        w_m = nsh.intt_local_block(sd, axis, w_c, tw_inv)

        # coset evaluations: scale by g^j (coeff_perm-ordered slice), NTT
        coset_m = coset.reshape(n1, n2 // d, L)
        coset_inv_m = coset_inv.reshape(n1, n2 // d, L)

        def coset_fwd(m):
            return nsh.ntt_local_block(
                sd, axis, mont_mul(FR_CTX, m, coset_m), tw)

        ue = coset_fwd(u_m)
        ve = coset_fwd(v_m)
        we = coset_fwd(w_m)
        num = l_sub(FR_CTX, mont_mul(FR_CTX, ue, ve), we)
        q = mont_mul(FR_CTX, num, vinv[None, None, :])
        h_m = nsh.intt_local_block(sd, axis, q, tw_inv)
        h_m = mont_mul(FR_CTX, h_m, coset_inv_m)

        # witness tail, padded to n, this chip's natural slice
        tail = weights[n_input + 1:num_wires]
        tail = jnp.concatenate(
            [tail, jnp.zeros((n - tail.shape[0], L), tail.dtype)])
        lo = jax.lax.axis_index(axis) * (n // d)
        wit_l = jax.lax.dynamic_slice_in_dim(tail, lo, n // d, axis=0)

        def out(m):
            return from_mont(FR_CTX, m.reshape(n // d, L))

        return out(u_m), out(v_m), out(h_m), from_mont(FR_CTX, wit_l)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_rep=False,
    )
    return jax.jit(fn)


@lru_cache(maxsize=None)
def _perms(sd: nsh.ShardedDomain, n_dev: int):
    ep = nsh.eval_perm(sd, n_dev)
    cp = nsh.coeff_perm(sd, n_dev)
    return jnp.asarray(ep), jnp.asarray(cp)


def _take_pts(pts: JPoint, perm) -> JPoint:
    return JPoint(jnp.take(pts.x, perm, axis=0),
                  jnp.take(pts.y, perm, axis=0),
                  jnp.take(pts.z, perm, axis=0))


def sharded_witness_quotient(mesh: Mesh, domain, n_input: int,
                             num_wires: int, ell_arrays,
                             weights_mont: jnp.ndarray, axis: str = "shard"):
    """Distributed four-step quotient pipeline.

    Returns (u_std, v_std, h_std, wit_std) standard-form scalar vectors of
    length n, shard-aligned: u/v/h in four-step *coefficient-perm* order
    (pair them with coeff_perm-permuted CRS points), wit in natural order.
    """
    n_dev = mesh.shape[axis]
    sd = _sharded_domain(domain.log_n, n_dev)
    assert num_wires - n_input - 1 <= domain.n, (
        "witness tail longer than the domain; widen the domain")
    ep, cp = _perms(sd, n_dev)
    (u_idx, u_val), (v_idx, v_val), (w_idx, w_val) = ell_arrays
    fn = _quotient_fn(mesh, sd, n_input, num_wires, axis)
    return fn(
        jnp.take(u_idx, ep, axis=0), jnp.take(u_val, ep, axis=0),
        jnp.take(v_idx, ep, axis=0), jnp.take(v_val, ep, axis=0),
        jnp.take(w_idx, ep, axis=0), jnp.take(w_val, ep, axis=0),
        weights_mont, sd.tw, sd.tw_inv,
        jnp.asarray(np.take(domain.coset_pows_np(), np.asarray(cp), axis=0)),
        jnp.asarray(np.take(domain.coset_pows_np(inverse=True),
                            np.asarray(cp), axis=0)))


def sharded_prove_step(mesh: Mesh, domain, n_input: int, window_bits: int,
                       ell_arrays, crs_arrays, weights_mont: jnp.ndarray,
                       axis: str = "shard", num_wires: int = 0):
    """Full multi-chip prove step: returns (a_g1, b_g1, b_g2, h_xt,
    c_delta) Jacobian partials, ready for host assembly."""
    xi_g1, xi_t_g1, sum_delta_g1, xi_g2 = crs_arrays
    n = domain.n
    n_dev = mesh.shape[axis]
    sd = _sharded_domain(domain.log_n, n_dev)
    _, cp = _perms(sd, n_dev)
    if not num_wires:
        # infer: weights_mont is the padded full witness vector
        num_wires = weights_mont.shape[0]

    u_std, v_std, h_std, wit_std = sharded_witness_quotient(
        mesh, domain, n_input, num_wires, ell_arrays, weights_mont, axis)

    # CRS points into the same orders as the scalar vectors (one gather;
    # a production deployment does this once at setup time)
    xi_g1_p = _take_pts(xi_g1, cp)
    xi_g2_p = _take_pts(xi_g2, cp)
    xi_t_pad, _ = prover_mod._pad_msm(
        FQ_OPS, xi_t_g1, jnp.zeros((n, L), h_std.dtype), n)
    xi_t_p = _take_pts(xi_t_pad, cp)
    sum_delta_pad, _ = prover_mod._pad_msm(
        FQ_OPS, sum_delta_g1, jnp.zeros((n, L), h_std.dtype), n)

    # affine=True: CRS point sets satisfy the batch_normalize invariant
    # (device_setup guarantee); permutation/padding preserve it
    def g1_msm(pts, scalars):
        return msm_sharded(FQ_OPS, mesh, pts, scalars, axis, window_bits,
                           affine=True)

    a_g1 = g1_msm(xi_g1_p, u_std)
    b_g1 = g1_msm(xi_g1_p, v_std)
    h_xt = g1_msm(xi_t_p, h_std)
    c_delta = g1_msm(sum_delta_pad, wit_std)
    b_g2 = msm_sharded(FQ2_OPS, mesh, xi_g2_p, v_std, axis, window_bits,
                       affine=True)

    return a_g1, b_g1, b_g2, h_xt, c_delta
