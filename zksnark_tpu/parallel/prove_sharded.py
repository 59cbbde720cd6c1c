"""Multi-chip Groth16 prove step over a jax.sharding.Mesh.

Scale-out layout (SURVEY.md §2 #21/#22: the reference has no parallelism
at all — this axis is new):

- **witness reduction** (ELL gather-mul-sum): gate-sharded ("shard" axis),
  combined with an all_gather of the per-shard evaluation slices;
- **NTT quotient**: computed replicated per chip this round (the
  all-to-all butterfly-stage exchange is the next increment; at the
  current sizes the NTT is a small fraction of prove time);
- **MSMs**: point-sharded per chip (local Pippenger) with the per-chip
  partial sums gathered and folded (see `msm_sharded`).

Compile economics: every shard_map callable here is built once per
(mesh, domain) configuration and cached, so the four same-shape G1 MSMs
and repeated prove steps reuse compiled executables.

`sharded_prove_step` returns the same Jacobian partials as the single-chip
`groth16.prover._prove_core`, so `device_prove` semantics carry over.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curve.field_ops import FQ2_OPS, FQ_OPS
from ..field.limb import FR_CTX, from_mont
from ..groth16 import prover as prover_mod
from ..ops import ntt as nttmod
from .msm_sharded import msm_sharded


@lru_cache(maxsize=None)
def _sharded_quotient_fn(mesh: Mesh, domain, axis: str):
    def local(u_idx, u_val, v_idx, v_val, w_idx, w_val, weights):
        u_l = prover_mod._weighted_evals(u_idx, u_val, weights)
        v_l = prover_mod._weighted_evals(v_idx, v_val, weights)
        w_l = prover_mod._weighted_evals(w_idx, w_val, weights)
        # gather full evaluation vectors onto every chip
        u_e = jax.lax.all_gather(u_l, axis).reshape(-1, u_l.shape[-1])
        v_e = jax.lax.all_gather(v_l, axis).reshape(-1, v_l.shape[-1])
        w_e = jax.lax.all_gather(w_l, axis).reshape(-1, w_l.shape[-1])
        u_c = nttmod.intt(domain, u_e)
        v_c = nttmod.intt(domain, v_e)
        h_c = nttmod.divide_by_vanishing(domain, u_e, v_e, w_e)
        return (from_mont(FR_CTX, u_c), from_mont(FR_CTX, v_c),
                from_mont(FR_CTX, h_c))

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P()),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)


def sharded_witness_quotient(mesh: Mesh, domain, n_input: int, ell_arrays,
                             weights_mont: jnp.ndarray, axis: str = "shard"):
    """Gate-sharded ELL reduction + (replicated) NTT quotient pipeline."""
    (u_idx, u_val), (v_idx, v_val), (w_idx, w_val) = ell_arrays
    fn = _sharded_quotient_fn(mesh, domain, axis)
    return fn(u_idx, u_val, v_idx, v_val, w_idx, w_val, weights_mont)


def sharded_prove_step(mesh: Mesh, domain, n_input: int, window_bits: int,
                       ell_arrays, crs_arrays, weights_mont: jnp.ndarray,
                       axis: str = "shard"):
    """Full multi-chip prove step: returns (a_g1, b_g1, b_g2, h_xt,
    c_delta) Jacobian partials, ready for host assembly."""
    xi_g1, xi_t_g1, sum_delta_g1, xi_g2 = crs_arrays
    n = domain.n

    u_std, v_std, h_std = sharded_witness_quotient(
        mesh, domain, n_input, ell_arrays, weights_mont, axis)
    wit_std = from_mont(FR_CTX, weights_mont[n_input + 1:])

    def g1_msm(pts, scalars):
        pts, scalars = prover_mod._pad_msm(FQ_OPS, pts, scalars, n)
        return msm_sharded(FQ_OPS, mesh, pts, scalars, axis, window_bits)

    a_g1 = g1_msm(xi_g1, u_std)
    b_g1 = g1_msm(xi_g1, v_std)
    h_xt = g1_msm(xi_t_g1, h_std[:n - 1])
    c_delta = g1_msm(sum_delta_g1, wit_std)
    b_g2 = msm_sharded(FQ2_OPS, mesh, xi_g2, v_std, axis, window_bits)

    return a_g1, b_g1, b_g2, h_xt, c_delta
