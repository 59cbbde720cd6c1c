"""Multi-chip MSM: points and scalars sharded over a device mesh.

The reference is single-threaded host code (SURVEY.md §2 #21/#22 — no
parallelism of any kind); this module is the scale-out axis the TPU build
adds.  Design follows the scaling-book recipe: pick a mesh, shard the
leading (points) axis, compute per-chip partial MSMs with the single-chip
kernel, and combine the per-chip partial sums with an ``all_gather`` +
local Jacobian reduction (EC points have no hardware psum; the gather moves
just 3 field elements per chip over ICI).

Compile economics: the jitted shard_map callable is built once per
(ops, mesh, axis, window_bits, pippenger) configuration and cached, so the
prover's four same-shape G1 MSMs share ONE compiled executable instead of
re-tracing a fresh closure per call (this is what made the round-1
multi-chip dryrun time out on a small host).

Works identically on a real TPU slice and on the CPU-mesh test harness
(XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curve.jacobian import JPoint
from ..ops import msm as msmod


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def shard_points(mesh: Mesh, pts: JPoint, axis: str = "shard") -> JPoint:
    sh = NamedSharding(mesh, P(axis))
    return JPoint(jax.device_put(pts.x, sh), jax.device_put(pts.y, sh),
                  jax.device_put(pts.z, sh))


@lru_cache(maxsize=None)
def _sharded_msm_fn(ops, mesh: Mesh, axis: str, window_bits: int,
                    use_pippenger: bool, affine: bool = False):
    """One jitted shard_map MSM per configuration (see module doc)."""

    def local(pts_l: JPoint, scalars_l: jnp.ndarray) -> JPoint:
        if use_pippenger:
            part = msmod._msm_impl(ops, pts_l, scalars_l, window_bits,
                                   affine=affine)
        else:
            part = msmod.tree_sum(
                ops, msmod.batch_scalar_mul(ops, pts_l, scalars_l))
        # (elem,) partial per chip -> stack across chips, reduce locally
        gathered = jax.lax.all_gather(part, axis)  # (n_dev, elem)
        return msmod.tree_sum(ops, gathered)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(JPoint(P(axis), P(axis), P(axis)), P(axis)),
        out_specs=JPoint(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)


def msm_sharded(ops, mesh: Mesh, pts: JPoint, scalar_limbs: jnp.ndarray,
                axis: str = "shard", window_bits: int = 8,
                use_pippenger: bool = True, affine: bool = False) -> JPoint:
    """MSM over a sharded point array: per-chip Pippenger + gather-reduce.

    N must be divisible by the mesh size (pad with infinity upstream).
    affine=True asserts the batch_normalize invariant on pts (see ops.msm).
    """
    fn = _sharded_msm_fn(ops, mesh, axis, window_bits, use_pippenger,
                         affine)
    return fn(pts, scalar_limbs)
