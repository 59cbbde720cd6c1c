#!/usr/bin/env python
"""Sharded-MSM / sharded-prove scaling measurement on the CPU mesh.

Writes SCALING.json.  On this harness the mesh is N *virtual* CPU devices
multiplexed onto a 2-core host, so wall-clock cannot improve with d — the
meaningful evidence here is (a) bit-exact agreement of every sharded
result with the single-chip kernel at every mesh size, and (b) the
per-chip work division (each chip runs 1/d of the points / butterflies,
verified structurally: local shapes are n/d).  Real scaling numbers need a
real multi-chip slice; the driver harness exposes one chip (BASELINE.md).

Run: python scripts/scaling_bench.py    (forces CPU; ~minutes, cached)
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "")
     + " --xla_force_host_platform_device_count=8").strip())
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from zksnark_tpu.utils.jaxcfg import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
_xb._backend_factories.pop("tpu", None)

import random  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zksnark_tpu.curve import bn254 as hc  # noqa: E402
from zksnark_tpu.curve import jacobian as jac  # noqa: E402
from zksnark_tpu.curve.field_ops import FQ_OPS  # noqa: E402
from zksnark_tpu.field.limb import FR_CTX  # noqa: E402
from zksnark_tpu.field.params import R  # noqa: E402
from zksnark_tpu.ops import msm as msmod  # noqa: E402
from zksnark_tpu.parallel.msm_sharded import make_mesh, msm_sharded  # noqa: E402

rng = random.Random(2024)

N = 512
WB = 4


def main():
    ks = [rng.randrange(1, R) for _ in range(N)]
    pts_host = [hc.g1_scalar_mul(hc.G1_GEN_PT, k) for k in ks]
    P = jac.from_affine(
        FQ_OPS,
        jnp.asarray(FQ_OPS.to_mont_np([p[0] for p in pts_host])),
        jnp.asarray(FQ_OPS.to_mont_np([p[1] for p in pts_host])))
    scalars = [rng.randrange(R) for _ in range(N)]
    slimbs = jnp.asarray(FR_CTX.to_limbs_np(scalars))

    single_pt = msmod._msm_windowed(FQ_OPS, P, slimbs, WB)
    single = jac.to_affine_np(FQ_OPS, single_pt)

    out = {
        "workload": f"G1 MSM n={N} wb={WB}",
        "harness": "virtual CPU mesh on a 2-core host (one real chip only"
                   " is exposed; see BASELINE.md)",
        "mesh_sizes": {},
    }
    for d in (1, 2, 4, 8):
        mesh = make_mesh(d)
        got_pt = msm_sharded(FQ_OPS, mesh, P, slimbs, window_bits=WB)
        got = jac.to_affine_np(FQ_OPS, got_pt)
        t0 = time.time()
        for _ in range(3):
            jax.block_until_ready(
                msm_sharded(FQ_OPS, mesh, P, slimbs, window_bits=WB).x)
        dt = (time.time() - t0) / 3
        out["mesh_sizes"][str(d)] = {
            "bit_exact_vs_single_chip": bool(got == single),
            "points_per_chip": N // d,
            "wall_ms_virtual": round(dt * 1e3, 1),
        }
        print(f"d={d}: exact={got == single} {dt*1e3:.0f} ms",
              file=sys.stderr)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
