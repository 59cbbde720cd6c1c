"""Round-2 crash repro: run the G2 MSM alone at 2^16 on the real TPU.

BENCH_r01 died with a TPU kernel fault materializing the G2 MSM output
(prover.py:458 -> jacobian.to_affine_np).  Bisect: build 2^16 synthetic G2
points + scalars, run _msm_windowed(FQ2_OPS, ...) alone, block, print.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zksnark_tpu.utils.jaxcfg import setup_cache

setup_cache()

import jax
import jax.numpy as jnp
import numpy as np

from zksnark_tpu.curve import bn254 as hc
from zksnark_tpu.curve import jacobian as jac
from zksnark_tpu.curve.field_ops import FQ2_OPS, FQ_OPS
from zksnark_tpu.field.limb import FR_CTX
from zksnark_tpu.ops import msm as msmod

LOG_N = int(os.environ.get("LOG_N", "16"))
GROUP = os.environ.get("GROUP", "g2")
WB = int(os.environ.get("WB", "8"))
n = 1 << LOG_N
from zksnark_tpu.field import params as _fp
LL = _fp.NUM_LIMBS
print(f"[repro] devices={jax.devices()} n={n} group={GROUP} wb={WB}",
      flush=True)

rng = np.random.default_rng(0)
scalars_int = [int(rng.integers(1, 1 << 62)) for _ in range(n)]
scalars = jnp.asarray(FR_CTX.to_limbs_np(scalars_int))

if GROUP == "g2":
    ops = FQ2_OPS
    base = hc.g2_scalar_mul(hc.G2_GEN, 96)
    # replicate ONE point n times (correctness doesn't matter for the repro)
    x = jnp.broadcast_to(jnp.asarray(ops.to_mont_np([list(base[0])]))[0],
                         (n, 2, LL))
    y = jnp.broadcast_to(jnp.asarray(ops.to_mont_np([list(base[1])]))[0],
                         (n, 2, LL))
else:
    ops = FQ_OPS
    base = hc.g1_scalar_mul(hc.G1_GEN_PT, 69)
    x = jnp.broadcast_to(jnp.asarray(ops.to_mont_np([base[0]]))[0], (n, LL))
    y = jnp.broadcast_to(jnp.asarray(ops.to_mont_np([base[1]]))[0], (n, LL))
pts = jac.from_affine(ops, x, y)

t0 = time.time()
out = msmod._msm_windowed(ops, pts, scalars, WB)
jax.block_until_ready(out.x)
print(f"[repro] warm (incl compile): {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = msmod._msm_windowed(ops, pts, scalars, WB)
jax.block_until_ready(out.x)
print(f"[repro] steady: {time.time()-t0:.3f}s", flush=True)
print("[repro] OK no crash", flush=True)
