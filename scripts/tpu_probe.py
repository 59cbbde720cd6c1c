#!/usr/bin/env python
"""Bisection probe for the round-1 TPU kernel fault in device_prove.

Runs individual device kernels (NTT, G1 MSM, G2 MSM) at increasing sizes,
each timed and flushed, so the crashing kernel + size is pinpointed.

Usage: python scripts/tpu_probe.py [stage ...]
  stages: ntt g1msm g2msm  (default: all)
Env: PROBE_LOG_NS="14,15,16" sizes; PROBE_WB window bits (default 8).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zksnark_tpu.utils.jaxcfg import setup_cache  # noqa: E402

setup_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zksnark_tpu.curve.field_ops import FQ2_OPS, FQ_OPS  # noqa: E402
from zksnark_tpu.curve.jacobian import JPoint  # noqa: E402
from zksnark_tpu.field import params  # noqa: E402
from zksnark_tpu.field.limb import FR_CTX  # noqa: E402
from zksnark_tpu.ops import msm as msmod  # noqa: E402
from zksnark_tpu.ops import ntt as nttmod  # noqa: E402

L = params.NUM_LIMBS
WB = int(os.environ.get("PROBE_WB", "8"))
LOG_NS = [int(s) for s in os.environ.get("PROBE_LOG_NS", "14,15,16").split(",")]


def say(msg):
    print(f"[probe +{time.time()-T0:.1f}s] {msg}", file=sys.stderr, flush=True)


def rand_limbs(rng, shape):
    # random 16-bit limbs; top limb masked so the value is < 2^252 < p-ish
    a = rng.integers(0, 1 << 16, size=shape + (L,), dtype=np.uint32)
    a[..., -1] &= 0x0FFF
    return jnp.asarray(a)


def fake_points(ops, rng, n):
    if ops.elem_ndim == 1:
        x = rand_limbs(rng, (n,))
        y = rand_limbs(rng, (n,))
    else:
        x = rand_limbs(rng, (n, 2))
        y = rand_limbs(rng, (n, 2))
    return JPoint(x, y, ops.one((n,)))


def run_ntt(log_n):
    dom = nttmod.get_domain(log_n)
    rng = np.random.default_rng(1)
    a = rand_limbs(rng, (dom.n,))
    f = jax.jit(lambda x: nttmod.ntt(dom, x))
    t0 = time.time()
    jax.block_until_ready(f(a))
    say(f"ntt 2^{log_n} warm {time.time()-t0:.2f}s")
    t0 = time.time()
    jax.block_until_ready(f(a))
    say(f"ntt 2^{log_n} run {time.time()-t0:.3f}s")


def run_msm(ops, name, log_n):
    rng = np.random.default_rng(2)
    n = 1 << log_n
    pts = fake_points(ops, rng, n)
    scalars = rand_limbs(rng, (n,))
    t0 = time.time()
    out = msmod._msm_windowed(ops, pts, scalars, WB)
    jax.block_until_ready(out.x)
    say(f"{name} 2^{log_n} wb={WB} warm {time.time()-t0:.2f}s")
    t0 = time.time()
    out = msmod._msm_windowed(ops, pts, scalars, WB)
    jax.block_until_ready(out.x)
    say(f"{name} 2^{log_n} wb={WB} run {time.time()-t0:.3f}s")


T0 = time.time()

if __name__ == "__main__":
    stages = sys.argv[1:] or ["ntt", "g1msm", "g2msm"]
    say(f"devices={jax.devices()}")
    for log_n in LOG_NS:
        for st in stages:
            if st == "ntt":
                run_ntt(log_n)
            elif st == "g1msm":
                run_msm(FQ_OPS, "g1msm", log_n)
            elif st == "g2msm":
                run_msm(FQ2_OPS, "g2msm", log_n)
    say("done")
