#!/usr/bin/env python
"""Compile-time bisection of MSM kernel components (CPU backend).

Measures jax.jit lower+compile wall time for each building block of
_msm_windowed at a given size, to find which construct blows up XLA.

Usage: JAX_PLATFORMS=cpu python scripts/compile_bisect.py [log_n] [g1|g2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
_xb._backend_factories.pop("tpu", None)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from zksnark_tpu.curve import jacobian as jac  # noqa: E402
from zksnark_tpu.curve.field_ops import FQ2_OPS, FQ_OPS  # noqa: E402
from zksnark_tpu.curve.jacobian import JPoint  # noqa: E402
from zksnark_tpu.field import params  # noqa: E402
from zksnark_tpu.ops import msm as msmod  # noqa: E402

L = params.NUM_LIMBS
LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
OPS = FQ2_OPS if (len(sys.argv) > 2 and sys.argv[2] == "g2") else FQ_OPS
N = 1 << LOG_N
WB = 8


def rand_limbs(rng, shape):
    a = rng.integers(0, 1 << 16, size=shape + (L,), dtype=np.uint32)
    a[..., -1] &= 0x0FFF
    return jnp.asarray(a)


rng = np.random.default_rng(0)
if OPS.elem_ndim == 1:
    pts = JPoint(rand_limbs(rng, (N,)), rand_limbs(rng, (N,)), OPS.one((N,)))
else:
    pts = JPoint(rand_limbs(rng, (N, 2)), rand_limbs(rng, (N, 2)),
                 OPS.one((N,)))
scalars = rand_limbs(rng, (N,))
digits = (scalars[:, 0] & 0xFF)


def timeit(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_comp = time.time() - t0
    print(f"{name:30s} lower {t_lower:7.2f}s  compile {t_comp:7.2f}s",
          flush=True)
    return compiled


timeit("jac.add", lambda p, q: jac.add(OPS, p, q), pts, pts)
timeit("prefix_scan", lambda p: msmod._prefix_scan(OPS, p), pts)
timeit("tree_sum", lambda p: msmod.tree_sum(OPS, p), pts)
timeit("bucket_window",
       lambda p, d: msmod._bucket_window(OPS, p, d, 1 << WB), pts, digits)
timeit("msm_windowed full",
       lambda p, s: msmod._msm_windowed.__wrapped__(OPS, p, s, WB),
       pts, scalars)
