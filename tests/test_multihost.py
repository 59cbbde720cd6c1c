"""Multi-host runtime smoke test (parallel/multihost.py).

`jax.distributed.initialize` must run before any backend touch, and the
pytest process already has a live CPU backend — so the smoke test runs in
a subprocess: a 1-process "cluster" joins the distributed runtime, builds
the global mesh, and runs a psum over 8 virtual devices.  (A real N>1
multi-host run needs N machines; every mesh routine here is written
against jax.sharding.Mesh + shard_map, which is host-count-agnostic.)
"""

import os
import subprocess
import sys

import pytest

_PROG = r"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb
_xb._backend_factories.pop("axon", None)
_xb._backend_factories.pop("tpu", None)

import sys
sys.path.insert(0, %(repo)r)
from zksnark_tpu.parallel import multihost

multihost.init_distributed(coordinator_address="127.0.0.1:45677",
                           num_processes=1, process_id=0)
assert jax.process_count() == 1
mesh = multihost.global_mesh()
assert mesh.devices.size == 8

import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

f = shard_map(lambda x: jax.lax.psum(x, "shard"), mesh=mesh,
              in_specs=P("shard"), out_specs=P())
out = f(jnp.arange(8.0))
assert float(out[0]) == 28.0
sl = multihost.host_local_slice(64)
assert (sl.start, sl.stop) == (0, 64)
print("MULTIHOST_OK")
"""


def test_single_process_cluster_smoke():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU tunnel out
    res = subprocess.run(
        [sys.executable, "-c", _PROG % {"repo": repo}],
        capture_output=True, text=True, timeout=300, env=env)
    if res.returncode != 0:
        pytest.fail(f"subprocess failed:\n{res.stderr[-2000:]}")
    assert "MULTIHOST_OK" in res.stdout
