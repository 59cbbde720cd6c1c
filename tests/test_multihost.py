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


_PROG2 = r"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb
_xb._backend_factories.pop("axon", None)
_xb._backend_factories.pop("tpu", None)

import sys
sys.path.insert(0, %(repo)r)
pid = int(sys.argv[1])
from zksnark_tpu.parallel import multihost

multihost.init_distributed(coordinator_address="127.0.0.1:%(port)d",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

import numpy as np
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = multihost.global_mesh()
assert mesh.devices.size == 8

# global array from process-local data: host p owns rows [16p, 16p+16)
full = np.arange(32.0)
sl = multihost.host_local_slice(32)
assert (sl.stop - sl.start) == 16
sharding = NamedSharding(mesh, P("shard"))
ga = jax.make_array_from_process_local_data(sharding, full[sl], (32,))

f = jax.jit(shard_map(lambda x: jax.lax.psum(jnp.sum(x), "shard"),
                      mesh=mesh, in_specs=P("shard"), out_specs=P()))
out = f(ga)
assert float(np.asarray(jax.device_get(out))) == full.sum(), out

# a tiny cross-process sharded field op: elementwise Montgomery multiply
# under shard_map (each process feeds its local half, the all-to-zero
# check is global)
from zksnark_tpu.field.limb import FR_CTX, mont_mul
from zksnark_tpu.ops.montmul import from_mont_auto

vals = list(range(1, 33))
mont = np.asarray(FR_CTX.to_mont_np(vals))
gm = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("shard")), mont[sl], mont.shape)
sq = jax.jit(shard_map(lambda x: mont_mul(FR_CTX, x, x), mesh=mesh,
                       in_specs=P("shard"), out_specs=P("shard")))
out = sq(gm)
# the output spans both processes: fetch only THIS process's shards
shards = sorted(out.addressable_shards, key=lambda s: s.index[0].start)
assert len(shards) == 4
local = np.concatenate([np.asarray(s.data) for s in shards])
got = FR_CTX.from_limbs_np(np.asarray(
    from_mont_auto(FR_CTX, jnp.asarray(local))))
want = [v * v %% FR_CTX.p for v in vals][sl]
assert list(got) == want, (got[:4], want[:4])
print("MULTIHOST2_OK", pid)
"""


def test_two_process_cluster():
    """A REAL 2-process jax.distributed cluster on localhost CPU: one
    coordinator, two processes x 4 virtual devices, one global mesh,
    cross-process psum + a sharded Montgomery multiply fed via
    make_array_from_process_local_data."""
    import socket

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU tunnel out
    # ephemeral coordinator port: a hard-coded one collides with stale
    # listeners or a concurrent checkout running this suite, and
    # jax.distributed init then hangs to the 300 s timeout
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    prog = _PROG2 % {"repo": repo, "port": port}
    procs = [subprocess.Popen(
        [sys.executable, "-c", prog, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        if rc != 0:
            pytest.fail(f"2-process cluster member failed:\n{err[-2000:]}")
    assert "MULTIHOST2_OK 0" in outs[0][1]
    assert "MULTIHOST2_OK 1" in outs[1][1]
