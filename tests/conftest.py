"""Test harness config: pure-CPU JAX with an 8-virtual-device mesh.

Two environment jobs, both of which must happen before jax initializes any
backend:

1. **Detach the axon TPU plugin.**  The runtime injects a PJRT plugin via
   sitecustomize and freezes ``jax_platforms=axon`` by importing jax at
   interpreter startup; the TPU behind it is single-tenant and
   remote-compiled, so test processes can block indefinitely on backend
   init.  Overriding the *config* (not just the env var — that was already
   read) and dropping the plugin's backend factory detaches it cleanly.
2. **CPU backend with 8 virtual devices**, so multi-chip sharding tests run
   without TPU hardware.  (Real-TPU paths are exercised by bench.py and
   __graft_entry__.py, driven outside pytest.)
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
_xb._backend_factories.pop("tpu", None)

from zksnark_tpu.utils.jaxcfg import setup_cache  # noqa: E402

setup_cache()
