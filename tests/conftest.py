"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends; multi-chip sharding
tests then see 8 devices without TPU hardware (the real-TPU path is exercised
by bench.py and __graft_entry__.py, driven outside pytest).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from zksnark_tpu.utils.jaxcfg import setup_cache  # noqa: E402

setup_cache()
