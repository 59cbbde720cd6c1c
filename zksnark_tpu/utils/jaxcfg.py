"""Shared JAX configuration: persistent compilation cache.

XLA compile times dominate iteration cost on small hosts (the dev box has 2
CPUs); every entry point (tests, bench, CLI, graft entry) routes through
`setup_cache()` so each distinct graph is compiled once per machine (XLA:CPU AOT entries embed host CPU features and do not transfer across boxes).
"""

from __future__ import annotations

import os

_DONE = False


def setup_cache(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("ZKSNARK_TPU_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _DONE = True
