"""Persistent XLA compilation cache (measured round 3: the tunneled axon
backend pays a ~4-6 min per-process session-init, and the first compile
lands behind it; subsequent compiles are ~1s.  The persistent cache works
through the remote-compile path, so every bench/tool run after the first
skips straight to execution)."""
import os


def enable(path: str = "/tmp/jaxcache") -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
