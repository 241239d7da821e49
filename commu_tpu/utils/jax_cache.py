"""Persistent XLA compilation cache (opt-in).

The full-size train step is a heavy Mosaic/XLA compile (minutes on a cold
process), so a disk cache is tempting — but it is OFF by default because it
is measurably unsafe with this package's layout-pinned entry points: on a
warm cache, ``init_train_memory``'s jitted init comes back with a different
physical layout than the cold compile produced (swapped B<->D minor dims +
tiling), and the layout-pinned train step then rejects the argument
("Layout passed to jit does not match the layout on the respective arg").
The cache also persists XLA:CPU AOT results whose target machine features
can mismatch the loading host (XLA warns about possible SIGILL).

Set COMMU_COMPILE_CACHE=1 to enable anyway (useful for repeat-compiling
paths without pinned layouts, e.g. generation); COMMU_COMPILE_CACHE_DIR
overrides the location (default ~/.cache/commu_tpu/jax).
"""
import os


def enable_persistent_cache() -> None:
    """Idempotently point JAX's compilation cache at a local directory when
    COMMU_COMPILE_CACHE=1.  Must run before the first compilation to have
    any effect.  Never raises: an unwritable directory or an old jax just
    leaves caching off.
    """
    if os.environ.get("COMMU_COMPILE_CACHE") != "1":
        return
    cache_dir = os.environ.get(
        "COMMU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "commu_tpu", "jax"))
    try:
        import jax
        # CPU-only processes skip it regardless: XLA:CPU AOT entries embed
        # machine features that may not match the loading host, and CPU
        # compiles are cheap anyway.
        if jax.default_backend() == "cpu":
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
