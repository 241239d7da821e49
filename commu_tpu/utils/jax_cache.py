"""Persistent XLA compilation cache (opt-in: COMMU_COMPILE_CACHE=1).

The full-size train step and the generation episode are heavy Mosaic/XLA
compiles (35-95 s per shape on a cold process), so a disk cache is the
obvious lever against cold-start — the reference has zero compile latency
(torch.load and go, commu/midi_generator/model_initializer.py:43-51).  It
stays OFF by default because warm loads are broken at the PJRT layer on the
tunneled TPU runtime this build targets.  Two distinct failure modes were
root-caused on-chip (round 4):

1. CACHE-KEY COLLISION (fixed): the persistent-cache key omits a jit's
   result-layout pin, so ``init_train_memory``'s row-major-pinned zeros
   collided with every plain ``jnp.zeros`` of the same shape and came back
   with whichever layout populated the entry first (B<->D-swapped tiling),
   and the layout-pinned train step rejected its own ring buffer ("Layout
   passed to jit does not match the layout on the respective arg").  Fixed
   by salting the pinned init's HLO so it can never share a cache entry
   (ops.layout.pinned_rowmajor_zeros).

2. WARM-LOAD RESULT-LAYOUT CORRUPTION (platform bug, unfixable here): a
   deserialized executable REPORTS the default/auto layout for its results
   even when it was compiled with a result-layout pin — the bytes it
   produces are in the pinned layout, the metadata says otherwise, and the
   first consumer fails with ``INVALID_ARGUMENT: TPU backend error`` (or
   would silently misread the buffer).  Measured: the salted pinned zeros
   returns major_to_minor (0,1,2,3,4,5) on the populating run and
   (0,1,2,4,3,5) on the warm run of the SAME code.  This breaks every
   layout-pinned entry point (the sharded train/eval steps pin the donated
   ring buffer's layout).  ``scripts/verify_cache.py`` reproduces the
   cold/warm cycle in fresh subprocesses and is the regression gate for
   ever flipping the default.

CPU processes never cache regardless: XLA:CPU AOT entries embed machine
features that may not match the loading host (XLA warns about possible
SIGILL), and CPU compiles are cheap anyway.

Policy summary (see enable_persistent_cache):

- PIN-FREE entry points (the generation stack) cache BY DEFAULT on local
  runtimes — a warm process start skips the per-shape episode compile —
  EXCEPT through the axon tunnel, where a warm load measured 105.7 s
  against a 9.2 s cold compile (VERIFY_cache_r04.json: the compile-cache
  deserialize path loses to compiling there) and the default stays off.
- PINNED entry points (train/eval) cache only on explicit
  COMMU_COMPILE_CACHE=1, because of failure mode 2 above.
- CLOSED (round 5): the slowness is the COMPILE-CACHE deserialize path,
  not the tunnel — directly serializing the loaded PJRT executable
  (jax.experimental.serialize_executable) measured 0.4 s load against a
  10.3 s cold compile on the same tunneled runtime (VERIFY_aot_r05.json),
  and the production generation path now warm-starts through exactly that
  vehicle: the AOT episode store in commu_tpu.utils.aot_cache (gated by
  scripts/verify_aot.py --integrated).  Process reuse (~0.2 s/episode once
  compiled) remains the answer WITHIN a process; the AOT store is the
  answer ACROSS process starts.

COMMU_COMPILE_CACHE=1 forces the cache on everywhere; =0 forces it off;
COMMU_COMPILE_CACHE_DIR overrides the location
(default ~/.cache/commu_tpu/jax).
"""
import os


def _tunneled_runtime() -> bool:
    """True when the device is reached through a PJRT tunnel (the axon
    relay) rather than a local runtime — there, executable
    deserialization/upload is slower than compiling, so cache-by-default
    is counterproductive.  Never raises."""
    try:
        import jax
        return "axon" in jax.devices()[0].client.platform_version.lower()
    except Exception:
        return False


def enable_persistent_cache(pinned_layouts: bool = True) -> None:
    """Idempotently point JAX's compilation cache at a local directory.
    Must run before the first compilation to have any effect.  Never
    raises: an unwritable directory or an old jax just leaves caching off.

    ``pinned_layouts`` declares whether the calling entry point compiles
    programs with result-layout pins.  The PJRT warm-load bug (module
    docstring, failure mode 2) corrupts ONLY pinned results, so:

    - pinned entry points (the train/eval steps: the donated ring buffer's
      layout is pinned at the jit boundary) cache only on explicit
      COMMU_COMPILE_CACHE=1;
    - pin-free entry points (the whole generation stack: episode loop,
      prefill, decode — plain jits, default layouts everywhere) cache BY
      DEFAULT, which turns the 30-95 s per-shape episode compile into a
      warm load and makes cold-start serving-grade (the reference's
      torch.load-and-go equivalent).  COMMU_COMPILE_CACHE=0 forces it off.
      Cold-vs-warm token-identity is regression-gated by
      scripts/verify_cache.py (generation phase).
    """
    env = os.environ.get("COMMU_COMPILE_CACHE")
    on = env == "1" or (env != "0" and not pinned_layouts)
    if not on:
        return
    if env != "1" and _tunneled_runtime():
        # measured on the axon-tunneled runtime (VERIFY_cache_r04.json):
        # a warm generation load took 105.7 s against a 9.2 s cold compile —
        # deserialize/upload through the tunnel costs more than compiling.
        # Default-on would hurt there; explicit COMMU_COMPILE_CACHE=1 still
        # wins on argument.
        return
    cache_dir = os.environ.get(
        "COMMU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "commu_tpu", "jax"))
    try:
        import jax
        if jax.default_backend() == "cpu":
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
