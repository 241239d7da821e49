"""On-disk AOT store for compiled generation episodes.

The persistent XLA compile cache is useless on the tunneled TPU runtime (a
warm load measured 105.7 s against a 9.2 s cold compile,
`VERIFY_cache_r04.json`) — but that is a property of the compile-cache
deserialize path, NOT of the tunnel: directly serializing the loaded PJRT
executable (``jax.experimental.serialize_executable``) and reloading it in a
fresh process measured **0.4 s against a 10.3 s cold compile** on the same
tunneled runtime (`VERIFY_aot_r05.json`).  So the serving cold-start answer
everywhere is this module: the first call of a generation episode per
(shape, params) key compiles and serializes; every later process start
deserializes in seconds instead of paying the 20-50 s per-shape episode
compile (the reference's torch.load-and-go equivalent,
reference: commu/midi_generator/model_initializer.py:43-51).

Correctness:

- The episode jit CLOSES OVER the params (they are baked into the
  executable as captured constants), so the key includes a content digest
  of every param leaf — a new checkpoint can never be served a stale
  executable.
- The key also pins jax version, backend platform/version, device count,
  episode shape statics and arg avals; any mismatch is a plain cache miss.
- Loading is best-effort: ANY failure (version skew, corrupt file, runtime
  refusal) falls back to compiling — behavior is identical minus the wait.
- CPU processes never cache (XLA:CPU AOT artifacts embed host machine
  features, and CPU compiles are cheap) — same policy as the compile cache.

``COMMU_AOT_CACHE=0`` disables; ``COMMU_AOT_CACHE_DIR`` relocates
(default ~/.cache/commu_tpu/aot).  Cold-vs-warm token identity and the
compile skip are regression-gated by ``scripts/verify_aot.py --integrated``.
"""
from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile

logger = logging.getLogger("ComMU")


def _cache_dir() -> str:
    return os.environ.get(
        "COMMU_AOT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "commu_tpu", "aot"))


def enabled() -> bool:
    if os.environ.get("COMMU_AOT_CACHE", "1") == "0":
        return False
    try:
        import jax
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def params_digest(params) -> str:
    """Content digest over every param leaf (host-side bytes).

    The episode executable embeds the params as captured constants, so the
    digest is the only thing standing between a fresh checkpoint and a
    stale executable — it hashes VALUES, not shapes.  ~100 ms for the
    13.9M-param model when the leaves are host numpy arrays (they are: the
    generation pipeline keeps params as numpy until trace time)."""
    import jax
    import numpy as np

    h = hashlib.blake2b(digest_size=16)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    h.update(str(treedef).encode())
    for leaf in leaves:
        arr = np.asarray(leaf)
        h.update(str((arr.shape, arr.dtype.str)).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def _env_fingerprint() -> str:
    import jax

    dev = jax.devices()[0]
    parts = [jax.__version__, jax.default_backend(),
             getattr(dev, "device_kind", "?"),
             getattr(dev.client, "platform_version", "?"),
             str(jax.device_count())]
    return hashlib.blake2b("|".join(parts).encode(),
                           digest_size=8).hexdigest()


def _key_path(key_parts) -> str:
    h = hashlib.blake2b(digest_size=20)
    for part in key_parts:
        h.update(str(part).encode())
        h.update(b"\x00")
    h.update(_env_fingerprint().encode())
    return os.path.join(_cache_dir(), h.hexdigest() + ".pjrt")


def load_or_compile(key_parts, jit_fn, args):
    """Return ``(callable, from_cache)`` for ``jit_fn`` specialized to
    ``args``: the deserialized AOT executable on a warm hit
    (``from_cache=True`` — callers should fall back to :func:`compile_fresh`
    if its first EXECUTION fails), else the freshly compiled executable
    (serialized for next time).  Falls back to ``jit_fn`` itself if even
    explicit lowering fails (never raises)."""
    path = _key_path(key_parts)
    if os.path.isfile(path):
        try:
            import time

            from jax.experimental.serialize_executable import \
                deserialize_and_load
            t0 = time.perf_counter()
            with open(path, "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            exe = deserialize_and_load(payload, in_tree, out_tree)
            logger.info("AOT episode loaded in %.1fs (%s)",
                        time.perf_counter() - t0, os.path.basename(path))
            return exe, True
        except Exception as exc:  # noqa: BLE001 - any skew -> recompile
            logger.warning("AOT load failed (%s: %s) — compiling",
                           type(exc).__name__, exc)
    return compile_fresh(key_parts, jit_fn, args), False


def compile_fresh(key_parts, jit_fn, args):
    """Compile ``jit_fn`` for ``args`` and serialize the executable into the
    store (best-effort).  The recovery path when a warm-loaded executable
    turns out to be unusable at execution time: the fresh serialization
    REPLACES the bad entry."""
    path = _key_path(key_parts)
    try:
        exe = jit_fn.lower(*args).compile()
    except Exception as exc:  # noqa: BLE001 - odd args/runtime: plain jit
        logger.warning("AOT lowering failed (%s: %s) — plain jit",
                       type(exc).__name__, exc)
        return jit_fn
    try:
        from jax.experimental.serialize_executable import serialize
        payload, in_tree, out_tree = serialize(exe)
        os.makedirs(_cache_dir(), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=_cache_dir(), suffix=".tmp")
        with os.fdopen(fd, "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        os.replace(tmp, path)  # atomic: concurrent processes never see half
        logger.info("AOT episode serialized (%d bytes) -> %s",
                    len(payload), os.path.basename(path))
    except Exception as exc:  # noqa: BLE001 - serialization is best-effort
        logger.warning("AOT serialize failed (%s: %s) — cache skipped",
                       type(exc).__name__, exc)
    return exe
