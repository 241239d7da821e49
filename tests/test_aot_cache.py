"""AOT episode-store mechanics (commu_tpu/utils/aot_cache.py).

The suite runs on CPU where the store is policy-DISABLED for the production
path (XLA:CPU AOT artifacts embed host machine features); these tests drive
the mechanics directly — key behavior, round-trip, params digest, fallback —
which are platform-independent.  The on-TPU cold/warm gate incl. token
identity is ``scripts/verify_aot.py --integrated``.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commu_tpu.utils import aot_cache


@pytest.fixture()
def store(tmp_path, monkeypatch):
    monkeypatch.setenv("COMMU_AOT_CACHE_DIR", str(tmp_path / "aot"))
    return tmp_path / "aot"


def test_disabled_on_cpu_by_policy():
    assert jax.default_backend() == "cpu"
    assert not aot_cache.enabled()


def test_roundtrip_and_key_separation(store):
    f = jax.jit(lambda x: x * 2 + 1)
    args = (jnp.arange(8.0),)

    exe, loaded = aot_cache.load_or_compile(("k1",), f, args)
    assert not loaded  # first time: fresh compile, store populated
    np.testing.assert_array_equal(np.asarray(exe(*args)),
                                  np.arange(8.0) * 2 + 1)
    assert len(list(store.glob("*.pjrt"))) == 1

    exe2, loaded2 = aot_cache.load_or_compile(("k1",), f, args)
    assert loaded2  # same key: served from the store
    # Executing the loaded artifact may legitimately fail on a mismatched
    # runtime (here: the suite's 8-virtual-device CPU mesh vs the
    # 1-device view it was compiled under).  The production wrapper
    # (jit_sampler._aot_episode) recovers by recompiling through
    # compile_fresh — assert that exact contract.
    try:
        out2 = exe2(*args)
    except Exception:
        out2 = aot_cache.compile_fresh(("k1",), f, args)(*args)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(exe(*args)))

    # a different key never aliases
    g = jax.jit(lambda x: x * 3)
    exe3, loaded3 = aot_cache.load_or_compile(("k2",), g, args)
    assert not loaded3
    assert len(list(store.glob("*.pjrt"))) == 2


def test_corrupt_entry_falls_back_to_compile(store):
    f = jax.jit(lambda x: x - 1)
    args = (jnp.arange(4.0),)
    aot_cache.load_or_compile(("kc",), f, args)
    (entry,) = store.glob("*.pjrt")
    entry.write_bytes(b"garbage")
    exe, loaded = aot_cache.load_or_compile(("kc",), f, args)
    assert not loaded  # corrupt pickle -> silent recompile
    np.testing.assert_array_equal(np.asarray(exe(*args)), np.arange(4.0) - 1)


def test_params_digest_tracks_values_not_just_shapes():
    a = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    b = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    c = {"w": jnp.ones((3, 2)) * 1.0000001, "b": jnp.zeros((2,))}
    assert aot_cache.params_digest(a) == aot_cache.params_digest(b)
    assert aot_cache.params_digest(a) != aot_cache.params_digest(c)
    # dtype changes are content changes too (bf16 vs f32 decode params)
    d = {"w": jnp.ones((3, 2), jnp.bfloat16), "b": jnp.zeros((2,))}
    assert aot_cache.params_digest(a) != aot_cache.params_digest(d)


def test_env_kill_switch(monkeypatch):
    monkeypatch.setenv("COMMU_AOT_CACHE", "0")
    assert not aot_cache.enabled()
