"""Decode-path parity: prefill + KV-cache decode_step must reproduce the full
forward's logits exactly (same math, different schedule)."""
import jax
import jax.numpy as jnp
import numpy as np

from commu_tpu.config import ModelConfig
from commu_tpu.models.decode import commit, decode_step, init_cache, precompute_rel, prefill
from commu_tpu.models.transformer_xl import TransformerXL, init_memory

CFG = ModelConfig(num_layers=3, num_heads=2, units=32, inner_size=48,
                  dropout=0.0, attention_dropout=0.0)
VOCAB = 50
G, T, PRIMER = 3, 14, 5


def _setup():
    model = TransformerXL(VOCAB, CFG, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (G, T), 1, VOCAB)
    memory = init_memory(CFG.num_layers, G, 0, CFG.units)
    params = model.init({"params": rng}, tokens, memory)["params"]
    return model, params, tokens


def test_decode_matches_forward():
    model, params, tokens = _setup()
    memory = init_memory(CFG.num_layers, G, 0, CFG.units)
    full_logits, _ = model.apply({"params": params}, tokens, memory)  # [G,T,V]

    cache = init_cache(CFG, G, capacity=T + 2)
    rel = precompute_rel(params, CFG, max_distance=T + 2)
    cache = prefill(model, params, CFG, tokens[:, :PRIMER], cache)
    assert int(cache.length[0]) == PRIMER

    advance = jnp.ones((G,), dtype=bool)
    for j in range(PRIMER, T):
        logits, k_self, v_self = decode_step(params, CFG, rel, tokens[:, j], cache)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full_logits[:, j]),
                                   rtol=2e-4, atol=2e-4)
        cache = commit(cache, k_self, v_self, advance)
    assert int(cache.length[0]) == T


def test_decode_per_row_lengths():
    """Rows with different cache lengths decode independently and match a
    row-by-row computation."""
    model, params, tokens = _setup()
    cache = init_cache(CFG, G, capacity=T + 2)
    rel = precompute_rel(params, CFG, max_distance=T + 2)
    cache = prefill(model, params, CFG, tokens[:, :PRIMER], cache)

    # advance only row 0 twice
    for j in range(PRIMER, PRIMER + 2):
        _, k_self, v_self = decode_step(params, CFG, rel, tokens[:, j], cache)
        cache = commit(cache, k_self, v_self,
                       jnp.array([True, False, False]))
    np.testing.assert_array_equal(np.asarray(cache.length),
                                  [PRIMER + 2, PRIMER, PRIMER])

    # row 1's logits with its shorter cache == single-row reference
    logits, _, _ = decode_step(params, CFG, rel, tokens[:, PRIMER], cache)
    memory = init_memory(CFG.num_layers, 1, 0, CFG.units)
    ref, _ = model.apply({"params": params},
                         tokens[1:2, :PRIMER + 1], memory)
    np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(ref[0, -1]),
                               rtol=2e-4, atol=2e-4)


def test_cache_append_matches_select_commit():
    """The block-aligned cache_append path (capacity % 128 == 0) must be
    semantically identical to the full-buffer masked select, including
    no-advance rows and rows already at capacity (which must never write)."""
    from commu_tpu.ops.layout import cache_append

    rng = np.random.default_rng(7)
    L, G, H, dh, M = 2, 4, 3, 5, 256
    k = jnp.asarray(rng.normal(size=(L, G, H, dh, M)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(L, G, H, dh, M)), jnp.float32)
    k_self = jnp.asarray(rng.normal(size=(L, G, H, dh)), jnp.float32)
    v_self = jnp.asarray(rng.normal(size=(L, G, H, dh)), jnp.float32)
    length = jnp.array([0, 129, M, 255], jnp.int32)
    advance = jnp.array([True, True, True, False])

    new_k, new_v = cache_append(k, v, k_self, v_self, length, advance)

    one_hot = (jnp.arange(M)[None, :] == length[:, None])
    write = np.asarray((one_hot & advance[:, None]))[None, :, None, None, :]
    ref_k = np.where(write, np.asarray(k_self)[..., None], np.asarray(k))
    ref_v = np.where(write, np.asarray(v_self)[..., None], np.asarray(v))
    np.testing.assert_array_equal(np.asarray(new_k), ref_k)
    np.testing.assert_array_equal(np.asarray(new_v), ref_v)
    # row 2 was at capacity: untouched
    np.testing.assert_array_equal(np.asarray(new_k[:, 2]), np.asarray(k[:, 2]))


def test_decode_block_aligned_capacity():
    """Full decode parity through the kernel-routed commit (capacity 128)."""
    model, params, tokens = _setup()
    memory = init_memory(CFG.num_layers, G, 0, CFG.units)
    full_logits, _ = model.apply({"params": params}, tokens, memory)

    cache = init_cache(CFG, G, capacity=128)
    rel = precompute_rel(params, CFG, max_distance=128)
    cache = prefill(model, params, CFG, tokens[:, :PRIMER], cache)
    advance = jnp.ones((G,), dtype=bool)
    for j in range(PRIMER, T):
        logits, k_self, v_self = decode_step(params, CFG, rel, tokens[:, j],
                                             cache)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full_logits[:, j]),
                                   rtol=2e-4, atol=2e-4)
        cache = commit(cache, k_self, v_self, advance)
    assert int(cache.length[0]) == T


def test_commit_no_advance_keeps_cache():
    model, params, tokens = _setup()
    cache = init_cache(CFG, G, capacity=T)
    rel = precompute_rel(params, CFG, max_distance=T)
    cache = prefill(model, params, CFG, tokens[:, :PRIMER], cache)
    logits1, k_self, v_self = decode_step(params, CFG, rel, tokens[:, PRIMER], cache)
    cache2 = commit(cache, k_self, v_self, jnp.zeros((G,), dtype=bool))
    np.testing.assert_array_equal(np.asarray(cache.length), np.asarray(cache2.length))
    # recomputation with unchanged state reproduces identical logits
    logits2, _, _ = decode_step(params, CFG, rel, tokens[:, PRIMER], cache2)
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits2))
