"""XL-style relative-position attention primitives (XLA-friendly).

Static-shape reformulation of the reference's dynamic-length attention
(reference: commu/model/model.py:185-354,540-583).  The memory buffer has a
*fixed* capacity M with the valid region right-aligned, so every shape seen by
XLA is static; the number of currently-valid memory slots (``mem_count``) only
enters through boolean masks.  With key index j over [0, M+T) and query index
i over [0, T):

    reference key index  j_ref = j - (M - mem_count)
    causal block         j_ref >= i + 1 + mem_count   <=>   j >= M + i + 1
    invalid-buffer block j < M - mem_count
    same_length block    j_ref <= i - shift, shift = T - max(mem_count+T-M, 0)
    reset-row block      all memory keys (j < M) of rows starting a sequence

which makes the causal part fully static and the rest cheap broadcast
comparisons — no dynamic shapes anywhere.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """Align the query·rel-pos term BD from distance-indexed to key-indexed.

    Input ``x[b, h, i, d]`` scores queries against relative distances
    ``klen-1-d``; output ``y[b, h, i, j] = x[b, h, i, j - i + (klen - 1) - (klen - 1)]``
    such that key j of query i picks the distance ``(M + i) - j``.  Same
    pad/reshape trick as the reference (_rel_shift, model.py:251-265).
    """
    b, h, t, k = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, k + 1, t)
    return x[:, :, 1:, :].reshape(b, h, t, k)


def relative_position_embedding(klen: int, d_model: int, dtype=jnp.float32,
                                clamp_len: int = -1) -> jnp.ndarray:
    """Sinusoidal embedding of the descending distance sequence
    ``[klen-1, ..., 0]`` (reference: model.py:136-152,578-583)."""
    pos_seq = jnp.arange(klen - 1, -1, -1, dtype=jnp.float32)
    if clamp_len > 0:
        pos_seq = jnp.minimum(pos_seq, clamp_len)
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, d_model, 2, dtype=jnp.float32) / d_model))
    sinusoid = jnp.outer(pos_seq, inv_freq)
    return jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=-1).astype(dtype)


def build_attention_mask(
    tgt_len: int,
    mem_capacity: int,
    mem_count: jnp.ndarray,
    reset: jnp.ndarray | None,
    same_length: bool,
    batch: int,
) -> jnp.ndarray:
    """Boolean mask [B, 1, T, M+T]; True = attention blocked.

    Mirrors the reference mask construction (model.py:549-574) under the
    right-aligned static buffer mapping described in the module docstring.
    """
    klen = mem_capacity + tgt_len
    i = jax.lax.broadcasted_iota(jnp.int32, (tgt_len, klen), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (tgt_len, klen), 1)

    causal = j >= mem_capacity + i + 1
    invalid = j < mem_capacity - mem_count
    mask = causal | invalid

    if same_length:
        mask_len = mem_count + tgt_len - mem_capacity
        shift = tgt_len - jnp.maximum(mask_len, 0)
        lower = j <= i - shift + (mem_capacity - mem_count)
        mask = mask | lower

    mask = jnp.broadcast_to(mask[None, None], (batch, 1, tgt_len, klen))
    if reset is not None:
        mem_keys = (j < mem_capacity)[None, None]
        mask = mask | (reset[:, None, None, None] & mem_keys)
    return mask
