"""Incremental decoding: prefill + per-row KV cache, built for jit sampling.

The reference generates one token per Python-driven forward, recomputing
q/k/v over the ENTIRE [mems; token] window every step — O(klen·d²) per token
(reference: commu/midi_generator/midi_inferrer.py:199-207,
commu/model/model.py:606-628,540-604).  The TPU-native decode path instead:

- caches K/V per layer once per committed token (O(d²) + O(klen·d) per step);
- keeps the cache LEFT-ALIGNED with a per-row ``length`` so a whole batch of
  prompts decodes in lock-step inside one jit loop even when rows advance at
  different rates (the teacher-forcing state machine can stall a row);
- stores the cache LANE-DENSE as [L, G, H, dh, M] — with the head dim minor
  ([.., M, H, dh]) the dh=50 axis pads to 128 lanes, a 2.56x tax on the
  cache reads that dominate each decode step AND on the full-buffer commit
  select;
- computes the XL ``BD`` term through the angle-addition factorization (see
  commu_tpu.ops.fused_attention): BD[g,h,m] = u[g,h]·emb(len_g − m) with the
  sinusoid factored into per-ROW trig of the current length (tiny, computed
  on the fly from the traced lengths) times a static per-SLOT basis table —
  one matmul instead of the pad/reverse/per-row-dynamic-slice dance.

Numerical contract: identical logits to ``TransformerXL.forward`` (and hence
to the reference's ``forward_generate``) for any prefix — asserted by
tests/test_decode.py.  ``same_length=True`` at inference is a no-op because
klen never exceeds ``memory_length`` (reference: model.py:549-560 — mask_len
<= 0 for every generation step), so decode is plain causal attention.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import ModelConfig
from ..ops.fused_attention import (_fpad, _inv_freq, key_trig_basis,
                                   pack_r_kernel)
from ..ops.layout import cache_append


@struct.dataclass
class KVCache:
    """Left-aligned per-layer key/value cache.

    k, v: [L, G, H, Dh, M]; length: [G] valid prefix length per row.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray


def init_cache(cfg: ModelConfig, batch: int, capacity: int,
               dtype=jnp.float32) -> KVCache:
    n_head = cfg.num_heads
    d_head = cfg.units // n_head
    shape = (cfg.num_layers, batch, n_head, d_head, capacity)
    return KVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        length=jnp.zeros((batch,), dtype=jnp.int32),
    )


def _layer(params, i: int):
    return params[f"layer_{i}"]


def precompute_rel(params, cfg: ModelConfig, max_distance: int):
    """Position-score tables: (W_r [L, H, Dh, 2F] packed per layer,
    psi [2F, max_distance+1] per-slot trig basis).

    BD[g, h, m] = qr[g,h] · r_net(emb(length_g − m)) factors through the
    angle-addition identities into (qr W_r, trig(length_g)) × psi(m); the
    per-row trig factors are computed each step from the traced lengths.
    Requires the unclamped sinusoid (cfg.clamp_len <= 0 — the reference's
    configuration, config_helper.py:7-14).
    """
    if cfg.clamp_len > 0:
        raise NotImplementedError(
            "decode requires clamp_len <= 0 (reference default)")
    wr = jnp.stack([
        pack_r_kernel(_layer(params, i)["attn"]["r_net"]["kernel"],
                      cfg.num_heads)
        for i in range(cfg.num_layers)
    ])                                                # [L, H, Dh, 2F]
    psi = key_trig_basis(max_distance + 1, cfg.units, dtype=jnp.float32)
    return wr, psi


def _layer_norm(x, scale, bias, eps=1e-5):
    x = x.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def decode_step(params, cfg: ModelConfig, rel, tokens: jnp.ndarray,
                cache: KVCache) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-token forward for every row.

    Args:
        rel: (W_r, psi) from ``precompute_rel``.
        tokens: [G] int32 — each row's current last token.
        cache:  KVCache whose first ``length[g]`` slots hold row g's context.

    Returns:
        (logits [G, V] f32, k_self [L, G, H, Dh], v_self [L, G, H, Dh]).
        The self K/V are NOT written to the cache — call ``commit`` with a
        per-row advance mask to mirror the reference's memory-commit rules
        (first_loop / logits-reuse iterations do not advance memory,
        midi_inferrer.py:253-260).
    """
    wr_all, psi = rel
    n_head = cfg.num_heads
    d_head = cfg.units // n_head
    hd = n_head * d_head
    capacity = cache.k.shape[4]
    scale = 1.0 / (d_head ** 0.5)
    fpad = _fpad(cfg.units)

    emb = params["embedding"]
    dtype = emb.dtype  # bf16 params -> mixed-precision decode (f32 softmax/LN)
    x = emb[tokens] * jnp.asarray(cfg.units ** 0.5, dtype)  # [G, D]
    r_w = params["r_w_bias"].astype(dtype)         # [H, Dh]
    r_r = params["r_r_bias"].astype(dtype)

    j_idx = jnp.arange(capacity)[None, :]          # [1, M]
    valid = j_idx < cache.length[:, None]          # [G, M]
    # per-row trig factors of the current length (distance base a_g = len_g)
    ang = cache.length[:, None].astype(jnp.float32) * \
        _inv_freq(cfg.units)[None, :]              # [G, F0]
    pad = fpad - ang.shape[1]
    sin_a = jnp.pad(jnp.sin(ang), ((0, 0), (0, pad)))      # [G, F]
    cos_a = jnp.pad(jnp.cos(ang), ((0, 0), (0, pad)))
    psi_m = psi[:, :capacity]                      # [2F, M]

    k_selfs, v_selfs = [], []
    for i in range(cfg.num_layers):
        lp = _layer(params, i)["attn"]
        q = (x @ lp["q_net"]["kernel"]).reshape(-1, n_head, d_head)
        kv = x @ lp["kv_net"]["kernel"]
        k_self = kv[:, :hd].reshape(-1, n_head, d_head)
        v_self = kv[:, hd:].reshape(-1, n_head, d_head)
        k_selfs.append(k_self)
        v_selfs.append(v_self)

        qw = q + r_w
        qr = q + r_r
        # content scores over cache + self (operands stay in storage dtype;
        # scores accumulate in f32)
        ac = jnp.einsum("ghd,ghdm->ghm", qw, cache.k[i].astype(dtype),
                        preferred_element_type=jnp.float32)
        ac_self = jnp.einsum("ghd,ghd->gh", qw, k_self,
                             preferred_element_type=jnp.float32)
        # position scores via angle addition: u = qr W_r, then the per-row
        # trig rotation, then one matmul against the slot basis
        u = jnp.einsum("ghd,hdf->ghf", qr, wr_all[i].astype(dtype),
                       preferred_element_type=jnp.float32)   # [G, H, 2F]
        u_s, u_c = u[..., :fpad], u[..., fpad:]
        phi_cos = u_s * sin_a[:, None] + u_c * cos_a[:, None]
        phi_sin = u_c * sin_a[:, None] - u_s * cos_a[:, None]
        phi = jnp.concatenate([phi_cos, phi_sin], axis=-1)   # [G, H, 2F]
        bd = jnp.einsum("ghf,fm->ghm", phi.astype(jnp.float32), psi_m,
                        preferred_element_type=jnp.float32)
        # self term is distance 0: emb(0) = [sin 0 | cos 0] = [0... | 1...]
        bd_self = u_c.sum(axis=-1)                           # [G, H]

        score = (ac + bd) * scale                   # [G, H, M]
        score = jnp.where(valid[:, None, :], score, -jnp.inf)
        score_self = ((ac_self + bd_self) * scale)[:, :, None]
        full = jnp.concatenate([score, score_self], axis=2)
        probs = jax.nn.softmax(full, axis=2)

        out = jnp.einsum("ghm,ghdm->ghd", probs[:, :, :capacity].astype(dtype),
                         cache.v[i].astype(dtype),
                         preferred_element_type=jnp.float32)
        out = out + probs[:, :, capacity][:, :, None] * v_self.astype(jnp.float32)
        out = out.astype(dtype).reshape(-1, hd) @ lp["o_net"]["kernel"]

        ln = lp["layer_norm"]
        x = _layer_norm(x + out, ln["scale"], ln["bias"]).astype(dtype)

        fp = _layer(params, i)["ff"]
        h = jax.nn.relu(x @ fp["ff1"]["kernel"] + fp["ff1"]["bias"])
        h = h @ fp["ff2"]["kernel"] + fp["ff2"]["bias"]
        ln = fp["layer_norm"]
        x = _layer_norm(x + h, ln["scale"], ln["bias"]).astype(dtype)

    logits = (x.astype(jnp.float32) @ emb.T.astype(jnp.float32)
              + params["out_bias"].astype(jnp.float32))
    return logits, jnp.stack(k_selfs), jnp.stack(v_selfs)


def commit(cache: KVCache, k_self: jnp.ndarray, v_self: jnp.ndarray,
           advance: jnp.ndarray) -> KVCache:
    """Append each row's self K/V at its current length where ``advance``.

    When the capacity is block-aligned this routes through the
    ``cache_append`` Pallas kernel: each (layer, row) program DMAs only the
    one [H, dh, 128]-lane block containing the write position and the
    buffers alias in place.  The fallback is a full-buffer masked select —
    fine for small capacities, but it reads AND rewrites the whole cache
    every token (~800 MB/token at G=32 full size), which is what made
    batched generation scale WORSE past batch 8 in round 3
    (BENCH_generation.json).  A per-row scatter was measured slower than
    both (scatters serialize on TPU).
    """
    import os
    capacity = cache.k.shape[4]
    new_len = cache.length + advance.astype(jnp.int32)
    if capacity % 128 == 0 and os.environ.get("COMMU_CACHE_APPEND", "1") != "0":
        new_k, new_v = cache_append(cache.k, cache.v, k_self, v_self,
                                    cache.length, advance)
        return KVCache(k=new_k, v=new_v, length=new_len)
    one_hot = (jnp.arange(capacity)[None, :] == cache.length[:, None])
    write = one_hot & advance[:, None]               # [G, M]
    w = write[None, :, None, None, :]                # [L, G, 1, 1, M]
    new_k = jnp.where(w, k_self[..., None].astype(cache.k.dtype), cache.k)
    new_v = jnp.where(w, v_self[..., None].astype(cache.v.dtype), cache.v)
    return KVCache(k=new_k, v=new_v, length=new_len)


def prefill(model, params, cfg: ModelConfig, tokens: jnp.ndarray,
            cache: KVCache) -> KVCache:
    """Run the full forward over the primer tokens and populate the cache.

    Mirrors the reference's ``init_seq_and_mems`` (midi_inferrer.py:186-197):
    the primer is [pad] + meta[:10] (11 tokens); the K/V of every primer token
    enters the cache.
    """
    from .transformer_xl import init_memory, resolve_attn_impl

    batch, t = tokens.shape
    memory = init_memory(cfg.num_layers, batch, 0, cfg.units)
    _, _, hids = model.apply({"params": params}, tokens, memory,
                             method=model.forward, return_hiddens=True)
    if resolve_attn_impl(cfg) == "pallas":
        # the pallas layer stack emits hids T-minor ([G, D, T]); prefill is
        # one tiny forward per episode, so the flip is negligible
        hids = [jnp.swapaxes(h, 1, 2) for h in hids]
    n_head = cfg.num_heads
    d_head = cfg.units // n_head
    hd = n_head * d_head
    new_k, new_v = cache.k, cache.v
    for i in range(cfg.num_layers):
        kernel = _layer(params, i)["attn"]["kv_net"]["kernel"]
        kv = hids[i].astype(jnp.float32) @ kernel      # [G, T, 2*hd]
        k = kv[..., :hd].reshape(batch, t, n_head, d_head).transpose(0, 2, 3, 1)
        v = kv[..., hd:].reshape(batch, t, n_head, d_head).transpose(0, 2, 3, 1)
        new_k = new_k.at[i, :, :, :, :t].set(k.astype(new_k.dtype))
        new_v = new_v.at[i, :, :, :, :t].set(v.astype(new_v.dtype))
    return KVCache(k=new_k, v=new_v,
                   length=jnp.full((batch,), t, dtype=jnp.int32))
