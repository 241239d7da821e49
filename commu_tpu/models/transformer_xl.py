"""Transformer-XL language model in Flax (TPU-native).

Functional rebuild of the reference's ``MemTransformerLM`` (reference:
commu/model/model.py:423-693) with the same math but TPU-first structure:

- batch-major ``[B, T, D]`` activations, static shapes everywhere;
- the segment-level recurrence memory is a *fixed-capacity*, right-aligned
  hidden-state buffer carried functionally through the step (no in-place
  mutation, no dynamic lengths — see ``commu_tpu.ops.rel_attention``);
- K/V for the memory segment are computed with a dedicated kv projection over
  the memory only (the reference recomputes q,k,v over [mems; x] and discards
  the memory-q — identical math, fewer FLOPs);
- per-row ``reset`` flags reproduce the reference's masking-only reset
  semantics (stale memories are *not* zeroed; they fall out of the rolling
  buffer naturally — model.py:507-538,557-574);
- embedding and output softmax weights are tied (model.py:480-481).

Compute dtype is configurable (bf16 matmuls with f32 softmax/LayerNorm by
default on TPU); parameters are always f32.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax import struct

from ..config import ModelConfig
from ..ops.rel_attention import build_attention_mask, rel_shift, relative_position_embedding


def resolve_attn_impl(cfg: ModelConfig) -> str:
    """'auto' -> the fused Pallas kernel on TPU, the XLA path elsewhere.

    The kernel computes the relative-position term through the angle-addition
    factorization (see commu_tpu.ops.fused_attention), which requires the
    unclamped sinusoid — with ``clamp_len > 0`` (never used by the reference
    configs) the XLA path is selected regardless."""
    impl = cfg.attn_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas" and cfg.clamp_len > 0:
        return "xla"
    return impl


@struct.dataclass
class Memory:
    """Rolling hidden-state cache: one stream per layer plus the embedding
    stream (index 0), in a fixed-capacity buffer.

    Two physical layouts share this container:
    - XLA attention path: right-aligned shift buffer [L+1, B, M, D], ``head``
      stays 0 (every update rewrites the whole buffer);
    - Pallas path (``transposed``): BLOCKED D-major RING buffer
      [L+1, R, B, D, T] — R slabs of T token slots each (slot j lives at
      block j // T, lane j % T; M = R*T).  D on sublanes feeds the
      fused-attention kv projection without a relayout; the RING dimension
      ahead of [B, D, T] makes the per-step update a contiguous slab copy
      (the layer stack already produces [B, D, T] rows)
      through an aliased Pallas kernel (``commu_tpu.ops.layout.ring_write``)
      — with the ring minor ([.., D, M] + lane offset) the same update
      decomposes into 256-byte strided writes that XLA can only lower as a
      full-buffer rewrite (~3 ms/step at the training shape).  The layer dim
      stays LEADING so the per-layer slice the kv projections consume
      remains a free contiguous view (ring-leading costs a ~4.7 ms
      materialized slice per step).  The kernel rotates its
      relative-position term to the ring order; ``logical_memory_view``
      converts to the right-aligned layout for comparisons.
    """

    hidden: jnp.ndarray  # [L+1, B, M, D], or [L+1, R, B, D, T] when transposed
    count: jnp.ndarray   # int32 scalar: number of valid slots (clamped at M)
    head: jnp.ndarray    # int32 scalar: next ring write position (0 for XLA)
    # Static pytree metadata, not traced.
    transposed: bool = struct.field(pytree_node=False, default=False)


def ring_blocks(capacity: int, block_len: Optional[int]) -> Tuple[int, int]:
    """(R, T) slab decomposition of a blocked ring: R slabs of T token slots
    (T = ``block_len`` or the whole capacity); T must divide the capacity."""
    t = block_len or capacity
    r = capacity // t if t else 0
    assert r * (t or 0) == capacity, (capacity, t)
    return r, t


def init_memory(num_layers: int, batch: int, capacity: int, d_model: int,
                dtype=jnp.float32, transposed: bool = False,
                block_len: Optional[int] = None,
                pin_layout: bool = False) -> Memory:
    """``block_len`` (transposed only): ring slab size in tokens — must equal
    the segment length the memory will be updated with (training/eval
    ``tgt_length``); defaults to ``capacity`` (one slab).

    ``pin_layout`` pins the buffer's physical layout to row-major on TPU —
    pass True when the memory feeds a layout-pinned jit boundary (the
    sharded eval step); must stay False under a jit trace (the default:
    this is called inside traced contexts like decode prefill)."""
    if transposed:
        r, t = ring_blocks(capacity, block_len)
        shape = (num_layers + 1, r, batch, d_model, t)
    else:
        shape = (num_layers + 1, batch, capacity, d_model)
    if pin_layout:
        from ..ops.layout import pinned_rowmajor_zeros
        hidden = pinned_rowmajor_zeros(shape, dtype)
    else:
        hidden = jnp.zeros(shape, dtype=dtype)
    return Memory(
        hidden=hidden,
        count=jnp.zeros((), dtype=jnp.int32),
        head=jnp.zeros((), dtype=jnp.int32),
        transposed=transposed,
    )


def memory_capacity(memory: Memory) -> int:
    if memory.transposed:
        return memory.hidden.shape[1] * memory.hidden.shape[4]
    return memory.hidden.shape[2]


def logical_memory_view(memory: Memory) -> jnp.ndarray:
    """Memory contents as [L+1, B, M, D] in the right-aligned layout
    regardless of physical layout (ring start = (head - count) mod M maps
    logical l -> physical (start + l) mod M; the newest token lands at the
    right edge)."""
    hidden = memory.hidden
    if memory.transposed:
        l1, r, b, d, t = hidden.shape
        hidden = jnp.transpose(hidden, (0, 2, 3, 1, 4)).reshape(l1, b, d, r * t)
        hidden = jnp.swapaxes(hidden, 2, 3)
    m_cap = hidden.shape[2]
    start = jnp.mod(memory.head - memory.count, m_cap) if m_cap else 0
    rolled = jnp.roll(hidden, -start, axis=2) if m_cap else hidden
    # logical l=0..count-1 now at positions 0..count-1; right-align them
    return jnp.roll(rolled, m_cap - memory.count, axis=2) if m_cap else rolled


def _normal_init(std: float):
    return nn.initializers.normal(stddev=std)


def _ln_scale_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return 1.0 + jax.random.normal(key, shape, dtype) * std
    return init


class Proj(nn.Module):
    """Bias-free projection with a Dense-compatible parameter
    (``<name>/kernel`` of shape [in, features]) whose application layout is
    caller-chosen: the kernel-layout einsums write the fused-attention
    operand layouts DIRECTLY out of the matmul, instead of paying a
    relayout copy per tensor per call."""

    features: int
    dtype: jnp.dtype = jnp.float32
    in_features: Optional[int] = None  # default: x.shape[-1]

    @nn.compact
    def __call__(self, x, einsum: str = None, kernel_shape=None,
                 kernel_slice: slice = None, return_kernel: bool = False):
        in_features = self.in_features or x.shape[-1]
        kernel = self.param("kernel", _normal_init(0.01),
                            (in_features, self.features), jnp.float32)
        kernel = kernel.astype(self.dtype)
        if return_kernel:
            # the fused-attention path consumes the position projection as a
            # kernel operand (pack_r_kernel) instead of applying it here
            return kernel
        if kernel_slice is not None:
            # slicing the (tiny) parameter instead of the (huge) activation:
            # e.g. the packed kv projection splits into separate k and v
            # einsums so no [B, K, 2, H, dh] output ever needs slicing
            kernel = kernel[:, kernel_slice]
        if einsum is None:
            return x @ kernel
        return jnp.einsum(einsum, x, kernel.reshape(kernel_shape))


class DenseP(nn.Module):
    """nn.Dense-compatible (same param names/shapes/init, same bf16
    application) with value access for the fused-FFN kernel path."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x=None, return_params: bool = False):
        kernel = self.param("kernel", _normal_init(0.01),
                            (self.in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if return_params:
            return kernel, bias
        return x @ kernel.astype(self.dtype) + bias.astype(self.dtype)


class LayerNormP(nn.Module):
    """nn.LayerNorm-compatible (same param names/shapes/init, f32 fast-
    variance stats, eps 1e-5) with value access for the fused-FFN kernel."""

    dim: int

    @nn.compact
    def __call__(self, x=None, return_params: bool = False):
        scale = self.param("scale", _ln_scale_init(0.01), (self.dim,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        if return_params:
            return scale, bias
        x = x.astype(jnp.float32)
        mean = x.mean(axis=-1, keepdims=True)
        var = jnp.maximum((x * x).mean(axis=-1, keepdims=True) - mean * mean,
                          0.0)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * scale + bias


class RelMultiHeadAttention(nn.Module):
    """Relative-position multi-head attention with learned content/position
    biases (reference: model.py:272-354)."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mem, pos_emb, r_w_bias, r_r_bias, mask,
                 deterministic: bool, pallas_ctx=None, layer_idx: int = 0,
                 return_pre_norm: bool = False):
        """``x`` is [B, T, D] on the XLA path but [B, D, T] on the pallas
        path — the layer stack carries its activations T-minor end to end
        so no orientation flip ever materializes (see ``TransformerXL.forward``)."""
        cfg = self.cfg
        d_model = cfg.units
        n_head = cfg.num_heads
        d_head = d_model // n_head
        impl = resolve_attn_impl(cfg)
        batch = x.shape[0]
        tgt_len = x.shape[2] if impl == "pallas" else x.shape[1]
        # the pallas path receives the FULL blocked D-major ring buffer
        # [L+1, R, B, D, T] plus this layer's index (see forward)
        mem_capacity = (mem.shape[1] * mem.shape[4] if impl == "pallas"
                        else mem.shape[1])
        klen = mem_capacity + tgt_len
        hd = n_head * d_head

        q_net = Proj(hd, self.dtype, in_features=d_model, name="q_net")
        kv_net = Proj(2 * hd, self.dtype, in_features=d_model, name="kv_net")
        r_net = Proj(hd, self.dtype, in_features=d_model, name="r_net")
        o_net = Proj(d_model, self.dtype, in_features=hd, name="o_net")

        scale = 1.0 / (d_head ** 0.5)

        if impl == "pallas":
            from ..ops import fused_attention

            # projections emit the kernel layout straight from the MXU:
            # head dim on sublanes, token dim on lanes (dh=50 would pad to
            # 128 lanes if it were minor — 2.56x HBM/VMEM/MXU waste), and
            # CONSUME the T-minor [B, D, T] activations the previous layer
            # produced (a D-minor input would pay a relayout copy per layer).
            # The memory and window halves are projected SEPARATELY so the
            # [mems; x] concat never materializes (it would re-lay-out the
            # whole memory every layer; the kernel joins the halves in VMEM)
            q = q_net(x, "bdt,dhc->bhct", (d_model, n_head, d_head))
            k_win = kv_net(x, "bdt,dhc->bhct", (d_model, n_head, d_head),
                           kernel_slice=slice(0, hd))
            v_win = kv_net(x, "bdt,dhc->bhct", (d_model, n_head, d_head),
                           kernel_slice=slice(hd, 2 * hd))
            w_r = fused_attention.pack_r_kernel(
                r_net(None, return_kernel=True), n_head)

            mem_count, mem_head, reset, same_length, psi = pallas_ctx
            train_drop = (not deterministic) and cfg.attention_dropout > 0.0
            if train_drop:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32)
            else:
                seed = jnp.zeros((), dtype=jnp.int32)
            if mem_capacity > 0:
                # the memory half is projected INSIDE the fused-attention VJP
                # boundary: the memory is stop-gradient (XL semantics), so
                # the backward accumulates dWk/dWv in-kernel and the
                # [B, H, dh, M] memory cotangents never exist in HBM
                kv_kernel = kv_net(None, return_kernel=True)
                wk3 = kv_kernel[:, :hd].reshape(d_model, n_head, d_head)
                wv3 = kv_kernel[:, hd:].reshape(d_model, n_head, d_head)
                if mem.dtype != x.dtype:
                    # an astype here would copy the FULL multi-GB ring buffer
                    # once per layer; the memory is created with the model
                    # dtype, so a mismatch is a wiring bug — fail loudly
                    raise TypeError(
                        f"pallas path: memory dtype {mem.dtype} must equal "
                        f"activation dtype {x.dtype}")
                vec = fused_attention.attention_mem(
                    q, mem, layer_idx, wk3, wv3, k_win,
                    v_win, w_r, psi, r_w_bias, r_r_bias, mem_count, mem_head,
                    reset, d_model=d_model, scale=scale,
                    same_length=same_length,
                    dropout_p=cfg.attention_dropout, dropout_seed=seed,
                    train=not deterministic)
            else:
                vec = fused_attention.attention(
                    q, k_win, v_win, w_r, psi, r_w_bias, r_r_bias,
                    reset, d_model=d_model, scale=scale,
                    same_length=same_length, dropout_p=cfg.attention_dropout,
                    dropout_seed=seed, train=not deterministic)
            if return_pre_norm:
                from ..ops.fused_ffn import o_in_ffn
                if o_in_ffn():
                    # o projection fused into the FFN kernel: hand the raw
                    # attention vector + the o_net kernel to DecoderLayer
                    ln = LayerNormP(d_model, name="layer_norm")
                    return (vec.astype(x.dtype),
                            o_net(None, return_kernel=True),
                            ln(return_params=True))
                # fused-FFN path: emit the projection straight into the
                # kernel's [B, D, T] orientation, pre-dropout/pre-LN
                out = o_net(vec.astype(x.dtype), "bhct,hcd->bdt",
                            (n_head, d_head, d_model))
            else:
                out = o_net(vec.astype(x.dtype), "bhct,hcd->btd",
                            (n_head, d_head, d_model))
        else:
            cat = jnp.concatenate([mem.astype(x.dtype), x], axis=1)
            q = q_net(x).reshape(batch, tgt_len, n_head, d_head)
            kv = kv_net(cat)
            k = kv[..., :hd].reshape(batch, klen, n_head, d_head)
            v = kv[..., hd:].reshape(batch, klen, n_head, d_head)
            r = r_net(pos_emb).reshape(klen, n_head, d_head)

            ac = jnp.einsum("bihd,bjhd->bhij", q + r_w_bias.astype(q.dtype), k)
            bd = jnp.einsum("bihd,jhd->bhij", q + r_r_bias.astype(q.dtype), r)
            bd = rel_shift(bd)

            score = (ac + bd).astype(jnp.float32) * scale
            score = jnp.where(mask, -jnp.inf, score)
            probs = jax.nn.softmax(score, axis=-1)
            probs = nn.Dropout(cfg.attention_dropout)(probs,
                                                      deterministic=deterministic)

            vec = jnp.einsum("bhij,bjhd->bihd", probs.astype(v.dtype), v)
            vec = vec.reshape(batch, tgt_len, n_head * d_head)
            out = o_net(vec)
        ln = LayerNormP(d_model, name="layer_norm")
        if return_pre_norm:
            # fused-FFN path (DecoderLayer): ``out`` is [B, D, T] (pallas) or
            # gets reoriented here; dropout/LN happen inside the fused block
            if impl != "pallas":
                out = jnp.swapaxes(out, 1, 2)
            return out, ln(return_params=True)
        out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
        if impl == "pallas":
            # standalone (non-fused-FFN) use: x is [B, D, T]; LayerNormP
            # normalizes the minor axis, so flip for the residual+LN and
            # flip back (DecoderLayer's production path never comes here)
            y = ln(jnp.swapaxes(x, 1, 2).astype(jnp.float32) +
                   out.astype(jnp.float32)).astype(x.dtype)
            return jnp.swapaxes(y, 1, 2)
        return ln(x.astype(jnp.float32) +
                  out.astype(jnp.float32)).astype(x.dtype)


class PositionwiseFF(nn.Module):
    """Post-LN position-wise feed-forward block (reference: model.py:155-181)."""

    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool, return_params: bool = False):
        cfg = self.cfg
        ff1 = DenseP(cfg.inner_size, cfg.units, self.dtype, name="ff1")
        ff2 = DenseP(cfg.units, cfg.inner_size, self.dtype, name="ff2")
        ln = LayerNormP(cfg.units, name="layer_norm")
        if return_params:
            # fused-FFN path: the kernel applies these directly
            return (ff1(return_params=True), ff2(return_params=True),
                    ln(return_params=True))
        h = nn.relu(ff1(x))
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        h = ff2(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return ln(x.astype(jnp.float32) +
                  h.astype(jnp.float32)).astype(x.dtype)


class DecoderLayer(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mem, pos_emb, r_w_bias, r_r_bias, mask,
                 deterministic: bool, pallas_ctx=None, layer_idx: int = 0):
        attn = RelMultiHeadAttention(self.cfg, self.dtype, name="attn")
        ff = PositionwiseFF(self.cfg, self.dtype, name="ff")
        if pallas_ctx is None:
            x = attn(x, mem, pos_emb, r_w_bias, r_r_bias, mask,
                     deterministic, pallas_ctx, layer_idx)
            return ff(x, deterministic)
        # pallas path: everything after the attention projection — residual
        # dropout, both LayerNorms, and the position-wise FFN — runs in ONE
        # fused kernel over [B, D, T] tiles (commu_tpu.ops.fused_ffn).  The
        # layer stack carries x as [B, D, T] end to end, so there is no
        # orientation flip anywhere between kernels.
        from ..ops.fused_ffn import ffn_block, ffn_block_fused_o
        res = attn(x, mem, pos_emb, r_w_bias, r_r_bias, mask,
                   deterministic, pallas_ctx, layer_idx,
                   return_pre_norm=True)
        if len(res) == 3:
            # COMMU_O_IN_FFN: raw attention vector + o_net kernel; the o
            # projection runs inside the FFN kernel
            vec, wo, (g1, be1) = res
        else:
            (o, (g1, be1)), wo = res, None
        (w1, b1), (w2, b2), (g2, be2) = ff(None, deterministic,
                                           return_params=True)
        train_drop = (not deterministic) and self.cfg.dropout > 0.0
        if train_drop:
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32)
        else:
            seed = jnp.zeros((), dtype=jnp.int32)
        if wo is not None:
            b_, h_, dh_, t_ = vec.shape
            return ffn_block_fused_o(
                x, vec.reshape(b_, h_ * dh_, t_), wo,
                w1.astype(self.dtype), b1, w2.astype(self.dtype), b2,
                g1, be1, g2, be2, seed, self.cfg.dropout, not deterministic)
        return ffn_block(x, o,
                         w1.astype(self.dtype), b1, w2.astype(self.dtype), b2,
                         g1, be1, g2, be2, seed, self.cfg.dropout,
                         not deterministic)


class TransformerXL(nn.Module):
    """The full LM.  ``forward`` -> (hidden, new_memory); ``logits`` projects
    hidden states through the tied embedding."""

    vocab_size: int
    cfg: ModelConfig = ModelConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        d_head = cfg.units // cfg.num_heads
        self.embedding = self.param("embedding", _normal_init(0.01),
                                    (self.vocab_size, cfg.units), jnp.float32)
        self.out_bias = self.param("out_bias", nn.initializers.zeros,
                                   (self.vocab_size,), jnp.float32)
        self.r_w_bias = self.param("r_w_bias", _normal_init(0.01),
                                   (cfg.num_heads, d_head), jnp.float32)
        self.r_r_bias = self.param("r_r_bias", _normal_init(0.01),
                                   (cfg.num_heads, d_head), jnp.float32)
        self.layers = [DecoderLayer(cfg, self.dtype, name=f"layer_{i}")
                       for i in range(cfg.num_layers)]
        self.emb_dropout = nn.Dropout(cfg.dropout)
        self.pos_dropout = nn.Dropout(cfg.dropout)
        self.out_dropout = nn.Dropout(cfg.dropout)

    def embed(self, tokens: jnp.ndarray) -> jnp.ndarray:
        scale = self.cfg.units ** 0.5
        return (self.embedding[tokens] * scale).astype(self.dtype)

    def forward(
        self,
        tokens: jnp.ndarray,            # [B, T] int32
        memory: Memory,                 # capacity M
        reset: Optional[jnp.ndarray] = None,  # [B] bool
        *,
        same_length: bool = False,
        deterministic: bool = True,
        return_hiddens: bool = False,
    ):
        cfg = self.cfg
        batch, tgt_len = tokens.shape
        mem_capacity = memory_capacity(memory)
        klen = mem_capacity + tgt_len

        pallas_impl = resolve_attn_impl(cfg) == "pallas"
        if pallas_impl:
            # T-minor lookup with the matmul-based backward (ops.embed):
            # XLA's gather cotangent costs a relayout + serialized
            # scatter-add (~1.2 ms/step at the training shape)
            from ..ops.embed import embed_bdt
            word_emb = embed_bdt(self.embedding, tokens,
                                 self.cfg.units ** 0.5, self.dtype)
        else:
            word_emb = self.embed(tokens)
        mem_hidden = memory.hidden

        if resolve_attn_impl(cfg) == "pallas":
            from ..ops import fused_attention as fa
            if not memory.transposed:
                # tests/back-compat: the kernel's kv projection wants the
                # blocked D-major ring layout; a dense right-aligned buffer
                # is a one-slab ring ([L+1, 1, B, D, M]).  Production
                # memories are created blocked.
                mem_hidden = jnp.swapaxes(mem_hidden, 2, 3)[:, None]
            mask = None
            pos_emb = None
            reset_rows = reset if reset is not None else \
                jnp.zeros((batch,), dtype=bool)
            # key trig basis, ring-ordered, shared by all layers; positional
            # dropout lands here (key-indexed basis — see fused_attention's
            # module docstring; the reference drops the distance-indexed
            # sinusoid once per forward, model.py:588-592)
            psi = fa.ring_psi(
                fa.key_trig_basis(klen, cfg.units, self.dtype),
                tgt_len, memory.count, memory.head)
            psi = self.pos_dropout(psi, deterministic=deterministic)
            pallas_ctx = (memory.count, memory.head, reset_rows, same_length,
                          psi)
        else:
            pos_emb = relative_position_embedding(klen, cfg.units, self.dtype,
                                                  cfg.clamp_len)
            pos_emb = self.pos_dropout(pos_emb, deterministic=deterministic)
            mask = build_attention_mask(
                tgt_len, mem_capacity, memory.count, reset, same_length, batch)
            pallas_ctx = None

        pallas = pallas_ctx is not None
        # the pallas layer stack carries activations T-minor ([B, D, T]) end
        # to end; embed_bdt above already produced that orientation
        h = self._activation_dropout(word_emb, deterministic, pallas,
                                     self.emb_dropout, 0)

        hids = [h]
        for i, layer in enumerate(self.layers):
            # pallas: the layer receives the FULL ring buffer + its index so
            # the backward kernel can block-index the layer without a
            # materialized per-layer slice
            h = layer(h, mem_hidden if pallas else mem_hidden[i], pos_emb,
                      self.r_w_bias, self.r_r_bias, mask, deterministic,
                      pallas_ctx, i)
            hids.append(h)
        out = self._activation_dropout(h, deterministic, pallas,
                                       self.out_dropout, 1)
        if pallas:
            # public contract stays [B, T, D]; consumers that want the
            # T-minor orientation (the fused NLL) swap back — an exact
            # inverse transpose XLA cancels
            out = jnp.swapaxes(out, 1, 2)

        new_memory = self._update_memory(memory, hids, t_minor=pallas)
        if return_hiddens:
            # per-layer INPUT hiddens (hids[0..L-1]) feed the decode KV
            # cache; [B, D, T] on the pallas path, [B, T, D] on XLA
            return out, new_memory, hids
        return out, new_memory

    def _activation_dropout(self, x, deterministic: bool, pallas: bool,
                            flax_drop: nn.Dropout, site: int):
        """Embedding-input / decoder-output dropout (reference: the
        drop(word_emb) / drop(core_out) sites, model.py:585-599).  On the
        pallas path the mask comes from the in-kernel TPU PRNG
        (ops.dropout.dropout_bdt) — the XLA threefry draw costs ~0.4 ms per
        site per step at the training shape; elsewhere flax Dropout."""
        p = self.cfg.dropout
        if not pallas or deterministic or p <= 0.0:
            return flax_drop(x, deterministic=deterministic)
        from ..ops.dropout import SALT_EMB, SALT_OUT, dropout_bdt
        seed = jax.random.randint(
            self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
            dtype=jnp.int32)
        return dropout_bdt(x, seed, p, SALT_EMB if site == 0 else SALT_OUT)

    def _update_memory(self, memory: Memory, hids,
                       t_minor: bool = False) -> Memory:
        """``t_minor``: hids are [B, D, T] (the pallas stack's orientation);
        otherwise [B, T, D]."""
        mem_capacity = memory_capacity(memory)
        tgt_len = hids[0].shape[2] if t_minor else hids[0].shape[1]
        rows = [jax.lax.stop_gradient(h.astype(memory.hidden.dtype))
                for h in hids]
        new_count = jnp.minimum(memory.count + tgt_len, mem_capacity)
        ring = (resolve_attn_impl(self.cfg) == "pallas"
                and 0 < tgt_len <= mem_capacity
                and mem_capacity % tgt_len == 0)
        if ring and memory.transposed:
            # per-layer contiguous slab writes into the aliased ring buffer —
            # each layer's rows are already slab-oriented [B, D, T], written
            # without stacking (commu_tpu.ops.layout.ring_write_layer)
            assert memory.hidden.shape[4] == tgt_len, \
                (memory.hidden.shape, tgt_len)
            from ..ops.layout import ring_write_layer
            new_hidden = memory.hidden
            block = memory.head // tgt_len
            for i, r in enumerate(rows):
                if not t_minor:
                    r = jnp.swapaxes(r, 1, 2)
                new_hidden = ring_write_layer(new_hidden, r, i, block,
                                              layer_axis=0, ring_axis=1)
            new_head = jnp.mod(memory.head + tgt_len, mem_capacity)
            return Memory(hidden=new_hidden, count=new_count, head=new_head,
                          transposed=True)
        stacked = jnp.stack(rows, axis=0)
        if ring:
            # tests/back-compat: right-aligned [L+1, B, M, D] buffer
            if t_minor:
                stacked = jnp.swapaxes(stacked, 2, 3)
            new_hidden = jax.lax.dynamic_update_slice(
                memory.hidden, stacked, (0, 0, memory.head, 0))
            new_head = jnp.mod(memory.head + tgt_len, mem_capacity)
            return Memory(hidden=new_hidden, count=new_count, head=new_head,
                          transposed=memory.transposed)
        assert not memory.transposed, \
            "transposed memory requires the ring layout (pallas path)"
        if t_minor:
            stacked = jnp.swapaxes(stacked, 2, 3)
        if tgt_len >= mem_capacity:
            new_hidden = stacked[:, :, -mem_capacity:] if mem_capacity else \
                memory.hidden
        else:
            new_hidden = jnp.concatenate(
                [memory.hidden[:, :, tgt_len:], stacked], axis=2)
        return Memory(hidden=new_hidden, count=new_count,
                      head=jnp.zeros((), jnp.int32))

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        """Tied-embedding output projection (reference: model.py:44-51,480-481)."""
        return (hidden.astype(jnp.float32) @ self.embedding.T + self.out_bias)

    def __call__(self, tokens, memory, reset=None, *, same_length=False,
                 deterministic=True):
        """forward + logits, for initialization and simple use."""
        hidden, new_memory = self.forward(
            tokens, memory, reset, same_length=same_length,
            deterministic=deterministic)
        return self.logits(hidden), new_memory


def token_nll(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-token negative log-likelihood [B, T] (reference: model.py:64-73)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]


def gumbel_softmax(logits: jnp.ndarray, temperature: float,
                   rng: jax.Array = None, *,
                   u_noise: jnp.ndarray = None) -> jnp.ndarray:
    """Straight-through Gumbel-softmax over the vocabulary: hard one-hot in
    the forward pass, soft-sample gradients in the backward
    (reference: model.py:630-676 ``forward_generate_gumbel``'s sampler).

    ``u_noise`` injects the uniform draw directly (differential tests share
    one draw with the reference's torch sampler); otherwise ``rng`` draws it.
    """
    eps = 1e-20
    u = jax.random.uniform(rng, logits.shape) if u_noise is None else u_noise
    g = -jnp.log(-jnp.log(u + eps) + eps)
    y = jax.nn.softmax((logits + g) / temperature, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), logits.shape[-1],
                          dtype=y.dtype)
    return jax.lax.stop_gradient(hard - y) + y


def forward_generate_gumbel(model: "TransformerXL", params, tokens: jnp.ndarray,
                            memory: Memory, temperature: float,
                            rng: jax.Array = None, *,
                            u_noise: jnp.ndarray = None):
    """(one-hot gumbel samples [B, T, V], new memory) — functional equivalent
    of the reference's ``forward_generate_gumbel`` (model.py:630-676)."""
    logits, new_memory = model.apply({"params": params}, tokens, memory,
                                     deterministic=True)
    return gumbel_softmax(logits, temperature, rng,
                          u_noise=u_noise), new_memory
