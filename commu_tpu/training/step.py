"""Jit-compiled train / eval steps.

TPU-first restructure of the reference's script-level loop (reference:
train.py:113-288):

- The whole optimizer step — forward over the full global batch, per-chunk
  masked-mean loss, grad, clip, Adam update, XL-memory roll — is ONE traced
  function with static shapes; no Python inside the hot path.
- The reference's ``batch_chunk`` gradient accumulation (train.py:133-155)
  exists to fit GPU memory; on TPU the whole batch fits, so the chunked
  *backwards* are fused into a single backward whose loss reproduces the exact
  chunk semantics: ``loss = mean over chunks of (masked mean nll per chunk)``.
  The gradients are identical to the reference's accumulated ones.
- Data parallelism is expressed by sharding the batch/memory over a mesh and
  letting XLA insert the gradient ``psum`` (see commu_tpu.parallel) — the DDP
  allreduce (train.py:467-473) disappears as code.
- Grad clipping matches torch's ``clip_grad_norm_`` including its 1e-6 eps
  (train.py:159-161); the *pre-clip* norm is returned for logging.

Metric contract (matches the log lines of train.py:171-197):
    ``nll_sum``     sum of per-token NLL over non-pad targets
    ``token_count`` number of non-pad targets
    ``grad_norm``   pre-clip global grad norm
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import TrainingConfig
from ..models.transformer_xl import Memory, TransformerXL, init_memory, token_nll
from ..vocab.event_tokens import PAD_ID
from .schedule import make_lr_schedule


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar, number of applied updates


@struct.dataclass
class TrainMemory:
    """XL memory pre-laid-out for the micro-batch scan: [C, L+1, B/C, M, D]
    (or the blocked ring [C, L+1, R, B/C, D, T] when transposed — D on
    sublanes feeds the fused-attention kv projection without a relayout, the
    ring dim ahead of [B, D, T] makes the per-step update a contiguous slab
    write, and the chunk/layer dims stay leading so their slices remain free
    contiguous views; see commu_tpu.models.transformer_xl.Memory).

    Keeping the chunk axis ahead of the batch means the scan consumes it
    directly — reshaping a ~2 GB buffer twice per step costs ~19 ms on a
    v5e chip."""

    hidden: jnp.ndarray
    count: jnp.ndarray
    head: jnp.ndarray
    transposed: bool = struct.field(pytree_node=False, default=False)


def init_train_memory(num_layers: int, batch: int, capacity: int,
                      d_model: int, n_chunks: int, dtype=jnp.float32,
                      transposed: bool = False,
                      block_len: Optional[int] = None,
                      pin_layout: bool = True) -> TrainMemory:
    """``block_len`` (transposed only): ring slab size in tokens — must equal
    the training ``tgt_length``; defaults to ``capacity`` (one slab).

    ``pin_layout`` pins the hidden buffer's physical layout to row-major on
    TPU, matching the sharded step's layout pin in every compilation-cache
    state (see ops.layout.pinned_rowmajor_zeros).  Pass False when calling
    under a jit trace (e.g. created through an out_shardings-pinned init
    program on a multi-host mesh)."""
    if transposed:
        from ..models.transformer_xl import ring_blocks
        r, t = ring_blocks(capacity, block_len)
        shape = (n_chunks, num_layers + 1, r, batch // n_chunks, d_model, t)
    else:
        shape = (n_chunks, num_layers + 1, batch // n_chunks, capacity,
                 d_model)
    from ..ops.layout import pinned_rowmajor_zeros
    zeros = pinned_rowmajor_zeros if pin_layout else jnp.zeros
    return TrainMemory(
        hidden=zeros(shape, dtype),
        count=jnp.zeros((), dtype=jnp.int32),
        head=jnp.zeros((), dtype=jnp.int32),
        transposed=transposed,
    )


def resolve_physical_chunks(cfg: TrainingConfig,
                            requested: Optional[int] = None) -> int:
    """How many physical micro-batches realize the ``batch_chunk`` loss.

    The loss ALWAYS keeps the reference's mean-of-chunk-means semantics over
    ``cfg.train.batch_chunk`` chunks (reference train.py:139-155); this only
    chooses how many forward/backward passes compute it.  The GPU reference
    chunks to fit memory; on the pallas path one v5e chip fits the whole
    256-row backward (the fused kernel never materializes attention
    probabilities), and ONE pass avoids all per-chunk ring-buffer slicing —
    measured 197k -> 207k tokens/s/chip at the reference shape.  The XLA
    path keeps the reference chunking (its backward stores attention
    probabilities and does not fit unchunked)."""
    if requested:
        return requested
    from ..models.transformer_xl import resolve_attn_impl
    if resolve_attn_impl(cfg.model) == "pallas":
        return 1
    return cfg.train.batch_chunk


def make_optimizer(cfg: TrainingConfig, num_devices: int = 1) -> optax.GradientTransformation:
    """Adam with the reference's schedule; weight decay applied torch-style
    (added to the gradient before the moment updates) when nonzero."""
    schedule = make_lr_schedule(cfg.train, num_devices)
    parts = []
    if cfg.train.weight_decay > 0.0:
        parts.append(optax.add_decayed_weights(cfg.train.weight_decay))
    parts.append(optax.adam(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*parts)


def create_train_state(rng: jax.Array, model: TransformerXL,
                       cfg: TrainingConfig, num_devices: int = 1,
                       sample_batch: int = 2) -> TrainState:
    """Initialize params (all weights ~ N(0, base_init), reference
    train.py:291-342 via the module initializers) and optimizer state."""
    tokens = jnp.zeros((sample_batch, cfg.train.tgt_length), dtype=jnp.int32)
    # init memory in the MODEL dtype: the pallas path requires memory dtype
    # == activation dtype (a mismatch would silently copy the full ring
    # buffer per layer, so the model raises instead of casting)
    memory = init_memory(cfg.model.num_layers, sample_batch,
                         cfg.train.mem_length, cfg.model.units,
                         dtype=model.dtype)
    params = model.init({"params": rng}, tokens, memory)["params"]
    tx = make_optimizer(cfg, num_devices)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), dtype=jnp.int32))


def _clip_by_global_norm(grads, max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics (train.py:159-161): scale by
    ``max_norm / (norm + 1e-6)`` when the norm exceeds ``max_norm``; return
    the pre-clip norm."""
    norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), norm


def chunked_masked_nll(logits: jnp.ndarray, targets: jnp.ndarray,
                       num_chunks: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(loss, nll_sum, token_count) with the reference's chunk semantics.

    The reference splits the batch into ``batch_chunk`` chunks per rank and
    backwards ``chunk_masked_mean / batch_chunk`` for each (train.py:139-155),
    and DDP averages over ranks — net effect: the gradient of the mean over
    all (rank x chunk) chunk-wise masked means, times the rank count folded
    into the lr (see schedule).  Here the same loss is computed in one graph.
    """
    return masked_chunk_loss(token_nll(logits, targets), targets, num_chunks)


def masked_chunk_loss(nll: jnp.ndarray, targets: jnp.ndarray,
                      num_chunks: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """chunked_masked_nll's chunk-mean arithmetic over a precomputed per-token
    ``nll`` [B, T] (the fused-NLL kernel path never materializes logits)."""
    mask = (targets != PAD_ID).astype(jnp.float32)
    batch = targets.shape[0]
    assert batch % num_chunks == 0, (batch, num_chunks)
    nll_c = (nll * mask).reshape(num_chunks, -1).sum(axis=1)
    tok_c = mask.reshape(num_chunks, -1).sum(axis=1)
    chunk_means = nll_c / jnp.maximum(tok_c, 1.0)
    loss = chunk_means.mean()
    return loss, (nll * mask).sum(), mask.sum()


def make_train_step(model: TransformerXL, cfg: TrainingConfig,
                    num_devices: int = 1,
                    *, remat: Optional[bool] = None,
                    unroll: bool = False,
                    physical_chunks: Optional[int] = None,
                    axis_name: Optional[str] = None) -> Callable:
    """Build the train step: (state, memory, batch, rng) -> updated.

    The batch is processed as ``batch_chunk`` micro-batches via ``lax.scan``
    with gradient accumulation — the reference's within-step chunking
    (train.py:123-165), which on TPU is also what bounds peak activation
    memory (a fused 256x128 backward over klen 1152 does not fit one chip's
    HBM).  Each chunk carries its own rows of the XL memory, exactly like the
    reference's per-chunk ``mems[i]`` streams.  ``remat`` rematerializes the
    per-chunk forward during the backward pass, dropping stored attention
    probabilities in exchange for ~1/3 more FLOPs.

    ``axis_name``: build for MANUAL data parallelism (``jax.shard_map`` over
    that mesh axis, see commu_tpu.parallel.shard_train_step(manual=True)).
    The step then sees its per-device batch/memory shard and reduces
    explicitly — grads via ``pmean`` (the DDP average, reference
    train.py:467-473), metric sums via ``psum``.  This is how the Pallas
    kernels scale over a pod: the SPMD partitioner cannot partition a Mosaic
    custom call, so under plain ``jit`` sharding it all-gathers the batch and
    every chip computes all rows.
    """
    tx = make_optimizer(cfg, num_devices)
    # LOSS semantics always follow cfg.train.batch_chunk (the reference's
    # mean-of-chunk-means, train.py:139-155); ``physical_chunks`` only sets
    # how many forward/backward passes realize it.  The GPU reference chunks
    # to fit memory; a v5e chip fits the full 256-row backward, and fewer
    # physical chunks mean fewer scan-carry relayouts of the XL memory.
    sem_chunks = cfg.train.batch_chunk
    n_chunks = resolve_physical_chunks(cfg, physical_chunks)
    assert sem_chunks % n_chunks == 0, (sem_chunks, n_chunks)
    # Manual DP: each device splits its local physical chunk into its own
    # sem/n sub-chunks and the cross-device mean is the grad pmean below —
    # same global mean-of-(rank x chunk)-means, computed shard-locally.
    sem_per_physical = (sem_chunks // n_chunks) * (
        1 if axis_name else num_devices)
    clip = cfg.train.clip
    if remat is None:
        # the fused kernel never materializes attention probabilities, so the
        # chunked backward fits in HBM without remat (and remat costs ~35%)
        from ..models.transformer_xl import resolve_attn_impl
        remat = resolve_attn_impl(cfg.model) != "pallas"

    from ..models.transformer_xl import resolve_attn_impl as _impl
    fused_nll = _impl(cfg.model) == "pallas"

    def chunk_loss(params, memory: Memory, inputs, targets, reset, dropout_rng):
        hidden, _, hids = model.apply(
            {"params": params}, inputs, memory, reset,
            same_length=cfg.model.same_length, deterministic=False,
            return_hiddens=True, method=model.forward,
            rngs={"dropout": dropout_rng})
        if fused_nll:
            # fused tied-embedding projection + NLL: no [B, T, V] logits in
            # HBM; the swapaxes is a layout bitcast (activations are already
            # T-minor on the pallas path) — see commu_tpu.ops.fused_nll
            from ..ops.fused_nll import fused_token_nll
            nll = fused_token_nll(jnp.swapaxes(hidden, 1, 2),
                                  params["embedding"], params["out_bias"],
                                  targets)
        else:
            logits = model.apply({"params": params}, hidden,
                                 method=TransformerXL.logits)
            nll = token_nll(logits, targets)
        # per-device sub-chunk means reproduce the reference's per-rank chunk
        # loss under DDP averaging (see chunked_masked_nll)
        loss, nll_sum, token_count = masked_chunk_loss(nll, targets,
                                                       sem_per_physical)
        # only the NEW T rows leave the chunk — the memory write happens once,
        # in place, outside the scan (writing full ring buffers as scan ys
        # costs a ~2 GB rewrite per step).  The per-layer hids are returned
        # UNSTACKED: on the pallas path each is already slab-oriented
        # [B, D, T] and is written straight into its layer's ring slab
        # (ring_write_layer) — stacking them into one [L+1, ...] array first
        # costs a full extra materialize+read of the slab.
        new_rows = tuple(
            jax.lax.stop_gradient(h.astype(memory.hidden.dtype))
            for h in hids)
        return loss / n_chunks, (new_rows, nll_sum, token_count)

    if remat:
        chunk_loss = jax.checkpoint(chunk_loss)

    def train_step(state: TrainState, memory: TrainMemory, inputs, targets,
                   reset, rng: jax.Array):
        base_rng = jax.random.fold_in(rng, state.step)
        if axis_name is not None:
            # decorrelate dropout across shards (the in-kernel PRNG seeds by
            # LOCAL row index, which repeats across shards)
            base_rng = jax.random.fold_in(
                base_rng, jax.lax.axis_index(axis_name))
        batch = inputs.shape[0]
        b = batch // n_chunks

        def to_chunks(x):  # [B, ...] -> [C, B/C, ...]
            return x.reshape((n_chunks, b) + x.shape[1:])

        grad_zero = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)

        def scan_body(carry, xs):
            grads_acc, nll_acc, tok_acc = carry
            chunk_idx, chunk_in, chunk_tgt, chunk_reset = xs
            # index the closed-over (loop-invariant) buffer directly instead
            # of passing it as scan xs — the xs slicing machinery relays the
            # slice out; the chunk axis leads both layouts, so the slice is
            # a contiguous view
            chunk_mem_h = jax.lax.dynamic_index_in_dim(
                memory.hidden, chunk_idx, 0, keepdims=False)
            chunk_mem = Memory(hidden=chunk_mem_h, count=memory.count,
                               head=memory.head,
                               transposed=memory.transposed)
            rng_c = jax.random.fold_in(base_rng, chunk_idx)
            grads, (new_rows, nll_sum, tok) = jax.grad(
                chunk_loss, has_aux=True)(state.params, chunk_mem, chunk_in,
                                          chunk_tgt, chunk_reset, rng_c)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            return ((grads_acc, nll_acc + nll_sum, tok_acc + tok), new_rows)

        t_len = inputs.shape[1]
        m_cap = (memory.hidden.shape[2] * memory.hidden.shape[5]
                 if memory.transposed else memory.hidden.shape[3])
        from ..models.transformer_xl import resolve_attn_impl
        ring = (resolve_attn_impl(cfg.model) == "pallas"
                and 0 < t_len <= m_cap and m_cap % t_len == 0)
        # the chunked-memory paths below index memory.hidden's leading chunk
        # axis by [0, n_chunks); a TrainMemory built with a different
        # physical chunk count would silently train on partial XL memory
        if memory.hidden.shape[0] != n_chunks:
            raise ValueError(
                f"TrainMemory has {memory.hidden.shape[0]} physical chunks "
                f"but the step was built for {n_chunks} "
                "(init_train_memory and make_train_step must agree)")
        if n_chunks == 1:
            # one physical micro-batch (the production pallas path): no
            # accumulator — jax.grad directly, skipping the full-pytree
            # f32 zero-init + add the scan carry pays (~170 MB of HBM
            # traffic per step at 13.9M params)
            chunk_mem = Memory(
                hidden=jax.lax.dynamic_index_in_dim(
                    memory.hidden, 0, 0, keepdims=False),
                count=memory.count, head=memory.head,
                transposed=memory.transposed)
            grads, (rows, nll_sum, token_count) = jax.grad(
                chunk_loss, has_aux=True)(
                    state.params, chunk_mem, inputs, targets, reset,
                    jax.random.fold_in(base_rng, 0))
            new_rows = tuple(r[None] for r in rows)  # [C=1, B, ...]
        elif unroll:
            # unrolled micro-batches: XLA assigns each chunk's memory slice
            # the layout its consumers want (the lax.scan carry forces one
            # layout onto producer AND consumer)
            carry = (grad_zero, 0.0, 0.0)
            ins, tgts, rsts = to_chunks(inputs), to_chunks(targets), \
                to_chunks(reset)
            rs = []
            for ci in range(n_chunks):
                carry, r = scan_body(carry, (jnp.int32(ci), ins[ci], tgts[ci],
                                             rsts[ci]))
                rs.append(r)
            (grads, nll_sum, token_count) = carry
            # rs: per-chunk tuples of per-layer rows -> per-layer [C, ...]
            new_rows = tuple(
                jnp.stack([r[i] for r in rs], axis=0)
                for i in range(len(rs[0])))
        else:
            (grads, nll_sum, token_count), new_rows = jax.lax.scan(
                scan_body, (grad_zero, 0.0, 0.0),
                (jnp.arange(n_chunks), to_chunks(inputs), to_chunks(targets),
                 to_chunks(reset)))
        # new_rows: tuple of L+1 per-layer [C, B/C, D, T] arrays (pallas;
        # slab-oriented from the layer stack) or [C, B/C, T, D] (xla)
        if ring and memory.transposed:
            # per-layer contiguous slab writes into the aliased blocked ring
            # buffer — no stack, no transpose (ops.layout.ring_write_layer)
            from ..ops.layout import ring_write_layer
            assert memory.hidden.shape[5] == t_len, \
                (memory.hidden.shape, t_len)
            new_hidden = memory.hidden
            block = memory.head // t_len
            for i, rows in enumerate(new_rows):
                if not fused_nll:
                    rows = jnp.swapaxes(rows, 2, 3)
                new_hidden = ring_write_layer(new_hidden, rows, i, block,
                                              layer_axis=1, ring_axis=2)
            new_head = jnp.mod(memory.head + t_len, m_cap)
        else:
            # stacked [C, L+1, B/C, T, D] form for the dense layouts
            stacked = jnp.stack(new_rows, axis=1)
            if fused_nll:
                stacked = jnp.swapaxes(stacked, 3, 4)
            assert not memory.transposed, \
                "transposed memory requires the ring layout (pallas path)"
            if ring:
                new_hidden = jax.lax.dynamic_update_slice(
                    memory.hidden, stacked, (0, 0, 0, memory.head, 0))
                new_head = jnp.mod(memory.head + t_len, m_cap)
            elif t_len < m_cap:
                new_hidden = jnp.concatenate(
                    [memory.hidden[..., t_len:, :], stacked], axis=3)
                new_head = jnp.zeros((), jnp.int32)
            else:
                new_hidden = stacked[..., -m_cap:, :]
                new_head = jnp.zeros((), jnp.int32)

        new_memory = TrainMemory(
            hidden=new_hidden,
            count=jnp.minimum(memory.count + t_len, m_cap),
            head=new_head,
            transposed=memory.transposed)
        return _finish(state, new_memory, grads, nll_sum, token_count)

    def _finish(state, new_memory, grads, nll_sum, token_count):
        if axis_name is not None:
            # explicit DDP-style reductions (reference: the implicit DDP
            # gradient allreduce at train.py:155 + metric all_reduces at
            # train.py:172-174); clip AFTER the reduction, on the global
            # gradient, exactly like clip_grad_norm_ on the DDP module
            grads = jax.lax.pmean(grads, axis_name)
            nll_sum = jax.lax.psum(nll_sum, axis_name)
            token_count = jax.lax.psum(token_count, axis_name)
        grads, grad_norm = _clip_by_global_norm(grads, clip)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt_state,
                               step=state.step + 1)
        metrics = {"nll_sum": nll_sum, "token_count": token_count,
                   "grad_norm": grad_norm}
        return new_state, new_memory, metrics

    return train_step


def make_eval_step(model: TransformerXL, *, same_length: bool = True,
                   axis_name: Optional[str] = None) -> Callable:
    """Windowed eval step (reference: train.py:74-110): returns the masked
    NLL sum and token count for one ``bptt`` window, carrying XL memory.
    ``axis_name``: manual-DP variant (see make_train_step) — the per-shard
    sums are psum'd so every device returns the global totals."""

    from ..models.transformer_xl import resolve_attn_impl as _impl
    fused_nll = _impl(model.cfg) == "pallas"

    def eval_step(params, memory: Memory, inputs, targets, reset):
        if fused_nll:
            hidden, new_memory = model.apply(
                {"params": params}, inputs, memory, reset,
                same_length=same_length, deterministic=True,
                method=model.forward)
            from ..ops.fused_nll import fused_token_nll
            nll = fused_token_nll(jnp.swapaxes(hidden, 1, 2),
                                  params["embedding"], params["out_bias"],
                                  targets)
        else:
            logits, new_memory = model.apply(
                {"params": params}, inputs, memory, reset,
                same_length=same_length, deterministic=True)
            nll = token_nll(logits, targets)
        mask = (targets != PAD_ID).astype(jnp.float32)
        nll_sum, token_count = (nll * mask).sum(), mask.sum()
        if axis_name is not None:
            nll_sum = jax.lax.psum(nll_sum, axis_name)
            token_count = jax.lax.psum(token_count, axis_name)
        return nll_sum, token_count, new_memory

    return eval_step
