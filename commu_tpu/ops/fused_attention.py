"""Pallas TPU kernel: fused XL relative-position attention.

The XLA path materializes the [B, H, T, K] score and probability tensors in
HBM twice per layer (forward) plus again in the backward — at the training
shape (B=64 per chunk, H=10, T=128, K=1152) that is ~1.1 GB of HBM traffic
per layer per direction, the dominant cost of the step.  This kernel keeps
the whole score row-block in VMEM (K=1152 keys x 128 queries x f32 = 590 KB,
far under the ~16 MB budget), so scores/probabilities never touch HBM:

    grid (B, H); per program:  q[T,dh], k[K,dh], v[K,dh], r_ext[K+T-1,dh]
        AC   = (q + r_w) @ k^T
        P    = (q + r_r) @ r_ext^T          # scores vs relative distance
        BD   = per-row left-shift of P by (T-1-i)   [log-decomposed rolls]
        S    = (AC + BD) * scale  + mask(causal, invalid-mem, reset, same_len)
        O    = dropout(softmax(S)) @ v

The per-row shift replaces the reference's ``_rel_shift`` pad/reshape trick
(reference: commu/model/model.py:251-265) with 7 masked lane-rotations —
static shapes, no tile-unfriendly reshapes.

Backward is a custom VJP that recomputes the forward in VMEM (flash-style)
and emits dq (content path), dqr (position path, summed into r_r_bias's grad
outside), dk, dv and per-(b,h) dR partials (reduced over batch outside the
kernel — XLA's reduction is faster than sequential-grid accumulation).
Attention dropout regenerates the same mask from the same per-(b,h) seed.

Numerics match the XLA path to bf16/f32 tolerance (tests/test_fused_attention.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def _row_shift(x, row_iota, direction: int, t: int):
    """Shift row i of ``x`` left (direction=+1) or right (-1) by (t-1-i)
    lanes, via log2 decomposition into masked rolls.  x: [T, W]."""
    width = x.shape[1]
    shift = t - 1 - row_iota  # [T, 1]
    bit = 1
    while bit < t:
        take = (shift & bit) != 0
        # pltpu.roll requires a non-negative shift; a left-rotate by `bit`
        # is a right-rotate by `width - bit`.
        amount = (width - bit) if direction > 0 else bit
        rolled = pltpu.roll(x, amount, axis=1)
        x = jnp.where(take, rolled, x)
        bit <<= 1
    return x


def _dyn_roll(x, shift):
    """Rotate columns right by a TRACED amount (x[..., j] <- x[..., j-shift])."""
    return pltpu.roll(x, shift, axis=1)


def _mask(s, t, k_len, mem_capacity, mem_count, start, reset_b, same_length):
    """Masks in RING coordinates: memory slot j holds the logical (oldest=0)
    token l = (j - start) mod M; the T window columns are unaffected."""
    i = jax.lax.broadcasted_iota(jnp.int32, (t, k_len), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (t, k_len), 1)
    mem_col = j < mem_capacity
    if mem_capacity > 0:
        l = jnp.mod(j - start, mem_capacity)
    else:
        l = j
    blocked = (~mem_col) & (j >= mem_capacity + i + 1)   # causal, window only
    blocked |= mem_col & (l >= mem_count)                # empty ring slots
    blocked |= reset_b & mem_col
    if same_length:
        mask_len = mem_count + t - mem_capacity
        shift = t - jnp.maximum(mask_len, 0)
        blocked |= mem_col & (l <= i - shift)
    return jnp.where(blocked, NEG_INF, s)


def _attn_core(scalar_ref, qw_ref, qr_ref, k_ref, v_ref, r_ref,
               b, h, *, t, k_len, scale, same_length, dropout_p, train):
    """Shared forward computation -> (probs f32 [T,K], qw, k, v, qr).

    The content/position biases are folded into the two query streams
    OUTSIDE the kernel (qw = q + r_w_bias, qr = q + r_r_bias): tiny
    [1,1,dh] bias blocks deadlock the runtime's DMA path, and the fold is
    free in XLA anyway.
    """
    # operands stay in their storage dtype (bf16 in training): the MXU
    # multiplies bf16 natively with f32 accumulation via
    # preferred_element_type — casting to f32 first would halve throughput
    qw = qw_ref[0, 0, :, :]                          # [T, dh]
    qr = qr_ref[0, 0, :, :]                          # [T, dh]
    k = k_ref[0, 0, :, :]                            # [K, dh]
    r = r_ref[0, :, :]                               # [width, dh]

    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    ac = jax.lax.dot_general(qw, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)      # [T,K]
    p_ext = jax.lax.dot_general(qr, r, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)   # [T,K+T-1pad]
    bd = _row_shift(p_ext, row, +1, t)[:, :k_len]

    mem_count = scalar_ref[0]
    head = scalar_ref[2]
    reset_b = scalar_ref[3 + b] != 0
    m_cap = k_len - t
    start = jnp.mod(head - mem_count, m_cap) if m_cap > 0 else head
    if m_cap > 0:
        # ring layout: the shift trick produced BD for contiguous logical
        # order; rotate the memory columns into physical order (rot == head)
        bd = jnp.concatenate(
            [_dyn_roll(bd[:, :m_cap], head), bd[:, m_cap:]], axis=1)
    s = (ac + bd) * scale
    s = _mask(s, t, k_len, m_cap, mem_count, start, reset_b, same_length)

    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p_clean = e / jnp.sum(e, axis=1, keepdims=True)

    if train and dropout_p > 0.0:
        pltpu.prng_seed(scalar_ref[1] + b * 4096 + h)
        bits = pltpu.prng_random_bits(p_clean.shape)
        keep = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24)) >= dropout_p
        drop_scale = jnp.where(keep, 1.0 / (1.0 - dropout_p), 0.0)
        probs = p_clean * drop_scale
    else:
        drop_scale = None
        probs = p_clean

    return probs, p_clean, drop_scale, qw, k, v_ref[0, 0, :, :], qr


def _fwd_kernel(scalar_ref, qw_ref, qr_ref, k_ref, v_ref, r_ref,
                o_ref, *, t, k_len, scale, same_length, dropout_p, train):
    b, h = pl.program_id(0), pl.program_id(1)
    probs, _, _, _, _, v, _ = _attn_core(
        scalar_ref, qw_ref, qr_ref, k_ref, v_ref, r_ref, b, h,
        t=t, k_len=k_len, scale=scale, same_length=same_length,
        dropout_p=dropout_p, train=train)
    o = jax.lax.dot_general(probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = o.astype(o_ref.dtype)


def _bwd_kernel(scalar_ref, qw_ref, qr_ref, k_ref, v_ref, r_ref,
                do_ref, dq_ref, dqr_ref, dk_ref, dv_ref, dr_ref,
                *, t, k_len, scale, same_length, dropout_p, train):
    b, h = pl.program_id(0), pl.program_id(1)
    probs, p_clean, drop_scale, qw, k, v, qr = _attn_core(
        scalar_ref, qw_ref, qr_ref, k_ref, v_ref, r_ref, b, h,
        t=t, k_len=k_len, scale=scale, same_length=same_length,
        dropout_p=dropout_p, train=train)
    do = do_ref[0, 0, :, :]                                           # [T,dh]

    # dv uses the POST-dropout probabilities (o = dropout(p) @ v)
    dv = jax.lax.dot_general(probs.astype(do.dtype), do,
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)      # [K,dh]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)      # [T,K]
    # dropout backward FIRST (d dropout(p) -> d p is the same keep/scale
    # mask), then the softmax backward on the CLEAN probabilities —
    # folding the mask into p instead is wrong: dropped positions still
    # receive the -p * rowsum term
    if drop_scale is not None:
        dp = dp * drop_scale
    ds = p_clean * (dp - jnp.sum(dp * p_clean, axis=1, keepdims=True))
    ds = ds * scale                                                   # [T,K]

    ds_c = ds.astype(k.dtype)
    dq_ac = jax.lax.dot_general(ds_c, k, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)   # [T,dh]
    dk = jax.lax.dot_general(ds_c, qw, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)      # [K,dh]

    row = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    width = r_ref.shape[1]
    m_cap = k_len - t
    head = scalar_ref[2]
    ds_log = ds
    if m_cap > 0:
        # BD backward runs in LOGICAL order: un-rotate the ring columns
        ds_log = jnp.concatenate(
            [_dyn_roll(ds[:, :m_cap], m_cap - head), ds[:, m_cap:]], axis=1)
    # the TPU dynamic-rotate only supports 32-bit lanes: shift in f32, then
    # cast for the MXU
    ds_pad = jnp.pad(ds_log, ((0, 0), (0, width - k_len)))
    dp_ext = _row_shift(ds_pad, row, -1, t).astype(k.dtype)           # [T,K+T-1]
    r = r_ref[0, :, :]
    dqr = jax.lax.dot_general(dp_ext, r, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)     # [T,dh]
    dr = jax.lax.dot_general(dp_ext, qr, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)      # [W,dh]

    dq_ref[0, 0, :, :] = dq_ac.astype(dq_ref.dtype)
    dqr_ref[0, 0, :, :] = dqr.astype(dqr_ref.dtype)
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)
    dr_ref[0, 0, :, :] = dr[:k_len].astype(dr_ref.dtype)


def _scalars(mem_count, dropout_seed, mem_head, reset, batch):
    if reset is None:
        reset = jnp.zeros((batch,), dtype=jnp.int32)
    return jnp.concatenate([
        jnp.asarray(mem_count, jnp.int32).reshape(1),
        jnp.asarray(dropout_seed, jnp.int32).reshape(1),
        jnp.asarray(mem_head, jnp.int32).reshape(1),
        reset.astype(jnp.int32).reshape(batch),
    ])


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def fused_core(qw, qr, k, v, r_ext, scalars,
               scale, same_length, dropout_p, train):
    """Fused XL attention over kernel-layout operands.

    qw, qr: [B, H, T, dh] — query streams with the content/position biases
    already folded in (autodiff distributes their cotangents back to q and
    the biases); k, v: [B, H, K, dh]; r_ext: [H, K+T, dh] (distance-descending
    projections, zero rows appended for never-used diagonals);
    scalars: int32 [2 + B] = [mem_count, dropout_seed, reset_rows...].
    Returns [B, H, T, dh] in qw's dtype.

    Upstream projections should produce these layouts DIRECTLY via
    reshaped-kernel einsums (see RelMultiHeadAttention) — transposing
    [B, K, H, dh] tensors around the kernel measured ~60 ms/step of pure
    layout copies at the training shape.
    """
    out, _ = _fused_fwd(qw, qr, k, v, r_ext, scalars,
                        scale, same_length, dropout_p, train)
    return out


def _fused_call(kernel_fn, outs, qw, qr, k, v, r_ext, scalars, extra=()):
    batch, heads, t, dh = qw.shape
    k_len = k.shape[2]
    width = r_ext.shape[1]
    bh_t = pl.BlockSpec((1, 1, t, dh), lambda b, h, s: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    bh_k = pl.BlockSpec((1, 1, k_len, dh), lambda b, h, s: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    h_r = pl.BlockSpec((1, width, dh), lambda b, h, s: (h, 0, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [bh_t, bh_t, bh_k, bh_k, h_r] + [bh_t] * len(extra)
    out_specs = []
    out_shape = []
    for kind, dtype in outs:
        out_specs.append(bh_t if kind == "t" else bh_k)
        out_shape.append(jax.ShapeDtypeStruct(
            (batch, heads, t if kind == "t" else k_len, dh), dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(batch, heads),
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
    )
    return pl.pallas_call(
        kernel_fn, grid_spec=grid_spec,
        out_shape=out_shape if len(out_shape) > 1 else out_shape[0],
        interpret=_interpret(),
    )(scalars, qw, qr, k, v, r_ext, *extra)


def _fused_fwd(qw, qr, k, v, r_ext, scalars, scale, same_length, dropout_p,
               train):
    t, k_len = qw.shape[2], k.shape[2]
    kernel = functools.partial(
        _fwd_kernel, t=t, k_len=k_len, scale=scale,
        same_length=same_length, dropout_p=dropout_p, train=train)
    out = _fused_call(kernel, [("t", qw.dtype)], qw, qr, k, v, r_ext, scalars)
    return out, (qw, qr, k, v, r_ext, scalars)


def _fused_bwd(scale, same_length, dropout_p, train, residuals, g):
    qw, qr, k, v, r_ext, scalars = residuals
    t, k_len = qw.shape[2], k.shape[2]
    width = r_ext.shape[1]
    dtype = qw.dtype
    kernel = functools.partial(
        _bwd_kernel, t=t, k_len=k_len, scale=scale,
        same_length=same_length, dropout_p=dropout_p, train=train)
    dqw, dqr, dk, dv, dr_bh = _fused_call(
        kernel,
        [("t", dtype), ("t", dtype), ("k", dtype), ("k", dtype),
         ("k", dtype)],
        qw, qr, k, v, r_ext, scalars, extra=(g.astype(dtype),))
    # rows past k_len of dR are exactly zero (causally masked diagonals)
    dr_ext = jnp.pad(dr_bh.sum(axis=0, dtype=jnp.float32),
                     ((0, 0), (0, width - k_len), (0, 0))).astype(dtype)
    return dqw, dqr, dk.astype(dtype), dv.astype(dtype), dr_ext, None


fused_core.defvjp(
    lambda qw, qr, k, v, r_ext, s, scale, sl, dp, tr: _fused_fwd(
        qw, qr, k, v, r_ext, s, scale, sl, dp, tr),
    _fused_bwd,
)


def attention(q, k, v, r, r_w_bias, r_r_bias, mem_count, mem_head,
              reset: Optional[jnp.ndarray], *, scale, same_length,
              dropout_p=0.0, dropout_seed=0, train=False):
    """Kernel-layout entry point.

    q: [B, H, T, dh]; k, v: [B, H, K, dh] where the memory keys live in a
    RING whose next write position is ``mem_head``; r: [H, K, dh]
    (distance-descending). Returns [B, H, T, dh].
    """
    t = q.shape[2]
    qw = q + r_w_bias[None, :, None, :].astype(q.dtype)
    qr = q + r_r_bias[None, :, None, :].astype(q.dtype)
    r_ext = jnp.pad(r, ((0, 0), (0, t), (0, 0)))
    scalars = _scalars(mem_count, dropout_seed, mem_head, reset, q.shape[0])
    return fused_core(qw, qr, k, v, r_ext, scalars,
                      scale, same_length, dropout_p, train)
