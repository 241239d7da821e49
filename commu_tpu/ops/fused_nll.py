"""Pallas TPU kernel: fused tied-embedding output projection + per-token NLL
(forward and backward) — the reference's ProjectedAdaptiveLogSoftmax in its
only-used single-cluster form (reference: commu/model/model.py:6-133, the
``_compute_logit`` matmul at 44-51 + gathered log-softmax at 106-126).

Why a kernel: the XLA lowering materializes the f32 logits [B, T, V]
(~96 MB at the training shape) in HBM, then runs log-softmax, the target
gather, and the (softmax - onehot) backward as separate full-array passes —
~4.5 ms/step of mostly HBM round-trips.  Here each batch row's logits
[V, T] live only as a VMEM tile: the forward is one f32 MXU matmul + a
sublane log-sum-exp; the backward recomputes the logits from the
checkpointed log-normalizer (no [B, T, V] residual exists anywhere) and
accumulates the tied-embedding / bias gradients in VMEM-resident f32
output blocks across the (B,) grid — the same pattern as the fused FFN
block's dW accumulators.  The hidden cotangent is emitted directly in the
kernel's D-major [B, D, T] orientation, which is what the decoder layers'
backward consumes (killing the transpose+convert fusion the XLA path
needed).

The matmuls accumulate in f32 (hidden is cast in VMEM).  NOTE on operand
precision: on TPU the MXU rounds f32 matmul OPERANDS to bf16 per pass at
default precision — in the kernel and in the XLA ``logits`` path alike —
so logits carry ~1e-3 relative noise vs a precision=HIGHEST matmul either
way (measured on-device: kernel-vs-XLA-default ~4e-3 worst-element on
demb, XLA-default-vs-HIGHEST ~1e-2).  This matches the effective precision
of the XLA path this kernel replaces; the 50-step bf16-vs-f32 trajectory
check and the CPU torch-parity suite (exact f32 there) bound the training
impact.

Numerics match ``token_nll`` (transformer_xl.py:547-550) to f32 tolerance;
tests/test_fused_nll.py checks value and all three gradients against the
jnp reference in interpreter mode, and scripts/verify_tpu.py certifies the
Mosaic-lowered kernel on hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import _interpret, _vmem_limit
from .fused_ffn import _pipeline


def _row_nll(logits, tgt, v):
    """(nll [1, T], lse [1, T]) from f32 logits [V, T] and targets [1, T]."""
    m = jnp.max(logits, axis=0, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=0, keepdims=True))
    iota_v = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    sel = iota_v == tgt                                         # [V, T]
    tl = jnp.sum(jnp.where(sel, logits, 0.0), axis=0, keepdims=True)
    return lse - tl, lse


def _nll_fwd_kernel(h_ref, emb_ref, bias_ref, tgt_ref,
                    nll_ref, lse_ref=None, *, rp):
    emb = emb_ref[...]                                          # [V, D] f32
    bias = bias_ref[...]                                        # [V, 1] f32
    v = emb.shape[0]

    def stage_a(r, b):
        h = h_ref[r].astype(jnp.float32)                        # [D, T]
        return jax.lax.dot_general(emb, h, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) + bias

    def finish(r, b, logits):
        nll, lse = _row_nll(logits, tgt_ref[r], v)
        nll_ref[r] = nll
        if lse_ref is not None:
            lse_ref[r] = lse

    _pipeline(rp, pl.program_id(0) * rp, stage_a, finish)


def _nll_bwd_kernel(h_ref, emb_ref, embt_ref, bias_ref, tgt_ref, lse_ref,
                    dnll_ref, dh_ref, demb_ref, dbias_ref, *, rp):
    first = pl.program_id(0) == 0
    emb = emb_ref[...]                                          # [V, D] f32
    embt = embt_ref[...]                                        # [D, V] f32
    bias = bias_ref[...]
    acc = {}

    def stage_a(r, b):
        """Recompute logits (MXU), form dlogits (VPU), then the dh and
        d(emb) matmuls (MXU)."""
        h = h_ref[r].astype(jnp.float32)                        # [D, T]
        logits = jax.lax.dot_general(emb, h, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        logits = logits + bias
        probs = jnp.exp(logits - lse_ref[r])                    # [V, T]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, probs.shape, 0)
        sel = (iota_v == tgt_ref[r]).astype(jnp.float32)
        dlogits = (probs - sel) * dnll_ref[r]                   # [V, T] f32
        dh = jax.lax.dot_general(embt, dlogits, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        demb = jax.lax.dot_general(dlogits, h, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return dlogits, dh, demb

    def finish(r, b, st):
        dlogits, dh, demb = st
        dh_ref[r] = dh.astype(dh_ref.dtype)
        dbias = jnp.sum(dlogits, axis=1, keepdims=True)         # [V, 1]
        acc["demb"] = demb if "demb" not in acc else acc["demb"] + demb
        acc["dbias"] = dbias if "dbias" not in acc else acc["dbias"] + dbias

    _pipeline(rp, pl.program_id(0) * rp, stage_a, finish)

    @pl.when(first)
    def _():
        demb_ref[...] = acc["demb"]
        dbias_ref[...] = acc["dbias"]

    @pl.when(jnp.logical_not(first))
    def _():
        demb_ref[...] += acc["demb"]
        dbias_ref[...] += acc["dbias"]


def _rows_per_program(batch: int) -> int:
    return 2 if batch % 2 == 0 else 1


def _bt(rp, shape):
    return pl.BlockSpec((rp,) + shape, lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _res(shape):
    n = len(shape)
    return pl.BlockSpec(shape, lambda b: (0,) * n, memory_space=pltpu.VMEM)


def _nll_fwd_call(hidden_dt, emb, bias, targets, save: bool):
    batch, d, t = hidden_dt.shape
    v = emb.shape[0]
    rp = _rows_per_program(batch)
    kernel = functools.partial(_nll_fwd_kernel, rp=rp)
    out_specs = [_bt(rp, (1, t))]
    out_shape = [jax.ShapeDtypeStruct((batch, 1, t), jnp.float32)]   # nll
    if save:
        out_specs.append(_bt(rp, (1, t)))
        out_shape.append(jax.ShapeDtypeStruct((batch, 1, t), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(batch // rp,),
        in_specs=[_bt(rp, (d, t)), _res((v, d)), _res((v, 1)),
                  _bt(rp, (1, t))],
        out_specs=out_specs if save else out_specs[0],
        out_shape=out_shape if save else out_shape[0],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(hidden_dt, emb.astype(jnp.float32),
      bias.astype(jnp.float32).reshape(v, 1),
      targets.astype(jnp.int32)[:, None, :])
    return out if save else (out,)


def _nll_bwd_call(hidden_dt, emb, bias, targets, lse, dnll):
    batch, d, t = hidden_dt.shape
    v = emb.shape[0]
    rp = _rows_per_program(batch)
    kernel = functools.partial(_nll_bwd_kernel, rp=rp)
    emb32 = emb.astype(jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(batch // rp,),
        in_specs=[_bt(rp, (d, t)), _res((v, d)), _res((d, v)), _res((v, 1)),
                  _bt(rp, (1, t)), _bt(rp, (1, t)), _bt(rp, (1, t))],
        out_specs=[_bt(rp, (d, t)), _res((v, d)), _res((v, 1))],
        out_shape=[
            jax.ShapeDtypeStruct((batch, d, t), hidden_dt.dtype),  # dh
            jax.ShapeDtypeStruct((v, d), jnp.float32),             # demb
            jax.ShapeDtypeStruct((v, 1), jnp.float32),             # dbias
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(hidden_dt, emb32, emb32.T,
      bias.astype(jnp.float32).reshape(v, 1),
      targets.astype(jnp.int32)[:, None, :], lse,
      dnll.astype(jnp.float32)[:, None, :])


@jax.custom_vjp
def fused_token_nll(hidden_dt, emb, bias, targets):
    """Per-token NLL [B, T] f32 through the tied-embedding projection.

    hidden_dt: [B, D, T] (the decoder stack's native D-major orientation);
    emb [V, D] (tied embedding, f32 params); bias [V]; targets [B, T] int.
    Equivalent to ``-log_softmax(h^T @ emb^T + bias)[target]``
    (transformer_xl.logits + token_nll; reference model.py:44-51,106-126).
    """
    (nll,) = _nll_fwd_call(hidden_dt, emb, bias, targets, save=False)
    return nll[:, 0, :]


def _fused_token_nll_fwd(hidden_dt, emb, bias, targets):
    nll, lse = _nll_fwd_call(hidden_dt, emb, bias, targets, save=True)
    return nll[:, 0, :], (hidden_dt, emb, bias, targets, lse)


def _fused_token_nll_bwd(residuals, g):
    hidden_dt, emb, bias, targets, lse = residuals
    dh, demb, dbias = _nll_bwd_call(hidden_dt, emb, bias, targets, lse, g)
    return (dh, demb.astype(emb.dtype), dbias[:, 0].astype(bias.dtype), None)


fused_token_nll.defvjp(_fused_token_nll_fwd, _fused_token_nll_bwd)
