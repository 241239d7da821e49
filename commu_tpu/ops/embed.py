"""Scaled token-embedding lookup with a matmul-based backward (pallas).

Forward is XLA's native gather (cheap); the point of this module is the
BACKWARD.  XLA's cotangent for ``emb[tokens] * scale`` on the pallas path is
a [B, T, D] f32 multiply, a full relayout copy (the incoming cotangent is
T-minor), and a serialized scatter-add into the [V, D] parameter — ~1.2
ms/step at the training shape.  Here the scatter becomes a one-hot MXU
matmul per batch row (the same ``iota == token`` selection the fused-NLL
kernel builds) accumulated into a VMEM-resident f32 [V, D] block across the
(B,) grid: ~0.15 ms of matmul, no relayout, no scatter.

Reference semantics: the scaled tied embedding, commu/model/model.py:406-420
(``emb_scale`` fold at 417) — gradients identical up to f32 summation order.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import _interpret, _vmem_limit


def _embed_grad_kernel(tok_ref, g_ref, demb_ref, *, rp):
    first = pl.program_id(0) == 0
    v = demb_ref.shape[0]
    acc = None
    for r in range(rp):
        g = g_ref[r]                                           # [D, T]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (v, g.shape[1]), 0)
        sel = (iota_v == tok_ref[r]).astype(g.dtype)           # [V, T]
        d = jax.lax.dot_general(sel, g, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [V, D]
        acc = d if acc is None else acc + d

    @pl.when(first)
    def _():
        demb_ref[...] = acc

    @pl.when(jnp.logical_not(first))
    def _():
        demb_ref[...] += acc


def _embed_grad(tokens, g_bdt, scale, v):
    """demb [V, D] f32 = scale * sum_{b,t} onehot(tokens[b,t]) g[b,:,t]."""
    batch, d, t = g_bdt.shape
    rp = 2 if batch % 2 == 0 else 1
    bt = pl.BlockSpec((rp, 1, t), lambda b: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    gb = pl.BlockSpec((rp, d, t), lambda b: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    acc = pl.BlockSpec((v, d), lambda b: (0, 0), memory_space=pltpu.VMEM)
    demb = pl.pallas_call(
        functools.partial(_embed_grad_kernel, rp=rp),
        grid=(batch // rp,),
        in_specs=[bt, gb], out_specs=acc,
        out_shape=jax.ShapeDtypeStruct((v, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(tokens.astype(jnp.int32)[:, None, :], g_bdt)
    return demb * scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def embed_bdt(emb, tokens, scale: float, dtype):
    """[B, D, T] scaled embedding lookup: (emb[tokens] * scale)^T per row.
    emb [V, D] f32 params; tokens [B, T] int; returns the pallas stack's
    T-minor orientation directly."""
    return jnp.swapaxes((emb[tokens] * scale).astype(dtype), 1, 2)


def _embed_fwd(emb, tokens, scale, dtype):
    return embed_bdt(emb, tokens, scale, dtype), (tokens, emb.shape[0])


def _embed_bwd(scale, dtype, res, g):
    tokens, v = res
    return (_embed_grad(tokens, g, scale, v), None)


embed_bdt.defvjp(_embed_fwd, _embed_bwd)
