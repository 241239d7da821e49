"""Pallas TPU kernel: plain activation dropout over [B, D, T] tiles.

The flax/XLA dropout at the embedding and output sites draws its mask with
the threefry PRNG — ~0.4 ms per site per step at the training shape, almost
all of it mask *generation* (threefry is ~10 ALU ops per 32-bit word, and
XLA materializes the [B, D, T] draw).  The in-kernel TPU PRNG
(`pltpu.prng_random_bits`, same generator the fused attention/FFN kernels
use) makes the draw nearly free, and the mask is regenerated in the backward
from the same (seed, row) — nothing but the activations ever touches HBM.

Used by the pallas model path for the embedding-input and decoder-output
dropouts (reference: the `drop(word_emb)` / `drop(core_out)` sites,
commu/model/model.py:585-599); the XLA path keeps flax Dropout.  Off-TPU the
kernel runs in interpret mode with the same pltpu PRNG emulation as the
other kernels; dropout tests monkeypatch `_mask` (see
tests/test_fused_ffn_dropout.py for the pattern).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import (_interpret, _prng_seed, _vmem_limit,
                              keep_scale_for, random_keep)

# site salts: keep the embedding / output streams disjoint from each other
# (they also use independently drawn base seeds; the salt is belt-and-braces)
SALT_EMB, SALT_OUT = 5, 6


def _mask(seed, b, salt, shape, dropout_p):
    _prng_seed(seed + b * 16384 + salt * 512)
    return random_keep(shape, dropout_p)


def _drop_kernel(scalar_ref, x_ref, y_ref, *, dropout_p, salt, rp):
    bp = pl.program_id(0)
    seed = scalar_ref[0]
    inv = keep_scale_for(dropout_p, True)
    for r in range(rp):
        keep = _mask(seed, bp * rp + r, salt, x_ref.shape[1:], dropout_p)
        x = x_ref[r]
        y_ref[r] = jnp.where(keep, x * x_ref.dtype.type(inv),
                             x_ref.dtype.type(0))


def _drop_call(x, seed, dropout_p, salt):
    batch, d, t = x.shape
    rp = 2 if batch % 2 == 0 else 1
    kernel = functools.partial(_drop_kernel, dropout_p=dropout_p, salt=salt,
                               rp=rp)
    spec = pl.BlockSpec((rp, d, t), lambda b, s: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(batch // rp,),
        in_specs=[spec], out_specs=spec)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(jnp.asarray(seed, jnp.int32).reshape(1), x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dropout_bdt(x, seed, dropout_p: float, salt: int):
    """Inverted dropout on x [B, D, T]: keep with prob 1-p, scale by 1/(1-p).
    The mask regenerates in the backward from (seed, batch row, salt)."""
    return _drop_call(x, seed, dropout_p, salt)


def _dropout_fwd(x, seed, dropout_p, salt):
    return _drop_call(x, seed, dropout_p, salt), seed


def _dropout_bwd(dropout_p, salt, seed, g):
    return _drop_call(g, seed, dropout_p, salt), None


dropout_bdt.defvjp(_dropout_fwd, _dropout_bwd)
