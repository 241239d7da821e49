"""Pallas TPU kernel: fused post-attention block (dropout -> post-LN ->
position-wise FFN -> post-LN), forward and backward.

Covers everything a decoder layer does after the attention projection
(reference: the dropout+LayerNorm tail of RelPartialLearnableMultiHeadAttn,
model.py:344-353, plus PositionwiseFF, model.py:155-181):

    z1 = x + dropout(o)            # attention residual
    a  = LN1(z1)                   # post-LN, f32 stats over D
    h1 = relu(W1^T a + b1)
    f  = W2^T dropout(h1) + b2
    z2 = a + dropout(f)
    y  = LN2(z2)

Why a kernel: XLA lays the inter-layer activations out T-minor (the
attention kernel's [B, H, dh, T] orientation propagates through), and its
generic lowerings for this segment run far off peak — the FFN dW becomes a
[1000,500,1] convolution at 13% of MXU peak, each LayerNorm backward is a
multi-pass f32 VPU fusion, and the bias/residual/dropout elementwise work
round-trips HBM between each of them (~25 ms/step at the training shape vs
~8 ms of inherent work).  Here every activation lives as a [D, T] /
[F, T] VMEM tile (D on sublanes, T on lanes — the same orientation XLA
already stores, so the boundary ``swapaxes`` are layout bitcasts, not
copies), the whole segment is two MXU matmuls per batch row forward / four
backward, and the LayerNorm statistics are one sublane reduction away.

The backward runs a (B,)-grid with the dW1/dW2/db/dgamma/dbeta accumulators
as f32 VMEM-resident output blocks (constant index map): initialized at
b == 0, accumulated across the whole grid, flushed once — the same pattern
as the in-kernel memory dW of commu_tpu.ops.fused_attention.

The o/f dropout masks regenerate in the backward from the same per-(b,
site) seed (pltpu.prng_*, as in the attention kernel); the h1 mask — the
largest of the three — is SIGN-ENCODED into the h1 checkpoint instead
(post-relu h1 >= 0, so the sign bit is free) and never regenerated.  The
NORMALIZED LayerNorm outputs (norm1, norm2) and post-relu h1 are
checkpointed in the compute dtype, plus the rstds ([2, T] f32 per row) —
the backward consumes norm directly and never re-subtracts a mean.

Numerics match the XLA module path to bf16/f32 tolerance
(tests/test_fused_attention.py::test_gradient_parity runs the whole layer
stack through this kernel on the pallas path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import (_interpret, _prng_seed, _vmem_limit,
                              keep_scale_for, random_keep)

LN_EPS = 1e-5
# distinct dropout streams per (batch row, site)
_SALT_O, _SALT_H, _SALT_F = 0, 1, 2


def _dropout_mask(seed, b, salt, shape, dropout_p):
    _prng_seed(seed + b * 8192 + salt * 2048)
    return random_keep(shape, dropout_p)


def _apply_drop(val, keep, dropout_p):
    return jnp.where(keep, val * keep_scale_for(dropout_p, True), 0.0)


def _ln_fwd(z, g, be):
    """z [D, T] f32 -> (y f32, norm f32, mean [1,T], rstd [1,T]); stats over
    the D (sublane) axis — matches flax nn.LayerNorm(use_fast_variance)."""
    d = z.shape[0]
    mean = jnp.sum(z, axis=0, keepdims=True) * (1.0 / d)
    sq = jnp.sum(z * z, axis=0, keepdims=True) * (1.0 / d)
    var = jnp.maximum(sq - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    norm = (z - mean) * rstd
    return norm * g + be, norm, mean, rstd


def _ln_bwd(dy, norm, rstd, g):
    """dz for y = norm * g + be with norm = (z - mean(z)) * rstd."""
    d = norm.shape[0]
    dnorm = dy * g
    m1 = jnp.sum(dnorm, axis=0, keepdims=True) * (1.0 / d)
    m2 = jnp.sum(dnorm * norm, axis=0, keepdims=True) * (1.0 / d)
    return rstd * (dnorm - m1 - norm * m2)


def o_in_ffn() -> bool:
    """COMMU_O_IN_FFN=1: the decoder layer routes the attention output
    through ``ffn_block_fused_o`` (o projection inside the FFN kernel)."""
    import os
    return os.environ.get("COMMU_O_IN_FFN", "0") == "1"


def _ffn_depth() -> int:
    """Rows in flight ahead of the finish phase (COMMU_FFN_DEPTH; capped by
    rows-per-program - 1 in ``_pipeline``)."""
    import os
    return int(os.environ.get("COMMU_FFN_DEPTH", "3"))


def _pipeline(rp, base, stage_a, finish):
    """Software-pipelined row loop: row r+1's stage A (which ends in a
    matmul) is emitted BEFORE row r's finish phase, interleaving independent
    MXU and VPU work across the rows of one program (same reasoning as the
    attention kernels' head pipelining)."""
    depth = max(1, _ffn_depth())
    pend = []
    for r in range(rp):
        pend.append((r, base + r, stage_a(r, base + r)))
        if len(pend) > depth:
            finish(*pend.pop(0))
    for st in pend:
        finish(*st)


def _ffn_fwd_kernel(scalar_ref, x_ref, o_ref, *rest,
                    dropout_p, train, rp, fuse_o):
    if fuse_o:
        # o_ref holds the pre-projection attention vector [HD, T] per row;
        # the o_net matmul runs in-kernel against the resident wo [HD, D]
        wo_ref, rest = rest[0], rest[1:]
    else:
        wo_ref = None
    (w1_ref, b1_ref, w2_ref, b2_ref, g1_ref, be1_ref, g2_ref, be2_ref,
     y_ref, *save_refs) = rest
    z1_ref, z2_ref, h1_ref, stats_ref = (save_refs + [None] * 4)[:4]
    bp = pl.program_id(0)
    cdt = x_ref.dtype
    drop = train and dropout_p > 0.0
    seed = scalar_ref[0]
    g1 = g1_ref[:, 0:1].astype(jnp.float32)                       # [D, 1]
    be1 = be1_ref[:, 0:1].astype(jnp.float32)
    g2 = g2_ref[:, 0:1].astype(jnp.float32)
    be2 = be2_ref[:, 0:1].astype(jnp.float32)
    w1 = w1_ref[...]                                              # [D, F]
    w2 = w2_ref[...]                                              # [F, D]

    def stage_a(r, b):
        """attention residual + LN1 (VPU), then the W1 matmul (MXU)."""
        x = x_ref[r].astype(jnp.float32)                          # [D, T]
        if fuse_o:
            o = jax.lax.dot_general(
                wo_ref[...], o_ref[r], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [D, T]
        else:
            o = o_ref[r].astype(jnp.float32)
        if drop:
            keep_o = _dropout_mask(seed, b, _SALT_O, o.shape, dropout_p)
            o = _apply_drop(o, keep_o, dropout_p)
        z1 = x + o
        a_f32, norm1, _, rstd1 = _ln_fwd(z1, g1, be1)
        a = a_f32.astype(cdt)                                     # [D, T]
        h1_pre = jax.lax.dot_general(w1, a, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        return norm1, a_f32, rstd1, h1_pre

    def finish(r, b, st):
        """relu/dropout (VPU), W2 matmul (MXU), LN2 + writes (VPU)."""
        norm1, a_f32, rstd1, h1_pre = st
        h1 = jnp.maximum(h1_pre + b1_ref[:, 0:1].astype(jnp.float32), 0.0)
        if drop:
            keep_h = _dropout_mask(seed, b, _SALT_H, h1.shape, dropout_p)
            h1_d = _apply_drop(h1, keep_h, dropout_p).astype(cdt)
            # checkpoint h1 with the dropout mask SIGN-ENCODED (post-relu
            # h1 >= 0, so the sign bit is free): the backward decodes
            # |c| / (c > 0) and never regenerates this mask
            h1_c = jnp.where(keep_h, h1, -h1).astype(cdt)
        else:
            h1_c = h1.astype(cdt)                                 # [F, T]
            h1_d = h1_c
        f = jax.lax.dot_general(w2, h1_d, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        f = f + b2_ref[:, 0:1].astype(jnp.float32)                # [D, T]
        if drop:
            keep_f = _dropout_mask(seed, b, _SALT_F, f.shape, dropout_p)
            f = _apply_drop(f, keep_f, dropout_p)
        z2 = a_f32 + f
        y, norm2, _, rstd2 = _ln_fwd(z2, g2, be2)
        y_ref[r] = y.astype(y_ref.dtype)
        if z1_ref is not None:  # VJP forward: checkpoint for the backward
            # the NORMALIZED values are checkpointed (not z1/z2): the
            # backward consumes norm directly, so it never re-subtracts the
            # mean / re-multiplies the rstd — and the means need not be
            # stored at all
            z1_ref[r] = norm1.astype(z1_ref.dtype)
            z2_ref[r] = norm2.astype(z2_ref.dtype)
            h1_ref[r] = h1_c
            stats_ref[r, 0:1, :] = rstd1
            stats_ref[r, 1:2, :] = rstd2

    _pipeline(rp, bp * rp, stage_a, finish)


def _ffn_bwd_kernel(scalar_ref, x_ref, o_ref, *rest,
                    dropout_p, train, rp, fuse_o):
    if fuse_o:
        wo_ref, rest = rest[0], rest[1:]
    else:
        wo_ref = None
    (w1_ref, b1_ref, w2_ref, g1_ref, be1_ref, g2_ref, be2_ref,
     z1_ref, z2_ref, h1_ref, stats_ref, dy_ref,
     dx_ref, do_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
     dg1_ref, dbe1_ref, dg2_ref, dbe2_ref, *dwo_refs) = rest
    dwo_ref = dwo_refs[0] if fuse_o else None
    bp = pl.program_id(0)
    first = bp == 0
    cdt = x_ref.dtype
    drop = train and dropout_p > 0.0
    seed = scalar_ref[0]
    g1 = g1_ref[:, 0:1].astype(jnp.float32)
    be1 = be1_ref[:, 0:1].astype(jnp.float32)
    g2 = g2_ref[:, 0:1].astype(jnp.float32)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    acc = {}  # per-program sums of the parameter-gradient contributions

    def stage_a(r, b):
        """Checkpoint restore + LN2 backward (VPU), dW2/dh1d matmuls (MXU)."""
        stats = stats_ref[r]
        rstd1, rstd2 = stats[0:1, :], stats[1:2, :]
        norm1 = z1_ref[r].astype(jnp.float32)     # checkpointed NORMALIZED
        norm2 = z2_ref[r].astype(jnp.float32)
        a_f32 = norm1 * g1 + be1
        a = a_f32.astype(cdt)
        h1 = h1_ref[r]                                            # [F, T] cdt
        if drop:
            # mask sign-encoded in the h1 checkpoint (see the forward): a
            # positive value means kept AND h1 > 0 — exactly the positions
            # where the relu+dropout backward passes gradient
            h1_d = (jnp.maximum(h1.astype(jnp.float32), 0.0)
                    * keep_scale_for(dropout_p, True)).astype(cdt)
        else:
            h1_d = h1
        dy = dy_ref[r].astype(jnp.float32)                        # [D, T]

        # ---- LN2 backward
        dz2 = _ln_bwd(dy, norm2, rstd2, g2)
        dg2 = jnp.sum(dy * norm2, axis=1, keepdims=True)          # [D, 1]
        dbe2 = jnp.sum(dy, axis=1, keepdims=True)

        # ---- second dense (+ dropout) backward
        df = dz2
        if drop:
            keep_f = _dropout_mask(seed, b, _SALT_F, df.shape, dropout_p)
            df = _apply_drop(df, keep_f, dropout_p)
        df_c = df.astype(cdt)
        db2 = jnp.sum(df, axis=1, keepdims=True)                  # [D, 1]
        dw2 = jax.lax.dot_general(h1_d, df_c, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [F,D]
        dh1d = jax.lax.dot_general(w2, df_c, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # [F,T]
        return (norm1, rstd1, a, h1, dz2, dg2, dbe2, db2, dw2, dh1d)

    def finish(r, b, st):
        """relu/dropout backward (VPU), dW1/da matmuls (MXU), LN1 backward
        + writes (VPU); parameter gradients accumulate into ``acc``."""
        (norm1, rstd1, a, h1, dz2, dg2, dbe2, db2, dw2, dh1d) = st
        # gradient passes exactly where the sign-encoded checkpoint is
        # positive (kept by dropout AND h1 > 0): relu and dropout backward
        # collapse into one select
        scale_h = keep_scale_for(dropout_p, True) if drop else 1.0
        dh1 = jnp.where(h1.astype(jnp.float32) > 0.0, dh1d * scale_h, 0.0)
        dh1_c = dh1.astype(cdt)
        db1 = jnp.sum(dh1, axis=1, keepdims=True)                 # [F, 1]
        dw1 = jax.lax.dot_general(a, dh1_c, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)  # [D,F]
        da = jax.lax.dot_general(w1, dh1_c, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)   # [D,T]
        da = da + dz2                                              # residual

        # ---- LN1 backward
        dz1 = _ln_bwd(da, norm1, rstd1, g1)
        dg1 = jnp.sum(da * norm1, axis=1, keepdims=True)
        dbe1 = jnp.sum(da, axis=1, keepdims=True)

        do = dz1
        if drop:
            keep_o = _dropout_mask(seed, b, _SALT_O, do.shape, dropout_p)
            do = _apply_drop(do, keep_o, dropout_p)
        dx_ref[r] = dz1.astype(dx_ref.dtype)
        updates = [("dw1", dw1), ("db1", db1), ("dw2", dw2), ("db2", db2),
                   ("dg1", dg1), ("dbe1", dbe1), ("dg2", dg2),
                   ("dbe2", dbe2)]
        if fuse_o:
            # chain through the in-kernel o projection: the emitted row
            # cotangent is d(vec) [HD, T], and dWo accumulates residently
            do_c = do.astype(cdt)
            dvec = jax.lax.dot_general(
                wo_ref[...], do_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [HD, T]
            dwo = jax.lax.dot_general(
                o_ref[r], do_c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)               # [HD, D]
            do_ref[r] = dvec.astype(do_ref.dtype)
            updates.append(("dwo", dwo))
        else:
            do_ref[r] = do.astype(do_ref.dtype)
        for key, val in updates:
            acc[key] = val if key not in acc else acc[key] + val

    _pipeline(rp, bp * rp, stage_a, finish)

    refs = {"dw1": dw1_ref, "db1": db1_ref, "dw2": dw2_ref, "db2": db2_ref,
            "dg1": dg1_ref, "dbe1": dbe1_ref, "dg2": dg2_ref,
            "dbe2": dbe2_ref}
    if fuse_o:
        refs["dwo"] = dwo_ref

    @pl.when(first)
    def _():
        for key, ref in refs.items():
            ref[...] = acc[key]

    @pl.when(jnp.logical_not(first))
    def _():
        for key, ref in refs.items():
            ref[...] += acc[key]


def _col(v):
    """[N] param -> [N, 1] kernel operand (feature on sublanes)."""
    return v.reshape(-1, 1)


def _rows_per_program(batch: int) -> int:
    """Rows per program (COMMU_FFN_RP, default 2 when the batch allows):
    the pipelined rows overlap one row's matmuls with another's
    LayerNorm/dropout vector work (a single row is a strict
    VPU->MXU->VPU->MXU->VPU chain)."""
    import os
    rp = int(os.environ.get("COMMU_FFN_RP", "4"))
    while rp > 1 and batch % rp != 0:
        rp -= 1
    return rp


def _bt(rp, shape):  # rows-per-program [rp, rows, T] block
    return pl.BlockSpec((rp,) + shape, lambda b, s: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _res(shape):  # grid-resident whole-array block
    n = len(shape)
    return pl.BlockSpec(shape, lambda b, s: (0,) * n,
                        memory_space=pltpu.VMEM)


def _ffn_fwd_call(x, o, wo, w1, b1, w2, b2, g1, be1, g2, be2, seed,
                  dropout_p, train, save: bool):
    """``wo`` None: ``o`` arrives projected [B, D, T].  ``wo`` [HD, D]: ``o``
    is the pre-projection attention vector [B, HD, T] and the o_net matmul
    runs in-kernel (fuse_o)."""
    batch, d, t = x.shape
    f = w1.shape[1]
    cdt = x.dtype
    fuse_o = wo is not None
    hd = o.shape[1]
    rp = _rows_per_program(batch)
    kernel = functools.partial(_ffn_fwd_kernel, dropout_p=dropout_p,
                               train=train, rp=rp, fuse_o=fuse_o)
    out_specs = [_bt(rp, (d, t))]
    out_shape = [jax.ShapeDtypeStruct((batch, d, t), cdt)]       # y
    if save:  # checkpoints for the backward
        out_specs += [_bt(rp, (d, t)), _bt(rp, (d, t)), _bt(rp, (f, t)),
                      _bt(rp, (2, t))]
        out_shape += [
            jax.ShapeDtypeStruct((batch, d, t), cdt),            # z1
            jax.ShapeDtypeStruct((batch, d, t), cdt),            # z2
            jax.ShapeDtypeStruct((batch, f, t), cdt),            # h1
            jax.ShapeDtypeStruct((batch, 2, t), jnp.float32),    # LN stats
        ]
    in_specs = [_bt(rp, (d, t)), _bt(rp, (hd, t))] + \
        ([_res(wo.shape)] if fuse_o else []) + \
        [_res(w1.shape), _res((f, 1)), _res(w2.shape), _res((d, 1)),
         _res((d, 1)), _res((d, 1)), _res((d, 1)), _res((d, 1))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(batch // rp,),
        in_specs=in_specs,
        out_specs=out_specs if save else out_specs[0])
    scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    operands = [x, o] + ([wo] if fuse_o else []) + \
        [w1, _col(b1), w2, _col(b2), _col(g1), _col(be1), _col(g2),
         _col(be2)]
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=out_shape if save else out_shape[0],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(scalars, *operands)
    return out if save else (out,)


def _ffn_bwd_call(x, o, wo, w1, b1, w2, g1, be1, g2, be2, seed,
                  z1, z2, h1, stats, dy, dropout_p, train):
    batch, d, t = x.shape
    f = w1.shape[1]
    cdt = x.dtype
    fuse_o = wo is not None
    hd = o.shape[1]
    rp = _rows_per_program(batch)
    kernel = functools.partial(_ffn_bwd_kernel, dropout_p=dropout_p,
                               train=train, rp=rp, fuse_o=fuse_o)
    in_specs = [_bt(rp, (d, t)), _bt(rp, (hd, t))] + \
        ([_res(wo.shape)] if fuse_o else []) + \
        [_res(w1.shape), _res((f, 1)), _res(w2.shape), _res((d, 1)),
         _res((d, 1)), _res((d, 1)), _res((d, 1)),
         _bt(rp, (d, t)), _bt(rp, (d, t)), _bt(rp, (f, t)),
         _bt(rp, (2, t)), _bt(rp, (d, t))]
    out_specs = [_bt(rp, (d, t)), _bt(rp, (hd, t)),
                 _res((d, f)), _res((f, 1)), _res((f, d)), _res((d, 1)),
                 _res((d, 1)), _res((d, 1)), _res((d, 1)), _res((d, 1))]
    out_shape = [
        jax.ShapeDtypeStruct((batch, d, t), cdt),          # dx
        jax.ShapeDtypeStruct((batch, hd, t), cdt),         # do (dvec if fuse_o)
        jax.ShapeDtypeStruct((d, f), jnp.float32),         # dW1
        jax.ShapeDtypeStruct((f, 1), jnp.float32),         # db1
        jax.ShapeDtypeStruct((f, d), jnp.float32),         # dW2
        jax.ShapeDtypeStruct((d, 1), jnp.float32),         # db2
        jax.ShapeDtypeStruct((d, 1), jnp.float32),         # dg1
        jax.ShapeDtypeStruct((d, 1), jnp.float32),         # dbe1
        jax.ShapeDtypeStruct((d, 1), jnp.float32),         # dg2
        jax.ShapeDtypeStruct((d, 1), jnp.float32),         # dbe2
    ]
    if fuse_o:
        out_specs.append(_res((hd, d)))
        out_shape.append(jax.ShapeDtypeStruct((hd, d), jnp.float32))  # dWo
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(batch // rp,),
        in_specs=in_specs, out_specs=out_specs)
    scalars = jnp.asarray(seed, jnp.int32).reshape(1)
    operands = [x, o] + ([wo] if fuse_o else []) + \
        [w1, _col(b1), w2, _col(g1), _col(be1), _col(g2), _col(be2),
         z1, z2, h1, stats, dy]
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit()),
        interpret=_interpret(),
    )(scalars, *operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def ffn_block(x, o, w1, b1, w2, b2, g1, be1, g2, be2, seed, dropout_p, train):
    """Fused post-attention block.  x, o: [B, D, T] (layer input and o_net
    output, pre-dropout); w1 [D, F], b1 [F], w2 [F, D], b2 [D]; g/be [D]
    LayerNorm scale/bias pairs (post-attention LN and post-FFN LN); seed:
    int32 dropout seed (ignored unless train and dropout_p > 0).
    Returns y [B, D, T]."""
    (y,) = _ffn_fwd_call(x, o, None, w1, b1, w2, b2, g1, be1, g2, be2,
                         seed, dropout_p, train, save=False)
    return y


def _ffn_block_fwd(x, o, w1, b1, w2, b2, g1, be1, g2, be2, seed,
                   dropout_p, train):
    y, z1, z2, h1, stats = _ffn_fwd_call(
        x, o, None, w1, b1, w2, b2, g1, be1, g2, be2, seed, dropout_p, train,
        save=True)
    return y, (x, o, w1, b1, w2, b2, g1, be1, g2, be2, seed, z1, z2, h1,
               stats)


def _ffn_block_bwd(dropout_p, train, residuals, dy):
    (x, o, w1, b1, w2, b2, g1, be1, g2, be2, seed, z1, z2, h1,
     stats) = residuals
    (dx, do, dw1, db1, dw2, db2, dg1, dbe1, dg2, dbe2) = _ffn_bwd_call(
        x, o, None, w1, b1, w2, g1, be1, g2, be2, seed, z1, z2, h1, stats,
        dy, dropout_p, train)
    return (dx, do, dw1.astype(w1.dtype), db1[:, 0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[:, 0].astype(b2.dtype),
            dg1[:, 0].astype(g1.dtype), dbe1[:, 0].astype(be1.dtype),
            dg2[:, 0].astype(g2.dtype), dbe2[:, 0].astype(be2.dtype), None)


ffn_block.defvjp(_ffn_block_fwd, _ffn_block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13))
def ffn_block_fused_o(x, vec, wo, w1, b1, w2, b2, g1, be1, g2, be2, seed,
                      dropout_p, train):
    """``ffn_block`` with the attention o-projection fused in: ``vec``
    [B, HD, T] is the pre-projection attention vector (heads flattened —
    a free reshape of the kernels' [B, H, dh, T] output), ``wo`` [HD, D]
    the o_net kernel.  The forward computes o = wo^T vec in-kernel; the
    backward emits d(vec) directly and accumulates dWo residently —
    the separate o einsum, its HBM round trip, and XLA's dWo contraction
    disappear.  Returns y [B, D, T]."""
    (y,) = _ffn_fwd_call(x, vec, wo, w1, b1, w2, b2, g1, be1, g2, be2,
                         seed, dropout_p, train, save=False)
    return y


def _ffn_block_fused_o_fwd(x, vec, wo, w1, b1, w2, b2, g1, be1, g2, be2,
                           seed, dropout_p, train):
    y, z1, z2, h1, stats = _ffn_fwd_call(
        x, vec, wo, w1, b1, w2, b2, g1, be1, g2, be2, seed, dropout_p,
        train, save=True)
    return y, (x, vec, wo, w1, b1, w2, b2, g1, be1, g2, be2, seed, z1, z2,
               h1, stats)


def _ffn_block_fused_o_bwd(dropout_p, train, residuals, dy):
    (x, vec, wo, w1, b1, w2, b2, g1, be1, g2, be2, seed, z1, z2, h1,
     stats) = residuals
    (dx, dvec, dw1, db1, dw2, db2, dg1, dbe1, dg2, dbe2,
     dwo) = _ffn_bwd_call(
        x, vec, wo, w1, b1, w2, g1, be1, g2, be2, seed, z1, z2, h1, stats,
        dy, dropout_p, train)
    return (dx, dvec, dwo.astype(wo.dtype), dw1.astype(w1.dtype),
            db1[:, 0].astype(b1.dtype), dw2.astype(w2.dtype),
            db2[:, 0].astype(b2.dtype), dg1[:, 0].astype(g1.dtype),
            dbe1[:, 0].astype(be1.dtype), dg2[:, 0].astype(g2.dtype),
            dbe2[:, 0].astype(be2.dtype), None)


ffn_block_fused_o.defvjp(_ffn_block_fused_o_fwd, _ffn_block_fused_o_bwd)
