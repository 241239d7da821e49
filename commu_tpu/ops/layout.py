"""Memory-layout kernels: the aliased blocked-ring slab write.

A Pallas call's operands and results are ALWAYS standard-layout (minor dim
on lanes), so routing a value through a Pallas copy anchors the result's
physical layout.  ``ring_write`` uses this to update the XL-memory ring
buffer in place: one contiguous slab copy, aliased through
``input_output_aliases`` so the rest of the buffer is never touched.
``rows`` arrives ALREADY in the slab orientation [..., D, T] — the layer
stack carries its activations T-minor end to end, so no transpose happens
anywhere on the memory path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _ring_write_kernel(s_ref, buf_ref, rows_ref, out_ref):
    del s_ref, buf_ref  # aliased buffer: untouched blocks keep their contents
    out_ref[(0,) * (out_ref.ndim - 2)] = rows_ref[(0,) * (rows_ref.ndim - 2)]


def ring_write_layer(buf: jnp.ndarray, rows: jnp.ndarray, layer_index: int,
                     block_index, layer_axis: int,
                     ring_axis: int) -> jnp.ndarray:
    """``ring_write`` for ONE layer of a multi-layer ring buffer.

    ``buf`` carries a layer dim at ``layer_axis`` and the ring dim at
    ``ring_axis`` (layer before ring, e.g. [C, L+1, R, B, D, T] with
    layer_axis=1, ring_axis=2); ``rows`` = ``buf`` with BOTH removed
    (e.g. [C, B, D, T]); ``layer_index`` is static.  Writing each layer's
    slab straight from that layer's activation buffer (instead of stacking
    all layers into one [L+1, ...] intermediate and calling ``ring_write``)
    skips a full materialize+read of the stacked slab (~0.4 ms/step at the
    training shape)."""
    assert 0 <= layer_axis < ring_axis
    *lead, d, t = rows.shape
    n = len(lead)
    expect = list(lead)
    expect.insert(layer_axis, buf.shape[layer_axis])
    expect.insert(ring_axis, buf.shape[ring_axis])
    assert tuple(buf.shape) == tuple(expect) + (d, t), (buf.shape, rows.shape)
    if _interpret():
        new = jnp.expand_dims(jnp.expand_dims(rows, layer_axis), ring_axis)
        zero = jnp.zeros((), jnp.int32)
        idx = [zero] * (n + 4)
        idx[layer_axis] = jnp.asarray(layer_index, jnp.int32)
        idx[ring_axis] = jnp.asarray(block_index, jnp.int32)
        return jax.lax.dynamic_update_slice(buf, new, tuple(idx))

    def buf_idx(*a):
        g, s = a[:-1], a[-1]
        idx = list(g)
        idx.insert(layer_axis, layer_index)
        idx.insert(ring_axis, s[0])
        return tuple(idx) + (0, 0)

    buf_spec = pl.BlockSpec((1,) * (n + 2) + (d, t), buf_idx,
                            memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec(
        (1,) * n + (d, t), lambda *a: a[:-1] + (0, 0),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=tuple(lead),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), rows_spec],
        out_specs=buf_spec)
    return pl.pallas_call(
        _ring_write_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        input_output_aliases={1: 0},
    )(jnp.asarray(block_index, jnp.int32).reshape(1), buf, rows)


def ring_write(buf: jnp.ndarray, rows: jnp.ndarray, block_index,
               axis: int) -> jnp.ndarray:
    """In-place blocked ring slab write.

    ``buf`` carries a ring dimension of R slabs at position ``axis``
    (e.g. [L+1, R, B, D, T] with axis=1): slot j of the logical
    [..., D, R*T] memory lives at slab j // T, lane j % T.  ``rows``
    (= ``buf`` with the slab dim removed, e.g. [L+1, B, D, T]) are the new
    rows, ALREADY in the slab orientation — the pallas layer stack carries
    its activations T-minor end to end, so the write is a pure copy;
    ``block_index`` (int32 scalar) is the ring head in BLOCKS (head // T).
    Returns ``buf`` with slab ``block_index`` replaced by ``rows``.

    Why this exists: with the ring dimension minor ([..., D, M] and a lane
    offset), a dynamic-offset update decomposes into 256-byte strided writes
    — XLA lowers it as a full-buffer predicated rewrite (~3.9 ms measured at
    the training shape) and a Pallas column write is no better (~13 ms of
    descriptor overhead).  With the ring dimension ahead of [D, T] the write
    is a set of contiguous slab regions; the buffer is aliased through the
    kernel (``input_output_aliases``) so the other R-1 slabs are never
    touched.  The slab dim must sit AFTER any layer/chunk dims that are
    sliced elsewhere (a leading-dim layer slice stays a free contiguous
    view; see commu_tpu.models.transformer_xl.Memory).
    """
    *lead, d, t = rows.shape
    n = len(lead)
    expect = tuple(lead[:axis]) + (buf.shape[axis],) + tuple(lead[axis:]) + \
        (d, t)
    assert buf.shape == expect, (buf.shape, rows.shape, axis)
    if _interpret():
        # CPU/tests: a slab-dim dynamic_update_slice is contiguous and
        # cheap everywhere; interpret-mode aliasing of partially-written
        # outputs is not guaranteed
        new = jnp.expand_dims(rows, axis)
        zero = jnp.zeros((), jnp.int32)
        idx = (zero,) * axis + (jnp.asarray(block_index, jnp.int32),) + \
            (zero,) * (n - axis + 2)
        return jax.lax.dynamic_update_slice(buf, new, idx)

    def buf_idx(*a):
        g, s = a[:-1], a[-1]
        return g[:axis] + (s[0],) + g[axis:] + (0, 0)

    buf_spec = pl.BlockSpec((1,) * (n + 1) + (d, t), buf_idx,
                            memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec(
        (1,) * n + (d, t), lambda *a: a[:-1] + (0, 0),
        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=tuple(lead),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), rows_spec],
        out_specs=buf_spec)
    return pl.pallas_call(
        _ring_write_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        input_output_aliases={1: 0},
    )(jnp.asarray(block_index, jnp.int32).reshape(1), buf, rows)

