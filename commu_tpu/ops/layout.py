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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def pinned_rowmajor_zeros(shape, dtype) -> jnp.ndarray:
    """zeros with the row-major physical layout PINNED (TPU only).

    XLA's layout choice for a plain ``jnp.zeros`` executable is not stable
    across compilation-cache states: with a warm persistent cache the 6-D
    XL ring buffer came back with a B<->D-swapped tiled layout
    (major_to_minor (0,1,2,4,3,5)) while a pin-less cold compile produced
    row-major — and the train step, whose donated memory argument pins
    row-major (parallel/mesh._pin_rowmajor), then rejected its own init
    ("Layout passed to jit does not match the layout on the respective
    arg").

    The pin is an ``out_shardings=Format(Layout(...))`` on a jitted zeros —
    but the persistent compilation cache's key OMITS the result-layout pin
    (measured on-chip: a warm cache returned the PLAIN zeros executable's
    swapped layout for the pinned call — the two collide on one entry).  So
    the computation below is SALTED with a dead unique constant: its
    unoptimized HLO differs from every plain ``jnp.zeros`` in the program,
    and the only executable that can ever sit under its cache key was
    compiled with the pin.  (A Pallas zeros kernel was tried instead and
    does NOT anchor: XLA inserts a relayout copy after the custom call at
    the entry boundary and still picks the swapped layout.)  NOTE the salt
    closes the collision but cannot close the cache's OTHER failure mode —
    warm-loaded executables report default layouts for pinned results (a
    PJRT deserialize bug, see commu_tpu.utils.jax_cache) — so the cache
    stays opt-in; scripts/verify_cache.py is the regression gate.  Off-TPU
    layouts don't exist; plain zeros.

    Must be called OUTSIDE any jit trace (it commits to a device).
    """
    if jax.default_backend() != "tpu":
        return jnp.zeros(shape, dtype)
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding
    fmt = Format(Layout(major_to_minor=tuple(range(len(shape)))),
                 SingleDeviceSharding(jax.devices()[0]))

    def salted_zeros():
        salt = jnp.asarray(0x51EED0, jnp.int32) * jnp.asarray(0, jnp.int32)
        return jnp.zeros(shape, dtype) + salt.astype(dtype)

    return jax.jit(salted_zeros, out_shardings=fmt)()


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


def _cache_append_kernel(s_ref, k_ref, v_ref, ks_ref, vs_ref,
                         ko_ref, vo_ref, *, n_rows, t_blk):
    """Write one (layer, row) K/V column at the row's current length.

    Blocks are [H, dh, Tb] slices of the cache picked by the row's
    block index (scalar-prefetched).  The cache blocks arrive as blocked
    INPUTS (aliased to the outputs — output windows are not prefetched on
    TPU, so the old contents must be read from the input refs); only the
    target lane changes, rows with ``advance == 0`` store their block back
    unmodified."""
    g = pl.program_id(1)
    lane = s_ref[n_rows + g]
    adv = s_ref[2 * n_rows + g]
    h, dh = ks_ref.shape[2], ks_ref.shape[3]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (h, dh, t_blk), 2)
    sel = (lanes == lane) & (adv != 0)
    dt = k_ref.dtype
    # minor-dim insertion ([h,dh] -> [h,dh,1]) is 32-bit-only in Mosaic:
    # broadcast in f32 and cast back (bf16 -> f32 -> bf16 is exact)
    ks = ks_ref[0, 0].astype(jnp.float32)[..., None]
    vs = vs_ref[0, 0].astype(jnp.float32)[..., None]
    ko_ref[0, 0] = jnp.where(sel, ks, k_ref[0, 0].astype(jnp.float32)).astype(dt)
    vo_ref[0, 0] = jnp.where(sel, vs, v_ref[0, 0].astype(jnp.float32)).astype(dt)


def cache_append(k: jnp.ndarray, v: jnp.ndarray, k_self: jnp.ndarray,
                 v_self: jnp.ndarray, length: jnp.ndarray,
                 advance: jnp.ndarray, t_blk: int = 128):
    """Append per-row self K/V into a decode cache, touching ONE block.

    k, v: [L, G, H, dh, M] left-aligned KV cache (M % t_blk == 0);
    k_self, v_self: [L, G, H, dh]; length: [G] write positions;
    advance: [G] bool — rows not advancing keep their cache unchanged.

    The XLA alternative (a full-buffer masked select) reads AND rewrites
    the entire cache every token — ~800 MB of HBM traffic per step at
    G=32 full size, the term that made batched generation scale WORSE
    past batch 8 (BENCH_generation.json round 3).  Here each (layer, row)
    program DMAs only the [H, dh, t_blk] block containing the write lane
    and the buffers alias in place, so traffic per token is
    O(L·G·H·dh·t_blk) instead of O(L·G·H·dh·M).
    """
    l_dim, g_dim, h, dh, m_cap = k.shape
    assert m_cap % t_blk == 0, (m_cap, t_blk)
    if _interpret():
        one_hot = (jnp.arange(m_cap)[None, :] == length[:, None])
        write = (one_hot & advance[:, None])[None, :, None, None, :]
        new_k = jnp.where(write, k_self[..., None].astype(k.dtype), k)
        new_v = jnp.where(write, v_self[..., None].astype(v.dtype), v)
        return new_k, new_v

    # a full row (length == m_cap) never writes: clamp the block index into
    # range and zero the advance flag (mirrors the one_hot-all-false select)
    in_range = length < m_cap
    scalars = jnp.concatenate([
        jnp.minimum(length // t_blk, m_cap // t_blk - 1).astype(jnp.int32),
        (length % t_blk).astype(jnp.int32),
        (advance & in_range).astype(jnp.int32)])
    cache_spec = pl.BlockSpec(
        (1, 1, h, dh, t_blk),
        lambda l, g, s: (l, g, 0, 0, s[g]),
        memory_space=pltpu.VMEM)
    self_spec = pl.BlockSpec((1, 1, h, dh), lambda l, g, s: (l, g, 0, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(l_dim, g_dim),
        in_specs=[cache_spec, cache_spec, self_spec, self_spec],
        out_specs=[cache_spec, cache_spec])
    return pl.pallas_call(
        functools.partial(_cache_append_kernel, n_rows=g_dim, t_blk=t_blk),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        input_output_aliases={1: 0, 2: 1},
    )(scalars, k, v, k_self.astype(k.dtype), v_self.astype(v.dtype))


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

