"""Data-parallel sharding over a TPU device mesh.

Replaces the reference's entire distributed runtime — NCCL process groups,
DDP gradient buckets, explicit all_reduces, env:// rendezvous and
``--local_rank`` plumbing (reference: train.py:8-12,361,364,467-473,
README.md:80) — with JAX SPMD:

- ONE process drives a 1-D ``data`` mesh over all local devices;
- batch, targets, reset flags and the XL memory are sharded on the batch
  dimension; params/optimizer state are replicated;
- the gradient reduction is *implicit*: the loss is a global mean over the
  sharded batch, so XLA inserts the ``psum`` over ICI during ``jit``
  compilation.  Metric sums come out already reduced for the same reason.

No collective appears in user code; the mesh layout IS the communication
design.  Scaling past one host means constructing the mesh from
``jax.devices()`` spanning hosts — the step function is unchanged.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """[B, ...] arrays: shard the leading (batch) axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def memory_sharding(mesh: Mesh, transposed: bool = False) -> NamedSharding:
    """XL memory hidden: shard the batch axis — index 1 of the dense
    [L+1, B, M, D] layout, index 2 of the blocked ring [L+1, R, B, D, T]."""
    if transposed:
        return NamedSharding(mesh, P(None, None, DATA_AXIS))
    return NamedSharding(mesh, P(None, DATA_AXIS))


def _pin_rowmajor(sharding: NamedSharding, ndim: int):
    """Pin the standard row-major layout on the (donated) XL memory buffer.

    Left to itself, XLA assigns the jit *parameter* a B<->D-swapped physical
    layout while the in-body consumers (the fused-attention kv projections,
    via their layout anchors) want row-major — forcing a full ~2 GB relayout
    copy of the ring buffer plus a non-aliased dynamic-update-slice every
    step (~9 ms at the reference training shape on a v5e chip; measured
    207k -> 218k tokens/s/chip with the pin).  Layout formats are TPU-only;
    elsewhere the plain sharding is returned."""
    if jax.default_backend() != "tpu":
        return sharding
    from jax.experimental.layout import Format, Layout
    return Format(Layout(major_to_minor=tuple(range(ndim))), sharding)


def _memory_shardings(mesh: Mesh, transposed: bool = False):
    from ..models.transformer_xl import Memory
    # hidden [L+1, B, M, D] dense, [L+1, R, B, D, T] blocked ring
    # (``transposed`` is static pytree metadata and must match the arrays')
    ndim = 5 if transposed else 4
    return Memory(hidden=_pin_rowmajor(memory_sharding(mesh, transposed), ndim),
                  count=replicated(mesh), head=replicated(mesh),
                  transposed=transposed)


def _train_memory_shardings(mesh: Mesh, transposed: bool = False):
    from ..training.step import TrainMemory
    # hidden [C, L+1, B/C, M, D] dense (per-chunk batch at index 2),
    # [C, L+1, R, B/C, D, T] blocked ring (per-chunk batch at index 3)
    if transposed:
        sharding = NamedSharding(mesh, P(None, None, None, DATA_AXIS))
        ndim = 6
    else:
        sharding = NamedSharding(mesh, P(None, None, DATA_AXIS))
        ndim = 5
    return TrainMemory(
        hidden=_pin_rowmajor(sharding, ndim),
        count=replicated(mesh), head=replicated(mesh), transposed=transposed)


def _train_memory_specs(transposed: bool):
    from ..training.step import TrainMemory
    if transposed:
        spec = P(None, None, None, DATA_AXIS)
    else:
        spec = P(None, None, DATA_AXIS)
    return TrainMemory(hidden=spec, count=P(), head=P(), transposed=transposed)


def _memory_specs(transposed: bool):
    from ..models.transformer_xl import Memory
    spec = P(None, None, DATA_AXIS) if transposed else P(None, DATA_AXIS)
    return Memory(hidden=spec, count=P(), head=P(), transposed=transposed)


def shard_train_step(train_step, mesh: Mesh, transposed: bool = False,
                     manual: bool = False):
    """jit the train step with DP shardings.

    (state, memory, inputs, targets, reset, rng) -> (state, memory, metrics)
    State replicated; memory and batch sharded; metrics replicated scalars.
    ``transposed`` must match the TrainMemory the step will be fed (it is
    static pytree metadata on the memory container).

    ``manual``: wrap in ``jax.shard_map`` instead of relying on the SPMD
    partitioner — REQUIRED for the Pallas path on a >1-device mesh (the
    partitioner cannot shard a Mosaic custom call: it all-gathers the batch
    and replicates the kernel on every chip).  The step must then have been
    built with ``make_train_step(..., axis_name=DATA_AXIS)`` so it performs
    its own grad ``pmean`` / metric ``psum`` — XLA lowers those onto ICI
    exactly like the implicit ones of the automatic path.
    """
    rep = replicated(mesh)
    bat = batch_sharding(mesh)
    mem = _train_memory_shardings(mesh, transposed)
    if manual:
        train_step = jax.shard_map(
            train_step, mesh=mesh,
            in_specs=(P(), _train_memory_specs(transposed),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(P(), _train_memory_specs(transposed), P()),
            check_vma=False,
        )
    return jax.jit(
        train_step,
        in_shardings=(rep, mem, bat, bat, bat, rep),
        out_shardings=(rep, mem, rep),
        donate_argnums=(0, 1),
    )


def shard_eval_step(eval_step, mesh: Mesh, transposed: bool = False,
                    manual: bool = False):
    """jit the eval step with DP shardings.

    (params, memory, inputs, targets, reset) -> (nll_sum, token_count, memory)
    ``manual``: see shard_train_step — pair with
    ``make_eval_step(..., axis_name=DATA_AXIS)``.
    """
    rep = replicated(mesh)
    bat = batch_sharding(mesh)
    mem = _memory_shardings(mesh, transposed)
    if manual:
        eval_step = jax.shard_map(
            eval_step, mesh=mesh,
            in_specs=(P(), _memory_specs(transposed),
                      P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P(), _memory_specs(transposed)),
            check_vma=False,
        )
    return jax.jit(
        eval_step,
        in_shardings=(rep, mem, bat, bat, bat),
        out_shardings=(rep, rep, mem),
        donate_argnums=(1,),
    )
