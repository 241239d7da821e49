"""Multi-host data parallelism.

TPU-native replacement for the reference's multi-node launcher
(``torch.distributed.launch --nproc_per_node`` + ``env://`` NCCL rendezvous +
``--local_rank`` device binding, reference: train.py:359-364, README.md:80):

- **Rendezvous** — ``initialize()`` wraps ``jax.distributed.initialize``; on
  TPU pods the coordinator is discovered automatically, elsewhere (and in the
  CPU-simulated tests) it is passed explicitly.  After it, ``jax.devices()``
  spans every host and ``commu_tpu.parallel.make_mesh()`` builds a global
  data mesh — the step function is unchanged.
- **Data feed** — every process runs the same deterministic packing iterator
  (same seed), takes its own contiguous row slice of the global batch
  (``process_batch_slice``, the analog of the reference's per-rank iterators,
  dataset.py:196-205), and assembles the global sharded array from the local
  rows (``host_local_to_global``).
- **Collectives** — none in user code: the loss is a global mean over the
  sharded batch, so the gradient ``psum`` rides ICI/DCN inside the jitted
  step, exactly as in the single-host mesh.  The reference's seven explicit
  ``all_reduce`` sites collapse into replicated output scalars.
- **Checkpoint gating** — writes happen on process 0 only, bracketed by
  ``sync_global_devices`` (the reference's rank-0 save + barrier,
  train.py:20-26,50-54).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None) -> None:
    """Opt-in process rendezvous (reference: init_process_group(nccl,
    env://), train.py:361).  On TPU pods all arguments are auto-discovered;
    pass them explicitly for CPU/GPU clusters or simulated multi-host runs.
    Safe to skip entirely for single-process runs."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the checkpoint/log-owning process (reference rank 0)."""
    return jax.process_index() == 0


def sync(name: str = "commu_sync") -> None:
    """Cross-process barrier (reference: dist.barrier(), train.py:26)."""
    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)


def process_batch_slice(global_batch: int,
                        pindex: Optional[int] = None,
                        pcount: Optional[int] = None) -> slice:
    """Contiguous per-process row slice of the global batch.

    The packing iterator is deterministic given its seed, so every process
    materializes the identical global batch on host and keeps only its rows —
    same statistics as the reference's per-rank iterators (dataset.py:196-205)
    without per-rank seed skew."""
    pindex = jax.process_index() if pindex is None else pindex
    pcount = jax.process_count() if pcount is None else pcount
    if global_batch % pcount != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {pcount} processes")
    rows = global_batch // pcount
    return slice(pindex * rows, (pindex + 1) * rows)


def host_local_to_global(mesh: Mesh, spec: P, local_rows: np.ndarray,
                         global_shape: Optional[tuple] = None) -> jax.Array:
    """Assemble the global sharded array from this process's rows.

    ``local_rows`` is the slice produced by ``process_batch_slice`` (axis 0
    of ``spec`` must be the sharded batch axis).  Single-process: a plain
    device_put (the rows ARE the global batch)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_rows), global_shape)


def replicate_to_global(mesh: Mesh, tree):
    """Replicate a host-local pytree (identical on every process — e.g. the
    deterministically-initialized TrainState) onto the global mesh."""
    if jax.process_count() == 1:
        sharding = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)
    return multihost_utils.host_local_array_to_global_array(tree, mesh, P())
