"""Worker for the real 2-process distributed test (test_multihost.py).

Each process owns 2 virtual CPU devices; together they form a 4-device global
``data`` mesh — the TPU-native analog of the reference's multi-node DDP launch
(reference: train.py:361, README.md:80).  Runs 3 training steps on
deterministic synthetic batches; process 0 writes the nll trajectory and a
param digest to ``out_path`` for comparison against a single-process run on
an identical 4-device mesh.

Usage: python tests/_multihost_worker.py <pid> <nproc> <port> <out_path>
(env must already force JAX_PLATFORMS=cpu + 2 virtual host devices).
"""
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def build_tiny_cfg(batch):
    from commu_tpu.config import (EvaluateConfig, ModelConfig, TrainConfig,
                                  TrainingConfig)
    return TrainingConfig(
        model=ModelConfig(num_layers=2, num_heads=2, units=32, inner_size=64,
                          dropout=0.0, attention_dropout=0.0),
        train=TrainConfig(batch_size=batch, batch_chunk=2, tgt_length=16,
                          mem_length=32),
        evaluate=EvaluateConfig(batch_size=batch, tgt_length=16,
                                mem_length=32),
    )


def run_steps(mesh, cfg, feed, device_memory, replicate, n_steps=3):
    """Shared between the workers and the single-process baseline: identical
    math on an identical global mesh, differing only in how host arrays reach
    the devices."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from commu_tpu.models.transformer_xl import TransformerXL
    from commu_tpu.parallel import shard_train_step
    from commu_tpu.parallel.mesh import _train_memory_shardings
    from commu_tpu.training.step import (create_train_state,
                                         init_train_memory, make_train_step,
                                         resolve_physical_chunks)
    from commu_tpu.vocab.event_tokens import VOCAB_SIZE

    batch = cfg.train.batch_size
    n_dev = mesh.devices.size
    model = TransformerXL(VOCAB_SIZE, cfg.model, dtype=jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, cfg, n_dev)
    state = replicate(state)
    rng = replicate(jax.random.PRNGKey(7))
    physical = resolve_physical_chunks(cfg)
    step = shard_train_step(
        make_train_step(model, cfg, n_dev, physical_chunks=physical), mesh)
    memory = device_memory(
        lambda: init_train_memory(cfg.model.num_layers, batch,
                                  cfg.train.mem_length, cfg.model.units,
                                  physical),
        _train_memory_shardings(mesh, transposed=False))

    data_rng = np.random.RandomState(0)
    nlls = []
    for _ in range(n_steps):
        inputs = data_rng.randint(1, VOCAB_SIZE, size=(batch, 16)).astype(
            np.int32)
        targets = data_rng.randint(1, VOCAB_SIZE, size=(batch, 16)).astype(
            np.int32)
        reset = np.zeros(batch, dtype=bool)
        state, memory, metrics = step(state, memory, feed(inputs),
                                      feed(targets), feed(reset), rng)
        nlls.append(float(metrics["nll_sum"]))
    digest = float(sum(
        float(jnp.sum(jnp.abs(p)))
        for p in jax.tree_util.tree_leaves(state.params)))
    return nlls, digest


def trainer_cfg():
    """Tiny Trainer config whose schedule crosses eval/checkpoint boundaries
    (eval_interval 2, max_step 4 -> two eval passes, collective save_last,
    save_best + test pass on improvement)."""
    from commu_tpu.config import (EvaluateConfig, ModelConfig, TrainConfig,
                                  TrainingConfig)
    return TrainingConfig(
        model=ModelConfig(num_layers=2, num_heads=2, units=32, inner_size=64,
                          dropout=0.0, attention_dropout=0.0),
        # lr high enough that val NLL strictly improves at every eval: the
        # save_best decision must not hinge on a reduction-order wobble
        # between process topologies (final_test restores checkpoint_best,
        # so a flipped decision would diverge the post-restore state)
        train=TrainConfig(batch_size=8, batch_chunk=2, tgt_length=16,
                          mem_length=32, lr=4e-2, warmup_step=2, max_step=4,
                          log_interval=2, eval_interval=2),
        evaluate=EvaluateConfig(batch_size=4, tgt_length=16, mem_length=32),
    )


def run_trainer(corpus_dir, work_dir, num_devices=None):
    """The full Trainer path (train incl. eval/checkpoint cadence, an
    explicit eval pass, final_test's best-checkpoint restore) — identical
    between the 2-process workers and the single-process baseline; only the
    process topology differs (reference: train.py:74-110,199-283,486-514)."""
    import jax
    import jax.numpy as jnp

    from commu_tpu.training.loop import Trainer

    tr = Trainer(corpus_dir, work_dir, trainer_cfg(),
                 num_devices=num_devices, model_dtype=jnp.float32)
    tr.train()
    val_tokens, val_nll_sum = tr.evaluate("valid")
    test_nll = tr.final_test()
    digest = float(sum(
        float(jnp.sum(jnp.abs(p)))
        for p in jax.tree_util.tree_leaves(tr.state.params)))
    return {"step": int(tr.state.step), "val_tokens": int(val_tokens),
            "val_nll_sum": float(val_nll_sum),
            "best_val_nll": float(tr.best_val_nll),
            "test_nll": float(test_nll), "digest": digest}


def main_trainer():
    pid, nproc, port, out_path, corpus_dir, work_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5], sys.argv[6])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from commu_tpu.parallel import multihost as mh

    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=nproc, process_id=pid)
    result = run_trainer(corpus_dir, work_dir)
    mh.sync("trainer_done")
    if mh.is_primary():
        with open(out_path, "w") as f:
            json.dump(result, f)
    print("WORKER_OK", pid)


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from jax.sharding import PartitionSpec as P

    from commu_tpu.parallel import make_mesh
    from commu_tpu.parallel import multihost as mh
    from commu_tpu.parallel.mesh import DATA_AXIS

    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=nproc, process_id=pid)
    assert mh.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc, len(jax.devices())

    mesh = make_mesh()  # global: spans both processes
    batch = 8
    cfg = build_tiny_cfg(batch)

    def feed(arr):
        rows = arr[mh.process_batch_slice(arr.shape[0])]
        return mh.host_local_to_global(mesh, P(DATA_AXIS), rows, arr.shape)

    def device_memory(init_fn, shardings):
        return jax.jit(init_fn, out_shardings=shardings)()

    nlls, digest = run_steps(mesh, cfg, feed, device_memory,
                             lambda t: mh.replicate_to_global(mesh, t))

    # Orbax checkpointing is collective under multi-process: every process
    # calls save/restore (Orbax coordinates; primary host writes).
    import jax.numpy as jnp

    from commu_tpu.models.transformer_xl import TransformerXL
    from commu_tpu.training.checkpoint import CheckpointManager
    from commu_tpu.training.step import create_train_state
    from commu_tpu.vocab.event_tokens import VOCAB_SIZE

    ckpt_dir = os.path.join(os.path.dirname(out_path), "ckpt")
    model = TransformerXL(VOCAB_SIZE, cfg.model, dtype=jnp.float32)
    state = mh.replicate_to_global(mesh, create_train_state(
        jax.random.PRNGKey(3), model, cfg, mesh.devices.size))
    mgr = CheckpointManager(ckpt_dir)
    mgr.save_last(state, 1.25)
    restored, best = mgr.restore("checkpoint_last", state)
    assert best == 1.25

    mh.sync("done")
    if mh.is_primary():
        with open(out_path, "w") as f:
            json.dump({"nll": nlls, "digest": digest}, f)
    print("WORKER_OK", pid)


if __name__ == "__main__":
    if len(sys.argv) > 5:
        main_trainer()
    else:
        main()
