"""Multi-host data parallelism (reference: multi-node DDP launcher,
/root/reference/train.py:361,364 + README.md:80).

- Unit: per-process batch slicing tiles the global batch exactly (the analog
  of the reference's rank-sharded iterators, dataset.py:196-205).
- Integration: a REAL 2-process jax.distributed run (2 procs x 2 virtual CPU
  devices = one 4-device global mesh) trains 3 steps and must match a
  single-process run on an identical 4-device mesh bit-for-bit-close.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests._multihost_worker import build_tiny_cfg, run_steps

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "_multihost_worker.py")


def test_process_batch_slice_tiles_global_batch():
    from commu_tpu.parallel.multihost import process_batch_slice

    batch = np.arange(24).reshape(12, 2)
    for nproc in (1, 2, 3, 4, 6):
        slices = [process_batch_slice(12, p, nproc) for p in range(nproc)]
        got = np.concatenate([batch[s] for s in slices], axis=0)
        assert (got == batch).all()
    with pytest.raises(ValueError):
        process_batch_slice(10, 0, 3)


def test_process_batch_slice_defaults_single_process():
    # In-process (no jax.distributed): pcount=1, the slice is the whole batch
    from commu_tpu.parallel.multihost import process_batch_slice

    assert process_batch_slice(8) == slice(0, 8)


def _free_port() -> str:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return str(s.getsockname()[1])


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    """Launch 2 real distributed processes; their jointly-computed training
    trajectory must equal the single-process trajectory on the same 4-device
    global mesh and the same global batches."""
    port = _free_port()
    out_path = str(tmp_path / "multi.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", port, out_path],
            env=env, cwd=REPO_ROOT, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        assert "WORKER_OK" in out
    with open(out_path) as f:
        multi = json.load(f)

    # Single-process baseline on an identical 4-device mesh (the conftest
    # gives this process 8 virtual devices; use the first 4).
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from commu_tpu.parallel import make_mesh

    mesh = make_mesh(4)
    rep = NamedSharding(mesh, P())

    def feed(arr):
        return arr

    def device_memory(init_fn, shardings):
        return init_fn()

    def replicate(t):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), t)

    nlls, digest = run_steps(mesh, build_tiny_cfg(8), feed, device_memory,
                             replicate)
    np.testing.assert_allclose(multi["nll"], nlls, rtol=1e-5)
    np.testing.assert_allclose(multi["digest"], digest, rtol=1e-6)


@pytest.mark.slow
def test_two_process_trainer_eval_and_checkpoint(tmp_path):
    """The FULL Trainer under 2 real processes: train across eval/checkpoint
    boundaries (sharded eval memory via the out_shardings-pinned init,
    per-process eval-window feed, collective Orbax save_last/save_best,
    final_test's best-checkpoint restore).  Eval NLL, best-val, test NLL and
    the param digest must match a single-process Trainer on an identical
    4-device mesh (reference: train.py:74-110,199-283,486-514 + the rank-0
    save/barrier at train.py:20-26,50-54)."""
    from tests._multihost_worker import run_trainer

    # One deterministic corpus shared by every process (the analog of the
    # shared filesystem a multi-host pod reads its npy corpus from).
    from commu_tpu.data.dataset import save_corpus

    rng = np.random.RandomState(0)

    def seqs(n):
        metas, events = [], []
        for _ in range(n):
            metas.append(rng.randint(560, 729, size=11).astype(np.int64))
            events.append(
                rng.randint(2, 560, size=rng.randint(20, 60)).astype(np.int64))
        return metas, events

    corpus = tmp_path / "npy"
    save_corpus(corpus, "train", *seqs(20))
    save_corpus(corpus, "val", *seqs(6))

    port = _free_port()
    out_path = str(tmp_path / "trainer_multi.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", port, out_path,
             str(corpus), str(tmp_path / "work_multi")],
            env=env, cwd=REPO_ROOT, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        assert "WORKER_OK" in out
    with open(out_path) as f:
        multi = json.load(f)

    # identical 4-device mesh (2 procs x 2 devices above; first 4 of the
    # conftest's 8 virtual devices here)
    single = run_trainer(str(corpus), str(tmp_path / "work_single"),
                         num_devices=4)

    assert multi["step"] == single["step"] == 4
    assert multi["val_tokens"] == single["val_tokens"]
    np.testing.assert_allclose(multi["val_nll_sum"], single["val_nll_sum"],
                               rtol=1e-5)
    np.testing.assert_allclose(multi["best_val_nll"], single["best_val_nll"],
                               rtol=1e-5)
    np.testing.assert_allclose(multi["test_nll"], single["test_nll"],
                               rtol=1e-5)
    np.testing.assert_allclose(multi["digest"], single["digest"], rtol=1e-6)
    # the collective save physically wrote both checkpoints
    assert (tmp_path / "work_multi" / "checkpoint_last").exists()
    assert (tmp_path / "work_multi" / "checkpoint_best").exists()
