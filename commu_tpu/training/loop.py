"""The training driver: wires dataset, sharded steps, eval, checkpoints.

Functional equivalent of the reference's script-level training program
(reference: train.py:113-288,357-514) as a library class:

- one process, one 1-D ``data`` mesh (commu_tpu.parallel) — no launcher;
- the packing iterator produces the *global* batch; sharding moves rows to
  devices (vs. the reference's per-rank iterators with per-rank seeds,
  train.py:394-417 — same statistics, better coverage);
- logging matches the reference's cadence and quantities: every
  ``log_interval`` steps {lr, tokens/s, nll, ppl, grad norm}
  (train.py:171-197), every ``eval_interval`` steps a val pass, best/last
  checkpoints, and a test pass on improvement (train.py:199-283);
- metric fetches are deferred to the log boundary so the device never idles
  on host readback inside the hot loop;
- adds real resume (--resume), which the reference lacks.
"""
from __future__ import annotations

import logging
import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..config import TrainingConfig
from ..data.dataset import ComMUDataset
from ..models.transformer_xl import TransformerXL, init_memory
from ..parallel import make_mesh, shard_eval_step, shard_train_step
from ..parallel import multihost as mh
from ..vocab.event_tokens import VOCAB_SIZE
from . import checkpoint as ckpt
from .step import TrainState, create_train_state, make_eval_step, make_train_step

logger = logging.getLogger("ComMU")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Trainer:
    def __init__(self, data_dir: str, work_dir: str,
                 cfg: Optional[TrainingConfig] = None,
                 num_devices: Optional[int] = None,
                 model_dtype=jnp.bfloat16, profile: bool = False):
        self.cfg = cfg or TrainingConfig()
        self.model_dtype = model_dtype
        self.profile = profile
        self.data_dir = data_dir
        self.work_dir = work_dir
        # Mesh over ALL devices — spans hosts after multihost.initialize()
        # (the reference's multi-node DDP launch, train.py:361, README.md:80).
        self.mesh = make_mesh(num_devices)
        self.num_devices = self.mesh.devices.size
        self.multiprocess = jax.process_count() > 1
        self.is_primary = mh.is_primary()

        tcfg = self.cfg.train
        assert tcfg.batch_size % (tcfg.batch_chunk * self.num_devices) == 0, (
            "global batch must divide into batch_chunk x num_devices chunks")
        if self.multiprocess:
            assert tcfg.batch_size % jax.process_count() == 0, (
                "global batch must divide across processes")

        self.dataset = ComMUDataset(data_dir)
        self.model = TransformerXL(VOCAB_SIZE, self.cfg.model, dtype=model_dtype)
        transposed = self._transposed_mem()
        # Pallas kernels on a >1-device mesh need MANUAL SPMD (shard_map +
        # explicit grad pmean): the partitioner cannot shard a Mosaic custom
        # call and would all-gather the batch onto every chip.  One device
        # keeps the plain jit (identical semantics, no wrapper).
        from ..parallel.mesh import DATA_AXIS
        manual = transposed and self.num_devices > 1
        axis = DATA_AXIS if manual else None
        self.train_step = shard_train_step(
            make_train_step(self.model, self.cfg, self.num_devices,
                            axis_name=axis),
            self.mesh, transposed=transposed, manual=manual)
        self.eval_step = shard_eval_step(
            make_eval_step(self.model, same_length=True, axis_name=axis),
            self.mesh, transposed=transposed, manual=manual)

        rng = jax.random.PRNGKey(tcfg.seed)
        self.init_rng, self.run_rng = jax.random.split(rng)
        self.state = create_train_state(
            self.init_rng, self.model, self.cfg, self.num_devices)
        if self.multiprocess:
            # deterministic init -> identical on every process; lift onto the
            # global mesh (replicated), incl. the dropout rng
            self.state = mh.replicate_to_global(self.mesh, self.state)
            self.run_rng = mh.replicate_to_global(self.mesh, self.run_rng)
        n_params = sum(int(np.prod(p.shape)) for p in
                       jax.tree_util.tree_leaves(self.state.params))
        logger.info("#total params = %d", n_params)  # reference train.py:478
        self.best_val_nll = math.inf
        self.ckpts = ckpt.CheckpointManager(work_dir)
        if self.is_primary:
            ckpt.write_config_snapshot(work_dir, self.cfg)

        # Eval batch: at least the reference's 10 rows, rounded up to a
        # multiple of the mesh size so rows shard evenly.  Grouping does not
        # change the NLL totals (pad rows contribute zero).
        self.eval_batch = _round_up(self.cfg.evaluate.batch_size, self.num_devices)

    # ------------------------------------------------------------------
    def maybe_resume(self) -> bool:
        if not self.ckpts.has("checkpoint_last"):
            return False
        self.state, self.best_val_nll = self.ckpts.restore(
            "checkpoint_last", self.state)
        if self.multiprocess:
            self.state = mh.replicate_to_global(self.mesh, self.state)
        logger.info("Resumed from step %d (best val nll %.4f)",
                    int(self.state.step), self.best_val_nll)
        return True

    # ------------------------------------------------------------------
    def evaluate(self, split: str = "valid") -> tuple[int, float]:
        """(token_count, total_nll) over the split (reference: train.py:74-110).

        Memory is reset at each sequence-batch boundary (fresh zero buffer),
        matching the reference's ``mems = None`` on ``reset_all_mem``.
        """
        ecfg = self.cfg.evaluate
        total_tokens = 0
        total_nll = 0.0
        memory = None
        nll_parts = []
        from ..parallel.mesh import _memory_shardings
        mem_shardings = _memory_shardings(self.mesh, self._transposed_mem())
        for batch in self.dataset.eval_iterator(
                self.eval_batch, ecfg.tgt_length, split=split):
            if batch.reset[0] or memory is None:
                memory = self._device_memory(
                    lambda pin: init_memory(
                        self.cfg.model.num_layers, self.eval_batch,
                        ecfg.mem_length, self.cfg.model.units,
                        dtype=self.model_dtype,
                        transposed=self._transposed_mem(),
                        block_len=ecfg.tgt_length, pin_layout=pin),
                    mem_shardings)
            reset = np.zeros(self.eval_batch, dtype=bool)
            nll_sum, tok, memory = self.eval_step(
                self.state.params, memory, self._feed(batch.inputs),
                self._feed(batch.targets), self._feed(reset))
            nll_parts.append(nll_sum)
            total_tokens += batch.token_count
        total_nll = float(sum(float(x) for x in nll_parts))
        return total_tokens, total_nll

    def _transposed_mem(self) -> bool:
        # D-major ring memory feeds the fused-attention kv projection without
        # a relayout; only meaningful (and only legal) on the pallas path
        from ..models.transformer_xl import resolve_attn_impl
        return resolve_attn_impl(self.cfg.model) == "pallas"

    # ------------------------------------------------------------------
    def _feed(self, arr: np.ndarray):
        """Host batch array -> mesh.  Multi-host: every process materialized
        the identical global batch from the deterministic iterator; each
        contributes its own contiguous row slice (the analog of the
        reference's rank-sharded iterators, dataset.py:196-205)."""
        if not self.multiprocess:
            return arr
        rows = arr[mh.process_batch_slice(arr.shape[0])]
        from ..parallel.mesh import DATA_AXIS
        return mh.host_local_to_global(self.mesh, P(DATA_AXIS), rows,
                                       arr.shape)

    def _device_memory(self, init_fn, shardings):
        """Create the XL memory directly on the (possibly multi-host) mesh.
        A host-created buffer cannot be committed to non-addressable devices,
        so under multi-process the zeros are produced by a jitted program
        with explicit out_shardings (which carry the row-major layout pin —
        init_fn must pass pin_layout=False there since it runs under the
        trace; single-process init pins inside init_*_memory itself)."""
        if not self.multiprocess:
            return init_fn(True)
        return jax.jit(lambda: init_fn(False), out_shardings=shardings)()

    # ------------------------------------------------------------------
    def train(self, max_step: Optional[int] = None) -> None:
        from .step import init_train_memory, resolve_physical_chunks

        tcfg = self.cfg.train
        max_step = max_step or tcfg.max_step
        from ..parallel.mesh import _train_memory_shardings
        memory = self._device_memory(
            lambda pin: init_train_memory(
                self.cfg.model.num_layers, tcfg.batch_size,
                tcfg.mem_length, self.cfg.model.units,
                resolve_physical_chunks(self.cfg),
                dtype=self.model_dtype,
                transposed=self._transposed_mem(),
                block_len=tcfg.tgt_length, pin_layout=pin),
            _train_memory_shardings(self.mesh, self._transposed_mem()))

        it = self.dataset.train_iterator(
            tcfg.batch_size, tcfg.tgt_length, shuffle=True, seed=tcfg.seed)

        log_metrics = []
        log_tokens = 0
        log_start = time.time()
        step = int(self.state.step)

        # profiler trace over steps [4, 10) — past compile, short enough to
        # inspect (SURVEY §5: the reference has no profiling layer at all)
        profile_start, profile_stop = step + 4, step + 10

        for batch in it:
            if step >= max_step:
                break
            if self.profile and step == profile_start:
                jax.profiler.start_trace(str(self.ckpts.work_dir / "profile"))
            self.state, memory, metrics = self.train_step(
                self.state, memory, self._feed(batch.inputs),
                self._feed(batch.targets), self._feed(batch.reset),
                self.run_rng)
            log_metrics.append(metrics)
            log_tokens += batch.token_count
            step += 1
            if self.profile and step == profile_stop:
                jax.block_until_ready(metrics["nll_sum"])
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s",
                            self.ckpts.work_dir / "profile")

            if step % tcfg.log_interval == 0:
                nll_sum = float(sum(float(m["nll_sum"]) for m in log_metrics))
                tok = float(sum(float(m["token_count"]) for m in log_metrics))
                gnorm = float(np.mean([float(m["grad_norm"]) for m in log_metrics]))
                elapsed = time.time() - log_start
                nll = nll_sum / max(tok, 1.0)
                from .schedule import make_lr_schedule
                lr = float(make_lr_schedule(tcfg, self.num_devices)(step - 1))
                logger.info(
                    "Train Step %d/%d, lr=%f, tokens/s=%.1f, nll=%.4f, "
                    "ppl=%.2f, grad norm=%.4f",
                    step, max_step, lr, log_tokens / max(elapsed, 1e-9),
                    nll, math.exp(min(nll, 700.0)), gnorm)
                log_metrics, log_tokens = [], 0
                log_start = time.time()

            if step % tcfg.eval_interval == 0:
                t0 = time.time()
                val_tokens, val_nll_sum = self.evaluate("valid")
                val_nll = val_nll_sum / max(val_tokens, 1)
                logger.info("Eval step %d, time=%.1fs, val nll=%.4f, val ppl=%.2f",
                            step, time.time() - t0, val_nll,
                            math.exp(min(val_nll, 700.0)))
                # The reference's rank-0 save + barrier (train.py:20-26,50-54)
                # maps to a *collective* Orbax save: every process calls it
                # (Orbax runs its own cross-process barriers) and only the
                # primary host physically writes the replicated arrays.
                self.ckpts.save_last(self.state, self.best_val_nll)
                if val_nll < self.best_val_nll:
                    self.best_val_nll = val_nll
                    self.ckpts.save_best(self.state, self.best_val_nll)
                    t0 = time.time()
                    test_tokens, test_nll_sum = self.evaluate("test")
                    test_nll = test_nll_sum / max(test_tokens, 1)
                    logger.info(
                        "Test step %d, time=%.1fs, test nll=%.4f, test ppl=%.2f, "
                        "#evaluated tokens=%d",
                        step, time.time() - t0, test_nll,
                        math.exp(min(test_nll, 700.0)), test_tokens)
                log_start = time.time()

        logger.info("End of training")

    # ------------------------------------------------------------------
    def final_test(self) -> float:
        """Load checkpoint_best and run the test pass (train.py:486-514)."""
        if self.ckpts.has("checkpoint_best"):
            self.state, _ = self.ckpts.restore("checkpoint_best", self.state)
            if self.multiprocess:
                self.state = mh.replicate_to_global(self.mesh, self.state)
        tokens, nll_sum = self.evaluate("test")
        nll = nll_sum / max(tokens, 1)
        logger.info("End of training | test nll %5.2f | test ppl %9.3f",
                    nll, math.exp(min(nll, 700.0)))
        return nll
