"""Train-step tests: schedule parity vs torch, loss semantics, clip parity,
mesh-vs-single-device equivalence, resume round-trip."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commu_tpu.config import (EvaluateConfig, ModelConfig, TrainConfig,
                              TrainingConfig)
from commu_tpu.models.transformer_xl import TransformerXL, init_memory
from commu_tpu.parallel import make_mesh, shard_train_step
from commu_tpu.training.schedule import make_lr_schedule
from commu_tpu.training.step import (chunked_masked_nll, create_train_state,
                                     init_train_memory, make_train_step,
                                     _clip_by_global_norm)
from commu_tpu.vocab.event_tokens import PAD_ID

TINY = TrainingConfig(
    model=ModelConfig(num_layers=2, num_heads=2, units=32, inner_size=64,
                      dropout=0.0, attention_dropout=0.0),
    train=TrainConfig(batch_size=8, batch_chunk=2, tgt_length=12,
                      mem_length=16, lr=8e-3, warmup_step=5, max_step=50),
    evaluate=EvaluateConfig(batch_size=4, tgt_length=12, mem_length=24),
)
VOCAB = 40


def _batch(rng, batch=8, t=12):
    inputs = rng.randint(1, VOCAB, size=(batch, t)).astype(np.int32)
    targets = rng.randint(1, VOCAB, size=(batch, t)).astype(np.int32)
    targets[:, -2:] = PAD_ID  # some padding
    reset = np.zeros(batch, dtype=bool)
    return inputs, targets, reset


def test_schedule_matches_torch_lambdalr():
    import torch

    for warmup in (0, 5, 100):
        cfg = TrainConfig(lr=4e-3, lr_min=1e-4, warmup_step=warmup)
        for n_dev in (1, 4):
            sched = make_lr_schedule(cfg, n_dev)
            # the reference's lambda (train.py:448-461)
            def lr_lambda(step):
                if step == 0 and warmup == 0:
                    return 1.0
                return (max((warmup ** 0.5) / (step ** 0.5), cfg.lr_min / cfg.lr)
                        if step > warmup else step / warmup)
            opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))],
                                   lr=cfg.lr / n_dev)
            scheduler = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda)
            for count in range(0, 250, 7):
                # LambdaLR sets lr = base * lambda(epoch); epoch == update count
                while scheduler.last_epoch < count:
                    scheduler.step()
                torch_lr = opt.param_groups[0]["lr"]
                ours = float(sched(count))
                assert math.isclose(ours, torch_lr, rel_tol=1e-6, abs_tol=1e-12), (
                    warmup, n_dev, count, ours, torch_lr)


def test_clip_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    grads = {"a": rng.randn(7, 3).astype(np.float32),
             "b": rng.randn(11).astype(np.float32) * 10}
    for max_norm in (0.5, 1.0, 100.0):
        t = [torch.nn.Parameter(torch.from_numpy(v.copy())) for v in grads.values()]
        for p in t:
            p.grad = p.detach().clone()
        norm_t = torch.nn.utils.clip_grad_norm_(t, max_norm)
        clipped, norm = _clip_by_global_norm(
            jax.tree_util.tree_map(jnp.asarray, grads), max_norm)
        assert math.isclose(float(norm), float(norm_t), rel_tol=1e-5)
        np.testing.assert_allclose(np.asarray(clipped["a"]),
                                   t[0].grad.numpy(), rtol=1e-5)


def test_chunked_loss_equals_mean_of_chunk_means():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(8, 12, VOCAB).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, VOCAB, size=(8, 12)).astype(np.int32))
    loss, nll_sum, tok = chunked_masked_nll(logits, targets, 4)
    # brute force
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -np.take_along_axis(np.asarray(logp), np.asarray(targets)[..., None],
                              axis=-1)[..., 0]
    mask = np.asarray(targets) != PAD_ID
    means = [nll[i*2:(i+1)*2][mask[i*2:(i+1)*2]].mean() for i in range(4)]
    assert math.isclose(float(loss), float(np.mean(means)), rel_tol=1e-5)
    assert math.isclose(float(nll_sum), float(nll[mask].sum()), rel_tol=1e-5)
    assert float(tok) == mask.sum()


def test_train_step_learns():
    model = TransformerXL(VOCAB, TINY.model, dtype=jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, TINY)
    step = jax.jit(make_train_step(model, TINY))
    zero_memory = init_train_memory(TINY.model.num_layers, 8,
                                    TINY.train.mem_length, TINY.model.units,
                                    TINY.train.batch_chunk)
    rng = np.random.RandomState(0)
    fixed = _batch(rng)  # overfit one batch (fresh memory each step)
    key = jax.random.PRNGKey(1)
    first = last = None
    for i in range(120):
        state, _, metrics = step(state, zero_memory, *fixed, key)
        nll = float(metrics["nll_sum"]) / float(metrics["token_count"])
        if i == 0:
            first = nll
        last = nll
    assert last < first * 0.7, (first, last)


def test_mesh_step_matches_single_device():
    """The pjit'd DP step over the virtual 8-device mesh produces the same
    params/metrics as the plain single-device step."""
    model = TransformerXL(VOCAB, TINY.model, dtype=jnp.float32)
    raw_step = make_train_step(model, TINY)

    state1 = create_train_state(jax.random.PRNGKey(0), model, TINY)
    state8 = create_train_state(jax.random.PRNGKey(0), model, TINY)
    # 4 devices: each chunk's 4 rows shard evenly over the mesh
    mesh = make_mesh(4)
    step1 = jax.jit(raw_step)
    step8 = shard_train_step(raw_step, mesh)

    mem1 = init_train_memory(TINY.model.num_layers, 8, TINY.train.mem_length,
                             TINY.model.units, TINY.train.batch_chunk)
    mem8 = init_train_memory(TINY.model.num_layers, 8, TINY.train.mem_length,
                             TINY.model.units, TINY.train.batch_chunk)
    rng = np.random.RandomState(7)
    key = jax.random.PRNGKey(2)
    for _ in range(3):
        batch = _batch(rng)
        state1, mem1, m1 = step1(state1, mem1, *batch, key)
        state8, mem8, m8 = step8(state8, mem8, *batch, key)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    assert math.isclose(float(m1["nll_sum"]), float(m8["nll_sum"]),
                        rel_tol=1e-4)


def test_manual_mesh_step_matches_single_device_pallas_transposed():
    """The PRODUCTION multi-chip layout: pallas kernels (interpret mode on
    CPU), transposed blocked-ring TrainMemory, manual SPMD via shard_map with
    explicit grad pmean — vs the plain single-device pallas jit step.

    Also asserts the scaling property that motivates the manual path: the
    compiled module contains NO all-gather (the automatic partitioner
    all-gathers the batch around a pallas call, replicating all compute on
    every device)."""
    import re

    from commu_tpu.parallel.mesh import DATA_AXIS
    from commu_tpu.training.step import resolve_physical_chunks

    cfg = TrainingConfig(
        model=ModelConfig(num_layers=2, num_heads=2, units=32, inner_size=64,
                          dropout=0.0, attention_dropout=0.0,
                          attn_impl="pallas"),
        train=TrainConfig(batch_size=8, batch_chunk=2, tgt_length=16,
                          mem_length=32, lr=8e-3, warmup_step=5, max_step=50),
        evaluate=EvaluateConfig(batch_size=8, tgt_length=16, mem_length=32),
    )
    model = TransformerXL(VOCAB, cfg.model, dtype=jnp.float32)
    physical = resolve_physical_chunks(cfg)

    def mk_mem():
        return init_train_memory(cfg.model.num_layers, 8, cfg.train.mem_length,
                                 cfg.model.units, physical, transposed=True,
                                 block_len=cfg.train.tgt_length)

    state1 = create_train_state(jax.random.PRNGKey(0), model, cfg)
    state4 = create_train_state(jax.random.PRNGKey(0), model, cfg)
    step1 = jax.jit(make_train_step(model, cfg, physical_chunks=physical))
    mesh = make_mesh(4)
    step4 = shard_train_step(
        make_train_step(model, cfg, physical_chunks=physical,
                        axis_name=DATA_AXIS),
        mesh, transposed=True, manual=True)
    mem1, mem4 = mk_mem(), mk_mem()

    rng = np.random.RandomState(11)
    key = jax.random.PRNGKey(2)
    first = _batch(rng, t=16)

    txt = step4.lower(state4, mem4, *first, key).compile().as_text()
    assert not re.findall(r"all-gather", txt)
    assert re.findall(r"all-reduce", txt)  # the grad pmean / metric psums

    batch = first
    for i in range(3):
        state1, mem1, m1 = step1(state1, mem1, *batch, key)
        state4, mem4, m4 = step4(state4, mem4, *batch, key)
        batch = _batch(rng, t=16)
    assert math.isclose(float(m1["nll_sum"]), float(m4["nll_sum"]),
                        rel_tol=1e-5)
    assert float(m1["token_count"]) == float(m4["token_count"])
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mem1.hidden), np.asarray(mem4.hidden),
                               rtol=2e-4, atol=2e-5)


def test_manual_mesh_eval_matches_single_device_pallas_transposed():
    """Manual-SPMD eval step (psum'd sums) over the blocked-ring Memory vs
    the single-device eval step."""
    from commu_tpu.parallel import shard_eval_step
    from commu_tpu.parallel.mesh import DATA_AXIS
    from commu_tpu.training.step import make_eval_step

    cfg_m = ModelConfig(num_layers=2, num_heads=2, units=32, inner_size=64,
                        dropout=0.0, attention_dropout=0.0,
                        attn_impl="pallas")
    tcfg = TrainingConfig(model=cfg_m)
    model = TransformerXL(VOCAB, cfg_m, dtype=jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg)

    def mk_mem():
        return init_memory(cfg_m.num_layers, 8, 32, cfg_m.units,
                           transposed=True, block_len=16)

    ev1 = jax.jit(make_eval_step(model, same_length=True))
    mesh = make_mesh(4)
    ev4 = shard_eval_step(
        make_eval_step(model, same_length=True, axis_name=DATA_AXIS),
        mesh, transposed=True, manual=True)

    rng = np.random.RandomState(5)
    mem1, mem4 = mk_mem(), mk_mem()
    for _ in range(2):
        inputs, targets, reset = _batch(rng, t=16)
        n1, t1, mem1 = ev1(state.params, mem1, inputs, targets, reset)
        n4, t4, mem4 = ev4(state.params, mem4, inputs, targets, reset)
        assert math.isclose(float(n1), float(n4), rel_tol=1e-5)
        assert float(t1) == float(t4)


def test_checkpoint_resume_roundtrip(tmp_path):
    from commu_tpu.training.checkpoint import CheckpointManager

    model = TransformerXL(VOCAB, TINY.model, dtype=jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, TINY)
    step = jax.jit(make_train_step(model, TINY))
    memory = init_train_memory(TINY.model.num_layers, 8,
                               TINY.train.mem_length, TINY.model.units,
                               TINY.train.batch_chunk)
    rng = np.random.RandomState(3)
    key = jax.random.PRNGKey(4)
    for _ in range(3):
        state, memory, _ = step(state, memory, *_batch(rng), key)

    mgr = CheckpointManager(tmp_path)
    mgr.save_last(state, 1.25)
    template = create_train_state(jax.random.PRNGKey(9), model, TINY)
    restored, best = mgr.restore("checkpoint_last", template)
    assert best == 1.25
    assert int(restored.step) == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored state can keep training
    state2, _, _ = step(restored, memory, *_batch(rng), key)
    assert int(state2.step) == 4


def test_torch_checkpoint_roundtrip(tmp_path):
    from commu_tpu.training.checkpoint import export_torch, import_torch

    cfg = TINY.model
    model = TransformerXL(VOCAB, cfg, dtype=jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, TINY)
    path = tmp_path / "ckpt.pt"
    export_torch(state.params, path, step=5, cfg=cfg)
    params2 = import_torch(path, cfg)
    flat1 = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])
    flat2 = dict(jax.tree_util.tree_flatten_with_path(params2)[0])
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_allclose(np.asarray(flat1[k]), flat2[k], atol=1e-7)


def test_transposed_blocked_ring_memory_matches_xla():
    """The production memory layout (blocked D-major ring, pallas path, one
    physical micro-batch) must produce the same per-step losses, grad norms
    and memory contents as the dense XLA path with reference chunking."""
    import dataclasses

    from commu_tpu.models.transformer_xl import Memory, logical_memory_view

    cfg_x = TrainingConfig(
        model=ModelConfig(num_layers=2, num_heads=2, units=32, inner_size=64,
                          dropout=0.0, attention_dropout=0.0, attn_impl="xla"),
        train=TrainConfig(batch_size=4, batch_chunk=2, tgt_length=8,
                          mem_length=24, lr=1e-3, warmup_step=5, max_step=50),
        evaluate=EvaluateConfig(batch_size=4, tgt_length=8, mem_length=24),
    )
    cfg_p = dataclasses.replace(
        cfg_x, model=dataclasses.replace(cfg_x.model, attn_impl="pallas"))
    model_x = TransformerXL(VOCAB, cfg_x.model)
    model_p = TransformerXL(VOCAB, cfg_p.model)
    state_x = create_train_state(jax.random.PRNGKey(0), model_x, cfg_x)
    state_p = state_x  # params are impl-independent

    step_x = make_train_step(model_x, cfg_x)
    step_p = make_train_step(model_p, cfg_p, physical_chunks=1)
    mem_x = init_train_memory(2, 4, 24, 32, cfg_x.train.batch_chunk)
    mem_p = init_train_memory(2, 4, 24, 32, 1, transposed=True, block_len=8)
    assert mem_p.hidden.shape == (1, 3, 3, 4, 32, 8)  # [C, L+1, R, B, D, T]

    rng = np.random.RandomState(7)
    key = jax.random.PRNGKey(1)
    for step in range(5):  # count 8 -> 16 -> 24 (full) -> ring wrap x2
        inputs, targets, reset = _batch(rng, batch=4, t=8)
        if step == 3:
            reset[1] = True
        state_x, mem_x, met_x = step_x(state_x, mem_x, inputs, targets,
                                       reset, key)
        state_p, mem_p, met_p = step_p(state_p, mem_p, inputs, targets,
                                       reset, key)
        np.testing.assert_allclose(float(met_p["nll_sum"]),
                                   float(met_x["nll_sum"]),
                                   rtol=1e-5, err_msg=f"step {step}")
        np.testing.assert_allclose(float(met_p["grad_norm"]),
                                   float(met_x["grad_norm"]),
                                   rtol=1e-4, err_msg=f"step {step}")

        # memory contents: dense right-aligned vs blocked ring, valid region
        dense = Memory(
            hidden=jnp.moveaxis(mem_x.hidden, 0, 1).reshape(3, 4, 24, 32),
            count=mem_x.count, head=mem_x.head)
        blocked = Memory(hidden=mem_p.hidden[0], count=mem_p.count,
                         head=mem_p.head, transposed=True)
        valid = int(mem_x.count)
        vx = np.asarray(logical_memory_view(dense))[:, :, 24 - valid:]
        vp = np.asarray(logical_memory_view(blocked))[:, :, 24 - valid:]
        np.testing.assert_allclose(vp, vx, rtol=2e-4, atol=2e-5,
                                   err_msg=f"step {step}")
        assert int(mem_p.count) == int(mem_x.count)
