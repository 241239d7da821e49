"""Multi-step TRAINING parity vs the reference's update semantics.

Mirrors the reference train loop (reference: train.py:113-169,440-461) in
torch — chunked backward with per-chunk XL memory streams, masked chunk-mean
loss, clip_grad_norm_(1.0), Adam(lr/num_gpus) + LambdaLR — feeds BOTH stacks
identical packed batches from identical converted weights, and compares the
resulting parameters after several optimizer steps.  This is the strongest
training-correctness evidence short of the full 20k-step run.
"""
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from commu_tpu.config import (EvaluateConfig, ModelConfig, TrainConfig,
                              TrainingConfig)
from commu_tpu.data.dataset import ComMUDataset, save_corpus
from commu_tpu.models import TransformerXL, flax_params_from_torch_state
from commu_tpu.models.convert import torch_state_from_flax_params
from commu_tpu.training.step import (create_train_state, init_train_memory,
                                     make_train_step)
from commu_tpu.vocab.event_tokens import VOCAB_SIZE

from conftest import add_reference_to_path, reference_available

N_LAYER, N_HEAD, D_MODEL, D_INNER = 2, 2, 32, 48
CFG = TrainingConfig(
    model=ModelConfig(num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
                      inner_size=D_INNER, dropout=0.0, attention_dropout=0.0),
    train=TrainConfig(batch_size=4, batch_chunk=2, tgt_length=16,
                      mem_length=32, lr=4e-3, lr_min=1e-4, warmup_step=3,
                      clip=1.0),
    evaluate=EvaluateConfig(batch_size=2, tgt_length=16, mem_length=32),
)
STEPS = 6


def _reference_weights_init(model, base_init=0.01, embed_init=0.01):
    """Mirror of the reference's weights_init pass (train.py:291-342,434).

    REQUIRED for determinism, not just fidelity: the reference model's
    ``_create_params`` allocates r_w_bias/r_r_bias with ``torch.Tensor(...)``
    — UNINITIALIZED memory (model.py:489-492).  Without this pass the tests
    inherit per-process allocator garbage in those biases (torch.manual_seed
    does not help), which made the long-horizon comparison flaky."""
    import torch.nn as nn

    def init_weight(w):
        nn.init.normal_(w, 0.0, base_init)

    def init_bias(b):
        nn.init.constant_(b, 0.0)

    def fn(m):
        cn = m.__class__.__name__
        if cn.find("Linear") != -1:
            if hasattr(m, "weight") and m.weight is not None:
                init_weight(m.weight)
            if hasattr(m, "bias") and m.bias is not None:
                init_bias(m.bias)
        elif cn.find("AdaptiveEmbedding") != -1:
            if hasattr(m, "emb_projs"):
                for p in m.emb_projs:
                    if p is not None:
                        nn.init.normal_(p, 0.0, embed_init)
        elif cn.find("Embedding") != -1:
            if hasattr(m, "weight"):
                init_weight(m.weight)
        elif cn.find("ProjectedAdaptiveLogSoftmax") != -1:
            if getattr(m, "cluster_weight", None) is not None:
                init_weight(m.cluster_weight)
            if getattr(m, "cluster_bias", None) is not None:
                init_bias(m.cluster_bias)
            if hasattr(m, "out_projs"):
                for p in m.out_projs:
                    if p is not None:
                        nn.init.normal_(p, 0.0, embed_init)
        elif cn.find("LayerNorm") != -1:
            if hasattr(m, "weight"):
                nn.init.normal_(m.weight, 1.0, base_init)
            if hasattr(m, "bias") and m.bias is not None:
                init_bias(m.bias)
        elif cn.find("TransformerLM") != -1:
            for name in ("r_emb", "r_w_bias", "r_r_bias"):
                if hasattr(m, name):
                    init_weight(getattr(m, name))
            if hasattr(m, "r_bias"):
                init_bias(m.r_bias)

    model.apply(fn)


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    def seqs(n):
        metas = [rng.randint(560, 729, size=11).astype(np.int64) for _ in range(n)]
        events = [rng.randint(2, 560, size=rng.randint(30, 80)).astype(np.int64)
                  for _ in range(n)]
        return metas, events
    d = tmp_path / "npy"
    save_corpus(d, "train", *seqs(12))
    save_corpus(d, "val", *seqs(4))
    return d


@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
def test_params_match_after_steps(corpus):
    add_reference_to_path()
    import torch
    from commu.model.model import MemTransformerLM

    tcfg = CFG.train
    ref_cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(
            num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
            inner_size=D_INNER, dropout=0.0, attention_dropout=0.0,
            clamp_len=-1, same_length=False),
        TRAIN=types.SimpleNamespace(tgt_length=tcfg.tgt_length,
                                    mem_length=tcfg.mem_length),
    )
    torch.manual_seed(0)
    ref = MemTransformerLM(ref_cfg, vocab=list(range(VOCAB_SIZE)))
    _reference_weights_init(ref)  # train.py:434 (also kills uninit garbage)
    ref.train()

    # identical starting weights
    state_np = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = flax_params_from_torch_state(state_np, CFG.model)

    # identical batch stream (one shared iterator, materialized)
    dataset = ComMUDataset(corpus)
    it = dataset.train_iterator(tcfg.batch_size, tcfg.tgt_length,
                                shuffle=True, seed=7)
    batches = [next(it) for _ in range(STEPS)]

    # ---- reference-mirror torch loop (train.py:113-169,440-461) ----------
    opt = torch.optim.Adam(ref.parameters(), lr=tcfg.lr)  # num_gpus == 1
    def lr_lambda(step):
        if step == 0 and tcfg.warmup_step == 0:
            return 1.0
        return (max((tcfg.warmup_step ** 0.5) / (step ** 0.5),
                    tcfg.lr_min / tcfg.lr)
                if step > tcfg.warmup_step else step / tcfg.warmup_step)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda)

    n_chunks = tcfg.batch_chunk
    mems = [None] * n_chunks
    ref_nll = []  # per-step nll-per-token, aggregated as train.py:148-153
    for batch in batches:
        opt.zero_grad()
        data = torch.from_numpy(batch.inputs.T.copy()).long()     # [T, B]
        target = torch.from_numpy(batch.targets.T.copy()).long()
        reset = torch.from_numpy(batch.reset.copy())
        d_ch = torch.chunk(data, n_chunks, 1)
        t_ch = torch.chunk(target, n_chunks, 1)
        r_ch = torch.chunk(reset, n_chunks, 0)
        nll_sum = 0.0
        for i in range(n_chunks):
            loss, mems[i] = ref(d_ch[i].contiguous(), t_ch[i].contiguous(),
                                r_ch[i].contiguous(), mems[i])
            n_tok = int((t_ch[i] != 0).sum())
            loss = loss[t_ch[i] != 0].float().mean() / n_chunks
            nll_sum += float(loss) * n_tok * n_chunks
            loss.backward()
        ref_nll.append(nll_sum / batch.token_count)
        torch.nn.utils.clip_grad_norm_(ref.parameters(), tcfg.clip)
        opt.step()
        sched.step()

    # ---- our stack --------------------------------------------------------
    model = TransformerXL(VOCAB_SIZE, CFG.model, dtype=jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, CFG)
    state = state.replace(params=params)
    step = jax.jit(make_train_step(model, CFG))
    memory = init_train_memory(N_LAYER, tcfg.batch_size, tcfg.mem_length,
                               D_MODEL, n_chunks)
    key = jax.random.PRNGKey(0)
    our_nll = []
    for batch in batches:
        state, memory, metrics = step(state, memory, batch.inputs,
                                      batch.targets, batch.reset, key)
        our_nll.append(float(metrics["nll_sum"]) / float(metrics["token_count"]))

    # The fp-stable signal: the per-step training nll trajectories must track
    # each other closely.  (Raw Adam parameter comparison is NOT stable —
    # elements with near-zero gradients get sign-amplified lr-sized updates
    # from 1e-7 gradient noise; raw gradients were verified to match to ~4e-7
    # relative.)
    np.testing.assert_allclose(our_nll, ref_nll, rtol=3e-3,
                               err_msg=f"nll trajectories diverged:\n"
                                       f"ours={our_nll}\nref={ref_nll}")

    # blow-up guard on params: a systematic gradient error would move weights
    # materially apart within a few steps
    ours_torch = torch_state_from_flax_params(
        jax.tree_util.tree_map(np.asarray, state.params), CFG.model)
    ref_state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    for name, ref_val in ref_state.items():
        if name not in ours_torch:  # torch buffers (pos_emb.inv_freq)
            continue
        np.testing.assert_allclose(
            ours_torch[name], ref_val, rtol=0.3, atol=STEPS * tcfg.lr,
            err_msg=f"param {name} blew apart after {STEPS} steps")


def _structured_corpus(tmp_path, n=64, seed=0):
    """Markov-chain event sequences: genuinely learnable, so the NLL curves
    FALL and the long-horizon comparison tests optimization dynamics, not
    noise-floor tracking."""
    rng = np.random.RandomState(seed)
    n_states = 40
    trans = np.zeros((n_states, n_states))
    for s in range(n_states):
        nxt = rng.choice(n_states, size=3, replace=False)
        trans[s, nxt] = rng.dirichlet([2.0] * 3)
    metas, events = [], []
    for _ in range(n):
        length = rng.randint(60, 120)
        s = rng.randint(n_states)
        seq = [2 + s]
        for _ in range(length - 1):
            s = rng.choice(n_states, p=trans[s])
            seq.append(2 + s)
        metas.append(rng.randint(560, 729, size=11).astype(np.int64))
        events.append(np.asarray(seq, dtype=np.int64))
    d = tmp_path / "npy_structured"
    save_corpus(d, "train", metas, events)
    save_corpus(d, "val", metas[:8], events[:8])
    return d


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
def test_long_horizon_nll_trajectories_track(tmp_path):
    """300-step torch-vs-jax f32 training on a structured corpus: both curves
    must fall together and stay within tight relative windows (VERDICT r1 #5
    — the long-horizon companion to the 6-step parity above)."""
    add_reference_to_path()
    import torch
    from commu.model.model import MemTransformerLM

    LONG_STEPS = 300
    tcfg = CFG.train
    corpus_dir = _structured_corpus(tmp_path)
    ref_cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(
            num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
            inner_size=D_INNER, dropout=0.0, attention_dropout=0.0,
            clamp_len=-1, same_length=False),
        TRAIN=types.SimpleNamespace(tgt_length=tcfg.tgt_length,
                                    mem_length=tcfg.mem_length),
    )
    torch.manual_seed(0)
    ref = MemTransformerLM(ref_cfg, vocab=list(range(VOCAB_SIZE)))
    _reference_weights_init(ref)  # train.py:434 (also kills uninit garbage)
    ref.train()
    state_np = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = flax_params_from_torch_state(state_np, CFG.model)

    dataset = ComMUDataset(corpus_dir)
    it = dataset.train_iterator(tcfg.batch_size, tcfg.tgt_length,
                                shuffle=True, seed=11)
    batches = [next(it) for _ in range(LONG_STEPS)]

    opt = torch.optim.Adam(ref.parameters(), lr=tcfg.lr)
    def lr_lambda(step):
        if step == 0 and tcfg.warmup_step == 0:
            return 1.0
        return (max((tcfg.warmup_step ** 0.5) / (step ** 0.5),
                    tcfg.lr_min / tcfg.lr)
                if step > tcfg.warmup_step else step / tcfg.warmup_step)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lr_lambda)
    n_chunks = tcfg.batch_chunk
    mems = [None] * n_chunks
    ref_nll = []
    for batch in batches:
        opt.zero_grad()
        data = torch.from_numpy(batch.inputs.T.copy()).long()
        target = torch.from_numpy(batch.targets.T.copy()).long()
        reset = torch.from_numpy(batch.reset.copy())
        d_ch = torch.chunk(data, n_chunks, 1)
        t_ch = torch.chunk(target, n_chunks, 1)
        r_ch = torch.chunk(reset, n_chunks, 0)
        nll_sum = 0.0
        for i in range(n_chunks):
            loss, mems[i] = ref(d_ch[i].contiguous(), t_ch[i].contiguous(),
                                r_ch[i].contiguous(), mems[i])
            n_tok = int((t_ch[i] != 0).sum())
            loss = loss[t_ch[i] != 0].float().mean() / n_chunks
            nll_sum += float(loss) * n_tok * n_chunks
            loss.backward()
        ref_nll.append(nll_sum / batch.token_count)
        torch.nn.utils.clip_grad_norm_(ref.parameters(), tcfg.clip)
        opt.step()
        sched.step()

    model = TransformerXL(VOCAB_SIZE, CFG.model, dtype=jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, CFG)
    state = state.replace(params=params)
    step = jax.jit(make_train_step(model, CFG))
    memory = init_train_memory(N_LAYER, tcfg.batch_size, tcfg.mem_length,
                               D_MODEL, n_chunks)
    key = jax.random.PRNGKey(0)
    our_nll = []
    for batch in batches:
        state, memory, metrics = step(state, memory, batch.inputs,
                                      batch.targets, batch.reset, key)
        our_nll.append(float(metrics["nll_sum"]) /
                       float(metrics["token_count"]))

    our_nll, ref_nll = np.asarray(our_nll), np.asarray(ref_nll)
    # Reference quirk: a batch chunk whose 16-token window is entirely pad
    # makes the mirror's loss[empty].mean() NaN (train.py:148-153 semantics).
    # The NaN is log-only — no elements select into the backward, so grads
    # stay finite — and our masked-sum nll has no such hazard.  Exclude those
    # rare steps from the comparison on both sides.
    valid = np.isfinite(ref_nll)
    assert valid.mean() > 0.97, f"too many empty-chunk steps: {valid.sum()}"
    assert np.isfinite(our_nll).all()
    # both learned: the structured corpus is compressible well below the
    # initial ~uniform NLL
    assert our_nll[-20:].mean() < 0.55 * our_nll[:5].mean()
    assert ref_nll[valid][-20:].mean() < 0.55 * ref_nll[valid][:5].mean()
    # windowed curves track (independent fp noise compounds over 300 steps;
    # the 25-step means must stay within 2%)
    w = 25
    masked_our = np.where(valid, our_nll, 0.0).reshape(-1, w)
    masked_ref = np.where(valid, ref_nll, 0.0).reshape(-1, w)
    counts = valid.reshape(-1, w).sum(axis=1)
    ours_w = masked_our.sum(axis=1) / counts
    ref_w = masked_ref.sum(axis=1) / counts
    np.testing.assert_allclose(ours_w, ref_w, rtol=0.02,
                               err_msg=f"windowed NLL diverged:\n"
                                       f"ours={ours_w}\nref={ref_w}")
    # final converged level within 1%
    tail = valid[-50:]
    assert abs(our_nll[-50:][tail].mean() - ref_nll[-50:][tail].mean()) \
        / ref_nll[-50:][tail].mean() < 0.01
