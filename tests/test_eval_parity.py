"""End-to-end eval parity: Trainer.evaluate's total NLL over a corpus must
match the reference evaluation loop (torch model + reference eval_iterator,
same converted weights) — the val-NLL-parity north star in miniature."""
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commu_tpu.config import (EvaluateConfig, ModelConfig, TrainConfig,
                              TrainingConfig)
from commu_tpu.data.dataset import save_corpus
from commu_tpu.models import flax_params_from_torch_state
from commu_tpu.vocab.event_tokens import VOCAB_SIZE

from conftest import add_reference_to_path, reference_available

N_LAYER, N_HEAD, D_MODEL, D_INNER = 2, 2, 32, 48
CFG = TrainingConfig(
    model=ModelConfig(num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
                      inner_size=D_INNER, dropout=0.0, attention_dropout=0.0),
    train=TrainConfig(batch_size=4, batch_chunk=2, tgt_length=16, mem_length=32),
    evaluate=EvaluateConfig(batch_size=3, tgt_length=16, mem_length=32),
)


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    def seqs(n):
        metas = [rng.randint(560, 729, size=11).astype(np.int64) for _ in range(n)]
        events = [rng.randint(2, 560, size=rng.randint(20, 70)).astype(np.int64)
                  for _ in range(n)]
        return metas, events
    d = tmp_path / "npy"
    save_corpus(d, "train", *seqs(8))
    save_corpus(d, "val", *seqs(7))
    return d


@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
def test_eval_nll_matches_reference(corpus, tmp_path):
    add_reference_to_path()
    import torch
    from commu.model.dataset import ComMUDataset as RefDataset
    from commu.model.model import MemTransformerLM

    ecfg = CFG.evaluate
    ref_cfg = types.SimpleNamespace(
        MODEL=types.SimpleNamespace(
            num_layers=N_LAYER, num_heads=N_HEAD, units=D_MODEL,
            inner_size=D_INNER, dropout=0.0, attention_dropout=0.0,
            clamp_len=-1, same_length=False),
        TRAIN=types.SimpleNamespace(tgt_length=CFG.train.tgt_length,
                                    mem_length=CFG.train.mem_length),
    )
    torch.manual_seed(0)
    ref = MemTransformerLM(ref_cfg, vocab=list(range(VOCAB_SIZE)))
    ref.eval()

    # --- reference evaluation loop (train.py:74-110 semantics) ------------
    ref.reset_length(ecfg.tgt_length, ecfg.mem_length)
    ref.same_length = True
    ref_ds = RefDataset(str(corpus), None)
    total_tokens_ref = 0
    total_nll_ref = 0.0
    with torch.no_grad():
        mems = None
        for data, target, reset_all, tok in ref_ds.eval_iterator(
                ecfg.batch_size, ecfg.tgt_length, "cpu", split="valid")():
            if reset_all:
                mems = None
            loss, mems = ref(data, target, None, mems)
            loss = loss[target != 0].mean()
            total_nll_ref += tok * float(loss)
            total_tokens_ref += tok

    # --- our Trainer.evaluate with converted weights -----------------------
    from commu_tpu.training.loop import Trainer

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = flax_params_from_torch_state(state, CFG.model)
    trainer = Trainer(str(corpus), str(tmp_path / "work"), CFG, num_devices=1,
                      model_dtype=jnp.float32)
    trainer.state = trainer.state.replace(params=params)
    tokens, nll = trainer.evaluate("valid")

    assert tokens == total_tokens_ref
    np.testing.assert_allclose(nll, total_nll_ref, rtol=2e-4)
