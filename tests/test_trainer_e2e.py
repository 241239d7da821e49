"""End-to-end Trainer smoke: tiny corpus -> train -> eval -> checkpoint ->
resume -> final test, exercising the full library path used by train.py."""
import jax.numpy as jnp
import numpy as np
import pytest

from commu_tpu.config import (EvaluateConfig, ModelConfig, TrainConfig,
                              TrainingConfig)
from commu_tpu.data.dataset import save_corpus


@pytest.fixture()
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    def seqs(n):
        metas, events = [], []
        for _ in range(n):
            metas.append(rng.randint(560, 729, size=11).astype(np.int64))
            events.append(rng.randint(2, 560, size=rng.randint(20, 60)).astype(np.int64))
        return metas, events
    d = tmp_path / "npy"
    save_corpus(d, "train", *seqs(20))
    save_corpus(d, "val", *seqs(6))
    return d


CFG = TrainingConfig(
    model=ModelConfig(num_layers=2, num_heads=2, units=32, inner_size=64),
    train=TrainConfig(batch_size=8, batch_chunk=2, tgt_length=16,
                      mem_length=32, lr=1e-3, warmup_step=2, max_step=6,
                      log_interval=2, eval_interval=3),
    evaluate=EvaluateConfig(batch_size=4, tgt_length=16, mem_length=32),
)


def test_trainer_end_to_end(corpus, tmp_path):
    from commu_tpu.training.loop import Trainer

    work = tmp_path / "work"
    tr = Trainer(str(corpus), str(work), CFG, num_devices=2,
                 model_dtype=jnp.float32)
    tr.train()
    assert int(tr.state.step) == 6
    assert tr.ckpts.has("checkpoint_last")
    assert tr.ckpts.has("checkpoint_best")
    assert (work / "config.yml").exists()
    nll = tr.final_test()
    assert np.isfinite(nll) and nll > 0

    # resume continues from step 6
    tr2 = Trainer(str(corpus), str(work), CFG, num_devices=2,
                  model_dtype=jnp.float32)
    assert tr2.maybe_resume()
    assert int(tr2.state.step) == 6
    tr2.train(max_step=8)
    assert int(tr2.state.step) == 8
