"""Generation pipeline e2e: checkpoint load (orbax + .pt), batched jit
sampling, postprocess to .mid files on disk."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from commu_tpu.config import (EvaluateConfig, InferenceConfig, ModelConfig,
                              TrainConfig, TrainingConfig)
from commu_tpu.generation import jit_sampler
from commu_tpu.generation.container import GenerationInput
from commu_tpu.generation.pipeline import MidiGenerationPipeline, load_params
from commu_tpu.midi import MidiFile
from commu_tpu.models.transformer_xl import TransformerXL, init_memory
from commu_tpu.training.checkpoint import CheckpointManager, export_torch
from commu_tpu.training.step import create_train_state
from commu_tpu.vocab.event_tokens import VOCAB_SIZE

MCFG = ModelConfig(num_layers=2, num_heads=2, units=32, inner_size=64,
                   same_length=True)
TINY = TrainingConfig(model=MCFG,
                      train=TrainConfig(batch_size=4, batch_chunk=2,
                                        tgt_length=8, mem_length=16),
                      evaluate=EvaluateConfig(batch_size=2, tgt_length=8,
                                              mem_length=16))
ICFG = InferenceConfig(memory_length=256, generation_length=64)


@pytest.fixture()
def ckpt_dir(tmp_path):
    model = TransformerXL(VOCAB_SIZE, MCFG, dtype=jnp.float32)
    state = create_train_state(jax.random.PRNGKey(0), model, TINY)
    mgr = CheckpointManager(tmp_path / "work")
    mgr.save_best(state, 1.0)
    export_torch(state.params, tmp_path / "work" / "ref.pt", cfg=MCFG)
    return tmp_path / "work"


def _input(tmp_path, num_generate=2):
    return GenerationInput(
        bpm=70, audio_key="aminor", time_signature="4/4", pitch_range="mid",
        num_measures=4.0, inst="acoustic_piano", genre="newage",
        min_velocity=60, max_velocity=80, track_role="main_melody",
        rhythm="standard", output_dir=str(tmp_path / "out"),
        num_generate=num_generate, top_k=32, temperature=0.95,
        chord_progression=["c"] * 32)


def test_load_params_orbax_and_pt(ckpt_dir):
    p1 = load_params(str(ckpt_dir / "checkpoint_best"), MCFG)
    p2 = load_params(str(ckpt_dir / "ref.pt"), MCFG)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pipeline_end_to_end(ckpt_dir, tmp_path, monkeypatch):
    # random weights rarely pass musical validation — accept all sequences so
    # the plumbing (sampler -> postprocess -> .mid) is what's under test
    monkeypatch.setattr(jit_sampler, "_validate", lambda *a, **k: True)
    pipeline = MidiGenerationPipeline(str(ckpt_dir / "checkpoint_best"),
                                      model_cfg=MCFG, inference_cfg=ICFG,
                                      sampler="jit")
    input_data = _input(tmp_path)
    out = pipeline.run(input_data, seed=0)
    files = sorted(out.rglob("*.mid"))
    assert len(files) == 2
    assert files[0].name == "main_melody_acoustic_piano_mid_000.mid"
    midi = MidiFile(str(files[0]))  # decodable standard MIDI
    assert midi.ticks_per_beat > 0


def test_execute_batch_heterogeneous(ckpt_dir, tmp_path, monkeypatch):
    monkeypatch.setattr(jit_sampler, "_validate", lambda *a, **k: True)
    params = load_params(str(ckpt_dir / "checkpoint_best"), MCFG)
    model = TransformerXL(VOCAB_SIZE, MCFG, dtype=jnp.float32)
    from commu_tpu.vocab.meta_codec import encode_meta

    inputs = [
        _input(tmp_path, num_generate=1),
        dataclasses.replace(_input(tmp_path, num_generate=1), bpm=130,
                            chord_progression=(["c"] * 4 + ["g"] * 4) * 4),
    ]
    metas = [encode_meta(i.midi_meta()) for i in inputs]
    results = jit_sampler.execute_batch(model, params, MCFG, ICFG, inputs,
                                        metas, seed=0)
    assert len(results) == 2
    for seq, meta in zip(results, metas):
        assert seq is not None
        assert seq[1:12] == list(meta)
