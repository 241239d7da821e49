"""Generation edge cases: input validation, retry exhaustion, teacher checks."""
import dataclasses

import numpy as np
import pytest

from commu_tpu.generation.container import GenerationInput
from commu_tpu.generation.teacher import TeacherForcer, validate_generated_sequence
from commu_tpu.vocab.event_tokens import TokenOffset

POS = int(TokenOffset.POSITION)


def _input(chords, num_measures=4.0, **kw):
    base = dict(bpm=70, audio_key="aminor", time_signature="4/4",
                pitch_range="mid", num_measures=num_measures,
                inst="acoustic_piano", genre="newage", min_velocity=60,
                max_velocity=80, track_role="main_melody", rhythm="standard",
                output_dir="/tmp", num_generate=1, top_k=32, temperature=0.95,
                chord_progression=chords)
    base.update(kw)
    return GenerationInput(**base)


def test_chord_length_validation():
    """(reference: container.py:25-33) floor4(measures) * ts * 8 chords."""
    _input(["C"] * 32)  # 4 measures x 4/4 -> 32: ok
    with pytest.raises(ValueError):
        _input(["C"] * 31)
    # incomplete measure: floor to multiple of 4
    _input(["C"] * 32, num_measures=5.0)
    # 6/8: Fraction("6/8") * 8 = 6 chords per measure
    _input(["C"] * 24, time_signature="6/8")
    with pytest.raises(ValueError):
        _input(["C"] * 32, time_signature="6/8")


def test_chord_token_components_positions():
    inp = _input((["C"] * 4 + ["G"] * 4) * 4)
    comps = inp.chord_token_components
    # 2 chords per bar x 4 bars; first at Position_1/128 (432), second mid-bar
    assert len(comps["chord_token"]) == 8
    assert comps["chord_position"][0] == POS
    assert comps["chord_position"][1] == POS + 64  # half-bar: 0.5 * 128


def test_teacher_validation_errors():
    inp = _input(["C"] * 32)
    teacher = TeacherForcer(inp)
    # remnant chords -> error
    with pytest.raises(ValueError, match="remnant"):
        teacher.validate_teacher_forced_sequence([2, 432, 1])
    # consume all chords, then wrong bar count
    for _ in range(4):
        teacher.teach_chord_token()
    with pytest.raises(ValueError, match="bar length"):
        teacher.validate_teacher_forced_sequence([2, 432, 1])


def test_validate_generated_sequence_needs_note_quad():
    # Position, Velocity, Pitch, Duration in order = one valid note
    quad = [432, 140, 60, 350]
    assert validate_generated_sequence([2] + quad + [1])
    assert not validate_generated_sequence([2, 432, 140, 1])   # truncated
    assert not validate_generated_sequence([2, 140, 60, 350])  # no position


def test_incomplete_measure_flags():
    inp = _input(["C"] * 32, num_measures=5.0)
    teacher = TeacherForcer(inp)
    assert teacher.is_incomplete and not teacher.incomplete_filled
    inp2 = _input(["C"] * 32, num_measures=4.0)
    assert not TeacherForcer(inp2).is_incomplete


def test_from_dict_splits_chord_string():
    inp = GenerationInput.from_dict(dict(
        bpm=70, audio_key="aminor", time_signature="4/4", pitch_range="mid",
        num_measures=4.0, inst="acoustic_piano", genre="newage",
        min_velocity=60, max_velocity=80, track_role="main_melody",
        rhythm="standard", chord_progression="-".join(["Am"] * 32)))
    assert inp.chord_progression == ["Am"] * 32


def test_config_snapshot_round_trip(tmp_path):
    """to_yaml -> load_config_snapshot recovers every field exactly."""
    from commu_tpu.config import (TrainingConfig, load_config_snapshot,
                                  get_default_cfg_training)
    cfg = get_default_cfg_training()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, num_layers=2, num_heads=2,
                                  units=64, inner_size=128, same_length=True,
                                  attn_impl="xla"),
        train=dataclasses.replace(cfg.train, lr=0.001, max_step=7))
    path = tmp_path / "config.yml"
    path.write_text(cfg.to_yaml())
    assert load_config_snapshot(path) == cfg


def test_pipeline_model_cfg_from_snapshot(tmp_path):
    """Generation picks up the work-dir config.yml (the reference locates but
    never parses it — model_initializer.py:25-34)."""
    from commu_tpu.config import get_default_cfg_training
    from commu_tpu.generation.pipeline import _model_cfg_for_checkpoint
    cfg = get_default_cfg_training()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, units=64,
                                                num_heads=2))
    (tmp_path / "config.yml").write_text(cfg.to_yaml())
    ckpt = tmp_path / "checkpoint_best"
    ckpt.mkdir()
    got = _model_cfg_for_checkpoint(str(ckpt))
    assert got.units == 64 and got.num_heads == 2 and got.same_length
    # no snapshot -> reference defaults
    default = _model_cfg_for_checkpoint(str(tmp_path / "nope"))
    assert default.units == 500 and default.same_length


def test_sample_from_logits_writable_and_inplace_temper():
    """Logits buffer must be mutated in place (reference quirk,
    midi_inferrer.py:216) — and a fresh device-array copy must be writable."""
    from commu_tpu.generation.host_sampler import sample_from_logits
    rng = np.random.default_rng(0)
    logits = np.linspace(-1.0, 1.0, 16, dtype=np.float32)
    before = logits.copy()
    sample_from_logits(logits, 0.5, 4, [], rng)
    np.testing.assert_allclose(logits, before / 0.5)
