"""Preprocess pipeline tests: augmentation fan-out, full pipeline output
layout, and consistency of emitted token streams with direct encoding."""
import math
from pathlib import Path

import numpy as np
import pytest

from commu_tpu.midi import MidiFile
from commu_tpu.preprocess import augment
from commu_tpu.preprocess.pipeline import PreprocessPipeline
from commu_tpu.preprocess.preprocessor import concat_npy, preprocess_midi
from commu_tpu.utils.chords import sync_key_augment
from commu_tpu.utils.constants import KEY_NUM_MAP
from commu_tpu.vocab.event_tokens import EOS_ID

from helpers import make_commu_midi, make_sample_info


def test_augment_by_key_transposes(tmp_path):
    src = tmp_path / "commu00001.mid"
    make_commu_midi(src, key_number=0)  # cmajor
    out = augment.augment_by_key(str(src), str(tmp_path), 3)
    # KEY_NUM_MAP[3] == "ebmajor" (flat spelling wins, constants.py KEY_MAP order)
    assert out is not None and out.endswith("_ebmajor.mid")
    orig = MidiFile(str(src))
    shifted = MidiFile(out)
    assert shifted.key_signature_changes[0].key_number == 3
    for a, b in zip(orig.instruments[0].notes, shifted.instruments[0].notes):
        assert b.pitch == a.pitch + 3


def test_augment_by_key_wraps_minor(tmp_path):
    src = tmp_path / "commu00002.mid"
    make_commu_midi(src, key_number=21)  # aminor
    out = augment.augment_by_key(str(src), str(tmp_path), 4)
    # (21-12)+4 = 13 -> MINOR_KEY[13-12] -> key 13 -> "dbminor" (flat wins)
    assert out is not None and out.endswith("_dbminor.mid")
    assert MidiFile(out).key_signature_changes[0].key_number == 13


def test_augment_by_key_rejects_out_of_range(tmp_path):
    src = tmp_path / "commu00003.mid"
    midi = make_commu_midi(src)
    midi.instruments[0].notes[0].pitch = 126
    midi.dump(src)
    assert augment.augment_by_key(str(src), str(tmp_path), 3) is None


def test_augment_by_bpm_rewrites_tempo(tmp_path):
    src = tmp_path / "commu00004_cmajor.mid"
    make_commu_midi(src, bpm=70)
    augment.augment_by_bpm(str(src), str(tmp_path), -2)
    out = MidiFile(str(tmp_path / "commu00004_cmajor_60.mid"))
    assert round(out.tempo_changes[0].tempo) == 60
    assert len(out.tempo_changes) == 1


def _build_corpus(tmp_path, n_train=2, n_val=1):
    root = tmp_path / "dataset"
    rows = []
    idx = 0
    for split, n in (("train", n_train), ("val", n_val)):
        raw = root / split / "raw"
        raw.mkdir(parents=True)
        for _ in range(n):
            idx += 1
            sid = f"commu{idx:05d}"
            info = make_sample_info(num_measures=4, seed=idx)
            info["id"] = sid
            # csv columns: the sample_info fields the reference csv carries
            rows.append(info)
            make_commu_midi(raw / f"{sid}.mid", bpm=info["bpm"],
                            num_measures=4, key_number=0, seed=idx)
    import pandas as pd
    df = pd.DataFrame([{
        "id": r["id"], "bpm": r["bpm"], "audio_key": r["audio_key"],
        "chord_progressions": repr(r["chord_progressions"]),
        "time_signature": r["time_signature"],
        "pitch_range": r["pitch_range"], "num_measures": r["num_measures"],
        "inst": r["inst"], "genre": r["genre"],
        "min_velocity": r["min_velocity"], "max_velocity": r["max_velocity"],
        "track_role": r["track_role"], "rhythm": r["rhythm"],
        "sample_rhythm": r["sample_rhythm"],
    } for r in rows])
    csv_path = root / "meta.csv"
    df.to_csv(csv_path, index=False)
    return root, csv_path, rows


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    root, csv_path, rows = _build_corpus(tmp_path)
    PreprocessPipeline()(root_dir=root, csv_path=csv_path, num_cores=1)

    out = root / "output_npy"
    for split, n_src in (("train", 2), ("val", 1)):
        inputs = np.load(out / f"input_{split}.npy", allow_pickle=True)
        targets = np.load(out / f"target_{split}.npy", allow_pickle=True)
        assert inputs.dtype == object and targets.dtype == object
        assert len(inputs) == len(targets)
        # 12 keys x 5 bpm per source (synthetic melodies stay in range)
        assert len(inputs) == n_src * 60
        for meta, events in zip(inputs, targets):
            assert len(meta) == 11
            assert events.dtype == np.int16
            assert events[-1] == EOS_ID

    # augmented fan-out on disk
    aug = list((root / "train" / "augmented").glob("*.mid"))
    assert len(aug) == 2 * 60

    # pipeline output for one augmented variant == direct encoding
    sample = rows[0]
    var = root / "train" / "augmented" / f"{sample['id']}_ebmajor_70.mid"
    assert var.exists()
    info = dict(sample)
    info["bpm"] = 70
    info["chord_progressions"] = sync_key_augment(
        sample["chord_progressions"][0], "eb", "c")
    info["audio_key"] = "ebmajor"
    info["rhythm"] = info["sample_rhythm"]
    info["is_incomplete_measure"] = False
    enc = preprocess_midi(info, var)
    train_targets = np.load(out / "target_train.npy", allow_pickle=True)
    assert any(np.array_equal(t, enc.event_sequence) for t in train_targets)
