"""Executed-reference differential for the FULL preprocess orchestrator.

Round-2 verdict gap: encoder/decoder/augmenter ran side-by-side with the
reference, but the reference ``Preprocessor.preprocess`` chunk logic —
augmented-meta re-derivation from filename key/bpm, ``sync_key_augment``
chord re-sync, the non-cmajor/aminor parent drop, ``is_incomplete_measure``
derivation, and the sorted CSV->npy concat
(/root/reference/commu/preprocessor/preprocessor.py:122-168,190-275,306-319)
— had only been checked against our own encoder (self-consistency).

Here the reference pipeline RUNS, end to end, on a synthetic corpus that
exercises every branch:

- a 4-measure cmajor sample (the plain path),
- a 5-measure cmajor sample (``num_measures % 4 != 0`` ->
  ``is_incomplete_measure=True``),
- a 4-measure gmajor sample (augments on disk, but every augmented child is
  DROPPED at encode because the parent key is not cmajor/aminor),

and the resulting ``output_npy/{input,target}_{split}.npy`` object arrays
must be element-for-element identical to ours — same ordering (including the
reference's lexicographic ``input_10 < input_2`` concat quirk), same meta
token ids, same int16 event streams.

MIDI I/O on the reference side goes through the smf-backed miditoolkit /
pretty_midi adapters; ``parmap`` is shimmed to a sequential functional map
(the reference semantics at num_cores=1).

Two harness notes:

- The reference's final ``np.save(..., list_of_arrays, allow_pickle=True)``
  (preprocessor.py:160-162) relies on numpy<1.24 auto-coercing a ragged list
  to an object array; modern numpy raises.  The test wraps ``np.save`` to
  reproduce the old coercion exactly (stack when homogeneous, 1-D object
  array when ragged) without touching the reference.
- Consequence of that coercion: the reference's ``input_{split}.npy`` is a
  2-D (N, 11) object array while ours is a 1-D object array of (11,) rows —
  a documented layout deviation (both loaders iterate rows identically; the
  comparison here is row-wise).
"""
import shutil
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from commu_tpu.preprocess.pipeline import PreprocessPipeline

from conftest import add_reference_to_path, reference_available
from helpers import make_commu_midi, make_sample_info


def _functional_parmap():
    """Give the inert parmap stub a working sequential ``map`` (the
    reference calls parmap.map(fn, iterable, *args, pm_*, **kwargs))."""
    stub = sys.modules["parmap"]

    def _map(fn, iterable, *args, **kwargs):
        kwargs = {k: v for k, v in kwargs.items() if not k.startswith("pm_")}
        return [fn(item, *args, **kwargs) for item in iterable]

    stub.map = _map


def _build_corpus(root: Path):
    """train: cmajor x4, cmajor x5 (incomplete), gmajor x4 (dropped);
    val: cmajor x4.

    bpm=120 everywhere: exactly representable in MIDI tempo microseconds, so
    the reference's ``int(origin_bpm)`` truncation (augment.py:83) is
    lossless and both sides emit identical filenames — the deliberate
    _int_bpm deviation at bpm=70 is pinned by its own test in
    test_reference_differential.py."""
    specs = {
        "train": [
            dict(seed=1, num_measures=4, audio_key="cmajor", key_number=0),
            dict(seed=2, num_measures=5, audio_key="cmajor", key_number=0),
            dict(seed=3, num_measures=4, audio_key="gmajor", key_number=7),
        ],
        "val": [
            dict(seed=4, num_measures=4, audio_key="cmajor", key_number=0),
        ],
    }
    rows = []
    for split, items in specs.items():
        raw = root / split / "raw"
        raw.mkdir(parents=True)
        for spec in items:
            sid = f"commu{spec['seed']:05d}"
            info = make_sample_info(num_measures=spec["num_measures"],
                                    seed=spec["seed"],
                                    audio_key=spec["audio_key"], bpm=120)
            info["id"] = sid
            rows.append(info)
            make_commu_midi(raw / f"{sid}.mid", bpm=120,
                            num_measures=spec["num_measures"],
                            key_number=spec["key_number"], seed=spec["seed"])
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
    return csv_path


@pytest.mark.slow
@pytest.mark.skipif(not reference_available(), reason="reference unavailable")
def test_preprocess_orchestrator_matches_executed_reference(tmp_path,
                                                            monkeypatch):
    src = tmp_path / "src"
    _build_corpus(src)

    ref_root = tmp_path / "ref_run"
    our_root = tmp_path / "our_run"
    shutil.copytree(src, ref_root)
    shutil.copytree(src, our_root)

    # ours
    PreprocessPipeline()(root_dir=our_root, csv_path=our_root / "meta.csv",
                         num_cores=1)

    # Output ordering follows the filesystem enumeration order of
    # raw/ + augmented/ (reference: rglob in _gather_sample_files,
    # preprocessor.py:292-304) — on tmpfs that is file-creation order, and
    # the two pipelines create the x60 variants in different sequences.  To
    # compare element-for-element, pre-seed the reference tree with our
    # augmented dirs (fixing enumeration order); the reference's own
    # augmentation then OVERWRITES every file in place (byte-identical
    # content, proven by the executed augment differential in
    # test_reference_differential.py) without changing that order.
    for split in ("train", "val"):
        shutil.copytree(our_root / split / "augmented",
                        ref_root / split / "augmented")

    # the executed reference
    add_reference_to_path()
    _functional_parmap()

    # numpy<1.24 coercion for the reference's ragged-list np.save
    orig_save = np.save

    def _old_numpy_save(f, arr, *args, **kwargs):
        if isinstance(arr, list):
            try:
                arr = np.asanyarray(arr)
            except ValueError:
                obj = np.empty(len(arr), dtype=object)
                for i, x in enumerate(arr):
                    obj[i] = x
                arr = obj
        return orig_save(f, arr, *args, **kwargs)

    monkeypatch.setattr(np, "save", _old_numpy_save)

    from commu.preprocessor.pipeline import PreprocessPipeline as RefPipeline

    RefPipeline()(root_dir=ref_root, csv_path=ref_root / "meta.csv",
                  num_cores=1)

    for split, n_expected in (("train", 2 * 60), ("val", 60)):
        ref_in = np.load(ref_root / "output_npy" / f"input_{split}.npy",
                         allow_pickle=True)
        ref_tg = np.load(ref_root / "output_npy" / f"target_{split}.npy",
                         allow_pickle=True)
        our_in = np.load(our_root / "output_npy" / f"input_{split}.npy",
                         allow_pickle=True)
        our_tg = np.load(our_root / "output_npy" / f"target_{split}.npy",
                         allow_pickle=True)

        # gmajor parent contributes nothing; cmajor parents contribute the
        # full 12-key x 5-bpm fan-out (synthetic melodies stay in range)
        assert len(ref_in) == n_expected, (split, len(ref_in))
        assert len(our_in) == len(ref_in)
        assert len(our_tg) == len(ref_tg) == len(ref_in)

        for i, (rm, om) in enumerate(zip(ref_in, our_in)):
            assert list(rm) == list(om), f"{split} meta row {i}"
        for i, (rt, ot) in enumerate(zip(ref_tg, our_tg)):
            assert rt.dtype == ot.dtype == np.int16, f"{split} row {i}"
            assert np.array_equal(rt, ot), f"{split} event row {i}"
