"""EXECUTED-reference differentials for the event codec and augmentation.

Unlike the golden tests (hand-computed expectations), these run the
reference's actual ``EventSequenceEncoder.encode``/``.decode`` and
``augment_data_map`` (/root/reference/commu/preprocessor/encoder/
encoder_utils.py:184-497, augment.py:35-98) side-by-side with ours on the
same MIDI bytes, through the smf-backed miditoolkit/pretty_midi adapter
(tests/ref_midi_adapter.py).  Fixture coverage: all 4 time signatures,
incomplete measures, OOV velocities, long (bar-length) durations, flat and
minor chords, and the out-of-range transposition reject path.
"""
import os
from pathlib import Path

import numpy as np
import pytest

from commu_tpu.midi import (Instrument, KeySignature, MidiFile, Note,
                            TempoChange, TimeSignature)
from commu_tpu.preprocess.event_codec import (decode_tokens_to_midi,
                                              encode_midi_to_tokens)
from commu_tpu.utils.containers import MidiInfo
from commu_tpu.vocab.meta_codec import encode_meta
from commu_tpu.utils.containers import MidiMeta

from conftest import add_reference_to_path, reference_available
from helpers import make_commu_midi, make_chord_progression, make_sample_info

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference not mounted")


@pytest.fixture(scope="module")
def ref():
    add_reference_to_path()
    from commu.preprocessor import augment as ref_augment
    from commu.preprocessor.encoder.encoder import \
        EventSequenceEncoder as RefEncoder

    import miditoolkit
    assert getattr(miditoolkit, "__adapter__", False), (
        "differential requires the WORKING smf-backed adapter, not a stub")
    return RefEncoder(), ref_augment


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

CASES = [
    # (time_signature, num_measures, seed)
    ("4/4", 4, 0),
    ("4/4", 8, 1),
    ("3/4", 4, 2),
    ("3/4", 8, 3),
    ("6/8", 4, 4),
    ("12/8", 4, 5),
    ("4/4", 5, 6),    # incomplete measure (num_measures % 4 != 0)
    ("3/4", 9, 7),    # incomplete measure, odd meter
]


@pytest.mark.parametrize("ts,bars,seed", CASES)
def test_encode_matches_executed_reference(ref, tmp_path, ts, bars, seed):
    ref_enc, _ = ref
    num, den = (int(x) for x in ts.split("/"))
    path = str(tmp_path / f"s{seed}.mid")
    make_commu_midi(path, num_measures=bars, numerator=num, denominator=den,
                    seed=seed)
    info = make_sample_info(num_measures=bars, time_signature=ts, seed=seed)
    ref_tokens = np.asarray(ref_enc.encode(path, sample_info=info))
    our_tokens = np.asarray(encode_midi_to_tokens(path, info))
    np.testing.assert_array_equal(our_tokens, ref_tokens)


@pytest.mark.parametrize("ts,bars,seed", CASES)
def test_for_cp_events_match_executed_reference(ref, tmp_path, ts, bars, seed):
    """``encode(..., for_cp=True)`` returns the pre-word-mapping Event stream
    (reference encoder.py:48-49); compare name/time/value/text field-by-field
    against the executed reference."""
    from commu_tpu.preprocess.event_codec import encode_midi_to_events

    ref_enc, _ = ref
    num, den = (int(x) for x in ts.split("/"))
    path = str(tmp_path / f"cp{seed}.mid")
    make_commu_midi(path, num_measures=bars, numerator=num, denominator=den,
                    seed=seed)
    info = make_sample_info(num_measures=bars, time_signature=ts, seed=seed)
    ref_events = ref_enc.encode(path, sample_info=info, for_cp=True)
    our_events = encode_midi_to_events(path, info)
    assert len(our_events) == len(ref_events)
    for ours, theirs in zip(our_events, ref_events):
        assert (ours.name, ours.time, ours.value, str(ours.text)) == (
            theirs.name, int(theirs.time), theirs.value, str(theirs.text))


def test_encode_oov_velocity_and_long_duration(ref, tmp_path):
    """OOV velocity (below the first bin) and bar-length durations hit the
    encoder's fallback paths (reference encoder.py:56-67)."""
    ref_enc, _ = ref
    midi = MidiFile(ticks_per_beat=480)
    midi.tempo_changes = [TempoChange(70.0, 0)]
    midi.time_signature_changes = [TimeSignature(4, 4, 0)]
    midi.key_signature_changes = [KeySignature(key_number=0)]
    inst = Instrument(name="melody")
    inst.notes = [
        Note(velocity=1, pitch=60, start=0, end=480),       # OOV velocity
        Note(velocity=127, pitch=64, start=1920, end=3840),  # full-bar dur
        Note(velocity=64, pitch=67, start=3840, end=3840 + 1920 + 960),
        Note(velocity=2, pitch=72, start=5760, end=5790),    # tiny dur
    ]
    midi.instruments = [inst]
    path = str(tmp_path / "oov.mid")
    midi.dump(path)
    info = make_sample_info(seed=11)
    ref_tokens = np.asarray(ref_enc.encode(path, sample_info=info))
    our_tokens = np.asarray(encode_midi_to_tokens(path, info))
    np.testing.assert_array_equal(our_tokens, ref_tokens)


def test_encode_flat_and_minor_chords(ref, tmp_path):
    ref_enc, _ = ref
    path = str(tmp_path / "chords.mid")
    make_commu_midi(path, num_measures=4, seed=13)
    progression = (["a#m"] * 8 + ["d#"] * 8 + ["Bdim"] * 8 + ["Gsus4"] * 8)
    info = make_sample_info(seed=13,
                            chord_progressions=[progression])
    ref_tokens = np.asarray(ref_enc.encode(path, sample_info=info))
    our_tokens = np.asarray(encode_midi_to_tokens(path, info))
    np.testing.assert_array_equal(our_tokens, ref_tokens)


# ---------------------------------------------------------------------------
# decode (write_midi)
# ---------------------------------------------------------------------------

def _encoded_meta_values(ts="4/4", bars=4):
    meta = MidiMeta(bpm=70, audio_key="cmajor", time_signature=ts,
                    pitch_range="mid", num_measures=float(bars),
                    inst="acoustic_piano", genre="newage", min_velocity=40,
                    max_velocity=100, track_role="main_melody",
                    rhythm="standard")
    return encode_meta(meta)


@pytest.mark.parametrize("ts,bars,seed", CASES[:6])
def test_decode_matches_executed_reference(ref, tmp_path, ts, bars, seed):
    """Round: encode a fixture, then decode the event stream with BOTH
    write_midi implementations and compare full MIDI content."""
    ref_enc, _ = ref
    num, den = (int(x) for x in ts.split("/"))
    path = str(tmp_path / f"d{seed}.mid")
    make_commu_midi(path, num_measures=bars, numerator=num, denominator=den,
                    seed=seed)
    info = make_sample_info(num_measures=bars, time_signature=ts, seed=seed)
    tokens = encode_midi_to_tokens(path, info).tolist()

    meta_vals = _encoded_meta_values(ts, bars)
    midi_info = MidiInfo(*meta_vals, event_seq=tokens)
    ours = decode_tokens_to_midi(midi_info)
    theirs = ref_enc.decode(midi_info)

    assert ours.ticks_per_beat == theirs.ticks_per_beat
    ts_o, ts_t = ours.time_signature_changes[0], theirs.time_signature_changes[0]
    assert (ts_o.numerator, ts_o.denominator) == (ts_t.numerator,
                                                  ts_t.denominator)
    assert (ours.key_signature_changes[0].key_number ==
            theirs.key_signature_changes[0].key_number)
    assert [(t.tempo, t.time) for t in ours.tempo_changes] == \
        [(t.tempo, t.time) for t in theirs.tempo_changes]
    assert [(m.text, m.time) for m in ours.markers] == \
        [(m.text, m.time) for m in theirs.markers]
    notes_o = [(n.velocity, n.pitch, n.start, n.end)
               for n in ours.instruments[0].notes]
    notes_t = [(n.velocity, n.pitch, n.start, n.end)
               for n in theirs.instruments[0].notes]
    assert notes_o == notes_t
    assert len(notes_o) > 0 and len(ours.markers) > 0

    # identical content -> identical bytes through the shared SMF writer
    po, pt = tmp_path / "ours.mid", tmp_path / "theirs.mid"
    ours.dump(po)
    theirs.dump(pt)
    assert po.read_bytes() == pt.read_bytes()


# ---------------------------------------------------------------------------
# augmentation
# ---------------------------------------------------------------------------

def _augment_dirs(tmp_path, tag):
    aug = tmp_path / f"{tag}_augmented"
    tmp = tmp_path / f"{tag}_tmp"
    aug.mkdir()
    tmp.mkdir()
    return str(aug), str(tmp)


def _midi_content(path):
    m = MidiFile(path)
    return ([(n.velocity, n.pitch, n.start, n.end)
             for n in m.instruments[0].notes],
            [(t.tempo, t.time) for t in m.tempo_changes],
            [k.key_number for k in m.key_signature_changes])


def test_augment_matches_executed_reference(ref, tmp_path):
    """Full x12-keys x5-bpm fan-out: identical filenames, pitches, tempi and
    key signatures vs the reference's augment_data_map (augment.py:88-98).

    BPMs are chosen exactly representable in MIDI tempo microseconds so the
    reference's ``int(origin_bpm)`` truncation (augment.py:83) is lossless —
    the one deliberate deviation (_int_bpm) is pinned separately below."""
    _, ref_aug = ref
    sources = []
    for i, (bpm, keynum) in enumerate([(120, 0), (100, 21)]):  # C major, a minor
        p = str(tmp_path / f"src{i}.mid")
        make_commu_midi(p, bpm=bpm, key_number=keynum, seed=20 + i)
        sources.append(p)
    # reject-path coverage: pitches near the top of the range so up-shifts
    # push some transpositions out of 0..127 and the file is skipped
    high = MidiFile(ticks_per_beat=480)
    high.tempo_changes = [TempoChange(75.0, 0)]
    high.time_signature_changes = [TimeSignature(4, 4, 0)]
    high.key_signature_changes = [KeySignature(key_number=0)]
    hi_inst = Instrument(name="melody")
    hi_inst.notes = [Note(velocity=60, pitch=125, start=0, end=480),
                     Note(velocity=60, pitch=60, start=480, end=960)]
    high.instruments = [hi_inst]
    hp = str(tmp_path / "src_high.mid")
    high.dump(hp)
    sources.append(hp)

    ref_dir, ref_tmp = _augment_dirs(tmp_path, "ref")
    our_dir, our_tmp = _augment_dirs(tmp_path, "our")
    ref_aug.augment_data_map(sources, ref_dir, ref_tmp)

    from commu_tpu.preprocess.augment import augment_data_map as our_map
    our_map(sources, our_dir, our_tmp)

    ref_files = sorted(os.listdir(ref_dir))
    our_files = sorted(os.listdir(our_dir))
    assert ref_files == our_files
    assert len(ref_files) > 0
    # the high-pitch source must have lost its upward transpositions
    assert len([f for f in ref_files if f.startswith("src_high")]) < 60
    for name in ref_files:
        assert _midi_content(os.path.join(ref_dir, name)) == \
            _midi_content(os.path.join(our_dir, name)), name


def test_augment_int_bpm_deviation_pinned(ref, tmp_path):
    """bpm=70 is NOT exactly representable (60e6/70 rounds); the reference's
    int() truncation yields 69-centered names while our documented _int_bpm
    fix snaps back to 70 (IMPLEMENTATION_NOTES.md, augment.py:81-87)."""
    _, ref_aug = ref
    p = str(tmp_path / "src70.mid")
    make_commu_midi(p, bpm=70, key_number=0, seed=30)

    ref_dir, ref_tmp = _augment_dirs(tmp_path, "ref70")
    our_dir, our_tmp = _augment_dirs(tmp_path, "our70")
    ref_aug.augment_data_map([p], ref_dir, ref_tmp)
    from commu_tpu.preprocess.augment import augment_data_map as our_map
    our_map([p], our_dir, our_tmp)

    ref_bpms = sorted({f.rsplit("_", 1)[1] for f in os.listdir(ref_dir)})
    our_bpms = sorted({f.rsplit("_", 1)[1] for f in os.listdir(our_dir)})
    assert ref_bpms == [f"{b}.mid" for b in (59, 64, 69, 74, 79)]
    assert our_bpms == [f"{b}.mid" for b in (60, 65, 70, 75, 80)]
    # everything except the bpm label is identical
    ref_names = sorted(f.rsplit("_", 1)[0] for f in os.listdir(ref_dir))
    our_names = sorted(f.rsplit("_", 1)[0] for f in os.listdir(our_dir))
    assert ref_names == our_names
