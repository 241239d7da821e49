"""Round-trip + robustness tests for the self-contained SMF codec."""
import random

import pytest

from commu_tpu.midi import (
    Instrument,
    KeySignature,
    Marker,
    MidiFile,
    Note,
    TempoChange,
    TimeSignature,
    key_name_to_number,
    key_number_to_name,
)


def _make_midi(seed=0, n_notes=40, bpm=70.0) -> MidiFile:
    rng = random.Random(seed)
    midi = MidiFile(ticks_per_beat=480)
    midi.tempo_changes = [TempoChange(tempo=bpm, time=0)]
    midi.time_signature_changes = [TimeSignature(4, 4, 0)]
    midi.key_signature_changes = [KeySignature(key_number=21)]  # a minor
    inst = Instrument(program=0, name="melody")
    tick = 0
    for _ in range(n_notes):
        dur = rng.choice([120, 240, 480, 960])
        inst.notes.append(
            Note(velocity=rng.randint(20, 120), pitch=rng.randint(40, 90),
                 start=tick, end=tick + dur)
        )
        tick += rng.choice([120, 240, 480])
    midi.instruments = [inst]
    midi.markers = [Marker(text="Am", time=0), Marker(text="F", time=1920)]
    return midi


def test_roundtrip_notes(tmp_path):
    midi = _make_midi()
    path = tmp_path / "x.mid"
    midi.dump(path)
    loaded = MidiFile(path)

    assert loaded.ticks_per_beat == 480
    assert len(loaded.instruments) == 1
    orig = sorted(midi.instruments[0].notes, key=lambda n: (n.start, n.pitch))
    got = loaded.instruments[0].notes
    assert len(got) == len(orig)
    for a, b in zip(orig, got):
        assert (a.pitch, a.start, a.end, a.velocity) == (b.pitch, b.start, b.end, b.velocity)


def test_roundtrip_meta(tmp_path):
    midi = _make_midi(bpm=65.0)
    path = tmp_path / "x.mid"
    midi.dump(path)
    loaded = MidiFile(path)

    assert loaded.tempo_changes[0].time == 0
    assert abs(loaded.tempo_changes[0].tempo - 65.0) < 0.01
    ts = loaded.time_signature_changes[0]
    assert (ts.numerator, ts.denominator) == (4, 4)
    assert loaded.key_signature_changes[0].key_number == 21
    assert [m.text for m in loaded.markers] == ["Am", "F"]
    assert [m.time for m in loaded.markers] == [0, 1920]
    assert loaded.instruments[0].name == "melody"


@pytest.mark.parametrize("key_number", list(range(24)))
def test_key_signature_roundtrip_all_keys(tmp_path, key_number):
    midi = _make_midi(n_notes=1)
    midi.key_signature_changes = [KeySignature(key_number=key_number)]
    path = tmp_path / "k.mid"
    midi.dump(path)
    loaded = MidiFile(path)
    assert loaded.key_signature_changes[0].key_number == key_number


def test_key_name_number_inverse():
    for num in range(24):
        assert key_name_to_number(key_number_to_name(num)) == num
    assert key_name_to_number("C") == 0
    assert key_name_to_number("Am") == 21
    assert key_name_to_number("Eb") == 3


def test_overlapping_same_pitch_notes(tmp_path):
    midi = MidiFile(ticks_per_beat=480)
    midi.tempo_changes = [TempoChange(120.0, 0)]
    inst = Instrument()
    inst.notes = [Note(80, 60, 0, 960), Note(70, 60, 480, 1440)]
    midi.instruments = [inst]
    path = tmp_path / "o.mid"
    midi.dump(path)
    loaded = MidiFile(path)
    got = loaded.instruments[0].notes
    assert len(got) == 2
    # FIFO pairing: first-on pairs with first-off
    assert {(n.start, n.end) for n in got} == {(0, 480), (480, 960)} or \
           {(n.start, n.end) for n in got} == {(0, 960), (480, 1440)}


def test_tempo_seconds_math():
    midi = _make_midi(bpm=60.0, n_notes=1)
    midi.instruments[0].notes = [Note(80, 60, 0, 480 * 4)]  # 4 beats at 60bpm = 4s
    assert abs(midi.get_end_time() - 4.0) < 1e-9
    times, tempi = midi.get_tempo_changes()
    assert times == [0.0]
    assert tempi == [60.0]


def test_multi_tempo_seconds():
    midi = MidiFile(ticks_per_beat=480)
    midi.tempo_changes = [TempoChange(60.0, 0), TempoChange(120.0, 480)]
    midi.instruments = [Instrument(notes=[Note(80, 60, 0, 960)])]
    # beat 1 at 60bpm (1s) + beat 2 at 120bpm (0.5s)
    assert abs(midi.get_end_time() - 1.5) < 1e-9
    times, _ = midi.get_tempo_changes()
    assert times == [0.0, 1.0]


def test_pitch_out_of_range_raises(tmp_path):
    midi = _make_midi(n_notes=1)
    midi.instruments[0].notes = [Note(80, 130, 0, 480)]
    with pytest.raises(ValueError):
        midi.dump(tmp_path / "bad.mid")


def test_garbage_file_rejected(tmp_path):
    path = tmp_path / "g.mid"
    path.write_bytes(b"not a midi file at all")
    with pytest.raises(ValueError):
        MidiFile(path)


def test_velocity_range_and_time_signature(tmp_path):
    """reference: commu/preprocessor/utils/utils.py:12-35 semantics."""
    from commu_tpu.midi import Instrument, MidiFile, Note, TimeSignature
    from commu_tpu.utils import get_time_signature, get_velocity_range

    p = tmp_path / "v.mid"
    m = MidiFile(ticks_per_beat=480)
    m.time_signature_changes = [TimeSignature(6, 8, 0)]
    mel = Instrument(program=0, name="melody")
    mel.notes = [Note(30, 60, 0, 100), Note(90, 62, 100, 200),
                 Note(1, 64, 200, 300)]  # keyswitch velocity 1
    chords = Instrument(program=0, name="chord")
    chords.notes = [Note(127, 48, 0, 400)]
    m.instruments = [mel, chords]
    m.dump(p)

    assert get_velocity_range(p) == (1, 90)
    assert get_velocity_range(p, keyswitch_velocity=1) == (30, 90)
    assert get_time_signature(p) == (6, 8)

    empty = tmp_path / "e.mid"
    m2 = MidiFile(ticks_per_beat=480)
    m2.time_signature_changes = [TimeSignature(4, 4, 0)]
    m2.instruments = [Instrument(program=0, name="chord",
                                 notes=[Note(64, 50, 0, 10)])]
    m2.dump(empty)
    assert get_velocity_range(empty) == ("unknown", "unknown")
