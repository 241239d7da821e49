"""Native (C++) SMF parser vs the pure-Python parser: identical object model."""
import numpy as np
import pytest

from commu_tpu.midi import smf
from commu_tpu.midi.smf import (Instrument, KeySignature, Marker, MidiFile,
                                Note, TempoChange, TimeSignature)
from helpers import make_commu_midi


def _parse_both(path):
    lib = smf._load_native()
    if lib is None:
        pytest.skip("native parser not built (make -C commu_tpu/midi/native)")
    blob = open(path, "rb").read()
    native = MidiFile(ticks_per_beat=0)
    native._parse_native(lib, blob)
    python = MidiFile(ticks_per_beat=0)
    python._parse_python(blob)
    return native, python


def _assert_same(a: MidiFile, b: MidiFile):
    assert a.ticks_per_beat == b.ticks_per_beat
    assert len(a.instruments) == len(b.instruments)
    for ia, ib in zip(a.instruments, b.instruments):
        assert (ia.program, ia.is_drum, ia.name) == (ib.program, ib.is_drum, ib.name)
        assert ia.notes == ib.notes
    assert a.tempo_changes == b.tempo_changes
    assert a.time_signature_changes == b.time_signature_changes
    assert a.key_signature_changes == b.key_signature_changes
    assert a.markers == b.markers


def test_simple_file(tmp_path):
    p = tmp_path / "a.mid"
    make_commu_midi(p, bpm=70, num_measures=4, key_number=21, seed=3)
    _assert_same(*_parse_both(p))


def test_rich_file(tmp_path):
    """Multi-instrument, overlapping same-pitch notes, markers, tempo map."""
    p = tmp_path / "b.mid"
    m = MidiFile(ticks_per_beat=960)
    m.tempo_changes = [TempoChange(120.0, 0), TempoChange(90.0, 1920),
                       TempoChange(140.0, 5000)]
    m.time_signature_changes = [TimeSignature(6, 8, 0), TimeSignature(4, 4, 3840)]
    m.key_signature_changes = [KeySignature(key_number=15, time=0),
                               KeySignature(key_number=4, time=1920)]
    m.markers = [Marker("Am", 0), Marker("F(add2)", 960)]
    melody = Instrument(program=5, name="melody")
    # overlapping notes with identical pitch exercise FIFO note matching
    melody.notes = [Note(80, 60, 0, 500), Note(70, 60, 100, 900),
                    Note(90, 72, 100, 400), Note(60, 60, 600, 1000)]
    chords = Instrument(program=0, name="chord")
    chords.notes = [Note(64, 48, 0, 1900), Note(64, 52, 0, 1900)]
    m.instruments = [melody, chords]
    m.dump(p)
    _assert_same(*_parse_both(p))


def test_error_parity(tmp_path):
    lib = smf._load_native()
    if lib is None:
        pytest.skip("native parser not built")
    for blob in (b"nonsense", b"MThd" + b"\x00" * 10 + b"junkjunk"):
        native_err = python_err = None
        try:
            MidiFile(ticks_per_beat=0)._parse_native(lib, blob)
        except ValueError as e:
            native_err = str(e)
        try:
            MidiFile(ticks_per_beat=0)._parse_python(blob)
        except ValueError as e:
            python_err = str(e)
        except Exception:
            python_err = "corrupt"
        assert (native_err is None) == (python_err is None)


def test_native_used_by_default(tmp_path):
    if smf._load_native() is None:
        pytest.skip("native parser not built")
    p = tmp_path / "c.mid"
    make_commu_midi(p)
    midi = MidiFile(p)  # default path goes through the native parser
    assert midi.instruments and midi.instruments[0].notes


def test_codec_roundtrip_with_native(tmp_path):
    """The event codec produces identical tokens over either parser."""
    if smf._load_native() is None:
        pytest.skip("native parser not built")
    from commu_tpu.preprocess.event_codec import encode_midi_to_tokens
    from helpers import make_sample_info

    p = tmp_path / "d.mid"
    make_commu_midi(p, seed=7)
    info = make_sample_info(seed=7)
    info["is_incomplete_measure"] = False

    toks_native = encode_midi_to_tokens(str(p), info)

    blob = open(p, "rb").read()
    python_midi = MidiFile(ticks_per_beat=0)
    python_midi._parse_python(blob)
    toks_python = encode_midi_to_tokens(python_midi, info)
    np.testing.assert_array_equal(toks_native, toks_python)
