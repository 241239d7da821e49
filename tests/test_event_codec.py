"""Golden, property, and round-trip tests for the REMI event codec."""
import numpy as np
import pytest

from commu_tpu.midi import Instrument, KeySignature, MidiFile, Note, TempoChange, TimeSignature
from commu_tpu.preprocess.event_codec import (
    EventSequenceEncoder,
    VELOCITY_BINS,
    decode_tokens_to_midi,
    detect_chord,
    encode_midi_to_tokens,
)
from commu_tpu.utils.containers import MidiInfo
from commu_tpu.utils.exceptions import UnprocessableMidiError
from commu_tpu.vocab import TokenOffset

from helpers import make_commu_midi, make_sample_info


def _fixed_midi(tmp_path):
    """One bar-aligned note per bar with hand-computable tokens."""
    midi = MidiFile(ticks_per_beat=480)
    midi.tempo_changes = [TempoChange(70.0, 0)]
    midi.time_signature_changes = [TimeSignature(4, 4, 0)]
    midi.key_signature_changes = [KeySignature(key_number=0)]
    inst = Instrument(name="melody")
    inst.notes = [
        Note(velocity=64, pitch=60, start=0, end=480),
        Note(velocity=64, pitch=64, start=1920, end=2400),
        Note(velocity=2, pitch=67, start=3840, end=4800),
        Note(velocity=1, pitch=72, start=5760 + 960, end=5760 + 1920),  # OOV velocity
    ]
    midi.instruments = [inst]
    path = tmp_path / "fixed.mid"
    midi.dump(path)
    return path


def test_golden_token_sequence(tmp_path):
    path = _fixed_midi(tmp_path)
    progression = (["c"] * 8) + (["f"] * 8) + (["g"] * 8) + (["c"] * 4 + ["a#"] * 4)
    info = make_sample_info(chord_progressions=[progression])
    tokens = encode_midi_to_tokens(path, info).tolist()

    BAR, POS = 2, 432
    C, F, G, A_SHARP = 222, 267, 285, 204
    expected = [
        BAR, POS, C, POS, 162, 63, 335,             # bar 0: chord c + note C4
        BAR, POS, F, POS, 162, 67, 335,             # bar 1: chord f + note E4
        BAR, POS, G, POS, 131, 70, 367,             # bar 2: chord g + vel 2 -> bin 0, dur 960
        BAR, POS, C, POS + 64, A_SHARP,             # bar 3: chord c, then a# at beat 3
        POS + 64, 194, 75, 367,                     # note with OOV velocity -> token 194
        1,                                          # EOS
    ]
    assert tokens == expected


def test_detect_chord_first_of_bar_always_emitted():
    idx, names = detect_chord(["c"] * 8 + ["c"] * 8, beats_per_bar=4)
    assert idx == [0.0, 1.0]
    assert names == ["c", "c"]

    idx, names = detect_chord(["c"] * 4 + ["f"] * 4 + ["f"] * 8, beats_per_bar=4)
    assert idx == [0.0, 0.5, 1.0]
    assert names == ["c", "f", "f"]


def test_encode_property_regions(tmp_path):
    path = tmp_path / "m.mid"
    make_commu_midi(path, num_measures=8, seed=3)
    info = make_sample_info(num_measures=8, seed=3)
    tokens = encode_midi_to_tokens(path, info)

    assert tokens[-1] == 1  # EOS
    assert (tokens[:-1] >= 2).all() and (tokens[:-1] < 560).all()
    # one Bar token per measure
    assert int((tokens == 2).sum()) == 8
    # 8 bars x 4 notes -> 32 pitch tokens
    pitch_region = (tokens >= 3) & (tokens < 131)
    assert int(pitch_region.sum()) == 32


def test_empty_chord_progression_raises(tmp_path):
    path = tmp_path / "m.mid"
    make_commu_midi(path)
    info = make_sample_info(chord_progressions=[[]])
    with pytest.raises(UnprocessableMidiError):
        encode_midi_to_tokens(path, info)


def test_incomplete_measure_offsets_chords(tmp_path):
    # 5 measures: pickup bar + 4 full bars; chords start at bar 1
    path = tmp_path / "m.mid"
    make_commu_midi(path, num_measures=5)
    info = make_sample_info(num_measures=5)
    assert info["is_incomplete_measure"] is True
    tokens = encode_midi_to_tokens(path, info)
    assert int((tokens == 2).sum()) == 5
    # first chord token must appear after the second Bar token
    bar_positions = np.flatnonzero(tokens == 2)
    chord_positions = np.flatnonzero((tokens >= 195) & (tokens <= 303))
    assert chord_positions[0] > bar_positions[1]


def test_roundtrip_through_decoder(tmp_path):
    path = tmp_path / "m.mid"
    make_commu_midi(path, num_measures=4, seed=7)
    info = make_sample_info(num_measures=4, seed=7)
    tokens = encode_midi_to_tokens(path, info)

    midi_info = MidiInfo(
        bpm=574, audio_key=623, time_signature=627, pitch_range=634,
        num_measures=638, inst=642, genre=651, min_velocity=674,
        max_velocity=704, track_role=720, rhythm=727,
        event_seq=tokens.tolist(),
    )
    decoded = decode_tokens_to_midi(midi_info)

    assert decoded.tempo_changes[0].tempo == pytest.approx(70.0)
    ts = decoded.time_signature_changes[0]
    assert (ts.numerator, ts.denominator) == (4, 4)
    assert decoded.key_signature_changes[0].key_number == 21  # 623-602=21 aminor

    src = MidiFile(path).instruments[0].notes
    got = decoded.instruments[0].notes
    # the final bar's notes may fall in the truncated scan window (reference
    # quirk: the last 3 events are never matched as note starts)
    assert len(got) >= len(src) - 1
    for a, b in zip(src, got):
        assert a.pitch == b.pitch
        assert a.start == b.start  # bar-grid starts survive the 1/128 quantization
        assert abs(a.velocity - b.velocity) <= 2  # velocity bin width
    # chord markers present
    assert len(decoded.markers) >= 4


def test_encoder_facade(tmp_path):
    path = tmp_path / "m.mid"
    make_commu_midi(path)
    info = make_sample_info()
    enc = EventSequenceEncoder()
    np.testing.assert_array_equal(enc.encode(path, sample_info=info),
                                  encode_midi_to_tokens(path, info))


def test_velocity_bins_match_reference_formula():
    expected = np.linspace(2, 127, 64, dtype=int)
    np.testing.assert_array_equal(VELOCITY_BINS, expected)
