"""Golden + differential tests for the metadata codec."""
import pytest

from commu_tpu.utils.containers import MidiMeta
from commu_tpu.utils.exceptions import UnprocessableMidiError
from commu_tpu.vocab.meta_codec import (
    MetaEncoder,
    decode_meta_value,
    encode_bpm,
    encode_max_velocity,
    encode_min_velocity,
    encode_num_measures,
    encode_meta,
)

from conftest import add_reference_to_path, reference_available


def _meta(**overrides) -> MidiMeta:
    base = dict(
        bpm=70,
        audio_key="aminor",
        time_signature="4/4",
        pitch_range="mid_low",
        num_measures=8.0,
        inst="acoustic_piano",
        genre="newage",
        min_velocity=60,
        max_velocity=80,
        track_role="main_melody",
        rhythm="standard",
    )
    base.update(overrides)
    return MidiMeta(**base)


def test_full_encode_golden():
    # hand-derived from the reference formulae
    assert encode_meta(_meta()) == [
        560 + 14,       # bpm 70 // 5
        601 + 1 + 21,   # aminor
        626 + 1 + 0,    # 4/4
        630 + 1 + 2,    # mid_low
        638 + 1,        # 8 measures
        641 + 1 + 0,    # acoustic_piano
        650 + 1 + 0,    # newage
        653 + 1 + 30,   # floor(60/2)
        653 + 1 + 40,   # ceil(80/2)
        719 + 1 + 0,    # main_melody
        726 + 1 + 0,    # standard
    ]


def test_bpm_edges():
    assert encode_bpm(0) == 561      # bin 0 promoted to 1
    assert encode_bpm(1) == 561
    assert encode_bpm(4) == 561
    assert encode_bpm(5) == 561
    assert encode_bpm(199) == 560 + 39
    assert encode_bpm(200) == 560 + 40
    assert encode_bpm(250) == 560 + 40   # capped at MAX_BPM
    assert encode_bpm("unknown") == 560


def test_velocity_floor_ceil():
    assert encode_min_velocity(61) == 653 + 1 + 30
    assert encode_max_velocity(61) == 653 + 1 + 31
    assert encode_min_velocity("unknown") == 653
    assert encode_max_velocity("unknown") == 653


def test_num_measures_whitelist():
    assert encode_num_measures(4) == 638
    assert encode_num_measures(5.5) == 638
    assert encode_num_measures(8) == 639
    assert encode_num_measures(9.9) == 639
    assert encode_num_measures(16) == 640
    assert encode_num_measures(17) == 640
    with pytest.raises(UnprocessableMidiError):
        encode_num_measures(6)
    with pytest.raises(UnprocessableMidiError):
        encode_num_measures("unknown")


def test_unknown_sentinels():
    meta = _meta(audio_key="unknown", inst="unknown", genre="unknown",
                 track_role="unknown", rhythm="unknown", pitch_range="unknown",
                 time_signature="unknown")
    encoded = encode_meta(meta)
    assert encoded[1] == 601
    assert encoded[2] == 626
    assert encoded[3] == 630
    assert encoded[5] == 641
    assert encoded[6] == 650
    assert encoded[9] == 719
    assert encoded[10] == 726


def test_bad_table_value_raises():
    with pytest.raises(UnprocessableMidiError):
        encode_meta(_meta(audio_key="hminor"))


def test_decode_roundtrip():
    assert decode_meta_value("bpm", encode_bpm(70)) == 70
    assert decode_meta_value("audio_key", 601 + 1 + 21) == "aminor"
    assert decode_meta_value("time_signature", 627) == "4/4"


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_differential_vs_reference_meta_encoder():
    add_reference_to_path()
    ref_meta = pytest.importorskip("commu.preprocessor.encoder.meta")
    ref_container = pytest.importorskip("commu.preprocessor.utils.container")

    cases = [
        dict(),
        dict(bpm=200), dict(bpm=3), dict(bpm=999),
        dict(audio_key="dbmajor"), dict(audio_key="gminor"),
        dict(time_signature="12/8"),
        dict(pitch_range="very_high"),
        dict(num_measures=4.0), dict(num_measures=17.0), dict(num_measures=9.5),
        dict(inst="string_violin"), dict(inst="vocal"),
        dict(genre="cinematic"),
        dict(min_velocity=1, max_velocity=127),
        dict(min_velocity=127, max_velocity=127),
        dict(track_role="riff"), dict(rhythm="triplet"),
        dict(bpm="unknown", min_velocity="unknown", max_velocity="unknown"),
    ]
    encoder = MetaEncoder()
    for overrides in cases:
        ours_meta = _meta(**overrides)
        # model_construct bypasses pydantic validation so the "unknown"
        # sentinel reaches the encoder (its int-typed fields would otherwise
        # reject the sentinel before the encoder's unknown branch runs).
        ref_midi_meta = ref_container.MidiMeta.model_construct(**ours_meta.to_dict())
        expected = ref_meta.MetaEncoder().encode(ref_midi_meta)
        assert encoder.encode(ours_meta) == expected, overrides
