"""Golden + differential tests for the 729-token event space."""
import pytest

from commu_tpu.vocab import (
    TokenOffset,
    VOCAB_SIZE,
    build_event2word,
    build_word2event,
)

from conftest import add_reference_to_path, reference_available


def test_token_offsets_golden():
    assert TokenOffset.EOS == 1
    assert TokenOffset.BAR == 2
    assert TokenOffset.PITCH == 3
    assert TokenOffset.NOTE_VELOCITY == 131
    assert TokenOffset.CHORD_START == 195
    assert TokenOffset.CHORD_END == 303
    assert TokenOffset.NOTE_DURATION == 304
    assert TokenOffset.POSITION == 432
    assert TokenOffset.BPM == 560
    assert TokenOffset.KEY == 601
    assert TokenOffset.TS == 626
    assert TokenOffset.PITCH_RANGE == 630
    assert TokenOffset.NUM_MEASURES == 638
    assert TokenOffset.INST == 641
    assert TokenOffset.GENRE == 650
    assert TokenOffset.VELOCITY == 653
    assert TokenOffset.TRACK_ROLE == 719
    assert TokenOffset.RHYTHM == 726
    assert VOCAB_SIZE == 729


def test_event2word_spot_goldens():
    e2w = build_event2word()
    assert e2w["Bar_None"] == 2
    assert e2w["Note On_0"] == 3
    assert e2w["Note On_127"] == 130
    assert e2w["Note Velocity_0"] == 131
    assert e2w["Note Velocity_63"] == 194
    assert e2w["Chord_a"] == 195
    assert e2w["Chord_asus4"] == 203
    assert e2w["Chord_NN"] == 303
    assert e2w["Note Duration_0"] == 304
    assert e2w["Note Duration_127"] == 431
    assert e2w["Position_1/128"] == 432
    assert e2w["Position_128/128"] == 559


def test_chord_alias_goldens():
    e2w = build_event2word()
    # flat aliases
    assert e2w["Chord_ab"] == e2w["Chord_g#"]
    assert e2w["Chord_bbm7"] == e2w["Chord_a#m7"]
    assert e2w["Chord_dbmaj7"] == e2w["Chord_c#maj7"]
    assert e2w["Chord_eb7sus4"] == e2w["Chord_d#sus4"]
    assert e2w["Chord_gbdim7"] == e2w["Chord_f#dim"]
    # the reference's asymmetric mM7 mapping
    assert e2w["Chord_abmM7"] == e2w["Chord_g#m"]
    assert e2w["Chord_amM7"] == e2w["Chord_am7"]
    # abstract qualities on natural roots
    assert e2w["Chord_c6"] == e2w["Chord_c"]
    assert e2w["Chord_dsus2"] == e2w["Chord_dmaj7"]
    assert e2w["Chord_em6"] == e2w["Chord_em"]
    assert e2w["Chord_f7sus4"] == e2w["Chord_fsus4"]


def test_word2event_inverse():
    w2e = build_word2event()
    e2w = build_event2word()
    assert len(w2e) == 558  # ids 2..559
    for word, name in w2e.items():
        assert e2w[name] == word


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_differential_vs_reference():
    add_reference_to_path()
    ref_tokens = pytest.importorskip("commu.preprocessor.encoder.event_tokens")
    ref_utils = pytest.importorskip("commu.preprocessor.encoder.encoder_utils")

    ref_e2w, ref_w2e = ref_utils.mk_remi_map()
    ref_e2w = ref_utils.add_flat_chord2map(ref_e2w)
    ref_e2w = ref_utils.abstract_chord_types(ref_e2w)

    ours = build_event2word()
    assert ours == ref_e2w

    w2e = build_word2event()
    assert w2e == ref_w2e

    for member in ref_tokens.TOKEN_OFFSET:
        assert int(TokenOffset[member.name]) == member.value
