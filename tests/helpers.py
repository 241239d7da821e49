"""Shared test fixtures: synthetic ComMU-like MIDI samples and csv records."""
import random
from typing import List

from commu_tpu.midi import (
    Instrument,
    KeySignature,
    MidiFile,
    Note,
    TempoChange,
    TimeSignature,
)

CHORD_POOL = ["C", "F", "G", "Am", "Dm", "Em", "A#"]


def make_commu_midi(
    path,
    bpm=70,
    num_measures=4,
    numerator=4,
    denominator=4,
    key_number=0,  # C major
    seed=0,
    ticks_per_beat=480,
    notes_per_bar=4,
):
    """Write a synthetic single-track melody like a ComMU raw sample."""
    rng = random.Random(seed)
    midi = MidiFile(ticks_per_beat=ticks_per_beat)
    midi.tempo_changes = [TempoChange(tempo=float(bpm), time=0)]
    midi.time_signature_changes = [TimeSignature(numerator, denominator, 0)]
    midi.key_signature_changes = [KeySignature(key_number=key_number)]
    ticks_per_bar = int(ticks_per_beat * numerator / denominator * 4)
    step = ticks_per_bar // notes_per_bar
    inst = Instrument(program=0, name="melody")
    for bar in range(num_measures):
        for k in range(notes_per_bar):
            start = bar * ticks_per_bar + k * step
            inst.notes.append(
                Note(velocity=rng.randint(40, 100), pitch=rng.randint(48, 84),
                     start=start, end=start + step)
            )
    midi.instruments = [inst]
    midi.dump(path)
    return midi


def make_chord_progression(num_measures=4, numerator=4, denominator=4, seed=0) -> List[str]:
    rng = random.Random(seed)
    beats_per_bar = int(numerator / denominator * 4)
    chords_per_bar = beats_per_bar * 2
    progression = []
    for _ in range(num_measures):
        chord = rng.choice(CHORD_POOL)
        progression.extend([chord] * chords_per_bar)
    return progression


def make_sample_info(num_measures=4, time_signature="4/4", seed=0, **overrides) -> dict:
    numerator, denominator = (int(x) for x in time_signature.split("/"))
    info = dict(
        id=f"commu{seed:05d}",
        bpm=70,
        audio_key="cmajor",
        chord_progressions=[make_chord_progression(num_measures, numerator, denominator, seed)],
        time_signature=time_signature,
        pitch_range="mid",
        num_measures=float(num_measures),
        inst="acoustic_piano",
        genre="newage",
        min_velocity=40,
        max_velocity=100,
        track_role="main_melody",
        rhythm="standard",
        sample_rhythm="standard",
        is_incomplete_measure=num_measures % 4 != 0,
    )
    info.update(overrides)
    return info
