"""miditoolkit / pretty_midi adapter modules backed by commu_tpu.midi.smf.

The reference implementation (/root/reference) does all MIDI I/O through
miditoolkit (encoder_utils.py:216-232,385-497, augment.py:35-85,
utils/utils.py:12-35) plus one pretty_midi call for tempo analysis
(augment.py:73-78).  commu_tpu.midi.smf deliberately mirrors miditoolkit's
object model (Note/Instrument/TempoChange/TimeSignature/KeySignature/Marker/
MidiFile with the same constructor orders and attributes), so installing
these adapter modules lets the reference's REAL encode/decode/augment code
run side-by-side with ours in differential tests — both stacks reading and
writing through the same SMF layer, diffing the *algorithms* rather than the
file parsers.
"""
import sys
import types

import numpy as np

from commu_tpu.midi import smf


class PrettyMIDI:
    """The slice of pretty_midi the reference uses (augment.py:73-78):
    constructor from path, get_tempo_changes() -> (times_s, tempi) numpy
    arrays, get_end_time() -> seconds."""

    def __init__(self, path):
        self._midi = smf.MidiFile(path)

    def get_tempo_changes(self):
        times, tempi = self._midi.get_tempo_changes()
        return np.asarray(times, dtype=float), np.asarray(tempi, dtype=float)

    def get_end_time(self) -> float:
        return self._midi.get_end_time()


def install_midi_adapter() -> None:
    """Install working ``miditoolkit`` / ``pretty_midi`` modules in
    sys.modules, backed by commu_tpu.midi.smf."""
    mt = types.ModuleType("miditoolkit")
    midi_mod = types.ModuleType("miditoolkit.midi")
    parser_mod = types.ModuleType("miditoolkit.midi.parser")
    containers_mod = types.ModuleType("miditoolkit.midi.containers")
    for mod in (mt, parser_mod):
        mod.MidiFile = smf.MidiFile
    for mod in (mt, containers_mod):
        mod.Note = smf.Note
        mod.Instrument = smf.Instrument
        mod.TempoChange = smf.TempoChange
        mod.TimeSignature = smf.TimeSignature
        mod.KeySignature = smf.KeySignature
        mod.Marker = smf.Marker
    midi_mod.parser = parser_mod
    midi_mod.containers = containers_mod
    mt.midi = midi_mod
    mt.__adapter__ = True
    sys.modules["miditoolkit"] = mt
    sys.modules["miditoolkit.midi"] = midi_mod
    sys.modules["miditoolkit.midi.parser"] = parser_mod
    sys.modules["miditoolkit.midi.containers"] = containers_mod

    pm = types.ModuleType("pretty_midi")
    pm.PrettyMIDI = PrettyMIDI
    pm.__adapter__ = True
    sys.modules["pretty_midi"] = pm
