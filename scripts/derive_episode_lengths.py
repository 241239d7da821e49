"""Derive a realistic 8-bar episode token-length distribution.

The real ComMU corpus is not vendored (reference `.MISSING_LARGE_BLOBS`), so
the generation benchmark cannot sample true episode lengths from it.  This
script produces the next-best thing: synthetic 8-bar MIDI at a range of note-
densities is run through the REAL event encoder (the token-exact one,
differentially tested against the reference), giving token lengths whose
*arithmetic* (meta 11 + bars + chords + 4 tokens/note + EOS) is exactly the
corpus's; the note-density mixture is calibrated so the resulting median
lands at ~700 tokens — the known corpus median for 8-bar samples
(BASELINE.md).  Output: scripts/episode_lengths.json, consumed by bench.py's
generation suite as per-row episode caps.

Run: python scripts/derive_episode_lengths.py   (CPU, a few seconds)
"""
import json
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    from commu_tpu.preprocess.event_codec import EventSequenceEncoder
    from tests.helpers import make_commu_midi, make_sample_info

    rng = random.Random(20260819)
    encoder = EventSequenceEncoder()
    lengths = []
    n_samples = 200
    with tempfile.TemporaryDirectory() as td:
        for i in range(n_samples):
            # note-density mixture calibrated to the ~700-token 8-bar median:
            # lognormal-ish around 21 notes/bar, clipped to [6, 40]
            npb = max(6, min(40, int(rng.lognormvariate(3.05, 0.35))))
            path = os.path.join(td, f"s{i}.mid")
            make_commu_midi(path, num_measures=8, seed=i, notes_per_bar=npb)
            info = make_sample_info(num_measures=8, seed=i)
            seq = encoder.encode(path, sample_info=info)
            # meta (11) + event tokens (incl. EOS): the full generated episode
            lengths.append(11 + len(seq))
    lengths.sort()
    med = lengths[len(lengths) // 2]
    out = {
        "description": "8-bar episode token lengths: synthetic MIDI through "
                       "the real encoder, density mixture calibrated to the "
                       "~700-token corpus median (see module docstring)",
        "median": med,
        "p10": lengths[len(lengths) // 10],
        "p90": lengths[9 * len(lengths) // 10],
        "lengths": lengths,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "episode_lengths.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}: n={len(lengths)} median={med} "
          f"p10={out['p10']} p90={out['p90']}")


if __name__ == "__main__":
    main()
