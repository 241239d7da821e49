"""Build a synthetic ComMU-format training corpus (output_npy dir).

The real 11,144-sample corpus is not vendored (reference
`.MISSING_LARGE_BLOBS`), so long training runs use this stand-in: synthetic
MIDI across a spread of note densities, measure counts, keys and bpm, run
through the REAL meta+event encoders into the object-array npy contract
(`{input,target}_{split}.npy`, reference preprocessor.py:306-319).  Token
statistics (sequence lengths, vocab coverage of the event region) land in
the corpus's range; the content is synthetic melodies, so NLL values are
not comparable to real-corpus training — the point is full-size bf16
training *stability* evidence (loss descent, bounded grad norms), not
musical quality.

Usage: python scripts/make_synthetic_corpus.py OUT_DIR [--n 600]
"""
import argparse
import os
import random
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=600)
    ap.add_argument("--val_frac", type=float, default=0.1)
    args = ap.parse_args()

    import numpy as np

    from commu_tpu.preprocess.event_codec import EventSequenceEncoder
    from commu_tpu.preprocess.meta_parser import MetaParser
    from commu_tpu.vocab.meta_codec import encode_meta
    from tests.helpers import make_commu_midi, make_sample_info

    rng = random.Random(1111)
    encoder = EventSequenceEncoder()
    parser = MetaParser()
    inputs, targets = [], []
    with tempfile.TemporaryDirectory() as td:
        for i in range(args.n):
            measures = rng.choice([4, 4, 8, 8, 8, 16])
            npb = max(4, min(40, int(rng.lognormvariate(3.0, 0.45))))
            bpm = rng.choice(range(40, 200, 10))
            key = rng.randrange(12)
            path = os.path.join(td, f"s{i}.mid")
            make_commu_midi(path, bpm=bpm, num_measures=measures, seed=i,
                            key_number=key, notes_per_bar=npb)
            info = make_sample_info(num_measures=measures, seed=i, bpm=bpm)
            meta = parser.parse(info)
            meta_tokens = np.asarray(encode_meta(meta), dtype=np.int64)
            event_tokens = np.asarray(
                encoder.encode(path, sample_info=info), dtype=np.int64)
            inputs.append(meta_tokens)
            targets.append(event_tokens)

    n_val = max(1, int(args.n * args.val_frac))
    os.makedirs(args.out_dir, exist_ok=True)

    def dump(name, arrs):
        obj = np.empty(len(arrs), dtype=object)
        for j, a in enumerate(arrs):
            obj[j] = a
        np.save(os.path.join(args.out_dir, name), obj, allow_pickle=True)

    dump("input_train.npy", inputs[n_val:])
    dump("target_train.npy", targets[n_val:])
    dump("input_val.npy", inputs[:n_val])
    dump("target_val.npy", targets[:n_val])
    total = sum(len(t) for t in targets)
    print(f"wrote {args.out_dir}: {args.n - n_val} train / {n_val} val "
          f"samples, {total} event tokens, "
          f"median len {int(np.median([len(t) for t in targets]))}")


if __name__ == "__main__":
    main()
