"""Dataset preprocessing: MIDI -> augmentation -> tokens -> npy.

CLI mirror of the reference's ``preprocess.py`` (reference: preprocess.py:7-22).

    python preprocess.py --root_dir ./dataset --csv_path ./dataset/commu_meta.csv
"""
import argparse
from multiprocessing import cpu_count
from pathlib import Path


def parse_args():
    p = argparse.ArgumentParser("dataset preprocessing")
    p.add_argument("--root_dir", type=str, required=True,
                   help="root directory containing '{split}/raw' directories")
    p.add_argument("--csv_path", type=str, required=True,
                   help="csv file path containing meta info")
    p.add_argument("--num_cores", type=int, default=max(1, cpu_count() - 4))
    return p.parse_args()


def main():
    args = parse_args()
    from commu_tpu.utils.logging import configure_logging
    configure_logging(None)
    from commu_tpu.preprocess.pipeline import PreprocessPipeline

    PreprocessPipeline()(
        root_dir=Path(args.root_dir).expanduser(),
        csv_path=args.csv_path,
        num_cores=max(1, args.num_cores),
    )


if __name__ == "__main__":
    main()
