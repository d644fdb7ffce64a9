"""Minimal-pairs eval-set generation CLI.

Parity: reference generate_targeted_triplets_eval_sets.py — flags and output
files are identical; the logic lives in
peppa_tpu/evaluation/eval_set_generation.py.
"""

import argparse
import logging

from peppa_tpu.evaluation.eval_set_generation import generate


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--min-occurrences", type=int, default=10,
                        help="Minimum occurrences in val data for a word")
    parser.add_argument("--min-phrase-duration", type=float, default=0.3,
                        help="Minimum duration of a phrase (seconds)")
    parser.add_argument("--realign-dir", default="data/out/realign")
    parser.add_argument("--eval-dir", default="data/eval")
    return parser.parse_args()


if __name__ == "__main__":
    logging.getLogger().setLevel(logging.INFO)
    args = get_args()
    generate(realign_dir=args.realign_dir, eval_dir=args.eval_dir,
             min_occurrences=args.min_occurrences,
             min_phrase_duration=args.min_phrase_duration)
