"""Evaluation CLI — capability parity with reference evaluate.py.

Usage: python evaluate.py --versions 0 1 2
"""

import argparse

import peppa_tpu.evaluation.evaluation as E


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--versions", type=str, nargs="+")
    parser.add_argument("--log_dir", type=str, default="lightning_logs")
    parser.add_argument("--results_dir", type=str, default="results")
    parser.add_argument("--n_samples", type=int, default=500)
    return parser.parse_args()


if __name__ == "__main__":
    from peppa_tpu.utils.compile_cache import (
        apply_platform_override, enable_persistent_compilation_cache)

    apply_platform_override()
    enable_persistent_compilation_cache()
    args = get_args()
    E.full_run(versions=args.versions, log_dir=args.log_dir,
               results_dir=args.results_dir, n_samples=args.n_samples)
