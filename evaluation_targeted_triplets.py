"""Minimal-pairs evaluation CLI — parity with reference evaluation_targeted_triplets.py.

Usage:
  python evaluation_targeted_triplets.py --run --versions 0 1
  python evaluation_targeted_triplets.py --plot
"""

import argparse
import logging
import os

import numpy as np

FRAGMENTS = ["narration"]  # reference evaluation_targeted_triplets.py:20
POS_TAGS = ["ADJ", "VERB", "NOUN"]  # reference :21
RESULTS_DIR = "results/targeted_triplets"


def evaluate(version, log_dir="lightning_logs", data_dir="data",
             batch_size=8):
    """Per-POS minimal-pairs scores for one run version.

    Parity: reference evaluation_targeted_triplets.py:34-64.
    """
    import pandas as pd

    from peppa_tpu.evaluation.evaluation import make_predict
    from peppa_tpu.evaluation.targeted import (
        get_eval_set_info,
        targeted_triplet_score,
    )
    from peppa_tpu.training.checkpoint import load_best_model

    dirname = os.path.join(log_dir, f"version_{version}")
    model, variables, config, _ = load_best_model(dirname)
    predict_fn = make_predict(model, variables)
    rows = []
    for fragment in FRAGMENTS:
        for pos in POS_TAGS:
            for scrambled in (False, True):
                logging.info("Evaluating %s/%s scrambled=%s", fragment, pos,
                             scrambled)
                scores = targeted_triplet_score(
                    fragment, pos, predict_fn, batch_size=batch_size,
                    scrambled_video=scrambled,
                    target_size=config.data.target_size,
                    audio_sample_rate=config.data.audio_sample_rate,
                    data_dir=data_dir)
                info = get_eval_set_info(fragment, pos, data_dir)
                assert len(scores) == len(info), \
                    f"{len(scores)} scores vs {len(info)} eval rows"
                df = info.copy()
                df["result"] = scores
                df["pos"] = pos
                df["fragment"] = fragment
                df["scrambled_video"] = scrambled
                rows.append(df)
    out = pd.concat(rows)
    outdir = os.path.join(RESULTS_DIR, f"version_{version}")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "minimal_pairs_scores.csv")
    out.to_csv(path)
    logging.info("Wrote %s", path)


def create_results_table():
    """Bootstrapped per-condition minimal-pairs table -> minimal_pairs.tex.

    Parity: reference evaluation_targeted_triplets.py:314-373.
    """
    import glob

    import pandas as pd
    import yaml

    rng = np.random.default_rng(666)
    rows = []
    for path in sorted(glob.glob(os.path.join(RESULTS_DIR, "version_*",
                                              "minimal_pairs_scores.csv"))):
        version = int(path.split("version_")[1].split("/")[0])
        data = pd.read_csv(path)
        condition = _condition_for_version(version)
        for (pos, scrambled), group in data.groupby(["pos", "scrambled_video"]):
            scores = group["result"].to_numpy()
            boot = [scores[rng.integers(0, len(scores), len(scores))].mean()
                    for _ in range(500)]
            rows.append({"version": version, "condition": condition,
                         "pos": pos, "scrambled_video": scrambled,
                         "accuracy": float(np.mean(boot)),
                         "std": float(np.std(boot)),
                         "n": len(scores)})
    table = pd.DataFrame.from_records(rows)
    os.makedirs("results", exist_ok=True)
    table.to_csv("results/minimal_pairs.csv", index=False)
    table.to_latex("results/minimal_pairs.tex", index=False,
                   float_format="%.3f")
    logging.info("Wrote results/minimal_pairs.tex")


def _condition_for_version(version):
    import yaml

    try:
        with open("conditions.yaml") as f:
            conditions = yaml.safe_load(f)
        for name, versions in conditions.items():
            if version in versions:
                return name
    except FileNotFoundError:
        pass
    return "unknown"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--run", action="store_true")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("--versions", type=str, nargs="+", default=[])
    parser.add_argument("--log_dir", type=str, default="lightning_logs")
    parser.add_argument("--data_dir", type=str, default="data")
    args = parser.parse_args()
    logging.getLogger().setLevel(logging.INFO)
    if args.run:
        for version in args.versions:
            evaluate(version, log_dir=args.log_dir, data_dir=args.data_dir)
    if args.plot:
        create_results_table()


if __name__ == "__main__":
    main()
