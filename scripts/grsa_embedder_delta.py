"""RSA semantic-side delta across text embedders (round-3 VERDICT item 6).

The reference's RSA regressions use GloVe-840B similarities
(pig/grsa.py:208-233); this image has no egress to fetch them, so the repo
offers three trained-here semantic spaces: the true-GloVe-objective vectors
(analysis/glove.py), PPMI-SVD (analysis/embeddings.py), and a hashing
baseline.  This script quantifies how much the RSA *semantic* coefficients
depend on that choice, over the corpus the analysis actually studies (the
1903 shipped transcripts):

- pairs utterances exactly like grsa.unpairwise_data (same covariates),
- computes semsim under each embedder,
- reports cross-embedder correlation of semsim and each embedder's
  correlation with the non-model covariates (sametype, distance,
  durationdiff) — the rows of rsa_*_correlations.tex that do not require a
  trained checkpoint.

Usage: python scripts/grsa_embedder_delta.py [--data_dir DIR] [--out FILE]
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(data_dir: str, out: str, n_pairs: int = 4000) -> int:
    import numpy as np
    import pandas as pd

    from peppa_tpu.analysis.grsa import (UttData, make_text_embedder,
                                         realign_paths, unpairwise_data)

    audio_d, anno_d = realign_paths("dialog", data_dir)
    audio_n, anno_n = realign_paths("narration", data_dir)

    embedders = {}
    for kind in ("glove_corpus", "corpus", "hashing"):
        try:
            embedders[kind] = make_text_embedder(
                kind if kind != "hashing" else "none", data_dir)
        except Exception as e:
            print(f"embedder {kind}: unavailable ({e})")
    if "glove_corpus" not in embedders:
        return 1

    frames = {}
    for kind, embed in embedders.items():
        data = UttData(audio_d + audio_n, anno_d + anno_n, multiword=True)
        utts = list(data.utterances(read_audio=False, embed=embed))
        # model-embedding-free records: drop sim_1/sim_2 via zero embeddings
        for u in utts:
            u.embedding_1 = np.zeros(2, np.float32)
            u.embedding_2 = np.zeros(2, np.float32)
        rows = list(unpairwise_data(utts, seed=0))[:n_pairs]
        frames[kind] = pd.DataFrame(rows)

    report = []
    base = frames["glove_corpus"]
    for kind, df in frames.items():
        row = {"embedder": kind,
               "semsim_vs_glove_corpus": float(np.corrcoef(
                   df.semsim, base.semsim)[0, 1])}
        for cov in ("sametype", "distance", "durationdiff"):
            row[f"corr_{cov}"] = float(np.corrcoef(
                df.semsim, df[cov].astype(float))[0, 1])
        report.append(row)
    rep = pd.DataFrame(report)
    print(rep.to_string(index=False, float_format=lambda x: f"{x:.3f}"))
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        rep.to_csv(out, index=False)
        print(f"written: {out}")
    return 0


if __name__ == "__main__":
    logging.getLogger().setLevel(logging.ERROR)
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default="/root/reference/data")
    p.add_argument("--out", default="results/rsa_embedder_delta.csv")
    args = p.parse_args()
    sys.exit(main(args.data_dir, args.out))
