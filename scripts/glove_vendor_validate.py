"""Zero-code path from "GloVe file appears" to "published-space RSA".

The reference's published `semsim` RSA coefficients come from GloVe-840B
vectors loaded via torchtext (pig/grsa.py:208-233).  This image has no
egress, so the repo ships trained corpus-GloVe vectors instead
(analysis/glove.py) — honest, but the published semantic space stays
unreproduced until the true vectors are vendored.

This validator closes the loop the moment they are:

1. **No vendored file yet** (exit 2): writes the EXACT vocabulary the RSA
   analysis embeds (every force-aligned word, lowercased) to
   `results/glove_vocab_needed.txt`, with instructions.  A vendor greps the
   840B file for those rows — a few MB instead of 2 GB:

       grep -Fw -f results/glove_vocab_needed.txt glove.840B.300d.txt \
           > data/in/glove/glove.840B.subset.txt

2. **Vendored file present** (any `data/in/glove/*.txt` that is not the
   trained `zz_corpus_glove.*`): validates the format and vocabulary
   coverage, then re-runs the RSA semantic-side comparison — `semsim` under
   the vendored space vs the corpus-GloVe space over identical utterance
   pairs (same pairing as scripts/grsa_embedder_delta.py) — and writes
   `results/rsa_vendored_delta.csv`.  Exit 0.

No code changes are needed anywhere else: `glove_text_embedder` already
prefers the vendored file by sort order (pig/grsa.py:208-233 parity;
analysis/grsa.py:235-260), so every downstream RSA run picks it up.

Usage: python scripts/glove_vendor_validate.py [--data_dir DIR]
       [--transcripts_dir DIR] [--out FILE] [--n-pairs N]
"""

import argparse
import glob
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def needed_vocab(transcripts_dir: str):
    """Every word the RSA analysis embeds, lowercased, from the realign
    transcripts (the same validity rule as UttData.valid_word)."""
    from peppa_tpu.analysis.grsa import realign_paths

    vocab = set()
    for fragment in ("dialog", "narration"):
        try:
            _, anno = realign_paths(fragment, transcripts_dir)
        except Exception:
            continue
        for path in anno:
            with open(path) as f:
                meta = json.load(f)
            for word in meta.get("words", []):
                if word.get("case") == "success":
                    vocab.add(word["word"].lower())
    return sorted(vocab)


def find_vendored(data_dir: str):
    """A dropped GloVe file: any data/in/glove/*.txt except the trained
    zz_corpus_glove.* (which sorts last by design, analysis/glove.py)."""
    for path in sorted(glob.glob(os.path.join(data_dir, "in", "glove",
                                              "*.txt"))):
        if not os.path.basename(path).startswith("zz_corpus_glove"):
            return path
    return None


def validate_format(path: str, vocab):
    """Parse the vendored file; return (n_rows, dim, coverage over vocab).

    Two deliberate choices, both matching the consumer
    (analysis/grsa.py::glove_text_embedder):
    - coverage counts a vocab word only if the file token matches it
      EXACTLY: the embedder stores vectors case-sensitively and looks up
      lowercased words, so a 'Peppa'-only row would validate-as-covered
      but embed zeros.  Case-only matches are reported as a warning.
    - unparseable rows are skipped, not fatal: glove.840B contains
      multiword tokens ('. . .', addresses) that a `grep -Fw` selection
      legitimately drags in; the embedder ignores them too.
    """
    import numpy as np

    dims = set()
    present = set()
    case_only = set()
    n = skipped = 0
    wanted = set(vocab)
    with open(path, encoding="utf8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) < 2:
                continue
            try:
                vec = np.asarray(parts[1:], np.float32)
            except ValueError:
                skipped += 1  # multiword token row; embedder skips it too
                continue
            if not np.isfinite(vec).all():
                raise ValueError(f"non-finite vector for {parts[0]!r}")
            dims.add(len(vec))
            n += 1
            if parts[0] in wanted:
                present.add(parts[0])
            elif parts[0].lower() in wanted:
                case_only.add(parts[0])
    if skipped:
        print(f"note: skipped {skipped} unparseable rows (multiword tokens)")
    if case_only:
        print(f"WARNING: {len(case_only)} tokens match the vocabulary only "
              f"by case ({sorted(case_only)[:5]}...); the embedder looks up "
              f"lowercase keys, so these rows will NOT be used — vendor "
              f"lowercase-token rows for them")
    if len(dims) != 1:
        raise ValueError(f"inconsistent vector dims in {path}: {sorted(dims)}")
    return n, dims.pop(), (len(present) / max(len(wanted), 1))


def rsa_delta(data_dir: str, transcripts_dir: str, vendored_path: str,
              out: str, n_pairs: int = 4000) -> dict:
    """semsim under the vendored space vs the corpus-GloVe space over
    identical utterance pairs + covariate correlations (the checkpoint-free
    rows of the RSA tables)."""
    import numpy as np
    import pandas as pd

    from peppa_tpu.analysis.glove import ensure_corpus_glove
    from peppa_tpu.analysis.grsa import (UttData, glove_text_embedder,
                                         realign_paths, unpairwise_data)

    audio_d, anno_d = realign_paths("dialog", transcripts_dir)
    audio_n, anno_n = realign_paths("narration", transcripts_dir)
    embedders = {
        "vendored": glove_text_embedder(path=vendored_path),
        "glove_corpus": glove_text_embedder(
            path=ensure_corpus_glove(data_dir,
                                     transcripts_dir=transcripts_dir)),
    }
    frames = {}
    for kind, embed in embedders.items():
        data = UttData(audio_d + audio_n, anno_d + anno_n, multiword=True)
        utts = list(data.utterances(read_audio=False, embed=embed))
        for u in utts:  # model-embedding-free records
            u.embedding_1 = np.zeros(2, np.float32)
            u.embedding_2 = np.zeros(2, np.float32)
        rows = list(unpairwise_data(utts, seed=0))[:n_pairs]
        frames[kind] = pd.DataFrame(rows)

    base = frames["glove_corpus"]
    report = []
    for kind, df in frames.items():
        row = {"embedder": kind, "source": (vendored_path if kind == "vendored"
                                            else "trained corpus GloVe"),
               "semsim_vs_glove_corpus": float(np.corrcoef(
                   df.semsim, base.semsim)[0, 1])}
        for cov in ("sametype", "distance", "durationdiff"):
            row[f"corr_{cov}"] = float(np.corrcoef(
                df.semsim, df[cov].astype(float))[0, 1])
        report.append(row)
    rep = pd.DataFrame(report)
    print(rep.to_string(index=False, float_format=lambda x: f"{x:.3f}"))
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    rep.to_csv(out, index=False)
    print(f"written: {out}")
    return report[0]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data",
                    help="where data/in/glove/ lives (drop point)")
    ap.add_argument("--transcripts_dir", default="/root/reference/data",
                    help="realign transcripts for the vocabulary/pairs")
    ap.add_argument("--out", default="results/rsa_vendored_delta.csv")
    ap.add_argument("--vocab_out", default="results/glove_vocab_needed.txt")
    ap.add_argument("--n-pairs", type=int, default=4000)
    args = ap.parse_args(argv)

    vocab = needed_vocab(args.transcripts_dir)
    os.makedirs(os.path.dirname(args.vocab_out) or ".", exist_ok=True)
    with open(args.vocab_out, "w") as f:
        f.write("\n".join(vocab) + "\n")
    print(f"RSA vocabulary: {len(vocab)} words -> {args.vocab_out}")

    vendored = find_vendored(args.data_dir)
    if vendored is None:
        print(
            "No vendored GloVe file found.  To reproduce the published\n"
            "semantic space, subset GloVe-840B over the vocabulary above:\n\n"
            f"  grep -Fw -f {args.vocab_out} glove.840B.300d.txt \\\n"
            f"      > {args.data_dir}/in/glove/glove.840B.subset.txt\n\n"
            "then re-run this script — it will validate the file and produce\n"
            "results/rsa_vendored_delta.csv automatically.  Every other RSA\n"
            "entry point already prefers the vendored file by sort order.")
        return 2

    n, dim, coverage = validate_format(vendored, vocab)
    print(f"vendored file: {vendored} ({n} rows, dim {dim}, "
          f"vocabulary coverage {coverage:.1%})")
    if coverage < 0.5:
        print("WARNING: coverage below 50% — is this the right subset?")
    rsa_delta(args.data_dir, args.transcripts_dir, vendored, args.out,
              n_pairs=args.n_pairs)
    return 0


if __name__ == "__main__":
    logging.getLogger().setLevel(logging.ERROR)
    sys.exit(main())
