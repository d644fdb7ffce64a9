"""Validation against a reference checkout's shipped data artifacts.

The reference repo ships 1903 force-aligned transcripts
(data/out/realign/**.json), speaker annotations, and the targeted eval-set
CSVs — real data this framework's corresponding components can be validated
on end-to-end (no media required).  Run with a reference checkout:

    python scripts/validate_against_reference.py /path/to/peppa [--generate]

Checks:
1. every alignment JSON parses through UttData; phoneme (IPA) coverage;
2. frequent-word selection for the targeted eval sets overlaps the words the
   reference's spaCy pipeline selected (our built-in tagger, no downloads);
3. with --generate: full minimal-pairs generation, compared to the shipped
   eval_set_narration_{VERB,ADJ}.csv row counts and pair types.

Last recorded run (reference @ v0, round 2):
  alignments: 1903 files, 11092 words, 95.1% with IPA phonemes,
              1581 multiword utterances, 25 speakers
  word overlap: VERB 20/20, ADJ 8/8 vs the shipped eval sets
  full generation (--generate, minutes vs reference's hours-long O(n^4) scan):
    VERB 4790 rows vs 4776 shipped, 4655 identical (97.5%)
    ADJ   406 rows vs  402 shipped,  393 identical (97.8%)
  (tags come from the reference's SHIPPED spaCy annotations when spaCy isn't
   installed, and the reference run's machine-specific enumeration order is
   recovered from the shipped CSVs' id column — see
   eval_set_generation.apply_reference_order. The check FAILS below 95% row
   agreement.)
"""

import argparse
import logging
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(ref: str, generate: bool) -> int:
    import pandas as pd

    from peppa_tpu.analysis.grsa import UttData, realign_paths
    from peppa_tpu.evaluation.eval_set_generation import (
        WORDS_IGNORE,
        get_lemmatized_words,
        load_realigned_data,
    )

    data_dir = f"{ref}/data"
    ok = True

    # 1. alignment parsing + phoneme coverage
    audio_d, anno_d = realign_paths("dialog", data_dir)
    audio_n, anno_n = realign_paths("narration", data_dir)
    data = UttData(audio_d + audio_n, anno_d + anno_n, multiword=False)
    utts = list(data.utterances(read_audio=False))
    n_ph = sum(1 for u in utts if u.phonemes)
    cov = 100 * n_ph / max(len(utts), 1)
    print(f"[1] alignments: {len(anno_d) + len(anno_n)} files, "
          f"{len(utts)} words, {cov:.1f}% with IPA phonemes")
    if len(utts) < 1000 or cov < 90:
        print("    FAIL: expected >=1000 words with >=90% phoneme coverage")
        ok = False

    # 2. frequent-word selection vs shipped eval sets
    _, toks = load_realigned_data(f"{data_dir}/out/realign")
    for pos in ("VERB", "ADJ"):
        words = get_lemmatized_words(toks, "val", ["narration"], pos)
        counter = Counter(words)
        ours = {w for w, occ in counter.items()
                if occ > 10 and w not in WORDS_IGNORE[pos]}
        ref_csv = f"{data_dir}/eval/eval_set_narration_{pos}.csv"
        ref_words = set(pd.read_csv(ref_csv).target_word)
        overlap = len(ours & ref_words)
        print(f"[2] {pos}: word overlap {overlap}/{len(ref_words)} "
              f"(missing {sorted(ref_words - ours)})")
        if overlap < 0.7 * len(ref_words):
            print("    FAIL: <70% overlap")
            ok = False

    # 3. optional full generation comparison: >=95% row agreement required
    if generate:
        import tempfile

        from peppa_tpu.evaluation.eval_set_generation import generate as gen

        def row_key(df):
            return Counter(zip(df.transcript, df.target_word,
                               df.distractor_word, df.clipStart.round(2),
                               df.clipEnd.round(2)))

        with tempfile.TemporaryDirectory() as tmp:
            gen(realign_dir=f"{data_dir}/out/realign", eval_dir=tmp,
                pos_tags=["VERB", "ADJ"])
            for pos in ("VERB", "ADJ"):
                ours = pd.read_csv(f"{tmp}/eval_set_narration_{pos}.csv")
                refd = pd.read_csv(
                    f"{data_dir}/eval/eval_set_narration_{pos}.csv")
                matched = sum((row_key(ours) & row_key(refd)).values())
                pct = 100 * matched / max(len(refd), 1)
                print(f"[3] {pos}: generated {len(ours)} rows, reference "
                      f"shipped {len(refd)}, {matched} rows identical "
                      f"({pct:.1f}% of shipped)")
                if pct < 95.0:
                    print(f"    FAIL: <95% row agreement for {pos}")
                    ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    logging.getLogger().setLevel(logging.ERROR)
    parser = argparse.ArgumentParser()
    parser.add_argument("reference", nargs="?", default="/root/reference")
    parser.add_argument("--generate", action="store_true")
    args = parser.parse_args()
    sys.exit(main(args.reference, args.generate))
