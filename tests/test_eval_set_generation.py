"""Tests for minimal-pairs eval-set generation over synthetic alignments."""

import json
import os

import pytest

from peppa_tpu.evaluation.eval_set_generation import (
    TOKEN_MASK,
    clean_lemma,
    clean_transcript,
    fallback_tagger,
    find_minimal_pairs,
    generate,
    get_start_and_end_of_sublist,
    longest_intersection,
)


def test_clean_transcript():
    assert clean_transcript("Peppa jumps!  ") == "Peppa jumps"
    assert clean_transcript("big - muddy puddles.") == "big muddy puddles"


def test_clean_lemma():
    assert clean_lemma("Granddad") == "grandpa"
    assert clean_lemma("puddle,") == "puddle"


def test_longest_intersection_covers_mask():
    s1 = ["the", TOKEN_MASK, "dog", "runs", "fast"]
    s2 = ["a", TOKEN_MASK, "dog", "runs", "slowly"]
    assert longest_intersection(s1, s2) == [TOKEN_MASK, "dog", "runs"]
    # a longer match NOT covering the mask must lose to a shorter one that does
    s1 = [TOKEN_MASK, "x", "a", "b", "c", "d"]
    s2 = ["a", "b", "c", "d", TOKEN_MASK, "x"]
    got = longest_intersection(s1, s2)
    assert TOKEN_MASK in got


def test_get_start_and_end():
    assert get_start_and_end_of_sublist(["a", "b", "c", "b", "c"],
                                        ["b", "c"]) == (1, 2)
    with pytest.raises(RuntimeError):
        get_start_and_end_of_sublist(["a"], ["z"])


def test_fallback_tagger_basics():
    tags = dict(zip(["peppa", "jumps", "muddy", "puddles"],
                    fallback_tagger(["peppa", "jumps", "muddy", "puddles"])))
    assert tags["peppa"] == ("NOUN", "peppa")
    assert tags["jumps"][0] == "VERB" and tags["jumps"][1] == "jump"
    assert tags["muddy"][0] == "ADJ"
    assert tags["puddles"] == ("NOUN", "puddle")


def make_realign(root, fragment, episode, part, idx, words, speaker="Narrator"):
    d = root / fragment / f"ep_{episode}" / str(part)
    d.mkdir(parents=True, exist_ok=True)
    t = 0.5
    entries = []
    for w in words:
        entries.append({"word": w, "alignedWord": w.lower(),
                        "case": "success", "start": t, "end": t + 0.4})
        t += 0.5
    payload = {"transcript": " ".join(words), "words": entries,
               "speaker": speaker, "clipStart": 10.0, "clipEnd": 10.0 + t,
               "episode_filepath": "ep.mp4"}
    with open(d / f"{idx}.json", "w") as f:
        json.dump(payload, f)


def test_generate_end_to_end(tmp_path):
    realign = tmp_path / "realign"
    # narration val episodes are 1..104; repeat sentences so lemmas pass the
    # min_occurrences threshold
    for ep in range(1, 9):
        make_realign(realign, "narration", ep, 0, 0,
                     ["peppa", "jumps", "in", "muddy", "puddles"])
        make_realign(realign, "narration", ep, 0, 1,
                     ["george", "runs", "in", "muddy", "puddles"])
        make_realign(realign, "narration", ep, 1, 0,
                     ["peppa", "loves", "the", "big", "ball"])
        make_realign(realign, "narration", ep, 1, 1,
                     ["george", "loves", "the", "little", "ball"])
    eval_dir = tmp_path / "eval"
    generate(realign_dir=str(realign), eval_dir=str(eval_dir),
             min_occurrences=4, min_phrase_duration=0.3,
             pos_tags=["NOUN", "ADJ"])
    import pandas as pd

    adj = pd.read_csv(eval_dir / "eval_set_narration_ADJ.csv")
    assert len(adj) > 0 and len(adj) % 2 == 0
    # examples pair up with their counterexample by adjacent ids
    row = adj.iloc[0]
    ce = adj[adj["id"] == row["id_counterexample"]].iloc[0]
    assert row["target_word"] == ce["distractor_word"]
    assert row["distractor_word"] == ce["target_word"]
    assert row["clipStart"] < row["clipEnd"]
    # clip times are absolute (offset by the utterance clipStart)
    assert row["clipStart"] >= 10.0
    noun = pd.read_csv(eval_dir / "eval_set_narration_NOUN.csv")
    assert {"target_word", "distractor_word", "id_counterexample",
            "clipStart", "clipEnd", "fragment"} <= set(noun.columns)


def test_generate_preserves_shipped_annotation_csvs(tmp_path):
    """generate() with output dir == annotation dir (the reference's default
    layout: both are data/eval) must snapshot the shipped CSVs to
    reference_originals/ BEFORE overwriting, and later runs must read the
    snapshot — never our own previous output."""
    import pandas as pd

    from peppa_tpu.evaluation.eval_set_generation import (
        default_annotations_dir, preserve_reference_annotations)

    realign = tmp_path / "data" / "out" / "realign"
    for ep in range(1, 9):
        make_realign(realign, "narration", ep, 0, 0,
                     ["peppa", "loves", "the", "big", "ball"])
        make_realign(realign, "narration", ep, 0, 1,
                     ["george", "loves", "the", "little", "ball"])
    eval_dir = tmp_path / "data" / "eval"
    eval_dir.mkdir(parents=True)
    # a stand-in for the reference's shipped (spaCy-annotated) CSV
    shipped = pd.DataFrame({
        "id": [0, 1], "target_word": ["big", "little"],
        "distractor_word": ["little", "big"], "id_counterexample": [1, 0],
        "transcript": ["peppa loves the big ball",
                       "george loves the little ball"],
        "tokenized": ["peppa loves the big ball",
                      "george loves the little ball"],
        "lemmatized": ["peppa love the big ball",
                       "george love the little ball"],
        "pos": ["NOUN VERB DET ADJ NOUN", "NOUN VERB DET ADJ NOUN"],
        "clipStart": [0.0, 0.0], "clipEnd": [1.0, 1.0],
        "fragment": ["narration", "narration"]})
    shipped_path = eval_dir / "eval_set_narration_ADJ.csv"
    shipped.to_csv(shipped_path, index=False)
    shipped_bytes = shipped_path.read_bytes()

    generate(realign_dir=str(realign), eval_dir=str(eval_dir),
             min_occurrences=4, min_phrase_duration=0.3, pos_tags=["ADJ"])

    preserved = eval_dir / "reference_originals" / "eval_set_narration_ADJ.csv"
    assert preserved.read_bytes() == shipped_bytes
    # the output overwrote the eval_dir copy (reference path parity)...
    assert shipped_path.read_bytes() != shipped_bytes
    # ...and the annotation source now resolves to the snapshot
    assert default_annotations_dir(str(realign)) == str(
        eval_dir / "reference_originals")
    # a second preserve pass never clobbers the snapshot with our output
    preserve_reference_annotations(str(eval_dir))
    assert preserved.read_bytes() == shipped_bytes
