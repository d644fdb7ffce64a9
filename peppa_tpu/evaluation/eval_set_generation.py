"""Minimal-pairs eval-set generation from force-aligned transcripts.

Capability parity: reference generate_targeted_triplets_eval_sets.py — POS-tag
and lemmatize the realigned transcripts, pick frequent same-POS word pairs
(lemma_1, lemma_2), and for each sentence containing lemma_1 find the
counterexample sentence containing lemma_2 whose masked token sequence shares
the longest common phrase covering the mask; crop both to that phrase and
emit data/eval/eval_set_{fragment}_{pos}.csv rows with clipStart/clipEnd/
target_word/distractor_word/id_counterexample.

Differences from the reference, by design:
- The longest-intersection search is an O(n*m) common-substring DP instead of
  the reference's O(n^4) nested scan (identical result: the longest common
  contiguous token span whose occurrence in the example covers the mask).
- Tagging is pluggable: spaCy (lookup lemmatizer, as the reference) when
  installed, otherwise a built-in rule lemmatizer + lexicon POS tagger tuned
  for this corpus's vocabulary (documented approximation).
"""

from __future__ import annotations

import itertools
import json
import logging
import os
import re
from collections import Counter
from typing import Callable, Dict, List, Optional, Sequence, Tuple

FRAGMENTS = ["narration"]  # reference :20
POS_TAGS = ["ADJ", "VERB", "NOUN"]  # reference :21

WORDS_NAMES = ["chloe", "danny", "george", "pedro", "peppa", "rebecca",
               "richard", "susie", "suzy"]  # reference :23-33

SYNONYMS_REPLACE = {"granddad": "grandpa", "mommy": "mummy",
                    "grandma": "granny"}  # reference :35

# words the reference excludes as POS-tagger mistakes (reference :38-46)
WORDS_IGNORE = {
    "VERB": ["they're", "we're", "what's", "can't"],
    "NOUN": ["peppa's", "george's", "let's", "pig's", "i'll", "rabbit's",
             "daddy's", "chloe's", "can't", "doesn't", "suzy's", "zebra's",
             "zoe's", "it's", "dog's", "dinosaur's", "they're", "grandpa's",
             "rebecca's", "we've", "there's", "you'll", "i'm", "we'll",
             "i've", "what's", "i'll", "that's", "you're", "we'd", "we're",
             "bit", "lot", "be", "dear", "love"],
    "ADJ": ["it's", "that's"],
}

TOKEN_MASK = "<MASK>"


def clean_lemma(lemma: str) -> str:
    """Parity: reference :52-59."""
    lemma = lemma.lower()
    if lemma and lemma[-1] in (".", ",", "'", "?", "!"):
        lemma = lemma[:-1]
    return SYNONYMS_REPLACE.get(lemma, lemma)


def clean_transcript(text: str) -> str:
    """Punctuation/whitespace normalization (reference :78-88)."""
    text = re.sub(r"\s*[\.!]+\s*$", "", text)
    text = re.sub(r"\s*[-:\.♪]+\s*", " ", text)
    text = re.sub(r"\s+$", "", text)
    text = re.sub(r"^\s+", "", text)
    text = re.sub(r"\s\s", " ", text)
    return text


# ------------------------------------------------------------------ taggers

# Irregular verb map + domain lexicon for the no-spaCy fallback tagger.
IRREGULAR_VERBS = {
    "is": "be", "are": "be", "was": "be", "were": "be", "been": "be",
    "am": "be", "has": "have", "had": "have", "having": "have",
    "goes": "go", "went": "go", "gone": "go", "going": "go",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "says": "say", "said": "say", "saying": "say",
    "made": "make", "making": "make", "comes": "come", "came": "come",
    "coming": "come", "got": "get", "getting": "get", "gets": "get",
    "ran": "run", "running": "run", "runs": "run",
    "jumped": "jump", "jumping": "jump", "jumps": "jump",
    "played": "play", "playing": "play", "plays": "play",
    "loves": "love", "loved": "love", "loving": "love",
    "likes": "like", "liked": "like", "liking": "like",
    "found": "find", "ate": "eat", "eaten": "eat", "eating": "eat",
    "saw": "see", "seen": "see", "seeing": "see", "sees": "see",
    "took": "take", "taken": "take", "taking": "take",
    "fell": "fall", "fallen": "fall", "falling": "fall",
    "caught": "catch", "catches": "catch",
}

LEXICON_POS = {
    "NOUN": {"pig", "daddy", "mummy", "george", "peppa", "house", "car",
             "garden", "mud", "puddle", "puddles", "dinosaur", "ball",
             "rabbit", "dog", "cat", "duck", "ducks", "friend", "friends",
             "school", "teddy", "grandpa", "granny", "family", "water",
             "rain", "boots", "hill", "tree", "trees", "cake", "snow",
             "sea", "boat", "bicycle", "bike", "toy", "toys", "box",
             "playgroup", "star", "sand", "castle", "ice", "present",
             "birthday", "party", "balloon", "picnic", "basket", "day",
             "time", "home", "bed", "bedtime", "story", "book", "children",
             "everyone", "everybody", "pony", "elephant", "sheep", "zebra",
             "fox", "mole", "kangaroo", "grass", "flower", "flowers",
             "supper", "lunch", "breakfast", "dinner", "hat", "head",
             "nose", "eyes", "feet", "hands", "shop", "shopping",
             "morning", "evening", "night", "bedtime",
             "mr", "mrs", "miss", "madame", "gazelle"},
    "VERB": {"be", "have", "go", "do", "say", "make", "come", "get", "run",
             "jump", "play", "love", "like", "find", "eat", "see", "take",
             "fall", "look", "watch", "help", "want", "need", "put", "ride",
             "swim", "fly", "sing", "dance", "sleep", "wake", "wear",
             "live", "laugh", "cry", "snort", "splash", "climb", "dig",
             "draw", "paint", "build", "drive", "walk", "talk", "tidy",
             "clean", "wash", "cook", "read", "write", "open", "close",
             "stop", "start", "finish", "catch", "throw", "kick", "hide",
             "hop", "skip", "blow", "grow", "know", "think", "thank",
             "arrive", "work", "visit", "bounce", "slide", "carry", "bring",
             "hold", "turn", "push", "pull", "wait", "call", "ask", "tell"},
    "ADJ": {"big", "little", "small", "muddy", "happy", "sad", "good",
            "bad", "best", "favourite", "new", "old", "hot", "cold",
            "wet", "dry", "clean", "dirty", "tall", "short", "long",
            "fast", "slow", "loud", "quiet", "naughty", "clever", "silly",
            "funny", "lovely", "beautiful", "magic", "heavy", "light",
            "high", "low", "easy", "hard", "soft", "full", "empty",
            "ready", "tired", "hungry", "scary", "dark", "bright",
            "asleep", "own", "dear", "well", "fine", "nice", "poor",
            "green", "red", "blue", "yellow", "orange", "pink"},
}


def rule_lemmatize(word: str, pos: str) -> str:
    """Suffix-stripping lemmatizer for the fallback tagger."""
    w = word.lower()
    if pos == "VERB" and w in IRREGULAR_VERBS:
        return IRREGULAR_VERBS[w]
    for suffix, repl, min_len in (("ies", "y", 4), ("sses", "ss", 5),
                                  ("shes", "sh", 5), ("ches", "ch", 5),
                                  ("xes", "x", 4), ("s", "", 3)):
        if pos == "NOUN" and w.endswith(suffix) and len(w) >= min_len \
                and not w.endswith("ss"):
            return w[:-len(suffix)] + repl
    if pos == "VERB":
        for suffix, min_len in (("ing", 5), ("ed", 4), ("es", 4), ("s", 3)):
            if w.endswith(suffix) and len(w) >= min_len:
                stem = w[:-len(suffix)]
                if suffix in ("ing", "ed") and len(stem) >= 3 \
                        and stem[-1] == stem[-2]:
                    stem = stem[:-1]  # running -> run
                if suffix in ("ing", "ed") and stem + "e" in LEXICON_POS["VERB"]:
                    stem = stem + "e"  # riding -> ride, arrived -> arrive
                return stem
    return w


def fallback_tagger(tokens: Sequence[str]) -> List[Tuple[str, str]]:
    """Lexicon + suffix POS tagger (no-spaCy path).  Returns (pos, lemma)."""
    be_forms = {"be", "is", "are", "was", "were", "am", "been", "being"}
    out = []
    for tok in tokens:
        w = tok.lower().strip(".,!?")
        pos = "X"
        if w in be_forms:
            pos = "AUX"  # spaCy tags 'be' AUX, keeping it out of VERB sets
        elif w in WORDS_NAMES:
            pos = "NOUN"  # PROPN folded into NOUN, reference :100
        else:
            for cand in ("VERB", "ADJ", "NOUN"):
                base = rule_lemmatize(w, cand)
                if w in LEXICON_POS[cand] or base in LEXICON_POS[cand]:
                    pos = cand
                    break
            else:
                if w.endswith("ly"):
                    pos = "ADV"
                elif w.endswith("ing") or w.endswith("ed"):
                    pos = "VERB"
        lemma = rule_lemmatize(w, pos if pos in LEXICON_POS else "NOUN")
        out.append((pos, clean_lemma(lemma)))
    return out


def spacy_tagger() -> Optional[Callable]:
    """The reference's tagger: spaCy with lookup lemmatizer (:62-66)."""
    try:
        import spacy
        from spacy.tokens import Doc

        nlp = spacy.load("en_core_web_sm")
        nlp.remove_pipe("lemmatizer")
        nlp.add_pipe("lemmatizer", config={"mode": "lookup"}).initialize()

        def tag(tokens):
            doc = Doc(nlp.vocab, words=list(tokens))
            for _, proc in nlp.pipeline:
                doc = proc(doc)
            return [(t.pos_ if t.pos_ != "PROPN" else "NOUN",
                     clean_lemma(t.lemma_)) for t in doc]

        return tag
    except Exception:
        return None


def make_tagger() -> Callable:
    tagger = spacy_tagger()
    if tagger is not None:
        return tagger
    logging.warning("spaCy unavailable; using built-in lexicon tagger "
                    "(approximate POS/lemmas)")
    return fallback_tagger


# ------------------------------------------------------------ data loading

def load_realigned_data(realign_dir: str = "data/out/realign",
                        tagger: Optional[Callable] = None):
    """Parse realign JSONs into sentence + token tables (reference :61-121)."""
    import pandas as pd

    tagger = tagger or make_tagger()
    data_sentences, data_tokens = [], []
    for root, _, files in os.walk(realign_dir):
        for file in sorted(files):
            if not file.endswith(".json"):
                continue
            path = os.path.join(root, file)
            with open(path) as f:
                item = json.load(f)
            fragment = "narration" if "narration" in root else "dialog"
            episode = int(path.split("/")[-3].split("_")[1])
            item["transcript"] = clean_transcript(item["transcript"])
            tokenized = item["transcript"].split(" ")
            if len(tokenized) != len(item["words"]):
                raise RuntimeError(
                    f"Not aligned: {tokenized} and "
                    f"{[w['word'] for w in item['words']]}")
            item["tokenized"] = [w.lower() for w in tokenized]
            tags = tagger(tokenized)
            item["pos"] = [p for p, _ in tags]
            item["lemmatized"] = [l for _, l in tags]
            for i, word in enumerate(item["words"]):
                word.update(fragment=fragment, path=path, episode=episode,
                            pos=item["pos"][i], lemma=item["lemmatized"][i])
            data_tokens.extend(item["words"])
            sent = dict(item)
            keep = ("case", "start", "end", "word")
            sent["words"] = [{k: w[k] for k in w if k in keep}
                             for w in item["words"]]
            sent["fragment"] = fragment
            sent["episode"] = episode
            data_sentences.append(sent)
    return pd.DataFrame(data_sentences), pd.DataFrame(data_tokens)


# ------------------------------------------------------- pair-finding logic

def longest_intersection(tokens_1: List[str], tokens_2: List[str]
                         ) -> List[str]:
    """Longest common contiguous sublist whose span in tokens_1 covers the
    mask (reference :206-220, O(n^4) there; O(n*m) suffix DP here)."""
    mask_index = tokens_1.index(TOKEN_MASK)
    n, m = len(tokens_1), len(tokens_2)
    best_len, best_end = 0, -1
    prev = [0] * (m + 1)
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            if tokens_1[i - 1] == tokens_2[j - 1]:
                cur[j] = prev[j - 1] + 1
                start = i - cur[j]  # span [start, i-1] in tokens_1
                if cur[j] > best_len and start <= mask_index <= i - 1:
                    best_len, best_end = cur[j], i
        prev = cur
    if best_len == 0:
        return []
    return tokens_1[best_end - best_len:best_end]


def get_start_and_end_of_sublist(sentence: List[str], sublist: List[str]
                                 ) -> Tuple[int, int]:
    """First occurrence span (reference :223-234)."""
    for i in range(len(sentence) - len(sublist) + 1):
        if sentence[i:i + len(sublist)] == sublist:
            return i, i + len(sublist) - 1
    raise RuntimeError(f"Could not find {sublist} in {sentence}")


def _span_ok(words: List[Dict], start: int, end: int,
             min_phrase_duration: float) -> bool:
    first, last = words[start], words[end]
    return (first.get("case") == "success" and last.get("case") == "success"
            and "start" in first and "end" in last
            and last["end"] - first["start"] >= min_phrase_duration)


def crop_and_create_example(example: Dict, start: int, end: int,
                            target_word: str, distractor_word: str) -> Dict:
    """Parity: reference :237-254."""
    example = dict(example)
    example["tokenized"] = example["tokenized"][start:end + 1]
    example["words"] = example["words"][start:end + 1]
    example["start_token_idx"] = start
    example["end_token_idx"] = end
    example["clipOffset"] = example["clipStart"]
    example["clipStart"] = example["clipOffset"] + example["words"][0]["start"]
    example["clipEnd"] = example["clipOffset"] + example["words"][-1]["end"]
    assert example["clipStart"] < example["clipEnd"]
    example["target_word"] = target_word
    example["distractor_word"] = distractor_word
    return example


def _as_records(data) -> List[Dict]:
    """DataFrame (or record list) -> plain dicts with precomputed lemma sets.

    pandas iterrows materializes a Series per row per tuple — converting once
    and caching set(lemmatized) makes the pair search ~50x faster with
    identical results.
    """
    if isinstance(data, list):
        records = [dict(r) for r in data]
    else:
        records = data.to_dict("records")
    for i, r in enumerate(records):
        r["_row"] = r.get("_row", i)
        r["_lemmas"] = set(r["lemmatized"])
    return records


def find_minimal_pairs_for_tuple(pair: Tuple[str, str], data,
                                 min_phrase_duration: float = 0.3
                                 ) -> List[Dict]:
    """Parity: reference :257-352 (greedy longest-phrase matching)."""
    lemma_1, lemma_2 = pair
    records = _as_records(data)
    results: List[Dict] = []
    used_counterexamples: set = set()
    logging.info("Looking for: (%s, %s)", lemma_1, lemma_2)
    # candidate counterexamples and their masked forms, computed once
    cands = []
    for s2 in records:
        if lemma_2 not in s2["_lemmas"] or lemma_1 in s2["_lemmas"]:
            continue
        s2_masked = [w if lemma != lemma_2 else TOKEN_MASK
                     for w, lemma in zip(s2["tokenized"], s2["lemmatized"])]
        cands.append((s2, s2_masked, set(s2_masked)))
    for s1 in records:
        if lemma_1 not in s1["_lemmas"] or lemma_2 in s1["_lemmas"]:
            continue
        s1_masked = [w if lemma != lemma_1 else TOKEN_MASK
                     for w, lemma in zip(s1["tokenized"], s1["lemmatized"])]
        s1_set = set(s1_masked)
        best = None
        best_len = 0
        for s2, s2_masked, s2_set in cands:
            if s2["_row"] in used_counterexamples:
                continue
            # upper bound: a common substring can't exceed the number of
            # shared token types (cheap prune before the DP)
            if len(s1_set & s2_set) <= best_len:
                continue
            intersection = longest_intersection(s1_masked, s2_masked)
            if len(intersection) <= best_len:
                continue
            start, end = get_start_and_end_of_sublist(s1_masked, intersection)
            if not _span_ok(s1["words"], start, end, min_phrase_duration):
                continue
            ce_start, ce_end = get_start_and_end_of_sublist(s2_masked,
                                                            intersection)
            if not _span_ok(s2["words"], ce_start, ce_end,
                            min_phrase_duration):
                continue
            best_len = len(intersection)
            best = (crop_and_create_example(dict(s1), start, end,
                                            lemma_1, lemma_2),
                    crop_and_create_example(dict(s2), ce_start, ce_end,
                                            lemma_2, lemma_1),
                    s2["_row"])
        if best is not None:
            results.extend(best[:2])
            used_counterexamples.add(best[2])
    return results


def find_minimal_pairs(pairs, data, min_phrase_duration: float = 0.3):
    """Parity: reference :355-371."""
    import pandas as pd

    records = _as_records(data)
    results = [find_minimal_pairs_for_tuple(p, records, min_phrase_duration)
               for p in pairs]
    flat = []
    for rows in results:
        for r in rows:
            r = dict(r)
            r.pop("_lemmas", None)
            r.pop("_row", None)
            flat.append(r)
    eval_set = pd.DataFrame(flat)
    if len(eval_set) > 0:
        eval_set.reset_index(drop=True, inplace=True)
        eval_set["id"] = eval_set.index
        eval_set["id_counterexample"] = eval_set.id.apply(
            lambda x: x + 1 if x % 2 == 0 else x - 1)
        eval_set.set_index("id", inplace=True)
    return eval_set


def get_lemmatized_words(data_tokens, data_split: str,
                         fragments=FRAGMENTS, pos: Optional[str] = None):
    """Parity: reference :374-387."""
    from peppa_tpu.data.dataset import SPLIT_SPEC

    all_words = []
    for fragment in fragments:
        words = data_tokens[
            (data_tokens.fragment == fragment)
            & data_tokens.episode.isin(SPLIT_SPEC[fragment][data_split])]
        if pos:
            words = words[words.pos == pos]
        all_words.extend(words["lemma"].tolist())
    return all_words


def generate(realign_dir: str = "data/out/realign",
             eval_dir: str = "data/eval", min_occurrences: int = 10,
             min_phrase_duration: float = 0.3,
             fragments=FRAGMENTS, pos_tags=POS_TAGS,
             tagger: Optional[Callable] = None) -> None:
    """Full generation pass (reference :405-441)."""
    os.makedirs(eval_dir, exist_ok=True)
    data_sentences, data_tokens = load_realigned_data(realign_dir, tagger)
    from peppa_tpu.data.dataset import SPLIT_SPEC

    for pos_name in pos_tags:
        words = get_lemmatized_words(data_tokens, "val", fragments, pos_name)
        counter = Counter(words)
        words = [w for w, occ in counter.items()
                 if occ > min_occurrences and w not in WORDS_IGNORE[pos_name]]
        logging.info("Considered %s words: %s", pos_name, words)
        pairs = list(itertools.combinations(words, 2))
        for fragment in fragments:
            sub = data_sentences[data_sentences.fragment == fragment]
            sub = sub[sub.episode.isin(SPLIT_SPEC[fragment]["val"])]
            eval_set = find_minimal_pairs(pairs, sub, min_phrase_duration)
            eval_set["fragment"] = fragment
            if len(eval_set):
                eval_set["clipDuration"] = (eval_set["clipEnd"]
                                            - eval_set["clipStart"])
                eval_set = eval_set.sort_values(by=["clipDuration"])
            eval_set.to_csv(os.path.join(
                eval_dir, f"eval_set_{fragment}_{pos_name}.csv"))
