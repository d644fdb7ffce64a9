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


def get_bootstrapped_scores(values, n_resamples=100, seed=666):
    """Parity: reference evaluation_targeted_triplets.py:159-162."""
    rng = np.random.default_rng(seed)
    for _ in range(n_resamples):
        yield rng.choice(values, size=len(values), replace=True).mean()


def bootstrap_scores_for_column(results, column_name):
    """Parity: reference :165-173."""
    import pandas as pd

    rows = []
    for value in results[column_name].unique():
        scores = results[results[column_name] == value].result.values
        rows.extend({"score": s, column_name: value}
                    for s in get_bootstrapped_scores(scores))
    return pd.DataFrame.from_records(rows)


def get_all_results_df(version, pos_tags, per_word_results=False,
                       min_samples=None):
    """Load one version's minimal-pairs scores (reference :84-106)."""
    import pandas as pd

    path = os.path.join(RESULTS_DIR, f"version_{version}",
                        "minimal_pairs_scores.csv")
    data = pd.read_csv(path)
    data = data[data.pos.isin(pos_tags)]
    if "scrambled_video" in data.columns:
        data = data[~data.scrambled_video.astype(bool)]
    if min_samples:
        counts = data.target_word.value_counts()
        enough = counts[counts > min_samples].keys().to_list()
        data = data[data.target_word.isin(enough)
                    | data.distractor_word.isin(enough)]
    if per_word_results:
        d1 = data.copy()
        d1["word"] = d1["target_word"]
        d2 = data.copy()
        d2["word"] = d2["distractor_word"]
        data = pd.concat([d1, d2], ignore_index=True)
    data["duration"] = data["clipEnd"] - data["clipStart"]
    return data


def _save_boxplot(df, x_col, out_path, figsize=(6, 4), sort_by_score=True):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    order = (df.groupby(x_col)["score"].mean().sort_values().index
             if sort_by_score else sorted(df[x_col].unique(), key=str))
    values = [df[df[x_col] == v]["score"].values for v in order]
    fig, ax = plt.subplots(figsize=figsize)
    ax.boxplot(values, vert=False, tick_labels=[str(v) for v in order],
               showfliers=False)
    ax.set_xlabel("accuracy")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def create_per_word_result_plots(condition, versions, min_samples=10):
    """Per-word accuracy boxplots (reference :184-209)."""
    import pandas as pd

    for pos in ["NOUN", "VERB"]:
        frames = []
        for version in versions:
            data = get_all_results_df(version, [pos], per_word_results=True,
                                      min_samples=min_samples)
            if len(data):
                frames.append(bootstrap_scores_for_column(data, "word"))
        if frames:
            df = pd.concat(frames, ignore_index=True)
            _save_boxplot(df, "word",
                          os.path.join(RESULTS_DIR, f"condition_{condition}",
                                       f"acc_per_word_{pos}.pdf"),
                          figsize=(6, 10) if pos == "NOUN" else (6, 4))


def create_duration_results_plots(condition, versions):
    """Accuracy vs clip duration / phrase length (reference :132-157)."""
    import pandas as pd

    dur_frames, tok_frames = [], []
    for version in versions:
        data = get_all_results_df(version, POS_TAGS)
        if not len(data):
            continue
        data = data.copy()
        data["duration_bin"] = pd.qcut(data["duration"], 3).astype(str)
        dur_frames.append(bootstrap_scores_for_column(data, "duration_bin"))
        if "tokenized" in data.columns:
            import ast

            data["num_tokens"] = data.tokenized.apply(
                lambda t: len(ast.literal_eval(t)) if isinstance(t, str)
                else len(t))
            data["num_tokens_bin"] = pd.cut(data["num_tokens"], 3).astype(str)
            tok_frames.append(
                bootstrap_scores_for_column(data, "num_tokens_bin"))
    base = os.path.join(RESULTS_DIR, f"condition_{condition}")
    if dur_frames:
        _save_boxplot(pd.concat(dur_frames, ignore_index=True),
                      "duration_bin", os.path.join(base, "acc_per_duration.pdf"),
                      sort_by_score=False)
    if tok_frames:
        _save_boxplot(pd.concat(tok_frames, ignore_index=True),
                      "num_tokens_bin",
                      os.path.join(base, "acc_per_num_tokens.pdf"),
                      sort_by_score=False)


def create_correlation_results_plots(version, min_samples=10,
                                     realign_dir="data/out/realign",
                                     concreteness_csv=None):
    """Accuracy vs word log-frequency and concreteness (reference :207-250).

    Word frequencies come from the training-split (dialog) lemmas; the
    concreteness plot runs when the Brysbaert et al. 2014 ratings CSV is
    present (data/eval/13428_2013_403_MOESM1_ESM.csv).
    """
    from collections import Counter

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd
    from scipy.stats import pearsonr

    from peppa_tpu.evaluation.eval_set_generation import (
        get_lemmatized_words,
        load_realigned_data,
    )

    data = get_all_results_df(version, POS_TAGS, per_word_results=True,
                              min_samples=min_samples)
    mean_acc = data.groupby("word")["result"].agg("mean")
    outdir = os.path.join(RESULTS_DIR, f"version_{version}")
    os.makedirs(outdir, exist_ok=True)

    def scatter(xs, ys, labels, xlabel, out_name):
        corr = pearsonr(xs, ys)
        fig, ax = plt.subplots()
        ax.scatter(xs, ys, marker="x")
        for x, y, lab in zip(xs, ys, labels):
            ax.text(x + 0.01, y, lab, size="small")
        ax.set_title(f"pearson r={corr[0]:.2f} (p={corr[1]:.3f})")
        ax.set_xlabel(xlabel)
        ax.set_ylabel("Accuracy")
        fig.tight_layout()
        fig.savefig(os.path.join(outdir, out_name), dpi=300)
        plt.close(fig)
        logging.info("Pearson correlation %s-acc: %s", xlabel, corr)

    try:
        _, tokens = load_realigned_data(realign_dir)
        freqs = Counter(get_lemmatized_words(tokens, "train",
                                             fragments=["dialog"]))
        xs = [np.log(max(freqs.get(w, 1), 1)) for w in mean_acc.keys()]
        scatter(xs, mean_acc.values, list(mean_acc.keys()),
                "Log Frequency", "correlation_frequency_acc.png")
    except Exception as e:
        logging.warning("frequency correlation skipped: %s", e)

    path = concreteness_csv or "data/eval/13428_2013_403_MOESM1_ESM.csv"
    if os.path.exists(path):
        ratings = pd.read_csv(path)
        table = dict(zip(ratings["Word"], ratings["Conc.M"]))
        xs = [table.get(w, 2.5) for w in mean_acc.keys()]
        scatter(xs, mean_acc.values, list(mean_acc.keys()),
                "Concreteness", "correlation_concreteness_acc.png")
    else:
        logging.warning("concreteness ratings CSV not found at %s; skipped",
                        path)


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
        try:
            import yaml

            with open("conditions.yaml") as f:
                conditions = yaml.safe_load(f)
        except FileNotFoundError:
            conditions = {}
        for condition, versions in conditions.items():
            have = [v for v in versions if os.path.exists(os.path.join(
                RESULTS_DIR, f"version_{v}", "minimal_pairs_scores.csv"))]
            if not have:
                continue
            create_per_word_result_plots(condition, have)
            create_duration_results_plots(condition, have)
        for version in args.versions:
            create_correlation_results_plots(
                version, realign_dir=os.path.join(args.data_dir, "out",
                                                  "realign"))


if __name__ == "__main__":
    from peppa_tpu.utils.compile_cache import (
        apply_platform_override, enable_persistent_compilation_cache)

    apply_platform_override()
    enable_persistent_compilation_cache()
    main()
