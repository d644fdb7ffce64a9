"""Produce the committed torch-vs-peppa_tpu end-to-end parity table.

Runs the full twin battery (tests/torch_twin.py::run_twin_battery) at table
scale — 100+ clips per segmentation so the recall bootstrap uses the
reference's size=100 subsets (pig/metrics.py:67-77), 500 bootstrap rounds —
and writes results/torch_twin_parity.csv.

Usage:  python scripts/torch_twin_parity.py  [--episodes 17] [--n-samples 500]

This is CPU-only work (the torch twin has no TPU path); force the CPU
backend so the tunneled chip is never in the loop.
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=17,
                    help="narration episodes (17 -> 102 fixed-seg clips)")
    ap.add_argument("--clips-per-episode", type=int, default=2)
    ap.add_argument("--n-samples", type=int, default=500)
    ap.add_argument("--num-layers", type=int, default=2)
    ap.add_argument("--out", default="results/torch_twin_parity.csv")
    ap.add_argument("--work-dir", default="/tmp/torch_twin_parity")
    ap.add_argument("--trained", action="store_true",
                    help="ALSO train the tiny twin in this framework, export "
                         "the trained checkpoint to torch, and run the full "
                         "battery (incl. scrambled + minimal pairs) at an "
                         "above-chance operating point; rows get a "
                         "'trained/' prefix and are APPENDED to --out")
    ap.add_argument("--train-only", action="store_true",
                    help="with --trained: train + print the version_dir, "
                         "skip the battery.  Set PEPPA_PLATFORM=tpu to train "
                         "on the chip (minutes) and run the battery in a "
                         "separate CPU process (--battery-from), where "
                         "torch-vs-jax float parity is exact.")
    ap.add_argument("--battery-from", default=None, metavar="VERSION_DIR",
                    help="with --trained: skip training, run the battery "
                         "against this finished run dir (data under "
                         "<work-dir>/data)")
    ap.add_argument("--train-episodes", type=int, default=60)
    ap.add_argument("--max-epochs", type=int, default=8)
    args = ap.parse_args()

    import jax

    if os.environ.get("PEPPA_PLATFORM", "cpu") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from peppa_tpu.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    from tests.torch_twin import (run_trained_battery_from, train_tiny_twin,
                                  run_trained_twin_battery, run_twin_battery)

    os.makedirs(args.work_dir, exist_ok=True)
    if args.trained and args.train_only:
        version_dir, data_dir = train_tiny_twin(
            args.work_dir, train_episodes=args.train_episodes,
            val_episodes=args.episodes,
            clips_per_episode=args.clips_per_episode,
            num_layers=args.num_layers, max_epochs=args.max_epochs)
        print("version_dir:", version_dir)
        print("data_dir:", data_dir)
        return 0
    elif args.trained and args.battery_from:
        rows, diag = run_trained_battery_from(
            args.battery_from, os.path.join(args.work_dir, "data"),
            n_samples=args.n_samples)
        print("jax-side operating point:", {k: round(v, 4)
                                            for k, v in diag.items()})
    elif args.trained:
        rows, diag = run_trained_twin_battery(
            args.work_dir, n_samples=args.n_samples,
            train_episodes=args.train_episodes,
            val_episodes=args.episodes,
            clips_per_episode=args.clips_per_episode,
            num_layers=args.num_layers, max_epochs=args.max_epochs)
        print("jax-side operating point:", {k: round(v, 4)
                                            for k, v in diag.items()})
    else:
        rows = run_twin_battery(
            args.work_dir, episodes=args.episodes,
            clips_per_episode=args.clips_per_episode,
            num_layers=args.num_layers, n_samples=args.n_samples)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    mode = "a" if args.trained and os.path.exists(args.out) else "w"
    with open(args.out, mode, newline="") as f:
        w = csv.DictWriter(f, fieldnames=["metric", "torch", "peppa_tpu",
                                          "abs_diff"])
        if mode == "w":
            w.writeheader()
        for r in rows:
            w.writerow({k: (f"{v:.6f}" if isinstance(v, float) else v)
                        for k, v in r.items()})

    worst = 0.0
    for r in rows:
        print(f"{r['metric']:45s} torch={r['torch']:.4f} "
              f"peppa={r['peppa_tpu']:.4f} |d|={r['abs_diff']:.6f}")
        if not r["metric"].endswith("_max_abs_diff"):
            worst = max(worst, r["abs_diff"])
    print(f"\nworst headline |d| = {worst:.6f} (north-star tolerance 0.01)")
    print(f"table written to {args.out}")
    return 0 if worst <= 0.01 else 1


if __name__ == "__main__":
    sys.exit(main())
