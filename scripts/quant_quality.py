"""Quality gate for W8A8 int8 inference: val metrics float vs int8.

Loads the best checkpoint of a trained run, runs the full validation battery
(the reference's four monitor metrics, pig/models.py:291-318) with
tpu.quantize_int8 off and on, and prints both plus deltas.

Data source: the real PigData val loaders when the run's data directory has
extracted clips; otherwise the synthetic val corpus (clearly labeled) — the
int8 quality decision for a real model should be read from the real-data
mode.  Usage:

    python scripts/quant_quality.py [version_dir] [n_val]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from peppa_tpu.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def main():
    version_dir = sys.argv[1] if len(sys.argv) > 1 else "lightning_logs/version_0"
    n_val = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from peppa_tpu.data.datamodule import PigData, SyntheticPigData
    from peppa_tpu.evaluation.validation import run_validation
    from peppa_tpu.models.dual_encoder import PeppaPig
    from peppa_tpu.training.checkpoint import load_best_model
    from peppa_tpu.training.step import make_eval_step

    model, variables, cfg, ckpt_path = load_best_model(version_dir)
    print(f"checkpoint: {ckpt_path}", flush=True)

    w, h = cfg.data.target_size
    extracted = os.path.isdir(
        os.path.join(cfg.data.data_dir, "out", f"{w}x{h}"))
    if extracted:
        data = PigData(cfg)
        print("data: real extracted clips (PigData val loaders)", flush=True)
    else:
        data = SyntheticPigData(cfg, n_val=n_val)
        print(f"data: SYNTHETIC val corpus (n_val={n_val}) — no extracted "
              "media found; rerun with real data for the production quality "
              "gate", flush=True)
    data.setup()

    results = {}
    for label, q in (("float", False), ("int8", True)):
        cfg.tpu.quantize_int8 = q
        step = make_eval_step(PeppaPig(cfg))
        metrics = run_validation(step, variables, data.val_loaders(),
                                 n_samples=500)
        results[label] = metrics
        print(label, {k: round(v, 4) for k, v in metrics.items()}, flush=True)

    print("deltas (int8 - float):", flush=True)
    for k in results["float"]:
        if k in results["int8"]:
            print(f"  {k}: {results['int8'][k] - results['float'][k]:+.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
