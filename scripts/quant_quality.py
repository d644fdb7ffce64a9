"""Quality gate for W8A8 int8 inference: val metrics float vs int8.

Loads the best checkpoint of a trained run (synthetic or real), runs the full
validation battery (the reference's four monitor metrics,
pig/models.py:291-318) with tpu.quantize_int8 off and on, and prints both
plus deltas.  Usage:

    python scripts/quant_quality.py [version_dir] [n_val]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/peppa_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    version_dir = sys.argv[1] if len(sys.argv) > 1 else "lightning_logs/version_0"
    n_val = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from peppa_tpu.config import Config
    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.evaluation.validation import run_validation
    from peppa_tpu.models.dual_encoder import PeppaPig
    from peppa_tpu.training.checkpoint import best_checkpoint_in, load_params
    from peppa_tpu.training.step import make_eval_step

    cfg = Config.load(os.path.join(version_dir, "hparams.yaml"))
    ckpt = best_checkpoint_in(os.path.join(version_dir, "checkpoints"))
    print(f"checkpoint: {ckpt}", flush=True)
    params, batch_stats, meta = load_params(ckpt)
    variables = {"params": params, "batch_stats": batch_stats}

    data = SyntheticPigData(cfg, n_val=n_val)
    data.setup()

    results = {}
    for label, q in (("float", False), ("int8", True)):
        cfg.tpu.quantize_int8 = q
        model = PeppaPig(cfg)
        step = make_eval_step(model)
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
