"""Summarize + sanity-check a long training run's artifacts.

Reads a Lightning-layout run dir (hparams.yaml + metrics.csv +
checkpoints/*.ckpt[.json]) and emits a markdown report:

  - LR-schedule parity: every logged lr must equal the configured BertAdam
    schedule (optimization.py::warmup_{linear,cosine,constant}) evaluated at
    that row's optimizer step (loop.py logs lr_at(micro_step // accum));
  - loss health: all train losses finite, smoothed start/end;
  - throughput: mean/last items_per_sec;
  - validation history: every row carrying val metrics;
  - checkpoint audit: dual monitors + last present, each monitor's
    best_model_score equals the max of its metrics.csv column, and the best
    checkpoint's epoch stamp is consistent with the metrics row.

Exit code is non-zero if any check fails, so the script doubles as the
acceptance gate for the full-recipe soak (reference run.py:32-55 +
hparams_base.yaml:35-45 semantics).

Usage: python scripts/soak_report.py [run_dir] [--glob 'val*']
"""
import argparse
import csv
import glob
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml

FAILURES = []


def check(ok: bool, msg: str) -> None:
    tag = "PASS" if ok else "FAIL"
    print(f"- [{tag}] {msg}")
    if not ok:
        FAILURES.append(msg)


def main(argv=None) -> int:
    del FAILURES[:]
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="*",
                    default=["lightning_logs/version_0"],
                    help="run dir, or a RESUME CHAIN of run dirs in order "
                         "(a --resume_from/--auto_resume continuation logs "
                         "into a fresh version dir; rows an earlier run "
                         "logged past the checkpoint its successor resumed "
                         "from are superseded and dropped)")
    args = ap.parse_args(argv)
    rds = args.run_dirs
    rd = rds[-1]  # hparams + display name come from the live end of the chain

    with open(os.path.join(rd, "hparams.yaml")) as f:
        hp = yaml.safe_load(f)
    opt = hp["optimizer"]
    accum = max(int(hp["training"]["trainer_args"].get(
        "accumulate_grad_batches", 1)), 1)

    per_dir_rows = []
    for d in rds:
        with open(os.path.join(d, "metrics.csv")) as f:
            per_dir_rows.append(list(csv.DictReader(f)))
    rows = []
    wall = 0.0
    for i, dir_rows in enumerate(per_dir_rows):
        if not dir_rows:
            continue
        cutoff = None
        if i + 1 < len(per_dir_rows) and per_dir_rows[i + 1]:
            cutoff = int(per_dir_rows[i + 1][0]["step"])
        kept = [r for r in dir_rows
                if cutoff is None or int(r["step"]) < cutoff]
        if kept:
            wall += float(kept[-1]["time"]) - float(dir_rows[0]["time"])
            rows.extend(kept)
    if not rows:
        print("metrics.csv is empty"); return 1

    def fval(row, key):
        v = row.get(key, "")
        return float(v) if v not in ("", None) else None

    train = [(int(r["step"]), fval(r, "train_loss"), fval(r, "lr"),
              fval(r, "perf/items_per_sec"))
             for r in rows if fval(r, "train_loss") is not None]
    val_cols = sorted({k for r in rows for k, v in r.items()
                       if k.startswith("val") and v not in ("", None)})
    vals = [r for r in rows if any(r.get(c) not in ("", None) for c in val_cols)]

    last_step = int(rows[-1]["step"])
    print(f"# Soak report: {' -> '.join(rds)}\n")
    if not train:
        # e.g. killed during sanity validation: rows exist but none carry
        # train_loss — report cleanly instead of crashing on train[0]
        check(False, "metrics.csv has rows but no train_loss values")
        print(f"\nFAILED: {len(FAILURES)} failed check(s)")
        return 1
    print(f"- micro-steps logged: {train[0][0]}..{last_step} "
          f"(optimizer steps ≈ {last_step // accum}, accum={accum})")
    print(f"- wall: {wall / 3600:.2f} h over {len(rows)} logged rows"
          + (f" across {len(rds)} resume-chain runs" if len(rds) > 1 else ""))
    ips = [t[3] for t in train if t[3] is not None]
    if ips:
        print(f"- throughput: mean {sum(ips)/len(ips):.1f} / "
              f"last {ips[-1]:.1f} clips/s")
    k = max(1, min(5, len(train) // 2))
    head = sum(t[1] for t in train[:k]) / k
    tail = sum(t[1] for t in train[-k:]) / k
    print(f"- train_loss: first≈{head:.4f} → last≈{tail:.4f} "
          f"(min {min(t[1] for t in train):.4f})\n")

    print("## Checks\n")
    check(all(math.isfinite(t[1]) for t in train),
          f"all {len(train)} logged train losses finite")

    import numpy as np

    from peppa_tpu.training.optimization import schedule_fn

    lr_at = schedule_fn(opt["schedule"], opt["lr"], opt["warmup"],
                        opt["t_total"])
    lr_err = 0.0
    for step, _, lr, _ in train:
        if lr is None:
            continue
        want = float(lr_at(np.int32(step // accum)))
        lr_err = max(lr_err, abs(lr - want))
    # the logged lr is computed in f32 on device — allow f32 rounding
    check(lr_err < 1e-5 * max(opt["lr"], 1e-12) + 1e-12,
          f"lr column matches {opt['schedule']}(lr={opt['lr']}, "
          f"warmup={opt['warmup']}, t_total={opt['t_total']}) "
          f"at step//accum (max err {lr_err:.2e})")

    # ---- checkpoints: audit across the whole chain (the best checkpoint
    # for a monitor may live in an earlier run's dir when the resumed run
    # never beat the restored score)
    cpts, metas = [], {}
    for d in rds:
        for p in sorted(glob.glob(os.path.join(d, "checkpoints", "*.ckpt"))):
            cpts.append(p)
            mp = p + ".json"
            metas[os.path.basename(p)] = (json.load(open(mp))
                                          if os.path.exists(mp) else {})
    have_last = any(os.path.basename(p) == "last.ckpt" for p in cpts)
    check(have_last or not vals,
          "last.ckpt present" if have_last else
          "last.ckpt absent (ok only if no validation ran yet)")
    monitored = {}
    for name, m in metas.items():
        mon = m.get("monitor")
        if not mon:
            continue
        prev = monitored.get(mon)
        if prev is None or (m.get("best_model_score") or -1e30) > \
                (prev[1].get("best_model_score") or -1e30):
            monitored[mon] = (name, m)
    for mon in ("valnarr_rec_fixed", "valnarr_triplet"):
        if mon not in monitored:
            check(not vals, f"monitor {mon}: no best checkpoint "
                            f"(ok only if no validation ran yet)")
            continue
        name, m = monitored[mon]
        best = m.get("best_model_score")
        col = [fval(r, mon) for r in vals if fval(r, mon) is not None]
        if best is None:
            check(False, f"monitor {mon}: sidecar {name}.json has "
                         f"best_model_score null")
        elif col:
            check(abs(best - max(col)) < 1e-6,
                  f"monitor {mon}: best_model_score {best:.4f} == "
                  f"max(metrics.csv)={max(col):.4f}  [{name}]")
        else:
            check(False, f"monitor {mon}: checkpoint exists but metrics.csv "
                         f"has no {mon} column")

    # ---- validation history
    print("\n## Validation history\n")
    if vals:
        cols = ["step", "epoch"] + val_cols
        print("| " + " | ".join(cols) + " |")
        print("|" + "---|" * len(cols))
        for r in vals:
            cells = [r["step"], r["epoch"]] + [
                (f"{fval(r, c):.4f}" if fval(r, c) is not None else "")
                for c in val_cols]
            print("| " + " | ".join(str(c) for c in cells) + " |")
    else:
        print("(no validation rows yet)")

    print(f"\n{'OK' if not FAILURES else 'FAILED'}: "
          f"{len(FAILURES)} failed check(s)")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
