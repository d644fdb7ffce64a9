"""Mechanistic dissection of the constant-embedding collapse, on the chip.

The round-5 schedule-scale runs (PERF.md "Schedule-scale recipe runs") found
that on a SATURATED corpus both micro-batch recipes collapse to the
constant-embedding saddle shortly after the schedule's peak LR — the train
loss pins at exactly 2*margin*(1-1/B) — while on a corpus with signal left
the same peak LR is harmless.  ROADMAP.md listed the open question: is a
LOWER PEAK LR or EARLIER STOPPING the better guard?

This script answers it with controlled arms on the full 126M model (bf16,
production 16x4 micro-batching, the same on-device correlated generator as
scripts/recipe_ab.py but at the SATURATING 8-class setting): identical init
and schedule SHAPE (warmup_linear, warmup 0.1, t_total = the run length so
the peak-LR danger zone is actually reached), varying only the peak LR.
Per-micro-step losses stream through the production CollapseDetector
(training/collapse.py) so collapse onset is measured by the exact guard the
Trainer ships; held-out recall@10 is evaluated every eval_every optimizer
steps so pre-collapse best vs terminal quality quantifies what early
stopping (the dual monitors + collapse guard) preserves vs what a lower LR
buys.  Collapsed arms train on for a confirmation window (post-collapse
metrics at chance prove the saddle is terminal), then stop early.

No reference equivalent — the reference's published runs never report this
failure mode (SURVEY.md §5.3).

Usage: python scripts/collapse_dissection.py [--steps 400] [--lrs 1e-4,3e-5,1e-5]
Writes results/collapse_dissection.csv + a JSON summary to stdout.
"""

import argparse
import csv
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from peppa_tpu.utils.compile_cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from peppa_tpu.config import default_config
from peppa_tpu.data.types import ClipBatch
from peppa_tpu.models.dual_encoder import init_model
from peppa_tpu.ops.loss import triplet_loss
from peppa_tpu.ops.metrics import recall_at_n
from peppa_tpu.training.collapse import CollapseDetector
from peppa_tpu.training.optimization import make_optimizer
from peppa_tpu.training.state import TrainState

FRAMES, SAMPLES = 23, 101430
H, W = 100, 180
N_CLASSES = 8  # the SATURATING setting (the soak corpus' latent-class count)
SAMPLE_RATE = 44100.0
MICRO_B, ACCUM = 16, 4  # production recipe micro-batching


def make_batch(key, b):
    """On-device correlated pair batch — same family as recipe_ab.py's twin
    (and data/synthetic.py::correlated_pair), at the saturating 8-class
    setting with its original 80*2^(k/2) frequency map."""
    kk, kph, kn_v, kn_a = jax.random.split(key, 4)
    k = jax.random.randint(kk, (b,), 0, N_CLASSES).astype(jnp.float32)
    phases = jnp.asarray([0.0, 1 / 3, 2 / 3], jnp.float32)
    hue = jnp.sin(2 * jnp.pi * (k[:, None] / N_CLASSES + phases))
    grad = jnp.linspace(0.0, 1.0, W)[None, None, :, None]
    parity = jnp.mod(k, 2.0)[:, None, None, None]
    base = 0.5 + 0.25 * hue[:, None, None, :] * (0.5 + parity * grad)
    video = jnp.clip(
        base[:, None] + 0.08 * jax.random.normal(kn_v, (b, FRAMES, H, W, 3)),
        0.0, 1.0)
    freq = 80.0 * 2.0 ** (k / 2.0)
    tt = jnp.arange(SAMPLES, dtype=jnp.float32) / SAMPLE_RATE
    phase = jax.random.uniform(kph, (b, 1), jnp.float32, 0, 2 * jnp.pi)
    audio = (0.1 * jnp.sin(2 * jnp.pi * freq[:, None] * tt[None] + phase)
             + 0.01 * jax.random.normal(kn_a, (b, SAMPLES)))
    return ClipBatch(
        video=video, audio=audio,
        video_duration=jnp.full((b,), 2.3),
        audio_duration=jnp.full((b,), 2.3),
        video_frames=jnp.full((b,), FRAMES, jnp.int32),
        audio_samples=jnp.full((b,), SAMPLES, jnp.int32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400,
                    help="optimizer-step horizon per arm (= t_total, so the "
                         "LR peaks at 10%% of it and decays to 0 by the end)")
    ap.add_argument("--lrs", default="1e-4,3e-5,1e-5",
                    help="comma-separated peak LRs, one arm each")
    ap.add_argument("--warmup", type=float, default=0.1,
                    help="warmup fraction of t_total; raise it (e.g. 0.2) "
                         "to give the model a saturation phase BEFORE the "
                         "peak-LR danger zone, mirroring the soak runs")
    ap.add_argument("--eval_every", type=int, default=32,
                    help="optimizer steps between held-out evals")
    ap.add_argument("--confirm", type=int, default=64,
                    help="optimizer steps trained past collapse detection "
                         "before stopping the arm (proves the saddle is "
                         "terminal)")
    ap.add_argument("--seed", type=int, default=17)
    args = ap.parse_args()

    cfg = default_config()
    cfg.training.precision = "bf16"
    cfg.video.midplanes_multiple = 128
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  audio_samples=SAMPLES, video_frames=FRAMES)

    def run_arm(peak_lr):
        ocfg = type(cfg.optimizer)(**{**cfg.optimizer.__dict__,
                                      "lr": peak_lr, "t_total": args.steps,
                                      "warmup": args.warmup})
        tx = make_optimizer(ocfg, accumulate_grad_batches=ACCUM)
        fresh = jax.tree.map(jnp.array, variables)  # run_k donates
        state = TrainState.create(fresh, tx)

        def one_micro(state, key):
            kb, kd = jax.random.split(key)
            batch = make_batch(kb, MICRO_B)

            def loss_fn(params):
                vs = {"params": params, "batch_stats": state.batch_stats}
                out, mut = model.apply(
                    vs, batch, train=True,
                    rngs={"dropout": kd, "layerdrop": kd},
                    mutable=["batch_stats"])
                return (triplet_loss(out.video, out.audio, margin=cfg.margin),
                        mut["batch_stats"])

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads, stats), loss

        @functools.partial(jax.jit, static_argnames=("k",),
                           donate_argnums=(0,))
        def run_k(state, seed_, k):
            keys = jax.random.split(jax.random.PRNGKey(seed_), k)

            def body(st, key):
                st, loss = one_micro(st, key)
                return st, loss  # stacked per-micro losses out

            return jax.lax.scan(body, state, keys)

        @jax.jit
        def evaluate(st, eval_seed):
            batch = make_batch(jax.random.PRNGKey(eval_seed), 64)
            vs = {"params": st.params, "batch_stats": st.batch_stats}
            out = model.apply(vs, batch, train=False)
            loss = triplet_loss(out.video, out.audio, margin=cfg.margin)
            eye = jnp.eye(64)
            return (loss, recall_at_n(out.video, out.audio, eye, n=1),
                    recall_at_n(out.video, out.audio, eye, n=10))

        det = CollapseDetector(cfg.margin, MICRO_B)
        # chunks of eval_every opt steps, each split into <=16-opt-step
        # dispatches (the tunnel hazard: keep device time per execution
        # under ~20 s — ROADMAP round-4 note)
        onset_micro = None
        history = []  # (opt_step, val_loss, r1, r10)
        best = {"opt_step": 0, "r10": 0.0}
        micro_done = 0
        micro_total = args.steps * ACCUM
        stop_at = None  # micro step to end the arm early (post-confirmation)
        while micro_done < micro_total:
            k = min(16 * ACCUM, micro_total - micro_done)
            if stop_at is not None:
                k = min(k, stop_at - micro_done)
            if k <= 0:
                break
            state, losses = run_k(state, args.seed * 100_003 + micro_done, k)
            for i, lv in enumerate(np.asarray(losses, np.float64)):
                if det.update(float(lv)) and onset_micro is None:
                    onset_micro = micro_done + i + 1
                    stop_at = min(micro_total,
                                  onset_micro + args.confirm * ACCUM)
                    print(f"  lr={peak_lr:g}: collapse detected at opt step "
                          f"{onset_micro // ACCUM} (loss pinned at "
                          f"{det.saddle:.4f}; best before: {det.best:.4f})",
                          flush=True)
            micro_done += k
            opt_done = micro_done // ACCUM
            if opt_done % args.eval_every == 0 or micro_done >= micro_total \
                    or (stop_at is not None and micro_done >= stop_at):
                vl, r1, r10 = evaluate(state, 999_000)
                row = (opt_done, float(np.asarray(vl)),
                       float(np.mean(np.asarray(r1))),
                       float(np.mean(np.asarray(r10))))
                history.append(row)
                if row[3] >= best["r10"]:
                    best = {"opt_step": opt_done, "r10": row[3]}
                print(f"  lr={peak_lr:g} opt {opt_done}: val_loss {row[1]:.4f} "
                      f"r@1 {row[2]:.3f} r@10 {row[3]:.3f}", flush=True)
            if stop_at is not None and micro_done >= stop_at:
                break
        terminal = history[-1]
        last_loss = float(np.asarray(losses, np.float64)[-1])
        return {
            "peak_lr": peak_lr,
            "collapsed": onset_micro is not None,
            "onset_opt_step": (None if onset_micro is None
                               else onset_micro // ACCUM),
            # detector-independent collapse evidence: the guard's learned
            # gate refuses to fire when the loss never dipped below
            # 0.5*saddle (indistinguishable from init), but the experiment
            # still wants to know the arm ENDED in the saddle
            "min_train_loss": det.best,
            "last_train_loss": last_loss,
            "pinned_at_end": bool(abs(last_loss - det.saddle)
                                  <= 0.01 * det.saddle),
            "saddle": det.saddle,
            "best_r10": best["r10"], "best_r10_opt_step": best["opt_step"],
            "terminal_opt_step": terminal[0], "terminal_val_loss": terminal[1],
            "terminal_r10": terminal[3],
            "history": history,
        }

    lrs = [float(x) for x in args.lrs.split(",")]
    print(f"devices: {jax.devices()}; arms: peak_lr={lrs}; "
          f"t_total={args.steps} opt steps, {MICRO_B}x{ACCUM}, "
          f"{N_CLASSES}-class saturating corpus", flush=True)
    arms = [run_arm(lr) for lr in lrs]

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "collapse_dissection.csv")
    with open(out, "w", newline="") as f:
        wr = csv.writer(f)
        cols = ["peak_lr", "collapsed", "onset_opt_step", "min_train_loss",
                "last_train_loss", "pinned_at_end", "saddle", "best_r10",
                "best_r10_opt_step", "terminal_opt_step",
                "terminal_val_loss", "terminal_r10"]
        wr.writerow(cols)
        for a in arms:
            wr.writerow([a[k] for k in cols])
    print(json.dumps({"steps": args.steps, "micro_batching":
                      f"{MICRO_B}x{ACCUM}", "n_classes": N_CLASSES,
                      "arms": arms}, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
