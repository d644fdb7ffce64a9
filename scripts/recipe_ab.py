"""A/B the macro-batch recipes for LEARNING quality, on the chip.

The round-4 macro-batch study (PERF.md) picked 4 x B=16 over the reference's
8 x B=8 on speed (+7.4%).  Both keep effective batch 64 and the identical
optimizer-step-keyed LR schedule, but the contrastive in-batch negative set
differs (8 vs 16 per example), so speed alone does not justify the recipe
swap.  This script trains BOTH recipes from the SAME init on the same
on-device correlated synthetic distribution for the same number of
OPTIMIZER steps, then evaluates recall@1/@10 + val loss on one held-out
64-pair batch — per seed, so the verdict is "the winner learns at least as
well", with seed noise visible.

Data: the on-device twin of data/synthetic.py's correlated generator — a
shared latent class drives a colored-gradient video pattern and a sine at
the class frequency (all generated inside the jitted step; nothing crosses
the tunnel but scalars), so the dual encoder must learn the cross-modal
correspondence the loss rewards.  With 32 classes over 64 eval pairs
(~2 same-class members per query), recall@1 and recall@10 both sit below
their tie ceilings, so either can separate the recipes.

Usage: python scripts/recipe_ab.py [--steps 100] [--seeds 2]
"""

import argparse
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
from peppa_tpu.training.optimization import make_optimizer
from peppa_tpu.training.state import TrainState

FRAMES, SAMPLES = 23, 101430
H, W = 100, 180


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100,
                    help="optimizer steps per arm (effective batch 64 each)")
    ap.add_argument("--seeds", type=int, default=2)
    args = ap.parse_args()

    cfg = default_config()
    cfg.training.precision = "bf16"
    cfg.video.midplanes_multiple = 128
    # keep the REAL recipe schedule (t_total=15000, warmup 0.1): at a few
    # hundred steps the LR is still in early warmup (~1e-6-1e-5), which is
    # where this model actually learns.  Compressing t_total to the run
    # length ramps the LR to 1e-4 within ~40 steps and the embeddings
    # collapse to a point (loss pins at 2*margin*(1-1/B) — observed
    # exactly; the soak notes record the same collapse at early 1e-4).
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  audio_samples=SAMPLES, video_frames=FRAMES)

    # on-device twin of data/synthetic.py's correlated generator: a latent
    # CLASS drives both modalities (video = class-colored gradient pattern,
    # audio = sine at the class frequency) — spatially/temporally structured
    # signal a conv stem can actually pick up, unlike a per-pixel random
    # projection (the first draft of this script; both recipes sat at exact
    # chance because the pattern was white noise the pooling averaged away).
    # 32 classes (not 8): with 8, recall@10 over a 64-pair eval batch sat AT
    # its tie ceiling (59/64 = 0.9219 identically at every arm and seed), so
    # it could not separate the recipes.  At 32 classes (~2 same-class
    # members per query) both recall metrics sit below their ceilings and
    # can actually move.
    n_classes = 32
    sample_rate = 44100.0

    def make_batch(key, b):
        kk, kph, kn_v, kn_a = jax.random.split(key, 4)
        k = jax.random.randint(kk, (b,), 0, n_classes).astype(jnp.float32)
        phases = jnp.asarray([0.0, 1 / 3, 2 / 3], jnp.float32)
        hue = jnp.sin(2 * jnp.pi * (k[:, None] / n_classes + phases))  # (b,3)
        grad = jnp.linspace(0.0, 1.0, W)[None, None, :, None]  # (1,1,W,1)
        parity = jnp.mod(k, 2.0)[:, None, None, None]
        base = 0.5 + 0.25 * hue[:, None, None, :] * (0.5 + parity * grad)
        video = jnp.clip(
            base[:, None]  # (b,1,H,W,3) broadcast over frames
            + 0.08 * jax.random.normal(kn_v, (b, FRAMES, H, W, 3)), 0.0, 1.0)
        freq = 80.0 * 2.0 ** (k / 5.0)  # (b,) 80 Hz..5.9 kHz, under Nyquist
        tt = jnp.arange(SAMPLES, dtype=jnp.float32) / sample_rate
        phase = jax.random.uniform(kph, (b, 1), jnp.float32, 0, 2 * jnp.pi)
        audio = (0.1 * jnp.sin(2 * jnp.pi * freq[:, None] * tt[None] + phase)
                 + 0.01 * jax.random.normal(kn_a, (b, SAMPLES)))
        return ClipBatch(
            video=video, audio=audio,
            video_duration=jnp.full((b,), 2.3),
            audio_duration=jnp.full((b,), 2.3),
            video_frames=jnp.full((b,), FRAMES, jnp.int32),
            audio_samples=jnp.full((b,), SAMPLES, jnp.int32))

    def train_arm(micro_b, accum, seed):
        tx = make_optimizer(cfg.optimizer, accumulate_grad_batches=accum)
        # fresh buffers per arm/seed: run_k donates the state, and the state's
        # params alias `variables` — donating the shared copy would delete it
        # out from under the next arm
        fresh = jax.tree.map(jnp.array, variables)
        state = TrainState.create(fresh, tx)

        def one_micro(state, key):
            kb, kd = jax.random.split(key)
            batch = make_batch(kb, micro_b)

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

            def body(carry, key):
                st, _ = carry
                st, loss = one_micro(st, key)
                return (st, loss), None

            (state, last), _ = jax.lax.scan(body, (state, 0.0), keys)
            return state, last

        @jax.jit
        def evaluate(st, eval_seed):
            batch = make_batch(jax.random.PRNGKey(eval_seed), 64)
            vs = {"params": st.params, "batch_stats": st.batch_stats}
            out = model.apply(vs, batch, train=False)
            loss = triplet_loss(out.video, out.audio, margin=cfg.margin)
            eye = jnp.eye(64)
            return (loss, recall_at_n(out.video, out.audio, eye, n=1),
                    recall_at_n(out.video, out.audio, eye, n=10))

        # chunk the scan: one giant dispatch (~70 s device time) crashed the
        # tunnel's TPU worker; <=20 s per execution is safe.  State stays
        # device-resident across chunks (donated), only a scalar is fetched.
        micro_total = args.steps * accum
        chunk = max(1, (16 * 64) // (micro_b * accum)) * accum  # ~16 opt steps
        done = 0
        while done < micro_total:
            k = min(chunk, micro_total - done)
            state, last_loss = run_k(state, seed * 100_003 + done, k)
            float(np.asarray(last_loss))  # sync: bound in-flight work
            done += k
        loss, r1, r10 = evaluate(state, 999_000)  # held-out key space
        return {
            "train_loss_last": float(np.asarray(last_loss)),
            "val_loss": float(np.asarray(loss)),
            "val_recall@1": float(np.mean(np.asarray(r1))),
            "val_recall@10": float(np.mean(np.asarray(r10))),
        }

    results = {}
    for name, (mb, acc) in {"8x8_reference": (8, 8),
                            "16x4_production": (16, 4)}.items():
        per_seed = []
        for s in range(args.seeds):
            r = train_arm(mb, acc, seed=17 + s)
            per_seed.append(r)
            print(f"{name} seed {s}: {r}", flush=True)
        results[name] = per_seed

    print(json.dumps({"steps": args.steps, "effective_batch": 64,
                      "results": results}, indent=2))


if __name__ == "__main__":
    main()
