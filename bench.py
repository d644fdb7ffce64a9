"""Headline benchmark: end-to-end encode+score throughput on one chip.

Metric (north star, BASELINE.json): 2.3 s audio-video clip pairs per second
per chip, full dual-encoder forward (wav2vec2-base + R(2+1)D-18 at 180x100)
plus the similarity+recall scoring.  vs_baseline is against the 5000
pairs/s/chip target.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from peppa_tpu.config import default_config
    from peppa_tpu.data.types import ClipBatch
    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.ops.metrics import recall_at_n
    from peppa_tpu.ops.loss import triplet_loss

    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    warmup = int(os.environ.get("BENCH_WARMUP", "3"))

    cfg = default_config()
    cfg.training.precision = "bf16"
    frames, samples = 23, 101430  # 2.3 s at 10 fps / 44.1 kHz

    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  audio_samples=samples, video_frames=frames)

    @jax.jit
    def encode_and_score(vs, batch):
        out = model.apply(vs, batch, train=False)
        loss = triplet_loss(out.video, out.audio, margin=cfg.margin)
        rec = recall_at_n(out.video, out.audio,
                          jnp.eye(out.video.shape[0]), n=10)
        return out.video, out.audio, loss, rec

    rng = np.random.default_rng(0)
    batch = ClipBatch(
        video=jnp.asarray(rng.uniform(size=(batch_size, frames, 100, 180, 3))
                          .astype(np.float32)),
        audio=jnp.asarray((rng.standard_normal((batch_size, samples)) * 0.1)
                          .astype(np.float32)),
        video_duration=jnp.full((batch_size,), 2.3),
        audio_duration=jnp.full((batch_size,), 2.3),
        video_frames=jnp.full((batch_size,), frames, jnp.int32),
        audio_samples=jnp.full((batch_size,), samples, jnp.int32))

    for _ in range(warmup):
        out = encode_and_score(variables, batch)
    jax.block_until_ready(out[0])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = encode_and_score(variables, batch)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / iters

    pairs_per_s = batch_size / dt
    n_chips = max(len(jax.devices()), 1)
    value = pairs_per_s / n_chips
    print(json.dumps({
        "metric": "clip_pairs_per_sec_per_chip_encode_score",
        "value": round(value, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / 5000.0, 4),
    }))


if __name__ == "__main__":
    main()
