"""Headline benchmark: end-to-end encode+score throughput on one chip.

Metric (north star, BASELINE.json): 2.3 s audio-video clip pairs per second
per chip, full dual-encoder forward (wav2vec2-base + R(2+1)D-18 at 180x100)
plus the similarity+recall scoring, vs the 5000 pairs/s/chip target.

Measurement method: the per-execution host<->device round trip in this
environment (tunneled PJRT) costs ~35 ms regardless of the computation, so a
single timed dispatch measures the tunnel, not the chip.  Instead the batch
loop runs ON DEVICE — one jit'd program `lax.scan`s over K batches, each a
cheap key-derived perturbation of a base batch drawn once (distinct inputs,
so nothing can be constant-folded, loop-hoisted, or result-cached, without
paying per-iteration threefry for 300M+ elements), reducing each batch's
outputs into a
carried scalar so no large buffer ever leaves the chip.  Throughput is taken
from the slope between a K_small and a K_large run, which cancels the fixed
dispatch/fetch overhead exactly; host transfer is one scalar either way.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Since round 3 the line also carries `host_fed_pairs_per_sec`: the SUSTAINED
throughput of the full input-inclusive pipeline — packed clip cache on disk
-> native C++ loader (mmap + thread-pool batch assembly) -> Prefetcher
(device_put off-thread) -> the same jit'd encode+score program — measured
over >= BENCH_HOST_SECONDS (default 30 s) of steady state.  This is the
honest end-to-end number; on THIS tunneled host it is transfer-bound (the
PJRT relay moves ~30 MB/s; each 2.3 s pair is ~1.65 MB), see PERF.md
"Host-fed pipeline".  On a real TPU host the same pipeline is device-bound.
Reference role being matched: the 12-worker DataLoader feed
(hparams_base.yaml:12, pig/data.py:285-294).
"""

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compile cache: repeat bench runs skip the (minutes-long)
    # remote compile of the full encoder
    from peppa_tpu.utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    from peppa_tpu.config import default_config
    from peppa_tpu.data.types import ClipBatch
    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.ops.loss import triplet_loss
    from peppa_tpu.ops.metrics import recall_at_n

    # B=256 measured +1.2% over B=128 (358.7 vs 354.5 pairs/s) — better MXU
    # utilization on the pooling/projection tails; both programs persist in
    # the compile cache
    batch_size = int(os.environ.get("BENCH_BATCH", "256"))
    k_large = int(os.environ.get("BENCH_K", "4"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    cfg = default_config()
    cfg.training.precision = "bf16"
    # MXU-friendly (2+1)D mid widths (multiples of 128): 23% faster video
    # trunk, and since round 2 fully compatible with pretrained Kinetics
    # weights via the exact/importance-based adapter
    # (models/convert.py::widen_midplanes) — so this IS the production config.
    cfg.video.midplanes_multiple = int(
        os.environ.get("BENCH_MIDPLANES", "128")) or None
    # W8A8 dynamic int8 inference (tpu.quantize_int8): ~6.5x MXU issue rate
    # vs bf16 on v5e; embedding quality bound vs the float path is measured
    # in tests/test_quant.py and on the trained checkpoint (PERF.md).
    cfg.tpu.quantize_int8 = os.environ.get("BENCH_INT8", "0") == "1"
    frames, samples = 23, 101430  # 2.3 s at 10 fps / 44.1 kHz
    b = batch_size

    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  audio_samples=samples, video_frames=frames)

    def one_batch(vs, base_video, base_audio, key):
        # Per-iteration inputs must be DISTINCT (XLA would hoist a
        # loop-invariant batch out of the scan; the relay caches identical
        # executions) but generating 300M+ fresh random elements per batch
        # costs real VPU milliseconds that belong to the harness, not the
        # model (the same RNG pollution that skewed the round-2 peak
        # calibration, PERF.md).  So the base batch is drawn ONCE and each
        # iteration derives a distinct variant for ~one HBM pass: uint8 video
        # XOR a key-derived byte (stays uniform), audio scaled by 1 +- 1e-3.
        kb, ks = jax.random.split(key)
        vbyte = jax.random.randint(kb, (), 0, 256, jnp.uint8)
        ascale = 1.0 + jax.random.uniform(ks, (), jnp.float32, -1e-3, 1e-3)
        batch = ClipBatch(
            # uint8 video: the production input format (native loader ships
            # uint8; /255 + channel norm fuse on device)
            video=jnp.bitwise_xor(base_video, vbyte),
            audio=base_audio * ascale,
            video_duration=jnp.full((b,), 2.3),
            audio_duration=jnp.full((b,), 2.3),
            video_frames=jnp.full((b,), frames, jnp.int32),
            audio_samples=jnp.full((b,), samples, jnp.int32))
        out = model.apply(vs, batch, train=False)
        loss = triplet_loss(out.video, out.audio, margin=cfg.margin)
        rec = recall_at_n(out.video, out.audio, jnp.eye(b), n=10)
        return jnp.sum(out.video) + jnp.sum(out.audio) + loss + jnp.sum(rec)

    import functools

    @jax.jit
    def make_base(seed):
        kv, ka = jax.random.split(jax.random.PRNGKey(seed))
        video = jax.random.randint(kv, (b, frames, 100, 180, 3), 0, 256,
                                   jnp.uint8)
        audio = jax.random.normal(ka, (b, samples), jnp.float32) * 0.1
        return video, audio

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(vs, base_video, base_audio, seed, k):
        # vs is an argument (NOT a closure capture): closed-over params would
        # be inlined into the HLO as 500 MB of constants.
        keys = jax.random.split(jax.random.PRNGKey(seed), k)
        acc, _ = jax.lax.scan(
            lambda c, key: (c + one_batch(vs, base_video, base_audio, key),
                            None), 0.0, keys)
        return acc

    base_video, base_audio = make_base(0)

    @jax.jit
    def trivial(seed):
        return jnp.sum(jax.random.normal(jax.random.PRNGKey(seed), (8, 8)))

    def timed(seed, k):
        t0 = time.perf_counter()
        v = float(np.asarray(  # fetch forces completion
            run_k(variables, base_video, base_audio, seed, k)))
        assert np.isfinite(v)
        return time.perf_counter() - t0

    def timed_trivial(seed):
        t0 = time.perf_counter()
        float(np.asarray(trivial(seed)))
        return time.perf_counter() - t0

    # compile both programs (uncounted)
    timed_trivial(0)
    timed(0, k_large)

    # fixed dispatch/fetch overhead (tunnel round trip), measured on a
    # trivial program and subtracted from the k-batch run
    overhead = min(timed_trivial(1 + r) for r in range(max(repeats, 5)))
    per_batch = min(
        max(timed(1 + r, k_large) - overhead, 1e-9) / k_large
        for r in range(repeats))
    pairs_per_s = batch_size / per_batch
    n_chips = max(len(jax.devices()), 1)
    value = pairs_per_s / n_chips

    # ---- TRAINING throughput at the shipped production recipe (VERDICT r4
    # #7): micro-batch 16 x accumulate 4 (hparams_tpu_production.yaml),
    # bf16, full-size media, device-resident batches.  Measured here so the
    # round artifact (BENCH_rN.json) machine-checks the training surface,
    # not just inference.
    train = {}
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        try:
            train = train_throughput(frames, samples)
        except Exception as e:  # never sink the headline
            import traceback
            traceback.print_exc()
            print(f"train-throughput bench failed: {e!r}")
            train = {"train_clips_per_sec": None, "train_step_ms": None,
                     "train_recipe": TRAIN_RECIPE}

    host_fed = {}
    if os.environ.get("BENCH_HOST_FED", "1") == "1":
        for variant in os.environ.get("BENCH_HOST_VARIANTS",
                                      "f32,int16,cold").split(","):
            variant = variant.strip()
            if not variant:
                continue
            for attempt in (1, 2):  # one retry: transient tunnel/device
                try:                 # hiccups cost a whole variant otherwise
                    host_fed[variant] = host_fed_pairs_per_sec(
                        model, variables, cfg, frames, samples,
                        audio_int16=(variant == "int16"),
                        cold_cache=(variant == "cold"))
                    break
                except Exception as e:  # never sink the headline
                    import traceback
                    traceback.print_exc()
                    print(f"host-fed bench ({variant}) attempt {attempt} "
                          f"failed: {e!r}")
                    host_fed[variant] = None

    # % of this chip's measured practical matmul peak (PERF.md
    # "Calibration": chained rng-free GEMM probes put bf16 at 172-208 TF/s
    # depending on shape; 185 is the mid-band figure used for the roofline).
    # Model cost: ~6.0 TFLOP per 32-pair batch (per-part FLOP table, PERF.md)
    # => 0.1875 TFLOP/pair.  This field exists so the vs_baseline fraction
    # reads against physics: 5000 pairs/s would need ~940 TF/s effective on
    # this model — several times the chip's measured ceiling.
    tflop_per_pair = 6.0 / 32.0
    chip_peak_tf = 185.0
    # a PERCENT (39.6 = 39.6% of peak), as the field name says — a fraction
    # here would read as 0.4% to anyone taking the name literally.  The
    # constants assume the DEFAULT model config (midplanes=128, bf16): with
    # BENCH_MIDPLANES/BENCH_INT8 overrides the FLOP/pair and effective peak
    # both change, so the percent is emitted as null rather than mislabeled.
    default_model_cfg = (cfg.video.midplanes_multiple == 128
                         and not cfg.tpu.quantize_int8)
    pct_of_chip_peak = (
        round(100.0 * value * tflop_per_pair / chip_peak_tf, 2)
        if default_model_cfg else None)

    f32_stats = host_fed.get("f32")
    print(json.dumps({
        "metric": "clip_pairs_per_sec_per_chip_encode_score",
        "value": round(value, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / 5000.0, 4),
        "pct_of_chip_peak": pct_of_chip_peak,
        "pct_assumes": {"midplanes_multiple": 128, "int8": False},
        "chip_peak_tflops_band": [172, 208],
        "model_tflop_per_pair": round(tflop_per_pair, 4),
        "host_fed_pairs_per_sec": (f32_stats and f32_stats.get("median")),
        "host_fed": host_fed,
        **train,
    }))


TRAIN_RECIPE = "16x4_bf16_midplanes128"  # hparams_tpu_production.yaml


def train_throughput(frames: int, samples: int,
                     micro_b: int = 16, accum: int = 4,
                     warmup_steps: int = 3, timed_steps: int = 12):
    """Train-step throughput at the production recipe, device-resident.

    A fresh model/optimizer at bf16 + midplanes=128 + MultiSteps(accum);
    `timed_steps` micro-steps (whole accumulation cycles) over a rotation of
    pre-staged distinct batches (identical repeated executions would be
    deduped by the tunnel relay — bench gotcha), timed with a host fetch of
    the final loss.  One dispatch per micro-step keeps device time far under
    the ~20 s tunnel hazard (ROADMAP round-4 note).
    """
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from peppa_tpu.config import default_config
    from peppa_tpu.data.types import ClipBatch
    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.training.optimization import make_optimizer
    from peppa_tpu.training.state import TrainState
    from peppa_tpu.training.step import make_train_step

    assert timed_steps % accum == 0, "time whole accumulation cycles"
    cfg = default_config()
    cfg.training.precision = "bf16"
    cfg.video.midplanes_multiple = 128
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  audio_samples=samples, video_frames=frames)
    tx = make_optimizer(cfg.optimizer, accumulate_grad_batches=accum,
                        params=variables["params"])
    state = TrainState.create(variables, tx)
    step = make_train_step(model, cfg.margin, donate=True)

    @jax.jit
    def make_batch(seed):
        kv, ka = jax.random.split(jax.random.PRNGKey(seed))
        return ClipBatch(
            video=jax.random.randint(
                kv, (micro_b, frames, 100, 180, 3), 0, 256, jnp.uint8),
            audio=jax.random.normal(ka, (micro_b, samples), jnp.float32) * 0.1,
            video_duration=jnp.full((micro_b,), 2.3),
            audio_duration=jnp.full((micro_b,), 2.3),
            video_frames=jnp.full((micro_b,), frames, jnp.int32),
            audio_samples=jnp.full((micro_b,), samples, jnp.int32))

    batches = [jax.block_until_ready(make_batch(i)) for i in range(accum)]
    rng = jax.random.PRNGKey(7)
    loss = None
    for i in range(warmup_steps):  # compile + settle
        state, metrics = step(state, batches[i % accum], rng)
        loss = float(np.asarray(metrics["train_loss"]))
    t0 = time.perf_counter()
    for i in range(timed_steps):
        state, metrics = step(state, batches[i % accum], rng)
    loss = float(np.asarray(metrics["train_loss"]))  # fetch = completion
    elapsed = time.perf_counter() - t0
    assert np.isfinite(loss)
    return {
        "train_clips_per_sec": round(timed_steps * micro_b / elapsed, 1),
        "train_step_ms": round(1e3 * elapsed / timed_steps, 1),
        "train_recipe": TRAIN_RECIPE,
    }


def _build_bench_pack(path: str, n_items: int, frames: int, samples: int,
                      audio_int16: bool = False):
    """Materialize a pack of distinct synthetic 2.3 s clips (once, reused)."""
    import numpy as np

    from peppa_tpu.data.cache import write_pack
    from peppa_tpu.data.types import Clip

    rng = np.random.default_rng(42)

    def clips():
        for i in range(n_items):
            yield Clip(
                video=rng.integers(0, 256, (frames, 100, 180, 3), np.uint8),
                audio=(rng.standard_normal(samples) * 0.1).astype(np.float32),
                video_duration=2.3, audio_duration=2.3, index=i)

    return write_pack(path, clips(), audio_int16=audio_int16)


def _drop_file_cache(path: str) -> bool:
    """Evict `path` from the page cache (posix_fadvise DONTNEED).

    DONTNEED only drops CLEAN pages, and a pack built moments ago by
    _build_bench_pack is still dirty — fsync first so the eviction is real
    for fresh packs too (a silent no-op here would report a warm first pass
    as "cold").  No root / drop_caches needed.  Returns False when the
    platform call is unavailable.
    """
    try:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
            os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        finally:
            os.close(fd)
        return True
    except (AttributeError, OSError) as e:
        print(f"cold-cache eviction unavailable: {e!r}")
        return False


def host_fed_pairs_per_sec(model, variables, cfg, frames: int, samples: int,
                           *, probe: bool = False, audio_int16: bool = False,
                           cold_cache: bool = False):
    """Sustained pairs/s of pack -> native loader -> prefetch -> encode+score.

    Every batch has a distinct item composition (fresh permutation per epoch)
    so the relay's result cache (PERF.md "Measurement methodology" trap 3)
    can never hit; each batch's scalar is fetched, which is the only
    synchronization the tunnel honors (trap 1).

    Returns a DISTRIBUTION, not a point: {"median", "min", "max",
    "windows", "window_seconds"} over >= BENCH_HOST_WINDOWS (default 3)
    disjoint sustained windows, so run-to-run variance is part of the
    artifact (VERDICT r3 weak #4).

    Variants: `audio_int16` benches the pack-v2 format (int16 audio shipped
    to device, -12% bytes/pair; production knob tpu.pack_audio_int16);
    `cold_cache` evicts the pack from the page cache first and reports the
    FIRST full pass over the pack separately (the steady-state windows that
    follow are warm again — the cold number is `first_pass`).
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from peppa_tpu.native import NativeBatchLoader, NativePack, native_available
    from peppa_tpu.ops.loss import triplet_loss
    from peppa_tpu.ops.metrics import recall_at_n
    from peppa_tpu.utils.prefetch import Prefetcher

    if not native_available():
        print("host-fed bench skipped: native loader unavailable")
        return None

    b = int(os.environ.get("BENCH_HOST_BATCH", "64"))
    n_windows = int(os.environ.get("BENCH_HOST_WINDOWS", "3"))
    window_seconds = float(os.environ.get("BENCH_HOST_WINDOW_SECONDS", "10"))
    min_seconds = n_windows * window_seconds
    n_items = int(os.environ.get("BENCH_HOST_ITEMS", "192"))
    # BENCH_INT16_AUDIO=1 forces the v2 pack for every variant (legacy knob;
    # the "int16" variant in main() sets audio_int16 directly)
    audio_i16 = audio_int16 or os.environ.get("BENCH_INT16_AUDIO", "0") == "1"
    pack_path = os.environ.get(
        "BENCH_PACK", f"/tmp/peppa_bench_pack_{frames}x{samples}"
        f"{'_i16' if audio_i16 else ''}.ppkc")
    if not os.path.exists(pack_path):
        _build_bench_pack(pack_path, n_items, frames, samples,
                          audio_int16=audio_i16)
    cold_ok = cold_cache and _drop_file_cache(pack_path)

    pack = NativePack(pack_path)
    if audio_i16 != (np.dtype(pack.audio_dtype) == np.int16):
        # an explicit BENCH_PACK can point every variant at one file; say so
        # rather than report a mislabeled number
        print(f"host-fed bench: pack {pack_path} audio dtype is "
              f"{np.dtype(pack.audio_dtype).name}; variant labeled "
              f"{'int16' if audio_i16 else 'f32'} measures THIS pack")
    n_items = len(pack)
    pad = (frames, 100, 180, 3, samples)
    rng = np.random.default_rng(7)
    max_epochs = 400  # plan bound; the timed loop breaks on min_seconds
    plan = []
    for _ in range(max_epochs):
        order = rng.permutation(n_items)
        for lo in range(0, n_items - b + 1, b):
            plan.append((order[lo:lo + b].tolist(), pad))

    @jax.jit
    def encode_score(vs, batch):
        out = model.apply(vs, batch, train=False)
        loss = triplet_loss(out.video, out.audio, margin=cfg.margin)
        rec = recall_at_n(out.video, out.audio, jnp.eye(batch.video.shape[0]),
                          n=10)
        return jnp.sum(out.video) + jnp.sum(out.audio) + loss + jnp.sum(rec)

    n_threads = min(os.cpu_count() or 4, 8)

    if probe:  # host-side assembly rate alone, no device in the loop
        loader = NativeBatchLoader(pack, plan, n_threads=n_threads, depth=4)
        t0 = time.perf_counter()
        k = 0
        for batch in loader:
            k += 1
            if time.perf_counter() - t0 >= min_seconds and k >= 4:
                break
        dt = time.perf_counter() - t0
        loader.close()
        audio_bps = np.dtype(pack.audio_dtype).itemsize  # 4 (v1) or 2 (v2)
        pack.close()
        print(f"native assembly only: {k * b / dt:.1f} pairs/s "
              f"({k * b * (frames * 100 * 180 * 3 + samples * audio_bps) / dt / 1e6:.0f} MB/s)")
        return k * b / dt

    device = jax.devices()[0]
    # Compile + first transfer on a SYNTHETIC batch so the pack stays
    # untouched until the timed loop (required for the cold-cache variant;
    # harmless otherwise — loader batches have identical shapes/dtypes).
    from peppa_tpu.data.types import ClipBatch as _CB
    synth = _CB(video=np.zeros((b, frames, 100, 180, 3), np.uint8),
                audio=np.zeros((b, samples), pack.audio_dtype),
                video_duration=np.full((b,), 2.3, np.float32),
                audio_duration=np.full((b,), 2.3, np.float32),
                video_frames=np.full((b,), frames, np.int32),
                audio_samples=np.full((b,), samples, np.int32))
    float(np.asarray(encode_score(variables, jax.device_put(synth, device))))
    if cold_ok:
        # re-evict: NativePack open touched the header/index pages
        _drop_file_cache(pack_path)
    loader = NativeBatchLoader(pack, plan, n_threads=n_threads, depth=4)
    prefetcher = Prefetcher(loader, lambda bt: jax.device_put(bt, device),
                            depth=2)
    batches_per_pass = max(n_items // b, 1)
    try:
        it = iter(prefetcher)
        first_pass = None
        if cold_ok:
            # cold page cache: time the FIRST full pass over the pack —
            # every payload byte comes from disk, not memory
            t0 = time.perf_counter()
            k = 0
            for sharded in it:
                v = float(np.asarray(encode_score(variables, sharded)))
                assert np.isfinite(v)
                k += 1
                if k >= batches_per_pass:
                    break
            first_pass = k * b / (time.perf_counter() - t0)
        windows = []
        exhausted = False
        for _ in range(n_windows):
            t0 = time.perf_counter()
            pairs = 0
            while True:
                batch = next(it, None)  # finite plan: end windows gracefully
                if batch is None:
                    exhausted = True
                    break
                v = float(np.asarray(encode_score(variables, batch)))
                assert np.isfinite(v)
                pairs += b
                if (time.perf_counter() - t0 >= window_seconds
                        and pairs >= 4 * b):
                    break
            if pairs >= 4 * b:  # keep only windows with enough signal
                windows.append(pairs / (time.perf_counter() - t0))
            if exhausted:
                print(f"host-fed bench: batch plan exhausted after "
                      f"{len(windows)} full windows (raise max_epochs or "
                      f"BENCH_HOST_ITEMS for more)")
                break
        if not windows and not (cold_cache and first_pass is not None):
            return None
    finally:
        prefetcher.close()
        loader.close()
        pack.close()
    if windows:
        windows_sorted = sorted(windows)
        stats = {
            "median": round(windows_sorted[len(windows_sorted) // 2], 1),
            "min": round(windows_sorted[0], 1),
            "max": round(windows_sorted[-1], 1),
            "windows": [round(w, 1) for w in windows],
            "window_seconds": window_seconds,
        }
    else:
        # plan exhausted before any full steady-state window, but the cold
        # first pass WAS measured — carry it rather than discarding the run
        stats = {"median": None, "min": None, "max": None, "windows": [],
                 "window_seconds": window_seconds}
    if cold_cache:
        stats["first_pass_cold"] = (round(first_pass, 1)
                                    if first_pass is not None else None)
    return stats


if __name__ == "__main__":
    main()
