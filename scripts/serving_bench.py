"""On-hardware serving + export benchmark (VERDICT r3 #8).

Produces the numbers behind PERF.md "Serving on hardware":

1. EncoderService AOT warmup: wall time to compile every (bucket, batch)
   program (the cost a server pays once, before the first request).
2. Steady-state request latency per bucket: wall time of embed_audio /
   embed_video for a full batch of fresh (pre-generated, distinct) payloads
   — includes host->device transfer through the tunnel, which on THIS
   environment adds a fixed ~35 ms dispatch + ~33 MB/s transfer (PERF.md
   "Measurement methodology"); the trivial-dispatch overhead is printed
   alongside so the on-device share is readable.
3. StableHLO export round trip: a small (tpu, cpu) cross-platform artifact
   (jax.export), served via ExportedEncoders on the TPU in-process and on
   CPU in a subprocess, with max|delta| / worst-case cosine agreement of the
   embeddings against the live service.

Usage: python scripts/serving_bench.py [--requests 4] [--batch 8]

Reference being served: the minimal embed API of example.py (reference
example.py:6-15); the AOT bucket service itself is new TPU surface.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_CPU_CHILD = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[3])
import numpy as np
from peppa_tpu.export import ExportedEncoders

art, io_npz = sys.argv[1], sys.argv[2]
data = np.load(io_npz)
exp = ExportedEncoders(art)
A = exp.embed_audio([data[k] for k in data.files if k.startswith("a")])
V = exp.embed_video([data[k] for k in data.files if k.startswith("v")])
np.savez(io_npz + ".out.npz", A=A, V=V)
print("cpu child ok")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax

    from peppa_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()

    from peppa_tpu.config import default_config
    from peppa_tpu.export import ExportedEncoders, export_encoders
    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.serving import EncoderService

    cfg = default_config()
    cfg.training.precision = "bf16"
    cfg.video.midplanes_multiple = 128
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    svc = EncoderService(model, variables, cfg, batch_size=args.batch)

    # dispatch overhead context (the relay's fixed per-call cost)
    import jax.numpy as jnp

    @jax.jit
    def _trivial(seed):
        return jnp.sum(jax.random.normal(jax.random.PRNGKey(seed), (8, 8)))

    float(np.asarray(_trivial(0)))
    overhead = min(
        _t(lambda s=s: float(np.asarray(_trivial(s)))) for s in range(1, 6))

    # ---- 1. warmup cost
    t0 = time.perf_counter()
    svc.warmup()
    warmup_s = time.perf_counter() - t0

    # ---- 2. steady-state latency per bucket (distinct pre-generated
    # payloads: the relay caches identical (program, input) executions)
    rng = np.random.default_rng(0)
    h, w = cfg.data.target_size[1], cfg.data.target_size[0]
    rows = []
    for b in svc.buckets:
        s = int(round(b * svc.sample_rate))
        t = int(round(b * svc.fps))
        audio_reqs = [[rng.standard_normal(s).astype(np.float32) * 0.1
                       for _ in range(args.batch)]
                      for _ in range(args.requests)]
        video_reqs = [[rng.integers(0, 256, (t, h, w, 3)).astype(np.uint8)
                       for _ in range(args.batch)]
                      for _ in range(args.requests)]
        a_lat = [_t(lambda r=r: svc.embed_audio(r)) for r in audio_reqs]
        v_lat = [_t(lambda r=r: svc.embed_video(r)) for r in video_reqs]
        row = {
            "bucket_s": b,
            "audio_ms": {"p50": _p(a_lat, 50), "max": _p(a_lat, 100)},
            "video_ms": {"p50": _p(v_lat, 50), "max": _p(v_lat, 100)},
            "audio_mb": round(args.batch * s * 4 / 1e6, 1),
            "video_mb": round(args.batch * t * h * w * 3 / 1e6, 1),
        }
        rows.append(row)
        print("bucket", row, flush=True)

    # ---- 3. StableHLO (tpu, cpu) export round trip on a small artifact
    n_small, bucket_small = 2, (svc.buckets[0],)
    s0 = int(round(bucket_small[0] * svc.sample_rate))
    t0f = int(round(bucket_small[0] * svc.fps))
    waves = [rng.standard_normal(s0).astype(np.float32) * 0.1
             for _ in range(n_small)]
    clips = [rng.integers(0, 256, (t0f, h, w, 3)).astype(np.uint8)
             for _ in range(n_small)]
    live_a = svc.embed_audio(waves)
    live_v = svc.embed_video(clips)

    with tempfile.TemporaryDirectory() as td:
        art = os.path.join(td, "export")
        # cross-platform artifacts must lower for EVERY target platform; the
        # Pallas attention custom call is TPU-only, so the exported program
        # uses the XLA attention path (same params; kernel-vs-XLA numerics
        # are pinned in tests/test_pallas_onchip.py).  The live service above
        # runs the Pallas path, so the agreement below ALSO crosses pallas/XLA.
        import copy

        cfg_exp = copy.deepcopy(cfg)
        cfg_exp.tpu.use_pallas = False
        from peppa_tpu.models.dual_encoder import PeppaPig

        model_exp = PeppaPig(cfg_exp)
        export_encoders(model_exp, variables, cfg_exp, art,
                        batch_size=n_small, buckets=bucket_small,
                        platforms=("tpu", "cpu"))
        exp = ExportedEncoders(art)
        exp_a = exp.embed_audio(waves)  # executes on the TPU in-process
        exp_v = exp.embed_video(clips)

        io_npz = os.path.join(td, "io.npz")
        np.savez(io_npz, **{f"a{i}": x for i, x in enumerate(waves)},
                 **{f"v{i}": x for i, x in enumerate(clips)})
        child = os.path.join(td, "cpu_child.py")
        with open(child, "w") as f:
            f.write(_CPU_CHILD)
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS",)}
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run([sys.executable, child, art, io_npz, repo], env=env,
                       check=True, timeout=1200)
        cpu = np.load(io_npz + ".out.npz")

        def agree(x, y):
            x, y = np.asarray(x, np.float64), np.asarray(y, np.float64)
            cos = np.sum(x * y, 1) / np.maximum(
                np.linalg.norm(x, axis=1) * np.linalg.norm(y, axis=1), 1e-12)
            return {"max_abs": float(np.max(np.abs(x - y))),
                    "min_cos": float(np.min(cos))}

        roundtrip = {
            "exported_tpu_vs_live": {"audio": agree(exp_a, live_a),
                                     "video": agree(exp_v, live_v)},
            "exported_cpu_vs_exported_tpu": {
                "audio": agree(cpu["A"], exp_a),
                "video": agree(cpu["V"], exp_v)},
        }

    print(json.dumps({
        "warmup_s": round(warmup_s, 1),
        "n_programs": 2 * len(svc.buckets),
        "batch": args.batch,
        "dispatch_overhead_ms": round(overhead * 1000, 1),
        "latency": rows,
        "stablehlo_roundtrip": roundtrip,
    }, indent=2))


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _p(xs, q):
    return round(float(np.percentile(np.asarray(xs) * 1000, q)), 1)


if __name__ == "__main__":
    main()
