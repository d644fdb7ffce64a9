"""Diagnose per-transfer host-memory retention in the device backend.

Measures host RSS growth across N host->device transfers of batch-shaped
arrays (soak shapes: uint8 video + f32 audio, ~2.4 MB) with a trivial jit
consuming them, while asserting `jax.live_arrays()` stays constant — so any
growth is BELOW jax, in the PJRT plugin / transfer layer.

Findings on the axon-tunneled v5e (2026-08, PERF.md "Host-memory leak"):
  baseline drift ~+2.3 MB/step == the transferred bytes; .delete(),
  host-buffer reuse, clear_caches, malloc_trim all ineffective;
  axon_reset() reclaims fully (the session-recycle watchdog builds on it).

Usage: python scripts/transfer_leak_probe.py [--steps 300] [--recycle-every 0]
Exit code 1 if drift exceeds 0.5 MB/step and no recycle is armed — i.e. the
platform leaks and long runs need `tpu.host_rss_recycle_gb`.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    # same probe the watchdog uses, so the diagnostic and the mitigation
    # can never measure differently
    from peppa_tpu.utils.host_memory import host_rss_bytes

    return host_rss_bytes() / (1 << 20)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--recycle-every", type=int, default=0,
                    help="recycle the device session every N steps "
                         "(0: never) to verify the mitigation")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from peppa_tpu.utils.host_memory import SessionRecycler

    f = jax.jit(lambda x, y: (x.astype(jnp.bfloat16).sum()
                              + y.sum().astype(jnp.bfloat16)).astype(
                                  jnp.float32))
    rng = np.random.default_rng(0)
    recycler = SessionRecycler()
    print(f"backend={jax.default_backend()} recycler={recycler.available}")

    anchor = jax.device_put(np.float32(0.0))  # stands in for model state
    live0 = len(jax.live_arrays())
    # warmup (compile) before the measured window
    float(f(jax.device_put(np.zeros((8, 23, 64, 48, 3), np.uint8)),
            jax.device_put(np.zeros((8, 18400), np.float32))))
    r0 = rss_mb()
    for i in range(args.steps):
        v = rng.integers(0, 255, (8, 23, 64, 48, 3), dtype=np.uint8)
        a = rng.normal(size=(8, 18400)).astype(np.float32)
        float(f(jax.device_put(v), jax.device_put(a)))
        if args.recycle_every and recycler.available \
                and (i + 1) % args.recycle_every == 0:
            anchor = recycler.recycle(anchor)
            print(f"  recycled at {i + 1}: rss {rss_mb():.0f} MB")
    drift = (rss_mb() - r0) / args.steps
    live_delta = len(jax.live_arrays()) - live0
    print(f"steps={args.steps} drift={drift:+.3f} MB/step "
          f"live_arrays_delta={live_delta}")
    if drift > 0.5 and not args.recycle_every:
        print("LEAK: this platform retains transfer payloads; arm "
              "tpu.host_rss_recycle_gb for long runs")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
