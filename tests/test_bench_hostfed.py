"""bench.py host-fed variants: distribution shape, int16 pack, cold cache.

The chip numbers come from the driver's bench run; this test pins the
HARNESS semantics on CPU with a tiny model: every variant returns a
{median, min, max, windows, window_seconds} distribution (VERDICT r3 #6 —
"host_fed is a distribution, not a point"), the int16 variant builds and
reads a pack-v2 file, and the cold variant evicts the page cache and
reports a first-pass number.
"""

import os

import numpy as np
import pytest

import bench
from peppa_tpu.native import native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader not built")


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    from peppa_tpu.config import default_config
    from peppa_tpu.models.dual_encoder import init_model

    cfg = default_config()
    cfg.data.target_size = (180, 100)  # pack shapes are fixed (100, 180)
    cfg.training.precision = "fp32"
    cfg.audio.full = False  # conv-only trunk: fast CPU compile
    frames, samples = 4, 3200
    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  audio_samples=samples, video_frames=frames)
    return model, variables, cfg, frames, samples


def _run(tiny_model, tmp_path, monkeypatch, name, **kw):
    model, variables, cfg, frames, samples = tiny_model
    monkeypatch.setenv("BENCH_HOST_BATCH", "4")
    monkeypatch.setenv("BENCH_HOST_ITEMS", "8")
    monkeypatch.setenv("BENCH_HOST_WINDOWS", "3")
    monkeypatch.setenv("BENCH_HOST_WINDOW_SECONDS", "0.3")
    monkeypatch.setenv("BENCH_PACK", str(tmp_path / f"{name}.ppkc"))
    return bench.host_fed_pairs_per_sec(model, variables, cfg, frames,
                                        samples, **kw)


@pytest.mark.slow
def test_host_fed_distribution_and_variants(tiny_model, tmp_path, monkeypatch):
    stats = _run(tiny_model, tmp_path, monkeypatch, "f32")
    assert set(stats) == {"median", "min", "max", "windows", "window_seconds"}
    assert len(stats["windows"]) == 3
    assert stats["min"] <= stats["median"] <= stats["max"]
    assert stats["min"] > 0
    assert sorted(stats["windows"])[1] == stats["median"]

    i16 = _run(tiny_model, tmp_path, monkeypatch, "i16", audio_int16=True)
    assert i16["median"] > 0
    # the pack really is v2: int16 audio on disk
    from peppa_tpu.native import NativePack

    pack = NativePack(str(tmp_path / "i16.ppkc"))
    assert np.dtype(pack.audio_dtype) == np.int16
    pack.close()

    cold = _run(tiny_model, tmp_path, monkeypatch, "cold", cold_cache=True)
    assert "first_pass_cold" in cold
    assert cold["first_pass_cold"] is None or cold["first_pass_cold"] > 0


@pytest.mark.skipif(not hasattr(os, "posix_fadvise"),
                    reason="posix_fadvise unavailable on this platform")
def test_drop_file_cache(tmp_path):
    p = tmp_path / "blob.bin"
    p.write_bytes(os.urandom(1 << 20))
    assert bench._drop_file_cache(str(p)) is True
