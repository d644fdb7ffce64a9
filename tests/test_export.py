"""AOT export artifacts: serialize -> reload -> numeric agreement."""

import json
import os

import jax
import numpy as np
import pytest

from peppa_tpu.config import Config
from peppa_tpu.export import ExportedEncoders, export_encoders
from peppa_tpu.models.dual_encoder import init_model
from peppa_tpu.serving import EncoderService


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = Config()
    cfg.data.target_size = (32, 32)
    cfg.data.audio_sample_rate = 800
    cfg.training.precision = "fp32"
    cfg.audio.full = False
    cfg.video.version = "r3d_18"
    cfg.tpu.bucket_durations = (0.5, 1.0)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("export") / "artifact")
    manifest = export_encoders(model, variables, cfg, out, batch_size=3)
    svc = EncoderService(model, variables, cfg, batch_size=3)
    return out, manifest, svc


def test_manifest_and_files(artifact):
    out, manifest, _ = artifact
    assert manifest["format"] == "peppa-tpu-export-v1"
    # 2 buckets x 2 encoders
    assert len(manifest["programs"]) == 4
    for prog in manifest["programs"]:
        assert os.path.getsize(os.path.join(out, prog["file"])) > 0
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f)["batch_size"] == 3
    # the config snapshot survives for provenance
    assert manifest["config"]["data"]["audio_sample_rate"] == 800


def test_reload_matches_live_service(artifact, rng):
    out, _, svc = artifact
    enc = ExportedEncoders(out)
    waves = [rng.normal(size=(s,)).astype(np.float32)
             for s in (200, 380, 400, 750, 123)]
    clips = [rng.uniform(size=(t, 32, 32, 3)).astype(np.float32)
             for t in (3, 5, 9)]
    a_exp, a_live = enc.embed_audio(waves), svc.embed_audio(waves)
    v_exp, v_live = enc.embed_video(clips), svc.embed_video(clips)
    np.testing.assert_allclose(a_exp, a_live, atol=1e-5)
    np.testing.assert_allclose(v_exp, v_live, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(a_exp, axis=1), 1.0, rtol=1e-4)
    sim = enc.similarity(v_exp, a_exp[:3])
    np.testing.assert_allclose(sim, svc.similarity(v_live, a_live[:3]),
                               atol=1e-5)


def test_overlong_crops_to_last_bucket(artifact, rng):
    out, _, _ = artifact
    enc = ExportedEncoders(out)
    wave = rng.normal(size=(1280,)).astype(np.float32)  # > 1.0 s last bucket
    emb = enc.embed_audio([wave])
    ref = enc.embed_audio([wave[:800]])
    np.testing.assert_allclose(emb, ref, atol=1e-6)


def test_artifact_rejects_wrong_format(tmp_path):
    os.makedirs(tmp_path / "bad", exist_ok=True)
    with open(tmp_path / "bad" / "manifest.json", "w") as f:
        json.dump({"format": "something-else"}, f)
    with pytest.raises(ValueError, match="not a peppa-tpu export artifact"):
        ExportedEncoders(str(tmp_path / "bad"))
