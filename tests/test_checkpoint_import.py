"""Trained-PeppaPig-checkpoint import: full-tower torch-vs-JAX numeric parity.

The reference's whole evaluation flow starts from Lightning `.ckpt` files
(pig/evaluation.py:42-53).  pytorch_lightning / torchaudio / torchvision are
not in this image, so these tests build COMPLETE torch towers with the exact
state-dict naming those libraries produce inside a trained PeppaPig
checkpoint (pig/models.py:223-235), randomize all weights (incl. BN running
stats), save a Lightning-layout checkpoint, import it through
models/convert.py::load_peppa_checkpoint, and assert the full forward paths
agree to ~1e-4 in f32.

The torch towers + checkpoint writer live in tests/torch_twin.py (shared
with the end-to-end quality-parity battery, tests/test_torch_twin_e2e.py).
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.torch_twin import (  # noqa: E402
    KINETICS_MEAN, KINETICS_STD, W2V_CONV_LAYERS, TorchPeppaPig,
    randomize, ref_hparams, save_lightning_ckpt)


def test_tolerant_load_and_best_ranking(tmp_path):
    """Stubbed-class unpickling + best_model_score ranking without pl."""
    from peppa_tpu.models.convert import load_torch_checkpoint
    from peppa_tpu.training.checkpoint import best_torch_checkpoint_in

    d = str(tmp_path / "version_7")
    sd = {"w": torch.zeros(2)}
    save_lightning_ckpt(os.path.join(d, "checkpoints", "epoch=1.ckpt"),
                        sd, ref_hparams(), 0.31, "valnarr_rec_fixed")
    save_lightning_ckpt(os.path.join(d, "checkpoints", "epoch=3.ckpt"),
                        sd, ref_hparams(), 0.52, "valnarr_rec_fixed")
    blob = load_torch_checkpoint(
        os.path.join(d, "checkpoints", "epoch=3.ckpt"))
    assert "state_dict" in blob and "callbacks" in blob
    assert dict(blob["hyper_parameters"])["margin"] == 0.2
    path, meta = best_torch_checkpoint_in(d)
    assert path.endswith("epoch=3.ckpt")
    assert meta["best_model_score"] == pytest.approx(0.52)
    assert meta["monitor"] == "valnarr_rec_fixed"


@pytest.mark.slow
def test_full_model_checkpoint_import_parity(tmp_path, rng):
    """Complete trained checkpoint -> load_best_model -> towers match torch."""
    from peppa_tpu.training.checkpoint import load_best_model

    torch_model = randomize(TorchPeppaPig(
        W2V_CONV_LAYERS,
        mean=KINETICS_MEAN,  # kinetics (video.pretrained=True)
        std=KINETICS_STD)).eval()

    version_dir = str(tmp_path / "version_0")
    ckpt = os.path.join(version_dir, "checkpoints",
                        "epoch=3-valnarr_rec_fixed=0.52.ckpt")
    save_lightning_ckpt(ckpt, torch_model.state_dict(), ref_hparams(),
                        0.52, "valnarr_rec_fixed")

    model, variables, config, path = load_best_model(version_dir)
    assert path == ckpt
    assert config.video.version == "r2plus1d_18"
    assert config.training.precision == "fp32"

    # ---- audio tower parity (2.3 s at 16 kHz downsampled for CPU: 0.5 s)
    audio = (rng.normal(size=(2, 8000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        want_a = torch_model.audio_encoder(torch.tensor(audio)).numpy()
    got_a = np.asarray(jax.jit(
        lambda vs, x: model.apply(vs, x, method=model.encode_audio)
    )(variables, jnp.asarray(audio)))
    np.testing.assert_allclose(got_a, want_a, rtol=1e-3, atol=1e-4)

    # ---- video tower parity
    video = rng.uniform(size=(2, 8, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want_v = torch_model.video_encoder(
            torch.tensor(np.transpose(video, (0, 4, 1, 2, 3)))).numpy()
    got_v = np.asarray(jax.jit(
        lambda vs, x: model.apply(vs, x, method=model.encode_video)
    )(variables, jnp.asarray(video)))
    np.testing.assert_allclose(got_v, want_v, rtol=1e-3, atol=1e-4)
