"""End-to-end test of example.py — the minimal public "embed audio" API.

Parity target: reference example.py:6-15 (load_from_checkpoint ->
encode_audio over audiofile_loader batches).  Fabricates a real run dir
(hparams.yaml + a scored msgpack checkpoint) with the tiny 2-layer test
config, writes wav files, and checks the CLI's main() returns embeddings
of the projected dimensionality for every input file.
"""

import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # one tiny-model CPU compile (~1 min)


def _write_wav(path, seconds, rate=44100, seed=0):
    rng = np.random.default_rng(seed)
    samples = (np.clip(rng.standard_normal(int(rate * seconds)) * 0.1, -1, 1)
               * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())


def test_example_embeds_audio_from_best_checkpoint(tmp_path):
    import jax

    from peppa_tpu.config import default_config
    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.training.checkpoint import save_checkpoint, save_hparams
    from peppa_tpu.training.optimization import make_optimizer
    from peppa_tpu.training.state import TrainState

    cfg = default_config()
    cfg.data.target_size = (32, 32)
    cfg.training.precision = "fp32"
    cfg.audio.num_layers = 2

    model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                  audio_samples=3200, video_frames=4)
    tx = make_optimizer(cfg.optimizer, accumulate_grad_batches=1,
                        params=variables["params"])
    state = TrainState.create(variables, tx)

    version_dir = tmp_path / "lightning_logs" / "version_0"
    ckpt_dir = version_dir / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    save_hparams(str(version_dir), cfg)
    # two scored checkpoints: main() must pick the higher-scored one
    save_checkpoint(str(ckpt_dir / "epoch=0-valnarr_rec_fixed=0.10.ckpt"),
                    state, {"best_model_score": 0.10,
                            "monitor": "valnarr_rec_fixed", "epoch": 0})
    save_checkpoint(str(ckpt_dir / "epoch=1-valnarr_rec_fixed=0.50.ckpt"),
                    state, {"best_model_score": 0.50,
                            "monitor": "valnarr_rec_fixed", "epoch": 1})

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    for i, sec in enumerate([0.21, 0.21, 0.21]):
        _write_wav(wav_dir / f"{i}.wav", sec, seed=i)

    import example

    emb = example.main(str(version_dir), str(wav_dir / "*.wav"))
    assert emb.shape == (3, 512)
    assert np.all(np.isfinite(emb))
    # distinct inputs embed distinctly
    assert np.abs(emb[0] - emb[1]).max() > 1e-6
