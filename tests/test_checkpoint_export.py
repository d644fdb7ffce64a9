"""Reverse checkpoint direction: our trained model -> reference `.ckpt`.

convert.py::export_peppa_state_dict / save_reference_checkpoint write a
model trained on this framework in the reference's Lightning checkpoint
format (pig/models.py:223-235 naming, pig/evaluation.py:42-53 blob schema),
closing the round trip the importer opened: reference users can evaluate
our checkpoints on their torch stack and vice versa.

Verification strategy (no forward pass needed):
  - import(export(x)) == x for every tensor of a reference-style state dict
    (the layout transposes are exact inverses);
  - the exported key set strict-loads into the reference-style torch modules
    of tests/test_checkpoint_import.py (missing/extra keys fail loudly);
  - the saved blob loads back through load_peppa_checkpoint and ranks via
    best_torch_checkpoint_in without pytorch_lightning installed.
Forward-numerics coverage comes from the importer's full-tower parity test —
the export mapping is its byte-exact inverse.
"""
import numpy as np
import pytest
import torch

from peppa_tpu.config import Config
from peppa_tpu.models.convert import (convert_peppa_state_dict,
                                      export_peppa_state_dict,
                                      save_reference_checkpoint)
from tests.torch_twin import (KINETICS_MEAN, KINETICS_STD, W2V_CONV_LAYERS,
                              TorchPeppaPig, randomize, ref_hparams)

# keys the importer deliberately drops and the exporter zero-fills: the
# torchvision classifier head the reference never runs (pig/models.py:141-150)
UNMAPPED = ("video_encoder.video.fc.weight", "video_encoder.video.fc.bias")


def _ref_model_and_variables():
    torch_model = randomize(TorchPeppaPig(
        W2V_CONV_LAYERS, mean=KINETICS_MEAN, std=KINETICS_STD)).eval()
    config = Config.from_dict(ref_hparams())
    params, stats = convert_peppa_state_dict(torch_model.state_dict(), config)
    variables = {"params": params, "batch_stats": stats}
    return torch_model, config, variables


def test_export_is_exact_inverse_of_import():
    torch_model, config, variables = _ref_model_and_variables()
    want = torch_model.state_dict()
    got = export_peppa_state_dict(variables, config)

    for key, tensor in got.items():
        if key in UNMAPPED or key.endswith("num_batches_tracked"):
            continue
        assert key in want, f"exported key {key} unknown to the reference model"
        np.testing.assert_array_equal(
            tensor.numpy(), want[key].detach().numpy(), err_msg=key)

    # strict load proves the key SET matches exactly (reference torch modules
    # accept the export with no missing and no unexpected keys)
    fresh = TorchPeppaPig(W2V_CONV_LAYERS, mean=KINETICS_MEAN,
                          std=KINETICS_STD)
    fresh.load_state_dict(got, strict=True)


@pytest.mark.slow
def test_save_reference_checkpoint_roundtrip(tmp_path):
    from peppa_tpu.models.convert import load_peppa_checkpoint
    from peppa_tpu.training.checkpoint import best_torch_checkpoint_in

    _, config, variables = _ref_model_and_variables()
    version_dir = tmp_path / "version_3"
    ckpt = str(version_dir / "checkpoints"
               / "epoch=7-valnarr_rec_fixed=0.61.ckpt")
    save_reference_checkpoint(ckpt, variables, config, epoch=7,
                              global_step=3500,
                              monitor="valnarr_rec_fixed", score=0.61)

    # pytorch_lightning must NOT have leaked into sys.modules (stub cleanup)
    import sys
    assert "pytorch_lightning" not in sys.modules

    model, loaded_vars, loaded_config, meta = load_peppa_checkpoint(ckpt)
    assert loaded_config.video.version == config.video.version
    assert loaded_config.audio.full
    assert meta["epoch"] == 7 and meta["global_step"] == 3500

    # the importer reproduces the exported tree bit-exactly
    a0 = variables["params"]["audio_encoder"]
    a1 = loaded_vars["params"]["audio_encoder"]
    np.testing.assert_array_equal(
        np.asarray(a1["project"]["kernel"]), np.asarray(a0["project"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(a1["wav2vec2"]["layer3"]["attention"]["q_proj"]["kernel"]),
        np.asarray(a0["wav2vec2"]["layer3"]["attention"]["q_proj"]["kernel"]))
    v0 = variables["batch_stats"]["video_encoder"]["trunk"]
    v1 = loaded_vars["batch_stats"]["video_encoder"]["trunk"]
    np.testing.assert_array_equal(
        np.asarray(v1["layer2_block0"]["bn1"]["bn"]["mean"]),
        np.asarray(v0["layer2_block0"]["bn1"]["bn"]["mean"]))

    # best-checkpoint ranking reads the callbacks entry without Lightning
    path, meta2 = best_torch_checkpoint_in(str(version_dir))
    assert path == ckpt
    assert meta2["best_model_score"] == pytest.approx(0.61)
    assert meta2["monitor"] == "valnarr_rec_fixed"


def test_export_refuses_conv_only_audio():
    _, config, variables = _ref_model_and_variables()
    config.audio.full = False
    with pytest.raises(ValueError, match="full=True"):
        export_peppa_state_dict(variables, config)


def test_static_resnet18_export_roundtrip():
    """convert_resnet18 / export_resnet18 are exact inverses (static tower)."""
    from peppa_tpu.models.convert import convert_resnet18, export_resnet18

    g = np.random.default_rng(0)

    def t(*shape):
        return torch.tensor(g.normal(size=shape).astype(np.float32))

    sd = {"conv1.weight": t(64, 3, 7, 7)}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.abs(t(c)) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(7, dtype=torch.long)

    bn("bn1", 64)
    widths = {1: 64, 2: 128, 3: 256, 4: 512}
    for li in range(1, 5):
        c, c_in = widths[li], widths[max(li - 1, 1)]
        for bi in range(2):
            pre = f"layer{li}.{bi}"
            first_in = c_in if bi == 0 else c
            sd[f"{pre}.conv1.weight"] = t(c, first_in, 3, 3)
            bn(f"{pre}.bn1", c)
            sd[f"{pre}.conv2.weight"] = t(c, c, 3, 3)
            bn(f"{pre}.bn2", c)
            if bi == 0 and li > 1:
                sd[f"{pre}.downsample.0.weight"] = t(c, c_in, 1, 1)
                bn(f"{pre}.downsample.1", c)
    sd["fc.weight"] = t(1000, 512)
    sd["fc.bias"] = t(1000)

    p, s = convert_resnet18(sd)
    out = export_resnet18(p, s, "")
    for key, tensor in out.items():
        if key.startswith("fc.") or key.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(
            tensor.numpy(), sd[key].numpy(), err_msg=key)
    assert set(out) == set(sd)
