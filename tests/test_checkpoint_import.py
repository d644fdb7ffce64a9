"""Trained-PeppaPig-checkpoint import: full-tower torch-vs-JAX numeric parity.

The reference's whole evaluation flow starts from Lightning `.ckpt` files
(pig/evaluation.py:42-53).  pytorch_lightning / torchaudio / torchvision are
not in this image, so these tests build COMPLETE torch towers with the exact
state-dict naming those libraries produce inside a trained PeppaPig
checkpoint (pig/models.py:223-235), randomize all weights (incl. BN running
stats), save a Lightning-layout checkpoint, import it through
models/convert.py::load_peppa_checkpoint, and assert the full forward paths
agree to ~1e-4 in f32.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# =====================================================================
# torch audio tower with torchaudio state-dict naming
# =====================================================================

class TAConvLayerBlock(tnn.Module):
    def __init__(self, c_in, c_out, k, s, group_norm=False):
        super().__init__()
        self.conv = tnn.Conv1d(c_in, c_out, k, stride=s, bias=False)
        self.layer_norm = tnn.GroupNorm(c_out, c_out, eps=1e-5) if group_norm \
            else None

    def forward(self, x):
        x = self.conv(x)
        if self.layer_norm is not None:
            x = self.layer_norm(x)
        return tF.gelu(x)


class TAFeatureExtractor(tnn.Module):
    def __init__(self, layers):
        super().__init__()
        blocks, c_in = [], 1
        for i, (ch, k, s) in enumerate(layers):
            blocks.append(TAConvLayerBlock(c_in, ch, k, s, group_norm=(i == 0)))
            c_in = ch
        self.conv_layers = tnn.ModuleList(blocks)

    def forward(self, x):  # (B, S) -> (B, T, C)
        x = x.unsqueeze(1)
        for b in self.conv_layers:
            x = b(x)
        return x.transpose(1, 2)


class TAFeatureProjection(tnn.Module):
    def __init__(self, c_in, d):
        super().__init__()
        self.layer_norm = tnn.LayerNorm(c_in, eps=1e-5)
        self.projection = tnn.Linear(c_in, d)

    def forward(self, x):
        return self.projection(self.layer_norm(x))


class TAPosConvEmbed(tnn.Module):
    def __init__(self, d, k, groups):
        super().__init__()
        conv = tnn.Conv1d(d, d, k, padding=k // 2, groups=groups)
        self.conv = tnn.utils.weight_norm(conv, name="weight", dim=2)
        self.k = k

    def forward(self, x):  # (B, T, D)
        y = self.conv(x.transpose(1, 2))
        if self.k % 2 == 0:
            y = y[..., :-1]
        return tF.gelu(y).transpose(1, 2)


class TAAttention(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.q_proj = tnn.Linear(d, d)
        self.k_proj = tnn.Linear(d, d)
        self.v_proj = tnn.Linear(d, d)
        self.out_proj = tnn.Linear(d, d)
        self.h = h

    def forward(self, x):
        b, t, d = x.shape
        hd = d // self.h
        q = self.q_proj(x).view(b, t, self.h, hd).transpose(1, 2)
        k = self.k_proj(x).view(b, t, self.h, hd).transpose(1, 2)
        v = self.v_proj(x).view(b, t, self.h, hd).transpose(1, 2)
        w = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
        out = (w @ v).transpose(1, 2).reshape(b, t, d)
        return self.out_proj(out)


class TAFeedForward(tnn.Module):
    def __init__(self, d, ffn):
        super().__init__()
        self.intermediate_dense = tnn.Linear(d, ffn)
        self.output_dense = tnn.Linear(ffn, d)

    def forward(self, x):
        return self.output_dense(tF.gelu(self.intermediate_dense(x)))


class TAEncoderLayer(tnn.Module):
    def __init__(self, d, h, ffn):
        super().__init__()
        self.attention = TAAttention(d, h)
        self.layer_norm = tnn.LayerNorm(d, eps=1e-5)
        self.feed_forward = TAFeedForward(d, ffn)
        self.final_layer_norm = tnn.LayerNorm(d, eps=1e-5)

    def forward(self, x):
        x = self.layer_norm(x + self.attention(x))
        return self.final_layer_norm(x + self.feed_forward(x))


class TATransformer(tnn.Module):
    def __init__(self, d, h, ffn, n_layers, k, groups):
        super().__init__()
        self.pos_conv_embed = TAPosConvEmbed(d, k, groups)
        self.layer_norm = tnn.LayerNorm(d, eps=1e-5)
        self.layers = tnn.ModuleList(
            [TAEncoderLayer(d, h, ffn) for _ in range(n_layers)])

    def forward(self, x):
        # fairseq post-norm: encoder LayerNorm BEFORE the layer stack
        x = self.layer_norm(x + self.pos_conv_embed(x))
        for layer in self.layers:
            x = layer(x)
        return x


class TAEncoder(tnn.Module):
    def __init__(self, c_in, d, h, ffn, n_layers, k, groups):
        super().__init__()
        self.feature_projection = TAFeatureProjection(c_in, d)
        self.transformer = TATransformer(d, h, ffn, n_layers, k, groups)

    def forward(self, x):
        return self.transformer(self.feature_projection(x))


class TAWav2Vec2Model(tnn.Module):
    """torchaudio Wav2Vec2Model as produced by import_fairseq_model(num_out=28)."""

    def __init__(self, conv_layers, d=768, h=12, ffn=3072, n_layers=12,
                 k=128, groups=16, num_out=28):
        super().__init__()
        self.feature_extractor = TAFeatureExtractor(conv_layers)
        self.encoder = TAEncoder(conv_layers[-1][0], d, h, ffn, n_layers,
                                 k, groups)
        self.aux = tnn.Linear(d, num_out)

    def forward(self, x):  # full=True path: 28-d logits
        return self.aux(self.encoder(self.feature_extractor(x)))


class RefAttention(tnn.Module):
    """Reference pig/models.py:30-43 Attention pooling."""

    def __init__(self, in_size, hidden_size):
        super().__init__()
        self.hidden = tnn.Linear(in_size, hidden_size)
        self.out = tnn.Linear(hidden_size, in_size)

    def forward(self, x):
        alpha = torch.softmax(self.out(torch.tanh(self.hidden(x))), dim=1)
        return (alpha * x).sum(dim=1)


class TorchWav2VecEncoder(tnn.Module):
    """Reference Wav2VecEncoder (pig/models.py:66-109), full=True, attention."""

    def __init__(self, conv_layers, **kw):
        super().__init__()
        self.audio = TAWav2Vec2Model(conv_layers, **kw)
        n = self.audio.aux.out_features
        self.audiopool = RefAttention(n, 128)
        self.project = tnn.Linear(n, 512)

    def forward(self, x):
        feats = self.audio(x)
        return tF.normalize(self.project(self.audiopool(feats)), p=2, dim=1)


# =====================================================================
# torch video tower with torchvision state-dict naming (r2plus1d_18)
# =====================================================================

def tv_midplanes(c_in, c_out):
    return (c_in * c_out * 3 * 3 * 3) // (c_in * 3 * 3 + 3 * c_out)


class TVConv2Plus1D(tnn.Sequential):
    def __init__(self, c_in, c_out, mid, stride=1):
        super().__init__(
            tnn.Conv3d(c_in, mid, (1, 3, 3), stride=(1, stride, stride),
                       padding=(0, 1, 1), bias=False),
            tnn.BatchNorm3d(mid, eps=1e-5), tnn.ReLU(inplace=True),
            tnn.Conv3d(mid, c_out, (3, 1, 1), stride=(stride, 1, 1),
                       padding=(1, 0, 0), bias=False))


class TVBasicBlock(tnn.Module):
    def __init__(self, c_in, c_out, stride=1):
        super().__init__()
        mid = tv_midplanes(c_in, c_out)
        self.conv1 = tnn.Sequential(TVConv2Plus1D(c_in, c_out, mid, stride),
                                    tnn.BatchNorm3d(c_out, eps=1e-5),
                                    tnn.ReLU(inplace=True))
        self.conv2 = tnn.Sequential(TVConv2Plus1D(c_out, c_out, mid),
                                    tnn.BatchNorm3d(c_out, eps=1e-5))
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(c_in, c_out, 1, stride=stride, bias=False),
                tnn.BatchNorm3d(c_out, eps=1e-5))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        return self.relu(self.conv2(self.conv1(x)) + identity)


class TVR2Plus1dStem(tnn.Sequential):
    def __init__(self):
        super().__init__(
            tnn.Conv3d(3, 45, (1, 7, 7), stride=(1, 2, 2), padding=(0, 3, 3),
                       bias=False),
            tnn.BatchNorm3d(45, eps=1e-5), tnn.ReLU(inplace=True),
            tnn.Conv3d(45, 64, (3, 1, 1), stride=(1, 1, 1), padding=(1, 0, 0),
                       bias=False),
            tnn.BatchNorm3d(64, eps=1e-5), tnn.ReLU(inplace=True))


class TVVideoResNet(tnn.Module):
    """torchvision r2plus1d_18 trunk (fc present in state_dict but unused)."""

    def __init__(self):
        super().__init__()
        self.stem = TVR2Plus1dStem()
        widths = (64, 128, 256, 512)
        strides = (1, 2, 2, 2)
        c_in = 64
        for li, (w, s) in enumerate(zip(widths, strides), 1):
            setattr(self, f"layer{li}", tnn.Sequential(
                TVBasicBlock(c_in, w, s), TVBasicBlock(w, w, 1)))
            c_in = w
        self.fc = tnn.Linear(512, 400)

    def trunk(self, x):  # the reference's encode skips avgpool/fc
        x = self.stem(x)
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        return x


class TorchVideoAttention(tnn.Module):
    """Reference pig/models.py:213-221."""

    def __init__(self, in_size=512, hidden_size=128):
        super().__init__()
        self.spatial_avg = tnn.AdaptiveAvgPool2d(output_size=(1, 1))
        self.attn = RefAttention(in_size, hidden_size)

    def forward(self, x):  # (B, C, T, H, W)
        return self.attn(self.spatial_avg(x).flatten(2).permute(0, 2, 1))


class TorchR3DEncoder(tnn.Module):
    """Reference R3DEncoder (pig/models.py:113-154), r2plus1d_18, attention."""

    def __init__(self, mean, std):
        super().__init__()
        self.video = TVVideoResNet()
        self.videopool = TorchVideoAttention(512, 128)
        self.project = tnn.Linear(512, 512)
        self.register_buffer("m", torch.tensor(mean).view(1, 3, 1, 1, 1),
                             persistent=False)
        self.register_buffer("s", torch.tensor(std).view(1, 3, 1, 1, 1),
                             persistent=False)

    def forward(self, x):  # (B, C, T, H, W) in [0, 1]
        x = (x - self.m) / self.s
        x = self.video.trunk(x)
        x = self.videopool(x)
        return tF.normalize(self.project(x), p=2, dim=1)


class TorchPeppaPig(tnn.Module):
    def __init__(self, conv_layers, mean, std, **audio_kw):
        super().__init__()
        self.video_encoder = TorchR3DEncoder(mean, std)
        self.audio_encoder = TorchWav2VecEncoder(conv_layers, **audio_kw)


# =====================================================================
# helpers
# =====================================================================

W2V_CONV_LAYERS = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                   (512, 3, 2), (512, 2, 2), (512, 2, 2))


def randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.08, 0.08, generator=g)
        for m in model.modules():
            if isinstance(m, (tnn.BatchNorm3d, tnn.GroupNorm, tnn.LayerNorm)):
                m.weight.uniform_(0.8, 1.2, generator=g)
                m.bias.uniform_(-0.1, 0.1, generator=g)
            if isinstance(m, tnn.BatchNorm3d):
                m.running_mean.uniform_(-0.3, 0.3, generator=g)
                m.running_var.uniform_(0.6, 1.4, generator=g)
    return model


def ref_hparams():
    """The reference-format hyper_parameters dict Lightning embeds."""
    return {
        "margin": 0.2,
        "data": {"target_size": [64, 64], "audio_sample_rate": 16000,
                 "num_workers": 2},
        "video": {"pretrained": True, "project": True,
                  "version": "r2plus1d_18", "pooling": "attention"},
        "audio": {"path": "data/in/wav2vec/wav2vec_small.pt",
                  "pretrained": True, "freeze_feature_extractor": True,
                  "freeze_encoder_layers": None, "pooling": "attention",
                  "project": True, "full": True},
        "optimizer": {"lr": 1e-4, "warmup": 0.1, "schedule": "warmup_linear",
                      "t_total": 15000},
        "training": {"trainer_args": {"accumulate_grad_batches": 8,
                                      "precision": 32}},
    }


def _fake_pl_modules():
    """Register fake pytorch_lightning modules so torch.save can pickle a
    class reference the LOADER must then resolve without the package."""
    mods = {}
    for name in ("pytorch_lightning", "pytorch_lightning.callbacks",
                 "pytorch_lightning.callbacks.model_checkpoint"):
        mods[name] = types.ModuleType(name)
        sys.modules[name] = mods[name]

    class ModelCheckpoint:
        pass

    ModelCheckpoint.__module__ = "pytorch_lightning.callbacks.model_checkpoint"
    ModelCheckpoint.__qualname__ = "ModelCheckpoint"
    mods["pytorch_lightning.callbacks.model_checkpoint"].ModelCheckpoint = \
        ModelCheckpoint
    return ModelCheckpoint, list(mods)


def save_lightning_ckpt(path, state_dict, hparams, score, monitor,
                        best_model_path=None):
    cls, mod_names = _fake_pl_modules()
    try:
        blob = {
            "state_dict": state_dict,
            "hyper_parameters": hparams,
            "epoch": 3,
            "global_step": 1200,
            "callbacks": {cls: {
                "monitor": monitor,
                "best_model_score": torch.tensor(score),
                "best_model_path": best_model_path or
                    f"/remote/peppa/lightning_logs/version_7/checkpoints/"
                    f"{os.path.basename(path)}",
            }},
        }
        os.makedirs(os.path.dirname(path), exist_ok=True)
        torch.save(blob, path)
    finally:
        for name in mod_names:  # loading must work WITHOUT the package
            sys.modules.pop(name, None)


# =====================================================================
# tests
# =====================================================================

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
        mean=(0.43216, 0.394666, 0.37645),  # kinetics (video.pretrained=True)
        std=(0.22803, 0.22145, 0.216989))).eval()

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
