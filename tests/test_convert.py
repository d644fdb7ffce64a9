"""Converter parity tests: torch state dicts -> flax params -> same outputs.

torchaudio/torchvision are not in the image, so these tests build minimal
torch models with the SAME state-dict naming and computation as the sources
the converters target (fairseq wav2vec2, torchvision VideoResNet), then check
our flax modules produce matching outputs after conversion — this is what
guards the pretrained-weight path (layout transposes, weight-norm splitting,
BN stats placement).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# ------------------------------------------------------------- wav2vec2 conv

class TorchConvExtractor(tnn.Module):
    """fairseq-style conv feature extractor (group_norm mode), tiny config."""

    def __init__(self, layers):
        super().__init__()
        self.conv_layers = tnn.ModuleList()
        in_ch = 1
        for i, (ch, k, s) in enumerate(layers):
            block = tnn.ModuleDict()
            conv = tnn.Conv1d(in_ch, ch, k, stride=s, bias=False)
            block["0"] = conv
            if i == 0:
                block["2"] = tnn.GroupNorm(ch, ch, eps=1e-5)
            self.conv_layers.append(block)
            in_ch = ch

    def forward(self, x):  # (B, S)
        x = x.unsqueeze(1)
        for i, block in enumerate(self.conv_layers):
            x = block["0"](x)
            if "2" in block:
                x = block["2"](x)
            x = tnn.functional.gelu(x)
        return x.transpose(1, 2)  # (B, T, C)

    def state_dict_fairseq(self):
        out = {}
        for i, block in enumerate(self.conv_layers):
            out[f"feature_extractor.conv_layers.{i}.0.weight"] = \
                block["0"].weight
            if "2" in block:
                out[f"feature_extractor.conv_layers.{i}.2.weight"] = \
                    block["2"].weight
                out[f"feature_extractor.conv_layers.{i}.2.bias"] = \
                    block["2"].bias
        return out


def test_wav2vec2_conv_extractor_parity(rng):
    from peppa_tpu.models.convert import conv1d, _np
    from peppa_tpu.models.wav2vec2 import ConvFeatureExtractor
    import peppa_tpu.models.wav2vec2 as w2v

    layers = ((8, 10, 5), (8, 3, 2))
    torch_model = TorchConvExtractor(layers).eval()
    x = rng.normal(size=(2, 400)).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.tensor(x)).numpy()

    # build flax params from the torch weights with the converter transposes
    orig = w2v.CONV_LAYERS
    w2v.CONV_LAYERS = layers
    try:
        enc = ConvFeatureExtractor()
        variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
        sd = torch_model.state_dict_fairseq()
        params = {
            "conv0": {"kernel": conv1d(sd["feature_extractor.conv_layers.0.0.weight"])},
            "conv1": {"kernel": conv1d(sd["feature_extractor.conv_layers.1.0.weight"])},
            "group_norm": {
                "scale": _np(sd["feature_extractor.conv_layers.0.2.weight"]),
                "bias": _np(sd["feature_extractor.conv_layers.0.2.bias"]),
            },
        }
        got = enc.apply({"params": params}, jnp.asarray(x))
    finally:
        w2v.CONV_LAYERS = orig
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# --------------------------------------------------- wav2vec2 transformer

class TorchW2VLayer(tnn.Module):
    """fairseq post-norm transformer layer with fairseq state-dict names."""

    def __init__(self, d, h, ffn):
        super().__init__()
        self.self_attn = tnn.MultiheadAttention(d, h, batch_first=True)
        self.self_attn_layer_norm = tnn.LayerNorm(d, eps=1e-5)
        self.fc1 = tnn.Linear(d, ffn)
        self.fc2 = tnn.Linear(ffn, d)
        self.final_layer_norm = tnn.LayerNorm(d, eps=1e-5)

    def forward(self, x):
        attn, _ = self.self_attn(x, x, x, need_weights=False)
        x = self.self_attn_layer_norm(x + attn)
        y = self.fc2(tnn.functional.gelu(self.fc1(x)))
        return self.final_layer_norm(x + y)


def test_wav2vec2_transformer_layer_parity(rng):
    from peppa_tpu.models.convert import linear, _np
    from peppa_tpu.models.wav2vec2 import TransformerLayer, Wav2Vec2Config

    d, h, ffn = 16, 4, 32
    tl = TorchW2VLayer(d, h, ffn).eval()
    x = rng.normal(size=(2, 12, d)).astype(np.float32)
    with torch.no_grad():
        want = tl(torch.tensor(x)).numpy()

    # split torch's packed in_proj into q/k/v (fairseq stores them separately;
    # the converter consumes separate projections)
    w_in = tl.self_attn.in_proj_weight.detach().numpy()
    b_in = tl.self_attn.in_proj_bias.detach().numpy()
    qw, kw, vw = np.split(w_in, 3, axis=0)
    qb, kb, vb = np.split(b_in, 3, axis=0)
    params = {
        "attention": {
            "q_proj": {"kernel": linear(qw), "bias": qb},
            "k_proj": {"kernel": linear(kw), "bias": kb},
            "v_proj": {"kernel": linear(vw), "bias": vb},
            "out_proj": {"kernel": linear(tl.self_attn.out_proj.weight),
                         "bias": _np(tl.self_attn.out_proj.bias)},
        },
        "ln1": {"scale": _np(tl.self_attn_layer_norm.weight),
                "bias": _np(tl.self_attn_layer_norm.bias)},
        "ffn_in": {"kernel": linear(tl.fc1.weight), "bias": _np(tl.fc1.bias)},
        "ffn_out": {"kernel": linear(tl.fc2.weight), "bias": _np(tl.fc2.bias)},
        "ln2": {"scale": _np(tl.final_layer_norm.weight),
                "bias": _np(tl.final_layer_norm.bias)},
    }
    cfg = Wav2Vec2Config(embed_dim=d, num_heads=h, ffn_dim=ffn,
                         attention_dropout=0.0, dropout=0.0)
    layer = TransformerLayer(cfg, use_pallas=False)
    got = layer.apply({"params": params}, jnp.asarray(x), None, True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------ pos-conv weight norm

def test_pos_conv_weight_norm_parity(rng):
    """fairseq's weight_norm(dim=2) splitting must reconstruct the kernel."""
    from peppa_tpu.models.convert import convert_wav2vec2_fairseq
    from peppa_tpu.models.wav2vec2 import ConvPositionalEmbedding, Wav2Vec2Config

    d, k, g = 8, 4, 2
    conv = tnn.Conv1d(d, d, k, padding=k // 2, groups=g)
    conv = tnn.utils.weight_norm(conv, name="weight", dim=2)
    conv.eval()
    x = rng.normal(size=(2, 10, d)).astype(np.float32)
    with torch.no_grad():
        out = conv(torch.tensor(x).transpose(1, 2)).transpose(1, 2)
        if k % 2 == 0:
            out = out[:, :-1, :]
        want = tnn.functional.gelu(out).numpy()

    state = {
        "encoder.pos_conv.0.weight_v": conv.weight_v,
        "encoder.pos_conv.0.weight_g": conv.weight_g,
        "encoder.pos_conv.0.bias": conv.bias,
        # minimal other keys for the converter
        "layer_norm.weight": torch.ones(1), "layer_norm.bias": torch.zeros(1),
        "post_extract_proj.weight": torch.ones(1, 1),
        "post_extract_proj.bias": torch.zeros(1),
        "encoder.layer_norm.weight": torch.ones(1),
        "encoder.layer_norm.bias": torch.zeros(1),
    }
    tree = convert_wav2vec2_fairseq(state)
    cfg = Wav2Vec2Config(embed_dim=d, pos_conv_kernel=k, pos_conv_groups=g)
    mod = ConvPositionalEmbedding(cfg)
    got = mod.apply({"params": tree["pos_conv"]}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------- video resnet

class TorchBasicBlock3D(tnn.Module):
    """torchvision VideoResNet BasicBlock with r3d-style Conv3DSimple."""

    def __init__(self, c_in, c_out, stride):
        super().__init__()
        self.conv1 = tnn.Sequential(
            tnn.Conv3d(c_in, c_out, 3, stride=stride, padding=1, bias=False),
            tnn.BatchNorm3d(c_out, eps=1e-5), tnn.ReLU())
        self.conv2 = tnn.Sequential(
            tnn.Conv3d(c_out, c_out, 3, padding=1, bias=False),
            tnn.BatchNorm3d(c_out, eps=1e-5))
        self.relu = tnn.ReLU()
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = tnn.Sequential(
                tnn.Conv3d(c_in, c_out, 1, stride=stride, bias=False),
                tnn.BatchNorm3d(c_out, eps=1e-5))

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.conv2(self.conv1(x))
        return self.relu(out + identity)


def _r21_block_variables(rng, key, midplanes_multiple, x):
    import jax

    from peppa_tpu.models.video3d import BasicBlock, Conv2Plus1D

    blk = BasicBlock(64, 64, Conv2Plus1D, 1,
                     midplanes_multiple=midplanes_multiple)
    v = blk.init(jax.random.PRNGKey(key), x, False)
    # randomize BN params/stats so stat slicing/padding is exercised
    params = jax.tree.map(
        lambda a: np.asarray(a, np.float32).copy(), v["params"])
    stats = jax.tree.map(
        lambda a: (np.asarray(a) + rng.uniform(0.1, 0.5, np.shape(a)))
        .astype(np.float32), v["batch_stats"])
    return blk, params, stats


def test_widen_midplanes_pad_is_exact(rng):
    """Blocks whose rounded mid width GROWS are zero-padded: the adapted
    weights compute the identical function (pretrained init preserved)."""
    import jax
    import jax.numpy as jnp

    from peppa_tpu.models.convert import widen_midplanes
    from peppa_tpu.models.video3d import BasicBlock, Conv2Plus1D, midplanes

    assert midplanes(64, 64) == 144 and midplanes(64, 64, 256) == 256
    x = jnp.asarray(rng.uniform(size=(1, 4, 10, 10, 64)).astype(np.float32))
    narrow, params, stats = _r21_block_variables(rng, 0, None, x)
    want = narrow.apply({"params": params, "batch_stats": stats}, x, False)

    tree_p, tree_s = widen_midplanes({"layer1_block0": params},
                                     {"layer1_block0": stats}, 256)
    wide = BasicBlock(64, 64, Conv2Plus1D, 1, midplanes_multiple=256)
    got = wide.apply({"params": tree_p["layer1_block0"],
                      "batch_stats": tree_s["layer1_block0"]}, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_widen_midplanes_shrink_drops_weak_channels(rng):
    """Blocks whose rounded mid width SHRINKS (144 -> 128 at multiple=128)
    drop the lowest-importance channels; channels contributing nothing are
    the ones removed, so the function is preserved."""
    import jax
    import jax.numpy as jnp

    from peppa_tpu.models.convert import widen_midplanes
    from peppa_tpu.models.video3d import BasicBlock, Conv2Plus1D, midplanes

    assert midplanes(64, 64, 128) == 128
    x = jnp.asarray(rng.uniform(size=(1, 4, 10, 10, 64)).astype(np.float32))
    narrow, params, stats = _r21_block_variables(rng, 1, None, x)
    # make 16 channels per conv contribute exactly zero: zero spatial kernel
    # (=> zero importance) and negative BN output (ReLU kills the constant)
    for conv in ("conv1", "conv2"):
        dead = rng.choice(144, size=16, replace=False)
        params[conv]["spatial"]["kernel"][..., dead] = 0.0
        params[conv]["bn_mid"]["bn"]["bias"][dead] = -1.0
        stats[conv]["bn_mid"]["bn"]["mean"][dead] = 0.0
    want = narrow.apply({"params": params, "batch_stats": stats}, x, False)

    tree_p, tree_s = widen_midplanes({"layer1_block0": params},
                                     {"layer1_block0": stats}, 128)
    assert tree_p["layer1_block0"]["conv1"]["spatial"]["kernel"].shape[-1] == 128
    shrunk = BasicBlock(64, 64, Conv2Plus1D, 1, midplanes_multiple=128)
    got = shrunk.apply({"params": tree_p["layer1_block0"],
                        "batch_stats": tree_s["layer1_block0"]}, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_video_resnet_block_parity(rng):
    from peppa_tpu.models.convert import conv3d, _bn
    from peppa_tpu.models.video3d import BasicBlock, Conv3DSimple

    c_in, c_out, stride = 4, 8, 2
    blk = TorchBasicBlock3D(c_in, c_out, stride).eval()
    # randomize BN running stats so the test exercises them
    for m in blk.modules():
        if isinstance(m, tnn.BatchNorm3d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)
    x = rng.normal(size=(2, 4, 6, 8, 10)).astype(np.float32)  # NCDHW
    with torch.no_grad():
        want = blk(torch.tensor(x)).numpy()

    sd = {f"layer1.0.{k}": v for k, v in blk.state_dict().items()}
    params = {"conv1": {"conv": {"kernel": conv3d(sd["layer1.0.conv1.0.weight"])}},
              "conv2": {"conv": {"kernel": conv3d(sd["layer1.0.conv2.0.weight"])}}}
    stats = {}
    for name, src in (("bn1", "layer1.0.conv1.1"), ("bn2", "layer1.0.conv2.1")):
        bn = _bn(sd, src)
        params[name] = {"bn": bn["params"]}
        stats[name] = {"bn": bn["stats"]}
    bn = _bn(sd, "layer1.0.downsample.1")
    params["downsample"] = {"kernel": conv3d(sd["layer1.0.downsample.0.weight"])}
    params["bn_down"] = {"bn": bn["params"]}
    stats["bn_down"] = {"bn": bn["stats"]}

    block = BasicBlock(c_out, c_in, Conv3DSimple, stride)
    x_flax = np.transpose(x, (0, 2, 3, 4, 1))  # NCDHW -> NDHWC
    got = block.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x_flax), False)
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(want, (0, 2, 3, 4, 1)),
                               rtol=1e-4, atol=1e-4)
