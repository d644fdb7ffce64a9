"""Torch-checkpoint -> JAX pytree converters for pretrained weights.

Capability parity: the reference loads
- fairseq `wav2vec_small.pt` via fairseq+torchaudio import
  (pig/models.py:71-72) — here a pure reader of the torch pickle that maps
  fairseq parameter names onto our flax tree (the 28-d aux head stays at its
  random init, exactly as torchaudio's import_fairseq_model leaves it);
- torchvision Kinetics-400 video-resnet weights (pig/models.py:122-127) and
  ImageNet resnet18 (pig/models.py:164) — here name-mapped from torchvision
  state dicts (pass a downloaded `.pth` path).

torch (CPU) is used strictly as a deserialization library.  Layout changes:
torch conv weights (O, I, [T,] H, W) / (O, I, K) become flax kernels
([T,] H, W, I, O) / (K, I, O); linear weights (O, I) become (I, O).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Callable, Dict, Optional

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _load_torch(path: str) -> Dict[str, Any]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:  # fairseq checkpoint
        return blob["model"]
    if isinstance(blob, dict) and "state_dict" in blob:
        return blob["state_dict"]
    return blob


def conv1d(w) -> np.ndarray:
    return _np(w).transpose(2, 1, 0)  # (O,I,K) -> (K,I,O)


def conv2d(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)  # (O,I,H,W) -> (H,W,I,O)


def conv3d(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 4, 1, 0)  # (O,I,T,H,W) -> (T,H,W,I,O)


def linear(w) -> np.ndarray:
    return _np(w).T  # (O,I) -> (I,O)


# -------------------------------------------------------------- wav2vec2

def convert_wav2vec2_fairseq(state: Dict[str, Any]) -> Dict[str, Any]:
    """fairseq Wav2Vec2 state dict -> our Wav2Vec2 trunk param tree.

    Name map (fairseq wav2vec2-base, 'group_norm' extractor mode):
    feature_extractor.conv_layers.{i}.0.weight  -> feature_extractor/conv{i}
    feature_extractor.conv_layers.0.2.{w,b}     -> feature_extractor/group_norm
    layer_norm.{w,b}                            -> proj_ln
    post_extract_proj.{w,b}                     -> proj
    encoder.pos_conv.0.weight_{g,v}, bias       -> pos_conv (weight-norm split)
    encoder.layer_norm.{w,b}                    -> encoder_ln
    encoder.layers.{i}.self_attn.{q,k,v,out}_proj -> layer{i}/attention/...
    encoder.layers.{i}.self_attn_layer_norm     -> layer{i}/ln1
    encoder.layers.{i}.fc1/fc2                  -> layer{i}/ffn_in/ffn_out
    encoder.layers.{i}.final_layer_norm         -> layer{i}/ln2
    """
    p: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.0.weight" in state:
        fe[f"conv{i}"] = {"kernel": conv1d(
            state[f"feature_extractor.conv_layers.{i}.0.weight"])}
        i += 1
    if "feature_extractor.conv_layers.0.2.weight" in state:
        fe["group_norm"] = {
            "scale": _np(state["feature_extractor.conv_layers.0.2.weight"]),
            "bias": _np(state["feature_extractor.conv_layers.0.2.bias"]),
        }
    p["feature_extractor"] = fe
    p["proj_ln"] = {"scale": _np(state["layer_norm.weight"]),
                    "bias": _np(state["layer_norm.bias"])}
    p["proj"] = {"kernel": linear(state["post_extract_proj.weight"]),
                 "bias": _np(state["post_extract_proj.bias"])}

    # positional conv: fairseq weight-norm dim=2 -> torch weight_v (O, I/g, K),
    # weight_g (1, 1, K).  flax layout (K, I/g, O): v axes (2,1,0), g -> (K,1,1).
    wv = _np(state["encoder.pos_conv.0.weight_v"]).transpose(2, 1, 0)
    wg = _np(state["encoder.pos_conv.0.weight_g"]).transpose(2, 1, 0)
    p["pos_conv"] = {
        "pos_conv_v": wv,
        "pos_conv_g": wg,
        "pos_conv_bias": _np(state["encoder.pos_conv.0.bias"]),
    }
    p["encoder_ln"] = {"scale": _np(state["encoder.layer_norm.weight"]),
                       "bias": _np(state["encoder.layer_norm.bias"])}
    i = 0
    while f"encoder.layers.{i}.self_attn.q_proj.weight" in state:
        pre = f"encoder.layers.{i}"
        p[f"layer{i}"] = {
            "attention": {
                "q_proj": {"kernel": linear(state[f"{pre}.self_attn.q_proj.weight"]),
                           "bias": _np(state[f"{pre}.self_attn.q_proj.bias"])},
                "k_proj": {"kernel": linear(state[f"{pre}.self_attn.k_proj.weight"]),
                           "bias": _np(state[f"{pre}.self_attn.k_proj.bias"])},
                "v_proj": {"kernel": linear(state[f"{pre}.self_attn.v_proj.weight"]),
                           "bias": _np(state[f"{pre}.self_attn.v_proj.bias"])},
                "out_proj": {"kernel": linear(state[f"{pre}.self_attn.out_proj.weight"]),
                             "bias": _np(state[f"{pre}.self_attn.out_proj.bias"])},
            },
            "ln1": {"scale": _np(state[f"{pre}.self_attn_layer_norm.weight"]),
                    "bias": _np(state[f"{pre}.self_attn_layer_norm.bias"])},
            "ffn_in": {"kernel": linear(state[f"{pre}.fc1.weight"]),
                       "bias": _np(state[f"{pre}.fc1.bias"])},
            "ffn_out": {"kernel": linear(state[f"{pre}.fc2.weight"]),
                        "bias": _np(state[f"{pre}.fc2.bias"])},
            "ln2": {"scale": _np(state[f"{pre}.final_layer_norm.weight"]),
                    "bias": _np(state[f"{pre}.final_layer_norm.bias"])},
        }
        i += 1
    return p


def load_wav2vec2_pretrained(path: str, variables: Dict[str, Any],
                             scope: str = "audio_encoder") -> Dict[str, Any]:
    """Merge fairseq weights into an initialized variables tree (in place-ish)."""
    state = _load_torch(path)
    trunk = convert_wav2vec2_fairseq(state)
    params = dict(variables["params"])
    enc = dict(params[scope])
    merged = dict(enc["wav2vec2"])
    _merge_check(merged, trunk, f"{scope}/wav2vec2")
    merged.update(trunk)
    enc["wav2vec2"] = merged
    params[scope] = enc
    out = dict(variables)
    out["params"] = params
    return out


# ------------------------------------------------------------ video resnets

def _bn(state, prefix: str) -> Dict[str, Any]:
    return {
        "params": {"scale": _np(state[f"{prefix}.weight"]),
                   "bias": _np(state[f"{prefix}.bias"])},
        "stats": {"mean": _np(state[f"{prefix}.running_mean"]),
                  "var": _np(state[f"{prefix}.running_var"])},
    }


def convert_video_resnet(state: Dict[str, Any], version: str):
    """torchvision VideoResNet state dict -> (params, batch_stats) trees.

    torchvision layouts:
    - r2plus1d_18 stem: 0 conv(1,7,7), 1 bn, 3 conv(3,1,1), 4 bn
      blocks: conv1.0.{0 conv,1 bn,3 conv} bn1 ... (Conv2Plus1D is a Sequential)
    - r3d_18 / mc3_18 stem: 0 conv, 1 bn; blocks: conv1.{0 conv,1 bn} ...
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put_bn(tree_p, tree_s, name, src_prefix):
        bn = _bn(state, src_prefix)
        tree_p[name] = {"bn": bn["params"]}
        tree_s[name] = {"bn": bn["stats"]}

    if version == "r2plus1d_18":
        params["stem_spatial"] = {"kernel": conv3d(state["stem.0.weight"])}
        put_bn(params, stats, "stem_bn1", "stem.1")
        params["stem_temporal"] = {"kernel": conv3d(state["stem.3.weight"])}
        put_bn(params, stats, "stem_bn2", "stem.4")
    else:
        params["stem"] = {"kernel": conv3d(state["stem.0.weight"])}
        put_bn(params, stats, "stem_bn", "stem.1")

    for li in range(1, 5):
        for bi in range(2):
            src = f"layer{li}.{bi}"
            name = f"layer{li}_block{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if version == "r2plus1d_18":
                bp["conv1"] = {
                    "spatial": {"kernel": conv3d(state[f"{src}.conv1.0.0.weight"])},
                    "temporal": {"kernel": conv3d(state[f"{src}.conv1.0.3.weight"])},
                }
                bn_mid = _bn(state, f"{src}.conv1.0.1")
                bp["conv1"]["bn_mid"] = {"bn": bn_mid["params"]}
                bs["conv1"] = {"bn_mid": {"bn": bn_mid["stats"]}}
                bp["conv2"] = {
                    "spatial": {"kernel": conv3d(state[f"{src}.conv2.0.0.weight"])},
                    "temporal": {"kernel": conv3d(state[f"{src}.conv2.0.3.weight"])},
                }
                bn_mid2 = _bn(state, f"{src}.conv2.0.1")
                bp["conv2"]["bn_mid"] = {"bn": bn_mid2["params"]}
                bs["conv2"] = {"bn_mid": {"bn": bn_mid2["stats"]}}
            else:
                bp["conv1"] = {"conv": {"kernel": conv3d(state[f"{src}.conv1.0.weight"])}}
                bp["conv2"] = {"conv": {"kernel": conv3d(state[f"{src}.conv2.0.weight"])}}
            # block-level BNs sit inside torchvision's conv Sequentials
            put_bn(bp, bs, "bn1", f"{src}.conv1.1")
            put_bn(bp, bs, "bn2", f"{src}.conv2.1")
            if f"{src}.downsample.0.weight" in state:
                bp["downsample"] = {"kernel": conv3d(state[f"{src}.downsample.0.weight"])}
                put_bn(bp, bs, "bn_down", f"{src}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return params, stats


def convert_resnet18(state: Dict[str, Any]):
    """torchvision resnet18 state dict -> (params, batch_stats) trees."""
    params: Dict[str, Any] = {"stem_conv": {"kernel": conv2d(state["conv1.weight"])}}
    stats: Dict[str, Any] = {}
    bn = _bn(state, "bn1")
    params["stem_bn"] = {"bn": bn["params"]}
    stats["stem_bn"] = {"bn": bn["stats"]}
    for li in range(1, 5):
        for bi in range(2):
            src = f"layer{li}.{bi}"
            name = f"layer{li}_block{bi}"
            bp = {"conv1": {"kernel": conv2d(state[f"{src}.conv1.weight"])},
                  "conv2": {"kernel": conv2d(state[f"{src}.conv2.weight"])}}
            bs = {}
            for bn_name, bn_src in (("bn1", f"{src}.bn1"), ("bn2", f"{src}.bn2")):
                b = _bn(state, bn_src)
                bp[bn_name] = b["params"]
                bs[bn_name] = b["stats"]
            if f"{src}.downsample.0.weight" in state:
                bp["downsample"] = {"kernel": conv2d(state[f"{src}.downsample.0.weight"])}
                b = _bn(state, f"{src}.downsample.1")
                bp["bn_down"] = b["params"]
                bs["bn_down"] = b["stats"]
            params[name] = bp
            stats[name] = bs
    return params, stats


# --------------------------------------------------- midplane widening

def widen_midplanes(params: Dict[str, Any], stats: Dict[str, Any],
                    multiple: int) -> tuple:
    """Adapt converted r2plus1d weights to `midplanes_multiple=multiple`.

    The MXU-friendly variant rounds every block's (2+1)D mid width M up to a
    multiple of 128 (video3d.py::midplanes) — 23% faster video trunk — but
    changes weight shapes, which used to break Kinetics import.  Zero-padding
    the mid-channel dimension is EXACT: padded spatial-conv output channels
    are identically zero, BN with (mean=0, var=1, scale=1, bias=0) keeps them
    zero through the ReLU, and zero temporal-conv input slices contribute
    nothing — so the widened model computes the same function as the
    pretrained original (verified in tests/test_convert.py), while the new
    channels remain trainable for fine-tuning.

    Blocks whose rounded width SHRINKS (e.g. 144 -> 128 — precisely where the
    lane savings come from) instead drop the lowest-importance mid channels,
    importance_j = ||spatial[..., j]|| * |bn_gain_j| * ||temporal[j, :]||.
    That path is approximate (the ReLU between the factorized convs blocks an
    exact rank reduction); channels a pretrained net barely uses carry tiny
    importance, and fine-tuning recovers the rest — verified by activation
    agreement in tests/test_convert.py.

    Takes/returns (params, stats) trees in convert_video_resnet layout.
    """
    from peppa_tpu.models.video3d import midplanes as mid_of

    params = _deep_copy_tree(params)
    stats = _deep_copy_tree(stats)
    widths = {1: (64, 64), 2: (64, 128), 3: (128, 256), 4: (256, 512)}
    for li in range(1, 5):
        for bi in range(2):
            name = f"layer{li}_block{bi}"
            if name not in params or "spatial" not in params[name].get(
                    "conv1", {}):
                continue  # not an r2plus1d tree
            c_in = widths[li][0] if bi == 0 else widths[li][1]
            c_out = widths[li][1]
            m_new = mid_of(c_in, c_out, multiple)
            # torchvision computes midplanes once per block and reuses it for
            # conv2, so both convs adapt to the same m_new
            for conv in ("conv1", "conv2"):
                blk = params[name][conv]
                bnp = blk["bn_mid"]["bn"]
                bns = stats[name][conv]["bn_mid"]["bn"]
                m_old = blk["spatial"]["kernel"].shape[-1]
                if m_old == m_new:
                    continue
                if m_new > m_old:  # exact: zero-pad the mid dimension
                    pad = m_new - m_old
                    blk["spatial"]["kernel"] = np.pad(
                        blk["spatial"]["kernel"], [(0, 0)] * 4 + [(0, pad)])
                    blk["temporal"]["kernel"] = np.pad(
                        blk["temporal"]["kernel"],
                        [(0, 0)] * 3 + [(0, pad), (0, 0)])
                    bnp["scale"] = np.pad(bnp["scale"], (0, pad),
                                          constant_values=1.0)
                    bnp["bias"] = np.pad(bnp["bias"], (0, pad))
                    bns["mean"] = np.pad(bns["mean"], (0, pad))
                    bns["var"] = np.pad(bns["var"], (0, pad),
                                        constant_values=1.0)
                else:  # approximate: keep the m_new most important channels
                    spatial = np.asarray(blk["spatial"]["kernel"])
                    temporal = np.asarray(blk["temporal"]["kernel"])
                    gain = np.abs(np.asarray(bnp["scale"])) / np.sqrt(
                        np.asarray(bns["var"]) + 1e-5)
                    importance = (
                        np.linalg.norm(spatial.reshape(-1, m_old), axis=0)
                        * gain
                        * np.linalg.norm(
                            temporal.transpose(3, 0, 1, 2, 4)
                            .reshape(m_old, -1), axis=1))
                    keep = np.sort(np.argsort(importance)[-m_new:])
                    blk["spatial"]["kernel"] = spatial[..., keep]
                    blk["temporal"]["kernel"] = temporal[:, :, :, keep, :]
                    bnp["scale"] = np.asarray(bnp["scale"])[keep]
                    bnp["bias"] = np.asarray(bnp["bias"])[keep]
                    bns["mean"] = np.asarray(bns["mean"])[keep]
                    bns["var"] = np.asarray(bns["var"])[keep]
    return params, stats


# ------------------------------------------- trained PeppaPig checkpoints

def _tolerant_pickle_module():
    """A pickle module whose Unpickler stubs classes from absent packages.

    Reference Lightning checkpoints pickle references to classes from
    pytorch_lightning / fairseq / omegaconf (e.g. the `callbacks` dict is
    keyed by the ModelCheckpoint CLASS, reference pig/evaluation.py:46);
    none of those packages are in this image, and none of them are needed —
    only tensors and plain containers matter.  Missing classes are replaced
    with generated dict-subclass stubs: hashable as dict keys (classes always
    are) and state-restorable for dict-like payloads (AttributeDict etc.).
    """
    import pickle
    import types

    class _StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ImportError, AttributeError):
                return type(name, (dict,), {"__module__": module})

    mod = types.ModuleType("peppa_tolerant_pickle")
    mod.Unpickler = _StubUnpickler
    mod.load = lambda f, **kw: _StubUnpickler(f).load()
    mod.loads = lambda b, **kw: _StubUnpickler(__import__("io").BytesIO(b)).load()
    return mod


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """torch.load a checkpoint even when its pickled classes' packages are absent."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_tolerant_pickle_module())


def convert_wav2vec2_torchaudio(state: Dict[str, Any]) -> Dict[str, Any]:
    """torchaudio Wav2Vec2Model state dict -> our Wav2Vec2 trunk param tree.

    This is the naming INSIDE a trained PeppaPig Lightning checkpoint: the
    reference wraps `import_fairseq_model(...)` / `wav2vec2_base(num_out=28)`
    as `.audio` (pig/models.py:66-74), so checkpoint keys use torchaudio's
    names (feature_extractor.conv_layers.{i}.conv, encoder.feature_projection,
    encoder.transformer.layers.{i}.attention/feed_forward, aux) — distinct
    from the raw-fairseq names convert_wav2vec2_fairseq handles.  Unlike the
    fairseq import, the 28-d aux head here carries trained weights.

    `state` keys are relative (any `audio_encoder.audio.` prefix stripped).
    """
    p: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in state:
        fe[f"conv{i}"] = {"kernel": conv1d(
            state[f"feature_extractor.conv_layers.{i}.conv.weight"])}
        i += 1
    if "feature_extractor.conv_layers.0.layer_norm.weight" in state:
        fe["group_norm"] = {
            "scale": _np(state["feature_extractor.conv_layers.0.layer_norm.weight"]),
            "bias": _np(state["feature_extractor.conv_layers.0.layer_norm.bias"]),
        }
    p["feature_extractor"] = fe

    fp = "encoder.feature_projection"
    if f"{fp}.layer_norm.weight" in state:
        p["proj_ln"] = {"scale": _np(state[f"{fp}.layer_norm.weight"]),
                        "bias": _np(state[f"{fp}.layer_norm.bias"])}
        p["proj"] = {"kernel": linear(state[f"{fp}.projection.weight"]),
                     "bias": _np(state[f"{fp}.projection.bias"])}

    # positional conv, weight-norm split (dim=2). Older torch stores
    # weight_g/weight_v; newer parametrizations.weight.original0/original1.
    pc = "encoder.transformer.pos_conv_embed.conv"
    wg_key, wv_key = f"{pc}.weight_g", f"{pc}.weight_v"
    if wg_key not in state:
        wg_key = f"{pc}.parametrizations.weight.original0"
        wv_key = f"{pc}.parametrizations.weight.original1"
    if wv_key in state:
        p["pos_conv"] = {
            "pos_conv_v": _np(state[wv_key]).transpose(2, 1, 0),
            "pos_conv_g": _np(state[wg_key]).transpose(2, 1, 0),
            "pos_conv_bias": _np(state[f"{pc}.bias"]),
        }
    if "encoder.transformer.layer_norm.weight" in state:
        p["encoder_ln"] = {
            "scale": _np(state["encoder.transformer.layer_norm.weight"]),
            "bias": _np(state["encoder.transformer.layer_norm.bias"])}
    i = 0
    while f"encoder.transformer.layers.{i}.attention.q_proj.weight" in state:
        pre = f"encoder.transformer.layers.{i}"
        p[f"layer{i}"] = {
            "attention": {
                name: {"kernel": linear(state[f"{pre}.attention.{name}.weight"]),
                       "bias": _np(state[f"{pre}.attention.{name}.bias"])}
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "ln1": {"scale": _np(state[f"{pre}.layer_norm.weight"]),
                    "bias": _np(state[f"{pre}.layer_norm.bias"])},
            "ffn_in": {"kernel": linear(
                state[f"{pre}.feed_forward.intermediate_dense.weight"]),
                "bias": _np(state[f"{pre}.feed_forward.intermediate_dense.bias"])},
            "ffn_out": {"kernel": linear(
                state[f"{pre}.feed_forward.output_dense.weight"]),
                "bias": _np(state[f"{pre}.feed_forward.output_dense.bias"])},
            "ln2": {"scale": _np(state[f"{pre}.final_layer_norm.weight"]),
                    "bias": _np(state[f"{pre}.final_layer_norm.bias"])},
        }
        i += 1
    if "aux.weight" in state:
        p["aux"] = {"kernel": linear(state["aux.weight"]),
                    "bias": _np(state["aux.bias"])}
    return p


def _attention_pool(state: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Reference Attention module (pig/models.py:30-43) -> AttentionPool tree."""
    return {
        "hidden": {"kernel": linear(state[f"{prefix}hidden.weight"]),
                   "bias": _np(state[f"{prefix}hidden.bias"])},
        "out": {"kernel": linear(state[f"{prefix}out.weight"]),
                "bias": _np(state[f"{prefix}out.bias"])},
    }


def convert_peppa_state_dict(state: Dict[str, Any], config
                             ) -> tuple:
    """Complete trained PeppaPig state_dict -> (params, batch_stats) updates.

    Maps BOTH towers of a reference Lightning checkpoint
    (pig/models.py:223-235: video_encoder = R3DEncoder/ImageEncoder,
    audio_encoder = Wav2VecEncoder) plus poolings and projections onto our
    variable tree, so reference-trained models evaluate on this framework.
    """

    def sub(prefix: str) -> Dict[str, Any]:
        return {k[len(prefix):]: v for k, v in state.items()
                if k.startswith(prefix)}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # ---------------------------------------------------------- audio tower
    a: Dict[str, Any] = {"wav2vec2": convert_wav2vec2_torchaudio(
        sub("audio_encoder.audio."))}
    if config.audio.pooling == "attention":
        a["AttentionPool_0"] = _attention_pool(state, "audio_encoder.audiopool.")
    if config.audio.project and "audio_encoder.project.weight" in state:
        a["project"] = {"kernel": linear(state["audio_encoder.project.weight"]),
                        "bias": _np(state["audio_encoder.project.bias"])}
    params["audio_encoder"] = a

    # ---------------------------------------------------------- video tower
    v: Dict[str, Any] = {}
    vs: Dict[str, Any] = {}
    if config.video.static:
        v["trunk"], vs["trunk"] = convert_resnet18(sub("video_encoder.image."))
        if config.video.pooling == "attention":
            v["pool"] = _attention_pool(state, "video_encoder.pool.")
    else:
        v["trunk"], vs["trunk"] = convert_video_resnet(
            sub("video_encoder.video."), config.video.version)
        if config.video.midplanes_multiple:
            v["trunk"], vs["trunk"] = widen_midplanes(
                v["trunk"], vs["trunk"], config.video.midplanes_multiple)
        if config.video.pooling == "attention":
            v["VideoAttentionPool_0"] = {"attn": _attention_pool(
                state, "video_encoder.videopool.attn.")}
    if config.video.project and "video_encoder.project.weight" in state:
        v["project"] = {"kernel": linear(state["video_encoder.project.weight"]),
                        "bias": _np(state["video_encoder.project.bias"])}
    params["video_encoder"] = v
    stats["video_encoder"] = vs
    return params, stats


def _merge_intersect(dst: Dict[str, Any], src: Dict[str, Any], scope: str,
                     dropped: list) -> None:
    """Recursively merge `src` into `dst`, shape-checked; keys absent from the
    model tree are skipped (e.g. transformer weights under audio.full=False,
    where our trace never instantiates the unused layers) and reported."""
    for k, v in src.items():
        if k not in dst:
            dropped.append(f"{scope}/{k}")
            continue
        if isinstance(v, dict) and isinstance(dst[k], dict):
            _merge_intersect(dst[k], v, f"{scope}/{k}", dropped)
        else:
            want = tuple(np.shape(dst[k]))
            got = tuple(np.shape(v))
            if want != got:
                raise ValueError(f"Shape mismatch at {scope}/{k}: model "
                                 f"{want} vs checkpoint {got}")
            dst[k] = v


def _deep_copy_tree(tree):
    if isinstance(tree, dict):
        return {k: _deep_copy_tree(v) for k, v in tree.items()}
    return tree


def load_peppa_checkpoint(path: str, config=None):
    """Load a complete trained reference PeppaPig Lightning checkpoint.

    Returns (model, variables, config, meta) ready for evaluation — the
    import counterpart of reference PeppaPig.load_from_checkpoint
    (pig/evaluation.py:52).  The config comes from the checkpoint's embedded
    hyper_parameters unless one is passed explicitly.
    """
    import jax

    from peppa_tpu.config import Config
    from peppa_tpu.models.dual_encoder import init_model

    blob = load_torch_checkpoint(path)
    state = blob.get("state_dict", blob)
    if config is None:
        hp = blob.get("hyper_parameters")
        if hp is None:
            raise ValueError(f"{path} embeds no hyper_parameters; "
                             "pass config= explicitly")
        config = Config.from_dict(dict(hp))
    model, variables = init_model(config, jax.random.PRNGKey(0))
    p_new, s_new = convert_peppa_state_dict(state, config)
    if not p_new["audio_encoder"]["wav2vec2"].get("feature_extractor") or \
            not p_new["video_encoder"].get("trunk"):
        raise ValueError(
            f"{path}: state_dict does not look like a PeppaPig checkpoint "
            "(no audio feature extractor / video trunk weights found)")

    params = _deep_copy_tree(variables["params"])
    dropped: list = []
    _merge_intersect(params, p_new, "params", dropped)
    out = dict(variables)
    out["params"] = params
    if "batch_stats" in variables:
        bstats = _deep_copy_tree(variables["batch_stats"])
        _merge_intersect(bstats, s_new, "batch_stats", dropped)
        out["batch_stats"] = bstats
    if dropped:
        logging.info("Checkpoint import: %d tensors not in the model tree "
                     "(first: %s)", len(dropped), dropped[0])
    meta = {k: blob.get(k) for k in ("epoch", "global_step") if k in blob}
    return model, out, config, meta


# ------------------------------------------------------------ top-level glue

def _merge_check(dst: Dict[str, Any], src: Dict[str, Any], scope: str) -> None:
    import jax

    for k in src:
        if k not in dst:
            raise KeyError(f"Converted key {scope}/{k} missing in model tree")
        dst_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), dst[k])
        src_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), src[k])
        if dst_shapes != src_shapes:
            raise ValueError(
                f"Shape mismatch at {scope}/{k}: model {dst_shapes} vs "
                f"checkpoint {src_shapes}")


def load_video_pretrained(path: str, variables: Dict[str, Any], version: str,
                          scope: str = "video_encoder",
                          midplanes_multiple: Optional[int] = None
                          ) -> Dict[str, Any]:
    state = _load_torch(path)
    if version == "static":
        p, s = convert_resnet18(state)
    else:
        p, s = convert_video_resnet(state, version)
        if midplanes_multiple:
            p, s = widen_midplanes(p, s, midplanes_multiple)
    out_params = dict(variables["params"])
    enc = dict(out_params[scope])
    trunk = dict(enc["trunk"])
    _merge_check(trunk, _strip_bn_split(p), f"{scope}/trunk")
    trunk.update(_strip_bn_split(p))
    enc["trunk"] = trunk
    out_params[scope] = enc

    out_stats = dict(variables.get("batch_stats", {}))
    if out_stats:
        enc_s = dict(out_stats.get(scope, {}))
        trunk_s = dict(enc_s.get("trunk", {}))
        trunk_s.update(_stats_tree(s))
        enc_s["trunk"] = trunk_s
        out_stats[scope] = enc_s

    out = dict(variables)
    out["params"] = out_params
    if out_stats:
        out["batch_stats"] = out_stats
    return out


def _strip_bn_split(p: Dict[str, Any]) -> Dict[str, Any]:
    """Our BatchNorm module nests 'bn'; flatten converter output accordingly."""
    return p


def _stats_tree(s: Dict[str, Any]) -> Dict[str, Any]:
    return s


def pretrained_loader_from_config(config) -> Optional[Callable]:
    """Build the variables-merging loader the Trainer applies after init.

    Mirrors reference behavior: audio pretrained from the fairseq path
    (pig/models.py:71), video pretrained from Kinetics/ImageNet when the
    weight files are present locally (torchvision downloads them; we read a
    local copy at data/in/<version>.pth).
    """

    def load(variables):
        if config.audio.pretrained:
            path = config.audio.path
            if os.path.exists(path):
                logging.info("Loading pretrained wav2vec2 from %s", path)
                variables = load_wav2vec2_pretrained(path, variables)
            else:
                logging.warning("audio.pretrained=True but %s not found; "
                                "keeping random init", path)
        if config.video.pretrained:
            version = "static" if config.video.static else config.video.version
            path = os.path.join(config.data.data_dir, "in", f"{version}.pth")
            if os.path.exists(path):
                logging.info("Loading pretrained video weights from %s", path)
                variables = load_video_pretrained(
                    path, variables, version,
                    midplanes_multiple=config.video.midplanes_multiple)
            else:
                logging.warning("video.pretrained=True but %s not found; "
                                "keeping random init", path)
        return variables

    return load


# ------------------------------------------- reverse direction: JAX -> torch

def _t(a) -> "Any":
    import torch

    return torch.tensor(np.asarray(a, dtype=np.float32))


def linear_inv(k) -> "Any":
    return _t(np.asarray(k).T)  # (I,O) -> (O,I)


def conv1d_inv(k) -> "Any":
    return _t(np.transpose(np.asarray(k), (2, 1, 0)))  # (K,I,O) -> (O,I,K)


def conv2d_inv(k) -> "Any":
    return _t(np.transpose(np.asarray(k), (3, 2, 0, 1)))  # (H,W,I,O) -> (O,I,H,W)


def conv3d_inv(k) -> "Any":
    # (T,H,W,I,O) -> (O,I,T,H,W)
    return _t(np.transpose(np.asarray(k), (4, 3, 0, 1, 2)))


def _export_bn(out: Dict[str, Any], prefix: str, bn_p: Dict[str, Any],
               bn_s: Dict[str, Any]) -> None:
    import torch

    out[f"{prefix}.weight"] = _t(bn_p["scale"])
    out[f"{prefix}.bias"] = _t(bn_p["bias"])
    out[f"{prefix}.running_mean"] = _t(bn_s["mean"])
    out[f"{prefix}.running_var"] = _t(bn_s["var"])
    out[f"{prefix}.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)


def _export_attention_pool(out: Dict[str, Any], prefix: str,
                           pool: Dict[str, Any]) -> None:
    """Inverse of _attention_pool: our AttentionPool tree -> reference
    Attention module keys (pig/models.py:30-43)."""
    out[f"{prefix}hidden.weight"] = linear_inv(pool["hidden"]["kernel"])
    out[f"{prefix}hidden.bias"] = _t(pool["hidden"]["bias"])
    out[f"{prefix}out.weight"] = linear_inv(pool["out"]["kernel"])
    out[f"{prefix}out.bias"] = _t(pool["out"]["bias"])


def export_wav2vec2_torchaudio(p: Dict[str, Any]) -> Dict[str, Any]:
    """Our Wav2Vec2 trunk param tree -> torchaudio state-dict names.

    Exact inverse of convert_wav2vec2_torchaudio (the naming inside a
    reference-trained PeppaPig Lightning checkpoint, pig/models.py:66-74).
    Weight-norm pos-conv is written as `weight_g`/`weight_v` — the naming of
    the reference's torch 1.9 (newer torch's legacy `nn.utils.weight_norm`
    still produces and accepts these keys).
    """
    out: Dict[str, Any] = {}
    fe = p["feature_extractor"]
    i = 0
    while f"conv{i}" in fe:
        out[f"feature_extractor.conv_layers.{i}.conv.weight"] = \
            conv1d_inv(fe[f"conv{i}"]["kernel"])
        i += 1
    if "group_norm" in fe:
        out["feature_extractor.conv_layers.0.layer_norm.weight"] = \
            _t(fe["group_norm"]["scale"])
        out["feature_extractor.conv_layers.0.layer_norm.bias"] = \
            _t(fe["group_norm"]["bias"])

    if "proj_ln" in p:
        fp = "encoder.feature_projection"
        out[f"{fp}.layer_norm.weight"] = _t(p["proj_ln"]["scale"])
        out[f"{fp}.layer_norm.bias"] = _t(p["proj_ln"]["bias"])
        out[f"{fp}.projection.weight"] = linear_inv(p["proj"]["kernel"])
        out[f"{fp}.projection.bias"] = _t(p["proj"]["bias"])

    if "pos_conv" in p:
        pc = "encoder.transformer.pos_conv_embed.conv"
        out[f"{pc}.weight_v"] = _t(np.transpose(
            np.asarray(p["pos_conv"]["pos_conv_v"]), (2, 1, 0)))
        out[f"{pc}.weight_g"] = _t(np.transpose(
            np.asarray(p["pos_conv"]["pos_conv_g"]), (2, 1, 0)))
        out[f"{pc}.bias"] = _t(p["pos_conv"]["pos_conv_bias"])
    if "encoder_ln" in p:
        out["encoder.transformer.layer_norm.weight"] = \
            _t(p["encoder_ln"]["scale"])
        out["encoder.transformer.layer_norm.bias"] = _t(p["encoder_ln"]["bias"])

    i = 0
    while f"layer{i}" in p:
        lp = p[f"layer{i}"]
        pre = f"encoder.transformer.layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            out[f"{pre}.attention.{name}.weight"] = \
                linear_inv(lp["attention"][name]["kernel"])
            out[f"{pre}.attention.{name}.bias"] = \
                _t(lp["attention"][name]["bias"])
        out[f"{pre}.layer_norm.weight"] = _t(lp["ln1"]["scale"])
        out[f"{pre}.layer_norm.bias"] = _t(lp["ln1"]["bias"])
        out[f"{pre}.feed_forward.intermediate_dense.weight"] = \
            linear_inv(lp["ffn_in"]["kernel"])
        out[f"{pre}.feed_forward.intermediate_dense.bias"] = \
            _t(lp["ffn_in"]["bias"])
        out[f"{pre}.feed_forward.output_dense.weight"] = \
            linear_inv(lp["ffn_out"]["kernel"])
        out[f"{pre}.feed_forward.output_dense.bias"] = _t(lp["ffn_out"]["bias"])
        out[f"{pre}.final_layer_norm.weight"] = _t(lp["ln2"]["scale"])
        out[f"{pre}.final_layer_norm.bias"] = _t(lp["ln2"]["bias"])
        i += 1
    if "aux" in p:
        out["aux.weight"] = linear_inv(p["aux"]["kernel"])
        out["aux.bias"] = _t(p["aux"]["bias"])
    return out


def export_video_resnet(p: Dict[str, Any], s: Dict[str, Any], version: str,
                        prefix: str) -> Dict[str, Any]:
    """Our video trunk (params, batch_stats) -> torchvision VideoResNet keys.

    Exact inverse of convert_video_resnet.  The unused classifier head the
    reference's state_dict carries (torchvision fc, 400-way Kinetics) is
    emitted as zeros — the reference never runs it (pig/models.py:141-150).
    """
    import torch

    out: Dict[str, Any] = {}
    if version == "r2plus1d_18":
        out[f"{prefix}stem.0.weight"] = conv3d_inv(p["stem_spatial"]["kernel"])
        _export_bn(out, f"{prefix}stem.1", p["stem_bn1"]["bn"],
                   s["stem_bn1"]["bn"])
        out[f"{prefix}stem.3.weight"] = conv3d_inv(p["stem_temporal"]["kernel"])
        _export_bn(out, f"{prefix}stem.4", p["stem_bn2"]["bn"],
                   s["stem_bn2"]["bn"])
    else:
        out[f"{prefix}stem.0.weight"] = conv3d_inv(p["stem"]["kernel"])
        _export_bn(out, f"{prefix}stem.1", p["stem_bn"]["bn"],
                   s["stem_bn"]["bn"])

    for li in range(1, 5):
        for bi in range(2):
            name = f"layer{li}_block{bi}"
            bp, bs = p[name], s[name]
            dst = f"{prefix}layer{li}.{bi}"
            if version == "r2plus1d_18":
                for conv in ("conv1", "conv2"):
                    out[f"{dst}.{conv}.0.0.weight"] = \
                        conv3d_inv(bp[conv]["spatial"]["kernel"])
                    _export_bn(out, f"{dst}.{conv}.0.1",
                               bp[conv]["bn_mid"]["bn"],
                               bs[conv]["bn_mid"]["bn"])
                    out[f"{dst}.{conv}.0.3.weight"] = \
                        conv3d_inv(bp[conv]["temporal"]["kernel"])
            else:
                out[f"{dst}.conv1.0.weight"] = \
                    conv3d_inv(bp["conv1"]["conv"]["kernel"])
                out[f"{dst}.conv2.0.weight"] = \
                    conv3d_inv(bp["conv2"]["conv"]["kernel"])
            _export_bn(out, f"{dst}.conv1.1", bp["bn1"]["bn"], bs["bn1"]["bn"])
            _export_bn(out, f"{dst}.conv2.1", bp["bn2"]["bn"], bs["bn2"]["bn"])
            if "downsample" in bp:
                out[f"{dst}.downsample.0.weight"] = \
                    conv3d_inv(bp["downsample"]["kernel"])
                _export_bn(out, f"{dst}.downsample.1", bp["bn_down"]["bn"],
                           bs["bn_down"]["bn"])
    out[f"{prefix}fc.weight"] = torch.zeros(400, 512)
    out[f"{prefix}fc.bias"] = torch.zeros(400)
    return out


def export_resnet18(p: Dict[str, Any], s: Dict[str, Any],
                    prefix: str) -> Dict[str, Any]:
    """Our static trunk -> torchvision resnet18 keys (inverse of
    convert_resnet18).  The frozen ImageNet fc head (pig/models.py:164-166)
    is emitted as zeros."""
    import torch

    out: Dict[str, Any] = {f"{prefix}conv1.weight":
                           conv2d_inv(p["stem_conv"]["kernel"])}
    _export_bn(out, f"{prefix}bn1", p["stem_bn"]["bn"], s["stem_bn"]["bn"])
    for li in range(1, 5):
        for bi in range(2):
            name = f"layer{li}_block{bi}"
            bp, bs = p[name], s[name]
            dst = f"{prefix}layer{li}.{bi}"
            out[f"{dst}.conv1.weight"] = conv2d_inv(bp["conv1"]["kernel"])
            out[f"{dst}.conv2.weight"] = conv2d_inv(bp["conv2"]["kernel"])
            _export_bn(out, f"{dst}.bn1", bp["bn1"], bs["bn1"])
            _export_bn(out, f"{dst}.bn2", bp["bn2"], bs["bn2"])
            if "downsample" in bp:
                out[f"{dst}.downsample.0.weight"] = \
                    conv2d_inv(bp["downsample"]["kernel"])
                _export_bn(out, f"{dst}.downsample.1", bp["bn_down"],
                           bs["bn_down"])
    out[f"{prefix}fc.weight"] = torch.zeros(1000, 512)
    out[f"{prefix}fc.bias"] = torch.zeros(1000)
    return out


def export_peppa_state_dict(variables: Dict[str, Any], config
                            ) -> Dict[str, Any]:
    """Our trained variables -> a reference-format PeppaPig state_dict.

    Exact inverse of convert_peppa_state_dict: a model trained on this
    framework round-trips into the reference's Lightning checkpoint naming
    (pig/models.py:223-235), so reference tooling — or any torch stack —
    can consume it.  Verified key-for-key against reference-style torch
    modules in tests/test_checkpoint_export.py.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, Any] = {}

    # ---------------------------------------------------------- audio tower
    a = params["audio_encoder"]
    if not config.audio.full:
        raise ValueError(
            "export requires audio.full=True: a full=False model never "
            "instantiates the transformer, but the reference's torchaudio "
            "wrapper always holds one (pig/models.py:74,85-86) — there are "
            "no trained weights to write for it")
    for k, v in export_wav2vec2_torchaudio(a["wav2vec2"]).items():
        out[f"audio_encoder.audio.{k}"] = v
    if config.audio.pooling == "attention":
        _export_attention_pool(out, "audio_encoder.audiopool.",
                               a["AttentionPool_0"])
    if config.audio.project and "project" in a:
        out["audio_encoder.project.weight"] = linear_inv(a["project"]["kernel"])
        out["audio_encoder.project.bias"] = _t(a["project"]["bias"])

    # ---------------------------------------------------------- video tower
    v = params["video_encoder"]
    vs = stats.get("video_encoder", {})
    if config.video.static:
        for k, t in export_resnet18(v["trunk"], vs["trunk"],
                                    "").items():
            out[f"video_encoder.image.{k}"] = t
        if config.video.pooling == "attention":
            _export_attention_pool(out, "video_encoder.pool.", v["pool"])
    else:
        trunk_p, trunk_s = v["trunk"], vs["trunk"]
        if config.video.midplanes_multiple:
            # shrink the MXU-widened mid channels back to the torchvision
            # widths (midplanes multiple=1 == the paper formula); the
            # widened->standard direction drops the lowest-importance
            # channels (see widen_midplanes) and is approximate
            trunk_p, trunk_s = widen_midplanes(trunk_p, trunk_s, 1)
        for k, t in export_video_resnet(trunk_p, trunk_s,
                                        config.video.version, "").items():
            out[f"video_encoder.video.{k}"] = t
        if config.video.pooling == "attention":
            _export_attention_pool(out, "video_encoder.videopool.attn.",
                                   v["VideoAttentionPool_0"]["attn"])
    if config.video.project and "project" in v:
        out["video_encoder.project.weight"] = linear_inv(v["project"]["kernel"])
        out["video_encoder.project.bias"] = _t(v["project"]["bias"])
    return out


def _model_checkpoint_class():
    """The class Lightning keys checkpoint callback state by.

    Without pytorch_lightning installed, registers a stub with the real
    module path/qualname so the PICKLE records the canonical reference
    (`pytorch_lightning.callbacks.model_checkpoint.ModelCheckpoint`) — a
    machine that has Lightning resolves it to the real class.  Returns
    (cls, module_names_to_clean_up).
    """
    try:
        from pytorch_lightning.callbacks.model_checkpoint import \
            ModelCheckpoint  # type: ignore
        return ModelCheckpoint, []
    except ImportError:
        import sys
        import types

        names = ("pytorch_lightning", "pytorch_lightning.callbacks",
                 "pytorch_lightning.callbacks.model_checkpoint")
        created = []
        for name in names:
            if name not in sys.modules:
                sys.modules[name] = types.ModuleType(name)
                created.append(name)

        class ModelCheckpoint:  # noqa: N801 - mirrors the Lightning name
            pass

        ModelCheckpoint.__module__ = names[-1]
        ModelCheckpoint.__qualname__ = "ModelCheckpoint"
        sys.modules[names[-1]].ModelCheckpoint = ModelCheckpoint
        return ModelCheckpoint, created


def save_reference_checkpoint(path: str, variables: Dict[str, Any], config,
                              *, epoch: int = 0, global_step: int = 0,
                              monitor: Optional[str] = None,
                              score: Optional[float] = None) -> str:
    """Write a reference-compatible Lightning `.ckpt` of our trained model.

    The blob carries the same top-level schema the reference's evaluation
    flow reads (pig/evaluation.py:42-53): `state_dict` (torch tensors,
    reference naming), `hyper_parameters` (the reference YAML config schema,
    models.py:227), `epoch`/`global_step`, and — when `monitor`/`score` are
    given — a ModelCheckpoint callbacks entry so best-checkpoint ranking
    works on either framework.  Loads back via load_peppa_checkpoint (tested
    round-trip-exact) or via torch on a reference install.
    """
    import sys

    import torch

    state = export_peppa_state_dict(variables, config)
    hparams = {k: v for k, v in config.to_dict().items() if k != "tpu"}
    # The reference splats these sections into fixed-signature constructors
    # (pig/models.py:235 Wav2VecEncoder(**config['audio']), :230-234
    # R3DEncoder/ImageEncoder(**video_config)) — peppa_tpu extension keys
    # (num_layers, dropout, midplanes_multiple) would TypeError on a real
    # reference install, so the exported blob carries only reference keys.
    _REF_AUDIO = ("path", "pretrained", "freeze_feature_extractor",
                  "freeze_encoder_layers", "pooling", "project", "full")
    _REF_VIDEO = ("pretrained", "project", "version", "pooling", "static")
    hparams["audio"] = {k: v for k, v in hparams["audio"].items()
                        if k in _REF_AUDIO}
    hparams["video"] = {k: v for k, v in hparams["video"].items()
                        if k in _REF_VIDEO}
    blob: Dict[str, Any] = {
        "state_dict": state,
        "hyper_parameters": hparams,
        "epoch": int(epoch),
        "global_step": int(global_step),
    }
    cleanup: list = []
    try:
        if monitor is not None and score is not None:
            cls, cleanup = _model_checkpoint_class()
            blob["callbacks"] = {cls: {
                "monitor": monitor,
                "best_model_score": torch.tensor(float(score)),
                "best_model_path": os.path.abspath(path),
            }}
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        torch.save(blob, path)
    finally:
        for name in cleanup:
            sys.modules.pop(name, None)
    return path
