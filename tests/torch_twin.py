"""A COMPLETE torch twin of the flagship dual encoder + the reference's
evaluation battery, for end-to-end quality-parity evidence.

Two halves:

1. Towers with the exact state-dict naming torchaudio / torchvision /
   Lightning produce inside a trained reference PeppaPig checkpoint
   (pig/models.py:223-235): build, randomize, save as a Lightning-layout
   `.ckpt`, import through peppa_tpu and compare forwards.  (Moved here from
   tests/test_checkpoint_import.py so the twin-parity e2e test shares them.)

2. An INDEPENDENT torch implementation of the evaluation battery, written
   from the reference formulas (NOT from peppa_tpu's):
   - recall_at_1_to_n       (pig/metrics.py:23-40)
   - resampled bootstrap    (pig/metrics.py:67-77, torch.randperm sampling)
   - duration-matched triplets (pig/triplet.py:82-121 + pig/util.py:31-35,
     implementing the documented intent of the score_triplets NameError
     at pig/triplet.py:93)

   Running the SAME decoded clips through both frameworks and both metric
   stacks is the strongest quality-parity evidence available without the
   reference's (unshipped) trained weights and media.
"""

import math
import os
import random as pyrandom
import sys
import types
from itertools import groupby

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF

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

    @torch.no_grad()
    def encode_batch(self, batch):
        """ClipBatch (numpy) -> (V, A) numpy.

        Video arrives as float [0,1] (the reference's featurization,
        pig/data.py:67-78) or as uint8 0..255 (peppa_tpu's transport format,
        /255 fused on device) — normalize to the reference's float [0,1].
        """
        self.eval()
        video = np.asarray(batch.video)
        if video.dtype == np.uint8:
            video = video.astype(np.float32) / 255.0
        video = torch.tensor(np.transpose(
            video.astype(np.float32), (0, 4, 1, 2, 3)))
        audio = torch.tensor(np.asarray(batch.audio, np.float32))
        v = self.video_encoder(video).numpy()
        a = self.audio_encoder(audio).numpy()
        return v, a


# =====================================================================
# helpers
# =====================================================================

W2V_CONV_LAYERS = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
                   (512, 3, 2), (512, 2, 2), (512, 2, 2))

KINETICS_MEAN = (0.43216, 0.394666, 0.37645)
KINETICS_STD = (0.22803, 0.22145, 0.216989)


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
# the torch-side evaluation battery (reference formulas, independent of
# peppa_tpu's jit'd implementations)
# =====================================================================

def t_cosine_matrix(a, b):
    """Reference pig/util.py:9-13."""
    a = a / a.norm(dim=1, keepdim=True)
    b = b / b.norm(dim=1, keepdim=True)
    return a @ b.t()


def t_recall_at_1_to_n(candidates, references, correct, N=10):
    """Reference pig/metrics.py:23-40 (loop-faithful)."""
    distances = 1 - t_cosine_matrix(references, candidates)
    recall = [[] for _ in range(0, N + 1)]
    recall[0] = [0 for _ in distances]
    for j, row in enumerate(distances):
        ranked = row.argsort()
        target = torch.nonzero(correct[j])[:, 0]
        for n in range(1, N + 1):
            topn = ranked[:n]
            overlap = (topn.unsqueeze(0) == target.unsqueeze(1)).sum().item()
            recall[n].append(overlap / len(target))
    return torch.tensor(recall, dtype=torch.float64)


def t_resampled_recall_at_1_to_n(candidates, references, size=100,
                                 n_samples=500, N=10, generator=None):
    """Reference pig/metrics.py:67-77: torch.randperm bootstrap subsets."""
    assert len(candidates) == len(references)
    assert len(candidates) >= size
    result = []
    for _ in range(n_samples):
        ix = torch.randperm(candidates.size(0), generator=generator)[:size]
        X = candidates[ix]
        Y = references[ix]
        Z = torch.eye(X.shape[0])
        result.append(t_recall_at_1_to_n(X, Y, Z, N=N))
    return torch.stack(result)  # (n_samples, N+1, size)


def t_triplet_accuracy(anchor, positive, negative, discrete=True):
    """Reference pig/metrics.py:45-52."""
    sim_pos = tF.cosine_similarity(anchor, positive, dim=1)
    sim_neg = tF.cosine_similarity(anchor, negative, dim=1)
    diff = sim_pos - sim_neg
    if discrete:
        return (torch.sign(diff) + 1) / 2
    return diff


def _t_shuffled(xs, rng):
    """Reference pig/util.py:31-32."""
    return sorted(xs, key=lambda _: rng.random())


def _t_pairs(xs):
    """Reference pig/triplet.py:115-121."""
    p = []
    for i in range(0, len(xs), 2):
        x = xs[i:i + 2]
        if len(x) == 2:
            p.append(x)
    return p


def _t_triplets(clips, criterion, rng):
    """Reference pig/triplet.py:99-104."""
    for _, items in groupby(sorted(clips, key=criterion), key=criterion):
        paired = _t_pairs(_t_shuffled(list(items), rng))
        for p in paired:
            target, distractor = rng.sample(p, 2)
            yield (target, distractor)


def t_score_triplets(video, audio, duration, n_samples=500, seed=None):
    """Reference pig/triplet.py:82-96 (documented intent of the NameError)."""
    rng = pyrandom.Random(seed)
    duration = torch.as_tensor(np.asarray(duration, np.float64))
    accuracy, length = [], []
    for _ in range(n_samples):
        pos_idx, neg_idx = zip(*_t_triplets(
            range(len(duration)), lambda idx: float(duration[idx]), rng))
        pos_idx = torch.tensor(pos_idx)
        neg_idx = torch.tensor(neg_idx)
        acc = t_triplet_accuracy(anchor=audio[pos_idx],
                                 positive=video[pos_idx],
                                 negative=video[neg_idx])
        accuracy.append(acc.mean().item())
        length.append(duration[pos_idx])
    return {"accuracy": torch.tensor(accuracy),
            "duration": torch.cat(length)}


# =====================================================================
# the end-to-end twin battery runner (shared by the e2e test and
# scripts/torch_twin_parity.py, which commits the full-size table)
# =====================================================================

def run_twin_battery(work_dir, *, episodes=12, clips_per_episode=2,
                     clip_seconds=7.0, target_size=(64, 48),
                     sample_rate=8000, num_layers=2, batch_size=8,
                     n_samples=500, seed=666):
    """SAME decoded clips + SAME converted checkpoint through the full eval
    battery in torch (reference formulas) and peppa_tpu (production jit'd
    battery).  Returns a list of result rows (one per headline metric) with
    torch / peppa values and their absolute difference.

    Reference being matched: pig/evaluation.py:68-110 full_score (fixed +
    jitter bootstrap recall, duration-matched triplets) on the narration val
    split.  This random-init entry runs scrambled_video=False; the TRAINED
    battery (run_trained_twin_battery) adds the scrambled controls and the
    targeted minimal-pairs path.
    """
    from peppa_tpu.data.synthetic import make_synthetic_episode_tree
    from peppa_tpu.evaluation.evaluation import make_predict
    from peppa_tpu.training.checkpoint import load_best_model

    data_dir = os.path.join(work_dir, "data")
    make_synthetic_episode_tree(
        data_dir, target_size=target_size, fragment_type="narration",
        episodes=range(1, episodes + 1), clips_per_episode=clips_per_episode,
        clip_seconds=clip_seconds, sample_rate=sample_rate, seed=0)

    # ---- one checkpoint, both frameworks
    hparams = ref_hparams()
    hparams["data"]["target_size"] = list(target_size)
    hparams["data"]["audio_sample_rate"] = sample_rate
    hparams["audio"]["num_layers"] = num_layers
    torch_model = randomize(TorchPeppaPig(
        W2V_CONV_LAYERS, mean=KINETICS_MEAN, std=KINETICS_STD,
        n_layers=num_layers)).eval()
    version_dir = os.path.join(work_dir, "version_0")
    ckpt = os.path.join(version_dir, "checkpoints",
                        "epoch=3-valnarr_rec_fixed=0.52.ckpt")
    save_lightning_ckpt(ckpt, torch_model.state_dict(), hparams,
                        0.52, "valnarr_rec_fixed")
    model, variables, config, _ = load_best_model(version_dir)
    predict = make_predict(model, variables)
    return twin_battery_rows(predict, torch_model, data_dir,
                             target_size=target_size, sample_rate=sample_rate,
                             batch_size=batch_size, n_samples=n_samples,
                             seed=seed)


def twin_battery_rows(predict, torch_model, data_dir, *, target_size,
                      sample_rate, batch_size=8, n_samples=500, seed=666,
                      scrambled=False, prefix=""):
    """Core of the twin battery: the SAME decoded + collated clips through
    the given jax `predict` and `torch_model`, scored by both metric stacks.

    `scrambled=True` additionally runs every segmentation with
    scrambled_video (reference pig/evaluation.py:79-99 always evaluates the
    scrambled control too); the frame permutation happens in the SHARED
    dataset, so both frameworks see identical scrambled clips and the
    comparison tests the full scrambled path end to end.
    """
    import jax

    from peppa_tpu.data.dataset import PeppaPigDataset, grouped_batches
    from peppa_tpu.evaluation.triplet import score_triplets
    from peppa_tpu.ops.metrics import resampled_recall_at_1_to_n

    # ---- the SAME decoded + collated batches feed both towers, batched the
    # way the production eval batches them (reference pig/data.py:183-199):
    # grouped by exact audio duration, so in-batch padding is zero and the
    # reference's unmasked pooling and peppa_tpu's extent-masked pooling see
    # the same content.
    def encode_both(ds_kwargs):
        ds = PeppaPigDataset(
            target_size=target_size, split=["val"], fragment_type="narration",
            audio_sample_rate=sample_rate, data_dir=data_dir, **ds_kwargs)
        vj, aj, vt, at, dur = [], [], [], [], []
        for batch in grouped_batches(ds, key=lambda x: x.audio_duration,
                                     batch_size=batch_size):
            out = predict(batch)
            vj.append(np.asarray(out.video, np.float32))
            aj.append(np.asarray(out.audio, np.float32))
            v, a = torch_model.encode_batch(batch)
            vt.append(v)
            at.append(a)
            dur.append(np.asarray(batch.audio_duration, np.float64))
        return (np.concatenate(vj), np.concatenate(aj),
                np.concatenate(vt), np.concatenate(at), np.concatenate(dur))

    datasets = {
        "fixed": dict(duration=2.3),
        "jitter": dict(duration=2.3, jitter=True, jitter_sd=0.5, seed=1),
        "lines": dict(duration=None),
    }
    if scrambled:
        datasets.update({f"{name}_scrambled": dict(kw, scrambled_video=True)
                         for name, kw in list(datasets.items())})
    enc = {name: encode_both(kw) for name, kw in datasets.items()}

    rows = []

    def add(metric, tval, jval):
        rows.append({"metric": prefix + metric, "torch": float(tval),
                     "peppa_tpu": float(jval),
                     "abs_diff": abs(float(tval) - float(jval))})

    # ---- embedding agreement (same clips, same checkpoint)
    for name, (vj, aj, vt, at, _) in enc.items():
        add(f"{name}/video_embedding_max_abs_diff", np.abs(vj - vt).max(), 0.0)
        add(f"{name}/audio_embedding_max_abs_diff", np.abs(aj - at).max(), 0.0)

    # ---- bootstrap recall curves (independent sampling stacks:
    # torch.randperm vs jax PRNG; means must agree within 1%)
    recall_sets = ["fixed", "jitter"]
    if scrambled:
        recall_sets += ["fixed_scrambled", "jitter_scrambled"]
    for name in recall_sets:
        vj, aj, vt, at, _ = enc[name]
        size = min(100, len(vj))
        rec_j = np.asarray(resampled_recall_at_1_to_n(
            vj, aj, jax.random.PRNGKey(seed), size=size,
            n_samples=n_samples, N=10))
        gen = torch.Generator().manual_seed(seed)
        rec_t = t_resampled_recall_at_1_to_n(
            torch.tensor(vt), torch.tensor(at), size=size,
            n_samples=n_samples, N=10, generator=gen).numpy()
        for n in (1, 10):
            add(f"{name}/recall_at_{n}",
                rec_t[:, n, :].mean(), rec_j[:, n, :].mean())

    # ---- duration-matched triplet accuracy on subtitle-line clips
    triplet_sets = ["lines"] + (["lines_scrambled"] if scrambled else [])
    for name in triplet_sets:
        vj, aj, vt, at, dur = enc[name]
        trip_j = score_triplets(vj, aj, dur, n_samples=n_samples, seed=seed)
        trip_t = t_score_triplets(torch.tensor(vt), torch.tensor(at), dur,
                                  n_samples=n_samples, seed=seed)
        add(f"{name}/triplet_acc", trip_t["accuracy"].mean().item(),
            np.asarray(trip_j["accuracy"]).mean())
    return rows


# =====================================================================
# torch TRAINING twin: TripletLoss + BertAdam from the reference formulas,
# composed into the reference's training step — for training-DYNAMICS
# parity evidence (same init, same batches, dropout off, N optimizer steps
# in both frameworks).  Reference: pig/models.py:256-265 (training_step),
# pig/loss.py:28-48, pig/optimization.py:26-49,135-177.
# =====================================================================


def t_triplet_loss(v, a, margin=0.2):
    """Reference pig/loss.py:28-48: l2-normalize both towers, cosine matrix,
    hinge every off-diagonal entry against its row's AND its column's
    diagonal, mean over B^2."""
    v = tF.normalize(v.float(), p=2, dim=1)
    a = tF.normalize(a.float(), p=2, dim=1)
    m = a @ v.t()
    diag = m.diag()
    c = (torch.clamp(margin + m - diag.unsqueeze(0), min=0.0)
         + torch.clamp(margin + m - diag.unsqueeze(1), min=0.0))
    b = m.shape[0]
    return (c.sum() - c.diag().sum()) / (b * b)


class TBertAdam:
    """Reference pig/optimization.py BertAdam: Adam with NO bias correction
    (:174-177), decoupled weight decay added to the update (:152-153),
    per-parameter-TENSOR gradient-norm clipping (:135-137), and warmup
    schedules keyed by the PRE-increment step / t_total (:155-172)."""

    @staticmethod
    def _sched(name, x, warmup):
        if name == "warmup_linear":
            return x / warmup if x < warmup else max((x - 1.0) / (warmup - 1.0), 0.0)
        if name == "warmup_constant":
            return x / warmup if x < warmup else 1.0
        if name == "warmup_cosine":
            return x / warmup if x < warmup else 0.5 * (1.0 + math.cos(math.pi * x))
        raise ValueError(name)

    def __init__(self, params, lr=1e-4, warmup=0.1, t_total=15000,
                 schedule="warmup_linear", b1=0.9, b2=0.999, e=1e-6,
                 weight_decay=0.01, max_grad_norm=1.0):
        self.params = [p for p in params]
        self.lr, self.warmup, self.t_total = lr, warmup, t_total
        self.schedule = schedule
        self.b1, self.b2, self.e = b1, b2, e
        self.weight_decay, self.max_grad_norm = weight_decay, max_grad_norm
        self.state = [dict(step=0, m=torch.zeros_like(p), v=torch.zeros_like(p))
                      for p in self.params]

    @torch.no_grad()
    def step(self):
        for p, st in zip(self.params, self.state):
            if p.grad is None:
                continue
            g = p.grad.float()
            if self.max_grad_norm > 0:
                norm = g.pow(2).sum().sqrt().item()
                g = g * min(1.0, self.max_grad_norm / max(norm, 1e-12))
            st["m"].mul_(self.b1).add_(g, alpha=1 - self.b1)
            st["v"].mul_(self.b2).addcmul_(g, g, value=1 - self.b2)
            upd = st["m"] / (st["v"].sqrt() + self.e)
            if self.weight_decay > 0:
                upd = upd + self.weight_decay * p
            if self.t_total == -1:
                lr_t = self.lr
            else:
                lr_t = self.lr * self._sched(self.schedule,
                                             st["step"] / self.t_total,
                                             self.warmup)
            p.add_(upd, alpha=-lr_t)
            st["step"] += 1

    def zero_grad(self):
        for p in self.params:
            p.grad = None


def _torch_batch(batch):
    """ClipBatch (numpy, uint8 video) -> torch (video BCTHW float[0,1], audio)."""
    video = np.asarray(batch.video)
    if video.dtype == np.uint8:
        video = video.astype(np.float32) / 255.0
    video = torch.tensor(np.transpose(video.astype(np.float32), (0, 4, 1, 2, 3)))
    audio = torch.tensor(np.asarray(batch.audio, np.float32))
    return video, audio


def run_dynamics_twin(steps=60, batch_size=4, n_batches=2, seed=0,
                      target_size=(32, 24), sample_rate=800,
                      clip_seconds=0.5, lr=2e-4, t_total=200, warmup=0.1,
                      num_layers=2):
    """Train the SAME tiny dual encoder from the SAME init on the SAME batch
    cycle for `steps` BertAdam steps in torch and in peppa_tpu (dropout off,
    fp32, accumulate=1), step-interleaved.

    Returns dict with:
      - 'torch_losses' / 'jax_losses' (length `steps`);
      - 'param_max_abs_diff_after' {step: max |Δparam| across EVERY tensor},
        checked after steps 1, 2 and 5 — the crispest evidence that the
        composed update (grad -> per-tensor clip -> m/v -> decoupled decay ->
        scheduled lr, pre-increment step) is the same function in both
        frameworks, free of trajectory chaos;
      - 'final_embedding_max_abs_diff' — train-mode embeddings of batch 0
        after training (train-mode so the comparison is independent of
        running-stat bookkeeping conventions).

    A hinge contrastive loss makes long trajectories CHAOTIC: a ~1e-6 fp32
    difference flips a hinge term near its boundary and the runs separate
    exponentially, so per-step loss equality is only asserted over the early
    horizon (the caller decides the window; see test_torch_twin_e2e).  The
    param-level checks are what pin the semantics.

    Reference composition being twinned: pig/models.py:256-265 training_step
    (encode both towers -> TripletLoss) + pig/optimization.py BertAdam with
    the published hyperparameters' semantics.
    """
    import jax

    from peppa_tpu.config import Config
    from peppa_tpu.data.dataset import collate
    from peppa_tpu.data.synthetic import SyntheticClipDataset
    from peppa_tpu.models.convert import export_peppa_state_dict
    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.training.optimization import make_optimizer
    from peppa_tpu.training.state import TrainState
    from peppa_tpu.training.step import make_train_step

    cfg = Config()
    cfg.data.target_size = target_size
    cfg.data.audio_sample_rate = sample_rate
    cfg.training.precision = "fp32"
    cfg.audio.num_layers = num_layers
    cfg.audio.dropout = 0.0  # deterministic training forward
    # video.pretrained stays True: the flag selects the KINETICS channel
    # stats (pig/models.py:140) which the torch twin hardcodes; init_model
    # does not load any weights either way (that's pretrained_loader's job)
    cfg.optimizer.lr = lr
    cfg.optimizer.t_total = t_total
    cfg.optimizer.warmup = warmup
    cfg.tpu.use_pallas = False

    model, variables = init_model(cfg, jax.random.PRNGKey(seed))

    tmodel = TorchPeppaPig(W2V_CONV_LAYERS, mean=KINETICS_MEAN,
                          std=KINETICS_STD, n_layers=num_layers)
    tmodel.load_state_dict(export_peppa_state_dict(variables, cfg),
                           strict=True)

    ds = SyntheticClipDataset([clip_seconds] * (batch_size * n_batches),
                              target_size=target_size,
                              sample_rate=sample_rate, seed=seed,
                              correlated=True)
    items = [ds[i] for i in range(len(ds))]
    batches = [collate(items[i * batch_size:(i + 1) * batch_size])
               for i in range(n_batches)]

    # ---- peppa_tpu side: the real production train step + optimizer;
    # torch side: the reference-formula twin.  Step-interleaved so params
    # can be compared at chosen steps.
    tx = make_optimizer(cfg.optimizer, accumulate_grad_batches=1,
                        params=variables["params"])
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, cfg.margin, donate=False)
    rng = jax.random.PRNGKey(999)  # dropout rngs are dead at rate 0.0
    opt = TBertAdam(list(tmodel.parameters()), lr=lr, warmup=warmup,
                    t_total=t_total, schedule=cfg.optimizer.schedule,
                    b1=cfg.optimizer.b1, b2=cfg.optimizer.b2,
                    e=cfg.optimizer.e,
                    weight_decay=cfg.optimizer.weight_decay,
                    max_grad_norm=cfg.optimizer.max_grad_norm)
    tmodel.train()
    tbatches = [_torch_batch(b) for b in batches]
    j_losses, t_losses = [], []
    param_checkpoints = (1, 2, 5)
    param_diffs = {}
    for i in range(steps):
        state, metrics = train_step(state, batches[i % n_batches], rng)
        j_losses.append(float(metrics["train_loss"]))
        video, audio = tbatches[i % n_batches]
        v = tmodel.video_encoder(video)
        a = tmodel.audio_encoder(audio)
        loss = t_triplet_loss(v, a, margin=cfg.margin)
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))
        if i + 1 in param_checkpoints:
            sd_j = export_peppa_state_dict(
                {"params": state.params, "batch_stats": state.batch_stats},
                cfg)
            sd_t = tmodel.state_dict()
            worst = 0.0
            for k, tv in sd_t.items():
                # running stats excluded: torch updates running_var with the
                # UNBIASED batch variance (n/(n-1)), flax with the biased one
                # — a bookkeeping convention (~1e-4 on tiny reductions) that
                # never enters the train-mode forward being twinned here
                if (k.endswith("num_batches_tracked")
                        or "running_mean" in k or "running_var" in k):
                    continue
                d = (sd_j[k].float() - tv.detach().float()).abs().max().item()
                worst = max(worst, d)
            param_diffs[i + 1] = worst

    # ---- final train-mode embeddings on batch 0 (both frameworks)
    with torch.no_grad():
        video, audio = tbatches[0]
        vt = tmodel.video_encoder(video).numpy()
        at = tmodel.audio_encoder(audio).numpy()

    def fwd(vs, b):
        out, _ = model.apply(vs, b, train=True,
                             rngs={"dropout": rng, "layerdrop": rng},
                             mutable=["batch_stats"])
        return out

    out = jax.jit(fwd)({"params": state.params,
                        "batch_stats": state.batch_stats}, batches[0])
    vj = np.asarray(out.video, np.float32)
    aj = np.asarray(out.audio, np.float32)
    emb_diff = max(np.abs(vj - vt).max(), np.abs(aj - at).max())
    return {"torch_losses": t_losses, "jax_losses": j_losses,
            "param_max_abs_diff_after": param_diffs,
            "final_embedding_max_abs_diff": float(emb_diff)}


# =====================================================================
# TRAINED twin battery (VERDICT r4 #1): train the tiny twin config IN this
# framework on a correlated corpus through the real PigData/Trainer path,
# export the trained checkpoint to the torch twin, and run the FULL battery
# both sides — including the scrambled controls and the targeted
# minimal-pairs path — at an operating point far above chance, where 1%
# agreement actually binds.
# =====================================================================


def train_tiny_twin(work_dir, *, target_size=(64, 48), sample_rate=8000,
                    train_episodes=40, val_episodes=17, clips_per_episode=2,
                    clip_seconds=7.0, num_layers=2, max_epochs=16,
                    batch_size=8, lr=1e-4, warmup=0.1, t_total=15000,
                    seed=0):
    """Correlated synthetic episode corpus (dialog train / dialog+narration
    val, reference SPLIT_SPEC ranges) -> Trainer.fit of the tiny twin config
    -> (version_dir, data_dir).

    Everything runs through the production path: cached PeppaPigDataset,
    jittered segmentation, dual checkpoint monitors (reference run.py:32-55
    semantics).  video/audio stay `pretrained=True` so the model uses the
    KINETICS normalization stats the torch twin hardcodes (pig/models.py:140)
    — with no vendored weights present the towers train from random init.
    """
    from peppa_tpu.config import Config
    from peppa_tpu.data.datamodule import PigData
    from peppa_tpu.data.synthetic import make_synthetic_episode_tree
    from peppa_tpu.training.loop import Trainer

    data_dir = os.path.join(work_dir, "data")
    for seed_i, (frag, eps) in enumerate((
            ("dialog", range(1, train_episodes + 1)),       # train split
            ("dialog", range(197, 201)),                    # dialog val
            ("narration", range(1, val_episodes + 1)))):    # narration val
        make_synthetic_episode_tree(
            data_dir, target_size=target_size, fragment_type=frag,
            episodes=eps, clips_per_episode=clips_per_episode,
            clip_seconds=clip_seconds, sample_rate=sample_rate,
            seed=seed_i, correlated=True)

    cfg = Config()
    cfg.data.data_dir = data_dir
    cfg.data.target_size = tuple(target_size)
    cfg.data.audio_sample_rate = sample_rate
    cfg.data.prepare = False
    cfg.data.extract = False
    cfg.data.iterable = False
    cfg.data.num_workers = 0
    cfg.data.train.batch_size = batch_size
    cfg.audio.num_layers = num_layers
    cfg.training.precision = "fp32"
    cfg.training.max_epochs = max_epochs
    cfg.training.seed = seed
    cfg.training.num_sanity_val_steps = 0
    cfg.training.accumulate_grad_batches = 1  # each micro-batch is a step
    cfg.training.log_every_n_steps = 10
    # The REAL production schedule (lr 1e-4, warmup 0.1, t_total 15000): a
    # few hundred steps stay in early warmup, which is where this model
    # family actually learns — compressing t_total to the run length ramps
    # the LR to its peak within tens of steps and the embeddings provably
    # collapse to the constant saddle (loss pins at 2*margin*(1-1/B);
    # observed for this twin at lr 2e-4/t_total=360, and for both full
    # recipes at schedule scale — results/soak_schedule_scale/).
    cfg.optimizer.lr = lr
    cfg.optimizer.warmup = warmup
    cfg.optimizer.t_total = t_total
    cfg.tpu.use_pallas = False

    trainer = Trainer(cfg, log_dir=os.path.join(work_dir, "logs"))
    trainer.fit(PigData(cfg))
    return trainer.version_dir, data_dir


def make_correlated_targeted_eval(data_dir, *, target_size=(64, 48),
                                  sample_rate=8000, n_pairs=24,
                                  fragment="narration", pos="NOUN", seed=5):
    """Synthetic minimal-pairs eval set in the correlated-clip family.

    One full 'episode' media file whose timeline is 1 s latent-class blocks;
    each eval row's [clipStart, clipEnd] covers one block and its
    counterexample row covers a DIFFERENT-class block, with the class name as
    the target/distractor word (reference targeted_triplets.py:64-159 CSV
    schema + generate_targeted_triplets_eval_sets.py's pairing).  A model
    trained on the correlated family scores far above the 0.5 chance level.
    """
    import pandas as pd

    from peppa_tpu.data import decode as D
    from peppa_tpu.data.synthetic import N_CLASSES, correlated_pair

    rng = np.random.default_rng(seed)
    w, h = target_size
    fps = 10
    block_s = 1.0
    bf = int(block_s * fps)
    bs = int(block_s * sample_rate)
    n_blocks = 2 * n_pairs
    classes = []
    for _ in range(n_pairs):
        a, b = rng.choice(N_CLASSES, size=2, replace=False)
        classes += [int(a), int(b)]
    videos, audios = [], []
    for k in classes:
        vf, au = correlated_pair(rng, k, bf, bs, w, h, sample_rate)
        videos.append((np.clip(vf, 0, 1) * 255.0).astype(np.uint8))
        audios.append(au)
    episode_path = os.path.join(data_dir, "in", "targeted_ep1.npz")
    D.save_clip_npz(episode_path, np.concatenate(videos),
                    np.concatenate(audios), fps=fps,
                    sample_rate=sample_rate)

    rows = []
    for i in range(n_blocks):
        mate = i + 1 if i % 2 == 0 else i - 1
        t0 = i * block_s
        rows.append(dict(
            id=i, episode_filepath=episode_path,
            clipStart=round(t0 + 0.05, 3), clipEnd=round(t0 + block_s - 0.05, 3),
            transcript=f"a class {classes[i]} clip",
            target_word=f"class{classes[i]}",
            distractor_word=f"class{classes[mate]}",
            id_counterexample=mate))
    eval_dir = os.path.join(data_dir, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    df = pd.DataFrame.from_records(rows).set_index("id")
    df.to_csv(os.path.join(eval_dir, f"eval_set_{fragment}_{pos}.csv"))
    return df


def t_targeted_score(torch_model, fragment, pos, *, target_size, sample_rate,
                     data_dir, batch_size=8, scrambled_video=False):
    """Torch side of the minimal-pairs battery: per-sample triplet result
    over the SHARED cached triplet dataset (reference
    evaluation_targeted_triplets.py:67-81 — cosine(anchor, positive) vs
    cosine(anchor, negative), sign/2+0.5 per sample)."""
    from peppa_tpu.evaluation.targeted import (
        PeppaTargetedTripletCachedDataset, collate_triplets)

    ds = PeppaTargetedTripletCachedDataset(
        fragment, pos, target_size, sample_rate,
        scrambled_video=scrambled_video, data_dir=data_dir, scramble_seed=666)
    results = []
    buf = []

    def _video(x):
        x = np.asarray(x)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        return torch.tensor(np.transpose(x.astype(np.float32), (0, 4, 1, 2, 3)))

    def flush():
        if not buf:
            return
        batch = collate_triplets(buf)
        with torch.no_grad():
            a = torch_model.audio_encoder(
                torch.tensor(np.asarray(batch.anchor, np.float32)))
            p = torch_model.video_encoder(_video(batch.positive))
            n = torch_model.video_encoder(_video(batch.negative))
        d = tF.cosine_similarity(a, p) - tF.cosine_similarity(a, n)
        results.extend(((torch.sign(d) + 1.0) / 2.0).tolist())
        buf.clear()

    for i in range(len(ds)):
        buf.append(ds[i])
        if len(buf) == batch_size:
            flush()
    flush()
    return np.asarray(results)


def run_trained_twin_battery(work_dir, *, n_samples=500, seed=666,
                             targeted_pairs=24, **train_kw):
    """Train -> export -> full battery both frameworks (retrieval + scrambled
    controls + duration-matched triplets + targeted minimal pairs).

    Returns (rows, diagnostics): rows carry a 'trained/' metric prefix;
    diagnostics carries the jax-side absolute metric levels so callers can
    assert the operating point is far from chance (where 1% agreement
    binds — VERDICT r4 Missing #1)."""
    version_dir, data_dir = train_tiny_twin(work_dir, **train_kw)
    return run_trained_battery_from(version_dir, data_dir,
                                    n_samples=n_samples, seed=seed,
                                    targeted_pairs=targeted_pairs)


def run_trained_battery_from(version_dir, data_dir, *, n_samples=500,
                             seed=666, targeted_pairs=24):
    """The battery half of run_trained_twin_battery, against an already-
    trained run dir — so training can happen on the chip (fast) and the
    battery in a CPU process (exact torch-vs-jax float parity)."""
    from peppa_tpu.evaluation.evaluation import make_predict
    from peppa_tpu.evaluation.targeted import targeted_triplet_score
    from peppa_tpu.models.convert import export_peppa_state_dict
    from peppa_tpu.training.checkpoint import load_best_model

    model, variables, config, _ = load_best_model(version_dir)
    predict = make_predict(model, variables)

    torch_model = TorchPeppaPig(
        W2V_CONV_LAYERS, mean=KINETICS_MEAN, std=KINETICS_STD,
        n_layers=config.audio.num_layers or 12).eval()
    torch_model.load_state_dict(export_peppa_state_dict(variables, config),
                                strict=True)

    target_size = tuple(config.data.target_size)
    sample_rate = config.data.audio_sample_rate
    rows = twin_battery_rows(predict, torch_model, data_dir,
                             target_size=target_size,
                             sample_rate=sample_rate,
                             n_samples=n_samples, seed=seed,
                             scrambled=True, prefix="trained/")

    # ---- targeted minimal pairs, intact + scrambled control
    make_correlated_targeted_eval(data_dir, target_size=target_size,
                                  sample_rate=sample_rate,
                                  n_pairs=targeted_pairs)
    for scram, tag in ((False, ""), (True, "_scrambled")):
        acc_j = targeted_triplet_score(
            "narration", "NOUN", predict, target_size=target_size,
            audio_sample_rate=sample_rate, data_dir=data_dir,
            scrambled_video=scram)
        acc_t = t_targeted_score(
            torch_model, "narration", "NOUN", target_size=target_size,
            sample_rate=sample_rate, data_dir=data_dir,
            scrambled_video=scram)
        rows.append({"metric": f"trained/minimal_pairs{tag}/acc",
                     "torch": float(acc_t.mean()),
                     "peppa_tpu": float(acc_j.mean()),
                     "abs_diff": abs(float(acc_t.mean()) - float(acc_j.mean()))})

    diagnostics = {r["metric"]: r["peppa_tpu"] for r in rows}
    return rows, diagnostics
