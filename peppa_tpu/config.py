"""Typed configuration with YAML load/save, format-compatible with the reference.

The schema mirrors the reference's canonical dict (pig/execution.py:4-42) and
its seven shipped presets (`hparams_*.yaml`), so existing config files load
verbatim.  TPU-specific knobs live under the `tpu` key with safe defaults so
reference YAMLs remain valid.
"""

from __future__ import annotations

import copy
import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml


@dataclass
class AudioConfig:
    """Audio (wav2vec2) encoder config — reference pig/models.py:66-109."""
    path: str = "data/in/wav2vec/wav2vec_small.pt"
    pretrained: bool = True
    freeze_feature_extractor: bool = False
    freeze_encoder_layers: Optional[int] = None
    pooling: str = "attention"  # average | attention | last
    project: bool = True
    full: bool = True  # True: 12-layer transformer + 28-d head; False: conv features only
    # transformer depth override (None = wav2vec2-base's 12); used by tests
    # and scaling experiments — pretrained checkpoints require the full 12
    num_layers: Optional[int] = None
    # override EVERY dropout/layerdrop rate (None = wav2vec2-base defaults);
    # 0.0 makes the training forward deterministic — used by the
    # torch-vs-JAX training-dynamics twin (tests/torch_twin.py)
    dropout: Optional[float] = None


@dataclass
class VideoConfig:
    """Video encoder config — reference pig/models.py:113-200."""
    pretrained: bool = True
    project: bool = True
    version: str = "r2plus1d_18"  # r2plus1d_18 | r3d_18 | mc3_18
    pooling: str = "attention"  # average | attention
    static: bool = False  # True: per-frame ResNet-18 ablation
    # Round R(2+1)D midplane widths to this multiple (e.g. 128): 23% faster
    # video trunk on the MXU. Kinetics checkpoints import into the widened
    # shapes via convert.py::widen_midplanes (exact zero-pad), so this works
    # with pretrained=True as well — the bench's production config uses 128.
    midplanes_multiple: Optional[int] = None


@dataclass
class SplitConfig:
    """Per-split data options — reference pig/execution.py:11-24."""
    batch_size: int = 8
    duration: Optional[float] = 2.3
    force_cache: bool = False
    jitter: bool = False
    jitter_sd: Optional[float] = None
    shuffle: bool = False


@dataclass
class DataConfig:
    """Data pipeline config — reference pig/execution.py:5-24."""
    num_workers: int = 12
    extract: bool = False
    prepare: bool = False
    iterable: bool = False
    cache: bool = True
    target_size: Tuple[int, int] = (180, 100)
    audio_sample_rate: int = 44100
    data_dir: str = "data"
    train: SplitConfig = field(default_factory=lambda: SplitConfig(
        jitter=True, jitter_sd=0.5, shuffle=True))
    val: SplitConfig = field(default_factory=SplitConfig)
    test: SplitConfig = field(default_factory=SplitConfig)


@dataclass
class OptimizerConfig:
    """BertAdam config — reference pig/optimization.py:52-84, hparams_base.yaml:35-39."""
    lr: float = 1e-4
    warmup: float = 0.1
    schedule: str = "warmup_linear"  # warmup_linear | warmup_cosine | warmup_constant
    t_total: int = 15000
    b1: float = 0.9
    b2: float = 0.999
    e: float = 1e-6
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0


@dataclass
class TrainerConfig:
    """Training-loop knobs — reference hparams_base.yaml:41-45 trainer_args."""
    accumulate_grad_batches: int = 8
    precision: str = "bf16"  # bf16 on TPU replaces the reference's fp16 AMP
    max_steps: Optional[int] = None
    max_epochs: Optional[int] = None
    max_time: Optional[str] = "02:00:00:00"  # DD:HH:MM:SS — reference run.py:57
    val_check_interval: Optional[int] = None  # steps between validations (None: per epoch)
    num_sanity_val_steps: int = 15
    limit_train_batches: Optional[int] = None
    limit_val_batches: Optional[int] = None
    log_every_n_steps: int = 10
    seed: int = 0


@dataclass
class TPUConfig:
    """TPU-native execution knobs (no reference equivalent — new surface)."""
    mesh_shape: Optional[Sequence[int]] = None  # e.g. [8, 1]; None: all devices on 'data'
    mesh_axes: Sequence[str] = ("data", "model")
    donate_state: bool = True
    remat_video: bool = False  # jax.checkpoint the video tower to trade FLOPs for HBM
    remat_audio: bool = False
    # BatchNorm compute dtype: None follows the training precision (bf16
    # keeps backward-pass activations bf16; batch statistics are f32 either
    # way — measured -18 ms/step on the video trunk at B=32).  Set
    # "float32" to restore f32 normalization round trips.
    bn_dtype: Optional[str] = None
    # W8A8 dynamic int8 quantization on the INFERENCE path (ops/quant.py):
    # the MXU runs int8 at ~6.5x the bf16 rate on v5e.  Training and any
    # non-deterministic forward always use the float path.  Off by default;
    # quality bounds are measured in tests/test_quant.py and PERF.md.
    quantize_int8: bool = False
    bucket_durations: Sequence[float] = (2.3, 3.2, 4.0, 6.0)  # pad-to-bucket shapes
    use_pallas: bool = True  # fused Pallas kernels where available
    # explicit shard_map global-negative loss when the data axis has >1
    # shards (False: compiler-partitioned jnp loss; Pallas is never used
    # on a sharded batch either way)
    global_negative_loss: bool = True
    native_loader: bool = True  # C++ packed-cache batch loader where available
    # Store/ship pack audio as int16 (pack format v2): bit-exact for
    # 16-bit-origin media (the decode path scales int16/32768 — decode.py),
    # halves audio bytes on disk and host->device; float-synthesized audio
    # is quantized to the same grid (max abs error 1/65536).  The audio
    # encoder converts on device (models/wav2vec2.py), like uint8 video.
    # Off by default so existing f32 packs and bit-exactness tests of the
    # float path are unaffected; flip for production ingestion of real media.
    pack_audio_int16: bool = False
    prefetch: int = 2  # device prefetch depth
    # scheduler-preemption signals (SLURM --signal / TPU pool maintenance):
    # on receipt the Trainer saves checkpoints/preempted.ckpt at the next
    # step boundary and stops cleanly (training/preemption.py)
    preempt_signals: Sequence[str] = ("SIGTERM", "SIGUSR1")
    # host-memory watchdog (utils/host_memory.py): when process RSS crosses
    # this many GiB between train steps, recycle the device session to
    # reclaim host memory the axon tunnel plugin retains per transfer
    # (bit-exact, verified on hardware; a 2 h soak was OOM-killed at 119 GB
    # without it).  None disables; platforms without the plugin only warn.
    host_rss_recycle_gb: Optional[float] = 48.0
    # embedding-collapse guard (training/collapse.py): a saturated corpus
    # plus peak contrastive LR can drive the model into the
    # constant-embedding saddle, where every micro-batch's train loss pins
    # at exactly 2*margin*(1-1/B) and the rest of the schedule is
    # signal-free compute (measured in PERF.md "Schedule-scale recipe
    # runs").  "stop" ends the run gracefully at detection (the dual
    # best-checkpoint monitors already hold the pre-collapse optimum, and a
    # final validation + last.ckpt still happen); "warn" only logs; "off"
    # disables.
    collapse_guard: str = "stop"
    collapse_window: int = 25


@dataclass
class Config:
    """Top-level config — schema parity with reference pig/execution.py:4-42."""
    margin: float = 0.2
    data: DataConfig = field(default_factory=DataConfig)
    video: VideoConfig = field(default_factory=VideoConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    training: TrainerConfig = field(default_factory=TrainerConfig)
    tpu: TPUConfig = field(default_factory=TPUConfig)
    git_commit: Optional[str] = None

    # ------------------------------------------------------------------ io
    def to_dict(self) -> Dict[str, Any]:
        """Render as a reference-compatible plain dict (YAML-dumpable)."""
        d = _asdict(self)
        # reference nests trainer args under training.trainer_args
        trainer = d.pop("training")
        d["training"] = {"trainer_args": {
            "accumulate_grad_batches": trainer["accumulate_grad_batches"],
            "precision": trainer["precision"],
        }}
        d["training"].update({k: v for k, v in trainer.items()
                              if k not in ("accumulate_grad_batches", "precision")})
        if d.get("git_commit") is None:
            d.pop("git_commit", None)
        return d

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f)

    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "Config":
        raw = copy.deepcopy(raw)
        cfg = cls()
        if "margin" in raw:
            cfg.margin = float(raw["margin"])
        if "git_commit" in raw:
            cfg.git_commit = raw["git_commit"]

        audio = raw.get("audio", {})
        cfg.audio = _update(AudioConfig(), audio)

        video = dict(raw.get("video", {}))
        static = video.pop("static", False)
        vc = _update(VideoConfig(), video)
        vc.static = bool(static)
        if static and "version" not in video:
            vc.version = "static"
        cfg.video = vc

        data = dict(raw.get("data", {}))
        for split in ("train", "val", "test"):
            if split in data:
                setattr(cfg.data, split, _update(copy.deepcopy(getattr(cfg.data, split)),
                                                 data.pop(split)))
        cfg.data = _update(cfg.data, data)
        if isinstance(cfg.data.target_size, list):
            cfg.data.target_size = tuple(cfg.data.target_size)

        cfg.optimizer = _update(OptimizerConfig(), raw.get("optimizer", {}))

        training = dict(raw.get("training", {}))
        trainer_args = dict(training.pop("trainer_args", {}))
        # ignore torch-Lightning-only args from reference YAMLs
        for legacy in ("gpus", "auto_select_gpus"):
            trainer_args.pop(legacy, None)
        precision = trainer_args.pop("precision", None)
        tc = _update(TrainerConfig(), {**trainer_args, **training})
        if precision is not None:
            # reference uses fp16 AMP; on TPU 16 means bf16
            tc.precision = "bf16" if str(precision) in ("16", "bf16", "bfloat16") else "fp32"
        cfg.training = tc

        cfg.tpu = _update(TPUConfig(), raw.get("tpu", {}))
        return cfg

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))


def _update(obj, values: Dict[str, Any]):
    """Apply dict values onto a dataclass, ignoring unknown keys."""
    names = {f.name for f in dataclasses.fields(obj)}
    for k, v in values.items():
        if k in names:
            setattr(obj, k, v)
    return obj


def _asdict(obj) -> Dict[str, Any]:
    d = dataclasses.asdict(obj)

    def clean(x):
        if isinstance(x, dict):
            return {k: clean(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return [clean(v) for v in x]
        if isinstance(x, list):
            return [clean(v) for v in x]
        return x

    return clean(d)


def default_config() -> Config:
    """The canonical base configuration — parity with pig/execution.py:4-42."""
    return Config()


def dump_conditions(prefix: str = "hparams_") -> None:
    """Write the seven ablation presets as YAML (reference execution.py:79-82)."""
    for name, cfg in conditions().items():
        cfg.dump(f"{prefix}{name}.yaml")


def _comparable(cfg: Config) -> Dict[str, Any]:
    d = cfg.to_dict()
    d.pop("git_commit", None)
    d.pop("tpu", None)
    return d


def match_conditions(log_dir: str = "lightning_logs",
                     versions: Optional[Sequence[int]] = None,
                     base: Optional[Config] = None
                     ) -> Dict[str, List[int]]:
    """Reverse-map logged runs to their ablation condition.

    Parity: reference pig/execution.py:93-108 — compare each run's saved
    hparams against the generated condition configs (ignoring run-specific
    keys like git_commit).  `base` generates the condition set from a
    non-default base config (e.g. the tiny-shape sweep in
    scripts/ablation_sweep.py); None keeps the reference's default-config
    behavior.
    """
    import glob as _glob
    import re as _re

    configs = {name: _comparable(cfg)
               for name, cfg in conditions(base).items()}
    if versions is None:
        paths = _glob.glob(os.path.join(log_dir, "version_*", "hparams.yaml"))
    else:
        paths = [os.path.join(log_dir, f"version_{v}", "hparams.yaml")
                 for v in versions]
    runs: Dict[str, List[int]] = {name: [] for name in configs}
    for path in paths:
        m = _re.search(r"version_(\d+)", path)
        if m is None or not os.path.exists(path):
            continue
        run_cfg = _comparable(Config.load(path))
        for name, conf in configs.items():
            if conf == run_cfg:
                runs[name].append(int(m.group(1)))
    return runs


def save_conditions(log_dir: str = "lightning_logs",
                    path: str = "conditions.yaml", keep: int = 4,
                    base: Optional[Config] = None) -> None:
    """conditions.yaml: condition -> first `keep` matching run IDs.

    Parity: reference pig/execution.py:110-115.
    """
    runs = {k: sorted(v)[:keep]
            for k, v in match_conditions(log_dir, base=base).items()}
    with open(path, "w") as f:
        yaml.safe_dump(runs, f)


def conditions(base: Optional[Config] = None) -> Dict[str, Config]:
    """The seven published ablation conditions — parity with pig/execution.py:44-77."""
    base = base if base is not None else default_config()
    out: Dict[str, Config] = {"base": copy.deepcopy(base)}

    freeze = copy.deepcopy(base)
    freeze.audio.freeze_feature_extractor = True
    freeze.audio.freeze_encoder_layers = 12
    out["freeze_wav2vec"] = freeze

    jitter = copy.deepcopy(base)
    jitter.data.train.jitter = False
    jitter.data.train.jitter_sd = None
    out["jitter"] = jitter

    pv = copy.deepcopy(base)
    pv.audio.pretrained = False
    out["pretraining_v"] = pv

    pa = copy.deepcopy(base)
    pa.video.pretrained = False
    out["pretraining_a"] = pa

    pn = copy.deepcopy(base)
    pn.audio.pretrained = False
    pn.video.pretrained = False
    out["pretraining_none"] = pn

    static = copy.deepcopy(base)
    static.video.static = True
    static.video.version = "static"
    out["static"] = static

    return out
