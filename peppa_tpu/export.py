"""AOT export: serialized StableHLO encoder artifacts (`jax.export`).

No reference equivalent (the reference deploys by unpickling Lightning
checkpoints into live torch code, pig/evaluation.py:42-53).  This is the
TPU-native deployment path: the trained encoders are lowered ONCE, per
(bucket, batch) static shape, and serialized as StableHLO together with the
weights and a metadata manifest.  Loading an artifact needs jax + numpy
(+ flax.serialization for the msgpack weight blob) and this module's loader
only — no model code, no checkpoint importers — and is stable across
framework versions by StableHLO's compatibility guarantees (jax.export
serialization).

Artifact layout (one directory):

    manifest.json        shapes/dtypes per program, buckets, platforms,
                         jax/stablehlo versions, config snapshot
    variables.msgpack    the variable tree (params + batch_stats), msgpack
    audio_s{S}.hlo       encode_audio program for (batch, S) float32
    video_t{T}.hlo       encode_video program for (batch, T, H, W, 3) uint8

Usage:
    # export (has the framework + a trained model)
    from peppa_tpu.export import export_encoders
    export_encoders(model, variables, config, "artifact/", batch_size=32)

    # serve (needs only jax + this loader + the artifact)
    from peppa_tpu.export import ExportedEncoders
    enc = ExportedEncoders("artifact/")
    A = enc.embed_audio(list_of_waveforms)   # (N, 512) unit-norm
    V = enc.embed_video(list_of_clips)       # (N, 512)
    S = enc.similarity(V, A)
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

_MANIFEST = "manifest.json"
_VARIABLES = "variables.msgpack"


# ----------------------------------------------------------------- export
def export_encoders(model, variables, config, out_dir: str,
                    batch_size: int = 32,
                    buckets: Optional[Sequence[float]] = None,
                    fps: float = 10.0,
                    platforms: Optional[Sequence[str]] = None) -> Dict:
    """Lower + serialize encode_audio/encode_video for every bucket shape.

    `platforms`: target platform list for cross-platform artifacts, e.g.
    ("tpu", "cpu").  None exports for the current default backend only.
    Returns the manifest dict.
    """
    import jax
    from flax import serialization
    from jax import export as jex

    buckets = tuple(buckets if buckets is not None
                    else config.tpu.bucket_durations)
    sample_rate = config.data.audio_sample_rate
    w, h = config.data.target_size

    # canonicalize to plain nested dicts: the load-side tree (msgpack_restore)
    # must match the export-time treedef exactly
    variables = serialization.to_state_dict(variables)
    vs_abs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        variables)

    def audio_fn(vs, audio):
        return model.apply(vs, audio, method=model.encode_audio)

    def video_fn(vs, video):
        return model.apply(vs, video, method=model.encode_video)

    plats = list(platforms) if platforms is not None else None
    os.makedirs(out_dir, exist_ok=True)
    programs: List[Dict] = []
    for b in buckets:
        s = int(round(b * sample_rate))
        t = int(round(b * fps))
        for kind, fn, shape, dtype, fname in (
                ("audio", audio_fn, (batch_size, s), "float32",
                 f"audio_s{s}.hlo"),
                ("video", video_fn, (batch_size, t, h, w, 3), "uint8",
                 f"video_t{t}.hlo")):
            logging.info("export: %s %s -> %s", kind, shape, fname)
            x_abs = jax.ShapeDtypeStruct(shape, np.dtype(dtype))
            exp = jex.export(jax.jit(fn), platforms=plats)(vs_abs, x_abs)
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(exp.serialize())
            programs.append({"kind": kind, "file": fname, "bucket_s": b,
                             "input_shape": list(shape), "input_dtype": dtype})

    with open(os.path.join(out_dir, _VARIABLES), "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree.map(np.asarray, variables)))

    cfg_snapshot = (dataclasses.asdict(config)
                    if dataclasses.is_dataclass(config) else None)
    manifest = {
        "format": "peppa-tpu-export-v1",
        "batch_size": batch_size,
        "buckets": list(buckets),
        "sample_rate": sample_rate,
        "fps": fps,
        "frame_hw": [h, w],
        "platforms": plats or [jax.default_backend()],
        "jax_version": jax.__version__,
        "embed_dim": 512,
        "programs": programs,
        "config": cfg_snapshot,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


# ------------------------------------------------------------------- load
class ExportedEncoders:
    """Serve an `export_encoders` artifact without any model code.

    Mirrors EncoderService's bucketing contract (peppa_tpu/serving.py): items
    are grouped by duration bucket, zero-padded to the bucket's static shape,
    batched to the exported batch size; overlong items crop to the last
    bucket; video canonicalizes to uint8.
    """

    def __init__(self, path: str):
        from jax import export as jex

        self.path = path
        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format") != "peppa-tpu-export-v1":
            raise ValueError(f"not a peppa-tpu export artifact: {path}")
        self.batch_size = self.manifest["batch_size"]
        self.embed_dim = self.manifest["embed_dim"]
        self.variables = _restore_msgpack(os.path.join(path, _VARIABLES))
        self._programs: Dict[str, Dict[int, object]] = {"audio": {}, "video": {}}
        for prog in self.manifest["programs"]:
            with open(os.path.join(path, prog["file"]), "rb") as f:
                exp = jex.deserialize(bytearray(f.read()))
            size = prog["input_shape"][1]  # samples (audio) / frames (video)
            self._programs[prog["kind"]][size] = exp

    # ------------------------------------------------------------ buckets
    def _bucket(self, kind: str, n: int) -> int:
        sizes = sorted(self._programs[kind])
        for s in sizes:
            if n <= s:
                return s
        return sizes[-1]

    def _run(self, kind: str, items: Sequence[np.ndarray],
             dtype) -> np.ndarray:
        from peppa_tpu.utils.request_batching import (group_by_bucket,
                                                      padded_chunk)

        out = np.zeros((len(items), self.embed_dim), np.float32)
        groups = group_by_bucket(items,
                                 lambda x: self._bucket(kind, x.shape[0]))
        for size, idxs in groups.items():
            exp = self._programs[kind][size]
            for lo in range(0, len(idxs), self.batch_size):
                chunk = idxs[lo:lo + self.batch_size]
                batch = padded_chunk(items, chunk, size, self.batch_size,
                                     items[chunk[0]].shape[1:], dtype)
                emb = np.asarray(exp.call(self.variables, batch))
                out[chunk] = emb[:len(chunk)]
        return out

    # -------------------------------------------------------------- embed
    def embed_audio(self, waveforms: Sequence[np.ndarray]) -> np.ndarray:
        """(S_i,) float32 waveforms -> (N, 512) unit-norm embeddings."""
        waveforms = [np.asarray(x, np.float32).reshape(-1) for x in waveforms]
        return self._run("audio", waveforms, np.float32)

    def embed_video(self, clips: Sequence[np.ndarray]) -> np.ndarray:
        """(T_i, H, W, 3) float [0,1] or uint8 clips -> (N, 512) embeddings.

        Canonicalization is shared with the live EncoderService
        (utils/request_batching.py) so the exported path can't drift."""
        from peppa_tpu.utils.request_batching import canonicalize_video

        return self._run("video", [canonicalize_video(x) for x in clips],
                         np.uint8)

    @staticmethod
    def similarity(video_emb: np.ndarray, audio_emb: np.ndarray) -> np.ndarray:
        v = np.asarray(video_emb, np.float64)
        a = np.asarray(audio_emb, np.float64)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        a /= np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        return (v @ a.T).astype(np.float32)


def _restore_msgpack(path: str):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def main(argv: Optional[Sequence[str]] = None) -> None:
    """CLI: export the best checkpoint of a run dir as a serving artifact.

    python -m peppa_tpu.export lightning_logs/version_0 artifact/ \
        [--batch_size 32] [--platforms tpu cpu]
    """
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("version_dir")
    p.add_argument("out_dir", nargs="?", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--platforms", nargs="*", default=None,
                   help="e.g. --platforms tpu cpu for a cross-platform artifact")
    p.add_argument("--reference_ckpt", metavar="PATH", default=None,
                   help="instead of StableHLO artifacts, write the best "
                        "checkpoint as a reference-compatible Lightning "
                        ".ckpt (torch tensors, pig/models.py naming)")
    args = p.parse_args(argv)
    if args.out_dir is None and not args.reference_ckpt:
        # pure argument validation: fail BEFORE the multi-minute model load
        p.error("out_dir is required unless --reference_ckpt is given")

    # a multi-minute export over a tunneled link must not sit silent
    logging.getLogger().setLevel(logging.INFO)
    from peppa_tpu.utils.compile_cache import (
        apply_platform_override, enable_persistent_compilation_cache)

    apply_platform_override()
    enable_persistent_compilation_cache()

    from peppa_tpu.training.checkpoint import load_best_model

    model, variables, config, ckpt_path = load_best_model(args.version_dir)
    if args.reference_ckpt:
        from peppa_tpu.models.convert import save_reference_checkpoint

        monitor = score = None
        epoch = 0
        sidecar = ckpt_path + ".json"
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                meta = json.load(f)
            monitor = meta.get("monitor")
            score = meta.get("best_model_score")
            epoch = meta.get("epoch", 0)
        save_reference_checkpoint(args.reference_ckpt, variables, config,
                                  epoch=epoch, monitor=monitor, score=score)
        print(json.dumps({"reference_ckpt": args.reference_ckpt,
                          "from": ckpt_path, "monitor": monitor,
                          "score": score}))
        return
    logging.info("exporting %s -> %s", ckpt_path, args.out_dir)
    manifest = export_encoders(model, variables, config, args.out_dir,
                               batch_size=args.batch_size,
                               platforms=args.platforms)
    print(json.dumps({"out_dir": args.out_dir,
                      "programs": len(manifest["programs"]),
                      "platforms": manifest["platforms"]}))


if __name__ == "__main__":
    main()
