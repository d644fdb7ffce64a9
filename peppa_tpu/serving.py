"""Serving: AOT-compiled, bucket-shaped encoder service.

No reference equivalent (the reference's closest surface is example.py's
ad-hoc embedding loop); this is the production inference path for the TPU
framework:

- every (bucket, batch) shape is compiled ONCE up front (`warmup`), so no
  request ever pays an XLA compile;
- requests are grouped by duration bucket, zero-padded to the bucket's static
  shape and batched to `batch_size`; true lengths travel with the batch so
  results come back unpadded;
- similarity scoring reuses the fused Pallas kernel path.

Usage:
    svc = EncoderService.from_checkpoint("lightning_logs/version_0")
    svc.warmup()
    A = svc.embed_audio(list_of_waveforms)      # (N, 512) unit-norm
    V = svc.embed_video(list_of_clips)          # (N, 512)
    scores = svc.similarity(V, A)               # cosine matrix
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Sequence

import numpy as np

from peppa_tpu.config import Config


class EncoderService:
    def __init__(self, model, variables, config: Config,
                 batch_size: int = 32,
                 buckets: Optional[Sequence[float]] = None,
                 fps: float = 10.0,
                 host_rss_recycle_gb: Optional[float] = None,
                 mesh=None):
        """`mesh`: a jax.sharding.Mesh to serve on — request batches shard
        over its 'data' axis (each device encodes batch_size/n_data rows;
        XLA partitions the towers), with params replicated.  batch_size
        must divide evenly over the data axis.  None: single device."""
        import jax

        from peppa_tpu.utils.host_memory import HostMemoryWatchdog

        # long-running servers on the axon tunnel leak one batch of host RAM
        # per request batch (PERF.md "Host-memory leak"); pass
        # host_rss_recycle_gb to arm a watchdog that recycles the device
        # session between chunks.  OPT-IN here (unlike the training loop,
        # which owns its process): the recycle resets the whole device
        # session, which would invalidate any OTHER live device buffers in
        # an embedding process (a second service, cached arrays) — only the
        # variables this service re-transfers survive.  Arm it only when
        # the service is the process's sole device user.
        self._mem_watchdog = HostMemoryWatchdog(host_rss_recycle_gb)

        self.model = model
        self.variables = variables
        self.config = config
        self.batch_size = batch_size
        self.buckets = tuple(buckets if buckets is not None
                             else config.tpu.bucket_durations)
        self.fps = fps
        self.sample_rate = config.data.audio_sample_rate
        w, h = config.data.target_size
        self._hw = (h, w)

        self._batch_sharding = None
        if mesh is not None and "data" in mesh.shape \
                and mesh.shape["data"] > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            if batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {batch_size} must divide over the mesh's "
                    f"data axis ({mesh.shape['data']})")
            # rows shard over 'data' regardless of rank; params replicate
            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
            self.variables = jax.device_put(
                self.variables, NamedSharding(mesh, PartitionSpec()))

        @functools.partial(jax.jit, static_argnames=())
        def _audio(vs, audio):
            return model.apply(vs, audio, method=model.encode_audio)

        @functools.partial(jax.jit, static_argnames=())
        def _video(vs, video):
            return model.apply(vs, video, method=model.encode_video)

        self._audio_fn = _audio
        self._video_fn = _video

    @classmethod
    def from_checkpoint(cls, version_dir: str,
                        quantize_int8: Optional[bool] = None,
                        **kw) -> "EncoderService":
        """`quantize_int8` overrides the checkpoint's tpu.quantize_int8:
        W8A8 dynamic int8 serving (~6.5x MXU rate on v5e; same checkpoint —
        the quantization is apply-time, ops/quant.py)."""
        from peppa_tpu.training.checkpoint import load_best_model

        model, variables, config, _ = load_best_model(version_dir)
        if quantize_int8 is not None and \
                quantize_int8 != config.tpu.quantize_int8:
            from peppa_tpu.models.dual_encoder import PeppaPig

            config.tpu.quantize_int8 = quantize_int8
            model = PeppaPig(config)
        return cls(model, variables, config, **kw)

    # ------------------------------------------------------------- shapes
    def _audio_bucket(self, n_samples: int) -> int:
        for b in self.buckets:
            if n_samples <= int(round(b * self.sample_rate)):
                return int(round(b * self.sample_rate))
        return int(round(self.buckets[-1] * self.sample_rate))

    def _video_bucket(self, n_frames: int) -> int:
        for b in self.buckets:
            if n_frames <= int(round(b * self.fps)):
                return int(round(b * self.fps))
        return int(round(self.buckets[-1] * self.fps))

    # ------------------------------------------------------------- warmup
    def _to_device(self, batch: np.ndarray):
        import jax
        import jax.numpy as jnp

        if self._batch_sharding is not None:
            return jax.device_put(batch, self._batch_sharding)
        return jnp.asarray(batch)

    def warmup(self) -> None:
        """Compile every (bucket, full-batch) program before serving."""
        h, w = self._hw
        for b in self.buckets:
            s = int(round(b * self.sample_rate))
            t = int(round(b * self.fps))
            logging.info("serving warmup: bucket %.1fs (%d samples, %d frames)",
                         b, s, t)
            np.asarray(self._audio_fn(
                self.variables,
                self._to_device(np.zeros((self.batch_size, s), np.float32))))
            np.asarray(self._video_fn(
                self.variables,
                self._to_device(
                    np.zeros((self.batch_size, t, h, w, 3), np.uint8))))

    # -------------------------------------------------------------- embed
    def _run_bucketed(self, items: Sequence[np.ndarray], bucket_of,
                      fn) -> np.ndarray:
        from peppa_tpu.utils.request_batching import (group_by_bucket,
                                                      padded_chunk)

        out = np.zeros((len(items), 512), np.float32)
        for size, idxs in group_by_bucket(items, bucket_of).items():
            for lo in range(0, len(idxs), self.batch_size):
                if self._mem_watchdog.check():
                    self.variables = self._mem_watchdog.recycler.recycle(
                        self.variables)
                    self._mem_watchdog.note_recycled()
                chunk = idxs[lo:lo + self.batch_size]
                batch = padded_chunk(items, chunk, size, self.batch_size,
                                     items[chunk[0]].shape[1:],
                                     items[chunk[0]].dtype)
                emb = np.asarray(fn(self.variables, self._to_device(batch)))
                out[chunk] = emb[:len(chunk)]
        return out

    def embed_audio(self, waveforms: Sequence[np.ndarray]) -> np.ndarray:
        """(S_i,) float32 waveforms -> (N, 512) unit-norm embeddings."""
        waveforms = [np.asarray(x, np.float32).reshape(-1) for x in waveforms]
        return self._run_bucketed(
            waveforms, lambda x: self._audio_bucket(x.shape[0]),
            self._audio_fn)

    def embed_video(self, clips: Sequence[np.ndarray]) -> np.ndarray:
        """(T_i, H, W, 3) float [0,1] or uint8 clips -> (N, 512) embeddings.

        Clips canonicalize to uint8 before bucketing (see
        utils/request_batching.py::canonicalize_video — shared with the
        exported-artifact path so the two can't drift).
        """
        from peppa_tpu.utils.request_batching import canonicalize_video

        clips = [canonicalize_video(x) for x in clips]
        return self._run_bucketed(
            clips, lambda x: self._video_bucket(x.shape[0]), self._video_fn)

    @staticmethod
    def similarity(video_emb: np.ndarray, audio_emb: np.ndarray) -> np.ndarray:
        from peppa_tpu.ops.similarity import cosine_matrix

        return np.asarray(cosine_matrix(video_emb, audio_emb))
