"""The training driver: the Lightning-Trainer-equivalent, TPU-native.

Capability parity: reference run.py:17-62 + pytorch_lightning.Trainer usage:
- builds data + model from config, stamps git commit;
- sanity validation steps before training (run.py:58 num_sanity_val_steps=15);
- epoch loop: jit'd train step per batch (grad accumulation inside the optax
  chain), logging every N steps;
- per-epoch validation (the 4-loader protocol) driving TWO checkpoint
  monitors (valnarr_rec_fixed, valnarr_triplet) + save_last (run.py:32-55);
- wall-clock budget `max_time="DD:HH:MM:SS"` (run.py:57), limit_train/val
  batches, max optimizer steps (t_total).

TPU-native: state and batches live on a jax.sharding.Mesh; the batch is
sharded over 'data'; params replicated (TP rules available, parallel/mesh.py);
the train step donates the state buffers.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import numpy as np

from peppa_tpu.config import Config
from peppa_tpu.models.dual_encoder import init_model
from peppa_tpu.parallel.mesh import (make_mesh, replicate_batch,
                                     replicate_tree, shard_batch,
                                     state_shardings)
from peppa_tpu.utils import dist
from peppa_tpu.utils.host_memory import HostMemoryWatchdog, host_rss_bytes
from peppa_tpu.utils.prefetch import Prefetcher
from peppa_tpu.training.checkpoint import CheckpointManager, next_version, save_hparams
from peppa_tpu.training.loggers import MetricsLogger
from peppa_tpu.training.optimization import make_optimizer
from peppa_tpu.training.preemption import PreemptionGuard
from peppa_tpu.training.state import TrainState, param_count
from peppa_tpu.training.step import make_eval_step, make_train_step
from peppa_tpu.evaluation.validation import run_validation
from peppa_tpu.utils.profiling import StepTimer


def parse_max_time(value: Optional[str]) -> Optional[float]:
    """'DD:HH:MM:SS' -> seconds (reference run.py:57 format)."""
    if not value:
        return None
    parts = [int(p) for p in value.split(":")]
    while len(parts) < 4:
        parts.insert(0, 0)
    d, h, m, s = parts
    return ((d * 24 + h) * 60 + m) * 60 + s


class NonFiniteLossError(RuntimeError):
    """Raised when training hits a non-finite loss (after an emergency save)."""




class _NullLogger:
    """No-op MetricsLogger stand-in for non-main processes (multi-host)."""

    def log(self, *a, **k):  # pragma: no cover - trivial
        pass

    def close(self):  # pragma: no cover - trivial
        pass


class Trainer:
    def __init__(self, config: Config, log_dir: str = "lightning_logs",
                 version_dir: Optional[str] = None):
        self.config = config
        # multi-host discipline: exactly one process creates directories and
        # writes hparams/metrics/checkpoints — unsynchronized writers would
        # race on a shared filesystem (and even allocate different version_N)
        self._main = dist.is_main_process()
        if self._main:
            self.version_dir = version_dir or next_version(log_dir)
            self.logger = MetricsLogger(self.version_dir)
        else:
            self.version_dir = version_dir or os.path.join(
                log_dir, "nonmain_process")
            self.logger = _NullLogger()
        self.mesh = make_mesh(config.tpu.mesh_shape, config.tpu.mesh_axes)
        # set when a scheduler preemption signal stopped fit() early (a
        # resumable checkpoints/preempted.ckpt was written first)
        self.preempted = False
        # micro_step at which the embedding-collapse guard detected the
        # constant-embedding saddle (None: never); fit() stops gracefully
        # there when tpu.collapse_guard == "stop"
        self.collapsed_at = None
        self._collapse = None

    def fit(self, data, pretrained_loader=None,
            resume_from: Optional[str] = None) -> TrainState:
        """Train. `resume_from` restores a checkpoint (e.g. .../last.ckpt)
        into the fresh state — the reference's Lightning resume_from_checkpoint
        equivalent (SURVEY.md §5.4)."""
        cfg = self.config
        tcfg = cfg.training
        # armed for ALL of fit — a scheduler signal during setup/compile/
        # sanity validation must stop the run cleanly, not kill the process
        # (SIGUSR1's default disposition is terminate)
        guard = PreemptionGuard(cfg.tpu.preempt_signals)
        try:
            guard.__enter__()
            if self._main:
                save_hparams(self.version_dir, cfg)
            data.prepare_data()
            data.setup()

            # ---- model + state
            rng = jax.random.PRNGKey(tcfg.seed)
            model, variables = init_model(cfg, rng)
            if pretrained_loader is not None:
                variables = pretrained_loader(variables)
            logging.info("Model parameters: %.1fM",
                         param_count(variables["params"]) / 1e6)
            tx = make_optimizer(cfg.optimizer,
                                accumulate_grad_batches=tcfg.accumulate_grad_batches,
                                freeze_feature_extractor=cfg.audio.freeze_feature_extractor,
                                freeze_encoder_layers=cfg.audio.freeze_encoder_layers,
                                params=variables["params"])
            state = TrainState.create(variables, tx)
            start_epoch = 0
            resume_offset = 0  # micro-steps already trained IN start_epoch
            resume_meta = {}
            if resume_from is not None:
                from peppa_tpu.training.checkpoint import load_checkpoint

                state, meta = load_checkpoint(resume_from, state)
                resume_meta = meta
                # resume the EPOCH counter too: the train stream is a function of
                # (seed, epoch), so an epoch-aligned restart replays exactly the
                # batches a continuous run would have seen (bit-identical losses)
                if isinstance(meta.get("epoch"), int):
                    start_epoch = meta["epoch"] + 1
                # STEP-ACCURATE mid-epoch resume: a checkpoint taken mid-epoch
                # records how many micro-steps of start_epoch were already
                # trained; the deterministic (seed, epoch) stream is
                # fast-forwarded past them, so no batch is double-stepped and
                # the optimizer/schedule trajectory equals an uninterrupted
                # run's.  Absent (older checkpoints / epoch boundaries): 0,
                # the replay-free epoch-aligned convention.
                resume_offset = int(meta.get("epoch_batch_offset") or 0)
                logging.info("Resumed from %s at step %s (epoch %d, skipping "
                             "%d already-trained batches)", resume_from,
                             int(np.asarray(state.step)), start_epoch,
                             resume_offset)
            with self.mesh:
                state = jax.tree.map(
                    lambda x, s: jax.device_put(x, s), state,
                    state_shardings(state, self.mesh))

            # host-side copy of the optimizer's LR schedule, for metrics.csv —
            # BertAdam applies lr_at(step) at each (post-accumulation) update
            # (optimization.py::bert_adam), so lr here is the value the NEXT
            # optimizer step will use
            from peppa_tpu.training.optimization import schedule_fn
            lr_at = schedule_fn(cfg.optimizer.schedule, cfg.optimizer.lr,
                                cfg.optimizer.warmup, cfg.optimizer.t_total)

            train_step = make_train_step(
                model, cfg.margin, donate=cfg.tpu.donate_state, mesh=self.mesh,
                use_global_negative=cfg.tpu.global_negative_loss)
            eval_step = make_eval_step(model, mesh=self.mesh)
            step_rng = jax.random.PRNGKey(tcfg.seed + 1)
            shard_fn = lambda b: shard_batch(b, self.mesh)
            # under multi-host, every process iterates the same val loaders, so
            # val batches must be replicated, not treated as per-process slabs
            # (shard_batch would duplicate each clip process_count times)
            if dist.process_count() > 1:
                val_shard_fn = lambda b: replicate_batch(b, self.mesh)
            else:
                val_shard_fn = shard_fn
            # every process gets a REAL manager: checkpoint snapshots are
            # collective device programs all processes must dispatch (leaves
            # sharded across hosts are not addressable from one process);
            # only the main process's manager writes files
            ckpt = CheckpointManager(self.version_dir, write=self._main)
            if resume_from is not None:
                ckpt.restore_monitor_state(
                    CheckpointManager.resume_monitors_meta(resume_from,
                                                           resume_meta))
            self._ckpt = ckpt  # for preempted/emergency save metas

            # ---- sanity validation (reference run.py:58)
            if tcfg.num_sanity_val_steps:
                logging.info("Sanity validation (%d batches)", tcfg.num_sanity_val_steps)
                with self.mesh:
                    run_validation(eval_step, state.variables, data.val_loaders(),
                                   shard_fn=val_shard_fn, n_samples=10,
                                   limit_batches=tcfg.num_sanity_val_steps,
                                   seed=tcfg.seed)

            # ---- failure detection: embedding-collapse guard (SURVEY.md
            # §5.3; PERF.md "Schedule-scale recipe runs").  Streams every
            # micro-loss the finiteness watchdog already syncs to host.
            if cfg.tpu.collapse_guard in ("warn", "stop") \
                    and cfg.data.train.batch_size >= 2:
                from peppa_tpu.training.collapse import CollapseDetector
                self._collapse = CollapseDetector(
                    cfg.margin, cfg.data.train.batch_size,
                    window=cfg.tpu.collapse_window)

            # ---- budgets
            max_seconds = parse_max_time(tcfg.max_time)
            t_total = cfg.optimizer.t_total
            max_opt_steps = tcfg.max_steps if tcfg.max_steps is not None else t_total
            accum = max(tcfg.accumulate_grad_batches, 1)
            start = time.time()
            micro_step = int(np.asarray(state.step))  # nonzero after resume
            epoch = start_epoch
            done = False
            timer = StepTimer(warmup_steps=2)
            profile_dir = os.environ.get("PEPPA_PROFILE_DIR")  # jax.profiler trace
            profile_steps = int(os.environ.get("PEPPA_PROFILE_STEPS", "0"))

            pending = None  # (micro_step, metrics) of the previous train step
            last_val_step = -1  # last micro_step a validation ran at
            mem_watchdog = HostMemoryWatchdog(cfg.tpu.host_rss_recycle_gb)
            # micro_step at the start of the CURRENT epoch's stream; offset
            # by resume_offset so (micro_step - epoch_start_step) always
            # equals the number of batches consumed from this epoch's stream
            epoch_start_step = micro_step - resume_offset

            def validate_and_checkpoint(state, epoch, micro_step,
                                        completed_epoch,
                                        epoch_batch_offset=0) -> None:
                """`completed_epoch` is what the checkpoint meta records: the
                last FULLY trained epoch; `epoch_batch_offset` is how many
                micro-steps of epoch completed_epoch+1 the state has already
                trained (0 at epoch boundaries).  A resume starts at
                completed_epoch+1 and skips that many batches — step-accurate,
                no double-stepping.  `epoch` is only the metrics-log label."""
                nonlocal last_val_step
                last_val_step = micro_step
                metrics = run_validation(
                    eval_step, state.variables, data.val_loaders(),
                    shard_fn=val_shard_fn, n_samples=500,
                    limit_batches=tcfg.limit_val_batches, seed=tcfg.seed)
                self.logger.log(metrics, step=micro_step, epoch=epoch)
                logging.info("epoch %d validation: %s", epoch,
                             {k: round(v, 4) for k, v in metrics.items()})
                ckpt.on_validation_end(state, metrics, completed_epoch,
                                       epoch_batch_offset=epoch_batch_offset)

            if guard.triggered:
                # preempted before the first step: the initial/restored
                # state is consistent; save it (re-recording any resume
                # offset — nothing new was trained) and stop
                self._on_preempted(guard, state, micro_step, epoch,
                                   micro_step - epoch_start_step)
                done = True
            epoch_complete = True  # no epoch entered yet counts as complete
            skip_batches = resume_offset  # only the first (resumed) epoch
            while not done:
                if tcfg.max_epochs is not None and epoch >= tcfg.max_epochs:
                    break
                stream = data.train_batches(epoch)
                if tcfg.limit_train_batches is not None:
                    import itertools

                    stream = itertools.islice(stream, tcfg.limit_train_batches)
                epoch_start_step = micro_step - skip_batches
                if skip_batches:
                    # fast-forward the deterministic stream past the batches
                    # the pre-preemption run already trained on (they are
                    # decoded and dropped — never transferred or stepped)
                    import itertools

                    stream = itertools.islice(stream, skip_batches, None)
                    skip_batches = 0
                prefetcher = self._prefetcher = Prefetcher(
                    stream, shard_fn, self.config.tpu.prefetch)
                epoch_complete = False
                with self.mesh:
                    for batch in prefetcher:
                        if profile_dir and micro_step == profile_steps:
                            jax.profiler.start_trace(profile_dir)
                        state, metrics = train_step(state, batch, step_rng)
                        micro_step += 1
                        timer.step(items=int(np.shape(batch.audio)[0]))
                        if profile_dir and profile_steps and \
                                micro_step == 2 * profile_steps:
                            jax.block_until_ready(metrics["train_loss"])
                            jax.profiler.stop_trace()
                            profile_dir = None
                        # failure detection (SURVEY.md §5.3): check EVERY
                        # step's loss for finiteness — one step late so the
                        # host never stalls the device pipeline (the previous
                        # step's value is already computed by the time this
                        # one is dispatched)
                        if pending is not None:
                            self._watchdog(float(pending[1]["train_loss"]),
                                           pending[0], state, epoch)
                        pending = (micro_step, metrics)
                        if micro_step % tcfg.log_every_n_steps == 0:
                            loss = float(metrics["train_loss"])
                            self._watchdog(loss, micro_step, state, epoch)
                            pending = None  # checked
                            self.logger.log(
                                {"train_loss": loss,
                                 "lr": float(np.asarray(lr_at(
                                     np.int32(micro_step // accum)))),
                                 **timer.metrics(),
                                 "perf/host_rss_gb": round(
                                     host_rss_bytes() / (1 << 30), 3)},
                                step=micro_step, epoch=epoch)
                            logging.info("epoch %d step %d loss %.4f "
                                         "(%.1f clips/s)", epoch, micro_step,
                                         loss, timer.items_per_sec)
                        # host-memory watchdog (SURVEY.md §5.3): the axon
                        # tunnel retains one batch of host RAM per transfer;
                        # recycle the device session between steps before
                        # the OS OOM-kills the run.  Bit-exact (verified on
                        # hardware: state round-trips through the host,
                        # executables rebind, pending batches re-transfer).
                        if mem_watchdog.check():
                            if pending is not None:
                                self._watchdog(
                                    float(pending[1]["train_loss"]),
                                    pending[0], state, epoch)
                                pending = None
                            ckpt.wait()  # in-flight saves hold device refs
                            rss0 = host_rss_bytes()
                            with prefetcher.recycling():
                                state, step_rng = mem_watchdog.recycler.recycle(
                                    (state, step_rng))
                            mem_watchdog.note_recycled()
                            logging.info(
                                "session recycle at step %d: host RSS "
                                "%.1f -> %.1f GB", micro_step,
                                rss0 / (1 << 30),
                                host_rss_bytes() / (1 << 30))
                        # mid-epoch validation every N micro-steps
                        # (training.val_check_interval, Lightning semantics:
                        # replaces the per-epoch validation when set)
                        if tcfg.val_check_interval and \
                                micro_step % tcfg.val_check_interval == 0:
                            validate_and_checkpoint(
                                state, epoch, micro_step,
                                completed_epoch=epoch - 1,
                                epoch_batch_offset=micro_step - epoch_start_step)
                        if self.collapsed_at is not None \
                                and cfg.tpu.collapse_guard == "stop":
                            logging.warning(
                                "collapse guard: stopping at step %d — the "
                                "best checkpoints hold the pre-collapse "
                                "optimum; the remaining schedule would be "
                                "signal-free", micro_step)
                            done = True
                            break
                        opt_steps = micro_step // accum
                        if max_opt_steps is not None \
                                and opt_steps >= max_opt_steps:
                            done = True
                            break
                        if max_seconds is not None \
                                and time.time() - start > max_seconds:
                            logging.info("max_time reached, stopping")
                            done = True
                            break
                        if guard.triggered:
                            # scheduler preemption: save a resumable state at
                            # this step boundary, then exit the loop cleanly
                            self._on_preempted(guard, state, micro_step, epoch,
                                               micro_step - epoch_start_step)
                            done = True
                            break
                    else:
                        epoch_complete = True
                    # stop the prefetch worker promptly on early exit (a
                    # NonFiniteLossError above also ends the run; the worker
                    # is a daemon thread and cannot block interpreter exit)
                    prefetcher.close()
                    if pending is not None:  # tail step of the epoch
                        self._watchdog(float(pending[1]["train_loss"]),
                                       pending[0], state, epoch)
                        pending = None
                    if self.preempted:
                        break

                    # ---- validation + checkpoints (per epoch, unless a
                    # step-based val_check_interval drives it instead).
                    # A max_steps/max_time break mid-epoch must record
                    # epoch - 1 (the last FULLY trained epoch) — same replay
                    # convention as preemption — or a resume would silently
                    # skip the untrained remainder of this epoch.
                    if tcfg.val_check_interval is None:
                        validate_and_checkpoint(
                            state, epoch, micro_step,
                            completed_epoch=epoch if epoch_complete
                            else epoch - 1,
                            epoch_batch_offset=0 if epoch_complete
                            else micro_step - epoch_start_step)
                epoch += 1
                if guard.triggered and not done:
                    # preempted during validation: the epoch is complete, so
                    # the saved state resumes at the NEXT epoch (offset 0)
                    self._on_preempted(guard, state, micro_step, epoch, 0)
                    break
            # step-based validation: make sure the FINAL state is validated
            # (and thus eligible for best-checkpoint selection) when the run
            # ends between interval boundaries.  `epoch` was incremented past
            # the last (possibly partial) epoch on both exit paths, so the
            # last FULLY trained epoch is epoch - 1 when that epoch's stream
            # was exhausted (epoch_complete) and epoch - 2 when a
            # max_steps/max_time break left it partial.
            if tcfg.val_check_interval is not None and not self.preempted \
                    and last_val_step != micro_step and micro_step > 0:
                with self.mesh:
                    validate_and_checkpoint(
                        state, epoch, micro_step,
                        completed_epoch=epoch - 1 if epoch_complete
                        else epoch - 2,
                        epoch_batch_offset=0 if epoch_complete
                        else micro_step - epoch_start_step)
        finally:
            guard.__exit__(None, None, None)
            # an exception mid-epoch (e.g. NonFiniteLossError from the
            # watchdog) skips the in-loop close; without this the worker
            # thread spins on its full-queue put retries forever.  close()
            # is idempotent, so the normal path pays nothing.
            if getattr(self, "_prefetcher", None) is not None:
                self._prefetcher.close()

        ckpt.wait()  # join in-flight async checkpoint writes (re-raises)
        self.logger.close()
        return state

    def _on_preempted(self, guard, state, micro_step: int, epoch: int,
                      epoch_batch_offset: int = 0) -> None:
        """Write a resumable checkpoint and mark the run preempted.

        `epoch` is the epoch the step loop is CURRENTLY in (or, after a
        completed validation, the next one) — the checkpoint's meta records
        `epoch - 1` as the last completed epoch and `epoch_batch_offset`
        micro-steps already trained in epoch `epoch`.  `--resume_from
        .../preempted.ckpt` restarts at epoch and SKIPS those batches of the
        deterministic (seed, epoch) stream — step-accurate resume, no batch
        is double-stepped and the optimizer/schedule trajectory matches an
        uninterrupted run's.  Only the main process writes; every process
        stops.
        """
        path = os.path.join(self.version_dir, "checkpoints", "preempted.ckpt")
        from peppa_tpu.training.checkpoint import save_checkpoint

        # every process participates in the collective snapshot; only the
        # main one writes
        save_checkpoint(path, state, {
            "monitor": None, "epoch": epoch - 1,
            "epoch_batch_offset": int(epoch_batch_offset),
            "monitors": getattr(self, "_ckpt", None).monitor_state()
            if getattr(self, "_ckpt", None) else [],
            "reason": f"preempted by {guard.signame} at step {micro_step}"},
            write=self._main)
        logging.info("preemption (%s): resumable state saved to %s, stopping",
                     guard.signame, path)
        self.preempted = True

    def _watchdog(self, loss: float, micro_step: int, state, epoch: int) -> None:
        """Abort on a non-finite loss with an emergency checkpoint.

        No reference equivalent (SURVEY.md §5.3): Lightning would train on
        silently. Only the main process writes the checkpoint; all processes
        raise so a multi-host job stops everywhere.

        Also streams the loss into the embedding-collapse detector
        (training/collapse.py) — every micro-loss the loop syncs to host
        passes through here, so this is the one tap point.  Detection only
        latches `collapsed_at`; the step loop decides whether to stop
        (tpu.collapse_guard), keeping this method side-effect-free on the
        training state.
        """
        if np.isfinite(loss):
            if self._collapse is not None and self.collapsed_at is None \
                    and self._collapse.update(loss):
                self.collapsed_at = micro_step
                self.logger.log({"collapse/detected_step": float(micro_step)},
                                step=micro_step, epoch=epoch)
                logging.warning(
                    "embedding collapse detected at step %d: train loss "
                    "pinned at the constant-embedding saddle %.4f "
                    "(= 2*margin*(1-1/B)) for %d consecutive micro-steps "
                    "after having reached %.4f", micro_step,
                    self._collapse.saddle, self._collapse.window,
                    self._collapse.best)
            return
        path = os.path.join(self.version_dir, "checkpoints",
                            "emergency-nonfinite.ckpt")
        from peppa_tpu.training.checkpoint import save_checkpoint

        # every process participates in the collective snapshot; only the
        # main one writes (shared-FS layout)
        save_checkpoint(path, state, {
            "monitor": None, "epoch": epoch,
            "monitors": getattr(self, "_ckpt", None).monitor_state()
            if getattr(self, "_ckpt", None) else [],
            "reason": f"non-finite loss at step {micro_step}"},
            write=self._main)
        raise NonFiniteLossError(
            f"non-finite train loss at step {micro_step};"
            f" state saved to {path}")
