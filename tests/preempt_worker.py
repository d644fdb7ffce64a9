"""Worker for the REAL 2-process preemption/auto-resume test (VERDICT r3 #7).

Run by tests/test_distributed_preempt.py:
    python tests/preempt_worker.py <pid> <port> <outdir> <mode>

Modes (each a fresh 2-process `jax.distributed` job, like a real requeue):
- straight: uninterrupted 3-epoch Trainer.fit(); write the final-state digest.
- preempt:  identical run, but during the validation at the end of epoch 1
            the worker writes a marker file and BLOCKS until the test driver
            has delivered SIGTERM to BOTH processes (marker protocol below).
            The PreemptionGuard flag is then observed at the epoch boundary:
            both processes take the collective preempted-checkpoint snapshot,
            only process 0 publishes checkpoints/preempted.ckpt, and fit()
            returns cleanly with trainer.preempted == True.
- resume:   fit(resume_from=.../preempted.ckpt) — continues at epoch 2 and
            must land on EXACTLY the state the straight run reached (the
            preemption hit an epoch boundary, so no steps are replayed; the
            train stream is a function of (seed, epoch) and the step rng of
            state.step, both restored).

Marker protocol (all under <outdir>): worker writes `val2_<pid>` when the
epoch-1-end validation begins; the driver waits for both markers, sends
SIGTERM to both workers, then creates `sigsent`; workers poll for `sigsent`
(plus a grace sleep for signal delivery) before letting validation proceed.
The SIGTERM therefore arrives asynchronously mid-fit, on both processes,
while the step loop is live — the real scheduler-preemption shape.

No reference equivalent: the reference's SLURM story is kill-and-restart
from the last epoch checkpoint (jobarray.sh); SPMD-safe graceful preemption
is a new capability (SURVEY.md §5.3).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_EPOCHS = 3


def build_config(mid: bool = False):
    """Tiny-but-real config: conv-only audio trunk, (4,1) 2-process mesh,
    global-negative loss, per-epoch validation + checkpointing.

    `mid=True` is the MID-epoch preemption scenario: 3 local batches per
    epoch so the SIGTERM can land strictly inside an epoch (offset 2 of 3)
    and the step-accurate resume (epoch_batch_offset meta) is what's being
    proven."""
    from peppa_tpu.config import Config

    cfg = Config()
    cfg.data.target_size = (32, 32)
    cfg.data.audio_sample_rate = 1600
    cfg.data.train.batch_size = 4
    cfg.data.val.batch_size = 4
    cfg.data.train.duration = 0.8
    cfg.data.val.duration = 0.8
    cfg.training.precision = "fp32"
    cfg.training.max_epochs = MAX_EPOCHS
    cfg.training.max_time = None
    cfg.training.accumulate_grad_batches = 1
    cfg.training.num_sanity_val_steps = 0
    cfg.training.limit_train_batches = 3 if mid else 2
    cfg.training.limit_val_batches = 1
    cfg.training.log_every_n_steps = 1
    cfg.optimizer.t_total = 100
    cfg.tpu.bucket_durations = (0.8, 2.0)
    cfg.tpu.mesh_shape = (4, 1)
    cfg.audio.full = False  # conv-only trunk: much faster on CPU
    cfg.video.version = "r3d_18"
    return cfg


def state_digest(state):
    """Deterministic scalar fingerprint of the final train state."""
    import jax
    import numpy as np

    total = 0.0
    for leaf in jax.tree_util.tree_leaves(state.params):
        total += float(np.sum(np.abs(np.asarray(leaf, dtype=np.float64))))
    return {"param_l1": total, "step": int(np.asarray(state.step))}


def main() -> None:
    pid, port, outdir, mode = (int(sys.argv[1]), sys.argv[2], sys.argv[3],
                               sys.argv[4])
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                               process_id=pid)

    from peppa_tpu.data.datamodule import SyntheticPigData
    from peppa_tpu.training.loop import Trainer

    mid = mode.endswith("_mid")
    base_mode = mode[:-4] if mid else mode
    cfg = build_config(mid)
    # 16 train clips -> 4 batches of 4; each of the 2 hosts keeps 1/2 of the
    # stream -> 2 local batches -> 2 global steps per epoch (24/3 for `mid`)
    data = SyntheticPigData(cfg, n_train=24 if mid else 16, n_val=4, seed=3)

    if base_mode == "preempt" and mid:
        # MID-epoch preemption: block the epoch-1 stream BEFORE yielding its
        # second batch until the driver has SIGTERM'd both processes.  The
        # prefetcher's puller blocks here while the main thread trains batch
        # 0 of the epoch and then waits on the queue; after `sigsent` the
        # batch flows, gets trained, and the guard flag is observed at that
        # step boundary -> preempted at offset 2 of a 3-batch epoch.
        orig_tb = data.train_batches

        def train_batches_hook(epoch=0):
            for i, b in enumerate(orig_tb(epoch)):
                if epoch == 1 and i == 1:
                    with open(os.path.join(outdir, f"val2_{pid}"), "w") as f:
                        f.write("here")
                    deadline = time.time() + 300
                    while not os.path.exists(os.path.join(outdir, "sigsent")):
                        if time.time() > deadline:
                            raise RuntimeError("driver never sent SIGTERM")
                        time.sleep(0.05)
                    time.sleep(2.0)  # grace: let the signal handler run
                yield b

        data.train_batches = train_batches_hook
    elif base_mode == "preempt":
        # trigger the marker protocol from INSIDE fit(): on the 2nd
        # val_loaders() call (sanity is disabled, so calls are the
        # end-of-epoch validations: epoch 0 -> call 1, epoch 1 -> call 2)
        calls = {"n": 0}
        orig = data.val_loaders

        def val_loaders_hook():
            calls["n"] += 1
            if calls["n"] == 2:
                marker = os.path.join(outdir, f"val2_{pid}")
                with open(marker, "w") as f:
                    f.write("here")
                deadline = time.time() + 300
                while not os.path.exists(os.path.join(outdir, "sigsent")):
                    if time.time() > deadline:
                        raise RuntimeError("driver never sent SIGTERM")
                    time.sleep(0.05)
                time.sleep(2.0)  # grace: let the signal handler actually run
            return orig()

        data.val_loaders = val_loaders_hook

    version_dir = os.path.join(outdir, "version_0")
    trainer = Trainer(cfg, log_dir=outdir, version_dir=version_dir)
    resume_from = None
    if base_mode == "resume":
        resume_from = os.path.join(version_dir, "checkpoints",
                                   "preempted.ckpt")
        assert os.path.exists(resume_from), resume_from
    state = trainer.fit(data, resume_from=resume_from)

    result = {"pid": pid, "mode": mode, "preempted": trainer.preempted,
              **state_digest(state)}
    if base_mode == "preempt":
        assert trainer.preempted, "SIGTERM did not stop the run"
        ckpt = os.path.join(version_dir, "checkpoints", "preempted.ckpt")
        if pid == 0:
            assert os.path.exists(ckpt), "process 0 must publish the ckpt"
            with open(ckpt + ".json") as f:
                meta = json.load(f)
            if mid:
                # preempted strictly inside epoch 1: last completed epoch 0,
                # 1 or 2 of its 3 batches already trained (which one depends
                # on when the kernel delivers SIGTERM relative to the guard
                # check after the batch the hook gates — both are genuinely
                # mid-epoch; the resume must be exact for EITHER offset)
                assert meta["epoch"] == 0, meta
                assert meta["epoch_batch_offset"] in (1, 2), meta
            else:
                assert meta["epoch"] == 1, meta  # last COMPLETED epoch
                assert meta.get("epoch_batch_offset", 0) == 0, meta
            result["ckpt_meta_epoch"] = meta["epoch"]
            result["ckpt_meta_offset"] = meta.get("epoch_batch_offset", 0)
    with open(os.path.join(outdir, f"result_{mode}_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"worker {pid} mode={mode}: {result}", flush=True)


if __name__ == "__main__":
    main()
