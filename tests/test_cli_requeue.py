"""End-to-end scheduler-requeue chain through the run.py CLI.

The graceful-preemption story (training/preemption.py + run.py --auto_resume,
SURVEY.md §5.3/5.4) as a scheduler actually exercises it, in real processes:

  submission 1:  SIGUSR1 mid-training -> trainer saves
                 checkpoints/preempted.ckpt at a step boundary and run.py
                 exits 75 (EX_TEMPFAIL, the jobarray requeue convention);
  submission 2:  --auto_resume finds the matching preempted.ckpt, trains to
                 completion, exits 0, and retires the consumed checkpoint so
                 a future fresh submission of this config starts fresh.

Unit halves are covered in tests/test_preemption.py; this test is the whole
chain at the CLI boundary, including the exit codes jobarray.sh keys on.
"""
import os
import signal
import subprocess
import sys
import time

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_yaml(tmp_path) -> str:
    from peppa_tpu.config import Config

    cfg = Config()
    cfg.data.target_size = (32, 32)
    cfg.data.audio_sample_rate = 1600
    cfg.data.data_dir = str(tmp_path / "data")
    cfg.data.train.batch_size = 4
    cfg.data.val.batch_size = 4
    cfg.data.train.duration = 0.8
    cfg.data.val.duration = 0.8
    cfg.training.precision = "fp32"
    cfg.training.accumulate_grad_batches = 1
    cfg.training.max_epochs = 2
    cfg.training.num_sanity_val_steps = 0
    cfg.training.limit_train_batches = 6
    cfg.training.limit_val_batches = 1
    cfg.training.log_every_n_steps = 1
    cfg.optimizer.t_total = 100
    cfg.tpu.bucket_durations = (0.8, 2.0)
    cfg.tpu.donate_state = False
    cfg.tpu.mesh_shape = (1, 1)
    cfg.audio.full = False  # conv-only trunk: much faster on CPU
    cfg.video.version = "r3d_18"
    path = tmp_path / "tiny.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)
    return str(path)


def _submit(config: str, log_dir: str, stderr_path: str):
    env = dict(os.environ)
    env["PEPPA_PLATFORM"] = "cpu"  # the chip may be busy with a real job
    return subprocess.Popen(
        [sys.executable, "run.py", "--config_file", config,
         "--synthetic_data", "--synthetic_train", "16", "--synthetic_val", "8",
         "--log_dir", log_dir, "--auto_resume"],
        cwd=REPO, env=env, stdout=open(stderr_path, "ab"),
        stderr=subprocess.STDOUT)


def _wait_for(predicate, proc, timeout: float, what: str):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if predicate():
            return
        if proc.poll() is not None:
            raise AssertionError(f"run.py exited rc={proc.returncode} "
                                 f"before {what}")
        time.sleep(1.0)
    raise AssertionError(f"timed out waiting for {what}")


def _metrics_has_row(version_dir: str) -> bool:
    path = os.path.join(version_dir, "metrics.csv")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        return sum(1 for _ in f) >= 2  # header + one data row


@pytest.mark.slow
def test_requeue_chain_through_run_py(tmp_path):
    config = _tiny_yaml(tmp_path)
    log_dir = str(tmp_path / "logs")
    errlog = str(tmp_path / "run.log")

    # ---- submission 1: preempted mid-training, exits EX_TEMPFAIL
    proc = _submit(config, log_dir, errlog)
    v0 = os.path.join(log_dir, "version_0")
    try:
        _wait_for(lambda: _metrics_has_row(v0), proc, timeout=900,
                  what="first logged train step")
        proc.send_signal(signal.SIGUSR1)
        rc = proc.wait(timeout=600)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 75, f"preempted run must exit 75 (got {rc}); " \
                     f"log tail: {open(errlog).read()[-2000:]}"
    preempted = os.path.join(v0, "checkpoints", "preempted.ckpt")
    assert os.path.exists(preempted), "no resumable checkpoint written"

    # ---- submission 2: auto-resumes, completes, retires the checkpoint
    proc = _submit(config, log_dir, errlog)
    rc = proc.wait(timeout=1800)
    assert rc == 0, f"resumed run must complete (got {rc}); " \
                    f"log tail: {open(errlog).read()[-2000:]}"
    log = open(errlog).read()
    assert "auto-resume: continuing from" in log
    assert not os.path.exists(preempted), "consumed checkpoint must be retired"
    assert os.path.exists(preempted + ".consumed")
    v1 = os.path.join(log_dir, "version_1")
    assert os.path.exists(os.path.join(v1, "checkpoints", "last.ckpt")), \
        "completed resumed run must leave a last.ckpt"
    assert _metrics_has_row(v1)
