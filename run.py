"""Training CLI — capability parity with reference run.py.

Usage: python run.py --config_file hparams_base.yaml
(identical flag surface; reference run.py:64-71).  Extra TPU-era flags mirror
the Lightning trainer args the reference exposed through pl.Trainer.
"""

import logging
from argparse import ArgumentParser

import peppa_tpu.config as C


def get_git_commit():
    """Stamp the current commit into hparams (reference run.py:10-15)."""
    import subprocess

    try:
        return subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                              text=True, check=True).stdout.strip()
    except Exception:
        return None


def main(args):
    logging.getLogger().setLevel(logging.INFO)
    # persistent compile cache: restarts and repeat configs skip XLA compiles
    from peppa_tpu.utils.compile_cache import (
        apply_platform_override, enable_persistent_compilation_cache)

    apply_platform_override()
    enable_persistent_compilation_cache()
    if args.config_file is None:
        config = C.default_config()
    else:
        config = C.Config.load(args.config_file)

    # Override config from CLI (reference run.py:25-27 semantics)
    if args.limit_train_batches is not None:
        config.training.limit_train_batches = args.limit_train_batches
    if args.limit_val_batches is not None:
        config.training.limit_val_batches = args.limit_val_batches
    if args.max_epochs is not None:
        config.training.max_epochs = args.max_epochs
    if args.max_steps is not None:
        config.training.max_steps = args.max_steps
    if args.max_time is not None:
        config.training.max_time = args.max_time
    if args.margin is not None:
        config.margin = args.margin
    if args.seed is not None:
        config.training.seed = args.seed
    if args.synthetic_data:
        config.data.prepare = False
        config.data.extract = False
    config.git_commit = get_git_commit()

    from peppa_tpu.data.datamodule import PigData, SyntheticPigData
    from peppa_tpu.models.convert import pretrained_loader_from_config
    from peppa_tpu.training.loop import Trainer

    if args.synthetic_data:
        data = SyntheticPigData(config, n_train=args.synthetic_train,
                                n_val=args.synthetic_val,
                                n_classes=args.synthetic_classes)
    else:
        data = PigData(config)

    resume_from = args.resume_from
    auto_resumed = False
    if args.auto_resume and resume_from is None:
        from peppa_tpu.training.checkpoint import find_preempted_checkpoint

        resume_from = find_preempted_checkpoint(config, args.log_dir)
        if resume_from is not None:
            auto_resumed = True
            logging.info("auto-resume: continuing from %s", resume_from)

    trainer = Trainer(config, log_dir=args.log_dir)
    logging.info("Run directory: %s", trainer.version_dir)
    trainer.fit(data, pretrained_loader=pretrained_loader_from_config(config),
                resume_from=resume_from)
    if auto_resumed:
        # Retire the checkpoint this run resumed from — ALSO on re-preemption
        # (the trainer just wrote its own, newer preempted.ckpt, so the old
        # one is superseded; leaving it would let a future FRESH submission
        # of this config silently resume a months-old chain link).
        from peppa_tpu.training.checkpoint import consume_preempted_checkpoint

        consume_preempted_checkpoint(resume_from)
    if trainer.preempted:
        # EX_TEMPFAIL: the run was preempted after saving
        # checkpoints/preempted.ckpt — requeue (jobarray.sh does) and this
        # config's next --auto_resume run continues from it
        import sys

        sys.exit(75)


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--config_file", help="Configuration file (YAML)",
                        default=None)
    parser.add_argument("--limit_train_batches", type=int, default=None)
    parser.add_argument("--limit_val_batches", type=int, default=None)
    parser.add_argument("--max_epochs", type=int, default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--max_time", type=str, default=None,
                        help="DD:HH:MM:SS wall-clock budget")
    parser.add_argument("--margin", type=float, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--log_dir", type=str, default="lightning_logs")
    parser.add_argument("--resume_from", type=str, default=None,
                        help="Checkpoint to resume from (e.g. .../last.ckpt)")
    parser.add_argument("--auto_resume", action="store_true",
                        help="Resume from the newest preempted.ckpt of a "
                             "matching earlier run (scheduler requeue flow)")
    parser.add_argument("--synthetic_data", action="store_true",
                        help="Train on synthetic clips (no media needed)")
    parser.add_argument("--synthetic_train", type=int, default=64)
    parser.add_argument("--synthetic_val", type=int, default=32)
    parser.add_argument("--synthetic_classes", type=int, default=8,
                        help="latent classes in the correlated synthetic "
                             "corpus; >8 makes the task hard enough not to "
                             "saturate at schedule scale")
    main(parser.parse_args())
