#!/bin/bash
# Train 4 independent seeds of one config, one TPU slice per run.
# Capability parity: reference jobarray.sh (SLURM array of 4 on 1 GPU each),
# plus graceful preemption: SLURM delivers SIGUSR1 180 s before the time
# limit (--signal=B:USR1@180); the script forwards it to the trainer, which
# saves checkpoints/preempted.ckpt and exits 75 (EX_TEMPFAIL); the job then
# requeues itself and --auto_resume continues from that checkpoint.
# Submit with: sbatch jobarray.sh hparams_base.yaml   (or run locally:
#   for i in 0 1 2 3; do SEED=$i bash jobarray.sh hparams_base.yaml; done)
#SBATCH --job-name=peppa-tpu
#SBATCH --array=0-3
#SBATCH --cpus-per-task=16
#SBATCH --time=48:00:00
#SBATCH --signal=B:USR1@180
#SBATCH --requeue
#SBATCH --open-mode=append

CONFIG=${1:-hparams_base.yaml}
SEED=${SEED:-${SLURM_ARRAY_TASK_ID:-0}}

python run.py --config_file "$CONFIG" --seed "$SEED" --auto_resume &
PID=$!
trap 'kill -USR1 "$PID" 2>/dev/null' USR1 TERM

# `wait` returns early (>128) when the trap fires; wait again until the
# trainer has finished writing its resumable checkpoint and exited
wait "$PID"; RC=$?
while [ "$RC" -gt 128 ] && kill -0 "$PID" 2>/dev/null; do
    wait "$PID"; RC=$?
done

if [ "$RC" -eq 75 ] && [ -n "$SLURM_JOB_ID" ]; then
    scontrol requeue "${SLURM_ARRAY_JOB_ID:-$SLURM_JOB_ID}_${SLURM_ARRAY_TASK_ID:-0}" \
        || scontrol requeue "$SLURM_JOB_ID"
fi
exit "$RC"
