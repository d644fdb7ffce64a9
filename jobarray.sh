#!/bin/bash
# Train 4 independent seeds of one config, one TPU slice per run.
# Capability parity: reference jobarray.sh (SLURM array of 4 on 1 GPU each).
# Submit with: sbatch jobarray.sh hparams_base.yaml   (or run locally:
#   for i in 0 1 2 3; do SEED=$i bash jobarray.sh hparams_base.yaml; done)
#SBATCH --job-name=peppa-tpu
#SBATCH --array=0-3
#SBATCH --cpus-per-task=16
#SBATCH --time=48:00:00

CONFIG=${1:-hparams_base.yaml}
SEED=${SEED:-${SLURM_ARRAY_TASK_ID:-0}}

python run.py --config_file "$CONFIG" --seed "$SEED"
