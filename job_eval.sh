#!/bin/bash
# Evaluate checkpointed runs (retrieval + triplet scores).
# Capability parity: reference job_eval.sh.
# Usage: bash job_eval.sh 0 1 2 3
#SBATCH --job-name=peppa-tpu-eval
#SBATCH --cpus-per-task=16
#SBATCH --time=12:00:00

python evaluate.py --versions "$@"
