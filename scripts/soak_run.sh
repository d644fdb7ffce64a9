#!/usr/bin/env bash
# Long-run soak driver: run the training CLI to schedule completion,
# resuming through crashes (OOM kills, tunnel outages) from the newest
# last.ckpt, and through preemptions (exit 75) via --auto_resume — the
# same requeue contract jobarray.sh implements under SLURM, minus SLURM.
#
# Usage: scripts/soak_run.sh <config.yaml> <log_dir> [extra run.py args...]
set -u
CONFIG="$1"; LOGDIR="$2"; shift 2
MAX_ATTEMPTS=${MAX_ATTEMPTS:-12}
cd "$(dirname "$0")/.."

attempt=0
resume_args=()
while [ "$attempt" -lt "$MAX_ATTEMPTS" ]; do
  attempt=$((attempt + 1))
  echo "=== soak_run attempt $attempt: ${resume_args[*]:-fresh} ==="
  python run.py --config_file "$CONFIG" --log_dir "$LOGDIR" \
    "${resume_args[@]}" "$@"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "=== soak_run: completed on attempt $attempt ==="
    exit 0
  fi
  if [ "$rc" -eq 75 ]; then
    # preempted: the run published checkpoints/preempted.ckpt
    resume_args=(--auto_resume)
    continue
  fi
  # crash: resume from the newest last.ckpt across the version chain
  last=$(ls -t "$LOGDIR"/version_*/checkpoints/last.ckpt 2>/dev/null | head -1)
  if [ -n "$last" ]; then
    echo "=== soak_run: rc=$rc, resuming from $last ==="
    resume_args=(--resume_from "$last")
  else
    echo "=== soak_run: rc=$rc with no checkpoint yet; retrying fresh ==="
    resume_args=()
  fi
  sleep 30  # let a wedged tunnel session expire before reattaching
done
echo "=== soak_run: giving up after $MAX_ATTEMPTS attempts ==="
exit 1
