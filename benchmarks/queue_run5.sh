#!/bin/bash
# Chip-queue: the TPU is single-claim, so run 5's completion (10.24 s
# context to 32k steps — RESULTS.md "Run 5", interrupted at 16k in r3 by
# the relay outage + VM recycle) waits here for the transformer dynamics
# study (runs/probe_tfm4) to release the chip, then starts under the
# log-staleness watchdog. Checkpoints live under runs/ (survives VM
# recycles — the r3 failure mode) and the corpus is the SAME regenerated
# dynamics corpus the transformer study uses, which is seed-deterministic
# and therefore identical to r3's run-4/5 corpus.
#
# Usage: queue_run5.sh WAIT_PID [EPOCH_DEADLINE]
#   WAIT_PID        the current chip-holder; 0 = none
#   EPOCH_DEADLINE  don't START if past this time (the end-of-round chip
#                   handoff — deadline_guard.sh stops whatever is running)
set -u
cd /root/repo
WAIT_PID="${1:-0}"
DEADLINE="${2:-0}"
if [ "$WAIT_PID" -gt 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
  echo "[queue] past deadline $DEADLINE — not starting run 5" \
    >> /tmp/queue_run5.out
  exit 0
fi
sleep 30   # let the chip claim fully release
mkdir -p runs/run5_32k
# guard the run WE start: the deadline must stop it too, not only gate
# the start — otherwise a run launched just before the deadline holds the
# single-claim chip through the handoff (review r4). Idempotent with an
# externally-started guard on the same wdlog (both touch the same stop
# file; TERM of an already-dead pid is a no-op).
if [ "$DEADLINE" -gt 0 ]; then
  setsid bash benchmarks/deadline_guard.sh "$DEADLINE" \
    /root/repo/runs/run5_32k/study.log.wd < /dev/null >> /tmp/queue_run5.out 2>&1 &
fi
exec bash benchmarks/watchdog.sh /root/repo/runs/run5_32k/study.log 1200 8 -- \
  python benchmarks/probe_study.py --style dynamics --files-per-speaker 16 \
  --seconds-per-file 24 \
  --corpus /root/repo/runs/probe_tfm/corpus_dynamics_32x16x24s \
  --augment --negatives all_steps --snippet-samples 163840 --batch 32 \
  --device-corpus --probe-seeds 3 \
  --milestones 0,8000,12000,16000,20000,24000,28000,32000 \
  --workdir /root/repo/runs/run5_32k
