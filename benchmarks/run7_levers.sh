#!/bin/bash
# Run 7 — the data and width levers at FIXED 2.56 s context (r4).
#
# docs/DESIGN.md's roadmap says the next levers after the context-scaling
# study (RESULTS.md runs 3-5) are "corpus hours and model width, not
# context length alone". The 2.56 s point is where the cross-utterance
# signal first appeared (5.7 +/- 1.3% at 8k steps on the 0.85 h corpus,
# chance 3.1%) and is cheap enough to complete inside a round, so the two
# arms hold context fixed there and move exactly one variable each
# against that run-3 baseline:
#
#   arm D (data):  the 3.4 h corpus (32 spk x 16 files x 24 s — the SAME
#                  seed-deterministic corpus runs 4/5 used, 4x the hours),
#                  milestones to 16k (more data may need more steps).
#   arm W (width): d_ar 256 -> 512 on the 0.85 h corpus, same milestones
#                  as the baseline plus 12k.
#
# Everything else matches the run-3 protocol: tpu_fast bf16 batch 64,
# all_steps negatives, augmentation, file-disjoint probes x3 seeds.
# device_corpus is new vs run 3 but equality-tested against the host path
# (tests/test_train_integration.py) and required here: the axon client
# leaks every host->device payload (docs/DESIGN.md "host transfer leak").
#
# Usage: run7_levers.sh [EPOCH_DEADLINE]
#   Arms run sequentially (the TPU is single-claim). The deadline guard
#   stops whatever is running at EPOCH_DEADLINE (end-of-round chip
#   handoff); a preempted arm checkpoints and its log ends honestly at
#   the last probed milestone.
set -u
cd /root/repo
DEADLINE="${1:-0}"

run_arm() {
  local name="$1"; shift
  local wd="/root/repo/runs/run7_$name"
  mkdir -p "$wd"
  if [ "$DEADLINE" -gt 0 ]; then
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "[run7] past deadline — not starting arm $name" \
        >> /tmp/run7.out
      return 0
    fi
    setsid bash benchmarks/deadline_guard.sh "$DEADLINE" \
      "$wd/study.log.wd" < /dev/null >> /tmp/run7.out 2>&1 &
  fi
  # 900 s staleness: training logs every 200 steps (~20 s apart) but the
  # probe battery, corpus generation, and the first Mosaic compile are
  # silent for minutes; past 15 min of silence the relay is dead and the
  # watchdog's kill+resume is the documented recovery
  bash benchmarks/watchdog.sh "$wd/study.log" 900 4 -- \
    python benchmarks/probe_study.py --style dynamics \
    --augment --negatives all_steps --snippet-samples 40960 \
    --device-corpus --probe-seeds 3 --workdir "$wd" "$@"
}

run_arm data --files-per-speaker 16 --seconds-per-file 24 \
  --milestones 0,4000,8000,12000,16000
run_arm width --files-per-speaker 8 --seconds-per-file 12 --d-ar 512 \
  --milestones 0,4000,8000,12000
echo "[run7] all arms done $(date -u +%FT%TZ)" >> /tmp/run7.out
