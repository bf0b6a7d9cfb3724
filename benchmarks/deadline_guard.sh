#!/bin/bash
# Deadline guard for end-of-round chip handoff: the driver's bench.py run
# needs the single-claim TPU, so any still-running study must be stopped
# BEFORE the round ends. SIGTERM is the graceful path the stack is built
# for (Trainer checkpoints at the interrupt step, probe_study exits 75 =
# EX_TEMPFAIL "resume me", and the stop file below makes the watchdog
# exit instead of restarting) — the next round resumes from the
# checkpoint with `maybe_resume`.
#
# Usage: deadline_guard.sh EPOCH_DEADLINE WD_LOGFILE
#   EPOCH_DEADLINE  unix time at which to stop the run
#   WD_LOGFILE      the watchdog's .wd log; its last "started pid=" line
#                   names the CURRENT child (the watchdog may have
#                   restarted it since launch — never kill by pattern)
set -u
DEADLINE="$1"; WDLOG="$2"
LOG="${WDLOG%.wd}"   # watchdog convention: WDLOG = "$LOG.wd"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do sleep 60; done
# stop file FIRST: whatever way the child exits now (graceful SIGTERM
# exit 0, staleness kill, crash), the watchdog sees the file and exits
# instead of restarting — without this, a KILLed child (rc!=0) would be
# restarted and the chip never released (review r4)
touch "$LOG.stop" 2>/dev/null
[ -f "$WDLOG" ] || exit 0
# The watchdog may have checked the stop file just before we touched it
# and spawned a FRESH child whose "started pid=" line lands after our
# grep — so loop: re-read the newest pid until it is dead AND no newer
# one has appeared (review r4: a single-shot grep could TERM the old,
# already-exited pid and leave the fresh child holding the chip).
last=""
for _ in $(seq 1 5); do
  pid=$(grep -o 'started pid=[0-9]*' "$WDLOG" | tail -1 | cut -d= -f2)
  [ -n "$pid" ] || exit 0
  if ! kill -0 "$pid" 2>/dev/null; then
    # newest logged pid is dead; if the previous pass already saw this
    # same pid dead, the watchdog has settled (stop file in effect) —
    # done. Otherwise give it a beat to log a newer spawn and re-check.
    [ "$pid" = "$last" ] && exit 0
    last="$pid"; sleep 15; continue
  fi
  echo "[deadline] $(date -u +%FT%TZ) TERM pid=$pid" >> "$WDLOG"
  kill -TERM "$pid" 2>/dev/null
  # the graceful path needs one step + an async checkpoint save; escalate
  # only if the process is still alive well past that
  for _ in $(seq 1 30); do
    kill -0 "$pid" 2>/dev/null || break
    sleep 10
  done
  if kill -0 "$pid" 2>/dev/null; then
    echo "[deadline] escalating KILL pg $pid" >> "$WDLOG"
    kill -KILL -- -"$pid" 2>/dev/null || kill -KILL "$pid" 2>/dev/null
  fi
  last="$pid"; sleep 15   # loop: catch a child spawned during the race
done
