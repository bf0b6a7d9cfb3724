#!/bin/bash
# Log-staleness watchdog for long chip runs (docs/DESIGN.md "environment
# quirks"): the axon relay can die mid-run, leaving the client blocked
# forever on a futex with zero CPU and a silent log. The child must be
# resumable (Trainer checkpoint + maybe_resume — probe_study.py and
# cpc_tpu.train both are); this wrapper restarts it whenever its log stops
# moving or it exits nonzero, up to MAX_RESTARTS.
#
# Usage: watchdog.sh LOGFILE STALE_SECS MAX_RESTARTS -- cmd args...
# The ~20 min default threshold clears Mosaic compile and probe-battery
# gaps (both log nothing while working but finish well under that).
#
# Stop protocol: touching LOGFILE.stop makes the watchdog exit instead of
# restarting (checked before every spawn AND after every child exit —
# including a graceful SIGTERM exit 0). deadline_guard.sh uses this to
# guarantee the chip is released at the end-of-round handoff.
#
# A STALENESS kill is the watchdog's own doing, so the child's exit code
# for it proves nothing about completion: the Trainer handles SIGTERM
# gracefully (checkpoint + exit 0), which must NOT be mistaken for the
# study finishing — restart after self-initiated kills regardless of rc.
set -u
LOG="$1"; STALE="$2"; MAX="$3"; shift 3
[ "$1" = "--" ] && shift
# poll/settle intervals, overridable so tests can run the protocol in
# seconds (production defaults: 60 s staleness poll, 30 s TERM->KILL
# grace, 20 s restart backoff)
TICK="${WD_TICK:-60}"; GRACE="${WD_GRACE:-30}"; BACKOFF="${WD_BACKOFF:-20}"
restarts=0
while :; do
  if [ -f "$LOG.stop" ]; then
    echo "[watchdog] stop file present — exiting" >> "$LOG.wd"; exit 0
  fi
  setsid "$@" >> "$LOG" 2>&1 < /dev/null &
  pid=$!
  echo "[watchdog] started pid=$pid restarts=$restarts" >> "$LOG.wd"
  self_killed=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep "$TICK"
    now=$(date +%s); mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALE" ]; then
      echo "[watchdog] log stale $((now - mt))s — killing pg $pid" >> "$LOG.wd"
      self_killed=1
      kill -TERM -- -"$pid" 2>/dev/null; sleep "$GRACE"
      kill -KILL -- -"$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"; rc=$?
  if [ -f "$LOG.stop" ]; then
    echo "[watchdog] stop file present after child exit (rc=$rc) — exiting" \
      >> "$LOG.wd"
    exit 0
  fi
  if [ "$rc" -eq 0 ] && [ "$self_killed" -eq 0 ]; then
    echo "[watchdog] child exited clean" >> "$LOG.wd"; exit 0
  fi
  restarts=$((restarts + 1))
  if [ "$restarts" -gt "$MAX" ]; then
    echo "[watchdog] restart budget exhausted (rc=$rc)" >> "$LOG.wd"; exit 1
  fi
  echo "[watchdog] child rc=$rc self_killed=$self_killed — restarting" \
    "($restarts/$MAX)" >> "$LOG.wd"
  sleep "$BACKOFF"
done
