#!/bin/bash
# Supervisor for the chain-v2 quality run (round 5).
#
# The run was lost twice to container restarts and once to a silent
# client wedge after a dirty chip handoff (the client ends up with no
# established relay connection and sleeps forever — CLAUDE.md round-5
# FAILED_PRECONDITION note is the loud variant of the same state).
# This loop relaunches scripts/chain_v2_run.py (per-scale .done.json
# markers make that cheap) and restarts it whenever the log goes quiet
# for STALL_S seconds, with a 35 s pause between chip claims.
set -u
PERSIST=/root/repo/.chain_v2
LOG=$PERSIST/run.log
STALL_S=${STALL_S:-1100}   # > worst observed legit gap (relay compile ~13 min)
TRIES=${TRIES:-6}

for i in $(seq 1 "$TRIES"); do
  if [ -f "$PERSIST/curves.json" ]; then
    echo "supervisor: chain complete" >> "$LOG"
    exit 0
  fi
  echo "supervisor: attempt $i/$TRIES $(date -u +%H:%M:%S)" >> "$LOG"
  PYTHONPATH=/root/.axon_site:/root/repo \
    python /root/repo/scripts/chain_v2_run.py 1500 >> "$LOG" 2>&1 &
  pid=$!
  echo "$pid" > "$PERSIST/run.pid"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "supervisor: log quiet ${age}s — killing wedged client" >> "$LOG"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  rc=$?
  if [ -f "$PERSIST/curves.json" ]; then
    echo "supervisor: chain complete rc=$rc" >> "$LOG"
    exit 0
  fi
  echo "supervisor: run exited rc=$rc; 35 s chip-handoff pause" >> "$LOG"
  sleep 35
done
echo "supervisor: gave up after $TRIES attempts" >> "$LOG"
exit 1
