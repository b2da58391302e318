#!/bin/bash
# run_tpu.sh <logfile> <stall_seconds> <total_timeout> -- cmd args...
# Runs cmd with output to logfile; if the log doesn't grow for
# <stall_seconds>, kills and restarts (max 5 attempts).  The axon relay
# intermittently deadlocks a client's first dispatch; restart clears it.
LOG=$1; STALL=$2; TOTAL=$3; shift 4
for attempt in 1 2 3 4 5; do
  : > "$LOG"
  env PYTHONPATH=/root/repo:/root/.axon_site timeout "$TOTAL" "$@" >> "$LOG" 2>&1 &
  PID=$!
  last_size=-1; stalled=0
  while kill -0 $PID 2>/dev/null; do
    sleep 15
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    if [ "$size" = "$last_size" ]; then
      stalled=$((stalled+15))
      if [ $stalled -ge "$STALL" ]; then
        echo "[watchdog] stalled ${STALL}s on attempt $attempt; restarting" >> "$LOG"
        kill $PID 2>/dev/null; sleep 3; kill -9 $PID 2>/dev/null
        break
      fi
    else
      stalled=0; last_size=$size
    fi
  done
  if ! kill -0 $PID 2>/dev/null; then
    wait $PID; rc=$?
    if [ $rc -eq 0 ]; then echo "[watchdog] done rc=0" >> "$LOG"; exit 0; fi
    if ! grep -q "\[watchdog\] stalled" "$LOG"; then
      echo "[watchdog] exited rc=$rc (no stall); giving up" >> "$LOG"; exit $rc
    fi
  fi
done
echo "[watchdog] exhausted attempts" >> "$LOG"; exit 1
