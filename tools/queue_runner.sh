#!/bin/bash
# Serialize TPU jobs (the tunneled chip is EXCLUSIVE — a second process
# blocks forever).  Picks up /tmp/tpu_queue/*.job in lexical order, runs
# each under a 4h timeout, logs to docs/runs/r05/<name>.log, and appends
# to docs/runs/r05/queue.status.  Touch /tmp/tpu_queue/STOP to end once
# the spool drains.
set -u
SPOOL=/tmp/tpu_queue
OUT=/root/repo/docs/runs/r05
mkdir -p "$SPOOL" "$OUT"
while true; do
  job=$(ls "$SPOOL"/*.job 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    if [ -f "$SPOOL/STOP" ]; then
      echo "QUEUE_DONE $(date +%T)" >> "$OUT/queue.status"
      exit 0
    fi
    sleep 15
    continue
  fi
  name=$(basename "$job" .job)
  echo "START $name $(date +%T)" >> "$OUT/queue.status"
  timeout 14400 bash "$job" > "$OUT/$name.log" 2>&1
  echo "DONE $name rc=$? $(date +%T)" >> "$OUT/queue.status"
  mv "$job" "$job.done"
done
