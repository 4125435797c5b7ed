#!/bin/bash
# Poll the axon TPU tunnel: one short-lived probe process per attempt.
# Writes status lines to experiments/logs/r4_tpu_poll.log; exits 0 on success.
LOG=/root/repo/experiments/logs/r4_tpu_poll.log
while true; do
  ts=$(date +%H:%M:%S)
  if timeout 700 python /tmp/tpu_health.py > /tmp/tpu_probe_out.txt 2>&1; then
    echo "$ts TPU OK: $(tail -1 /tmp/tpu_probe_out.txt)" >> "$LOG"
    exit 0
  else
    echo "$ts probe failed rc=$? : $(tail -1 /tmp/tpu_probe_out.txt | head -c 200)" >> "$LOG"
  fi
  sleep 240
done
