#!/bin/bash
# Probe the axon TPU tunnel; when it answers, run the measurement battery.
# (scratch measurement loop)
log=/tmp/tpu_watch.log
echo "watch start $(date)" > "$log"
for i in $(seq 1 200); do
  if timeout 90 python -u -c "import jax; d=jax.devices(); print(d)" \
       >> "$log" 2>&1; then
    echo "TUNNEL UP at $(date) (probe $i)" >> "$log"
    break
  fi
  echo "probe $i down $(date)" >> "$log"
  sleep 180
done
cd /root/repo
echo "=== bench.py ===" >> "$log"
timeout 2400 python -u bench.py >> "$log" 2>&1
echo "=== scratch_fixed.py ===" >> "$log"
timeout 2400 python -u scratch_fixed.py >> "$log" 2>&1
echo "=== done $(date) ===" >> "$log"
