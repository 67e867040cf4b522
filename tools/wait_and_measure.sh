#!/bin/bash
# Watch for the axon TPU tunnel to recover, then run the one-shot perf
# measurement session. Logs to /tmp/wait_and_measure.log.
cd /root/repo
echo "$(date) watcher started" 
while true; do
  if timeout 300 python -c "import jax; d=jax.devices(); assert d" 2>/dev/null; then
    echo "$(date) tunnel UP — starting perf_session"
    break
  fi
  echo "$(date) tunnel still down; retrying in 120s"
  sleep 120
done
python tools/perf_session.py --timeout 2400 2>&1
echo "$(date) perf_session done rc=$?"
