#!/bin/bash
# Watch for the axon TPU tunnel to recover, then run the one-shot perf
# measurement session. Redirect stdout/stderr to a log when launching,
# e.g.:  setsid nohup tools/wait_and_measure.sh > /tmp/watch.log 2>&1 &
cd /root/repo
echo "$(date) watcher started"
while true; do
  # require an actual non-CPU device: if the axon plugin fails fast JAX
  # falls back to the CPU backend, which must NOT trigger the session
  if timeout 300 python -c "
import jax
d = jax.devices()
assert d and d[0].platform != 'cpu', d
print('probe saw', d[0])
" 2>/dev/null; then
    echo "$(date) tunnel UP — starting perf_session"
    break
  fi
  echo "$(date) tunnel still down; retrying in 120s"
  sleep 120
done
python tools/perf_session.py --timeout 2400 2>&1
echo "$(date) perf_session done rc=$?"
