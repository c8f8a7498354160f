#!/bin/bash
# Poll the axon TPU tunnel until it answers a trivial dispatch.
# Writes status lines to /tmp/tpu_poll.log; on success writes OK to
# /tmp/tpu_status and exits so a real benchmark can take the (single)
# client slot. One attempt per cycle, long gaps, to avoid wedging the
# chip lease with repeated mid-init kills (see CLAUDE.md gotchas).
LOG=/tmp/tpu_poll.log
STATUS=/tmp/tpu_status
rm -f "$STATUS"
while true; do
  echo "$(date -u +%H:%M:%S) probing" >> "$LOG"
  if timeout 420 python - <<'EOF' >> "$LOG" 2>&1
import jax, jax.numpy as jnp, time
t0 = time.time()
x = jnp.ones((128, 128))
y = float((x @ x).sum())
print(f"  alive: {y} in {time.time()-t0:.1f}s backend={jax.default_backend()}", flush=True)
EOF
  then
    echo "$(date -u +%H:%M:%S) TPU ALIVE" >> "$LOG"
    echo OK > "$STATUS"
    exit 0
  fi
  echo "$(date -u +%H:%M:%S) dead, sleeping 900s" >> "$LOG"
  sleep 900
done
