#!/bin/bash
# Watch for the axon TPU tunnel to come back; warm the exec cache when it does.
# Writes status lines to /tmp/tpu_status.log. Safe to re-run (kills nothing).
cd /root/repo
for i in $(seq 1 200); do
  echo "[$(date +%H:%M:%S)] probe $i" >> /tmp/tpu_status.log
  if timeout 180 python - <<'EOF' >> /tmp/tpu_status.log 2>&1
import jax
print("devices:", jax.devices(), flush=True)
EOF
  then
    echo "[$(date +%H:%M:%S)] TUNNEL UP - warming caches" >> /tmp/tpu_status.log
    timeout 3600 python scripts/warm_cache.py >> /tmp/tpu_status.log 2>&1 \
      && echo "[$(date +%H:%M:%S)] warm D=256 done" >> /tmp/tpu_status.log
    echo "TPU_UP" > /tmp/tpu_status.flag
    exit 0
  fi
  sleep 90
done
echo "TPU_NEVER_UP" > /tmp/tpu_status.flag
