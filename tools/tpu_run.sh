#!/bin/bash
# Serial TPU runner: the axon tunnel is exclusive and needs cooldown after
# a client exits; retry until the backend registers.
set -u
for attempt in $(seq 1 12); do
  PYTHONPATH=/root/repo:${PYTHONPATH:-} python -u "$@"
  rc=$?
  if [ $rc -eq 0 ]; then exit 0; fi
  echo "[tpu_run] attempt $attempt rc=$rc; retrying in 15s" >&2
  sleep 15
done
exit 1
