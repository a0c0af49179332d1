#!/bin/bash
# Serial TPU runner: the axon tunnel is exclusive and needs cooldown after
# a client exits; retry until the backend registers.
#
# Persistent compilation cache: remote Mosaic/XLA compiles cost 30-120s
# per program on this tunnel; the on-disk cache makes second runs skip
# them (VERDICT r1 item 7). Override JAX_COMPILATION_CACHE_DIR to move it.
set -u
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="${JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS:-2}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
for attempt in $(seq 1 12); do
  PYTHONPATH=/root/repo:${PYTHONPATH:-} python -u "$@"
  rc=$?
  if [ $rc -eq 0 ]; then exit 0; fi
  echo "[tpu_run] attempt $attempt rc=$rc; retrying in 15s" >&2
  sleep 15
done
exit 1
