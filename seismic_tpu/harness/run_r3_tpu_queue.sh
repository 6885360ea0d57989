#!/bin/bash
# Round-3 TPU measurement queue. Runs every staged probe sequentially,
# ONE TPU process at a time (axon quirk: concurrent TPU clients contend
# on the tunnel). Each stage is timeout-bounded; a dead tunnel makes the
# tunnel check fail fast and the queue re-polls instead of wedging.
#
# Usage: bash seismic_tpu/harness/run_r3_tpu_queue.sh [stage ...]
#   stages default to: c100k g c1m h k mem j bench
#   c100k = rebuild_r3_cache 100k (dataset/index/GT/hash dir/knn after a
#           VM reset wiped .bench_cache)
#   c1m   = rebuild_r3_cache 1m
#   g     = probe_r3g  (100K hashed tiles: qc x rescore grid, stages, B=16K)
#   h     = probe_r3h  (1M hashed tiles: the recall-at-scale experiment)
#   k     = probe_r3k  (1M block-summary pooling: lean + block gating)
#   mem   = bench_mem --block (fast-and-lean artifact)
#   j     = probe_r3j  (8.8M block-summary rung, incl. on-device GT)
#   bench = bench.py   (BENCH headline protocol)
set -u
cd "$(dirname "$0")/../.."
LOGDIR=/tmp/r3queue
mkdir -p "$LOGDIR"

log() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOGDIR/queue.log"; }

wait_for_tunnel() {
  # jax.devices() hangs machine-wide when the axon tunnel is down; bound
  # the probe and poll until it answers.
  while true; do
    # devices() can list the chip while compute hangs (yesterday's
    # outage) — require an actual round-tripped computation.
    if timeout 420 python -c "
import jax, jax.numpy as jnp, numpy as np
assert jax.devices()[0].platform != 'cpu'
x = np.asarray(jnp.arange(8.0).sum())
assert float(x) == 28.0, x
print('tunnel compute ok')" >>"$LOGDIR/tunnel.log" 2>&1; then
      log "tunnel up"
      return 0
    fi
    log "tunnel down; sleeping 600s"
    sleep 600
  done
}

run_stage() {
  name=$1; bound=$2; shift 2
  log "stage $name: START ($*)"
  if timeout "$bound" "$@" >"$LOGDIR/$name.log" 2>&1; then
    log "stage $name: OK"
  else
    log "stage $name: FAILED rc=$? (see $LOGDIR/$name.log)"
  fi
}

STAGES=${*:-c100k g c1m h k mem j bench}
for s in $STAGES; do
  wait_for_tunnel
  case $s in
    c100k) run_stage c100k 12000 python -m seismic_tpu.harness.rebuild_r3_cache 100k ;;
    c1m)   run_stage c1m 20000  python -m seismic_tpu.harness.rebuild_r3_cache 1m ;;
    o)     run_stage r3o 7200   python -m seismic_tpu.harness.probe_r3o 512 768 ;;
    q)     run_stage r3q 7200   python -m seismic_tpu.harness.probe_r3q 512 1024 ;;
    g)     run_stage r3g 7200   python -m seismic_tpu.harness.probe_r3g ;;
    h)     run_stage r3h 5400   python -m seismic_tpu.harness.probe_r3h ;;
    k)     run_stage r3k 5400   python -m seismic_tpu.harness.probe_r3k 512 ;;
    mem)   run_stage mem 5400   python -m seismic_tpu.harness.bench_mem --block ;;
    j)     run_stage r3j 9000   python -m seismic_tpu.harness.probe_r3j 512 ;;
    bench) run_stage bench 5400 python bench.py ;;
    *)     log "unknown stage $s" ;;
  esac
done
log "queue complete"
