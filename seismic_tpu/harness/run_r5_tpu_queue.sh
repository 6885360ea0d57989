#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 asks): drain the 8.8M +
# lean-mem stages first (ask #3), then the 1M two-pass adaptive rungs
# (ask #2), the refreshed sharded artifact (ask #7), and the headline
# bench (ask #4).
#
# ONE TPU process at a time (axon quirk: concurrent TPU clients contend
# on the tunnel). Each stage is timeout-bounded; a dead tunnel makes the
# tunnel check fail fast and the queue re-polls instead of wedging.
#
# Usage: bash seismic_tpu/harness/run_r5_tpu_queue.sh [stage ...]
#   stages default to: mem bench
#   c100k = rebuild_r3_cache 100k (dataset/index/GT/narrow dirs/knn16)
#   c1m   = rebuild_r3_cache 1m (dataset/index/GT/narrow dirs/knn16)
#   b88   = build_88m           (8.8M dataset+index build, CPU-heavy)
#   j     = probe_r3j 512       (8.8M rung -> SCALE88_BENCH, incl. GT)
#   mem   = bench_mem --block   (fast-and-lean artifact -> MEM_BENCH)
#   r5b   = probe_r5b           (100K headline levers -> BENCH_STAGE_r5)
#   r5c   = probe_r5c           (1M bar rungs -> SCALE_BENCH rungs_r5_bar)
#   shard = bench_sharded --grouped (production-path sharded artifact)
#   bench = bench.py            (headline protocol, at-bar selection)
set -u
cd "$(dirname "$0")/../.."
LOGDIR=/tmp/r5queue
mkdir -p "$LOGDIR"

# serialize queue instances machine-wide (one TPU client at a time);
# a second invocation blocks here until the first finishes. (The lock
# path predates this script — kept so stale runners still exclude us.)
mkdir -p /tmp/r4queue
exec 9>/tmp/r4queue/tpu.lock
flock 9

log() { echo "[queue $(date +%H:%M:%S)] $*" | tee -a "$LOGDIR/queue.log"; }

wait_for_tunnel() {
  # jax.devices() hangs machine-wide when the axon tunnel is down; bound
  # the probe and poll until it answers. Require a round-tripped
  # computation — devices() can list the chip while compute hangs.
  while true; do
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

STAGES=${*:-mem bench}
for s in $STAGES; do
  case $s in b88) ;; *) wait_for_tunnel ;; esac
  case $s in
    c100k) run_stage c100k 20000 python -m seismic_tpu.harness.rebuild_r3_cache 100k ;;
    c1m)   run_stage c1m 20000  python -m seismic_tpu.harness.rebuild_r3_cache 1m ;;
    b88)   run_stage b88 28000  env JAX_PLATFORMS=cpu python -m seismic_tpu.harness.build_88m ;;
    j)     run_stage r3j 12000  python -m seismic_tpu.harness.probe_r3j 512 ;;
    mem)   run_stage mem 7200   python -m seismic_tpu.harness.bench_mem --block --batch 4096 ;;
    r5b)   run_stage r5b 9000   python -m seismic_tpu.harness.probe_r5b ;;
    r5c)   run_stage r5c 10000  python -m seismic_tpu.harness.probe_r5c ;;
    r5b_grid2) run_stage r5b_grid2 5000 python -m seismic_tpu.harness.probe_r5b grid2 ;;
    r5b_knn)   run_stage r5b_knn   5000 python -m seismic_tpu.harness.probe_r5b knn ;;
    r5b_b1)    run_stage r5b_b1    5000 python -m seismic_tpu.harness.probe_r5b b1 ;;
    r5b_2pass) run_stage r5b_2pass 5000 python -m seismic_tpu.harness.probe_r5b 2pass ;;
    r5b_csub4) run_stage r5b_csub4 5000 python -m seismic_tpu.harness.probe_r5b csub4 ;;
    r5b_pdt)   run_stage r5b_pdt   5000 python -m seismic_tpu.harness.probe_r5b pdt ;;
    r5b_m32)   run_stage r5b_m32   5000 python -m seismic_tpu.harness.probe_r5b m32 ;;
    r5b_seg)   run_stage r5b_seg   5000 python -m seismic_tpu.harness.probe_r5b seg ;;
    r5c_lever) run_stage r5c_lever 6000 python -m seismic_tpu.harness.probe_r5c 1024 lever ;;
    r5c_deep)  run_stage r5c_deep  6000 python -m seismic_tpu.harness.probe_r5c 1024 deep ;;
    r5c_bar)   run_stage r5c_bar   6000 python -m seismic_tpu.harness.probe_r5c 1024 bar ;;
    r5c_b4k)   run_stage r5c_b4k   6000 python -m seismic_tpu.harness.probe_r5c 1024 b4k ;;
    r5c_lean16) run_stage r5c_lean16 6000 env R5C_FWD16=1 python -m seismic_tpu.harness.probe_r5c 1024 lean16 ;;
    r5c_b4kf)  run_stage r5c_b4kf  6000 env R5C_FWD16=1 python -m seismic_tpu.harness.probe_r5c 1024 b4kf ;;
    shard) run_stage shard 7200 python -m seismic_tpu.harness.bench_sharded --grouped ;;
    bench) run_stage bench 5400 python bench.py ;;
    *)     log "unknown stage $s" ;;
  esac
done
log "queue complete"
