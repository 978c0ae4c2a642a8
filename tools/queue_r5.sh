#!/bin/bash
# Round-5 queue: land cifar32, dit256, imagenet64 under the r4 evidence
# methodology — v2 metric backbone, held-out n=1000 eval references,
# bootstrap FID CIs, perceptual precision AND recall with CIs, tie-aware
# metric-disagreement disclosure, anchor-health judging (VERDICT r5 ask #1).
#
# Differences from queue_r4b.sh, per the round-4 review:
#  * ATOMIC benchmark stage (ask #8): the benchmark writes into a staging
#    dir via RFV_RESULTS_DIR; results move into the live dir and commit in
#    one step, so a round cutoff mid-benchmark leaves committed state
#    untouched.
#  * train_rectified is FORCED whenever train_base just ran or the base
#    checkpoint is newer than the rectified one (ADVICE r4 medium: never
#    benchmark a stale student against a freshly retrained teacher).
#  * tools/gen_status.py runs before every commit (ask #4): the committed
#    STATUS.md always byte-matches the artifacts, enforced by
#    tests/test_status_generated.py.
#
# usage: tools/queue_r5.sh [cfg ...]   (default: dit256 cifar32 imagenet64)
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
echo $$ > /tmp/queue_r5.pid   # bench.py SIGSTOPs queue workers via this
trap 'rm -f /tmp/queue_r5.pid' EXIT

stage() { echo "=== $1 $(date)"; }

# Stall watchdog: the axon TPU tunnel can drop an execute-RPC response,
# leaving a stage futex-waiting forever (observed r5: train_base hung
# after writing the compile cache). Every stage normally logs at least
# once per WATCH_STALL_SECS; if the queue log stops growing for that
# long while the stage is alive, kill it (rc 99) and let stage_retry
# rerun it once against the now-warm compile cache.
QUEUE_LOG="${QUEUE_LOG:-/tmp/queue_r5.log}"
WATCH_STALL_SECS="${WATCH_STALL_SECS:-600}"
watched() {
  "$@" &
  local pid=$! stall=0 lastsz=-1 sz
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    sz=$(stat -c %s "$QUEUE_LOG" 2>/dev/null || echo 0)
    if [ "$sz" = "$lastsz" ]; then
      stall=$((stall + 30))
      if [ "$stall" -ge "$WATCH_STALL_SECS" ]; then
        echo "=== WATCHDOG: no output for ${stall}s, killing: $*"
        kill "$pid" 2>/dev/null; sleep 5
        kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
        return 99
      fi
    else
      stall=0; lastsz=$sz
    fi
  done
  wait "$pid"
}
stage_retry() {
  watched "$@"; local rc=$?
  if [ $rc -eq 99 ]; then
    echo "=== WATCHDOG: retrying once: $*"
    watched "$@"; rc=$?
  fi
  return $rc
}

cfg_file() {  # flagship has the bare config name
  if [ "$1" = flagship ]; then echo configs/config.yaml; else echo "configs/config_$1.yaml"; fi
}
res_dir() {
  if [ "$1" = flagship ]; then echo results; else echo "results/$1"; fi
}

run_cfg() {
  local cfg=$1 file; file=$(cfg_file "$cfg")
  local ckpt_dir
  ckpt_dir=$(python - "$file" <<'EOF'
import sys
from rectified_flow_vision_tpu.config import load_config, repo_root
print(repo_root() / load_config(sys.argv[1]).paths.checkpoints)
EOF
)
  local base_ran=0
  if [ ! -f "$ckpt_dir/base_flow_final.npz" ]; then
    stage "$cfg train_base"
    stage_retry python -m rectified_flow_vision_tpu.experiments.train_base --config "$file" || return $?
    base_ran=1
  else
    stage "$cfg train_base SKIPPED (checkpoint exists)"
  fi
  if [ $base_ran -eq 0 ] && [ -f "$ckpt_dir/rectified_flow_k1_final.npz" ] \
     && [ ! "$ckpt_dir/base_flow_final.npz" -nt "$ckpt_dir/rectified_flow_k1_final.npz" ]; then
    stage "$cfg train_rectified SKIPPED (student newer than teacher)"
  else
    stage "$cfg train_rectified (teacher fresher than student, or student missing)"
    stage_retry python -m rectified_flow_vision_tpu.experiments.train_rectified --config "$file" || return $?
  fi
  local rdir stagedir
  rdir=$(res_dir "$cfg"); stagedir=$(mktemp -d /tmp/rfv_stage_XXXXXX)
  stage "$cfg benchmark (staging to $stagedir)"
  if ! stage_retry env RFV_RESULTS_DIR="$stagedir" python -m rectified_flow_vision_tpu.experiments.benchmark --config "$file"; then
    rm -rf "$stagedir"; return 1
  fi
  mkdir -p "$rdir"
  cp -a "$stagedir"/. "$rdir"/ && rm -rf "$stagedir"
  python tools/gen_status.py
  git add "$rdir" checkpoints/ STATUS.md 2>/dev/null
  git commit -m "$cfg artifacts: r4 methodology (v2 backbone, held-out n=1000 refs, FID+precision CIs, anchor-health verdicts)" --quiet
  stage "$cfg committed"
}

CFGS="${*:-dit256 cifar32 imagenet64}"
for cfg in $CFGS; do
  run_cfg "$cfg"
  rc=$?; stage "$cfg done rc=$rc"; [ $rc -ne 0 ] && exit $rc
done

stage "QUEUE R5 DONE"
