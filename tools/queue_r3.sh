#!/bin/bash
# Round-3 artifact queue: regenerate per-config artifacts with the tuned
# reflow recipe + fid_deep quality columns. Ordered fastest/highest-value
# first so a round cutoff still lands useful artifacts; each config's
# artifacts are committed as soon as its benchmark finishes.
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo

stage() { echo "=== $1 $(date)"; }

run_cfg() {
  local cfg=$1
  stage "$cfg train_base"
  python -m rectified_flow_vision_tpu.experiments.train_base --config configs/config_${cfg}.yaml || return $?
  stage "$cfg train_rectified"
  python -m rectified_flow_vision_tpu.experiments.train_rectified --config configs/config_${cfg}.yaml || return $?
  stage "$cfg benchmark"
  python -m rectified_flow_vision_tpu.experiments.benchmark --config configs/config_${cfg}.yaml || return $?
  git add results/${cfg} checkpoints/ 2>/dev/null
  git commit -m "${cfg} artifacts: tuned reflow recipe, fid_deep quality columns" --quiet
  stage "$cfg committed"
}

# cifar32q regenerated + committed 2026-08-17; remaining configs below.
for cfg in dit256 cifar32 imagenet64; do
  run_cfg "$cfg"
  rc=$?; stage "$cfg done rc=$rc"; [ $rc -ne 0 ] && exit $rc
done

stage "bench_train loaders"
timeout 1200 python tools/bench_train.py --mode loaders --epochs 3 2>&1 | grep -v WARNING
stage "bench_train mesh"
timeout 1800 python tools/bench_train.py --mode mesh --epochs 3 2>&1 | grep -v WARNING
stage "QUEUE DONE"
