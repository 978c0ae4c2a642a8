#!/bin/bash
# Round-3 queue, part B: resume after the dit256 reflow divergence fix
# (configs/config_dit256.yaml lr 2e-4 -> 1e-4, K=1). dit256 base + VAE
# checkpoints already exist, so only rectified + benchmark rerun for it;
# cifar32 / imagenet64 run all stages. Each config commits on finish.
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo

stage() { echo "=== $1 $(date)"; }

stage "dit256 train_rectified (resumed, fixed lr)"
python -m rectified_flow_vision_tpu.experiments.train_rectified --config configs/config_dit256.yaml || exit $?
stage "dit256 benchmark"
python -m rectified_flow_vision_tpu.experiments.benchmark --config configs/config_dit256.yaml || exit $?
git add results/dit256 checkpoints/ configs/config_dit256.yaml 2>/dev/null
git commit -m "dit256 artifacts: tuned reflow recipe (stabilized lr), fid_deep quality columns" --quiet
stage "dit256 committed"

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

for cfg in cifar32 imagenet64; do
  run_cfg "$cfg"
  rc=$?; stage "$cfg done rc=$rc"; [ $rc -ne 0 ] && exit $rc
done

stage "bench_train loaders"
timeout 1200 python tools/bench_train.py --mode loaders --epochs 3 2>&1 | grep -v WARNING
stage "bench_train mesh"
timeout 1800 python tools/bench_train.py --mode mesh --epochs 3 2>&1 | grep -v WARNING
stage "QUEUE DONE"
