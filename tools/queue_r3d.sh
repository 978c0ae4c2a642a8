#!/bin/bash
# Round-3 queue, part D: close the last open quality gap — on the two
# 32x32 configs the committed artifacts show rect fid_deep 5.1-5.4 /
# 7.5-8.0 vs the base@100 EMA anchor's 3.6 / 4.7, so the reference's
# claim holds there only via the SSIM-margin clause. This queue reruns
# both with the upgraded recipe (EMA teacher for pair synthesis, 4x
# pairs, 2.5x epochs) and commits artifacts per config as they land.
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
  git commit -m "${cfg} artifacts: EMA-teacher distillation, 4x pairs, longer schedule" --quiet
  stage "$cfg committed"
}

for cfg in cifar32q cifar32; do
  run_cfg "$cfg"
  rc=$?; stage "$cfg done rc=$rc"; [ $rc -ne 0 ] && exit $rc
done

stage "QUEUE DONE"
