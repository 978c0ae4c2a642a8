#!/bin/bash
# Round-4 queue, stage B: regenerate every config's committed artifacts
# under the round-4 methodology — v2 metric backbone (blur/noise-calibrated
# SynthNet), held-out n=1000 eval references, bootstrap FID CIs, perceptual
# precision AND recall columns, metric-disagreement disclosure in reports.
#
# Launched AFTER the stage-A ablation decision (config data_pair_fraction
# folded in or rejected). Ordered fastest/highest-value first so a round
# cutoff still lands consistent artifacts; commits per config.
#
# usage: tools/queue_r4b.sh [cfg ...]   (default: all five)
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
echo $$ > /tmp/queue_r4b.pid   # bench.py SIGSTOPs queue workers via this
trap 'rm -f /tmp/queue_r4b.pid' EXIT

stage() { echo "=== $1 $(date)"; }

cfg_file() {  # flagship has the bare config name
  if [ "$1" = flagship ]; then echo configs/config.yaml; else echo "configs/config_$1.yaml"; fi
}
res_dir() {
  if [ "$1" = flagship ]; then echo results; else echo "results/$1"; fi
}

run_cfg() {
  local cfg=$1 file; file=$(cfg_file "$cfg")
  # train_base skipped when its final checkpoint already exists (cifar32q
  # keeps its committed-teacher base; everything else retrains after the
  # VM reset wiped the .npz checkpoints)
  local ckpt_dir
  ckpt_dir=$(python - "$file" <<'EOF'
import sys
from rectified_flow_vision_tpu.config import load_config, repo_root
print(repo_root() / load_config(sys.argv[1]).paths.checkpoints)
EOF
)
  if [ ! -f "$ckpt_dir/base_flow_final.npz" ]; then
    stage "$cfg train_base"
    python -m rectified_flow_vision_tpu.experiments.train_base --config "$file" || return $?
  else
    stage "$cfg train_base SKIPPED (checkpoint exists)"
  fi
  # train_rectified likewise skipped when its final checkpoint exists, so a
  # session cutoff between training and benchmark resumes at the benchmark
  if [ ! -f "$ckpt_dir/rectified_flow_k1_final.npz" ]; then
    stage "$cfg train_rectified"
    python -m rectified_flow_vision_tpu.experiments.train_rectified --config "$file" || return $?
  else
    stage "$cfg train_rectified SKIPPED (checkpoint exists)"
  fi
  stage "$cfg benchmark"
  python -m rectified_flow_vision_tpu.experiments.benchmark --config "$file" || return $?
  git add "$(res_dir "$cfg")" checkpoints/ 2>/dev/null
  git commit -m "$cfg artifacts: r4 methodology (v2 backbone, held-out n=1000 refs, FID CIs, precision+recall)" --quiet
  stage "$cfg committed"
}

CFGS="${*:-cifar32q flagship cifar32 dit256 imagenet64}"
for cfg in $CFGS; do
  run_cfg "$cfg"
  rc=$?; stage "$cfg done rc=$rc"; [ $rc -ne 0 ] && exit $rc
done

stage "QUEUE B DONE"
