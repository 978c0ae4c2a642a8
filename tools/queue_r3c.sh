#!/bin/bash
# Round-3 queue, part C: resume after cifar32 landed. Remaining work:
# imagenet64 full regen (tuned recipe + fid_deep columns), then the
# loaders and mesh bench_train A/Bs whose numbers go into docs/DESIGN.md.
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo

stage() { echo "=== $1 $(date)"; }

stage "imagenet64 train_base"
python -m rectified_flow_vision_tpu.experiments.train_base --config configs/config_imagenet64.yaml || exit $?
stage "imagenet64 train_rectified"
python -m rectified_flow_vision_tpu.experiments.train_rectified --config configs/config_imagenet64.yaml || exit $?
stage "imagenet64 benchmark"
python -m rectified_flow_vision_tpu.experiments.benchmark --config configs/config_imagenet64.yaml || exit $?
git add results/imagenet64 checkpoints/ 2>/dev/null
git commit -m "imagenet64 artifacts: tuned reflow recipe, fid_deep quality columns" --quiet
stage "imagenet64 committed"

stage "bench_train loaders"
timeout 1200 python tools/bench_train.py --mode loaders --epochs 3 2>&1 | grep -v WARNING
stage "bench_train mesh"
timeout 1800 python tools/bench_train.py --mode mesh --epochs 3 2>&1 | grep -v WARNING
stage "QUEUE DONE"
