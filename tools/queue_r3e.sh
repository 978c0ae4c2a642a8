#!/bin/bash
# Round-3 queue, part E: measure whether data-side Reflow couplings
# (data_pair_fraction — real corpus images paired with their ODE-inverted
# noise, Simple ReFlow arXiv:2410.07815) close the one remaining quality
# gap: on the 32x32 configs the base@100 EMA anchor still beats the
# distilled student on deep-feature FID (cifar32q: 3.62 vs 4.51).
#
# Paired ablation on cifar32q: identical fresh teacher, arms
# frac=0.0 (control, the committed recipe) vs frac=0.5, shortened to 150
# student epochs so both arms fit one session. Results appended (and
# committed) per arm to results/ablations/datapairs_cifar32q.jsonl.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
echo $$ > /tmp/queue_r3e.pid   # bench.py SIGSTOPs queue workers via this
trap 'rm -f /tmp/queue_r3e.pid' EXIT

stage() { echo "=== $1 $(date)"; }
OUT=results/ablations/datapairs_cifar32q.jsonl
mkdir -p results/ablations
# only wipe an UNTRACKED results file: committed arm rows must stay
# additive across re-runs (a tracked file's history is run evidence)
if ! git ls-files --error-unmatch "$OUT" >/dev/null 2>&1; then
  rm -f "$OUT"
fi

if [ ! -f checkpoints/cifar32q/base_flow_ema_final.npz ]; then
  stage "retrain cifar32q base (checkpoints lost to VM reset)"
  python -m rectified_flow_vision_tpu.experiments.train_base \
    --config configs/config_cifar32q.yaml || exit $?
fi

for frac in 0.0 0.5; do
  stage "ablation arm frac=$frac"
  python tools/ablate_datapairs.py --fractions "$frac" --epochs 150 \
    --out "$OUT" || exit $?
  git add "$OUT"
  git commit -m "datapairs ablation (cifar32q, 150ep): arm frac=$frac" \
    --quiet -- "$OUT"
  stage "arm frac=$frac committed"
done

stage "QUEUE DONE"
