#!/bin/bash
# Round-4 queue, stage A: the data-side Reflow coupling ablation, re-run
# under the v2 metric backbone + held-out n>=1000 references (the r3 rows
# in datapairs_cifar32q.jsonl were measured with the blur-blind v1
# backbone against training images, so they are not comparable).
#
# Arms: frac=0.0 (control) / 0.5 / 0.25 at 150 student epochs on the
# committed cifar32q EMA teacher, plus a base_teacher@100 anchor row —
# the VERDICT r3 #1 "done" criterion compares rect@<=4 against base@100
# fid_deep under ONE consistent metric.
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
echo $$ > /tmp/queue_r4a.pid   # bench.py SIGSTOPs queue workers via this
trap 'rm -f /tmp/queue_r4a.pid' EXIT

stage() { echo "=== $1 $(date)"; }
OUT=results/ablations/datapairs_cifar32q_r4.jsonl
mkdir -p results/ablations
if ! git ls-files --error-unmatch "$OUT" >/dev/null 2>&1; then
  rm -f "$OUT"
fi

if [ ! -f checkpoints/cifar32q/base_flow_ema_final.npz ]; then
  stage "retrain cifar32q base (checkpoints lost to VM reset)"
  python -m rectified_flow_vision_tpu.experiments.train_base \
    --config configs/config_cifar32q.yaml || exit $?
fi

stage "anchor + control arm frac=0.0"
python tools/ablate_datapairs.py --fractions 0.0 --epochs 150 \
  --anchor --out "$OUT" || exit $?
git add "$OUT"
git commit -m "datapairs ablation r4 (v2 backbone, held-out refs): anchor + frac=0.0" \
  --quiet -- "$OUT"

for frac in 0.5 0.25; do
  stage "ablation arm frac=$frac"
  python tools/ablate_datapairs.py --fractions "$frac" --epochs 150 \
    --out "$OUT" || exit $?
  git add "$OUT"
  git commit -m "datapairs ablation r4 (v2 backbone, held-out refs): arm frac=$frac" \
    --quiet -- "$OUT"
  stage "arm frac=$frac committed"
done

stage "QUEUE A DONE"
