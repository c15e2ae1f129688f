#!/bin/bash
# Round-5 TPU measurement campaign — runs after bench.py (which
# captures the headline + aug-on + b16/b32-retry + XLA-gather ablation
# on its own):
#   1. 1-epoch flagship-shape checkpoint for the inference tiers
#   2. predict end-to-end: 516 images at 512^2 through the real CLI,
#      now with the per-stage timing table (VERDICT r4 #1)
#   3. serving tier: concurrency sweep 16/32/64 clients against one
#      warm server (VERDICT r4 #5)
#   4. dress rehearsal: the SHIPPED configs/lung_tumor.yaml to
#      convergence on the hardened 512^2 synthetic corpus
#      (VERDICT r4 #7) — longest, runs last
# Usage: bash benchmarks/r5_measure.sh [outdir] (default /tmp/r5_measure)
set -u
OUT=${1:-/tmp/r5_measure}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name: $* (timeout ${t}s)" | tee -a "$OUT/summary.log"
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  local rc=$?
  echo "=== $name rc=$rc" | tee -a "$OUT/summary.log"
  tail -3 "$OUT/$name.out" | tee -a "$OUT/summary.log"
  grep -E '^\{' "$OUT/$name.err" | tail -2 >> "$OUT/summary.log" || true
  if [ "$rc" -eq 124 ]; then sleep 600; else sleep 20; fi
}

# 1. Flagship-shape checkpoint (1 epoch, aug off, b8) for predict/serve
if [ ! -f "$OUT/imgs/images/.done" ]; then
  run export_pngs 1200 python scripts/export_synthetic.py \
      --output "$OUT/imgs" --volumes 86 --slices 6 --img-size 512
  touch "$OUT/imgs/images/.done"
fi
if [ ! -d "$OUT/ckpt_run" ]; then
  cat > "$OUT/pred_train.yaml" <<'EOF'
model: {type: attention_unet, n_channels: 1, n_classes: 2, bilinear: true,
        base_features: 64, deep_supervision: false}
data: {root: /nonexistent, img_size: 512, val_ratio: 0.2, batch_size: 8,
       num_workers: 2}
train: {epochs: 1, lr: 0.00005, weight_decay: 0.0001, grad_clip: 1.0,
        accumulation_steps: 1}
scheduler: {type: cosine_annealing, min_lr: 0.000001}
ema: {enabled: false}
early_stopping: {enabled: false, monitor: class_dice.tumor, mode: max}
loss: {type: dice_bce, balanced_class_weight: 0.5, ce_weight: 1.0,
       dice_weight: 1.0}
augmentation: {enabled: false}
output: {save_dir: OUTDIR, experiment_name: ckpt_run, save_last: true,
         save_best: true}
seed: 42
device: ''
tpu: {compute_dtype: bfloat16, data_parallel: 1}
EOF
  sed -i "s#OUTDIR#$OUT#" "$OUT/pred_train.yaml"
  run ckpt_train 2700 python scripts/train.py --config "$OUT/pred_train.yaml" \
      --synthetic
fi

# 2. Predict end-to-end with the per-stage attribution table
run predict_512 2700 python scripts/predict.py \
    --weights "$OUT/ckpt_run/weights/last" --source "$OUT/imgs/images" \
    --output "$OUT/preds" --img-size 512 --batch-size 8

# 3. Serving tier: concurrency sweep against one warm server
run serve_sweep 2700 python benchmarks/serve_bench.py \
    --weights "$OUT/ckpt_run/weights/last" --img-size 512 \
    --sweep 16,32,64 --requests 256 --max-batch 8

# 4. Dress rehearsal: shipped flagship config to convergence
#    (warmup_cosine, early stopping patience 30, aug on, b4x8 accum)
run dress_rehearsal 7200 python scripts/train.py \
    --config configs/lung_tumor.yaml --synthetic \
    --synthetic-volumes 40 --synthetic-slices 16 \
    --name dress_r5 --project "$OUT/runs"

echo "=== R5 MEASURE DONE; summary tail:"; tail -40 "$OUT/summary.log"
