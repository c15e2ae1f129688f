#!/bin/bash
# Round-4 TPU measurement, part 2 — runs after the warp-kernel hardware
# parity gate (benchmarks/warp_parity.py) passes and the Pallas banded
# warp becomes the TPU default:
#   1. bench.py under the new defaults (headline + aug-on + infer +
#      XLA-gather ablation self-captured at the end)
#   2. predict end-to-end: 512 images at 512^2 through the real CLI
#   3. serving tier: 16 concurrent batch-1 HTTP clients
# Usage: bash benchmarks/r4_measure_part2.sh [outdir] (default /tmp/r4_measure)
set -u
OUT=${1:-/tmp/r4_measure}
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

# 1. Headline bench under the r4 defaults (warp kernel ON on TPU).
run bench_default 2700 python bench.py

# 2. Predict end-to-end: 512 images at 512^2 through the real CLI
#    (pipelined decode || compute || save, data-parallel batching)
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
run predict_512 2700 python scripts/predict.py \
    --weights "$OUT/ckpt_run/weights/last" --source "$OUT/imgs/images" \
    --output "$OUT/preds" --img-size 512 --batch-size 8

# 3. Serving tier: concurrent batch-1 HTTP clients through unet-serve
run serve_512 1800 python benchmarks/serve_bench.py \
    --weights "$OUT/ckpt_run/weights/last" --img-size 512 \
    --clients 16 --requests 256 --max-batch 8

echo "=== PART2 DONE; summary tail:"; tail -30 "$OUT/summary.log"
