#!/bin/bash
# Round-4 TPU measurement sequence (VERDICT r3 items 1-4). Run when the
# TPU relay is up; strictly sequential (one TPU process at a time).
# Usage: bash benchmarks/r4_measure.sh [outdir]   (default /tmp/r4_measure)
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
  # settle between TPU processes: a timeout-killed client exits with
  # dispatched work in flight, which can wedge the remote worker for
  # 5-15 min (verify SKILL.md); don't let one bad step poison the rest
  if [ "$rc" -eq 124 ]; then sleep 600; else sleep 20; fi
}

# 1. Baseline bench (train, train-aug, infer details on stderr)
run bench_base 2700 python bench.py

# 2. Pallas banded warp ablation (changes the train-aug figure),
#    plus the kernel-level aug breakdown on both paths
UNET_TPU_PALLAS_WARP=1 run bench_warp 2700 python bench.py
run aug_xla 1800 python benchmarks/aug_bench.py
UNET_TPU_PALLAS_WARP=1 run aug_pallas 1800 python benchmarks/aug_bench.py
# tiled-gather fallback variant: the data point that matters if Mosaic
# rejects the full-width (8, W) dynamic_gather form of the warp kernel
UNET_TPU_PALLAS_WARP=1 UNET_TPU_WARP_TILED_GATHER=1 \
  run aug_pallas_tiled 1800 python benchmarks/aug_bench.py

# 3. Whole-level s2d ablation (changes train + infer figures)
UNET_TPU_S2D_LEVEL=1 run bench_s2d 2700 python bench.py

# 3b. Combined ablation — the configuration that would ship if both
#     opt-ins win individually (interactions are possible: both change
#     the level-0/512^2 memory traffic pattern)
UNET_TPU_PALLAS_WARP=1 UNET_TPU_S2D_LEVEL=1 run bench_both 2700 python bench.py

# 4. Predict end-to-end: 512 images at 512^2 through the real CLI
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

# 5. Serving tier: concurrent batch-1 HTTP clients through unet-serve
#    (micro-batching should aggregate them into near-max-batch device
#    dispatches; number includes HTTP + PNG decode + batching latency)
run serve_512 1800 python benchmarks/serve_bench.py \
    --weights "$OUT/ckpt_run/weights/last" --img-size 512 \
    --clients 16 --requests 256 --max-batch 8

echo "=== DONE; summary:"; cat "$OUT/summary.log"
