#!/usr/bin/env bash
# Mono+stereo training recipes, mirroring the reference's
# experiments/mono+stereo_experiments.sh on this framework's CLI
# (kitti_upstream preset = upstream monodepth2 defaults: eigen_zhou,
# 640x192, batch 12, depth [0.1, 100], StepLR 15).
set -e

DATA=${DATA:-./kitti_data}
COMMON=(--preset kitti_upstream --data_path "$DATA" --use_stereo
        --frame_ids 0 -1 1)

# Our standard mono+stereo model
python train.py "${COMMON[@]}" --model_name MS_640x192

# Our low resolution mono+stereo model
python train.py "${COMMON[@]}" --model_name MS_416x128 \
  --height 128 --width 416

# Our high resolution mono+stereo model (finetune from the standard run)
python train.py "${COMMON[@]}" --model_name MS_1024x320 \
  --height 320 --width 1024 \
  --load_weights_folder "$HOME/tmp/MS_640x192/models/orbax" \
  --num_epochs 5 --learning_rate 1e-5

# Our standard mono+stereo model w/o pretraining
python train.py "${COMMON[@]}" --model_name MS_640x192_no_pt \
  --weights_init scratch --num_epochs 30

# Baseline mono+stereo model (our contributions turned off)
python train.py "${COMMON[@]}" --model_name MS_640x192_baseline \
  --v1_multiscale --disable_automasking --avg_reprojection

# Mono+stereo without full-res multiscale
python train.py "${COMMON[@]}" --model_name MS_640x192_no_full_res_ms \
  --v1_multiscale

# Mono+stereo without automasking
python train.py "${COMMON[@]}" --model_name MS_640x192_no_automasking \
  --disable_automasking

# Mono+stereo without min reproj
python train.py "${COMMON[@]}" --model_name MS_640x192_no_min_reproj \
  --avg_reprojection
