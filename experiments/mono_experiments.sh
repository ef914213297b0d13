#!/usr/bin/env bash
# Upstream monodepth2 KITTI recipes (reference experiments/mono_experiments.sh
# configurations on this framework).
set -e

DATA=${DATA:-./kitti_data}

# Main monocular model: 640x192
python train.py --data_path "$DATA" --model_name M_640x192 \
  --dataset kitti --split eigen_zhou --height 192 --width 640 \
  --batch_size 12 --num_epochs 20 --min_depth 0.1 --max_depth 100

# Low-res and high-res variants
python train.py --data_path "$DATA" --model_name M_416x128 \
  --dataset kitti --split eigen_zhou --height 128 --width 416 \
  --batch_size 12 --num_epochs 20

python train.py --data_path "$DATA" --model_name M_1024x320 \
  --dataset kitti --split eigen_zhou --height 320 --width 1024 \
  --batch_size 4 --num_epochs 20

# Ablations
python train.py --data_path "$DATA" --model_name M_no_automasking \
  --dataset kitti --split eigen_zhou --height 192 --width 640 \
  --disable_automasking
python train.py --data_path "$DATA" --model_name M_no_ssim \
  --dataset kitti --split eigen_zhou --height 192 --width 640 --no_ssim
python train.py --data_path "$DATA" --model_name M_v1_multiscale \
  --dataset kitti --split eigen_zhou --height 192 --width 640 \
  --v1_multiscale

# Odometry model
python train.py --data_path "$DATA" --model_name M_odom \
  --dataset kitti_odom --split odom --height 192 --width 640 \
  --frame_ids 0 -1 1
