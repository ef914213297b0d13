#!/usr/bin/env bash
# Stereo and mono+stereo recipes (reference experiments/{stereo,mono+stereo}
# _experiments.sh on this framework).
set -e

DATA=${DATA:-./kitti_data}

# Stereo-only: no pose net needed (frame_ids [0] + stereo)
python train.py --data_path "$DATA" --model_name S_640x192 \
  --dataset kitti --split eigen_full --height 192 --width 640 \
  --frame_ids 0 --use_stereo --batch_size 12 --num_epochs 20

# Mono + stereo
python train.py --data_path "$DATA" --model_name MS_640x192 \
  --dataset kitti --split eigen_full --height 192 --width 640 \
  --frame_ids 0 -1 1 --use_stereo --batch_size 12 --num_epochs 20
