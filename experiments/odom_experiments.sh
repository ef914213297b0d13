#!/usr/bin/env bash
# KITTI odometry recipes (reference experiments/odom_experiments.sh on this
# framework). Requires the odometry-benchmark layout ("sequences/NN/image_2")
# from cvlibs.net/datasets/kitti/eval_odometry.php.
set -e

DATA=${DATA:-./kitti_data_odom}

# Standard mono odometry model
python train.py --data_path "$DATA" --model_name M_odom \
  --dataset kitti_odom --split odom --preset kitti_upstream

# Without ImageNet pretraining (longer schedule)
python train.py --data_path "$DATA" --model_name M_odom_no_pt \
  --dataset kitti_odom --split odom --preset kitti_upstream \
  --weights_init scratch --num_epochs 30

# Mono + stereo odometry model
python train.py --data_path "$DATA" --model_name MS_odom \
  --dataset kitti_odom --split odom --preset kitti_upstream --use_stereo

python train.py --data_path "$DATA" --model_name MS_odom_no_pt \
  --dataset kitti_odom --split odom --preset kitti_upstream --use_stereo \
  --weights_init scratch --num_epochs 30

# Evaluate: ATE / RE on sequences 09 and 10
python evaluate_pose.py --eval_split odom_9 --dataset kitti_odom \
  --data_path "$DATA" --load_weights_folder logs/M_odom/models/orbax
python evaluate_pose.py --eval_split odom_10 --dataset kitti_odom \
  --data_path "$DATA" --load_weights_folder logs/M_odom/models/orbax
