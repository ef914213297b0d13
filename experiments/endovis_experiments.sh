#!/usr/bin/env bash
# Canonical fork training recipes (the reference's experiments/*.sh
# equivalents, adapted to this framework's CLI; flag surface is identical).
set -e

DATA=${DATA:-./data}

# Default endovis phantom run: 192x192, batch 16, ResNet-18, 10 epochs
# (options.py:59-66,127-138 + train.py:32-33 lr=1e-4, sampling=3)
python train.py --data_path "$DATA" --model_name endovis_mono \
  --dataset endovis --split endovis --height 192 --width 192 \
  --batch_size 16 --learning_rate 1e-4 --sampling_frequency 3 \
  --num_epochs 10

# With the semi-supervised GAN prior (frozen generator + SLlog term)
python train.py --data_path "$DATA" --model_name endovis_gan_prior \
  --pre_trained_generator \
  --generator_weights saved_models/3cGAN-ex-vivo-G_AB-50ep.pth \
  --height 192 --width 192 --batch_size 16 --learning_rate 1e-4 \
  --sampling_frequency 3

# PoseCNN pose network ablation
python train.py --data_path "$DATA" --model_name endovis_posecnn \
  --pose_model_type posecnn --height 192 --width 192 --batch_size 16

# W&B random sweep over lr / sampling frequency (train.py:38-48)
python train.py --data_path "$DATA" --model_name endovis_sweep \
  --wandb --wandb_sweep
