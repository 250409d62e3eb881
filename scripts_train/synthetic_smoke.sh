#!/bin/bash
# CPU-runnable end-to-end smoke: synthetic dataset, 30 epochs.
K=${1:-16}; MODEL=${2:-sage}
JAX_PLATFORMS=${JAX_PLATFORMS:-} python train.py --dataset synthetic \
  --model $MODEL --hidden_layers 2 --hidden_dim 64 --nonlinear maxk \
  --maxk $K --dropout 0.2 --norm --w_lr 0.01 --epochs 30 --timing
