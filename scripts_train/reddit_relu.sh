#!/bin/bash
K=${1:-32}; SEED=${2:-97}; MODEL=${3:-sage}
source "$(dirname "$0")/_require_npz.sh" reddit
python train.py --dataset reddit --model $MODEL --hidden_layers 4 \
  --hidden_dim 256 --nonlinear relu --seed $SEED \
  --dropout 0.5 --norm --w_lr 0.01 --epochs 3000
