#!/bin/bash
K=${1:-32}; SEED=${2:-97}; MODEL=${3:-sage}
source "$(dirname "$0")/_require_npz.sh" flickr
python train.py --dataset flickr --model $MODEL --hidden_layers 3 \
  --hidden_dim 256 --nonlinear relu --seed $SEED \
  --dropout 0.2 --norm --selfloop --w_lr 0.001 --epochs 400
