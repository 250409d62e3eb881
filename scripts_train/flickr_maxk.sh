#!/bin/bash
# Flickr + MaxK recipe (reference scripts_train/flickr_maxk.sh:15-18:
# 3 layers, hidden 256, dropout 0.2, lr 0.001, 400 epochs, norm+selfloop).
# Usage: bash scripts_train/flickr_maxk.sh [maxk] [seed] [model]
K=${1:-32}; SEED=${2:-97}; MODEL=${3:-sage}
source "$(dirname "$0")/_require_npz.sh" flickr
python train.py --dataset flickr --model $MODEL --hidden_layers 3 \
  --hidden_dim 256 --nonlinear maxk --maxk $K --seed $SEED \
  --dropout 0.2 --norm --selfloop --w_lr 0.001 --epochs 400
