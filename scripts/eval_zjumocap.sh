#!/bin/sh
# Train + evaluate every ZJU-MoCap subject (reference scripts/eval_zjumocap.sh).
for sub in 377 386 387 392 393 394; do
  python train_net.py --cfg_file configs/inb/inb_${sub}.yaml "$@"
  python run.py --type evaluate --cfg_file configs/inb/inb_${sub}.yaml "$@"
done
