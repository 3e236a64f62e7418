#!/bin/sh
# Train + evaluate every MonoCap subject (reference scripts/eval_monocap.sh).
for sub in lan marc olek vlad; do
  python train_net.py --cfg_file configs/inb/inb_${sub}.yaml "$@"
  python run.py --type evaluate --cfg_file configs/inb/inb_${sub}.yaml "$@"
done
