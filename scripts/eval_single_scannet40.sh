#!/bin/bash
python eval_single_obj.py \
  --dataset=scannet40 \
  --scan_folder=data/ScanNet/scans \
  --val_list=data/ScanNet/object_list.npy \
  --val_list_classes=data/ScanNet/object_classes.txt \
  --checkpoint=checkpoints/checkpoint1099.pth \
  --output_dir=results/single_scannet40
