#!/bin/bash
python eval_multi_obj.py \
  --scan_folder=data/ScanNet/scans \
  --val_list=data/ScanNet/val_list.json \
  --checkpoint=checkpoints/checkpoint1099.pth \
  --output_dir=results/multi_scannet40
