#!/bin/bash
python eval_multi_obj.py \
  --scan_folder=data/KITTI360/scans \
  --val_list=data/KITTI360/val_list.json \
  --checkpoint=checkpoints/checkpoint1099.pth \
  --output_dir=results/multi_kitti360
