#!/bin/bash
python eval_single_obj.py \
  --dataset=kitti360 \
  --scan_folder=data/KITTI360/scans \
  --val_list=data/KITTI360/object_list.npy \
  --val_list_classes=data/KITTI360/object_classes.txt \
  --checkpoint=checkpoints/checkpoint1099.pth \
  --output_dir=results/single_kitti360
