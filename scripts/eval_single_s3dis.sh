#!/bin/bash
python eval_single_obj.py \
  --dataset=s3dis \
  --scan_folder=data/S3DIS/scans \
  --val_list=data/S3DIS/object_list.npy \
  --val_list_classes=data/S3DIS/object_classes.txt \
  --checkpoint=checkpoints/checkpoint1099.pth \
  --output_dir=results/single_s3dis
