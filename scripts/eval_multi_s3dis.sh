#!/bin/bash
python eval_multi_obj.py \
  --scan_folder=data/S3DIS/scans \
  --val_list=data/S3DIS/val_list.json \
  --checkpoint=checkpoints/checkpoint1099.pth \
  --output_dir=results/multi_s3dis
