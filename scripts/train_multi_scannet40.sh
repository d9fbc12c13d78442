#!/bin/bash
# Multi-object iterative training on ScanNet40 (reference
# scripts/train_multi_scannet40.sh bindings).
python main.py \
  --dataset_mode=multi_obj \
  --scan_folder=data/ScanNet/scans \
  --train_list=data/ScanNet/train_list.json \
  --val_list=data/ScanNet/val_list.json \
  --output_dir=output \
  --job_name=train_multi_scannet40
