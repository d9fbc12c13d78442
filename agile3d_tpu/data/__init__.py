from agile3d_tpu.data.ply import read_ply, write_ply
from agile3d_tpu.data.datasets import (
    InterMultiObjDataset,
    InterSingleObjDataset,
    SceneBatch,
    build_dataset,
    collate_scenes,
)

__all__ = [
    "read_ply",
    "write_ply",
    "InterMultiObjDataset",
    "InterSingleObjDataset",
    "SceneBatch",
    "build_dataset",
    "collate_scenes",
]
