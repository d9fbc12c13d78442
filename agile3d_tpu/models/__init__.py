from agile3d_tpu.models.backbone import init_backbone, backbone_forward
from agile3d_tpu.models.agile3d import (
    init_agile3d,
    forward_backbone,
    forward_mask,
)
from agile3d_tpu.models.criterion import criterion_forward, loss_weight_dict

__all__ = [
    "init_backbone",
    "backbone_forward",
    "init_agile3d",
    "forward_backbone",
    "forward_mask",
    "criterion_forward",
    "loss_weight_dict",
]
