from agile3d_tpu.interactive.dataloader import InteractiveDataLoader
from agile3d_tpu.interactive.server import InteractiveSegmentationServer

__all__ = ["InteractiveDataLoader", "InteractiveSegmentationServer"]
