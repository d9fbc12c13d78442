from agile3d_tpu.parallel.mesh import make_mesh
from agile3d_tpu.parallel.train import collate_sharded, make_dp_train_step

__all__ = ["make_mesh", "collate_sharded", "make_dp_train_step"]
