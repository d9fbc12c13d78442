"""Test-tree shim: the synthetic scene generator lives in the package
(agile3d_tpu/data/synthetic.py) because runtime surface (__graft_entry__,
bench.py, tools/) depends on it too."""

from agile3d_tpu.data.synthetic import make_scene, write_benchmark

__all__ = ["make_scene", "write_benchmark"]
