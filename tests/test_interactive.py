"""Interactive server: scene loading, cached backbone, per-click API."""

import os

import numpy as np
import pytest

from agile3d_tpu.config import Config, ModelConfig
from agile3d_tpu.data.ply import write_ply
from agile3d_tpu.interactive import (
    InteractiveDataLoader,
    InteractiveSegmentationServer,
)
from tests.synthetic import make_scene

CFG = Config(model=ModelConfig(max_clicks=32), buckets=(1024, 2048, 4096))


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("interactive"))
    rng = np.random.default_rng(0)
    for name in ("scene_alpha", "scene_beta"):
        d = os.path.join(root, name)
        os.makedirs(d)
        coords, colors, labels = make_scene(rng, n_points=1500, num_obj=2)
        fields = {
            "x": coords[:, 0], "y": coords[:, 1], "z": coords[:, 2],
            "R": colors[:, 0], "G": colors[:, 1], "B": colors[:, 2],
        }
        write_ply(os.path.join(d, "scan.ply"), fields)
        write_ply(os.path.join(d, "label.ply"),
                  {**fields, "label": labels})
    return root


def test_dataloader_scene_discovery(scene_dir):
    dl = InteractiveDataLoader(scene_dir, "tester")
    assert dl.scene_names == ["alpha", "beta"]
    assert dl.labels_full is not None
    assert dl.point_type == "pointcloud"
    dl.add_object("chair")
    dl.update_object("chair", np.ones(len(dl.coords), np.int8))
    assert dl.object_names == ["chair"]
    # objects persist across reloads
    dl2 = InteractiveDataLoader(scene_dir, "tester")
    assert dl2.object_names == ["chair"]


@pytest.mark.slow
def test_server_click_flow(scene_dir):
    dl = InteractiveDataLoader(scene_dir, "tester2")
    server = InteractiveSegmentationServer(dl, weights=None, cfg=CFG)
    assert server.n_valid > 100

    # click on object 1's ground-truth center
    labels_qv = server.sample.labels
    obj1 = np.nonzero(labels_qv == 1)[0]
    click_idx = {"0": [], "1": [int(obj1[0])]}
    click_time_idx = {"0": [], "1": [0]}
    pred_full, iou = server.get_next_click(click_idx, click_time_idx)
    assert pred_full.shape == dl.labels_full.shape
    assert iou is not None and 0 <= iou <= 1
    # clicked voxel override guarantees the click's own points match
    assert pred_full[server.sample.inverse_map == obj1[0]].max() == 1

    # session artifacts written
    assert os.path.exists(dl.record_path)
    assert len(os.listdir(dl.mask_folder)) == 1
    assert len(os.listdir(dl.click_folder)) == 1

    # nearest voxel lookup round-trips a known coordinate
    v = server.nearest_voxel(dl.coords[5])
    assert np.linalg.norm(
        server.sample.raw_coords[v]
        - (dl.coords[5] - dl.coords.min(0))) < 0.1

    # scene switching recomputes the cache
    name = server.next_scene()
    assert name == "beta"
    assert server.previous_scene() == "alpha"
