"""Interactive annotation model server.

TPU-native replacement for the model side of the reference annotation tool
(reference interactive_tool/interactive_segmentation_user.py:11-286): per
scene it quantizes once, runs the backbone ONCE, and then serves
``get_next_click`` — the <50 ms-target per-click hot path — taking the
reference's dict-of-lists click format so the Open3D GUI (or any web
viewer) stays a thin client.

Session artifacts match the reference: per-click ``iou_record.csv`` lines
plus mask/click .npy dumps (interactive_segmentation_user.py:92-108).
"""

from __future__ import annotations

import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from agile3d_tpu.config import Config
from agile3d_tpu.data.datasets import SceneSample, collate_scenes
from agile3d_tpu.engine.clicks import mean_iou_scene
from agile3d_tpu.engine.eval import InteractiveEngine
from agile3d_tpu.interactive.dataloader import InteractiveDataLoader
from agile3d_tpu.sparse.quantize import sparse_quantize
from agile3d_tpu.utils.ckpt import load_model_weights


def clicks_dict_to_arrays(click_idx: dict, click_time_idx: dict,
                          max_clicks: int):
    """Reference dict-of-lists {obj_id: [voxel rows]} -> padded arrays."""
    vox = np.full(max_clicks, -1, np.int32)
    obj = np.zeros(max_clicks, np.int32)
    tim = np.zeros(max_clicks, np.int32)
    slot = 0
    for obj_id, rows in click_idx.items():
        times = click_time_idx[obj_id]
        for r, t in zip(rows, times):
            if slot >= max_clicks:
                raise ValueError(f"click budget {max_clicks} exceeded")
            vox[slot], obj[slot], tim[slot] = r, int(obj_id), t
            slot += 1
    return vox, obj, tim


class InteractiveSegmentationServer:
    def __init__(self, dataloader: InteractiveDataLoader,
                 weights: str | None = None, cfg: Config = Config()):
        self.cfg = cfg
        self.loader = dataloader
        self.engine = InteractiveEngine(cfg)
        if weights:
            self.params, self.buffers, self.bn_state = load_model_weights(
                weights, cfg.model)
        else:
            from agile3d_tpu.models.agile3d import init_agile3d

            self.params, self.buffers, self.bn_state = init_agile3d(
                jax.random.PRNGKey(0), cfg.model)
        self.scene = None
        self.load_scene(dataloader.index)

    # -- scene lifecycle (reference run_segmentation / load_next_scene) --

    def load_scene(self, idx: int):
        name = self.loader.load_scene(idx)
        coords, colors = self.loader.coords, self.loader.colors
        shifted = coords - coords.min(0, keepdims=True)
        vox, unique_map, inverse_map = sparse_quantize(
            shifted, self.cfg.model.voxel_size)
        labels_full = self.loader.labels_full
        sample = SceneSample(
            vox_coords=vox, raw_coords=shifted[unique_map],
            feats=colors[unique_map],
            labels=(labels_full[unique_map].astype(np.int32)
                    if labels_full is not None
                    else np.zeros(len(vox), np.int32)),
            labels_full=(labels_full.astype(np.int32)
                         if labels_full is not None
                         else np.zeros(len(coords), np.int32)),
            inverse_map=inverse_map, click_idx={}, scene_name=name,
            num_obj=0)
        self.sample = sample
        self.batch = collate_scenes([sample], self.cfg.buckets)
        self.scene, _ = self.engine.run_backbone(
            self.params, self.buffers, self.bn_state, self.batch)
        jax.block_until_ready(self.scene.mask_feat)
        self.n_valid = len(vox)
        return name

    def next_scene(self):
        if self.loader.index + 1 < len(self.loader):
            return self.load_scene(self.loader.index + 1)
        return None

    def previous_scene(self):
        if self.loader.index > 0:
            return self.load_scene(self.loader.index - 1)
        return None

    def nearest_voxel(self, xyz: np.ndarray) -> int:
        """World position -> voxel row (the GUI's depth-unproject lookup,
        reference interactive_tool/utils.py:27-29)."""
        shifted = xyz - self.loader.coords.min(0)
        d = np.sum((self.sample.raw_coords - shifted[None, :]) ** 2, axis=1)
        return int(np.argmin(d))

    # -- the per-click hot path --

    def get_next_click(self, click_idx: dict, click_time_idx: dict,
                      record: bool = True, return_voxel: bool = False):
        """One decoder round for the current click set. Returns
        (pred_full [N_full], mean_iou | None) — or, with return_voxel,
        (pred_vox [N_vox], pred_full, mean_iou | None) so point-cloud
        clients rendering voxel points can recolor without devoxelizing."""
        from agile3d_tpu.engine.clicks import HostClicks

        hc = HostClicks(self.cfg.model.max_clicks)
        vox, obj, tim = clicks_dict_to_arrays(
            click_idx, click_time_idx, self.cfg.model.max_clicks)
        hc.vox, hc.obj, hc.time = vox, obj, tim
        hc.count = int((vox >= 0).sum())

        num_obj = max([int(k) for k in click_idx] + [0])
        _, pred_dev = self.engine.run_mask(self.params, self.buffers,
                                           self.scene, hc, max(num_obj, 1))
        pred = np.asarray(pred_dev[0])[: self.n_valid].copy()
        for obj_id, rows in click_idx.items():
            pred[rows] = int(obj_id)
        pred_full = pred[self.sample.inverse_map]

        iou = None
        if self.loader.labels_full is not None:
            iou, _ = mean_iou_scene(pred_full, self.loader.labels_full,
                                    self.cfg.model.max_fg_objects)
        if record:
            self._record(click_idx, click_time_idx, pred_full, iou)
        if return_voxel:
            return pred, pred_full, iou
        return pred_full, iou

    def _record(self, click_idx, click_time_idx, pred_full, iou):
        num_obj = max(len(click_idx) - 1, 1)
        num_click = sum(len(c) for c in click_idx.values())
        avg = round(num_click / num_obj, 1)
        iou_str = "NA" if iou is None else str(round(iou * 100, 1))
        stamp = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
        line = (f"{stamp}  {self.sample.scene_name}  NumObjects:{num_obj}  "
                f"AvgNumClicks:{avg}  mIoU:{iou_str}\n")
        with open(self.loader.record_path, "a") as f:
            f.write(line)
        np.save(os.path.join(self.loader.mask_folder,
                             f"mask_{avg}_{iou_str}.npy"), pred_full)
        np.save(os.path.join(self.loader.click_folder,
                             f"click_{avg}_{iou_str}.npy"),
                {"click_idx": click_idx, "click_time": click_time_idx},
                allow_pickle=True)
