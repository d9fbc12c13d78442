"""Interactive annotation tool entry point.

TPU-native counterpart of the reference run_UI.py (reference run_UI.py:12-58).
The model server (scene loading, cached backbone, per-click forward_mask)
is fully TPU-native; the Open3D GUI remains a thin optional client —
when open3d is unavailable this falls back to a terminal REPL that accepts
``<obj_id> <x> <y> <z>`` clicks and reports per-round mIoU.
"""

import argparse

import numpy as np

from agile3d_tpu.config import Config, ModelConfig
from agile3d_tpu.interactive import (
    InteractiveDataLoader,
    InteractiveSegmentationServer,
)


def get_args_parser():
    p = argparse.ArgumentParser("AGILE3D interactive tool", add_help=False)
    p.add_argument("--user_name", default="user", type=str)
    p.add_argument("--pretraining_weights",
                   default="checkpoints/checkpoint1099.pth", type=str)
    p.add_argument("--dataset_scenes",
                   default="data/interactive_dataset", type=str)
    p.add_argument("--point_type", default=None, type=str)
    p.add_argument("--voxel_size", default=0.05, type=float)
    return p


def terminal_loop(server: InteractiveSegmentationServer):
    click_idx = {"0": []}
    click_time_idx = {"0": []}
    t = 0
    print(f"scene: {server.sample.scene_name} "
          f"({server.n_valid} voxels). Commands: "
          f"'<obj_id> <x> <y> <z>' to click, 'next'/'prev' scene, 'quit'.")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if line in ("quit", "q"):
            break
        if line in ("next", "prev"):
            name = (server.next_scene() if line == "next"
                    else server.previous_scene())
            print(f"scene: {name}" if name else "no more scenes")
            click_idx, click_time_idx, t = {"0": []}, {"0": []}, 0
            continue
        try:
            parts = line.split()
            obj_id, xyz = parts[0], np.asarray(list(map(float, parts[1:4])))
        except (ValueError, IndexError):
            print("expected: <obj_id> <x> <y> <z>")
            continue
        vox = server.nearest_voxel(xyz)
        click_idx.setdefault(obj_id, []).append(vox)
        click_time_idx.setdefault(obj_id, []).append(t)
        t += 1
        _, iou = server.get_next_click(click_idx, click_time_idx)
        print(f"clicks: {t}, mIoU: "
              f"{'NA' if iou is None else round(iou * 100, 1)}")


def main(args):
    cfg = Config(model=ModelConfig(voxel_size=args.voxel_size))
    loader = InteractiveDataLoader(args.dataset_scenes, args.user_name)
    server = InteractiveSegmentationServer(
        loader, weights=args.pretraining_weights or None, cfg=cfg)
    try:
        import open3d  # noqa: F401
        print("[INFO] open3d detected — GUI client not bundled in this "
              "build; using terminal mode (the reference Open3D GUI can "
              "drive this server through get_next_click).")
    except ImportError:
        pass
    terminal_loop(server)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("AGILE3D interactive tool",
                                     parents=[get_args_parser()])
    main(parser.parse_args())
