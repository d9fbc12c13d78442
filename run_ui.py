"""Interactive annotation tool entry point.

TPU-native counterpart of the reference run_UI.py (reference run_UI.py:12-58).
The model server (scene loading, cached backbone, per-click forward_mask)
is fully TPU-native. Clients:

  --web (default)  browser GUI: dependency-free WebGL point-cloud viewer
                   with click-to-voxel picking, number-key object
                   selection, ctrl-click background, per-object mask
                   coloring (replaces the reference Open3D GUI,
                   interactive_tool/gui.py:24-687)
  --terminal       REPL accepting ``<obj_id> <x> <y> <z>`` clicks
"""

import argparse

import numpy as np

from agile3d_tpu.cli import (
    add_reference_model_flags, apply_device_arg, model_config_from_args)
from agile3d_tpu.config import Config
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
    # the reference's shared model flag block (agile3d_tpu/cli.py;
    # reference run_UI.py:30-52)
    add_reference_model_flags(p)
    p.add_argument("--terminal", action="store_true",
                   help="terminal REPL instead of the web GUI")
    p.add_argument("--host", default="127.0.0.1", type=str)
    p.add_argument("--port", default=8008, type=int)
    p.add_argument("--decoder_dtype", default="bfloat16",
                   choices=("float32", "bfloat16"),
                   help="serving default is bfloat16: lower per-click "
                        "latency at large scenes (34.3 -> 27.4 ms at 670k "
                        "voxels, PERF.md round 4), with its own frozen "
                        "golden (tests/golden/rollout_multi_bf16.csv). "
                        "Pass float32 for exact reference-parity numerics "
                        "(the eval CLIs' default)")
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
    apply_device_arg(args)

    from agile3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    cfg = Config(model=model_config_from_args(
        args, decoder_dtype=args.decoder_dtype))
    loader = InteractiveDataLoader(args.dataset_scenes, args.user_name)
    server = InteractiveSegmentationServer(
        loader, weights=args.pretraining_weights or None, cfg=cfg)
    if args.terminal:
        terminal_loop(server)
    else:
        from agile3d_tpu.interactive.web import serve

        serve(server, host=args.host, port=args.port)


if __name__ == "__main__":
    parser = argparse.ArgumentParser("AGILE3D interactive tool",
                                     parents=[get_args_parser()])
    main(parser.parse_args())
