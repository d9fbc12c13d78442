"""Browser GUI for interactive annotation — the client side of the
reference's Open3D tool (reference interactive_tool/gui.py:24-687),
re-imagined as a dependency-free web app:

  * a stdlib ThreadingHTTPServer wraps InteractiveSegmentationServer;
  * the page (viewer.html) is a self-contained vanilla-WebGL point-cloud
    renderer — orbit/zoom/pan, number-key object selection (gui.py:11-22),
    ctrl-click = background, per-object mask coloring;
  * click picking runs client-side in screen space (nearest projected
    voxel with depth priority — the reference unprojects a rendered depth
    image then takes the nearest voxel, gui.py:253-339, utils.py:27-29).
    Equivalent when clicking squarely on a surface, occluded or not; it
    intentionally snaps to the NEARER object within 12 px of a
    silhouette edge where the reference picks the exact-pixel surface —
    semantics mirrored + pinned in interactive/picking.py and
    tests/test_picking.py;
  * POST /click runs one forward_mask round on the TPU and streams back
    per-voxel labels (the <50 ms-target hot path,
    interactive_segmentation_user.py:64-117).

Endpoints:
  GET  /            viewer page
  GET  /scene       scene meta (name, counts, index, has_labels)
  GET  /points      binary: [n f32 xyz][n u8 rgb] voxel-level points
  POST /click       {click_idx, click_time_idx} -> binary u8 labels per
                    voxel; X-IoU / X-Latency-Ms response headers
  POST /scene/next  switch scene        POST /scene/prev
"""

from __future__ import annotations

import json
import os
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_HTML_PATH = os.path.join(os.path.dirname(__file__), "viewer.html")


def make_handler(seg_server):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code, body: bytes, ctype="application/json",
                  headers=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            s = seg_server
            if self.path in ("/", "/index.html"):
                with open(_HTML_PATH, "rb") as f:
                    self._send(200, f.read(), "text/html")
            elif self.path == "/scene":
                faces = s.loader.faces
                meta = {
                    "name": s.sample.scene_name,
                    "index": s.loader.index,
                    "count": len(s.loader),
                    "n_vox": int(s.n_valid),
                    "n_full": int(len(s.loader.coords)),
                    "has_labels": s.loader.labels_full is not None,
                    "max_obj": s.cfg.model.max_fg_objects,
                    "mesh": faces is not None,
                    "n_faces": 0 if faces is None else int(len(faces)),
                }
                self._send(200, json.dumps(meta).encode())
            elif self.path == "/points":
                pts = s.sample.raw_coords.astype(np.float32)
                cols = s.sample.feats
                cols = (np.clip(cols, 0, 1) * 255).astype(np.uint8)
                body = pts.tobytes() + cols.tobytes()
                self._send(200, body, "application/octet-stream",
                           [("X-Count", str(len(pts)))])
            elif self.path == "/mesh":
                # full-resolution surface: [n f32 xyz][n u8 rgb]
                # [n u32 voxel-row][f*3 u32 triangle indices]. The client
                # renders triangles, picks a VERTEX, and maps it to its
                # voxel row for clicks / per-voxel recoloring (reference
                # gui.py:552-557 renders the same mesh via Open3D).
                pts = s.loader.coords.astype(np.float32)
                cols = (np.clip(s.loader.colors, 0, 1) * 255).astype(
                    np.uint8)
                inv = s.sample.inverse_map.astype(np.uint32)
                faces = s.loader.faces
                if faces is None:
                    self._send(404, b"{}")
                    return
                body = (pts.tobytes() + cols.tobytes() + inv.tobytes()
                        + faces.astype(np.uint32).tobytes())
                self._send(200, body, "application/octet-stream",
                           [("X-Count", str(len(pts))),
                            ("X-Faces", str(len(faces)))])
            else:
                self._send(404, b"{}")

        def do_POST(self):
            s = seg_server
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/click":
                click_idx = {k: list(map(int, v))
                             for k, v in payload["click_idx"].items()}
                click_time = {k: list(map(int, v))
                              for k, v in payload["click_time_idx"].items()}
                t0 = time.perf_counter()
                pred_vox, _, iou = s.get_next_click(
                    click_idx, click_time, return_voxel=True)
                ms = (time.perf_counter() - t0) * 1e3
                self._send(200, pred_vox.astype(np.uint8).tobytes(),
                           "application/octet-stream",
                           [("X-IoU", "NA" if iou is None else f"{iou:.4f}"),
                            ("X-Latency-Ms", f"{ms:.2f}")])
            elif self.path == "/scene/next":
                name = s.next_scene()
                self._send(200, json.dumps({"name": name}).encode())
            elif self.path == "/scene/prev":
                name = s.previous_scene()
                self._send(200, json.dumps({"name": name}).encode())
            else:
                self._send(404, b"{}")

    return Handler


def serve(seg_server, host="127.0.0.1", port=8008):
    httpd = ThreadingHTTPServer((host, port), make_handler(seg_server))
    print(f"AGILE3D web annotator at http://{host}:{port}/ "
          f"(scene {seg_server.sample.scene_name})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
