"""Web annotator HTTP layer (interactive/web.py): scene meta, binary point
streaming, and the POST /click hot path against a live threaded server.
The in-browser WebGL client consumes exactly these endpoints."""

import json
import os
import threading
import urllib.request

import numpy as np
import jax
import pytest

from agile3d_tpu.config import Config, ModelConfig
from agile3d_tpu.data.ply import write_ply
from agile3d_tpu.interactive import (
    InteractiveDataLoader,
    InteractiveSegmentationServer,
)
from agile3d_tpu.interactive.web import make_handler
from tests.synthetic import make_scene

CFG = Config(model=ModelConfig(max_clicks=64), buckets=(512, 1024, 4096))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("ui")
    rng = np.random.default_rng(0)
    for i in range(2):
        d = root / f"scene_t{i}"
        d.mkdir()
        coords, colors, labels = make_scene(rng, n_points=2000, num_obj=2)
        write_ply(str(d / "scan.ply"), {
            "x": coords[:, 0], "y": coords[:, 1], "z": coords[:, 2],
            "R": colors[:, 0], "G": colors[:, 1], "B": colors[:, 2]})
        write_ply(str(d / "label.ply"), {
            "x": coords[:, 0], "y": coords[:, 1], "z": coords[:, 2],
            "label": labels})
    loader = InteractiveDataLoader(str(root))
    seg = InteractiveSegmentationServer(loader, weights=None, cfg=CFG)

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(seg))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield seg, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.read(), dict(r.headers)


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        return r.read(), dict(r.headers)


def test_viewer_page(server):
    _, base = server
    body, _ = _get(base + "/")
    assert b"AGILE3D" in body and b"WebGL" in body.replace(b"webgl", b"WebGL")


def test_scene_and_points(server):
    seg, base = server
    meta = json.loads(_get(base + "/scene")[0])
    assert meta["n_vox"] == seg.n_valid
    assert meta["has_labels"] is True
    body, headers = _get(base + "/points")
    n = int(headers["X-Count"])
    assert n == seg.n_valid
    assert len(body) == n * 12 + n * 3  # f32 xyz + u8 rgb
    pts = np.frombuffer(body[: n * 12], np.float32).reshape(n, 3)
    np.testing.assert_allclose(pts, seg.sample.raw_coords, rtol=1e-6)


def test_click_roundtrip(server):
    seg, base = server
    payload = {"click_idx": {"0": [], "1": [10], "2": [100]},
               "click_time_idx": {"0": [], "1": [0], "2": [1]}}
    body, headers = _post(base + "/click", payload)
    labels = np.frombuffer(body, np.uint8)
    assert labels.shape == (seg.n_valid,)
    # clicked voxels are forced to their object ids (gt override)
    assert labels[10] == 1 and labels[100] == 2
    assert float(headers["X-Latency-Ms"]) > 0
    assert headers["X-IoU"] != ""
    # session artifacts recorded (reference iou_record.csv semantics)
    assert os.path.exists(seg.loader.record_path)


def test_scene_switch(server):
    seg, base = server
    name = json.loads(_post(base + "/scene/next", {})[0])["name"]
    assert name == "t1" and seg.loader.index == 1
    json.loads(_post(base + "/scene/prev", {})[0])
    assert seg.loader.index == 0


@pytest.mark.slow
def test_mesh_scene(tmp_path):
    """Mesh scans stream the full-resolution surface (/mesh: vertices +
    colors + per-vertex voxel rows + triangles) and clicks still operate
    on voxel rows (reference gui.py:552-557 renders the same mesh)."""
    rng = np.random.default_rng(3)
    d = tmp_path / "scene_m0"
    d.mkdir()
    coords, colors, labels = make_scene(rng, n_points=1500, num_obj=2)
    # fabricate triangles over consecutive vertex triples
    faces = np.arange(1500 - 1500 % 3, dtype=np.uint32).reshape(-1, 3)
    write_ply(str(d / "scan.ply"), {
        "x": coords[:, 0], "y": coords[:, 1], "z": coords[:, 2],
        "R": colors[:, 0], "G": colors[:, 1], "B": colors[:, 2]},
        faces=faces)
    write_ply(str(d / "label.ply"), {
        "x": coords[:, 0], "y": coords[:, 1], "z": coords[:, 2],
        "label": labels})
    loader = InteractiveDataLoader(str(tmp_path))
    assert loader.point_type == "mesh"
    seg = InteractiveSegmentationServer(loader, weights=None, cfg=CFG)

    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(seg))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        meta = json.loads(_get(base + "/scene")[0])
        assert meta["mesh"] is True and meta["n_faces"] == len(faces)
        n = meta["n_full"]
        body, headers = _get(base + "/mesh")
        assert int(headers["X-Count"]) == n
        assert int(headers["X-Faces"]) == len(faces)
        assert len(body) == n * 12 + n * 3 + n * 4 + len(faces) * 12
        inv = np.frombuffer(body[n * 15: n * 19], np.uint32)
        assert inv.max() < meta["n_vox"]
        got_faces = np.frombuffer(body[n * 19:], np.uint32).reshape(-1, 3)
        np.testing.assert_array_equal(got_faces, faces)
        # click through a mesh vertex's voxel row
        vrow = int(inv[42])
        body, _ = _post(base + "/click", {
            "click_idx": {"0": [], "1": [vrow]},
            "click_time_idx": {"0": [], "1": [0]}})
        lab = np.frombuffer(body, np.uint8)
        assert lab.shape == (meta["n_vox"],)
        assert lab[vrow] == 1
    finally:
        httpd.shutdown()
