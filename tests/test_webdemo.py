"""Web two-image demo (runtime/webdemo.py; reference splatt3r_core/demo.py).

Spins the stdlib HTTP app in-process with the tiny model and drives it
exactly as the browser does: POST /reconstruct with base64 images, then
pull device-rendered JPEG orbit views and the 3DGS PLY.
"""

import base64
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server_url():
    import argparse

    import main as cli
    from splatt3r_slam_tpu.models import TwoViewConfig
    from splatt3r_slam_tpu.runtime.webdemo import DemoEngine, serve

    cfg = TwoViewConfig(dtype="float32", head_dtype="float32").tiny()
    model, params = cli.load_model_params(
        argparse.Namespace(checkpoint=None, seed=0), cfg, 48, 64)
    engine = DemoEngine(model, params, img_size=64, k_max=64)
    server = serve(engine, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}"
    finally:
        server.shutdown()


def _b64_png(img_u8):
    import cv2

    ok, buf = cv2.imencode(".png", img_u8)
    assert ok
    return "data:image/png;base64," + base64.b64encode(
        buf.tobytes()).decode()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url, timeout=600):
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_page_and_no_scene_404(server_url):
    code, body, ctype = _get(server_url + "/")
    assert code == 200 and ctype == "text/html"
    assert b"reconstruct" in body
    code, _, _ = _get(server_url + "/render")
    assert code == 404
    code, _, _ = _get(server_url + "/gaussians.ply")
    assert code == 404


def test_reconstruct_render_ply_roundtrip(server_url):
    import cv2

    rng = np.random.default_rng(0)
    base = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    imgs = [_b64_png(base), _b64_png(np.roll(base, 5, axis=1))]

    code, out = _post(server_url + "/reconstruct", {"images": imgs})
    assert code == 200 and out["ok"], out
    assert out["n_gaussians"] > 0

    # device-rendered orbit view decodes as a JPEG of the scene size
    code, body, ctype = _get(server_url + "/render?yaw=0.3&pitch=0.1")
    assert code == 200 and ctype == "image/jpeg"
    img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    assert img is not None and img.shape[2] == 3

    # 3DGS PLY export: header + one float32 record per gaussian
    code, ply, _ = _get(server_url + "/gaussians.ply")
    assert code == 200 and ply.startswith(b"ply")
    assert f"element vertex {out['n_gaussians']}".encode() in ply


def test_single_image_duplicates_and_bad_input_400(server_url):
    rng = np.random.default_rng(1)
    img = _b64_png((rng.random((48, 64, 3)) * 255).astype(np.uint8))
    code, out = _post(server_url + "/reconstruct", {"images": [img]})
    assert code == 200 and out["ok"]

    code, out = _post(server_url + "/reconstruct",
                      {"images": ["data:image/png;base64,not-base64!"]})
    assert code == 400 and not out["ok"]

    code, out = _post(server_url + "/reconstruct", {"images": []})
    assert code == 400
