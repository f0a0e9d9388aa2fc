"""Two-image reconstruction web demo (stdlib HTTP, device-side rendering).

Parity: reference `splatt3r_core/demo.py` (Gradio app: upload one or two
images -> two-view Gaussian prediction -> `gaussians.ply` shown in a
browser splat viewer). Gradio is not available here, and shipping a
client-side splat renderer would duplicate what the framework already
does best — so this demo is a thin stdlib `http.server` app whose 3D
viewer is REMOTE-RENDERED: the browser sends orbit angles, the TPU
rasterizes the predicted Gaussians (`splat/rasterizer.py`), and a JPEG
comes back. Drag to orbit, scroll to dolly, download the .ply.

Endpoints:
  GET  /                 HTML page (upload + viewer)
  POST /reconstruct      JSON {"images": [dataURL or b64, ...]} (1 or 2)
                         -> {"ok": true, "n_gaussians": N}
  GET  /render?yaw=&pitch=&radius=&size=   JPEG of the current scene
  GET  /gaussians.ply    3DGS-format PLY of the current scene
"""

from __future__ import annotations

import base64
import io
import json
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>Splatt3R TPU demo</title><style>
body{font-family:sans-serif;max-width:720px;margin:2em auto;color:#222}
#view{border:1px solid #999;cursor:grab;touch-action:none}
button{padding:.4em 1.2em}#status{color:#666;margin-left:1em}
</style></head><body>
<h2>Splatt3R — two-image 3D Gaussian reconstruction (TPU)</h2>
<p>Upload one or two images, then Run. Drag the viewer to orbit,
scroll to dolly. Rendering happens on the accelerator; the browser
only displays JPEGs.</p>
<input type="file" id="files" accept="image/*" multiple>
<button id="run">Run</button><span id="status"></span>
<p><a href="/gaussians.ply" download>Download gaussians.ply</a></p>
<canvas id="view" width="512" height="384"></canvas>
<script>
let yaw=0, pitch=0.2, radius=0, busy=false, dirty=false;
const cv=document.getElementById('view'), ctx=cv.getContext('2d');
const status=document.getElementById('status');
async function draw(){
  if(busy){dirty=true;return} busy=true;
  const q=`yaw=${yaw}&pitch=${pitch}&radius=${radius}`;
  const img=new Image();
  img.onload=()=>{ctx.drawImage(img,0,0);busy=false;
                  if(dirty){dirty=false;draw()}};
  img.onerror=()=>{busy=false};
  img.src=`/render?${q}&t=${Date.now()}`;
}
let drag=null;
cv.addEventListener('pointerdown',e=>{drag=[e.clientX,e.clientY];
  cv.setPointerCapture(e.pointerId)});
cv.addEventListener('pointermove',e=>{if(!drag)return;
  yaw+=(e.clientX-drag[0])*0.01; pitch+=(e.clientY-drag[1])*0.005;
  pitch=Math.max(-1.2,Math.min(1.2,pitch));
  drag=[e.clientX,e.clientY]; draw()});
cv.addEventListener('pointerup',()=>drag=null);
cv.addEventListener('wheel',e=>{e.preventDefault();
  radius+=e.deltaY*0.002; draw()},{passive:false});
document.getElementById('run').onclick=async()=>{
  const fs=document.getElementById('files').files;
  if(fs.length<1||fs.length>2){status.textContent=
    'pick one or two images';return}
  status.textContent='reconstructing…';
  const images=await Promise.all([...fs].map(f=>new Promise(r=>{
    const rd=new FileReader();rd.onload=()=>r(rd.result);
    rd.readAsDataURL(f)})));
  const resp=await fetch('/reconstruct',{method:'POST',
    headers:{'Content-Type':'application/json'},
    body:JSON.stringify({images})});
  const out=await resp.json();
  status.textContent=out.ok?`${out.n_gaussians} gaussians`:out.error;
  if(out.ok){yaw=0;pitch=0.2;radius=0;draw()}
};
draw();
</script></body></html>
"""


@dataclass
class Scene:
    """Device-resident reconstruction: composited render inputs + the
    raw per-gaussian arrays the 3DGS PLY format wants."""

    means: object  # (n,3) jax
    cov_triu: object  # (n,6)
    colors: object  # (n,3)
    opacities: object  # (n,)
    ply_arrays: dict = field(default_factory=dict)  # np arrays for export
    hw: tuple = (384, 512)
    center: np.ndarray = None
    radius: float = 1.0


class DemoEngine:
    """Owns the model and the current scene; thread-safe."""

    def __init__(self, model, params, img_size=512, k_max=256):
        import jax

        self.model = model
        self.params = params
        self.img_size = int(img_size)
        self.k_max = int(k_max)
        self.scene: Scene | None = None
        self.lock = threading.Lock()
        self._fwd = jax.jit(
            lambda p, a, b: model.apply({"params": p}, a, b))

    # -- reconstruction ------------------------------------------------
    def reconstruct_arrays(self, imgs_np):
        """imgs_np: list of 1 or 2 HxWx3 float [0,1] arrays."""
        import jax.numpy as jnp

        from splatt3r_slam_tpu.splat.gaussians import (
            RGB2SH, build_covariance, cov_to_triu,
        )
        from splatt3r_slam_tpu.utils.image import resize_img

        if len(imgs_np) == 1:  # reference duplicates a single upload
            imgs_np = [imgs_np[0], imgs_np[0]]
        imgs_np = [np.asarray(im, np.float32) for im in imgs_np[:2]]
        # the two views must share one resolution (the jitted forward is
        # shape-specialized per pair); mixed aspect ratios resample the
        # second image onto the first's raw grid before the 512-crop
        if imgs_np[1].shape != imgs_np[0].shape:
            import cv2

            h0, w0 = imgs_np[0].shape[:2]
            imgs_np[1] = cv2.resize(imgs_np[1], (w0, h0),
                                    interpolation=cv2.INTER_AREA)
        ims = [jnp.asarray(resize_img(im, self.img_size)["img"])
               for im in imgs_np]
        res1, res2 = self._fwd(self.params, ims[0], ims[1])
        h, w = ims[0].shape[1:3]

        means, covs, cols, opas = [], [], [], []
        ply = {k: [] for k in
               ("means", "scales", "rotations", "sh", "opacities")}
        for res, im in ((res1, ims[0]), (res2, ims[1])):
            m = res["means"][0].reshape(-1, 3)
            cov = build_covariance(res["scales"][0].reshape(-1, 3),
                                   res["rotations"][0].reshape(-1, 4))
            sh0 = res["sh"][0][..., 0].reshape(-1, 3) + RGB2SH(
                jnp.clip(im[0] * 0.5 + 0.5, 0, 1).reshape(-1, 3))
            means.append(m)
            covs.append(cov_to_triu(cov))
            cols.append(jnp.clip(sh0 * 0.28209479177387814 + 0.5, 0, 1))
            opas.append(res["opacities"][0].reshape(-1))
            ply["means"].append(np.asarray(m))
            ply["scales"].append(
                np.asarray(res["scales"][0]).reshape(-1, 3))
            ply["rotations"].append(
                np.asarray(res["rotations"][0]).reshape(-1, 4))
            ply["sh"].append(np.asarray(sh0).reshape(-1, 3, 1))
            ply["opacities"].append(
                np.asarray(res["opacities"][0]).reshape(-1))
        means = jnp.concatenate(means)
        m_np = np.asarray(means)
        scene = Scene(
            means=means,
            cov_triu=jnp.concatenate(covs),
            colors=jnp.concatenate(cols),
            opacities=jnp.concatenate(opas),
            ply_arrays={k: np.concatenate(v) for k, v in ply.items()},
            hw=(int(h), int(w)),
            center=m_np.mean(axis=0),
            radius=0.5 * float(np.linalg.norm(m_np.std(axis=0))) + 1.0,
        )
        with self.lock:
            self.scene = scene
        return scene

    # -- rendering -----------------------------------------------------
    def render(self, yaw=0.0, pitch=0.2, dolly=0.0):
        """Rasterize the current scene from an orbit pose -> HxWx3 u8."""
        import jax.numpy as jnp

        from splatt3r_slam_tpu.runtime.visualization import (
            orbit_pose, vfov_to_intrinsics,
        )
        from splatt3r_slam_tpu.splat.rasterizer import render_tiles

        with self.lock:
            scene = self.scene
        if scene is None:
            return None
        h, w = scene.hw
        K = jnp.asarray(vfov_to_intrinsics(60.0, h, w))
        T = orbit_pose(scene.center, max(scene.radius + dolly, 0.05),
                       float(yaw), float(pitch))
        view = jnp.asarray(np.linalg.inv(T), jnp.float32)
        img = render_tiles(scene.means, scene.cov_triu, scene.colors,
                           scene.opacities, view, K, (h, w),
                           k_max=self.k_max)
        return (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)

    def ply_bytes(self):
        from splatt3r_slam_tpu.parallel.export import save_as_ply

        with self.lock:
            scene = self.scene
        if scene is None:
            return None
        buf = io.BytesIO()
        a = scene.ply_arrays
        save_as_ply(buf, a["means"], a["scales"], a["rotations"],
                    a["sh"], a["opacities"])
        return buf.getvalue()


def _decode_image(data_url_or_b64: str) -> np.ndarray:
    """data:image/...;base64,xxxx or bare base64 -> HxWx3 float [0,1]."""
    import cv2

    payload = data_url_or_b64.split(",", 1)[-1]
    raw = np.frombuffer(base64.b64decode(payload), np.uint8)
    bgr = cv2.imdecode(raw, cv2.IMREAD_COLOR)
    if bgr is None:
        raise ValueError("undecodable image")
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def make_handler(engine: DemoEngine):
    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(200, _PAGE.encode(), "text/html")
            elif url.path == "/render":
                q = parse_qs(url.query)

                def f(k, d):
                    try:
                        return float(q.get(k, [d])[0])
                    except ValueError:
                        return d
                img = engine.render(f("yaw", 0.0), f("pitch", 0.2),
                                    f("radius", 0.0))
                if img is None:
                    self._send(404, b'{"error": "no scene yet"}')
                    return
                ok, jpg = cv2.imencode(
                    ".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 90])
                self._send(200, jpg.tobytes(), "image/jpeg")
            elif url.path == "/gaussians.ply":
                ply = engine.ply_bytes()
                if ply is None:
                    self._send(404, b'{"error": "no scene yet"}')
                else:
                    self._send(200, ply, "application/octet-stream")
            else:
                self._send(404, b'{"error": "not found"}')

        def do_POST(self):
            if urlparse(self.path).path != "/reconstruct":
                self._send(404, b'{"error": "not found"}')
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                imgs = [_decode_image(s) for s in req["images"]]
                if not 1 <= len(imgs) <= 2:
                    raise ValueError("provide one or two images")
                scene = engine.reconstruct_arrays(imgs)
                body = json.dumps({
                    "ok": True,
                    "n_gaussians": int(scene.ply_arrays["means"].shape[0]),
                }).encode()
                self._send(200, body)
            except Exception as e:  # surface to the browser
                self._send(400, json.dumps(
                    {"ok": False, "error": str(e)}).encode())

    return Handler


def serve(engine: DemoEngine, host="127.0.0.1", port=7860):
    """Blocking server loop. Returns the bound server for tests (call
    in a thread and use `server.shutdown()`)."""
    server = ThreadingHTTPServer((host, port), make_handler(engine))
    return server
