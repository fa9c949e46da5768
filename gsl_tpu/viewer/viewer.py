"""Interactive web viewer.

Parity target: /root/reference/internal/viewer/viewer.py:23-560 (viser-based
server with per-client render threads, resolution throttling, output-type
selection). viser is optional in this image; when absent a dependency-free
HTTP viewer serves an orbit-controllable render page — same ViewerRenderer
path, different transport.
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from ..utils.gaussian_model_loader import GaussianModelLoader
from .renderer import ViewerRenderer

_PAGE = """<!DOCTYPE html><html><head><title>gsl_tpu viewer</title></head>
<body style="margin:0;background:#111;color:#eee;font-family:sans-serif">
<div style="padding:8px">
  yaw <input id="yaw" type="range" min="-180" max="180" value="0">
  pitch <input id="pitch" type="range" min="-89" max="89" value="-15">
  dist <input id="dist" type="range" min="1" max="30" value="6" step="0.5">
  output <select id="out"></select>
</div>
<details style="padding:8px"><summary>transform</summary>
  tx <input id="tx" size=4 value="0"> ty <input id="ty" size=4 value="0">
  tz <input id="tz" size=4 value="0"> |
  rx <input id="rx" size=4 value="0"> ry <input id="ry" size=4 value="0">
  rz <input id="rz" size=4 value="0"> |
  s <input id="sc" size=4 value="1">
  <button onclick="applyTransform()">apply</button>
  <button onclick="fetch('/transform?reset=1').then(refresh)">reset</button>
</details>
<details style="padding:8px"><summary>edit (delete box)</summary>
  min <input id="bmin" size=12 value="-1,-1,-1">
  max <input id="bmax" size=12 value="1,1,1">
  <button onclick="deleteBox()">delete inside</button>
  <span id="editmsg"></span>
</details>
<details style="padding:8px"><summary>camera path</summary>
  <button onclick="addKeyframe()">add keyframe</button>
  <button onclick="fetch('/path/clear')">clear</button>
  <a href="/path/render.gif" target="_blank">render gif</a>
  <span id="pathmsg"></span>
</details>
<img id="view" style="width:100%" />
<script>
const img = document.getElementById('view');
async function outputs() {
  const r = await fetch('/outputs'); const names = await r.json();
  const sel = document.getElementById('out');
  for (const n of names) { const o = document.createElement('option');
    o.value = n; o.text = n; sel.add(o); }
}
function refresh() {
  const y = document.getElementById('yaw').value;
  const p = document.getElementById('pitch').value;
  const d = document.getElementById('dist').value;
  const o = document.getElementById('out').value || 'rgb';
  img.src = `/render?yaw=${y}&pitch=${p}&dist=${d}&output=${o}&t=${Date.now()}`;
}
for (const id of ['yaw','pitch','dist','out'])
  document.getElementById(id).addEventListener('change', refresh);
function val(id) { return document.getElementById(id).value; }
async function applyTransform() {
  await fetch(`/transform?tx=${val('tx')}&ty=${val('ty')}&tz=${val('tz')}` +
    `&rx=${val('rx')}&ry=${val('ry')}&rz=${val('rz')}&s=${val('sc')}`);
  refresh();
}
async function deleteBox() {
  const r = await fetch(`/edit/delete_box?min=${val('bmin')}&max=${val('bmax')}`);
  document.getElementById('editmsg').textContent = await r.text();
  refresh();
}
async function addKeyframe() {
  const r = await fetch(`/path/add?yaw=${val('yaw')}&pitch=${val('pitch')}&dist=${val('dist')}`);
  document.getElementById('pathmsg').textContent = await r.text();
}
outputs().then(refresh);
</script></body></html>"""


def orbit_c2w(yaw_deg: float, pitch_deg: float, dist: float,
              target=np.zeros(3)) -> np.ndarray:
    """Orbit camera (OpenCV convention: +z forward)."""
    yaw = np.deg2rad(yaw_deg)
    pitch = np.deg2rad(pitch_deg)
    pos = target + dist * np.array([
        np.sin(yaw) * np.cos(pitch), -np.sin(pitch),
        -np.cos(yaw) * np.cos(pitch)])
    fwd = target - pos
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, pos
    return c2w


class Viewer:
    def __init__(self, model_path: str, host: str = "0.0.0.0",
                 port: int = 8080, background=(0.0, 0.0, 0.0),
                 image_size: int = 512):
        state, renderer, sh_degree = GaussianModelLoader.load(model_path)
        self._base_state = state
        self.renderer = ViewerRenderer(state, renderer, sh_degree,
                                       background)
        from .panels import CameraPath
        self.camera_path = CameraPath()
        self.host, self.port = host, port
        self.image_size = image_size
        # center orbit on the scene
        alive = np.asarray(state.alive)
        self.target = np.asarray(state.params.means)[alive].mean(0)

    def start(self, block: bool = True):
        try:
            import viser  # noqa: F401
            return self._start_viser(block)
        except ImportError:
            return self._start_http(block)

    # ---- viser path (full-featured when available) ----
    def _start_viser(self, block: bool):
        import viser

        server = viser.ViserServer(host=self.host, port=self.port)

        @server.on_client_connect
        def _(client):
            def render_loop():
                while True:
                    cam = client.camera
                    c2w = np.eye(4)
                    import viser.transforms as vt
                    c2w[:3, :3] = vt.SO3(cam.wxyz).as_matrix()
                    c2w[:3, 3] = cam.position
                    c2w[:3, 1:3] *= -1
                    img = self.renderer.get_outputs(
                        c2w, self.image_size, self.image_size)
                    client.scene.set_background_image(img)
            threading.Thread(target=render_loop, daemon=True).start()

        if block:
            threading.Event().wait()
        return server

    # ---- dependency-free HTTP fallback ----
    def _start_http(self, block: bool):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _ok(self, body):
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(body)
                elif u.path == "/outputs":
                    body = json.dumps(
                        viewer.renderer.available_output_types()).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.end_headers()
                    self.wfile.write(body)
                elif u.path == "/transform":
                    from .panels import transform_state
                    q = parse_qs(u.query)
                    if q.get("reset"):
                        viewer.renderer.state = viewer._base_state
                        return self._ok(b"reset")
                    g = lambda k, d=0.0: float(q.get(k, [d])[0])
                    viewer.renderer.state = transform_state(
                        viewer._base_state,
                        translate=(g("tx"), g("ty"), g("tz")),
                        rotate_deg=(g("rx"), g("ry"), g("rz")),
                        scale=g("s", 1.0))
                    self._ok(b"ok")
                elif u.path == "/edit/delete_box":
                    from .panels import delete_in_box
                    q = parse_qs(u.query)
                    bmin = [float(x) for x in q["min"][0].split(",")]
                    bmax = [float(x) for x in q["max"][0].split(",")]
                    viewer.renderer.state, n = delete_in_box(
                        viewer.renderer.state, bmin, bmax)
                    self._ok(f"deleted {n}".encode())
                elif u.path == "/path/add":
                    q = parse_qs(u.query)
                    viewer.camera_path.add(float(q["yaw"][0]),
                                           float(q["pitch"][0]),
                                           float(q["dist"][0]))
                    self._ok(
                        f"{len(viewer.camera_path.keyframes)} keyframes"
                        .encode())
                elif u.path == "/path/save":
                    import json as _json
                    q = parse_qs(u.query)
                    out = q.get("file", ["camera_path.json"])[0]
                    with open(out, "w") as f:
                        _json.dump({"keyframes":
                                    viewer.camera_path.keyframes}, f)
                    self._ok(f"saved {out}".encode())
                elif u.path == "/path/clear":
                    viewer.camera_path.clear()
                    self._ok(b"cleared")
                elif u.path == "/path/render.gif":
                    def render_pose(yaw, pitch, dist):
                        c2w = orbit_c2w(yaw, pitch, dist, viewer.target)
                        return viewer.renderer.get_outputs(
                            c2w, viewer.image_size, viewer.image_size)
                    gif = viewer.camera_path.render_gif(
                        render_pose, n_frames=30)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/gif")
                    self.end_headers()
                    self.wfile.write(gif)
                elif u.path == "/render":
                    q = parse_qs(u.query)
                    yaw = float(q.get("yaw", ["0"])[0])
                    pitch = float(q.get("pitch", ["-15"])[0])
                    dist = float(q.get("dist", ["6"])[0])
                    viewer.renderer.output_type = q.get("output",
                                                        ["rgb"])[0]
                    c2w = orbit_c2w(yaw, pitch, dist, viewer.target)
                    img = viewer.renderer.get_outputs(
                        c2w, viewer.image_size, viewer.image_size)
                    from PIL import Image
                    buf = io.BytesIO()
                    Image.fromarray(img).save(buf, "PNG")
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(buf.getvalue())
                else:
                    self.send_response(404)
                    self.end_headers()

        server = ThreadingHTTPServer((self.host, self.port), Handler)
        print(f"viewer (http fallback) at http://{self.host}:{self.port}")
        if block:
            server.serve_forever()
        else:
            threading.Thread(target=server.serve_forever,
                             daemon=True).start()
        return server
