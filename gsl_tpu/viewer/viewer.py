"""Interactive web viewer.

Parity target: /root/reference/internal/viewer/viewer.py:23-560 +
internal/viewer/client.py:12-162 (per-client render threads with low/high
resolution states) + internal/viewer/ui/ (transform / edit / camera-path /
distance-measurement panels). The reference's viser transport is replaced
BY DESIGN with a dependency-free HTTP server (viser does not ship in this
image): same ViewerRenderer path and panel operations, browser-native
controls.

Client-throttling parity (client.py low/high states): while the camera is
moving (requests arriving in quick succession) frames render at half
resolution; once idle, the next frame renders at full resolution. A
`max_fps` cap serves the cached frame when requests arrive faster than
the budget.
"""
from __future__ import annotations

import io
import json
import threading
import time
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
<details style="padding:8px"><summary>measure (click two points)</summary>
  <button onclick="measureMode=!measureMode;points=[];this.textContent=
    measureMode?'measuring: click image twice':'measure'">measure</button>
  <span id="measuremsg"></span>
</details>
<img id="view" style="width:100%" />
<script>
const img = document.getElementById('view');
let measureMode = false; let points = [];
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
  document.getElementById(id).addEventListener('input', refresh);
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
img.addEventListener('click', async (e) => {
  if (!measureMode) return;
  const r = img.getBoundingClientRect();
  points.push([(e.clientX - r.left) / r.width,
               (e.clientY - r.top) / r.height]);
  if (points.length == 2) {
    const q = `p1=${points[0]}&p2=${points[1]}&yaw=${val('yaw')}` +
      `&pitch=${val('pitch')}&dist=${val('dist')}`;
    const resp = await fetch(`/measure?${q}`);
    document.getElementById('measuremsg').textContent = await resp.text();
    points = [];
  } else {
    document.getElementById('measuremsg').textContent = 'point 1 set';
  }
});
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
                 image_size: int = 512, max_fps: float = 10.0,
                 moving_window_s: float = 0.4):
        state, renderer, sh_degree = GaussianModelLoader.load(model_path)
        self._base_state = state
        self.renderer = ViewerRenderer(state, renderer, sh_degree,
                                       background)
        from .panels import CameraPath
        self.camera_path = CameraPath()
        self.host, self.port = host, port
        self.image_size = image_size
        self.max_fps = max_fps
        self.moving_window_s = moving_window_s
        # throttling state (reference client.py low/high resolution states)
        self._last_request = 0.0
        self._last_render = 0.0
        self._cached_frame = None
        self._cache_key = None
        self._lock = threading.Lock()
        # center orbit on the scene
        alive = np.asarray(state.alive)
        self.target = np.asarray(state.params.means)[alive].mean(0)

    # ---- render with low/high-resolution throttling ----
    def render_frame(self, yaw, pitch, dist, output="rgb"):
        """Returns (png_bytes, resolution): half-res while the camera is
        moving, full-res when idle; cached frame when over the fps cap."""
        now = time.monotonic()
        key = (round(yaw, 3), round(pitch, 3), round(dist, 3), output)
        with self._lock:
            moving = (now - self._last_request) < self.moving_window_s
            self._last_request = now
            over_budget = (now - self._last_render) < 1.0 / self.max_fps
            if self._cached_frame is not None and (
                    over_budget or key == self._cache_key):
                return self._cached_frame
        size = self.image_size // 2 if moving else self.image_size
        self.renderer.output_type = output
        c2w = orbit_c2w(yaw, pitch, dist, self.target)
        img = self.renderer.get_outputs(c2w, size, size)
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "PNG")
        frame = (buf.getvalue(), size)
        with self._lock:
            self._last_render = time.monotonic()
            # only idle full-res frames are cacheable as "current"
            self._cached_frame = frame
            self._cache_key = key if not moving else None
        return frame

    # ---- distance measurement (reference ui/distance_measurement.py) ----
    def measure(self, yaw, pitch, dist, p1_uv, p2_uv):
        """Two image points (normalized uv) -> world distance via the
        rendered expected-depth map."""
        size = self.image_size
        c2w = orbit_c2w(yaw, pitch, dist, self.target)
        depth = self.renderer.get_depth(c2w, size, size)

        def unproject(uv):
            px = min(int(uv[0] * size), size - 1)
            py = min(int(uv[1] * size), size - 1)
            z = float(depth[py, px])
            f = 0.5 * size / np.tan(0.5 * np.deg2rad(60.0))
            d_cam = np.array([(px + 0.5 - size / 2) / f,
                              (py + 0.5 - size / 2) / f, 1.0]) * z
            return c2w[:3, :3] @ d_cam + c2w[:3, 3]

        a, b = unproject(p1_uv), unproject(p2_uv)
        return float(np.linalg.norm(a - b)), a, b

    def start(self, block: bool = True):
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
                    viewer._cached_frame = None
                    self._ok(b"ok")
                elif u.path == "/edit/delete_box":
                    from .panels import delete_in_box
                    q = parse_qs(u.query)
                    bmin = [float(x) for x in q["min"][0].split(",")]
                    bmax = [float(x) for x in q["max"][0].split(",")]
                    viewer.renderer.state, n = delete_in_box(
                        viewer.renderer.state, bmin, bmax)
                    viewer._cached_frame = None
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
                elif u.path == "/measure":
                    q = parse_qs(u.query)
                    p1 = [float(x) for x in q["p1"][0].split(",")]
                    p2 = [float(x) for x in q["p2"][0].split(",")]
                    d, a, b = viewer.measure(
                        float(q.get("yaw", ["0"])[0]),
                        float(q.get("pitch", ["-15"])[0]),
                        float(q.get("dist", ["6"])[0]), p1, p2)
                    self._ok(f"distance {d:.4f}".encode())
                elif u.path == "/render":
                    q = parse_qs(u.query)
                    png, _res = viewer.render_frame(
                        float(q.get("yaw", ["0"])[0]),
                        float(q.get("pitch", ["-15"])[0]),
                        float(q.get("dist", ["6"])[0]),
                        q.get("output", ["rgb"])[0])
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.end_headers()
                    self.wfile.write(png)
                else:
                    self.send_response(404)
                    self.end_headers()

        server = ThreadingHTTPServer((self.host, self.port), Handler)
        print(f"viewer at http://{self.host}:{self.port}")
        if block:
            server.serve_forever()
        else:
            threading.Thread(target=server.serve_forever,
                             daemon=True).start()
        return server
