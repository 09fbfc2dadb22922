"""Interactive point-tracking demo — the reference gradio app
(/root/reference/gradio_demo/app.py) rebuilt on the standard library (no
gradio/flask in this environment; zero extra dependencies).

Serves a single page: the video's first frame on a canvas; click to add
query points (or use a regular grid), hit "Track", and the rendered track
overlay video plays back. Mirrors the reference app's behavior: queries at
frame 0, frame cap (app.py caps at 300 frames), preview-scale rendering,
grid fallback when no points are clicked.

Usage:
    python interactive_demo.py [--video /root/reference/assets/apple.mp4]
        [--port 7860] [--max_frames 60] [--checkpoint scaled_offline.pth]

Then open http://localhost:7860/. Tracking runs on whatever backend JAX
sees (the real TPU here); the first click of "Track" pays the compile.
"""

import argparse
import io
import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

PAGE = """<!doctype html>
<html><head><title>cotracker_tpu interactive demo</title><style>
 body { font-family: sans-serif; margin: 2em; background: #111; color: #eee; }
 canvas { border: 1px solid #555; cursor: crosshair; }
 button, input { margin: 0.3em; }
 #status { margin-left: 1em; color: #8bc34a; }
</style></head><body>
<h2>cotracker_tpu — interactive tracking</h2>
<p>Click points on the first frame (queries at frame 0), or leave empty and
set a grid size. Then Track.</p>
<div>
  <canvas id="cv"></canvas>
</div>
<div>
  <button onclick="clearPts()">Clear points</button>
  grid size (used when no points): <input id="grid" type="number" value="10" min="0" max="40" style="width:4em">
  <label><input id="bwd" type="checkbox"> backward tracking</label>
  <button onclick="track()">Track</button>
  <span id="status"></span>
</div>
<div id="out"></div>
<script>
const cv = document.getElementById('cv'), ctx = cv.getContext('2d');
const img = new Image(); let pts = [];
img.onload = () => { cv.width = img.width; cv.height = img.height; draw(); };
img.src = '/frame.jpg';
function draw() {
  ctx.drawImage(img, 0, 0);
  ctx.fillStyle = '#ff4081';
  for (const p of pts) { ctx.beginPath(); ctx.arc(p[0], p[1], 4, 0, 7); ctx.fill(); }
}
cv.addEventListener('click', e => {
  const r = cv.getBoundingClientRect();
  pts.push([e.clientX - r.left, e.clientY - r.top]); draw();
});
function clearPts() { pts = []; draw(); }
async function track() {
  document.getElementById('status').textContent = 'tracking... (first run compiles, ~minutes on TPU)';
  const body = JSON.stringify({points: pts,
    grid_size: +document.getElementById('grid').value,
    backward: document.getElementById('bwd').checked});
  const r = await fetch('/track', {method: 'POST', body});
  if (!r.ok) { document.getElementById('status').textContent = 'error: ' + await r.text(); return; }
  const j = await r.json();
  document.getElementById('status').textContent =
    `tracked ${j.n_tracks} points over ${j.n_frames} frames in ${j.seconds.toFixed(1)} s`;
  document.getElementById('out').innerHTML =
    `<video controls autoplay loop src="/result.mp4?ts=${Date.now()}" width="${cv.width}"></video>`;
}
</script></body></html>
"""


class DemoState:
    """Video + predictor, shared by requests (tracking is serialized)."""

    def __init__(self, video_path, max_frames, checkpoint, online):
        import cv2

        cap = cv2.VideoCapture(video_path)
        frames = []
        # reference app caps the clip length (gradio_demo/app.py limits to
        # 300 frames); we default tighter for the demo
        while len(frames) < max_frames:
            ok, fr = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
        cap.release()
        if not frames:
            raise SystemExit(f"could not read frames from {video_path}")
        self.video = np.stack(frames)[None].transpose(0, 1, 4, 2, 3).astype(np.float32)
        self.first_frame = frames[0]
        self.online = online
        self.checkpoint = checkpoint
        self._pred = None
        self.lock = threading.Lock()
        self.result_path = os.path.join(tempfile.gettempdir(), "cotracker_demo_result.mp4")

    def predictor(self):
        if self._pred is None:
            from cotracker_tpu.predictor import CoTrackerPredictor

            self._pred = CoTrackerPredictor(checkpoint=self.checkpoint)
        return self._pred

    def track(self, points, grid_size, backward):
        import time

        from cotracker_tpu.utils.visualizer import Visualizer

        t0 = time.time()
        pred = self.predictor()
        if points:
            queries = np.asarray(
                [[0.0, float(x), float(y)] for x, y in points], np.float32
            )[None]
            tracks, vis = pred(
                self.video, queries=queries, backward_tracking=backward
            )
        else:
            tracks, vis = pred(
                self.video, grid_size=max(1, int(grid_size)),
                backward_tracking=backward,
            )
        viz = Visualizer(save_dir=tempfile.gettempdir(), fps=12,
                         show_first_frame=3, tracks_leave_trace=-1)
        frames = viz.visualize(
            self.video, tracks, vis, filename="cotracker_demo_result",
            save_video=False,
        )
        self._write_mp4(np.asarray(frames))
        return {
            "n_tracks": int(np.asarray(tracks).shape[2]),
            "n_frames": int(np.asarray(tracks).shape[1]),
            "seconds": time.time() - t0,
        }

    def _write_mp4(self, frames):
        import cv2

        h, w = frames.shape[1:3]
        wr = cv2.VideoWriter(
            self.result_path, cv2.VideoWriter_fourcc(*"mp4v"), 12, (w, h)
        )
        for fr in frames:
            wr.write(cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        wr.release()


def make_handler(state: DemoState):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, body, ctype="text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            import cv2

            if self.path == "/" or self.path.startswith("/index"):
                self._send(200, PAGE.encode())
            elif self.path.startswith("/frame.jpg"):
                ok, buf = cv2.imencode(
                    ".jpg", cv2.cvtColor(state.first_frame, cv2.COLOR_RGB2BGR)
                )
                self._send(200, buf.tobytes(), "image/jpeg")
            elif self.path.startswith("/result.mp4"):
                try:
                    with open(state.result_path, "rb") as f:
                        self._send(200, f.read(), "video/mp4")
                except FileNotFoundError:
                    self._send(404, b"no result yet", "text/plain")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/track":
                self._send(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            try:
                with state.lock:  # one tracking job at a time
                    out = state.track(
                        req.get("points") or [],
                        req.get("grid_size", 10),
                        bool(req.get("backward")),
                    )
                self._send(200, json.dumps(out).encode(), "application/json")
            except Exception as e:  # surface errors to the page
                self._send(500, str(e).encode(), "text/plain")

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default="/root/reference/assets/apple.mp4")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--max_frames", type=int, default=48)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--online", action="store_true",
                    help="reserved: streaming predictor variant")
    args = ap.parse_args()

    state = DemoState(args.video, args.max_frames, args.checkpoint, args.online)
    srv = ThreadingHTTPServer(("0.0.0.0", args.port), make_handler(state))
    print(f"serving on http://localhost:{args.port}/  (video: {args.video}, "
          f"{state.video.shape[1]} frames)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
