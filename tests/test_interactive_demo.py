"""Interactive demo (stdlib web app — the gradio_demo/app.py equivalent):
page + first frame served, a /track POST with clicked points runs the
predictor and renders a playable mp4 result."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def demo_server(tmp_path_factory):
    from http.server import ThreadingHTTPServer

    from interactive_demo import DemoState, make_handler
    from cotracker_tpu.predictor import CoTrackerPredictor

    tmp = tmp_path_factory.mktemp("demo")
    path = os.path.join(tmp, "clip.mp4")
    rng = np.random.default_rng(0)
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 36))
    for _ in range(8):
        wr.write((rng.random((36, 48, 3)) * 255).astype(np.uint8))
    wr.release()

    state = DemoState(path, max_frames=8, checkpoint=None, online=False)
    # small model for CPU test speed (the default is the 384x512 flagship)
    state._pred = CoTrackerPredictor(window_len=8, model_resolution=(32, 48))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


def test_page_and_frame(demo_server):
    base, _ = demo_server
    page = urllib.request.urlopen(base + "/").read().decode()
    assert "canvas" in page and "/track" in page
    jpg = urllib.request.urlopen(base + "/frame.jpg").read()
    assert jpg[:2] == b"\xff\xd8"  # JPEG magic


def test_track_points_and_grid(demo_server):
    base, state = demo_server
    # clicked points
    req = urllib.request.Request(
        base + "/track",
        data=json.dumps({"points": [[10, 12], [30, 20]], "grid_size": 0}).encode(),
        method="POST",
    )
    out = json.loads(urllib.request.urlopen(req).read())
    assert out["n_tracks"] == 2 and out["n_frames"] == 8
    vid = urllib.request.urlopen(base + "/result.mp4").read()
    assert len(vid) > 500  # a real mp4 came back
    # grid fallback (no points)
    req = urllib.request.Request(
        base + "/track",
        data=json.dumps({"points": [], "grid_size": 3}).encode(),
        method="POST",
    )
    out = json.loads(urllib.request.urlopen(req).read())
    assert out["n_tracks"] == 9
