"""Quasi-dense joint tracking: 265x265 (= 70,225) points (BASELINE config 3,
reference README.md:38 capacity claim).

At T=60 offline the (B, N, T, 1110) token tensor alone would be ~9.4 GB in
bf16 — the reference itself can only hold this workload with the ONLINE
(window-16) model, and so do we on a 16 GB chip: this benchmark drives the
online predictor with a 265x265 masked grid through a sliding-window stream
at 384x512 and reports points*frames/s plus peak device memory.

Run on the real TPU: python scripts/bench_quasidense.py [--frames 32]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=265)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--fast", action="store_true", default=True)
    p.add_argument("--no-fast", dest="fast", action="store_false")
    # shard the 70k tracks over this many chips (jax.shard_map; the
    # virtual-token psum is the only collective) — needs that many devices
    p.add_argument("--track_shards", type=int, default=1)
    # trace ONE steady window into this directory and print the device
    # accounting instead of the throughput loop
    p.add_argument("--trace", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from cotracker_tpu.predictor import CoTrackerOnlinePredictor
    from cotracker_tpu.ops.samplers import get_points_on_a_grid

    T = args.frames
    H, W = 384, 512
    rng = np.random.default_rng(0)
    video = (rng.random((1, T, 3, H, W)) * 255).astype(np.float32)

    # full_buffers + device-resident stream: the growing per-step output
    # slice recompiles a fresh executable per window (seconds each over a
    # remote-compile tunnel) and np chunks re-upload 50 MB per window —
    # neither is part of the tracker's actual work
    mesh = None
    if args.track_shards > 1:
        from cotracker_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((1, args.track_shards))
    pred = CoTrackerOnlinePredictor(
        window_len=16, capacity=max(64, T + 16), fast=args.fast,
        return_full_buffers=True, mesh=mesh,
    )
    video_dev = jnp.asarray(video)
    grid = np.asarray(get_points_on_a_grid(args.grid, (H, W)))  # (1, grid^2, 2)
    queries = np.concatenate(
        [np.zeros_like(grid[:, :, :1]), grid], axis=2
    ).astype(np.float32)
    N = queries.shape[1]
    print(f"tracking {N} points ({args.grid}x{args.grid}) through {T} frames")

    pred(video[:, :1], is_first_step=True, queries=queries)
    step = pred.step

    def sync(tracks):
        # forced scalar readback: block_until_ready does NOT synchronize
        # over remote-tunnel backends (BASELINE.md round-3 notes)
        return float(np.asarray(tracks[0, -1, 0, 0]))

    # first window: compile
    t0 = time.time()
    tracks, vis = pred(video_dev[:, 0 : 2 * step])
    sync(tracks)
    print(f"first window (compile): {time.time() - t0:.1f}s")

    if args.trace:
        # steady-state window device accounting (VERDICT r3 item 2): warm
        # one more window, then trace a single step and publish device-busy
        # vs wall via the trace_forward parser
        tracks, _ = pred(video_dev[:, step : 3 * step])
        sync(tracks)
        from trace_forward import parse

        jax.profiler.start_trace(args.trace)
        t0 = time.time()
        tracks, _ = pred(video_dev[:, 2 * step : 4 * step])
        sync(tracks)
        wall = time.time() - t0
        jax.profiler.stop_trace()
        print(f"traced steady window wall: {wall:.3f} s", flush=True)
        parse(args.trace)
        return

    windows = 0
    t0 = time.time()
    for ind in range(step, T - step, step):
        tracks, vis = pred(video_dev[:, ind : ind + 2 * step])
        windows += 1
    sync(tracks)
    dt = time.time() - t0
    # valid predictions live on [0, pred.frames_seen) of the full buffers
    tracks = tracks[:, : pred.frames_seen]
    frames = windows * step
    pfs = N * frames / dt

    mem = {}
    try:
        stats = jax.devices()[0].memory_stats()
        mem = {
            "peak_bytes_in_use_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 2),
            "bytes_limit_gb": round(stats.get("bytes_limit", 0) / 2**30, 2),
        }
    except Exception:
        pass

    out = {
        "metric": "quasidense_points_frames_per_sec",
        "grid": f"{args.grid}x{args.grid}",
        "points": int(N),
        "frames_timed": int(frames),
        "seconds": round(dt, 3),
        "value": round(pfs, 1),
        "unit": "points*frames/s",
        **mem,
    }
    print(json.dumps(out))
    assert np.isfinite(np.asarray(tracks)).all()


if __name__ == "__main__":
    main()
