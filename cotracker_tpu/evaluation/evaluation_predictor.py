"""Benchmark-protocol predictor (mirrors reference EvaluationPredictor,
cotracker/models/evaluation_predictor.py:25-199).

Two modes over the raw model:
  * joint: all queries at once, plus optional global-grid / SIFT / uniform
    support points that are stripped before metrics;
  * single_point: each query alone with a local 8x8 grid (extent 50px around
    the query) and a global 5x5 grid — the paper-exact protocol.
Visibility is fused with confidence (vis * conf) before thresholding.
"""

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cotracker_tpu.models.cotracker3 import CoTrackerThree
from cotracker_tpu.ops.bilinear import resize_bilinear
from cotracker_tpu.ops.samplers import (
    get_points_on_a_grid,
    get_uniformly_sampled_pts,
    get_sift_sampled_pts,
)

N_BUCKET = 64


def _round_up(n, m):
    return ((n + m - 1) // m) * m


class EvaluationPredictor:
    def __init__(
        self,
        model: CoTrackerThree,
        params,
        interp_shape: Tuple[int, int] = (384, 512),
        grid_size: int = 5,
        local_grid_size: int = 8,
        single_point: bool = True,
        sift_size: int = 0,
        num_uniformly_sampled_pts: int = 0,
        n_iters: int = 6,
        local_extent: int = 50,
    ):
        self.model = model
        self.params = params
        self.interp_shape = interp_shape
        self.grid_size = grid_size
        self.local_grid_size = local_grid_size
        self.single_point = single_point
        self.sift_size = sift_size
        self.num_uniformly_sampled_pts = num_uniformly_sampled_pts
        self.n_iters = n_iters
        self.local_extent = local_extent
        self._jit_cache = {}

    def _forward(self, T, n_pad):
        key = (T, n_pad)
        if key not in self._jit_cache:
            def fn(params, video, queries, track_mask):
                out = self.model.apply(
                    {"params": params}, video, queries, iters=self.n_iters,
                    track_mask=track_mask,
                )
                if len(out) == 3:  # legacy v2: (coords, vis, train_data) — no
                    # confidence head (reference evaluation_predictor.py:111-114)
                    return out[0], out[1], jnp.ones_like(out[1])
                coords, vis, conf, _ = out
                return coords, vis, conf

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _run_model(self, video_cl, queries):
        """video_cl (B, T, H, W, 3) at interp res; queries (B, n, 3) model px.
        Pads N to a bucket and runs the jitted forward."""
        B, T = video_cl.shape[:2]
        n = queries.shape[1]
        n_pad = _round_up(max(n, 1), N_BUCKET)
        qp = np.zeros((B, n_pad, 3), np.float32)
        qp[:, :n] = queries
        mask = np.zeros((B, n_pad), bool)
        mask[:, :n] = True
        fwd = self._forward(T, n_pad)
        out = fwd(
            self.params, jnp.asarray(video_cl), jnp.asarray(qp), jnp.asarray(mask)
        )
        # ONE batched device->host transfer: three separate np.asarray calls
        # are three tunnel round trips on remote backends (~100-300 ms each)
        coords, vis, conf = jax.device_get(out)
        return coords[:, :, :n], vis[:, :, :n], conf[:, :, :n]

    def __call__(self, video, queries):
        """video (B, T, 3, H, W) [0,255]; queries (B, N, 3) (t, x, y) at input
        resolution. Returns (tracks (B,T,N,2) at input res, vis*conf)."""
        queries = np.array(queries, np.float32, copy=True)
        B, T, C, H, W = video.shape
        ih, iw = self.interp_shape
        assert B == 1

        # keep the resized video DEVICE-resident: materializing it to numpy
        # (pre-round-5) cost a full download + re-upload per call — over the
        # ~30 MB/s axon tunnel that was ~2.5 s of a ~3 s teacher forward at
        # the distill shape (38 MB of video each way)
        if isinstance(video, jnp.ndarray):
            video_j = video
        else:
            video_j = jnp.asarray(np.asarray(video, np.float32))
        # jitted transpose+resize (cached per input shape): each EAGER op is
        # a full dispatch round trip on remote-compile backends
        key = ("resize", video_j.shape)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda v: resize_bilinear(
                    v.astype(jnp.float32).transpose(0, 1, 3, 4, 2),
                    (ih, iw), align_corners=True,
                )
            )
        video_cl = self._jit_cache[key](video_j)
        queries[:, :, 1] *= (iw - 1) / (W - 1)
        queries[:, :, 2] *= (ih - 1) / (H - 1)

        if self.single_point:
            N = queries.shape[1]
            traj = np.zeros((B, T, N, 2), np.float32)
            vis = np.zeros((B, T, N), np.float32)
            conf = np.zeros((B, T, N), np.float32)
            for pind in range(N):
                t, v, c = self._process_one_point(video_cl, queries[:, pind : pind + 1])
                traj[:, :, pind] = t[:, :, 0]
                vis[:, :, pind] = v[:, :, 0]
                conf[:, :, pind] = c[:, :, 0]
        else:
            n_user = queries.shape[1]
            extra = 0
            q = queries
            if self.grid_size > 0:
                xy = np.asarray(get_points_on_a_grid(self.grid_size, (ih, iw)))
                xy = np.concatenate([np.zeros_like(xy[:, :, :1]), xy], axis=2)
                q = np.concatenate([q, xy], axis=1)
                extra += xy.shape[1]
            if self.num_uniformly_sampled_pts > 0:
                xy = np.asarray(
                    get_uniformly_sampled_pts(self.num_uniformly_sampled_pts, T, (ih, iw))
                )
                q = np.concatenate([q, xy], axis=1)
                extra += xy.shape[1]
            if self.sift_size > 0:
                # SIFT runs on host pixels (cv2) — this download is the
                # feature extractor's input, not a round trip
                xy = np.asarray(
                    get_sift_sampled_pts(
                        np.asarray(video_cl).astype(np.uint8),
                        self.sift_size, T, (ih, iw),
                    )
                )
                if xy.shape[1] == self.sift_size:
                    q = np.concatenate([q, xy], axis=1)
                    extra += xy.shape[1]
            traj, vis, conf = self._run_model(video_cl, q)
            if extra:
                traj = traj[:, :, :n_user]
                vis = vis[:, :, :n_user]
                conf = conf[:, :, :n_user]

        traj = traj * np.array(
            [(W - 1) / float(iw - 1), (H - 1) / float(ih - 1)], np.float32
        )
        return traj, vis * conf

    def _process_one_point(self, video_cl, query):
        """Single-point protocol: query + local grid around it + global grid
        (reference evaluation_predictor.py:146-199)."""
        ih, iw = self.interp_shape
        T = video_cl.shape[1]
        q = query
        if self.local_grid_size > 0:
            xy = np.asarray(
                get_points_on_a_grid(
                    self.local_grid_size,
                    (self.local_extent, self.local_extent),
                    center=[query[0, 0, 2], query[0, 0, 1]],
                )
            )
            xy = np.concatenate([np.zeros_like(xy[:, :, :1]), xy], axis=2)
            q = np.concatenate([q, xy], axis=1)
        if self.grid_size > 0:
            xy = np.asarray(get_points_on_a_grid(self.grid_size, (ih, iw)))
            xy = np.concatenate([np.zeros_like(xy[:, :, :1]), xy], axis=2)
            q = np.concatenate([q, xy], axis=1)
        if self.num_uniformly_sampled_pts > 0:
            xy = np.asarray(
                get_uniformly_sampled_pts(self.num_uniformly_sampled_pts, T, (ih, iw))
            )
            q = np.concatenate([q, xy], axis=1)
        return self._run_model(video_cl, q)
