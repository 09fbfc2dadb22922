"""Query-point samplers: regular grids, uniform random, SIFT keypoints.

Mirrors the sampler family in reference model_utils.py:22-139.
"""

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp


def get_points_on_a_grid(size: int, extent: Tuple[float, ...], center: Optional[Tuple[float, ...]] = None):
    """A size x size grid of (x, y) points covering `extent` = (H, W) with a
    margin of W/64 from the border; row-major order. Returns (1, size*size, 2).

    Mirrors reference `get_points_on_a_grid` (model_utils.py:83-139).
    """
    if size == 1:
        return jnp.asarray([[[extent[1] / 2, extent[0] / 2]]], dtype=jnp.float32)

    if center is None:
        center = [extent[0] / 2, extent[1] / 2]

    margin = extent[1] / 64
    range_y = (margin - extent[0] / 2 + center[0], extent[0] / 2 + center[0] - margin)
    range_x = (margin - extent[1] / 2 + center[1], extent[1] / 2 + center[1] - margin)
    grid_y, grid_x = np.meshgrid(
        np.linspace(range_y[0], range_y[1], size),
        np.linspace(range_x[0], range_x[1], size),
        indexing="ij",
    )
    pts = np.stack([grid_x, grid_y], axis=-1).reshape(1, -1, 2)
    return jnp.asarray(pts, dtype=jnp.float32)


def get_uniformly_sampled_pts(size: int, num_frames: int, extent: Tuple[float, ...], rng: Optional[np.random.Generator] = None):
    """Random (t, x, y) queries: t uniform over frames, (x, y) uniform over
    extent = (H, W). Returns (1, size, 3).

    Mirrors reference `get_uniformly_sampled_pts` (model_utils.py:22-33).
    """
    rng = rng or np.random.default_rng()
    t = rng.integers(0, num_frames, size=(size, 1)).astype(np.float32)
    xy = rng.random((size, 2)).astype(np.float32) * np.asarray([extent[1], extent[0]], np.float32)
    return jnp.asarray(np.concatenate([t, xy], axis=1)[None])


def get_sift_sampled_pts(
    video,
    size: int,
    num_frames: int,
    extent: Tuple[float, ...],
    num_sampled_frames: int = 8,
    sampling_length_percent: float = 0.25,
    rng: Optional[np.random.Generator] = None,
):
    """SIFT keypoints as (t, x, y) queries, sampled from the first
    `sampling_length_percent` of frames. `video` is (1, T, H, W, 3) uint8-like.

    Mirrors reference `get_sift_sampled_pts` (model_utils.py:55-80). Requires
    opencv; raises ImportError when cv2 is unavailable.
    """
    import cv2  # gated: only needed for SIFT query sampling

    rng = rng or np.random.default_rng()
    sift = cv2.SIFT_create(nfeatures=size // num_sampled_frames)
    points = []
    for _ in range(num_sampled_frames):
        frame_num = int(rng.integers(0, max(int(num_frames * sampling_length_percent), 1)))
        frame = np.asarray(video[0, frame_num]).astype(np.uint8)
        key_points, _ = sift.detectAndCompute(frame, None)
        for kp in key_points:
            points.append([frame_num, int(kp.pt[0]), int(kp.pt[1])])
    if not points:
        return jnp.zeros((1, 0, 3), dtype=jnp.float32)
    return jnp.asarray(np.asarray(points[:size], dtype=np.float32)[None])


def get_superpoint_sampled_pts(
    video,
    size: int,
    num_frames: int,
    extent: Tuple[float, ...],
    num_sampled_frames: int = 8,
    sampling_length_percent: float = 0.25,
    max_num_keypoints: int = 48,
    rng: Optional[np.random.Generator] = None,
    extract_fn=None,
):
    """SuperPoint keypoints as (t, x, y) queries from the first
    `sampling_length_percent` of frames. `video` is (1, T, H, W, 3) in
    [0, 255]. Returns (1, <=size, 3).

    Mirrors reference `get_superpoint_sampled_pts` (model_utils.py:36-52):
    up to `max_num_keypoints` keypoints from each of `num_sampled_frames`
    random early frames, concatenated and truncated to `size`.

    extract_fn: optional `(frame_hw3_float01) -> (K, 2) xy array` — by
    default builds a SuperPoint extractor from the `lightglue` package
    (what the reference uses; needs its pretrained weights), so tests and
    weightless environments can inject a stand-in detector.
    """
    rng = rng or np.random.default_rng()
    if extract_fn is None:
        import torch
        from lightglue import SuperPoint  # gated optional dependency

        extractor = SuperPoint(max_num_keypoints=max_num_keypoints).eval()

        def extract_fn(frame):
            with torch.no_grad():
                t = torch.from_numpy(np.ascontiguousarray(frame)).permute(2, 0, 1).float()
                out = extractor.extract(t, resize=None)
            return out["keypoints"][0].cpu().numpy()

    points = []
    for _ in range(num_sampled_frames):
        frame_num = int(rng.integers(0, max(int(num_frames * sampling_length_percent), 1)))
        frame = np.asarray(video[0, frame_num], np.float32) / 255.0
        kps = np.asarray(extract_fn(frame), np.float32)[:max_num_keypoints]
        for xy in kps:
            points.append([frame_num, xy[0], xy[1]])
    if not points:
        return jnp.zeros((1, 0, 3), dtype=jnp.float32)
    return jnp.asarray(np.asarray(points[:size], dtype=np.float32)[None])
