"""Pseudo-label distillation mechanics (BASELINE config 5 on synthetic data):
teacher ensemble -> pseudo labels -> student step with frozen vis_conf_head."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cotracker_tpu.models.cotracker3 import CoTrackerThree
from cotracker_tpu.models.build import init_params
from cotracker_tpu.training.distill import (
    DistillConfig,
    TeacherEnsemble,
    distill_step_fn,
    make_distill_optimizer,
    sample_distill_queries,
)


class TestDistill:
    def test_distill_step_freezes_vis_conf_head(self):
        model = CoTrackerThree(window_len=8, model_resolution=(32, 32))
        params = init_params(model)
        cfg = DistillConfig(iters=2, num_steps=10)
        tx = make_distill_optimizer(params, cfg)
        opt_state = tx.init(params)
        step = jax.jit(distill_step_fn(model, tx, cfg))

        rng = np.random.default_rng(0)
        B, T, H, W, N = 1, 8, 32, 32, 8
        video = jnp.asarray(rng.random((B, T, H, W, 3), np.float32) * 255)
        queries = jnp.asarray(
            np.stack(
                [np.zeros((B, N)), rng.random((B, N)) * 31, rng.random((B, N)) * 31],
                axis=-1,
            ).astype(np.float32)
        )
        teacher_tracks = jnp.asarray(rng.random((B, T, N, 2), np.float32) * 28)
        teacher_vis = jnp.asarray(np.ones((B, T, N), np.float32))

        head_before = jax.tree_util.tree_map(
            np.asarray, params["iter_core"]["updateformer"]["vis_conf_head"]
        )
        flow_before = np.asarray(params["iter_core"]["updateformer"]["flow_head"]["kernel"])

        losses = []
        for _ in range(4):
            params, opt_state, aux = step(
                params, opt_state, video, queries, teacher_tracks, teacher_vis
            )
            losses.append(float(aux["total_loss"]))

        assert np.isfinite(losses).all()
        assert min(losses) < losses[0], losses
        # frozen head unchanged, flow head trained
        head_after = params["iter_core"]["updateformer"]["vis_conf_head"]
        np.testing.assert_array_equal(np.asarray(head_after["kernel"]), head_before["kernel"])
        np.testing.assert_array_equal(np.asarray(head_after["bias"]), head_before["bias"])
        assert not np.array_equal(
            np.asarray(params["iter_core"]["updateformer"]["flow_head"]["kernel"]), flow_before
        )

    def test_teacher_ensemble_strips_support_points(self):
        calls = []

        def fake_teacher(video, queries):
            calls.append(queries.shape[1])
            T = video.shape[1]
            n = queries.shape[1]
            return np.zeros((1, T, n, 2)), np.ones((1, T, n))

        ens = TeacherEnsemble([fake_teacher], support_grid_size=3)
        video = np.zeros((1, 4, 3, 32, 32), np.float32)
        queries = np.zeros((1, 7, 3), np.float32)
        tracks, vis = ens.pseudo_label(video, queries)
        assert calls[0] == 7 + 9  # user + 3x3 support grid
        assert tracks.shape[2] == 7 and vis.shape[2] == 7

    def test_query_sampler_fallback(self):
        rng = np.random.default_rng(1)
        video = (rng.random((1, 6, 3, 48, 64)) * 255).astype(np.float32)
        q = sample_distill_queries(video, 32, rng)
        assert q.shape == (1, 32, 3)
        assert (q[..., 0] >= 0).all() and (q[..., 0] < 6).all()
        assert (q[..., 1] <= 64).all() and (q[..., 2] <= 48).all()


def test_superpoint_query_sampling_with_injected_extractor():
    """SuperPoint sampler semantics (reference model_utils.py:36-52) with a
    stand-in detector: frames from the first 25%, per-frame cap, truncation,
    and the uniform fallback in sample_distill_queries."""
    import numpy as np
    from cotracker_tpu.training.distill import sample_distill_queries

    rng = np.random.default_rng(0)
    video = (rng.random((1, 20, 3, 32, 48)) * 255).astype(np.float32)

    def fake_extract(frame):
        h, w = frame.shape[:2]
        return np.stack([rng.random(5) * (w - 1), rng.random(5) * (h - 1)], -1)

    q = sample_distill_queries(
        video, 64, rng, method="superpoint", superpoint_extract_fn=fake_extract
    )
    assert q.shape == (1, 64, 3)
    # keypoint frames all in the first 25%; fallback rows may be anywhere
    kp = q[0, : 8 * 5]
    assert (kp[:, 0] < 5).all()
    assert (kp[:, 1] <= 47).all() and (kp[:, 2] <= 31).all()
