"""Parity of the online (streaming) tracker vs the reference, driven the same
way the reference evaluator drives it (evaluator.py:234-253): overlapping
S-frame chunks sliding by step = S//2."""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import requires_reference

torch = pytest.importorskip("torch")

from cotracker_tpu.models.cotracker3 import CoTrackerThree  # noqa: E402
from cotracker_tpu.models.checkpoint import import_torch_state_dict  # noqa: E402


@requires_reference
class TestOnlineParity:
    def _make_pair(self, window_len=8):
        from cotracker.models.core.cotracker.cotracker3_online import CoTrackerThreeOnline

        torch.manual_seed(11)
        ref = CoTrackerThreeOnline(
            stride=4, corr_radius=3, window_len=window_len, model_resolution=(48, 64)
        ).eval()
        params = import_torch_state_dict(ref.state_dict())
        ours = CoTrackerThree(window_len=window_len, model_resolution=(48, 64))
        return ref, ours, params

    def test_streaming_matches_reference(self):
        ref, ours, params = self._make_pair()
        S = 8
        step = S // 2
        rng = np.random.default_rng(12)
        B, T, H, W, N = 1, 20, 48, 64, 6
        video = (rng.random((B, T, 3, H, W)) * 255).astype(np.float32)
        queries = np.stack(
            [
                np.array([[0, 0, 3, 9, 11, 14]], np.float32)[0][None].repeat(B, 0),
                rng.random((B, N)) * (W - 1),
                rng.random((B, N)) * (H - 1),
            ],
            axis=-1,
        ).astype(np.float32)[0][None]

        # ---- reference streaming
        ref.init_video_online_processing()
        with torch.no_grad():
            for ind in range(0, T - step, step):
                chunk = torch.from_numpy(video[:, ind : ind + S])
                ref_coords, ref_vis, ref_conf, _ = ref(
                    chunk, torch.from_numpy(queries), iters=2, is_online=True
                )
        ref_coords = ref_coords.numpy()
        ref_vis = ref_vis.numpy()
        ref_conf = ref_conf.numpy()

        # ---- ours: explicit carry
        video_cl = video.transpose(0, 1, 3, 4, 2)
        capacity = 32
        state = ours.apply(
            {"params": params}, B, N, capacity, method=CoTrackerThree.online_init
        )
        for ind in range(0, T - step, step):
            state, coords, vis, conf = ours.apply(
                {"params": params},
                state,
                jnp.asarray(video_cl[:, ind : ind + S]),
                jnp.asarray(queries),
                iters=2,
                method=CoTrackerThree.online_step,
            )

        np.testing.assert_allclose(
            np.asarray(coords)[:, :T], ref_coords, rtol=1e-3, atol=5e-2
        )
        np.testing.assert_allclose(np.asarray(vis)[:, :T], ref_vis, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(conf)[:, :T], ref_conf, rtol=1e-3, atol=1e-3)
