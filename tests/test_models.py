"""Golden-parity tests: encoder / updateformer / full offline model vs the
reference torch implementation with identical weights.

Each test instantiates the reference module on CPU (random torch init),
imports its state_dict through models/checkpoint.py, and requires numerical
agreement on identical inputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import requires_reference

torch = pytest.importorskip("torch")

from cotracker_tpu.models.blocks import BasicEncoder  # noqa: E402
from cotracker_tpu.models.updateformer import EfficientUpdateFormer  # noqa: E402
from cotracker_tpu.models.cotracker3 import CoTrackerThree  # noqa: E402
from cotracker_tpu.models.checkpoint import import_torch_state_dict  # noqa: E402


def _np(x):
    return np.asarray(x)


@requires_reference
class TestEncoderParity:
    def test_basic_encoder(self):
        from cotracker.models.core.cotracker.blocks import BasicEncoder as RefEncoder

        torch.manual_seed(0)
        ref = RefEncoder(input_dim=3, output_dim=128, stride=4).eval()

        sd = {f"fnet.{k}": v for k, v in ref.state_dict().items()}
        params = import_torch_state_dict(sd)["fnet"]

        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 64, 96, 3)).astype(np.float32)

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

        enc = BasicEncoder(output_dim=128, stride=4)
        out = enc.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(
            _np(out).transpose(0, 3, 1, 2), ref_out, rtol=1e-3, atol=1e-4
        )


@requires_reference
class TestUpdateFormerParity:
    def _make_pair(self):
        from cotracker.models.core.cotracker.cotracker import (
            EfficientUpdateFormer as RefUF,
        )

        torch.manual_seed(1)
        ref = RefUF(
            space_depth=3,
            time_depth=3,
            input_dim=1110,
            hidden_size=384,
            output_dim=4,
            mlp_ratio=4.0,
            num_virtual_tracks=64,
            add_space_attn=True,
            linear_layer_for_vis_conf=True,
        ).eval()
        sd = {f"updateformer.{k}": v for k, v in ref.state_dict().items()}
        params = import_torch_state_dict(sd)["iter_core"]["updateformer"]
        ours = EfficientUpdateFormer()
        return ref, ours, params

    def test_forward(self):
        ref, ours, params = self._make_pair()
        rng = np.random.default_rng(2)
        B, N, T = 1, 7, 8
        x = (rng.standard_normal((B, N, T, 1110)) * 0.5).astype(np.float32)

        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), add_space_attn=True).numpy()
        out = ours.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(_np(out), ref_out, rtol=1e-3, atol=1e-4)

    def test_forward_no_space_attn(self):
        ref, ours, params = self._make_pair()
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((2, 5, 6, 1110)) * 0.5).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x), add_space_attn=False).numpy()
        out = ours.apply({"params": params}, jnp.asarray(x), add_space_attn=False)
        np.testing.assert_allclose(_np(out), ref_out, rtol=1e-3, atol=1e-4)

    def test_padding_invariance(self):
        """Padding N with junk tracks + track_mask must not change real outputs
        — the property our static-shape/track-sharded design relies on."""
        _, ours, params = self._make_pair()
        rng = np.random.default_rng(4)
        B, N, T, PAD = 1, 6, 5, 4
        x = (rng.standard_normal((B, N, T, 1110)) * 0.5).astype(np.float32)
        base = ours.apply({"params": params}, jnp.asarray(x))

        xpad = np.concatenate(
            [x, 13.0 * rng.standard_normal((B, PAD, T, 1110)).astype(np.float32)], axis=1
        )
        mask = jnp.asarray(
            np.concatenate([np.ones((B, N)), np.zeros((B, PAD))], axis=1).astype(bool)
        )
        padded = ours.apply({"params": params}, jnp.asarray(xpad), track_mask=mask)
        np.testing.assert_allclose(_np(padded)[:, :N], _np(base), rtol=1e-4, atol=1e-5)


@requires_reference
class TestModelParity:
    def _make_pair(self, window_len=60):
        from cotracker.models.core.cotracker.cotracker3_offline import (
            CoTrackerThreeOffline,
        )

        torch.manual_seed(5)
        ref = CoTrackerThreeOffline(
            stride=4, corr_radius=3, window_len=window_len, model_resolution=(384, 512)
        ).eval()
        params = import_torch_state_dict(ref.state_dict())
        ours = CoTrackerThree(window_len=window_len)
        return ref, ours, params

    def test_offline_forward(self):
        ref, ours, params = self._make_pair()
        rng = np.random.default_rng(6)
        B, T, H, W, N = 1, 8, 64, 96, 5
        video = (rng.random((B, T, 3, H, W)) * 255).astype(np.float32)
        queries = np.stack(
            [
                rng.integers(0, T, (B, N)).astype(np.float32),
                rng.random((B, N)) * (W - 1),
                rng.random((B, N)) * (H - 1),
            ],
            axis=-1,
        ).astype(np.float32)

        with torch.no_grad():
            ref_coords, ref_vis, ref_conf, _ = ref(
                torch.from_numpy(video), torch.from_numpy(queries), iters=2
            )

        coords, vis, conf, _ = ours.apply(
            {"params": params},
            jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(queries),
            iters=2,
        )
        np.testing.assert_allclose(_np(coords), ref_coords.numpy(), rtol=1e-3, atol=2e-2)
        np.testing.assert_allclose(_np(vis), ref_vis.numpy(), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(_np(conf), ref_conf.numpy(), rtol=1e-3, atol=1e-3)

    def test_offline_padding_invariance(self):
        _, ours, params = self._make_pair()
        rng = np.random.default_rng(7)
        B, T, H, W, N, PAD = 1, 4, 32, 32, 3, 5
        video = (rng.random((B, T, H, W, 3)) * 255).astype(np.float32)
        queries = np.stack(
            [
                rng.integers(0, T, (B, N)).astype(np.float32),
                rng.random((B, N)) * (W - 1),
                rng.random((B, N)) * (H - 1),
            ],
            axis=-1,
        ).astype(np.float32)

        base_coords, base_vis, *_ = ours.apply(
            {"params": params}, jnp.asarray(video), jnp.asarray(queries), iters=2
        )
        qpad = np.concatenate(
            [queries, np.stack(
                [np.zeros((B, PAD)), rng.random((B, PAD)) * W, rng.random((B, PAD)) * H],
                axis=-1,
            ).astype(np.float32)],
            axis=1,
        )
        mask = jnp.asarray(
            np.concatenate([np.ones((B, N)), np.zeros((B, PAD))], axis=1).astype(bool)
        )
        pc, pv, *_ = ours.apply(
            {"params": params}, jnp.asarray(video), jnp.asarray(qpad), iters=2, track_mask=mask
        )
        np.testing.assert_allclose(_np(pc)[:, :, :N], _np(base_coords), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(_np(pv)[:, :, :N], _np(base_vis), rtol=1e-4, atol=1e-4)


@requires_reference
class TestCoTracker2Parity:
    """Golden parity of the legacy v2/v2.1 family (models/cotracker2.py) vs
    reference CoTracker2 (cotracker.py:29-384) with identical random weights."""

    def _make_pair(self, window_len=8, res=(48, 64)):
        from cotracker.models.core.cotracker.cotracker import CoTracker2 as RefV2
        from cotracker_tpu.models.cotracker2 import CoTracker2
        from cotracker_tpu.models.checkpoint import import_torch_state_dict_v2

        torch.manual_seed(11)
        ref = RefV2(window_len=window_len, stride=4, model_resolution=res).eval()
        params = import_torch_state_dict_v2(ref.state_dict())
        ours = CoTracker2(window_len=window_len, model_resolution=res)
        return ref, ours, params

    def _data(self, B=1, T=12, H=48, W=64, N=4, seed=12):
        rng = np.random.default_rng(seed)
        video = (rng.random((B, T, 3, H, W)) * 255).astype(np.float32)
        queries = np.stack(
            [
                rng.integers(0, T, (B, N)).astype(np.float32),
                rng.random((B, N)) * (W - 1),
                rng.random((B, N)) * (H - 1),
            ],
            axis=-1,
        ).astype(np.float32)
        return video, queries

    def test_offline_forward(self):
        ref, ours, params = self._make_pair()
        video, queries = self._data()

        with torch.no_grad():
            ref_coords, ref_vis, _ = ref(
                torch.from_numpy(video), torch.from_numpy(queries), iters=2
            )

        coords, vis, _ = ours.apply(
            {"params": params},
            jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(queries),
            iters=2,
        )
        np.testing.assert_allclose(_np(coords), ref_coords.numpy(), rtol=1e-3, atol=2e-2)
        np.testing.assert_allclose(_np(vis), ref_vis.numpy(), rtol=1e-3, atol=1e-3)

    def test_online_matches_reference_streaming(self):
        from cotracker_tpu.models.cotracker2 import CoTracker2

        ref, ours, params = self._make_pair()
        video, queries = self._data(T=16, seed=13)
        S, step = 8, 4

        ref.init_video_online_processing()
        with torch.no_grad():
            for k in range(3):  # chunks [0:8], [4:12], [8:16]
                chunk = torch.from_numpy(video[:, k * step : k * step + S])
                ref_coords, ref_vis, _ = ref(
                    chunk, torch.from_numpy(queries), iters=2, is_online=True
                )

        state = ours.apply({"params": params}, 1, queries.shape[1], 32,
                           method=CoTracker2.online_init)
        vjax = jnp.asarray(video.transpose(0, 1, 3, 4, 2))
        for k in range(3):
            state, coords, vis = ours.apply(
                {"params": params}, state, vjax[:, k * step : k * step + S],
                jnp.asarray(queries), iters=2, method=CoTracker2.online_step,
            )
        np.testing.assert_allclose(
            _np(coords)[:, :16], ref_coords.numpy()[:, :16], rtol=1e-3, atol=2e-2
        )
        # atol 2e-3: v2's track-feat recirculation chaotically amplifies f32
        # noise over chunks (CLAUDE.md); the fast-variance layer_norm's ~1e-6
        # stat jitter lands ~1e-3 on the worst vis logit after 3 chunks.
        np.testing.assert_allclose(
            _np(vis)[:, :16], ref_vis.numpy()[:, :16], rtol=1e-3, atol=2e-3
        )

    def test_offline_padding_invariance(self):
        _, ours, params = self._make_pair()
        video, queries = self._data(seed=14)
        B, N, PAD = 1, queries.shape[1], 5
        vjax = jnp.asarray(video.transpose(0, 1, 3, 4, 2))
        rng = np.random.default_rng(15)

        base_coords, base_vis, _ = ours.apply(
            {"params": params}, vjax, jnp.asarray(queries), iters=2
        )
        qpad = np.concatenate(
            [queries, np.stack(
                [np.zeros((B, PAD)), rng.random((B, PAD)) * 63, rng.random((B, PAD)) * 47],
                axis=-1,
            ).astype(np.float32)],
            axis=1,
        )
        mask = jnp.asarray(
            np.concatenate([np.ones((B, N)), np.zeros((B, PAD))], axis=1).astype(bool)
        )
        pc, pv, _ = ours.apply(
            {"params": params}, vjax, jnp.asarray(qpad), iters=2, track_mask=mask
        )
        np.testing.assert_allclose(_np(pc)[:, :, :N], _np(base_coords), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(_np(pv)[:, :, :N], _np(base_vis), rtol=1e-4, atol=1e-4)


class TestChunkedEncoder:
    """fmaps_chunk_size bounds fnet activation memory on long videos
    (reference cotracker3_offline.py:81-91); chunked == unchunked since the
    conv stack is per-frame."""

    def test_offline_chunked_matches_unchunked(self):
        from cotracker_tpu.models.build import init_params

        model = CoTrackerThree(window_len=8, model_resolution=(32, 32))
        params = init_params(model)
        rng = np.random.default_rng(30)
        B, T, H, W, N = 1, 12, 32, 32, 4
        video = jnp.asarray(rng.random((B, T, H, W, 3), np.float32) * 255)
        queries = jnp.asarray(
            np.stack(
                [np.zeros((B, N)), rng.random((B, N)) * 31, rng.random((B, N)) * 31],
                axis=-1,
            ).astype(np.float32)
        )
        base = model.apply(
            {"params": params}, video, queries, iters=2, fmaps_chunk_size=None
        )
        chunked = model.apply(
            {"params": params}, video, queries, iters=2, fmaps_chunk_size=5
        )
        # different conv batch sizes reorder XLA reductions; the f32 noise is
        # amplified by the iterative updates — same tolerance class as the
        # golden model-parity tests
        for a, b in zip(base[:3], chunked[:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-3)

    def test_fold_input_proj_matches_plain(self):
        """fold_input_proj reassociates corr-MLP2 @ input-projection into one
        per-level matmul (token contributions summed, small terms folded) —
        same math as the concat + Linear build, same param tree."""
        from cotracker_tpu.models.build import init_params

        model = CoTrackerThree(window_len=8, model_resolution=(32, 32))
        params = init_params(model)
        rng = np.random.default_rng(31)
        B, T, H, W, N = 1, 8, 32, 32, 6
        video = jnp.asarray(rng.random((B, T, H, W, 3), np.float32) * 255)
        queries = jnp.asarray(
            np.stack(
                [np.zeros((B, N)), rng.random((B, N)) * 31, rng.random((B, N)) * 31],
                axis=-1,
            ).astype(np.float32)
        )
        base = model.apply({"params": params}, video, queries, iters=2)
        folded_model = CoTrackerThree(
            window_len=8, model_resolution=(32, 32), fold_input_proj=True
        )
        folded = folded_model.apply({"params": params}, video, queries, iters=2)
        for a, b in zip(base[:3], folded[:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=5e-3)
