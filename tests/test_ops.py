"""Golden-parity tests of the ops layer against the reference torch code.

The reference (read-only, /root/reference) is used purely as a numerical
oracle: we feed both implementations identical random inputs and require
agreement to float32 tolerance.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from conftest import requires_reference

torch = pytest.importorskip("torch")

from cotracker_tpu import ops  # noqa: E402

RTOL = 1e-5
ATOL = 1e-5


def _np(x):
    return np.asarray(x)


class TestBilinearIdentity:
    """Generalization of reference tests/test_bilinear_sample.py: sampling at
    integer pixel coordinates must reproduce the input exactly."""

    def test_identity_2d_align_corners(self):
        rng = np.random.default_rng(0)
        H, W, C = 9, 7, 3
        img = rng.standard_normal((H, W, C)).astype(np.float32)
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        coords = np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)
        out = _np(ops.bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
        np.testing.assert_allclose(out.reshape(H, W, C), img, rtol=RTOL, atol=ATOL)

    def test_identity_2d_no_align_corners(self):
        rng = np.random.default_rng(1)
        H, W, C = 5, 6, 2
        img = rng.standard_normal((H, W, C)).astype(np.float32)
        ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5, indexing="ij")
        coords = np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32)
        out = _np(ops.bilinear_sample(jnp.asarray(img), jnp.asarray(coords), align_corners=False))
        np.testing.assert_allclose(out.reshape(H, W, C), img, rtol=RTOL, atol=ATOL)

    def test_identity_3d(self):
        rng = np.random.default_rng(2)
        T, H, W, C = 4, 5, 6, 2
        vid = rng.standard_normal((T, H, W, C)).astype(np.float32)
        ts, ys, xs = np.meshgrid(np.arange(T), np.arange(H), np.arange(W), indexing="ij")
        coords = np.stack([ts, xs, ys], axis=-1).reshape(-1, 3).astype(np.float32)
        out = _np(ops.bilinear_sample_3d(jnp.asarray(vid), jnp.asarray(coords)))
        np.testing.assert_allclose(out.reshape(T, H, W, C), vid, rtol=RTOL, atol=ATOL)


@requires_reference
class TestBilinearVsReference:
    @pytest.mark.parametrize("align_corners", [True, False])
    @pytest.mark.parametrize("padding_mode", ["border", "zeros"])
    def test_2d_random_coords(self, align_corners, padding_mode):
        from cotracker.models.core.model_utils import bilinear_sampler

        rng = np.random.default_rng(3)
        B, C, H, W, P = 2, 4, 12, 10, 200
        img = rng.standard_normal((B, C, H, W)).astype(np.float32)
        # include far out-of-range coords to exercise padding
        coords = (rng.standard_normal((B, P, 1, 2)) * 8 + 4).astype(np.float32)

        ref = bilinear_sampler(
            torch.from_numpy(img),
            torch.from_numpy(coords),
            align_corners=align_corners,
            padding_mode=padding_mode,
        ).numpy()  # (B, C, P, 1)

        img_cl = jnp.asarray(img.transpose(0, 2, 3, 1))  # B H W C
        out = ops.sample_features_2d(
            img_cl,
            jnp.asarray(coords[:, :, 0, :]),
            align_corners=align_corners,
            padding_mode=padding_mode,
        )  # B P C
        np.testing.assert_allclose(_np(out), ref[:, :, :, 0].transpose(0, 2, 1), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("align_corners", [True, False])
    @pytest.mark.parametrize("padding_mode", ["border", "zeros"])
    def test_3d_random_coords(self, align_corners, padding_mode):
        from cotracker.models.core.model_utils import sample_features5d, bilinear_sampler

        rng = np.random.default_rng(4)
        B, T, C, H, W = 2, 5, 3, 9, 11
        R1, R2 = 6, 7
        vid = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
        coords = np.stack(
            [
                rng.random((B, R1, R2)) * (T + 2) - 1,
                rng.random((B, R1, R2)) * (W + 4) - 2,
                rng.random((B, R1, R2)) * (H + 4) - 2,
            ],
            axis=-1,
        ).astype(np.float32)

        # reference path: B T C H W -> B C T H W then 5D sampler
        inp = torch.from_numpy(vid).permute(0, 2, 1, 3, 4)
        ref = bilinear_sampler(
            inp,
            torch.from_numpy(coords).unsqueeze(3),
            align_corners=align_corners,
            padding_mode=padding_mode,
        )  # B C R1 R2 1
        ref = ref.permute(0, 2, 3, 1, 4)[..., 0].numpy()  # B R1 R2 C

        vid_cl = jnp.asarray(vid.transpose(0, 1, 3, 4, 2))  # B T H W C
        out = ops.sample_features_3d(
            vid_cl, jnp.asarray(coords), align_corners=align_corners, padding_mode=padding_mode
        )
        np.testing.assert_allclose(_np(out), ref, rtol=1e-4, atol=1e-4)

    def test_sample_features5d_exact_frame(self):
        """Integer t coordinates must pick exactly that frame's features."""
        from cotracker.models.core.model_utils import sample_features5d

        rng = np.random.default_rng(5)
        B, T, C, H, W = 1, 6, 8, 10, 12
        N = 17
        vid = rng.standard_normal((B, T, C, H, W)).astype(np.float32)
        coords = np.stack(
            [
                rng.integers(0, T, (B, 1, N)).astype(np.float32),
                rng.random((B, 1, N)) * (W - 1),
                rng.random((B, 1, N)) * (H - 1),
            ],
            axis=-1,
        ).astype(np.float32)
        ref = sample_features5d(torch.from_numpy(vid), torch.from_numpy(coords)).numpy()
        out = ops.sample_features_3d(jnp.asarray(vid.transpose(0, 1, 3, 4, 2)), jnp.asarray(coords))
        np.testing.assert_allclose(_np(out), ref, rtol=1e-4, atol=1e-4)


@requires_reference
class TestResize:
    @pytest.mark.parametrize("align_corners", [True, False])
    @pytest.mark.parametrize("shape", [((12, 16), (24, 32)), ((24, 32), (12, 16)), ((17, 13), (9, 21))])
    def test_resize_bilinear(self, align_corners, shape):
        import torch.nn.functional as F

        (H, W), (Ho, Wo) = shape
        rng = np.random.default_rng(6)
        x = rng.standard_normal((2, 3, H, W)).astype(np.float32)
        ref = F.interpolate(
            torch.from_numpy(x), (Ho, Wo), mode="bilinear", align_corners=align_corners
        ).numpy()
        out = ops.resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), (Ho, Wo), align_corners=align_corners)
        np.testing.assert_allclose(_np(out).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("out_len", [7, 16, 60, 100])
    def test_resize_linear_time(self, out_len):
        import torch.nn.functional as F

        rng = np.random.default_rng(7)
        x = rng.standard_normal((1, 16, 1110)).astype(np.float32)
        ref = (
            F.interpolate(torch.from_numpy(x).permute(0, 2, 1), size=out_len, mode="linear")
            .permute(0, 2, 1)
            .numpy()
        )
        out = ops.resize_linear_1d(jnp.asarray(x), out_len, align_corners=False, axis=1)
        np.testing.assert_allclose(_np(out), ref, rtol=1e-4, atol=1e-5)


@requires_reference
class TestEmbeddings:
    def test_1d_sincos(self):
        from cotracker.models.core.embeddings import get_1d_sincos_pos_embed_from_grid

        pos = np.linspace(0, 15, 16).reshape(1, 16, 1).astype(np.float32)
        ref = get_1d_sincos_pos_embed_from_grid(1110, torch.from_numpy(pos[0])).numpy()
        out = ops.get_1d_sincos_pos_embed(1110, pos[0])
        np.testing.assert_allclose(_np(out), ref, rtol=1e-5, atol=1e-5)

    def test_2d_sincos(self):
        from cotracker.models.core.embeddings import get_2d_sincos_pos_embed

        ref = get_2d_sincos_pos_embed(64, (6, 9)).numpy()  # (1, D, gh, gw)
        out = ops.get_2d_sincos_pos_embed(64, (6, 9))  # (1, gh, gw, D)
        np.testing.assert_allclose(_np(out).transpose(0, 3, 1, 2), ref, rtol=1e-5, atol=1e-5)

    def test_2d_embedding(self):
        from cotracker.models.core.embeddings import get_2d_embedding

        rng = np.random.default_rng(8)
        xy = (rng.standard_normal((2, 13, 2)) * 3).astype(np.float32)
        ref = get_2d_embedding(torch.from_numpy(xy), 32, cat_coords=True).numpy()
        out = ops.get_2d_embedding(jnp.asarray(xy), 32, cat_coords=True)
        np.testing.assert_allclose(_np(out), ref, rtol=1e-4, atol=1e-5)

    def test_posenc(self):
        from cotracker.models.core.cotracker.cotracker3_online import posenc

        rng = np.random.default_rng(9)
        x = (rng.standard_normal((2, 5, 7, 8)) * 0.3).astype(np.float32)
        ref = posenc(torch.from_numpy(x), min_deg=0, max_deg=10).numpy()
        out = ops.posenc(jnp.asarray(x), 0, 10)
        assert out.shape[-1] == 8 + 2 * 8 * 10
        np.testing.assert_allclose(_np(out), ref, rtol=1e-4, atol=1e-4)


@requires_reference
class TestSamplersAndMasked:
    @pytest.mark.parametrize("size", [1, 5, 10])
    def test_grid_points(self, size):
        from cotracker.models.core.model_utils import get_points_on_a_grid

        ref = get_points_on_a_grid(size, (384, 512)).numpy()
        out = ops.get_points_on_a_grid(size, (384, 512))
        np.testing.assert_allclose(_np(out), ref, rtol=1e-5, atol=1e-4)

    def test_reduce_masked_mean(self):
        from cotracker.models.core.model_utils import reduce_masked_mean

        rng = np.random.default_rng(10)
        x = rng.standard_normal((3, 4, 5)).astype(np.float32)
        m = (rng.random((3, 4, 5)) > 0.5).astype(np.float32)
        ref = reduce_masked_mean(torch.from_numpy(x), torch.from_numpy(m)).numpy()
        out = ops.reduce_masked_mean(jnp.asarray(x), jnp.asarray(m))
        np.testing.assert_allclose(_np(out), ref, rtol=1e-5, atol=1e-6)
        ref_d = reduce_masked_mean(torch.from_numpy(x), torch.from_numpy(m), dim=1).numpy()
        out_d = ops.reduce_masked_mean(jnp.asarray(x), jnp.asarray(m), axis=1)
        np.testing.assert_allclose(_np(out_d), ref_d, rtol=1e-5, atol=1e-6)


class TestTrackFeatWindowed:
    """get_track_feat's windowed sampler (round-4: replaces ~134 ms of
    jnp.take gathers) vs the per-tap trilinear formulation: exact for
    integer, fractional, and edge query frames, and the N-chunked large-N
    path equals the unchunked one."""

    def _data(self, N=23, T=7):
        rng = np.random.default_rng(11)
        B, H, W, C = 2, 20, 28, 8
        fmaps = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
        qf = jnp.asarray(rng.integers(0, T, (B, N)).astype(np.float32))
        qc = jnp.asarray(
            rng.random((B, N, 2)).astype(np.float32)
            * np.array([W + 6, H + 6], np.float32)
            - 3
        )
        return fmaps, qf, qc

    def test_matches_tap_formulation(self):
        from cotracker_tpu.models.cotracker3 import (
            _get_track_feat_taps,
            get_track_feat,
        )

        fmaps, qf, qc = self._data()
        # integer, fractional, and edge (t = T-1 / out-of-range) frames
        for frames in (qf, qf * 0.63 + 0.2, jnp.full_like(qf, fmaps.shape[1] - 1),
                       qf + 100.0):
            center, support = get_track_feat(fmaps, frames, qc, 3)
            sref = _get_track_feat_taps(fmaps, frames, qc, 3)
            np.testing.assert_allclose(
                np.asarray(support), np.asarray(sref), rtol=1e-5, atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(center), np.asarray(sref[:, None, 24]), rtol=1e-5,
                atol=1e-5,
            )

    def test_chunked_equals_unchunked(self, monkeypatch):
        import cotracker_tpu.models.cotracker3 as m

        fmaps, qf, qc = self._data(N=23)
        ref_c, ref_s = m.get_track_feat(fmaps, qf, qc, 3)
        monkeypatch.setattr(m, "_TRACK_FEAT_CHUNK", 5)
        c, s = m.get_track_feat(fmaps, qf, qc, 3)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(ref_c))
        np.testing.assert_array_equal(np.asarray(s), np.asarray(ref_s))
