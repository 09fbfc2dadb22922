"""CoTracker2-class legacy point tracker (v2 / v2.1), TPU-native.

Behavioral contract follows the reference CoTracker2
(cotracker/models/core/cotracker/cotracker.py:29-384), re-designed for XLA:

  * the sliding-window loop is an nn.scan over windows (one compiled window
    body regardless of video length) instead of a Python loop with mutable
    prediction buffers;
  * the update iterations are a nested nn.scan, like CoTrackerThree;
  * the dense per-frame correlation (reference CorrBlock: full H*W matmul
    against every fmap then bilinear patch-sampling of the correlation map,
    blocks.py:284-362) is computed WITHOUT materializing the (B,S,N,H,W)
    correlation volume: bilinear sampling is linear in the map and the map is
    linear in the features, so sampling the correlation at (x+dx, y+dy)
    equals the dot product of the track feature with the bilinearly-sampled
    feature patch. This is exact (not an approximation) and is the same
    identity the reference's own EfficientCorrBlock (blocks.py:222-281)
    exploits;
  * online streaming state is an explicit `OnlineStateV2` pytree with
    fixed-capacity prediction buffers (reference keeps mutable module
    attributes, cotracker.py:187-191, 250-263, 369-372);
  * channel-last fmaps; coords carried in f32.

Architecture constants (reference cotracker.py:29-84): window 8 (v2) or
16 (v2.1), stride 4, latent 128, input tokens of 456 dims
(130 flow embedding + 4*49 correlation + 128 track feature + 2 mask/vis),
update transformer with 6 time / 6 space-round blocks and output 130
(2 coords + 128 track-feature delta), a GroupNorm+Linear+GELU track-feature
updater, and a separate linear visibility predictor.
"""

from typing import Any, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from cotracker_tpu.models.blocks import BasicEncoder
from cotracker_tpu.models.updateformer import EfficientUpdateFormer
from cotracker_tpu.models.cotracker3 import sample_patch_features
from cotracker_tpu.ops.bilinear import sample_features_2d, sample_features_3d
from cotracker_tpu.ops.embeddings import (
    get_1d_sincos_pos_embed,
    get_2d_sincos_pos_embed,
    get_2d_embedding,
)


class V2IterCore(nn.Module):
    """One CoTracker2 update iteration (reference forward_window body,
    cotracker.py:133-171). Scanned over iterations with nn.scan.

    Carry: (coords (B,S,N,2) in fmap units, track_feat (B,S,N,C)).
    Per-iteration output: coords in model pixels.
    """

    window_len: int = 8
    stride: int = 4
    corr_radius: int = 3
    corr_levels: int = 4
    latent_dim: int = 128
    input_dim: int = 456
    num_virtual_tracks: int = 64
    add_space_attn: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.updateformer = EfficientUpdateFormer(
            space_depth=6,
            time_depth=6,
            input_dim=self.input_dim,
            hidden_size=384,
            num_heads=8,
            output_dim=self.latent_dim + 2,
            mlp_ratio=4.0,
            num_virtual_tracks=self.num_virtual_tracks,
            add_space_attn=self.add_space_attn,
            linear_layer_for_vis_conf=False,
            dtype=None if self.dtype == jnp.float32 else self.dtype,
            v2_masking=True,
            name="updateformer",
        )
        # reference: nn.GroupNorm(1, latent) == affine LayerNorm over channels
        # (cotracker.py:77), then Linear+GELU (track_feat_updater, :78-81)
        self.norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        self.track_feat_updater = nn.Dense(
            self.latent_dim, dtype=self.dtype, name="track_feat_updater"
        )
        # deterministic sincos time embedding (reference buffer, cotracker.py:59-65)
        grid = np.linspace(0, self.window_len - 1, self.window_len)
        self.time_emb = np.asarray(get_1d_sincos_pos_embed(self.input_dim, grid))

    def __call__(self, carry, _, fmaps_pyramid, track_mask_vis, sampled_pos_emb, attention_mask):
        coords, track_feat = carry
        coords = jax.lax.stop_gradient(coords)  # reference :134
        B, S, N, _ = coords.shape
        C = self.latent_dim

        # ---- local correlation, 4 levels x 7x7 taps (reference CorrBlock
        # corr + sample, blocks.py:311-362, driven at cotracker.py:135-138).
        # Exact dense-corr equivalence via linearity: see module docstring.
        fcorrs = []
        for i, fmaps in enumerate(fmaps_pyramid):
            patches = sample_patch_features(
                fmaps, coords.astype(self.dtype) / 2**i, self.corr_radius
            )  # (B,S,N,P,P,C), x-major patch axes like the reference flatten
            corr = jnp.einsum(
                "bsnijc,bsnc->bsnij",
                patches,
                track_feat.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(jnp.asarray(C, jnp.float32))
            P = 2 * self.corr_radius + 1
            fcorrs.append(corr.reshape(B, S, N, P * P))
        fcorrs = jnp.concatenate(fcorrs, axis=-1)  # (B,S,N,196)

        # ---- flow embedding relative to the window's first frame
        # (reference cotracker.py:141-142), in fmap units
        flows = (coords - coords[:, 0:1]).transpose(0, 2, 1, 3)  # (B,N,S,2)
        flow_emb = get_2d_embedding(flows.reshape(B * N, S, 2), 64, cat_coords=True)
        flow_emb = flow_emb.reshape(B, N, S, -1)  # (B,N,S,130)

        x = jnp.concatenate(
            [
                flow_emb.astype(self.dtype),
                fcorrs.transpose(0, 2, 1, 3).astype(self.dtype),
                track_feat.transpose(0, 2, 1, 3).astype(self.dtype),
                track_mask_vis.astype(self.dtype),
            ],
            axis=-1,
        )  # (B,N,S,456)
        x = x + sampled_pos_emb.astype(self.dtype) + jnp.asarray(self.time_emb)[None].astype(self.dtype)

        delta = self.updateformer(x, track_mask=attention_mask).astype(jnp.float32)

        coords = coords + delta[..., :2].transpose(0, 2, 1, 3)

        # track-feature update (reference cotracker.py:163-170): GroupNorm ->
        # Linear -> exact GELU, residual
        dfeat = self.norm(delta[..., 2:])
        upd = nn.gelu(self.track_feat_updater(dfeat.astype(self.dtype)), approximate=False)
        track_feat = track_feat + upd.transpose(0, 2, 1, 3).astype(track_feat.dtype)

        return (coords, track_feat), coords * float(self.stride)


class V2WindowCore(nn.Module):
    """One sliding window of CoTracker2 (reference forward loop body,
    cotracker.py:305-367). Scanned over windows with nn.scan.

    Carry: (coords_buf (B,CAP,N,2) model pixels, vis_buf (B,CAP,N) logits).
    Scan input: ind — the window's global start frame.
    """

    window_len: int = 8
    stride: int = 4
    corr_radius: int = 3
    corr_levels: int = 4
    latent_dim: int = 128
    input_dim: int = 456
    num_virtual_tracks: int = 64
    add_space_attn: bool = True
    model_resolution: Tuple[int, int] = (384, 512)
    dtype: Any = jnp.float32

    def setup(self):
        self.iter_core = nn.scan(
            V2IterCore,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
        )(
            window_len=self.window_len,
            stride=self.stride,
            corr_radius=self.corr_radius,
            corr_levels=self.corr_levels,
            latent_dim=self.latent_dim,
            input_dim=self.input_dim,
            num_virtual_tracks=self.num_virtual_tracks,
            add_space_attn=self.add_space_attn,
            dtype=self.dtype,
            name="iter_core",
        )
        self.vis_predictor = nn.Dense(1, dtype=self.dtype, name="vis_predictor")
        # deterministic 2D sincos positional embedding over the fmap grid
        # (reference buffer, cotracker.py:67-76)
        gh = self.model_resolution[0] // self.stride
        gw = self.model_resolution[1] // self.stride
        self.pos_emb = np.asarray(get_2d_sincos_pos_embed(self.input_dim, (gh, gw)))

    def __call__(
        self,
        carry,
        ind,
        fmaps_pyramid,
        track_feat_center,
        queried_frames,
        queried_coords,
        track_mask_global,
        iters_zeros,
        fmap_origin,
    ):
        coords_buf, vis_buf = carry
        S = self.window_len
        step = S // 2
        overlap = S - step
        B, _, N, _ = coords_buf.shape
        C = self.latent_dim
        indf = ind.astype(jnp.float32)

        # fmaps_pyramid tensors start at global frame `fmap_origin` (0 for the
        # offline whole-video pass; == ind for the online per-chunk pass)
        local = ind - fmap_origin
        fmaps_win = tuple(
            jax.lax.dynamic_slice_in_dim(f, local, S, axis=1) for f in fmaps_pyramid
        )

        # ---- warm start from the previous window's overlap
        # (reference cotracker.py:308-328)
        first = ind == 0
        base_coords = jnp.broadcast_to(queried_coords[:, None], (B, S, N, 2))
        base_vis = jnp.full((B, S, N), 10.0, jnp.float32)  # reference :304
        prev_c = jax.lax.dynamic_slice_in_dim(coords_buf, ind, overlap, axis=1) / self.stride
        prev_c = jnp.concatenate([prev_c, jnp.repeat(prev_c[:, -1:], step, axis=1)], axis=1)
        prev_v = jax.lax.dynamic_slice_in_dim(vis_buf, ind, overlap, axis=1)
        prev_v = jnp.concatenate([prev_v, jnp.repeat(prev_v[:, -1:], step, axis=1)], axis=1)
        copy_over = (queried_frames < indf + overlap) & (~first)  # (B,N)
        coords_init = jnp.where(copy_over[:, None, :, None], prev_c, base_coords)
        vis_init = jnp.where(copy_over[:, None, :], prev_v, base_vis)

        # ---- masks (reference cotracker.py:330-345): attention mask covers
        # tracks queried before the window's end; track mask covers the
        # (frame, track) points needing an update in THIS window
        attention_mask = (queried_frames < indf + S) & track_mask_global  # (B,N)
        frames = indf + jnp.arange(S, dtype=jnp.float32)
        tm = queried_frames[:, None, :] <= frames[None, :, None]  # (B,S,N)
        tm = tm & ~((jnp.arange(S) < overlap)[None, :, None] & (~first))

        track_feat_win = (
            jnp.broadcast_to(track_feat_center, (B, S, N, C))
            * attention_mask[:, None, :, None].astype(track_feat_center.dtype)
        )
        track_mask_vis = jnp.concatenate(
            [tm[..., None].astype(jnp.float32), vis_init[..., None]], axis=-1
        ).transpose(0, 2, 1, 3)  # (B,N,S,2)

        # positional embedding sampled at the window-initial coords
        # (reference cotracker.py:126-131)
        pos_maps = jnp.broadcast_to(
            jnp.asarray(self.pos_emb), (B,) + self.pos_emb.shape[1:]
        )
        sampled_pos = sample_features_2d(pos_maps, coords_init[:, 0])  # (B,N,456)
        sampled_pos = sampled_pos[:, :, None]  # (B,N,1,456)

        (coords_fin, track_feat_fin), coord_preds = self.iter_core(
            (coords_init, track_feat_win),
            iters_zeros,
            fmaps_win,
            track_mask_vis,
            sampled_pos,
            attention_mask,
        )
        del coords_fin
        vis_logits = self.vis_predictor(track_feat_fin.astype(self.dtype))[..., 0]
        vis_logits = vis_logits.astype(jnp.float32)

        coords_buf = jax.lax.dynamic_update_slice_in_dim(
            coords_buf, coord_preds[-1], ind, axis=1
        )
        vis_buf = jax.lax.dynamic_update_slice_in_dim(vis_buf, vis_logits, ind, axis=1)
        return (coords_buf, vis_buf), (coord_preds, vis_logits)


class OnlineStateV2(NamedTuple):
    """Explicit streaming carry for CoTracker2 online mode (replaces reference
    module attributes, cotracker.py:187-191)."""

    ind: jnp.ndarray  # () int32 — start frame of the next window
    track_feat: jnp.ndarray  # (B, 1, N, C) masked-accumulated center features
    coords: jnp.ndarray  # (B, CAP, N, 2) — predicted tracks, model pixels
    vis: jnp.ndarray  # (B, CAP, N) — visibility logits


class CoTracker2(nn.Module):
    """The legacy tracker core. window_len=8 is v2, window_len=16 is v2.1
    (reference hubconf.py:30-47)."""

    window_len: int = 8
    stride: int = 4
    corr_radius: int = 3
    corr_levels: int = 4
    num_virtual_tracks: int = 64
    model_resolution: Tuple[int, int] = (384, 512)
    add_space_attn: bool = True
    latent_dim: int = 128
    input_dim: int = 456
    dtype: Any = jnp.float32

    def setup(self):
        self.fnet = BasicEncoder(
            output_dim=self.latent_dim, stride=self.stride, dtype=self.dtype
        )
        self.window_core = nn.scan(
            V2WindowCore,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0,) + (nn.broadcast,) * 7,
            out_axes=0,
        )(
            window_len=self.window_len,
            stride=self.stride,
            corr_radius=self.corr_radius,
            corr_levels=self.corr_levels,
            latent_dim=self.latent_dim,
            input_dim=self.input_dim,
            num_virtual_tracks=self.num_virtual_tracks,
            add_space_attn=self.add_space_attn,
            model_resolution=self.model_resolution,
            dtype=self.dtype,
            name="window_core",
        )

    # ---------------------------------------------------------------- features

    def compute_fmaps(self, video):
        """video (B, T, H, W, 3) in [0, 255] -> fmaps. Unlike CoTracker3, the
        legacy model does NOT L2-normalize (reference cotracker.py:277-279)."""
        B, T, H, W, _ = video.shape
        video = (2 * (video / 255.0) - 1.0).astype(self.dtype)
        fmaps = self.fnet(video.reshape(B * T, H, W, 3))
        return fmaps.reshape(B, T, H // self.stride, W // self.stride, self.latent_dim)

    def build_pyramid(self, fmaps):
        pyramid = [fmaps]
        for _ in range(self.corr_levels - 1):
            B, T, H, W, C = fmaps.shape
            x = fmaps.reshape(B * T, H, W, C)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            fmaps = x.reshape(B, T, H // 2, W // 2, C)
            pyramid.append(fmaps)
        return tuple(pyramid)

    def get_track_feat(self, fmaps, queried_frames, queried_coords):
        """Center-tap track features (reference cotracker.py:175-185): one
        spatio-temporal bilinear sample per query. Returns (B, 1, N, C)."""
        pts = jnp.concatenate(
            [queried_frames[..., None], queried_coords], axis=-1
        )[:, None]  # (B,1,N,3) as (t,x,y)
        return sample_features_3d(fmaps, pts)

    # ----------------------------------------------------------------- offline

    def __call__(
        self,
        video,
        queries,
        iters: int = 4,
        track_mask: Optional[jnp.ndarray] = None,
        is_train: bool = False,
    ):
        """Offline forward with internal sliding windows (reference
        CoTracker2.forward, cotracker.py:193-384, is_online=False).

        video (B, T, H, W, 3) in [0, 255]; queries (B, N, 3) as (t, x, y) in
        model pixels; track_mask (B, N) marks real (non-padding) tracks.

        Returns (coords (B,T,N,2) pixels, vis (B,T,N) probabilities,
        train_data). train_data (when is_train) = (per-window per-iter coords
        (W, iters, B, S, N, 2), per-window vis probs (W, B, S, N), query mask
        (B, T, N), window start frames (W,)).
        """
        B, T, H, W, _ = video.shape
        N = queries.shape[1]
        S = self.window_len
        step = S // 2
        assert S >= 2

        pad = (S - T % S) % S
        if pad:
            video = jnp.concatenate(
                [video, jnp.repeat(video[:, -1:], pad, axis=1)], axis=1
            )
        Tp = T + pad

        queried_frames = queries[..., 0].astype(jnp.float32)
        queried_coords = queries[..., 1:3].astype(jnp.float32) / self.stride

        fmaps = self.compute_fmaps(video)
        pyramid = self.build_pyramid(fmaps)
        track_feat_center = self.get_track_feat(fmaps, queried_frames, queried_coords)

        num_windows = max((T - S + step - 1) // step + 1, 1)
        inds = jnp.arange(num_windows, dtype=jnp.int32) * step

        tm_global = (
            track_mask if track_mask is not None else jnp.ones((B, N), bool)
        )
        carry0 = (
            jnp.zeros((B, Tp, N, 2), jnp.float32),
            jnp.zeros((B, Tp, N), jnp.float32),
        )
        (coords_buf, vis_buf), (coord_preds_w, vis_w) = self.window_core(
            carry0,
            inds,
            pyramid,
            track_feat_center,
            queried_frames,
            queried_coords,
            tm_global,
            jnp.zeros((iters,), jnp.int32),
            jnp.asarray(0, jnp.int32),
        )

        coords = coords_buf[:, :T]
        vis = jax.nn.sigmoid(vis_buf[:, :T])

        train_data = None
        if is_train:
            mask = (
                queried_frames[:, None, :]
                <= jnp.arange(T, dtype=jnp.float32)[None, :, None]
            )
            train_data = (coord_preds_w, jax.nn.sigmoid(vis_w), mask, inds)
        return coords, vis, train_data

    # ------------------------------------------------------------------ online

    def online_init(self, batch: int, num_tracks: int, capacity: int):
        return OnlineStateV2(
            ind=jnp.asarray(0, jnp.int32),
            track_feat=jnp.zeros((batch, 1, num_tracks, self.latent_dim), self.dtype),
            coords=jnp.zeros((batch, capacity, num_tracks, 2), jnp.float32),
            vis=jnp.zeros((batch, capacity, num_tracks), jnp.float32),
        )

    def online_step(
        self,
        state: OnlineStateV2,
        video_chunk,
        queries,
        iters: int = 4,
        track_mask: Optional[jnp.ndarray] = None,
    ):
        """Process one sliding window of the stream (reference forward with
        is_online=True, cotracker.py:231-372). video_chunk (B, S, H, W, 3) is
        the current window, already padded to S frames by the caller.

        Returns (new_state, coords (B,CAP,N,2) pixels, vis (B,CAP,N) probs);
        buffers are valid on [0, ind + S)."""
        B, S, H, W, _ = video_chunk.shape
        assert S == self.window_len
        N = queries.shape[1]
        step = S // 2
        ind = state.ind
        indf = ind.astype(jnp.float32)

        queried_frames = queries[..., 0].astype(jnp.float32)
        queried_coords = queries[..., 1:3].astype(jnp.float32) / self.stride

        fmaps = self.compute_fmaps(video_chunk)
        pyramid = self.build_pyramid(fmaps)

        # masked accumulation of track features for queries falling in the
        # fresh part of this window (reference cotracker.py:287-296)
        tf_new = self.get_track_feat(fmaps, queried_frames - indf, queried_coords)
        left = jnp.where(ind == 0, 0.0, indf + step)
        right = indf + S
        m = ((queried_frames >= left) & (queried_frames < right))[:, None, :, None]
        tf_acc = state.track_feat + tf_new * m.astype(tf_new.dtype)

        tm_global = (
            track_mask if track_mask is not None else jnp.ones((B, N), bool)
        )
        (coords_buf, vis_buf), _ = self.window_core(
            (state.coords, state.vis),
            ind[None],
            pyramid,
            tf_acc,
            queried_frames,
            queried_coords,
            tm_global,
            jnp.zeros((iters,), jnp.int32),
            ind,
        )
        new_state = OnlineStateV2(
            ind=ind + step, track_feat=tf_acc, coords=coords_buf, vis=vis_buf
        )
        return new_state, coords_buf, jax.nn.sigmoid(vis_buf)
