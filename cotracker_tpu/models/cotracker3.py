"""CoTracker3-class point tracker: TPU-native core model.

Behavioral contract follows the reference CoTrackerThree{Offline,Online}
(cotracker/models/core/cotracker/cotracker3_offline.py:15-233,
cotracker3_online.py:42-541), re-designed for XLA:

  * pure functional forward over a flax param tree; no module-held state;
  * online streaming state is an explicit `OnlineState` pytree carried by the
    caller (reference keeps it as mutable module attributes,
    cotracker3_online.py:163-169) with fixed-capacity prediction buffers, so
    the streaming step jits once and runs at constant memory;
  * channel-last fmaps (B, T, H, W, C); latent C=128 = one TPU lane tile;
  * coords/vis/conf carried in f32 across the iterative updates regardless of
    compute dtype;
  * correlation features via the fused window-gather op (ops/corr.py) or
    the Pallas kernel (ops/kernels/corr_pallas.py) behind `use_pallas_corr`;
  * update iterations run under nn.scan (one compiled iteration body).

Terminology matches the reference: "stride" is the fmap downsampling (4),
"corr_radius" the local patch radius (3 -> 7x7 patches), "corr_levels" the
pyramid depth (4).
"""

from typing import Any, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from cotracker_tpu.models.blocks import BasicEncoder
from cotracker_tpu.models.updateformer import EfficientUpdateFormer
from cotracker_tpu.ops.bilinear import (
    bilinear_sample,
    sample_features_3d,
    resize_linear_1d,
)
from cotracker_tpu.ops.corr import fused_corr_embs
from cotracker_tpu.ops.embeddings import get_1d_sincos_pos_embed, posenc


def sample_patch_features(fmaps, coords, radius: int):
    """Bilinearly sample (2r+1)x(2r+1) feature patches around points.

    fmaps:  (B, T, H, W, C)
    coords: (B, T, N, 2) as (x, y), in this level's pixel units
    returns (B, T, N, P, P, C) with patch[i, j] sampled at
            (x + (i - r), y + (j - r))  — first patch axis offsets x,
            matching the reference's `get_support_points` delta layout
            (cotracker3_online.py:94-111: delta = (0, dy_i, dx_j) applied to
            (t, x, y) coords).
    """
    B, T, H, W, C = fmaps.shape
    N = coords.shape[2]
    P = 2 * radius + 1
    d = jnp.arange(-radius, radius + 1, dtype=coords.dtype)
    # offs[i, j] = (d[i], d[j]) -> x offset from first axis, y from second
    offs = jnp.stack(jnp.meshgrid(d, d, indexing="ij"), axis=-1)  # (P, P, 2)
    pts = coords[:, :, :, None, None, :] + offs[None, None, None]  # (B,T,N,P,P,2)

    flat_maps = fmaps.reshape(B * T, H, W, C)
    flat_pts = pts.reshape(B * T, N, P, P, 2)
    out = jax.vmap(bilinear_sample)(flat_maps, flat_pts)  # (B*T, N, P, P, C)
    return out.reshape(B, T, N, P, P, C)


# N-chunk size for the windowed support sampler (get_track_feat): bounds the
# (B, chunk, 2, WIN, WIN, C) transient to ~250 MB at C=128
_TRACK_FEAT_CHUNK = 8192


def _get_track_feat_taps(fmaps, queried_frames, queried_coords, radius: int):
    """Per-tap trilinear formulation of get_track_feat (49 gather taps per
    point). Kept as the T==1 fallback; the window path below is the hot
    implementation."""
    B, T, H, W, C = fmaps.shape
    P = 2 * radius + 1
    d = jnp.arange(-radius, radius + 1, dtype=queried_coords.dtype)
    offs = jnp.stack(jnp.meshgrid(d, d, indexing="ij"), axis=-1)  # (P,P,2) x-first
    # (t, x, y) support points: (B, N, P, P, 3)
    txy = jnp.concatenate([queried_frames[..., None], queried_coords], axis=-1)
    pts = txy[:, :, None, None, :] + jnp.pad(offs, ((0, 0), (0, 0), (1, 0)))[None, None]
    pts = pts.reshape(B, pts.shape[1], P * P, 3).transpose(0, 2, 1, 3)  # (B, P*P, N, 3)
    return sample_features_3d(fmaps, pts)  # (B, P*P, N, C)


def get_track_feat(fmaps, queried_frames, queried_coords, radius: int):
    """Sample per-track support patches at the query frame.

    fmaps (B, T, H, W, C); queried_frames (B, N) float; queried_coords
    (B, N, 2) in this level's units. Returns:
      track_feat    (B, 1, N, C)  — center tap
      track_support (B, P*P, N, C) — full patch, flattened i*P+j
    Mirrors reference `get_track_feat` (cotracker3_online.py:113-128:
    `get_support_points` trilinear taps), computed the window way: ONE
    (2, 8, 8, C) dynamic-slice per point (two consecutive frames for exact
    trilinear blending in t — wt is 0 for the integer query frames every
    caller passes) + the shared-fraction 4-term spatial combine from
    ops/corr.py. The per-tap `jnp.take` formulation moved ~1 GB through the
    pathologically slow gather path (~134 ms of the bench forward); this
    moves ~2 x 64 x C bytes per point through contiguous-row reads, with the
    same custom scatter-add backward the corr gather uses.
    """
    from cotracker_tpu.ops.corr import (
        _window_gather_3d,
        pad_fmaps,
        window_starts_and_weights,
    )

    B, T, H, W, C = fmaps.shape
    N = queried_frames.shape[1]
    P = 2 * radius + 1
    WIN = P + 1
    if T < 2:
        support = _get_track_feat_taps(fmaps, queried_frames, queried_coords, radius)
        center = support[:, None, (P * P) // 2]
        return center, support
    if N > _TRACK_FEAT_CHUNK * 2:
        # bound the (B, N, 2, WIN, WIN, C) window transient: at quasi-dense
        # N=70k it is 2.16 GB PER LEVEL and the per-level transients are
        # live together inside the online accumulate (OOM on 16 GB). Static
        # chunking keeps the fast path and the differentiability.
        feats, sups = [], []
        for s0 in range(0, N, _TRACK_FEAT_CHUNK):
            f_c, s_c = get_track_feat(
                fmaps,
                queried_frames[:, s0 : s0 + _TRACK_FEAT_CHUNK],
                queried_coords[:, s0 : s0 + _TRACK_FEAT_CHUNK],
                radius,
            )
            feats.append(f_c)
            sups.append(s_c)
        return jnp.concatenate(feats, axis=2), jnp.concatenate(sups, axis=2)

    wsx, wsy, wx, wy = window_starts_and_weights(queried_coords, radius, H, W)
    # time axis, matching bilinear_sample_3d's align_corners=True + border
    # clamp: t in [0, T-1]; slice frames (t0c, t0c+1) and blend by wt
    t = jnp.clip(queried_frames.astype(jnp.float32), 0.0, T - 1.0)
    t0 = jnp.floor(t)
    wt = (t - t0)[..., None, None, None]  # (B, N, 1, 1, 1)
    t0c = jnp.minimum(t0, T - 2.0)
    sel = (t0 - t0c)[..., None, None, None]  # 1.0 only when t0 == T-1 (wt==0)

    fmaps_p = pad_fmaps(fmaps, radius)
    starts_f = jnp.stack(
        [t0c, wsx.astype(jnp.float32), wsy.astype(jnp.float32)], axis=-1
    )
    win = _window_gather_3d(WIN)(fmaps_p, starts_f)  # (B, N, 2, WIN, WIN, C)
    p0 = jnp.where(sel > 0.5, win[:, :, 1], win[:, :, 0])
    blended = p0 + wt.astype(win.dtype) * (win[:, :, 1] - p0)  # (B,N,WINy,WINx,C)

    wxb = wx[..., None, None, None].astype(blended.dtype)
    wyb = wy[..., None, None, None].astype(blended.dtype)
    a0 = blended[:, :, :P, :P]
    a1 = blended[:, :, :P, 1:]
    b0 = blended[:, :, 1:, :P]
    b1 = blended[:, :, 1:, 1:]
    patch = (
        (1 - wyb) * (1 - wxb) * a0
        + (1 - wyb) * wxb * a1
        + wyb * (1 - wxb) * b0
        + wyb * wxb * b1
    )  # (B, N, P(y), P(x), C)
    # flatten x-major (index i*P + j, first patch axis offsets x) and move to
    # the reference's (B, P*P, N, C) layout
    support = patch.transpose(0, 3, 2, 1, 4).reshape(B, P * P, N, C)
    center = support[:, None, (P * P) // 2]  # (B, 1, N, C)
    return center, support


class CorrFeaturizer(nn.Module):
    """Owns the correlation-embedding MLP params and runs the fused
    window-gather correlation op (ops/corr.py), or the Pallas kernel
    (ops/kernels/corr_pallas.py) when use_pallas is set. Named "corr_mlp" in
    the param tree for checkpoint compatibility with the reference's corr_mlp
    (cotracker3_online.py:84)."""

    radius: int = 3
    hidden: int = 384
    out: int = 256
    chunk: Optional[int] = None
    dtype: Any = jnp.float32
    use_pallas: bool = False
    quant_int8: bool = False  # int8 window transfer (see corr_pallas)
    # in-kernel bilinear combine + s8 MLP1 epilogue (inference path only;
    # measured ~2 ms/level-iter faster than the 4-term XLA combine on v5e)
    fuse_combine: bool = False
    interpret: bool = False  # Pallas interpret mode (CPU tests)

    @nn.compact
    def __call__(
        self,
        fmaps,
        support,
        coords,
        fold_matrix=None,
        all_levels=False,
        extra_ops=(),
        extra_fn=None,
    ):
        """fold_matrix: optional (out, D) f32 — fold a downstream linear map
        into the correlation MLP's second layer (w2 @ fold, b2 @ fold), so
        the embedding never materializes in its `out`-dim form. Used by
        IterationCore.fold_input_proj to absorb the updateformer input
        projection's per-level slice (pure reassociation of two matmuls).

        all_levels: fmaps/support/fold_matrix are PER-LEVEL lists (fmaps
        prepacked, coords in level-0 units) — runs the whole pyramid through
        ONE chunk loop (corr_pallas.fused_corr_tokens_pallas), summing the
        folded token contributions in-chunk plus extra_fn(*extra_ops chunk)
        for the caller's non-correlation token terms. Pallas path only."""
        P = 2 * self.radius + 1
        d = P * P * P * P
        w1 = self.param("fc1_kernel", nn.initializers.xavier_uniform(), (d, self.hidden))
        b1 = self.param("fc1_bias", nn.initializers.zeros_init(), (self.hidden,))
        w2 = self.param("fc2_kernel", nn.initializers.xavier_uniform(), (self.hidden, self.out))
        b2 = self.param("fc2_bias", nn.initializers.zeros_init(), (self.out,))
        if all_levels:
            assert self.use_pallas and fold_matrix is not None
            from cotracker_tpu.ops.kernels.corr_pallas import (
                fused_corr_tokens_pallas,
            )

            f32 = jnp.float32
            w2f = [w2.astype(f32) @ m.astype(f32) for m in fold_matrix]
            b2f_sum = b2.astype(f32) @ sum(m.astype(f32) for m in fold_matrix)
            return fused_corr_tokens_pallas(
                fmaps, support, coords, w1, b1, w2f, b2f_sum,
                radius=self.radius, chunk=self.chunk,
                compute_dtype=self.dtype, interpret=self.interpret,
                quant_int8=self.quant_int8, fuse_combine=self.fuse_combine,
                extra_ops=extra_ops, extra_fn=extra_fn,
            )
        if fold_matrix is not None:
            f32 = jnp.float32
            w2 = w2.astype(f32) @ fold_matrix.astype(f32)
            b2 = b2.astype(f32) @ fold_matrix.astype(f32)
        if self.use_pallas:
            # fmaps arrive prepacked (8 x-shifted padded copies) — built once
            # per forward in CoTrackerThree.iterate, outside the update scan.
            # A (packed, raw) pair selects the differentiable wrapper (Pallas
            # forward, XLA-vjp backward) so training can run the fast kernel.
            if isinstance(fmaps, (tuple, list)):
                from cotracker_tpu.ops.kernels.corr_pallas import (
                    fused_corr_embs_pallas_trainable,
                )

                packed, raw = fmaps
                return fused_corr_embs_pallas_trainable(
                    packed, raw, support, coords, w1, b1, w2, b2,
                    radius=self.radius, chunk=self.chunk,
                    compute_dtype=self.dtype, track_major=True,
                    quant_int8=self.quant_int8, interpret=self.interpret,
                )
            from cotracker_tpu.ops.kernels.corr_pallas import fused_corr_embs_pallas

            return fused_corr_embs_pallas(
                fmaps, support, coords, w1, b1, w2, b2,
                radius=self.radius, chunk=self.chunk, compute_dtype=self.dtype,
                prepacked=(fmaps.ndim == 4), track_major=True,
                quant_int8=self.quant_int8, fuse_combine=self.fuse_combine,
                interpret=self.interpret,
            )
        return fused_corr_embs(
            fmaps, support, coords, w1, b1, w2, b2,
            radius=self.radius, chunk=self.chunk, compute_dtype=self.dtype,
            track_major=True,
        )


class IterationCore(nn.Module):
    """One transformer update iteration (correlation featurization + input
    build + updateformer + additive update). Scanned over iterations with
    nn.scan so the graph compiles once regardless of `iters`.

    Owns the iteration parameters: "corr_mlp" and "updateformer" submodules.
    Mirrors one step of the reference `forward_window` loop
    (cotracker3_online.py:187-263), including the unconditional coords detach
    (:188) — gradients reach iteration k's coords only through its delta.
    """

    corr_radius: int = 3
    corr_levels: int = 4
    num_virtual_tracks: int = 64
    model_resolution: Tuple[int, int] = (384, 512)
    stride: int = 4
    latent_dim: int = 128
    input_dim: int = 1110
    add_space_attn: bool = True
    linear_layer_for_vis_conf: bool = True
    corr_chunk: Optional[int] = None
    dtype: Any = jnp.float32
    use_pallas_corr: bool = False
    corr_quant_int8: bool = False
    corr_fuse_combine: bool = False
    corr_pallas_interpret: bool = False
    use_pallas_attn: bool = False
    attn_quant_int8: bool = False
    # mesh axis over which N is sharded when running inside shard_map (the
    # track-sharded fast path, parallel/mesh.py): threads down to the
    # virtual<-points psum softmax. None = unsharded.
    track_axis: Optional[str] = None
    # prepack-memory guard for long-T offline videos: when T exceeds this,
    # the 8 x-shifted fmap copies are built per T-slab INSIDE the iteration
    # (recomputed each iter) instead of once for the whole video — bounding
    # the live prepack to ~slab/T of the full footprint (~23 MB/frame at
    # 384x512 across levels; a T=240 video would otherwise hold 5.6 GB of
    # copies through the whole forward). fold_input_proj fast path only.
    prepack_t_slab: Optional[int] = None
    # fold the updateformer input projection into the correlation epilogue:
    # token = sum_lvl gelu(h_lvl) @ (w2 @ Win[lvl rows]) + small terms, so
    # the (B,N,T,1024) corr-emb concat, the (B,N,T,1110) input concat, and
    # the 1110-wide projection read never touch HBM (~5 GB/iter at the bench
    # shape). Pure matmul reassociation — same math as the reference's
    # concat + Linear (cotracker3_online.py:207-230 + cotracker.py:460).
    fold_input_proj: bool = False

    def setup(self):
        self.corr_mlp = CorrFeaturizer(
            radius=self.corr_radius, chunk=self.corr_chunk, dtype=self.dtype,
            use_pallas=self.use_pallas_corr, quant_int8=self.corr_quant_int8,
            fuse_combine=self.corr_fuse_combine,
            interpret=self.corr_pallas_interpret,
            name="corr_mlp"
        )
        self.updateformer = EfficientUpdateFormer(
            space_depth=3,
            time_depth=3,
            input_dim=self.input_dim,
            hidden_size=384,
            num_heads=8,
            output_dim=4,
            mlp_ratio=4.0,
            num_virtual_tracks=self.num_virtual_tracks,
            add_space_attn=self.add_space_attn,
            linear_layer_for_vis_conf=self.linear_layer_for_vis_conf,
            dtype=None if self.dtype == jnp.float32 else self.dtype,
            use_pallas_attn=self.use_pallas_attn,
            quant_int8=self.attn_quant_int8,
            track_axis=self.track_axis,
            name="updateformer",
        )

    def __call__(self, carry, _, fmaps_pyramid, support_pyramid, track_mask, time_emb):
        coords, vis, conf = carry
        coords = jax.lax.stop_gradient(coords)
        B, T, N, _ = coords.shape
        scale = (
            jnp.asarray([self.model_resolution[1], self.model_resolution[0]], jnp.float32)
            / self.stride
        )

        coords_nt = coords.transpose(0, 2, 1, 3)  # (B, N, T, 2) — tiny
        rel_fwd = jnp.pad(coords_nt[:, :, :-1] - coords_nt[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
        rel_bwd = jnp.pad(coords_nt[:, :, 1:] - coords_nt[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
        rel = jnp.concatenate([rel_fwd / scale, rel_bwd / scale], axis=-1)
        rel_emb = posenc(rel, min_deg=0, max_deg=10)  # (B, N, T, 84)

        # the transformer input is assembled TRACK-MAJOR (B, N, T, ·): the
        # correlation featurizers emit that layout directly (the swap rides
        # their MLP einsums) and the remaining pieces are built from tiny
        # tensors, so the O(T*N*1110) relayout the reference's token build
        # implies never happens.
        if self.fold_input_proj:
            # absorb the input projection into the per-level correlation
            # epilogues: each level emits its 384-d token CONTRIBUTION
            # (gelu(h) @ w2 @ Win_slice); the 1024-d concat, the 1110-d
            # input tensor, and the separate projection pass all vanish.
            # Input layout (1110 rows of Win): [vis, conf, corr x1024, rel x84]
            kin = self.updateformer.input_transform.kernel.astype(jnp.float32)
            bin_ = self.updateformer.input_transform.bias.astype(jnp.float32)
            D = self.corr_mlp.out  # 256-d embedding per level
            cd = self.dtype
            slices = [kin[2 + D * i : 2 + D * (i + 1)] for i in range(self.corr_levels)]
            krel = kin[2 + D * self.corr_levels :]
            time_proj = time_emb[:, None].astype(jnp.float32) @ kin  # (1,1,T,Dtok)
            pallas_inference = self.use_pallas_corr and not isinstance(
                fmaps_pyramid[0], (tuple, list)
            )
            if pallas_inference:
                # single chunk loop over all levels: per chunk the window
                # kernels + MLP1 + folded projections + the small terms all
                # accumulate before anything returns to HBM. Tuple entries
                # are PRE-QUANTIZED (int8, scale) support hoisted out of the
                # scan by iterate() — already track-major.
                sup_list = [
                    s if isinstance(s, tuple) else s.transpose(0, 2, 1, 3)
                    for s in support_pyramid
                ]

                def make_extra_fn(tp):
                    def extra_fn(vis_c, conf_c, rel_c):
                        # non-correlation token terms, per chunk: rank-1
                        # logit rows, the 84-d rel-emb matmul, projected
                        # time embedding, input bias
                        remb = posenc(rel_c, min_deg=0, max_deg=10)
                        return (
                            vis_c[..., None].astype(jnp.float32) * kin[0]
                            + conf_c[..., None].astype(jnp.float32) * kin[1]
                            + jnp.einsum(
                                "bntr,rk->bntk", remb.astype(cd),
                                krel.astype(cd),
                                preferred_element_type=jnp.float32,
                            )
                            + tp
                            + bin_
                        )

                    return extra_fn

                vis_nt = vis.transpose(0, 2, 1)
                conf_nt = conf.transpose(0, 2, 1)
                slab_mode = fmaps_pyramid[0].ndim == 5  # raw maps: iterate
                # skipped the whole-video prepack (prepack_t_slab guard)
                if slab_mode:
                    from cotracker_tpu.ops.kernels.corr_pallas import (
                        build_shifted_fmaps,
                    )

                    ts = self.prepack_t_slab
                    parts = []
                    for si in range(0, T, ts):
                        sl = min(ts, T - si)
                        packed = [
                            build_shifted_fmaps(
                                f[:, si : si + sl], self.corr_radius,
                                cd, quant_int8=self.corr_quant_int8,
                            )
                            for f in fmaps_pyramid
                        ]
                        parts.append(
                            self.corr_mlp(
                                packed, sup_list,
                                coords[:, si : si + sl].astype(cd),
                                fold_matrix=slices, all_levels=True,
                                extra_ops=(
                                    vis_nt[:, :, si : si + sl],
                                    conf_nt[:, :, si : si + sl],
                                    rel[:, :, si : si + sl],
                                ),
                                extra_fn=make_extra_fn(
                                    time_proj[:, :, si : si + sl]
                                ),
                            )
                        )
                    x = jnp.concatenate(parts, axis=2)
                else:
                    x = self.corr_mlp(
                        list(fmaps_pyramid), sup_list, coords.astype(cd),
                        fold_matrix=slices, all_levels=True,
                        extra_ops=(vis_nt, conf_nt, rel),
                        extra_fn=make_extra_fn(time_proj),
                    )
            else:
                x = None
                for i in range(self.corr_levels):
                    sup = support_pyramid[i].transpose(0, 2, 1, 3)
                    contrib = self.corr_mlp(
                        fmaps_pyramid[i], sup, coords.astype(cd) / 2**i,
                        fold_matrix=slices[i],
                    )
                    x = contrib if x is None else x + contrib
                # the small terms ride one fused elementwise pass
                small = (
                    vis.transpose(0, 2, 1)[..., None].astype(jnp.float32) * kin[0]
                    + conf.transpose(0, 2, 1)[..., None].astype(jnp.float32) * kin[1]
                    + jnp.einsum(
                        "bntr,rk->bntk", rel_emb.astype(cd), krel.astype(cd),
                        preferred_element_type=jnp.float32,
                    )
                    + time_proj[:, 0]
                    + bin_
                )
                x = x + small.astype(cd)
            delta = self.updateformer(
                x, track_mask=track_mask, add_space_attn=self.add_space_attn,
                x_is_tokens=True,
            ).astype(jnp.float32)
        else:
            corr_embs = []
            for i in range(self.corr_levels):
                # support comes in as (B, P*P, N, C); the fused op wants (B, N, P*P, C)
                sup = support_pyramid[i].transpose(0, 2, 1, 3)
                corr_embs.append(
                    self.corr_mlp(fmaps_pyramid[i], sup, coords.astype(self.dtype) / 2**i)
                )
            corr_embs = jnp.concatenate(corr_embs, axis=-1)  # (B, N, T, 1024)

            x = jnp.concatenate(
                [
                    vis.transpose(0, 2, 1)[..., None].astype(self.dtype),
                    conf.transpose(0, 2, 1)[..., None].astype(self.dtype),
                    corr_embs,
                    rel_emb.astype(self.dtype),
                ],
                axis=-1,
            )  # (B, N, T, 1110)
            x = x + time_emb[:, None, :, :].astype(self.dtype)

            delta = self.updateformer(
                x, track_mask=track_mask, add_space_attn=self.add_space_attn
            ).astype(jnp.float32)
        delta = delta.transpose(0, 2, 1, 3)  # (B, T, N, 4)

        coords = coords + delta[..., :2]
        vis = vis + delta[..., 2]
        conf = conf + delta[..., 3]
        return (coords, vis, conf), (coords * float(self.stride), vis, conf)


class OnlineState(NamedTuple):
    """Explicit streaming-tracker carry (replaces reference module attributes,
    cotracker3_online.py:163-169). All buffers are fixed-capacity."""

    ind: jnp.ndarray  # () int32 — start frame of the next window
    track_feat: Any  # tuple over levels: (B, 1, N, C)
    track_support: Any  # tuple over levels: (B, P*P, N, C)
    coords: jnp.ndarray  # (B, CAP, N, 2) — predicted tracks, model pixels
    vis: jnp.ndarray  # (B, CAP, N) — visibility logits
    conf: jnp.ndarray  # (B, CAP, N) — confidence logits
    # level-0 feature maps of the previous window's last `step` frames —
    # consecutive windows overlap by S//2, so half of every window's fnet
    # (the per-step dominant once-cost at quasi-dense N) is re-encoding
    # frames the previous step already encoded. Cached exactly (fnet is
    # per-frame), ~25 MB at 384x512/window-16.
    fmaps_tail: jnp.ndarray  # (B, S//2, H/stride, W/stride, latent)
    # number of REAL (non-padded) frames in fmaps_tail: callers pad short
    # chunks by repeating the last frame (reference cotracker3_online.py:
    # 320-328), so a tail cached from a padded chunk holds features of fake
    # frames — if the stream then CONTINUES with the real frames, the cache
    # must not serve them. online_step re-encodes everything unless
    # tail_valid == step.
    tail_valid: jnp.ndarray  # () int32


class CoTrackerThree(nn.Module):
    """The tracker core. One parameterization serves offline (window_len=60)
    and online (window_len=16) checkpoints, like the reference family."""

    window_len: int = 60
    stride: int = 4
    corr_radius: int = 3
    corr_levels: int = 4
    num_virtual_tracks: int = 64
    model_resolution: Tuple[int, int] = (384, 512)
    add_space_attn: bool = True
    linear_layer_for_vis_conf: bool = True
    latent_dim: int = 128
    input_dim: int = 1110
    dtype: Any = jnp.float32
    # chunk size over N for the correlation featurizer (bounds the transient
    # (B,T,chunk,P,P,C) patch memory on-chip); None = no chunking
    corr_chunk: Optional[int] = None
    # run the correlation featurizer as a Pallas TPU kernel
    use_pallas_corr: bool = False
    # move correlation windows through HBM as int8 (halves the scattered-DMA
    # bytes that bound the corr kernel; exact to ~0.4% on the L2-normalized
    # feature maps). Only meaningful with use_pallas_corr.
    corr_quant_int8: bool = False
    # in-kernel bilinear combine (pltpu.roll) + native s8xs8->s32 MLP1
    # epilogue — inference-only refinement of the int8 path (corr_pallas.py
    # fuse_combine); ignored on the corr_pallas_grad training path
    corr_fuse_combine: bool = False
    # fold the updateformer input projection into the correlation epilogue
    # (see IterationCore.fold_input_proj) — inference fast path
    fold_input_proj: bool = False
    # run the updateformer time-attention core as a Pallas TPU kernel
    use_pallas_attn: bool = False
    # run the updateformer block bodies (qkv/out projections + MLPs) as
    # fused W8A8 Pallas kernels (see ops/kernels/mlp_int8_pallas.py)
    attn_quant_int8: bool = False
    # mesh axis over which the N (tracks) axis is sharded: set this when the
    # model is applied INSIDE jax.shard_map with per-shard queries/support
    # (parallel/mesh.py track-sharded fast path). The Pallas kernels then run
    # per shard on local N and the only collective is the virtual-token psum.
    track_axis: Optional[str] = None
    # long-video prepack guard (see IterationCore.prepack_t_slab); engaged
    # only when T > prepack_t_slab, so bench/window shapes are untouched
    prepack_t_slab: Optional[int] = None
    # make the Pallas corr featurizer differentiable (Pallas forward, XLA-vjp
    # backward — see corr_pallas.fused_corr_embs_pallas_trainable): training
    # configs set this together with use_pallas_corr. Off by default so the
    # tuned inference path is untouched.
    corr_pallas_grad: bool = False
    # run Pallas kernels in interpret mode (CPU-backend tests only)
    corr_pallas_interpret: bool = False
    # rematerialize each update iteration in the backward pass
    # (jax.checkpoint over the scanned body) — required to train at real
    # shapes: the per-iteration correlation/attention intermediates otherwise
    # dominate activation memory (reference trains bf16 without remat only
    # because torch frees per-iteration graphs lazily).
    remat_iterations: bool = False

    def setup(self):
        self.fnet = BasicEncoder(output_dim=self.latent_dim, stride=self.stride, dtype=self.dtype)
        # the per-iteration core is lifted with nn.scan: params broadcast
        # across iterations, one compiled iteration body regardless of iters
        core = IterationCore
        if self.remat_iterations:
            core = nn.remat(core, prevent_cse=False)
        self.iter_core = nn.scan(
            core,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
        )(
            corr_radius=self.corr_radius,
            corr_levels=self.corr_levels,
            num_virtual_tracks=self.num_virtual_tracks,
            model_resolution=self.model_resolution,
            stride=self.stride,
            latent_dim=self.latent_dim,
            input_dim=self.input_dim,
            add_space_attn=self.add_space_attn,
            linear_layer_for_vis_conf=self.linear_layer_for_vis_conf,
            corr_chunk=self.corr_chunk,
            dtype=self.dtype,
            use_pallas_corr=self.use_pallas_corr,
            corr_quant_int8=self.corr_quant_int8,
            corr_fuse_combine=self.corr_fuse_combine,
            corr_pallas_interpret=self.corr_pallas_interpret,
            use_pallas_attn=self.use_pallas_attn,
            attn_quant_int8=self.attn_quant_int8,
            track_axis=self.track_axis,
            prepack_t_slab=self.prepack_t_slab,
            fold_input_proj=self.fold_input_proj,
            name="iter_core",
        )
        # Deterministic sincos time embedding over the trained window length
        # (reference registers it as a buffer, cotracker3_online.py:86-92).
        grid = np.linspace(0, self.window_len - 1, self.window_len)
        self.time_emb = np.asarray(get_1d_sincos_pos_embed(self.input_dim, grid))

    # ---------------------------------------------------------------- features

    def compute_fmaps(self, video, chunk_size: Optional[int] = None):
        """video (B, T, H, W, 3) in [0, 255] -> L2-normalized fmaps
        (B, T, H/stride, W/stride, latent_dim) in compute dtype.

        chunk_size bounds fnet activation memory for long videos by encoding
        `chunk_size` frames at a time (reference fmaps_chunk_size=200,
        cotracker3_offline.py:81-91). Chunks are a static Python loop — the
        per-frame conv stack is batch-independent, so outputs are exact."""
        B, T, H, W, _ = video.shape
        video = (2 * (video / 255.0) - 1.0).astype(self.dtype)
        frames = video.reshape(B * T, H, W, 3)
        if chunk_size is not None and B * T > chunk_size:
            fmaps = jnp.concatenate(
                [
                    self.fnet(frames[i : i + chunk_size])
                    for i in range(0, B * T, chunk_size)
                ],
                axis=0,
            )
        else:
            fmaps = self.fnet(frames)
        fmaps32 = fmaps.astype(jnp.float32)
        denom = jnp.sqrt(jnp.maximum(jnp.sum(fmaps32**2, axis=-1, keepdims=True), 1e-12))
        fmaps = (fmaps32 / denom).astype(self.dtype)
        return fmaps.reshape(B, T, H // self.stride, W // self.stride, self.latent_dim)

    def build_pyramid(self, fmaps):
        """Average-pool pyramid, `corr_levels` deep (reference
        cotracker3_offline.py:105-117)."""
        pyramid = [fmaps]
        for _ in range(self.corr_levels - 1):
            B, T, H, W, C = fmaps.shape
            x = fmaps.reshape(B * T, H, W, C)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            fmaps = x.reshape(B, T, H // 2, W // 2, C)
            pyramid.append(fmaps)
        return pyramid

    def track_feat_pyramid(self, fmaps_pyramid, queried_frames, queried_coords):
        feats, supports = [], []
        for i, fmaps in enumerate(fmaps_pyramid):
            f, s = get_track_feat(
                fmaps, queried_frames, queried_coords / 2**i, self.corr_radius
            )
            # the bilinear blend promotes bf16 fmaps x f32 weights to f32 —
            # pin support back to the compute dtype or every downstream
            # masked copy is f32 (1.65 GB/level at quasi-dense N)
            feats.append(f.astype(self.dtype))
            supports.append(s.astype(self.dtype))
        return feats, supports

    # ---------------------------------------------------------------- updates

    def iterate(
        self,
        fmaps_pyramid,
        track_support_pyramid,
        coords,
        vis,
        conf,
        iters: int,
        track_mask: Optional[jnp.ndarray] = None,
        add_space_attn: bool = True,
        stop_grad_between_iters: bool = True,  # kept for API compat; the core
        # always detaches coords, exactly like the reference (:188)
    ):
        """Run `iters` transformer updates over one window via nn.scan.

        coords (B, T, N, 2) f32 in fmap (stride) units; vis/conf (B, T, N) f32
        logits. Returns per-iteration stacked predictions:
          coords_preds (iters, B, T, N, 2) in model pixels,
          vis_preds / conf_preds (iters, B, T, N) logits.
        Mirrors reference `forward_window` (cotracker3_online.py:171-264).
        """
        del stop_grad_between_iters
        assert add_space_attn == self.add_space_attn, (
            "per-call add_space_attn override is not supported by the scanned "
            "iteration core; configure the model with add_space_attn instead"
        )
        T = fmaps_pyramid[0].shape[1]
        time_emb = self.interpolate_time_embed(T)
        # hoist the support quantization out of the scanned iteration body:
        # support is iteration-invariant, so the in-chunk per-iter amax +
        # round (the quasi-dense-safe default) is pure waste at moderate N
        # (~25 ms of the bench forward). Full-N int8 staging is
        # N*49*C bytes/level — gated to N <= 16384 (<= 103 MB/level) so the
        # quasi-dense 70k-track shapes keep the in-chunk memory behavior.
        if (
            self.use_pallas_corr
            and self.corr_quant_int8
            and self.fold_input_proj
            and not self.corr_pallas_grad
        ):
            small_n = track_support_pyramid[0].shape[2] <= 16384
            quantized = []
            for s in track_support_pyramid:
                snt = s.transpose(0, 2, 1, 3).astype(self.dtype)  # (B,N,S,C)
                amax = jnp.maximum(
                    jnp.max(jnp.abs(snt), axis=(2, 3)).astype(jnp.float32),
                    1e-20,
                )
                if small_n:
                    sq = jnp.round(
                        snt.astype(jnp.float32) * (127.0 / amax[..., None, None])
                    ).astype(jnp.int8)
                    quantized.append((sq, amax * (1.0 / 127.0 / 128.0)))
                else:
                    # large N (quasi-dense): hoist only the amax REDUCTION
                    # (it re-read the full support every iteration); the
                    # int8 round stays in-chunk so no full-N int8 staging
                    # exists (the round-2 OOM driver)
                    quantized.append((snt, amax))
            track_support_pyramid = quantized
        slab_mode = (
            self.use_pallas_corr
            and self.prepack_t_slab is not None
            and T > self.prepack_t_slab
            and self.fold_input_proj
            and not self.corr_pallas_grad
        )
        if self.use_pallas_corr and not slab_mode:
            # hoist the kernel's padded x-shifted copies out of the scan body;
            # with corr_pallas_grad each level becomes a (packed, raw) pair —
            # the raw map is the gradient channel of the differentiable
            # kernel wrapper (forward-only traces DCE it)
            from cotracker_tpu.ops.kernels.corr_pallas import build_shifted_fmaps

            packed = [
                build_shifted_fmaps(
                    f, self.corr_radius, self.dtype,
                    quant_int8=self.corr_quant_int8,
                )
                for f in fmaps_pyramid
            ]
            if self.corr_pallas_grad:
                fmaps_pyramid = [(p, f) for p, f in zip(packed, fmaps_pyramid)]
            else:
                fmaps_pyramid = packed
        _, ys = self.iter_core(
            (coords, vis, conf),
            jnp.zeros((iters,), jnp.int32),  # drives scan length
            tuple(fmaps_pyramid),
            tuple(track_support_pyramid),
            track_mask,
            time_emb,
        )
        return ys

    def interpolate_time_embed(self, t: int):
        """(1, t, input_dim) time embedding; linearly interpolated when t
        differs from the trained window length (reference
        cotracker3_online.py:145-156)."""
        emb = jnp.asarray(self.time_emb)
        if t == emb.shape[1]:
            return emb
        return resize_linear_1d(emb, t, align_corners=False, axis=1)

    # ---------------------------------------------------------------- offline

    def forward_from_pyramid(
        self,
        fmaps_pyramid,
        queries,
        iters: int = 4,
        track_mask: Optional[jnp.ndarray] = None,
        add_space_attn: bool = True,
    ):
        """Single-window forward given a precomputed feature pyramid:
        support sampling + masking, cold carry init, scanned iterations.
        Returns per-iteration (coords px, vis logits, conf logits) stacks.

        Shared by the offline `__call__` and the track-sharded shard_map
        body (parallel/mesh.py) so the sharded path cannot drift from the
        unsharded semantics."""
        B, N = queries.shape[0], queries.shape[1]
        T = fmaps_pyramid[0].shape[1]
        queried_frames = queries[..., 0].astype(jnp.float32)
        queried_coords = queries[..., 1:3].astype(jnp.float32) / self.stride

        _, track_support_pyramid = self.track_feat_pyramid(
            fmaps_pyramid, queried_frames, queried_coords
        )
        if track_mask is not None:
            track_support_pyramid = [
                s * track_mask[:, None, :, None].astype(s.dtype)
                for s in track_support_pyramid
            ]

        coords = jnp.broadcast_to(
            queried_coords[:, None], (B, T, N, 2)
        ).astype(jnp.float32)
        vis = jnp.zeros((B, T, N), jnp.float32)
        conf = jnp.zeros((B, T, N), jnp.float32)
        return self.iterate(
            fmaps_pyramid,
            track_support_pyramid,
            coords,
            vis,
            conf,
            iters=iters,
            track_mask=track_mask,
            add_space_attn=add_space_attn,
        )

    def __call__(
        self,
        video,
        queries,
        iters: int = 4,
        track_mask: Optional[jnp.ndarray] = None,
        add_space_attn: bool = True,
        is_train: bool = False,
        fmaps_chunk_size: Optional[int] = 200,
    ):
        """Offline forward: whole video as one window.

        video (B, T, H, W, 3) in [0, 255]; queries (B, N, 3) as (t, x, y) in
        model pixels. track_mask (B, N) marks real (non-padding) tracks.

        Returns (coords, vis, conf, train_data):
          coords (B, T, N, 2) pixels, vis/conf (B, T, N) probabilities;
          train_data = per-iter (coords, vis, conf probabilities, valid_mask)
          when is_train else None.
        Mirrors reference CoTrackerThreeOffline.forward
        (cotracker3_offline.py:19-233).
        """
        # bound fnet activation memory on long videos (reference chunks 200
        # frames when not training, cotracker3_offline.py:81-91)
        fmaps = self.compute_fmaps(
            video, chunk_size=None if is_train else fmaps_chunk_size
        )
        fmaps_pyramid = self.build_pyramid(fmaps)
        coord_preds, vis_preds, conf_preds = self.forward_from_pyramid(
            fmaps_pyramid, queries, iters=iters, track_mask=track_mask,
            add_space_attn=add_space_attn,
        )

        out_coords = coord_preds[-1]
        out_vis = jax.nn.sigmoid(vis_preds[-1])
        out_conf = jax.nn.sigmoid(conf_preds[-1])

        train_data = None
        if is_train:
            B, T, N = out_vis.shape
            valid_mask = jnp.ones((B, T, N), jnp.float32)
            train_data = (
                coord_preds,
                jax.nn.sigmoid(vis_preds),
                jax.nn.sigmoid(conf_preds),
                valid_mask,
            )
        return out_coords, out_vis, out_conf, train_data

    # ------------------------------------------------------------- multi-window

    def forward_windows(
        self,
        video,
        queries,
        iters: int = 4,
        track_mask: Optional[jnp.ndarray] = None,
        add_space_attn: bool = True,
        is_train: bool = False,
        fmaps_chunk_size: Optional[int] = 200,
    ):
        """Sliding-window forward over a full video with warm-started window
        chaining — the reference CoTrackerThreeOnline.forward with
        is_online=False (cotracker3_online.py:266-541). This is how the
        window-16 (online-checkpoint) model is TRAINED and how it runs
        non-streaming inference over videos longer than one window.

        video (B, T, H, W, 3) in [0, 255]; queries (B, N, 3) (t, x, y) model
        pixels. Window indices are static Python ints, so every window slice
        and buffer write is a static-shape op; the per-iteration core is the
        same scanned IterationCore the single-window paths use.

        Returns (coords (B,T,N,2) px, vis, conf (B,T,N) probabilities,
        train_data). When is_train, train_data = (per-window tuple of
        (iters,B,S,N,2) coords, per-window sigmoid vis, per-window sigmoid
        conf, valid_mask (B,T,N) "query started" mask) mirroring the
        reference's all_*_predictions lists (cotracker3_online.py:508-518,
        528-538); windows extending past T are kept full-length here — the
        loss masks the padded frames instead of truncating (reference
        S_trimmed slicing)."""
        B, T, H, W, _ = video.shape
        N = queries.shape[1]
        S = self.window_len
        step = S // 2

        queried_frames = queries[..., 0].astype(jnp.float32)
        queried_coords = queries[..., 1:3].astype(jnp.float32) / self.stride

        # reference: num_windows = (T - S + step - 1) // step + 1, clamped so
        # short videos still get one window
        num_windows = max(1, -(-(T - S) // step) + 1)
        T_buf = step * (num_windows - 1) + S
        if T_buf > T:
            # repeat the last frame (reference pad, cotracker3_online.py:320-328)
            pad = jnp.broadcast_to(video[:, -1:], (B, T_buf - T) + video.shape[2:])
            video = jnp.concatenate([video, pad], axis=1)

        fmaps = self.compute_fmaps(
            video, chunk_size=None if is_train else fmaps_chunk_size
        )
        fmaps_pyramid = self.build_pyramid(fmaps)
        _, support_pyramid = self.track_feat_pyramid(
            fmaps_pyramid, queried_frames, queried_coords
        )
        if track_mask is not None:
            support_pyramid = [
                s * track_mask[:, None, :, None].astype(s.dtype)
                for s in support_pyramid
            ]

        coords_buf = jnp.zeros((B, T_buf, N, 2), jnp.float32)
        vis_buf = jnp.zeros((B, T_buf, N), jnp.float32)  # logits
        conf_buf = jnp.zeros((B, T_buf, N), jnp.float32)

        all_coords, all_vis, all_conf = [], [], []
        overlap = S - step
        for w in range(num_windows):
            ind = w * step
            coords_init = jnp.broadcast_to(
                queried_coords[:, None], (B, S, N, 2)
            ).astype(jnp.float32)
            vis_init = jnp.zeros((B, S, N), jnp.float32)
            conf_init = jnp.zeros((B, S, N), jnp.float32)
            if ind > 0:
                # warm start from the overlap with the previous window
                # (reference cotracker3_online.py:456-482); gradients flow
                # across windows through vis/conf (coords are detached at the
                # top of every iteration, like the reference)
                copy_over = (queried_frames < float(ind + overlap))[:, None, :]

                def warm(buf, init, extra_dims):
                    sl = buf[:, ind : ind + overlap]
                    last = jnp.broadcast_to(sl[:, -1:], (B, step) + sl.shape[2:])
                    prev = jnp.concatenate([sl, last], axis=1)  # (B, S, ...)
                    cw = copy_over
                    for _ in range(extra_dims):
                        cw = cw[..., None]
                    return jnp.where(cw, prev, init)

                coords_init = warm(coords_buf / self.stride, coords_init, 1)
                vis_init = warm(vis_buf, vis_init, 0)
                conf_init = warm(conf_buf, conf_init, 0)

            active = queried_frames < float(ind + S)  # (B, N)
            wmask = active
            if track_mask is not None:
                wmask = active & track_mask.astype(bool)
            sup = [
                s * active[:, None, :, None].astype(s.dtype) for s in support_pyramid
            ]
            window_pyr = [f[:, ind : ind + S] for f in fmaps_pyramid]

            cp, vp, fp = self.iterate(
                window_pyr,
                sup,
                coords_init,
                vis_init,
                conf_init,
                iters=iters,
                track_mask=wmask,
                add_space_attn=add_space_attn,
            )
            coords_buf = coords_buf.at[:, ind : ind + S].set(cp[-1])
            vis_buf = vis_buf.at[:, ind : ind + S].set(vp[-1])
            conf_buf = conf_buf.at[:, ind : ind + S].set(fp[-1])
            if is_train:
                all_coords.append(cp)
                all_vis.append(jax.nn.sigmoid(vp))
                all_conf.append(jax.nn.sigmoid(fp))

        out_coords = coords_buf[:, :T]
        out_vis = jax.nn.sigmoid(vis_buf[:, :T])
        out_conf = jax.nn.sigmoid(conf_buf[:, :T])
        train_data = None
        if is_train:
            # "query has started" mask (reference cotracker3_online.py:528-533)
            valid_mask = (
                queried_frames[:, None, :]
                <= jnp.arange(T, dtype=jnp.float32)[None, :, None]
            ).astype(jnp.float32)
            train_data = (tuple(all_coords), tuple(all_vis), tuple(all_conf), valid_mask)
        return out_coords, out_vis, out_conf, train_data

    # ----------------------------------------------------------------- online

    def online_init(self, batch: int, num_tracks: int, capacity: int):
        """Fresh streaming state with `capacity` frames of prediction buffer.

        Functional replacement for reference `init_video_online_processing`
        (cotracker3_online.py:163-169)."""
        P = 2 * self.corr_radius + 1
        mk = lambda shape: jnp.zeros(shape, self.dtype)
        ih, iw = self.model_resolution
        return OnlineState(
            ind=jnp.asarray(0, jnp.int32),
            track_feat=tuple(
                mk((batch, 1, num_tracks, self.latent_dim)) for _ in range(self.corr_levels)
            ),
            track_support=tuple(
                mk((batch, P * P, num_tracks, self.latent_dim))
                for _ in range(self.corr_levels)
            ),
            coords=jnp.zeros((batch, capacity, num_tracks, 2), jnp.float32),
            vis=jnp.zeros((batch, capacity, num_tracks), jnp.float32),
            conf=jnp.zeros((batch, capacity, num_tracks), jnp.float32),
            fmaps_tail=mk(
                (
                    batch,
                    self.window_len // 2,
                    ih // self.stride,
                    iw // self.stride,
                    self.latent_dim,
                )
            ),
            tail_valid=jnp.asarray(0, jnp.int32),
        )

    def online_step(
        self,
        state: OnlineState,
        video_chunk,
        queries,
        iters: int = 4,
        track_mask: Optional[jnp.ndarray] = None,
        add_space_attn: bool = True,
        chunk_valid_len=None,
    ):
        """Process one sliding window [ind, ind+S) of the stream.

        video_chunk (B, S, H, W, 3): the current window, already padded to
        exactly S = window_len frames (callers pad short tails by repeating
        the last frame, as the reference does at cotracker3_online.py:320-328).
        queries (B, N, 3) global (t, x, y) in model pixels.
        chunk_valid_len: number of REAL frames in the chunk before padding
        (defaults to S). Gates the fmaps_tail overlap cache: a tail cached
        from padded frames is not reused if the stream continues.

        Returns (new_state, coords (B, CAP, N, 2) pixels, vis/conf (B, CAP, N)
        probabilities) where the prediction buffers are valid on
        [0, ind + S). Mirrors reference CoTrackerThreeOnline.forward with
        is_online=True (cotracker3_online.py:266-541).
        """
        B, S, H, W, _ = video_chunk.shape
        assert S == self.window_len
        N = queries.shape[1]
        step = S // 2
        ind = state.ind

        queried_frames = queries[..., 0].astype(jnp.float32)
        queried_coords = queries[..., 1:3].astype(jnp.float32) / self.stride

        # consecutive windows overlap by `step`: the first `overlap` frames
        # of this chunk are the previous chunk's last frames, whose level-0
        # fmaps sit in state.fmaps_tail — re-encode only the new frames
        # (fnet is per-frame, so the cache is exact). First window (ind==0)
        # encodes everything, as does any window following a PADDED chunk
        # (tail_valid < step: the cached tail holds repeated-last-frame
        # features that must not stand in for later real frames).
        fmaps = jax.lax.cond(
            (ind == 0) | (state.tail_valid < step),
            lambda: self.compute_fmaps(video_chunk),
            lambda: jnp.concatenate(
                [
                    state.fmaps_tail,
                    self.compute_fmaps(video_chunk[:, S - step :]),
                ],
                axis=1,
            ),
        )
        fmaps_pyramid = self.build_pyramid(fmaps)

        # masked accumulation of track features for queries that fall in the
        # fresh part of this window (reference cotracker3_online.py:410-443)
        left = jnp.where(ind == 0, 0, ind + step)
        right = ind + S
        qf = queried_frames
        sample_mask = ((qf >= left) & (qf < right))[:, None, :, None].astype(self.dtype)

        def sample_and_accumulate(carry):
            feat, support = carry
            new_feat, new_support = [], []
            for i, fmaps_lvl in enumerate(fmaps_pyramid):
                f, s = get_track_feat(
                    fmaps_lvl,
                    queried_frames - ind.astype(jnp.float32),
                    queried_coords / 2**i,
                    self.corr_radius,
                )
                # keep the streaming state in compute dtype: the bilinear
                # blend promotes to f32, which would flip the carry dtype
                # (recompile) and make every support temp f32 (the
                # quasi-dense OOM driver) — cast BEFORE the mask multiply so
                # no f32 full-size temp exists
                f = f.astype(self.dtype)
                s = s.astype(self.dtype)
                new_feat.append(feat[i] + f * sample_mask)
                new_support.append(support[i] + s * sample_mask)
            return tuple(new_feat), tuple(new_support)

        # once every query's window has passed, sample_mask is all-zero and
        # the accumulate is a numeric no-op — but it would still gather and
        # stream ~(1+49) x N x C per level through HBM every step (5.5 GB at
        # quasi-dense N). Steady streaming (all queries absorbed) skips it.
        new_feat, new_support = jax.lax.cond(
            jnp.any(sample_mask > 0),
            sample_and_accumulate,
            lambda carry: carry,
            (state.track_feat, state.track_support),
        )

        # warm start from the overlap with the previous window
        # (reference cotracker3_online.py:456-482)
        overlap = S - step
        coords_init = jnp.broadcast_to(queried_coords[:, None], (B, S, N, 2))
        vis_init = jnp.zeros((B, S, N), jnp.float32)
        conf_init = jnp.zeros((B, S, N), jnp.float32)

        def warm(prev_buf, init, extra_dims):
            # prev_buf: (B, CAP, N, ...); take [ind : ind+overlap), pad by last
            sl = jax.lax.dynamic_slice_in_dim(prev_buf, ind, overlap, axis=1)
            pad = jnp.repeat(sl[:, -1:], step, axis=1)
            prev = jnp.concatenate([sl, pad], axis=1)  # (B, S, N, ...)
            copy_over = (queried_frames < (ind + overlap).astype(jnp.float32))[:, None, :]
            for _ in range(extra_dims):
                copy_over = copy_over[..., None]
            return jnp.where(copy_over, prev, init)

        first = ind == 0

        def warm_all():
            c = warm(state.coords / self.stride, coords_init, 1)
            v = warm(state.vis, vis_init, 0)
            f = warm(state.conf, conf_init, 0)
            return c, v, f

        coords_init, vis_init, conf_init = jax.tree_util.tree_map(
            lambda a, b: jnp.where(first, a, b),
            (jnp.broadcast_to(queried_coords[:, None], (B, S, N, 2)), vis_init, conf_init),
            warm_all(),
        )

        # tracks that haven't been queried yet: the reference defensively
        # zeroes their support (cotracker3_online.py:484-496), but on this
        # streaming path the multiply is a numeric NO-OP — sample_mask only
        # ever accumulates a query's support once its window has arrived,
        # i.e. exactly when queried_frames < ind + S, so support is already
        # zero wherever `active` is False. Skipping it avoids 4 full-size
        # masked copies per step (3.3 GB at quasi-dense N).
        support_pyramid = list(new_support)

        coord_preds, vis_preds, conf_preds = self.iterate(
            fmaps_pyramid,
            support_pyramid,
            coords_init,
            vis_init,
            conf_init,
            iters=iters,
            track_mask=track_mask,
            add_space_attn=add_space_attn,
            stop_grad_between_iters=False,
        )

        coords_buf = jax.lax.dynamic_update_slice_in_dim(
            state.coords, coord_preds[-1], ind, axis=1
        )
        vis_buf = jax.lax.dynamic_update_slice_in_dim(state.vis, vis_preds[-1], ind, axis=1)
        conf_buf = jax.lax.dynamic_update_slice_in_dim(state.conf, conf_preds[-1], ind, axis=1)

        if chunk_valid_len is None:
            chunk_valid_len = jnp.asarray(S, jnp.int32)
        new_state = OnlineState(
            ind=ind + step,
            track_feat=tuple(new_feat),
            track_support=tuple(new_support),
            coords=coords_buf,
            vis=vis_buf,
            conf=conf_buf,
            # the next window's first `step` frames are this chunk's last
            fmaps_tail=fmaps[:, S - step :],
            tail_valid=jnp.clip(
                jnp.asarray(chunk_valid_len, jnp.int32) - step, 0, step
            ),
        )
        return (
            new_state,
            coords_buf,
            jax.nn.sigmoid(vis_buf),
            jax.nn.sigmoid(conf_buf),
        )
