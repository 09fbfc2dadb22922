"""Fused local-correlation featurizer — the tracker's hot op.

Computes, for every (frame t, track n): a (2r+1)^2 x (2r+1)^2 local 4D
correlation volume between a bilinearly-sampled feature patch at the current
coordinate estimate and the track's support patch, followed by the
2401->384->256 embedding MLP. Equivalent to the reference hot loop
(cotracker3_online.py:192-207: grid_sample patches -> einsum
btnhwc,bnijc->btnhwij -> corr_mlp), but restructured for TPU around one
identity: after edge-replicate padding the feature map by 2r+2 and clamping
coordinates to [-(r+1), W-1+r+1], torch grid_sample's border-clamped taps
become *unclamped* bilinear taps on the padded map — and because tap
positions within a patch differ by integer offsets, every tap of a patch
shares the SAME fractional weights (wx, wy).  Consequences:

  * the per-point patch gather is one (2r+2)x(2r+2) window dynamic-slice
    (8x8 for r=3), never 49 separate taps;
  * the window-vs-support contraction is a single big matmul with
    M = T*(2r+2)^2 rows per (batch, track) — MXU-shaped, instead of the
    per-(t,n) fleet of 49-row matmuls a per-tap select-matrix formulation
    needs;
  * the bilinear combine in correlation space is 4 weighted slice-adds
    (pure VPU work), not per-point matmuls;
  * the (T, N, 49, C) patch tensor is never materialized.

Equivalence to border clamping (grid_sample padding_mode="border",
align_corners=True, model_utils.py:191-255): for a tap at unclipped position
p, torch reads bilinear(F, clip(p, 0, W-1)).  On the padded map, any p in
[-(r+1)-r, W-1+r+1+r] has both bilinear corners inside the padded extent;
corners that fall in the replicated margin read the border pixel, so the
interpolated value equals the border value exactly when both corners are in
the margin, and equals the interior interpolation otherwise — matching the
clipped read in every region.  Coordinates beyond the clamp range have every
tap saturated at the border, so clamping the coordinate first is exact.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp

F32 = jnp.float32


@functools.lru_cache(maxsize=None)
def _window_gather(win: int):
    """Window gather with a hand-written transpose.

    Forward: per (bt, n) dynamic-slice of a (win, win, C) window — XLA lowers
    vmapped dynamic_slice to contiguous-row reads (~5x faster than a row
    gather on this TPU). Its AUTODIFF transpose, however, is a vmapped
    dynamic_update_slice-add that XLA serializes into a while loop of one
    tiny 32 KB update per (t, n) — measured ~6.7 GB/s effective, the
    dominant cost of the whole training step (~60 ms/level-iter at the
    reference training shape). The custom backward scatters instead with ONE
    batched `.at[rows].add()` over flat row segments (row r of window (y, x)
    = flat pixels (y+r)*Wp + x .. +win), which XLA vectorizes — measured
    ~6x faster net of dispatch.

    starts are passed as f32 (floored ints) so custom_vjp treats them as
    differentiable operands with zero cotangent — their true gradient is
    zero/undefined (integer window origins).
    """

    @jax.custom_vjp
    def gather(fmaps_p, starts_f):
        # fmaps_p (BT, Hp, Wp, C); starts_f (BT, N, 2) f32 (x, y) ints
        def one(f_bt, st):
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    f_bt,
                    (s[1].astype(jnp.int32), s[0].astype(jnp.int32), 0),
                    (win, win, f_bt.shape[-1]),
                )
            )(st)

        return jax.vmap(one)(fmaps_p, starts_f)

    def fwd(fmaps_p, starts_f):
        # 0-sized token carries the primal's static shape/dtype through the
        # residuals (residual leaves must be JAX types, not raw dtypes)
        token = jnp.zeros((0,) + fmaps_p.shape, fmaps_p.dtype)
        return gather(fmaps_p, starts_f), (starts_f, token)

    def bwd(res, ct):
        starts_f, token = res
        BT, Hp, Wp, C = token.shape[1:]
        dtype = token.dtype
        xs = starts_f[..., 0].astype(jnp.int32)  # (BT, N)
        ys = starts_f[..., 1].astype(jnp.int32)
        dy = jnp.arange(win, dtype=jnp.int32)
        # flat pixel index of each window row start, then each column
        row = (ys[:, :, None] + dy[None, None, :]) * Wp + xs[:, :, None]
        idx = row[..., None] + dy[None, None, None, :]  # (BT, N, win, win)
        bt_ix = jnp.arange(BT)[:, None, None, None]
        flat = jnp.zeros((BT, Hp * Wp, C), F32)
        flat = flat.at[bt_ix, idx].add(ct.astype(F32))
        return (
            flat.reshape(BT, Hp, Wp, C).astype(dtype),
            jnp.zeros_like(starts_f),
        )

    gather.defvjp(fwd, bwd)
    return gather


@functools.lru_cache(maxsize=None)
def _window_gather_3d(win: int):
    """Per-point (2, win, win, C) window gather with a per-point FRAME index
    — the track-feature sampling pattern (each query reads its own query
    frame). Two consecutive frames are sliced so the caller can blend them
    trilinear-exactly (wt == 0 for the integer frames every real caller
    passes). Same custom backward as _window_gather: the autodiff transpose
    of a vmapped dynamic_slice is a serialized while-of-DUS; the batched
    flat-row scatter-add is ~6x faster.

    starts are (B, N, 3) f32 (t0, x, y) integer-valued; fmaps (B, T, Hp, Wp,
    C) with T >= 2 (callers fall back to the tap path for T == 1)."""

    @jax.custom_vjp
    def gather(fmaps_p, starts_f):
        def one(f_b, st):
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(
                    f_b,
                    (
                        s[0].astype(jnp.int32),
                        s[2].astype(jnp.int32),
                        s[1].astype(jnp.int32),
                        0,
                    ),
                    (2, win, win, f_b.shape[-1]),
                )
            )(st)

        return jax.vmap(one)(fmaps_p, starts_f)  # (B, N, 2, win, win, C)

    def fwd(fmaps_p, starts_f):
        token = jnp.zeros((0,) + fmaps_p.shape, fmaps_p.dtype)
        return gather(fmaps_p, starts_f), (starts_f, token)

    def bwd(res, ct):
        starts_f, token = res
        B, T, Hp, Wp, C = token.shape[1:]
        dtype = token.dtype
        ts = starts_f[..., 0].astype(jnp.int32)  # (B, N)
        xs = starts_f[..., 1].astype(jnp.int32)
        ys = starts_f[..., 2].astype(jnp.int32)
        dy = jnp.arange(win, dtype=jnp.int32)
        dt = jnp.arange(2, dtype=jnp.int32)
        # flat voxel index over (T, Hp, Wp)
        base = (ts[:, :, None] + dt[None, None, :]) * (Hp * Wp)  # (B, N, 2)
        row = base[..., None] + (ys[:, :, None, None] + dy[None, None, None, :]) * Wp
        idx = row[..., None] + (xs[:, :, None, None, None] + dy)  # (B,N,2,win,win)
        b_ix = jnp.arange(B)[:, None, None, None, None]
        flat = jnp.zeros((B, T * Hp * Wp, C), F32)
        flat = flat.at[b_ix, idx].add(ct.astype(F32))
        return (
            flat.reshape(B, T, Hp, Wp, C).astype(dtype),
            jnp.zeros_like(starts_f),
        )

    gather.defvjp(fwd, bwd)
    return gather


def window_starts_and_weights(coords, radius: int, height: int, width: int):
    """Window origins + shared bilinear weights for padded-map sampling.

    coords (..., 2) as (x, y) in UNPADDED pixel units of an (height, width)
    map. Returns (wsx, wsy) int32 window starts into the map padded by
    PAD = 2*radius + 2 on every side, and (wx, wy) f32 fractional weights
    shared by all taps of the patch.
    """
    pad = 2 * radius + 2
    x = jnp.clip(coords[..., 0].astype(F32), -(radius + 1.0), width - 1.0 + radius + 1.0)
    y = jnp.clip(coords[..., 1].astype(F32), -(radius + 1.0), height - 1.0 + radius + 1.0)
    px = x + pad
    py = y + pad
    ix = jnp.floor(px)
    iy = jnp.floor(py)
    wx = px - ix
    wy = py - iy
    wsx = ix.astype(jnp.int32) - radius
    wsy = iy.astype(jnp.int32) - radius
    return wsx, wsy, wx, wy


def pad_fmaps(fmaps, radius: int):
    """Edge-replicate pad the two spatial dims by PAD = 2*radius + 2."""
    pad = 2 * radius + 2
    return jnp.pad(
        fmaps, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge"
    )


def combine_corr(g, wx, wy, compute_dtype):
    """Bilinear combine in correlation space.

    g  (B, T, N, WIN(y), WIN(x), S) raw window-vs-support correlation;
    wx/wy (B, T, N) shared fractional weights.
    Returns (B, T, N, P(y), P(x), S) combined patch correlations with
    patch[j, i] the tap at offset (x + i - r, y + j - r).
    """
    P = g.shape[3] - 1
    wx = wx.astype(compute_dtype)[..., None, None, None]
    wy = wy.astype(compute_dtype)[..., None, None, None]
    a0 = g[:, :, :, :P, :P]
    a1 = g[:, :, :, :P, 1:]
    b0 = g[:, :, :, 1:, :P]
    b1 = g[:, :, :, 1:, 1:]
    return (
        (1 - wy) * (1 - wx) * a0
        + (1 - wy) * wx * a1
        + wy * (1 - wx) * b0
        + wy * wx * b1
    )


def corr_mlp_apply(corr, w1, b1, w2, b2, compute_dtype, track_major=False):
    """corr (B, T, N, P(y), P(x), S) -> (B, T, N, Do) via the 2-layer MLP
    (or (B, N, T, Do) with track_major — the layout swap rides the einsum).

    w1 is (P^4, Dh) with input index d = i_x*P*S + j_y*S + s (x-major patch
    axes, matching the reference corr_volume flatten) — contracted without
    materializing the flat 2401 axis.
    """
    P = corr.shape[3]
    S = corr.shape[5]
    lhs = "bntk" if track_major else "btnk"
    out_sub = "bnto" if track_major else "btno"
    w1r = w1.reshape(P, P, S, -1).astype(compute_dtype)  # (i, j, s, Dh)
    h = jnp.einsum(
        f"btnjis,ijsk->{lhs}", corr, w1r, preferred_element_type=F32
    ).astype(compute_dtype) + b1.astype(compute_dtype)
    h = jax.nn.gelu(h, approximate=False)
    out = jnp.einsum(
        f"{lhs},ko->{out_sub}", h, w2.astype(compute_dtype), preferred_element_type=F32
    ).astype(compute_dtype) + b2.astype(compute_dtype)
    return out


def fused_corr_embs(
    fmaps,
    support,
    coords,
    w1,
    b1,
    w2,
    b2,
    radius: int = 3,
    chunk: Optional[int] = None,
    compute_dtype=jnp.float32,
    track_major: bool = False,
):
    """fmaps (B, T, H, W, C); support (B, N, P*P, C) (flattened x-major);
    coords (B, T, N, 2) as (x, y) in this level's pixel units; MLP params
    w1 (P^4, Dh), b1 (Dh), w2 (Dh, Do), b2 (Do).

    Returns (B, T, N, Do) correlation embeddings — (B, N, T, Do) with
    track_major=True, letting callers that consume track-major tokens skip
    an O(T*N*Do) relayout.
    """
    B, T, H, W, C = fmaps.shape
    N = coords.shape[2]
    P = 2 * radius + 1
    WIN = P + 1

    fmaps_p = pad_fmaps(fmaps, radius).astype(compute_dtype)

    def compute(coords_c, support_c):
        # coords_c (B, T, n, 2); support_c (B, n, P*P, C)
        wsx, wsy, wx, wy = window_starts_and_weights(coords_c, radius, H, W)

        # windows (B, T, n, WIN(y), WIN(x), C) via per-point dynamic slices
        # (contiguous-row reads) with a hand-written vectorized scatter-add
        # transpose — see _window_gather
        n = coords_c.shape[2]
        starts_f = jnp.stack([wsx, wsy], axis=-1).astype(F32)
        win = _window_gather(WIN)(
            fmaps_p.reshape(B * T, *fmaps_p.shape[2:]),
            starts_f.reshape(B * T, n, 2),
        ).reshape(B, T, n, WIN, WIN, C)

        sup = support_c.astype(compute_dtype)  # (B, n, P*P, C)
        # raw window-vs-support correlation: (B, T, n, WIN(y), WIN(x), P*P(s));
        # batched over (b, n) this is one (T*WIN*WIN, C) x (C, P*P) matmul
        g = jnp.einsum(
            "btnuvc,bnsc->btnuvs", win, sup, preferred_element_type=F32
        ).astype(compute_dtype)
        corr = combine_corr(g, wx, wy, compute_dtype)
        return corr_mlp_apply(corr, w1, b1, w2, b2, compute_dtype, track_major=track_major)

    if chunk is None or chunk >= N:
        return compute(coords, support)

    K = -(-N // chunk)
    pad = K * chunk - N
    if pad:
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, pad), (0, 0)))
        support = jnp.pad(support, ((0, 0), (0, pad), (0, 0), (0, 0)))
    coords_r = coords.reshape(B, T, K, chunk, 2).transpose(2, 0, 1, 3, 4)
    support_r = support.reshape(B, K, chunk, P * P, C).transpose(1, 0, 2, 3, 4)
    out = jax.lax.map(lambda args: compute(*args), (coords_r, support_r))
    if track_major:
        # (K, B, chunk, T, Do) -> (B, N_padded, T, Do) -> trim
        out = out.transpose(1, 0, 2, 3, 4).reshape(B, K * chunk, T, -1)
        return out[:, :N]
    # (K, B, T, chunk, Do) -> (B, T, N_padded, Do) -> trim
    out = out.transpose(1, 2, 0, 3, 4).reshape(B, T, K * chunk, -1)
    return out[:, :, :N]
