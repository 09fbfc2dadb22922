"""Bilinear / trilinear sampling primitives (channel-last, gather-based).

These reproduce the coordinate conventions of the reference tracker's
`bilinear_sampler` (reference: cotracker/models/core/model_utils.py:191-255),
which wraps `torch.grid_sample`:

  * coordinates are given in *pixel* units, (x, y) order (or (t, x, y) for
    spatio-temporal sampling);
  * `align_corners=True`: coordinate 0 is the center of the first pixel and
    `size-1` the center of the last one (an identity mapping on pixel
    coordinates). A degenerate axis of size 1 maps every coordinate to 0.
  * `align_corners=False`: coordinate 0 is the left *edge* of the first
    pixel, i.e. sampling happens at `coord - 0.5` in pixel-center units.
  * `padding_mode='border'` clamps each sample coordinate into the valid
    range *before* computing interpolation weights (matching torch's
    `clip_coordinates`); `'zeros'` lets out-of-range corner taps contribute
    zero.

Everything here is channel-last: images are (H, W, C), videos (T, H, W, C).
On TPU, gathers are expressed as a single `jnp.take` over the flattened
spatial axis so XLA lowers them to one dynamic-gather per corner tap.
"""

import functools

import jax
import jax.numpy as jnp


def _axis_scale(size: int) -> float:
    # align_corners=True net scaling: x * (size-1)/max(size-1, 1).
    # Identity for size > 1; collapses to 0 for degenerate size-1 axes
    # (matches torch grid_sample normalize/unnormalize round trip).
    return (size - 1) / max(size - 1, 1)


def bilinear_sample(img, coords, align_corners: bool = True, padding_mode: str = "border"):
    """Sample `img` (H, W, C) at `coords` (..., 2) given as (x, y) pixels.

    Returns an array of shape coords.shape[:-1] + (C,).
    """
    H, W, C = img.shape
    x = coords[..., 0]
    y = coords[..., 1]

    if align_corners:
        x = x * _axis_scale(W)
        y = y * _axis_scale(H)
    else:
        x = x - 0.5
        y = y - 0.5

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f)[..., None]
    wy = (y - y0f)[..., None]

    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    x0c = jnp.clip(x0, 0, W - 1)
    x1c = jnp.clip(x1, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    y1c = jnp.clip(y1, 0, H - 1)

    flat = img.reshape(H * W, C)

    def g(yy, xx):
        return jnp.take(flat, yy * W + xx, axis=0)

    v00 = g(y0c, x0c)
    v01 = g(y0c, x1c)
    v10 = g(y1c, x0c)
    v11 = g(y1c, x1c)

    if padding_mode == "zeros":
        def inb(yy, xx):
            return ((yy >= 0) & (yy < H) & (xx >= 0) & (xx < W))[..., None]

        v00 = jnp.where(inb(y0, x0), v00, 0.0)
        v01 = jnp.where(inb(y0, x1), v01, 0.0)
        v10 = jnp.where(inb(y1, x0), v10, 0.0)
        v11 = jnp.where(inb(y1, x1), v11, 0.0)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def bilinear_sample_3d(vid, coords, align_corners: bool = True, padding_mode: str = "border"):
    """Trilinear-sample `vid` (T, H, W, C) at `coords` (..., 3) given as (t, x, y).

    Matches the reference 5D `bilinear_sampler` path (the (t, x, y) component
    order, reference model_utils.py:238-240). Returns coords.shape[:-1] + (C,).
    """
    T, H, W, C = vid.shape
    t = coords[..., 0]
    x = coords[..., 1]
    y = coords[..., 2]

    if align_corners:
        t = t * _axis_scale(T)
        x = x * _axis_scale(W)
        y = y * _axis_scale(H)
    else:
        t = t - 0.5
        x = x - 0.5
        y = y - 0.5

    if padding_mode == "border":
        t = jnp.clip(t, 0.0, T - 1)
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    t0f, x0f, y0f = jnp.floor(t), jnp.floor(x), jnp.floor(y)
    wt = (t - t0f)[..., None]
    wx = (x - x0f)[..., None]
    wy = (y - y0f)[..., None]

    t0 = t0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    t1, x1, y1 = t0 + 1, x0 + 1, y0 + 1

    t0c, t1c = jnp.clip(t0, 0, T - 1), jnp.clip(t1, 0, T - 1)
    x0c, x1c = jnp.clip(x0, 0, W - 1), jnp.clip(x1, 0, W - 1)
    y0c, y1c = jnp.clip(y0, 0, H - 1), jnp.clip(y1, 0, H - 1)

    flat = vid.reshape(T * H * W, C)

    def g(tt, yy, xx):
        return jnp.take(flat, (tt * H + yy) * W + xx, axis=0)

    if padding_mode == "zeros":
        def inb(tt, yy, xx):
            return ((tt >= 0) & (tt < T) & (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W))[..., None]

        def tap(tt, ttc, yy, yyc, xx, xxc):
            return jnp.where(inb(tt, yy, xx), g(ttc, yyc, xxc), 0.0)
    else:
        def tap(tt, ttc, yy, yyc, xx, xxc):
            return g(ttc, yyc, xxc)

    def plane(tt, ttc):
        v00 = tap(tt, ttc, y0, y0c, x0, x0c)
        v01 = tap(tt, ttc, y0, y0c, x1, x1c)
        v10 = tap(tt, ttc, y1, y1c, x0, x0c)
        v11 = tap(tt, ttc, y1, y1c, x1, x1c)
        top = v00 * (1.0 - wx) + v01 * wx
        bot = v10 * (1.0 - wx) + v11 * wx
        return top * (1.0 - wy) + bot * wy

    p0 = plane(t0, t0c)
    p1 = plane(t1, t1c)
    return p0 * (1.0 - wt) + p1 * wt


def sample_features_2d(fmaps, coords, align_corners: bool = True, padding_mode: str = "border"):
    """Batch-sample spatial features: fmaps (B, H, W, C), coords (B, N, 2) -> (B, N, C).

    Mirrors reference `sample_features4d` (model_utils.py:258-290).
    """
    fn = functools.partial(bilinear_sample, align_corners=align_corners, padding_mode=padding_mode)
    return jax.vmap(fn)(fmaps, coords)


def sample_features_3d(fmaps, coords, align_corners: bool = True, padding_mode: str = "border"):
    """Batch-sample spatio-temporal features.

    fmaps (B, T, H, W, C), coords (B, R1, R2, 3) as (t, x, y) -> (B, R1, R2, C).
    Mirrors reference `sample_features5d` (model_utils.py:293-323).
    """
    fn = functools.partial(bilinear_sample_3d, align_corners=align_corners, padding_mode=padding_mode)
    return jax.vmap(fn)(fmaps, coords)


# ---------------------------------------------------------------------------
# Resize as (small, constant) interpolation matrices.
#
# Separable resizes become two MXU matmuls instead of gathers, and the
# matrices are compile-time constants — the TPU-friendly way to express the
# reference's F.interpolate calls (encoder upsample, video resize, time-embed
# interpolation).
# ---------------------------------------------------------------------------


def interp_matrix_1d(src: int, dst: int, align_corners: bool) -> jnp.ndarray:
    """(dst, src) linear-interpolation matrix matching torch F.interpolate.

    align_corners=True:  positions = i * (src-1)/(dst-1)
    align_corners=False: positions = (i + 0.5) * src/dst - 0.5, clamped
    """
    if src == dst:
        return jnp.eye(src, dtype=jnp.float32)
    i = jnp.arange(dst, dtype=jnp.float32)
    if align_corners:
        pos = i * (src - 1) / max(dst - 1, 1)
    else:
        pos = (i + 0.5) * (src / dst) - 0.5
    pos = jnp.clip(pos, 0.0, src - 1)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, src - 1)
    w = pos - lo.astype(jnp.float32)
    m = jnp.zeros((dst, src), dtype=jnp.float32)
    m = m.at[jnp.arange(dst), lo].add(1.0 - w)
    m = m.at[jnp.arange(dst), hi].add(w)
    return m


def resize_bilinear(x, out_hw, align_corners: bool = True):
    """Resize (..., H, W, C) to (..., H', W', C) with separable matmuls."""
    H, W = x.shape[-3], x.shape[-2]
    Ho, Wo = out_hw
    mh = interp_matrix_1d(H, Ho, align_corners).astype(x.dtype)
    mw = interp_matrix_1d(W, Wo, align_corners).astype(x.dtype)
    prec = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,...hwc->...owc", mh, x, precision=prec)
    x = jnp.einsum("pw,...owc->...opc", mw, x, precision=prec)
    return x


def resize_linear_1d(x, out_len: int, align_corners: bool = False, axis: int = -2):
    """Linear resize along one axis (used for time-embedding interpolation)."""
    src = x.shape[axis]
    m = interp_matrix_1d(src, out_len, align_corners).astype(x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    x = jnp.einsum("os,...s->...o", m, x, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(x, -1, axis)
