"""Sinusoidal positional embeddings.

Reproduces the reference embedding family (cotracker/models/core/embeddings.py
and the `posenc` helper in cotracker3_online.py:19-39) with jax.numpy.
"""

import numpy as np
import jax.numpy as jnp


def get_1d_sincos_pos_embed(embed_dim: int, pos) -> jnp.ndarray:
    """1D sincos embedding of positions.

    pos: any array of positions, flattened to (M,). Returns (1, M, embed_dim).
    Mirrors reference `get_1d_sincos_pos_embed_from_grid` (embeddings.py:59-84),
    including the float64 omega computation.
    """
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = np.asarray(pos, dtype=np.float64).reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    emb = np.concatenate([np.sin(out), np.cos(out)], axis=1)
    # pure-numpy result: safe to build inside jit traces as a constant
    return emb[None].astype(np.float32)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size) -> jnp.ndarray:
    """2D sincos embedding over a (gh, gw) grid. Returns (1, D, gh, gw)-style
    layout transposed to channel-last: (1, gh, gw, D).

    Mirrors reference `get_2d_sincos_pos_embed` (embeddings.py:11-33).
    """
    if isinstance(grid_size, tuple):
        gh, gw = grid_size
    else:
        gh = gw = grid_size
    grid_h = np.arange(gh, dtype=np.float32)
    grid_w = np.arange(gw, dtype=np.float32)
    # 'xy' indexing: first output varies along w in axis 0? torch meshgrid(w, h, "xy")
    # returns arrays of shape (gh, gw) with grid[0][i,j] = grid_w[j], grid[1][i,j] = grid_h[i].
    ww, hh = np.meshgrid(grid_w, grid_h)  # both (gh, gw)
    emb_h = np.asarray(get_1d_sincos_pos_embed(embed_dim // 2, ww))  # (1, gh*gw, D/2)
    emb_w = np.asarray(get_1d_sincos_pos_embed(embed_dim // 2, hh))
    emb = np.concatenate([emb_h, emb_w], axis=2)  # (1, gh*gw, D)
    return emb.reshape(1, gh, gw, embed_dim).astype(np.float32)


def get_2d_embedding(xy, C: int, cat_coords: bool = True) -> jnp.ndarray:
    """2D sin/cos embedding of coordinates (B, N, 2) -> (B, N, 2C [+2]).

    Mirrors reference `get_2d_embedding` (embeddings.py:87-120), including the
    interleaved sin/cos layout and the (1000/C) frequency scaling.
    """
    B, N, D = xy.shape
    assert D == 2
    x = xy[:, :, 0:1]
    y = xy[:, :, 1:2]
    div_term = (jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C)).reshape(1, 1, C // 2)

    pe_x = jnp.zeros((B, N, C), dtype=jnp.float32)
    pe_y = jnp.zeros((B, N, C), dtype=jnp.float32)
    pe_x = pe_x.at[:, :, 0::2].set(jnp.sin(x * div_term))
    pe_x = pe_x.at[:, :, 1::2].set(jnp.cos(x * div_term))
    pe_y = pe_y.at[:, :, 0::2].set(jnp.sin(y * div_term))
    pe_y = pe_y.at[:, :, 1::2].set(jnp.cos(y * div_term))
    pe = jnp.concatenate([pe_x, pe_y], axis=2)
    if cat_coords:
        pe = jnp.concatenate([xy, pe], axis=2)
    return pe


def posenc(x, min_deg: int, max_deg: int) -> jnp.ndarray:
    """NeRF-style positional encoding of x in [-pi, pi].

    Concatenates x with sin of x*2^deg and the pi/2-shifted copy (= cos),
    matching reference `posenc` (cotracker3_online.py:19-39): output dim is
    d + 2*d*(max_deg-min_deg).
    """
    if min_deg == max_deg:
        return x
    scales = jnp.asarray([2**i for i in range(min_deg, max_deg)], dtype=x.dtype)
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    four_feat = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    return jnp.concatenate([x, four_feat], axis=-1)
