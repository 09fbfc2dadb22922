"""Masked reductions (mirrors reference model_utils.py:142-188, losses.py:96-118)."""

import jax
import jax.numpy as jnp

EPS = 1e-6


def reduce_masked_mean(x, mask, axis=None, keepdims=False, axis_name=None):
    """Mean of `x` over elements where `mask` is nonzero: sum(x*m)/(eps+sum(m)).

    axis_name: optional mesh axis name(s). Inside shard_map, psum the
    numerator and denominator over those axes so the mean is over the GLOBAL
    (unsharded) elements — used by the track-sharded train step."""
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    prod = x * mask
    numer = jnp.sum(prod, axis=axis, keepdims=keepdims)
    denom = jnp.sum(mask, axis=axis, keepdims=keepdims)
    if axis_name is not None:
        numer, denom = jax.lax.psum((numer, denom), axis_name)
    return numer / (EPS + denom)


def masked_mean(data, mask, axis):
    """Masked mean with denominator clamped to >= 1 (reference losses.py:96-104)."""
    if mask is None:
        return jnp.mean(data, axis=axis, keepdims=True)
    mask = mask.astype(data.dtype)
    mask_sum = jnp.sum(mask, axis=axis, keepdims=True)
    return jnp.sum(data * mask, axis=axis, keepdims=True) / jnp.clip(mask_sum, 1.0, None)


def masked_mean_var(data, mask, axis):
    """Masked mean and variance (reference losses.py:107-118)."""
    if mask is None:
        return (jnp.mean(data, axis=axis, keepdims=True), jnp.var(data, axis=axis, keepdims=True))
    mask = mask.astype(data.dtype)
    mask_sum = jnp.sum(mask, axis=axis, keepdims=True)
    m = jnp.sum(data * mask, axis=axis, keepdims=True) / jnp.clip(mask_sum, 1.0, None)
    v = jnp.sum(mask * (data - m) ** 2, axis=axis, keepdims=True) / jnp.clip(mask_sum, 1.0, None)
    return jnp.squeeze(m, axis), jnp.squeeze(v, axis)
