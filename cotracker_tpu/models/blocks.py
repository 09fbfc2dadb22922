"""Neural network building blocks (flax.linen, channel-last / NHWC).

Functionally equivalent to the reference block set
(cotracker/models/core/cotracker/blocks.py) but written TPU-first:

  * NHWC conv layouts (XLA's preferred TPU layout);
  * paramless instance/layer norms as fused functions;
  * attention shaped so (heads*dim_head)=384 stays MXU-aligned;
  * f32 softmax/normalization statistics regardless of compute dtype.

Submodule names intentionally mirror the reference state_dict structure so
the checkpoint importer (models/checkpoint.py) is a direct name mapping.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def instance_norm(x, eps: float = 1e-5):
    """InstanceNorm2d, affine-free: normalize each (sample, channel) over H, W.

    x: (..., H, W, C). Statistics in f32 (matches torch InstanceNorm2d defaults:
    affine=False, track_running_stats=False, eps=1e-5).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(-3, -2), keepdims=True)
    var = jnp.var(x32, axis=(-3, -2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def layer_norm(x, eps: float = 1e-6):
    """Affine-free LayerNorm over the last axis (torch elementwise_affine=False)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Mlp(nn.Module):
    """Two-layer MLP (reference blocks.py:40-76)."""

    hidden_features: int
    out_features: int
    approximate_gelu: bool = False
    dtype: Any = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=self.approximate_gelu)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x


class ResidualBlock(nn.Module):
    """RAFT-style residual block with instance norm (reference blocks.py:79-138)."""

    planes: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, dtype=self.dtype, name="downsample")(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT-style feature pyramid encoder, output stride `stride`, 128 channels.

    Mirrors reference BasicEncoder (blocks.py:141-219): 7x7/s2 stem, four
    residual stages, all four scales bilinearly upsampled (align_corners) to
    H/stride x W/stride, concatenated, then 3x3 and 1x1 convs.

    Input (B, H, W, 3) -> output (B, H/stride, W/stride, output_dim).
    """

    output_dim: int = 128
    stride: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from cotracker_tpu.ops.bilinear import resize_bilinear

        H, W = x.shape[-3], x.shape[-2]
        out_hw = (H // self.stride, W // self.stride)

        x = nn.Conv(self.output_dim // 2, (7, 7), strides=2, padding=3, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(instance_norm(x))

        def stage(name, planes, stride, h):
            h = ResidualBlock(planes, stride=stride, dtype=self.dtype, name=f"{name}_0")(h)
            h = ResidualBlock(planes, stride=1, dtype=self.dtype, name=f"{name}_1")(h)
            return h

        a = stage("layer1", self.output_dim // 2, 1, x)
        b = stage("layer2", self.output_dim // 4 * 3, 2, a)
        c = stage("layer3", self.output_dim, 2, b)
        d = stage("layer4", self.output_dim, 2, c)

        a = resize_bilinear(a, out_hw, align_corners=True)
        b = resize_bilinear(b, out_hw, align_corners=True)
        c = resize_bilinear(c, out_hw, align_corners=True)
        d = resize_bilinear(d, out_hw, align_corners=True)

        x = jnp.concatenate([a, b, c, d], axis=-1)
        x = nn.Conv(self.output_dim * 2, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(instance_norm(x))
        x = nn.Conv(self.output_dim, (1, 1), dtype=self.dtype, name="conv3")(x)
        return x


class Attention(nn.Module):
    """Multi-head softmax attention (reference blocks.py:365-398).

    Heads * dim_head == model dim (8 * 48 = 384). Softmax in f32.
    """

    num_heads: int = 8
    dim_head: int = 48
    qkv_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context=None, attn_bias=None):
        h = self.num_heads
        inner = h * self.dim_head
        context = x if context is None else context

        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=self.qkv_bias, dtype=self.dtype, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        B, N1, _ = q.shape
        N2 = k.shape[1]
        q = q.reshape(B, N1, h, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(B, N2, h, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(B, N2, h, self.dim_head).transpose(0, 2, 1, 3)

        scale = self.dim_head**-0.5
        sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
        if attn_bias is not None:
            sim = sim + attn_bias
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N1, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


def _key_mask_bias(mask, n_queries: int, num_heads: int, dtype):
    """Additive attention bias masking out invalid *keys*.

    mask: (B, N_keys) bool, True = valid. Returns (B, heads, n_queries, N_keys).
    Matches the reference's `(~mask) * -finfo.max` convention
    (blocks.py:434-435, cotracker.py:571-572).
    """
    neg = -jnp.finfo(jnp.float32).max
    bias = jnp.where(mask[:, None, None, :], 0.0, neg).astype(jnp.float32)
    return jnp.broadcast_to(bias, (mask.shape[0], num_heads, n_queries, mask.shape[1]))


class AttnBlock(nn.Module):
    """Pre-norm self-attention + MLP block (reference blocks.py:401-438)."""

    hidden_size: int = 384
    num_heads: int = 8
    dim_head: int = 48
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        attn_bias = None
        if mask is not None:
            # pairwise mask: query i attends key j iff mask_i & mask_j
            pm = mask[:, None, :] & mask[:, :, None]  # (B, N, N)
            neg = -jnp.finfo(jnp.float32).max
            attn_bias = jnp.where(pm, 0.0, neg)[:, None].astype(jnp.float32)
        x = x + Attention(self.num_heads, self.dim_head, qkv_bias=True, dtype=self.dtype, name="attn")(
            layer_norm(x), attn_bias=attn_bias
        )
        x = x + Mlp(int(self.hidden_size * self.mlp_ratio), self.hidden_size, approximate_gelu=True, dtype=self.dtype, name="mlp")(
            layer_norm(x)
        )
        return x


class CrossAttnBlock(nn.Module):
    """Pre-norm cross-attention + MLP block (reference cotracker.py:534-577).

    `key_mask` (B, N_keys) masks context keys — this is the masking that keeps
    padded / not-yet-active tracks from contaminating the virtual tokens.
    """

    hidden_size: int = 384
    num_heads: int = 8
    dim_head: int = 48
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context, key_mask: Optional[jnp.ndarray] = None):
        attn_bias = None
        if key_mask is not None:
            attn_bias = _key_mask_bias(key_mask, x.shape[1], self.num_heads, x.dtype)
        ctx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_context")(context)
        x = x + Attention(self.num_heads, self.dim_head, qkv_bias=True, dtype=self.dtype, name="cross_attn")(
            layer_norm(x), context=ctx, attn_bias=attn_bias
        )
        x = x + Mlp(int(self.hidden_size * self.mlp_ratio), self.hidden_size, approximate_gelu=True, dtype=self.dtype, name="mlp")(
            layer_norm(x)
        )
        return x
