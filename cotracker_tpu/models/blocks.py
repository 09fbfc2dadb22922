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

import os
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
    """Affine-free LayerNorm over the last axis (torch elementwise_affine=False).

    Fast variance (E[x^2] - E[x]^2, one pass over the input instead of two)
    — with f32 statistics the cancellation error is ~1e-6 relative, well
    under the golden-test tolerances, and the big (B, N, T, C) pre-norm
    reads are HBM-bound."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class Dense(nn.Module):
    """nn.Dense twin with a declared input width.

    Identical param tree ("kernel"/"bias", same initializers) and identical
    compute to nn.Dense, but the params are declared in setup so the fused
    int8 kernels (ops/kernels/mlp_int8_pallas.py) can read `.kernel`/`.bias`
    directly instead of re-deriving them through a module call.
    """

    features: int
    in_features: int
    use_bias: bool = True
    dtype: Any = None

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        self.bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )

    def __call__(self, x):
        from flax.linen.dtypes import promote_dtype

        x, kernel, bias = promote_dtype(x, self.kernel, self.bias, dtype=self.dtype)
        y = jax.lax.dot_general(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
        if bias is not None:
            y = y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))
        return y


class AffineLayerNorm(nn.Module):
    """nn.LayerNorm twin (f32 statistics, learnable scale/bias) whose params
    are readable for kernel fusion. Same param names as nn.LayerNorm."""

    dim: int
    epsilon: float = 1e-5
    dtype: Any = None

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones_init(), (self.dim,))
        self.bias = self.param("bias", nn.initializers.zeros_init(), (self.dim,))

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        # fast variance, one pass (nn.LayerNorm's use_fast_variance default)
        var = jnp.maximum(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) - mean * mean, 0.0
        )
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * self.scale.astype(jnp.float32) + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


class Mlp(nn.Module):
    """Two-layer MLP (reference blocks.py:40-76)."""

    in_features: int
    hidden_features: int
    out_features: int
    approximate_gelu: bool = False
    dtype: Any = None  # compute dtype (params stay f32)

    def setup(self):
        self.fc1 = Dense(self.hidden_features, self.in_features, dtype=self.dtype)
        self.fc2 = Dense(self.out_features, self.hidden_features, dtype=self.dtype)

    def __call__(self, x):
        x = self.fc1(x)
        x = nn.gelu(x, approximate=self.approximate_gelu)
        return self.fc2(x)


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

    Besides the standard (B, S, C) form, exposes layout-native variants for
    the factorized space attention so the (B, N, T, C) point-token tensor —
    the 400+ MB operand at quasi-dense N — never goes through an explicit
    N<->T transpose: the layout swap rides the projection einsums instead,
    where XLA fuses it into the matmul.
    """

    num_heads: int = 8
    dim_head: int = 48
    qkv_bias: bool = False
    out_dim: int = 384
    dtype: Any = None
    use_pallas: bool = False  # fused VMEM attention core (inference hot path)
    dim: int = 384  # token width of queries/context (declared for kernel fusion)

    def setup(self):
        inner = self.num_heads * self.dim_head
        self.to_q = Dense(inner, self.dim, use_bias=self.qkv_bias, dtype=self.dtype)
        self.to_kv = Dense(inner * 2, self.dim, use_bias=self.qkv_bias, dtype=self.dtype)
        self.to_out = Dense(self.out_dim, inner, dtype=self.dtype)

    def __call__(self, x, context=None, attn_bias=None):
        h, d = self.num_heads, self.dim_head
        if (
            self.use_pallas
            and context is None
            and attn_bias is None
            and x.shape[0] % 8 == 0
        ):
            from cotracker_tpu.ops.kernels.attention_pallas import fused_time_attention

            q = self.to_q(x)
            kv = self.to_kv(x)  # K|V unsplit — the kernel slices lanes itself
            return self.to_out(fused_time_attention(q, kv, h, d))
        context = x if context is None else context

        q = self.to_q(x)
        k, v = jnp.split(self.to_kv(context), 2, axis=-1)

        B, N1, _ = q.shape
        N2 = k.shape[1]
        q = q.reshape(B, N1, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, N2, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, N2, h, d).transpose(0, 2, 1, 3)

        sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * (d**-0.5)
        if attn_bias is not None:
            sim = sim + attn_bias
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N1, h * d)
        return self.to_out(out)

    def virtual_from_points(self, virtual, points, key_mask=None, axis_name=None):
        """Queries: virtual (B, T, V, C) frame-major (small). Keys/values:
        points (B, N, T, C) track-native. Returns (B, T, V, C_out).

        axis_name: mesh axis over which N (the keys) is sharded. Inside
        shard_map this runs the two-pass partial softmax — local max, global
        pmax, exp-weighted local numerator/denominator, psum — which is the
        ONLY cross-shard collective of the whole track-sharded model
        (SURVEY.md §2.7-2: O(T*V*C) bytes per space round). Masked keys use
        the reference's additive -finfo.max bias (cotracker.py:571-572), so
        an all-masked shard stays finite and contributes exp(-huge) ~ 0."""
        h, d = self.num_heads, self.dim_head
        B, T, V, _ = virtual.shape
        N = points.shape[1]
        if axis_name is not None:
            q = self.to_q(virtual).reshape(B, T, V, h, d)
            k, v = jnp.split(self.to_kv(points), 2, axis=-1)
            k = k.reshape(B, N, T, h, d)
            v = v.reshape(B, N, T, h, d)
            sim = jnp.einsum(
                "btvhd,bnthd->bthvn", q, k, preferred_element_type=jnp.float32
            ) * (d**-0.5)
            if key_mask is not None:  # (B, N_local) True = valid key
                neg = -jnp.finfo(jnp.float32).max
                sim = sim + jnp.where(key_mask, 0.0, neg)[:, None, None, None, :]
            # global row max, stop_gradient'ed: the max subtraction is a pure
            # numerical stabilizer (softmax is shift-invariant, and so is its
            # gradient), and pmax has no differentiation rule
            # (stop_gradient BEFORE the collective: pmax has no JVP rule, and
            # the tangent must be severed on its way in, not just out)
            m = jax.lax.pmax(
                jax.lax.stop_gradient(jnp.max(sim, axis=-1)), axis_name
            )  # (B, T, h, V)
            p = jnp.exp(sim - m[..., None])  # in [0, 1]
            num = jnp.einsum("bthvn,bnthd->bthvd", p.astype(v.dtype), v)
            den = jnp.sum(p, axis=-1)  # (B, T, h, V)
            num, den = jax.lax.psum((num, den), axis_name)
            out = num / den[..., None].astype(num.dtype)
            out = out.transpose(0, 1, 3, 2, 4).reshape(B, T, V, h * d)
            return self.to_out(out)
        if self.use_pallas and _space_tile_ok(N):
            from cotracker_tpu.ops.kernels.attention_pallas import (
                fused_virtual_from_points,
            )

            q = self.to_q(virtual)  # (B, T, V, C)
            kv = self.to_kv(points)  # (B, N, T, 2C)
            bias = (
                jnp.zeros((B, N), jnp.float32)
                if key_mask is None
                else jnp.where(key_mask, 0.0, -0.7 * jnp.finfo(jnp.float32).max)
            )
            out = jax.vmap(
                lambda qq, kk, bb: fused_virtual_from_points(
                    qq, kk, h, d, key_bias=bb
                )
            )(q, kv, bias)
            return self.to_out(out)
        q = self.to_q(virtual).reshape(B, T, V, h, d)
        k, v = jnp.split(self.to_kv(points), 2, axis=-1)  # (B, N, T, inner)
        k = k.reshape(B, N, T, h, d)
        v = v.reshape(B, N, T, h, d)
        sim = jnp.einsum(
            "btvhd,bnthd->bthvn", q, k, preferred_element_type=jnp.float32
        ) * (d**-0.5)
        if key_mask is not None:  # (B, N) True = valid key
            neg = -jnp.finfo(jnp.float32).max
            sim = sim + jnp.where(key_mask, 0.0, neg)[:, None, None, None, :]
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bthvn,bnthd->btvhd", attn, v).reshape(B, T, V, h * d)
        return self.to_out(out)

    def points_from_virtual(self, points, virtual, query_mask=None):
        """Queries: points (B, N, T, C) track-native. Keys/values: virtual
        (B, T, V, C) frame-major (small). Returns (B, N, T, C_out).

        query_mask (B, N): the reference v2 convention (cotracker.py:561-565)
        — a masked *query* has every key biased by -finfo.max, so its output
        degrades to the uniform average of the values."""
        h, d = self.num_heads, self.dim_head
        B, N, T, _ = points.shape
        V = virtual.shape[2]
        if self.use_pallas and query_mask is None and _space_tile_ok(N):
            from cotracker_tpu.ops.kernels.attention_pallas import (
                fused_points_from_virtual,
            )

            q = self.to_q(points)  # (B, N, T, C)
            kv = self.to_kv(virtual)  # (B, T, V, 2C)
            out = jax.vmap(
                lambda qq, kk: fused_points_from_virtual(qq, kk, h, d)
            )(q, kv)
            return self.to_out(out)
        q = self.to_q(points).reshape(B, N, T, h, d)
        k, v = jnp.split(self.to_kv(virtual), 2, axis=-1)
        k = k.reshape(B, T, V, h, d)
        v = v.reshape(B, T, V, h, d)
        sim = jnp.einsum(
            "bnthd,btvhd->bnthv", q, k, preferred_element_type=jnp.float32
        ) * (d**-0.5)
        if query_mask is not None:  # (B, N) True = active query
            neg = -jnp.finfo(jnp.float32).max
            sim = sim + jnp.where(query_mask, 0.0, neg)[:, :, None, None, None]
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnthv,btvhd->bnthd", attn, v).reshape(B, N, T, h * d)
        return self.to_out(out)


def _space_tile_ok(n: int) -> bool:
    from cotracker_tpu.ops.kernels.attention_pallas import pick_block_n

    return pick_block_n(n) is not None


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
    """Pre-norm self-attention + MLP block (reference blocks.py:401-438).

    With `quant_int8` (inference flag), the whole block body runs as three
    fused Pallas passes — [LN+qkv W8A8] -> [attention core] -> [out-proj +
    residual + LN + W8A8 MLP + residual] (ops/kernels/mlp_int8_pallas.py) —
    instead of ~10 XLA ops; falls back to the XLA path whenever shapes
    don't tile or a mask is present.
    """

    hidden_size: int = 384
    num_heads: int = 8
    dim_head: int = 48
    mlp_ratio: float = 4.0
    dtype: Any = None
    use_pallas_attn: bool = False
    quant_int8: bool = False

    def setup(self):
        self.attn = Attention(
            self.num_heads, self.dim_head, qkv_bias=True,
            out_dim=self.hidden_size, dtype=self.dtype,
            use_pallas=self.use_pallas_attn, dim=self.hidden_size,
        )
        self.mlp = Mlp(
            self.hidden_size, int(self.hidden_size * self.mlp_ratio),
            self.hidden_size, approximate_gelu=True, dtype=self.dtype,
        )

    def _quant_forward(self, x, x_4d: bool = False):
        from cotracker_tpu.ops.kernels.attention_pallas import fused_time_attention
        from cotracker_tpu.ops.kernels.mlp_int8_pallas import (
            fused_attnout_res_mlp_int8,
            fused_ln_qkv_int8,
            fused_time_block_int8,
        )

        at = self.attn
        # whole-block kernel: q/kv/attention-out never leave VMEM. With
        # x_4d the tokens stay in the space kernels' (M, T, C//128, 128)
        # layout end to end — no relayout at the space/time boundaries.
        y = fused_time_block_int8(
            x, at.to_q.kernel, at.to_q.bias, at.to_kv.kernel, at.to_kv.bias,
            at.to_out.kernel, at.to_out.bias,
            self.mlp.fc1.kernel, self.mlp.fc1.bias,
            self.mlp.fc2.kernel, self.mlp.fc2.bias,
            self.num_heads, self.dim_head, x_4d=x_4d,
        )
        if y is not None:
            return y
        if x_4d:
            M, T, L, _ = x.shape
            x = x.reshape(M, T, L * 128)
        # three-kernel split (q/kv and attention-out round-trip HBM)
        qkv = fused_ln_qkv_int8(x, at.to_q.kernel, at.to_q.bias,
                                at.to_kv.kernel, at.to_kv.bias)
        if qkv is None:
            return None
        a = fused_time_attention(qkv[0], qkv[1], self.num_heads, self.dim_head)
        y = fused_attnout_res_mlp_int8(
            a, x, at.to_out.kernel, at.to_out.bias,
            self.mlp.fc1.kernel, self.mlp.fc1.bias,
            self.mlp.fc2.kernel, self.mlp.fc2.bias,
        )
        if y is not None and x_4d:
            M, T, C = y.shape
            y = y.reshape(M, T, C // 128, 128)
        return y

    def __call__(self, x, mask: Optional[jnp.ndarray] = None, quant_ok: bool = True,
                 x_4d: bool = False):
        # quant_ok: static caller-side gate — the updateformer disables the
        # fused block when the DOWNSTREAM space round cannot tile N: a fused
        # time block feeding the XLA space einsums forces layout copies of
        # the token tensor (~+70 ms/iter measured), so engage all-or-nothing.
        # x_4d: tokens arrive/return in the space kernels' (M, T, C//128,
        # 128) lane-split layout (quant path only; callers guarantee the
        # quant gate holds when setting it).
        if (
            self.quant_int8
            and quant_ok
            and not os.environ.get("COTRACKER_NO_TIME_QUANT")  # A/B debug knob
            and mask is None
            and x.ndim == (4 if x_4d else 3)
            and x.shape[0] % 8 == 0
            and self.hidden_size == self.num_heads * self.dim_head
        ):
            y = self._quant_forward(x, x_4d=x_4d)
            if y is not None:
                return y
        if x_4d:
            # quant path declined (shape/tiling): continue on the flat XLA
            # body and hand back 4D so the caller's layout contract holds
            M, T, L, _ = x.shape
            y = self.__call__(x.reshape(M, T, L * 128), mask=mask, quant_ok=False)
            return y.reshape(M, T, L, 128)
        attn_bias = None
        if mask is not None:
            # pairwise mask: query i attends key j iff mask_i & mask_j
            pm = mask[:, None, :] & mask[:, :, None]  # (B, N, N)
            neg = -jnp.finfo(jnp.float32).max
            attn_bias = jnp.where(pm, 0.0, neg)[:, None].astype(jnp.float32)
        x = x + self.attn(layer_norm(x), attn_bias=attn_bias)
        x = x + self.mlp(layer_norm(x))
        return x


class CrossAttnBlock(nn.Module):
    """Pre-norm cross-attention + MLP block (reference cotracker.py:534-577).

    `key_mask` (B, N_keys) masks context keys — this is the masking that keeps
    padded / not-yet-active tracks from contaminating the virtual tokens.

    Besides the standard 3D call, exposes the two layout-native forms of the
    factorized space attention (virtual<-points, points<-virtual) that keep
    the big (B, N, T, C) point tensor out of explicit transposes.
    """

    hidden_size: int = 384
    num_heads: int = 8
    dim_head: int = 48
    mlp_ratio: float = 4.0
    dtype: Any = None
    use_pallas_attn: bool = False  # fused space-attention cores (inference)
    quant_int8: bool = False

    def setup(self):
        self.norm_context = AffineLayerNorm(self.hidden_size, epsilon=1e-5, dtype=self.dtype)
        self.cross_attn = Attention(
            self.num_heads, self.dim_head, qkv_bias=True,
            out_dim=self.hidden_size, dtype=self.dtype,
            use_pallas=self.use_pallas_attn, dim=self.hidden_size,
        )
        self.mlp = Mlp(
            self.hidden_size, int(self.hidden_size * self.mlp_ratio),
            self.hidden_size, approximate_gelu=True, dtype=self.dtype,
        )

    def __call__(
        self,
        x,
        context,
        key_mask: Optional[jnp.ndarray] = None,
        query_mask: Optional[jnp.ndarray] = None,
    ):
        """query_mask (B, N_queries) reproduces the reference v2 convention
        (cotracker.py:561-565): a masked *query* has every key biased by
        -finfo.max, i.e. its output degrades to the uniform average of the
        values — the legacy model relies on this exact behavior for
        not-yet-active tracks."""
        attn_bias = None
        if key_mask is not None:
            attn_bias = _key_mask_bias(key_mask, x.shape[1], self.num_heads, x.dtype)
        if query_mask is not None:
            neg = -jnp.finfo(jnp.float32).max
            qb = jnp.where(query_mask, 0.0, neg)[:, None, :, None].astype(jnp.float32)
            attn_bias = qb if attn_bias is None else attn_bias + qb
        ctx = self.norm_context(context)
        x = x + self.cross_attn(layer_norm(x), context=ctx, attn_bias=attn_bias)
        x = x + self.mlp(layer_norm(x))
        return x

    def virtual_from_points(self, virtual, points, key_mask=None, axis_name=None):
        """virtual (B, T, V, C) frame-major queries; points (B, N, T, C)
        track-native keys/values; key_mask (B, N).

        axis_name: N sharded over this mesh axis (shard_map) — the attention
        runs the two-pass psum softmax; the quant flash kernel is bypassed
        (it normalizes locally). The virtual-side residual/MLP is tiny and
        computed redundantly (identically) on every shard.

        quant path: the context norm + to_kv projection over the big point
        tensor fuse into one W8A8 Pallas pass feeding the flash
        virtual<-points kernel; the tiny virtual-side ops stay XLA."""
        if (
            axis_name is None
            and self.quant_int8
            and not os.environ.get("COTRACKER_NO_SPACE_QUANT")  # A/B debug knob
            and points.ndim == 4
            and _space_tile_ok(points.shape[1])
            and self.hidden_size == self.num_heads * self.dim_head
        ):
            out = self._quant_virtual_from_points(virtual, points, key_mask)
            if out is not None:
                return out
        ctx = self.norm_context(points)
        virtual = virtual + self.cross_attn.virtual_from_points(
            layer_norm(virtual), ctx, key_mask=key_mask, axis_name=axis_name
        )
        return virtual + self.mlp(layer_norm(virtual))

    def _quant_virtual_from_points(self, virtual, points, key_mask):
        from cotracker_tpu.ops.kernels.attention_pallas import (
            fused_virtual_from_points_proj,
        )

        at = self.cross_attn
        nc = self.norm_context
        B, N = points.shape[:2]
        q = at.to_q(layer_norm(virtual))  # (B, T, V, C) — tiny
        bias = (
            jnp.zeros((B, N), jnp.float32)
            if key_mask is None
            else jnp.where(key_mask, 0.0, -0.7 * jnp.finfo(jnp.float32).max)
        )
        # flash attention with the context-norm + to_kv projection fused in:
        # the (B, N, T, 2C) kv tensor never exists in HBM
        out = jax.vmap(
            lambda qq, xx, bb: fused_virtual_from_points_proj(
                qq, xx, at.to_kv.kernel, at.to_kv.bias, nc.scale, nc.bias,
                self.num_heads, self.dim_head, key_bias=bb, eps=nc.epsilon,
            )
        )(q, points, bias)
        virtual = virtual + at.to_out(out)
        return virtual + self.mlp(layer_norm(virtual))

    def points_from_virtual(self, points, virtual, query_mask=None):
        """points (B, N, T, C) track-native queries; virtual (B, T, V, C)
        frame-major keys/values; query_mask (B, N) applies the v2 uniform-
        attention convention to masked queries.

        quant path: [LN + to_q W8A8] over the big point tensor -> per-frame
        attention over virtual tokens -> [out-proj + residual + LN + W8A8
        MLP + residual] in one Pallas pass each."""
        if (
            self.quant_int8
            and not os.environ.get("COTRACKER_NO_SPACE_QUANT")  # A/B debug knob
            and query_mask is None
            and points.ndim == 4
            and _space_tile_ok(points.shape[1])
            and self.hidden_size == self.num_heads * self.dim_head
        ):
            out = self._quant_points_from_virtual(points, virtual)
            if out is not None:
                return out
        ctx = self.norm_context(virtual)
        points = points + self.cross_attn.points_from_virtual(
            layer_norm(points), ctx, query_mask=query_mask
        )
        return points + self.mlp(layer_norm(points))

    def _quant_points_from_virtual(self, points, virtual):
        from cotracker_tpu.ops.kernels.attention_pallas import (
            fused_points_from_virtual,
        )
        from cotracker_tpu.ops.kernels.mlp_int8_pallas import (
            fused_attnout_res_mlp_int8,
            fused_ln_dense_int8,
            fused_space_block_int8,
        )

        at = self.cross_attn
        kv = at.to_kv(self.norm_context(virtual))  # (B, T, V, 2C) — tiny
        # whole-block kernel: q and attention-out never leave VMEM
        y = jax.vmap(
            lambda xx, kk: fused_space_block_int8(
                xx, kk, at.to_q.kernel, at.to_q.bias,
                at.to_out.kernel, at.to_out.bias,
                self.mlp.fc1.kernel, self.mlp.fc1.bias,
                self.mlp.fc2.kernel, self.mlp.fc2.bias,
                self.num_heads, self.dim_head,
            )
        )(points, kv) if _space_tile_ok(points.shape[1]) else None
        if y is not None:
            return y
        q = fused_ln_dense_int8(points, at.to_q.kernel, at.to_q.bias, ln=True)
        if q is None:
            return None
        a = jax.vmap(
            lambda qq, kk: fused_points_from_virtual(
                qq, kk, self.num_heads, self.dim_head
            )
        )(q, kv)
        return fused_attnout_res_mlp_int8(
            a, points, at.to_out.kernel, at.to_out.bias,
            self.mlp.fc1.kernel, self.mlp.fc1.bias,
            self.mlp.fc2.kernel, self.mlp.fc2.bias,
        )
