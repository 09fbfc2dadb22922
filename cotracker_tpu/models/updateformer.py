"""EfficientUpdateFormer: the iterative track-update transformer.

Functional equivalent of reference EfficientUpdateFormer
(cotracker/models/core/cotracker/cotracker.py:387-531): interleaved
time-attention (per track, over frames) and factorized cross-track space
attention through `num_virtual_tracks` virtual-track tokens:

    virtual <- points   (cross-attn, the only N-reduction; collective point
                         under track sharding)
    virtual <- virtual  (self-attn among 64 tokens)
    points  <- virtual  (cross-attn; virtual tokens are tiny and replicable)

TPU notes: time attention reshapes to ((B*(N+V)), T, C) — embarrassingly
parallel over tracks, which is what makes the N axis the natural sharding
axis (SURVEY.md §2.7). The virtual-token bottleneck means cross-chip traffic
is only O(V * C) per block.
"""

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from cotracker_tpu.models.blocks import AttnBlock, CrossAttnBlock, Dense


class EfficientUpdateFormer(nn.Module):
    space_depth: int = 3
    time_depth: int = 3
    input_dim: int = 1110
    hidden_size: int = 384
    num_heads: int = 8
    output_dim: int = 4
    mlp_ratio: float = 4.0
    num_virtual_tracks: int = 64
    add_space_attn: bool = True
    linear_layer_for_vis_conf: bool = True
    dtype: Any = None
    use_pallas_attn: bool = False  # fused time-attention core (inference)
    quant_int8: bool = False  # fused W8A8 block bodies (inference)
    # mesh axis name over which N (tracks) is sharded. Set when the module
    # runs INSIDE shard_map with per-shard point tokens: the virtual<-points
    # attention becomes the two-pass psum softmax (blocks.py), everything
    # else stays local. None = unsharded (or GSPMD-auto) execution.
    track_axis: Optional[str] = None
    # Legacy (CoTracker2) mask conventions, reference cotracker.py:507-523:
    # track_mask additionally QUERY-masks the points<-virtual attention
    # (masked queries degrade to the uniform average of the virtual values).
    v2_masking: bool = False

    def setup(self):
        # declared as a param-explicit Dense (same tree path/init as the old
        # inline nn.Dense) so IterationCore's fold_input_proj fast path can
        # read .kernel/.bias and fold the projection into the correlation
        # epilogue — see cotracker3.IterationCore
        self.input_transform = Dense(
            self.hidden_size, self.input_dim, dtype=self.dtype
        )

    @nn.compact
    def __call__(
        self,
        x,
        track_mask: Optional[jnp.ndarray] = None,
        add_space_attn: bool = True,
        x_is_tokens: bool = False,
    ):
        """x: (B, N, T, input_dim) -> (B, N, T, output_dim).

        track_mask: optional (B, N) bool, True = real track. Padded tracks are
        excluded as keys of the virtual<-points attention so that padding N to
        a static shape (or sharding N) never changes real-track outputs.
        x_is_tokens: x is already projected to hidden_size (the caller folded
        input_transform into its own epilogue); skip the input projection.
        """
        B, N, T, _ = x.shape
        V = self.num_virtual_tracks
        C = self.hidden_size
        dim_head = self.hidden_size // self.num_heads

        tokens = x if x_is_tokens else self.input_transform(x)
        virtual = self.param(
            "virtual_tracks",
            nn.initializers.normal(stddev=1.0),
            (1, V, 1, self.hidden_size),
        ).astype(tokens.dtype)
        # point and virtual tokens stay SEPARATE tensors throughout: time
        # attention is per-track, so running the same (shared-weight) time
        # block on both is identical to the reference's concatenated pass
        # (cotracker.py:483-523) while sparing two O(N*T*C) concat/split
        # copies per space round.
        virtual = jnp.broadcast_to(virtual, (B, V, T, self.hidden_size))

        time_blocks = [
            AttnBlock(
                self.hidden_size, self.num_heads, dim_head, self.mlp_ratio,
                dtype=self.dtype, use_pallas_attn=self.use_pallas_attn,
                quant_int8=self.quant_int8, name=f"time_blocks_{i}",
            )
            for i in range(self.time_depth)
        ]
        if self.add_space_attn:
            v_blocks = [
                AttnBlock(self.hidden_size, self.num_heads, dim_head, self.mlp_ratio, dtype=self.dtype, name=f"space_virtual_blocks_{i}")
                for i in range(self.space_depth)
            ]
            p2v_blocks = [
                CrossAttnBlock(
                    self.hidden_size, self.num_heads, dim_head, self.mlp_ratio,
                    dtype=self.dtype, use_pallas_attn=self.use_pallas_attn,
                    quant_int8=self.quant_int8,
                    name=f"space_point2virtual_blocks_{i}",
                )
                for i in range(self.space_depth)
            ]
            v2p_blocks = [
                CrossAttnBlock(
                    self.hidden_size, self.num_heads, dim_head, self.mlp_ratio,
                    dtype=self.dtype, use_pallas_attn=self.use_pallas_attn,
                    quant_int8=self.quant_int8,
                    name=f"space_virtual2point_blocks_{i}",
                )
                for i in range(self.space_depth)
            ]

        # all-or-nothing kernel gating: if the space rounds can't tile N for
        # the fused W8A8 blocks, run the time blocks on the XLA path too —
        # mixing a fused time block with XLA space einsums costs ~70 ms/iter
        # in layout copies of the token tensor (see models/blocks.py).
        space_runs = add_space_attn and self.add_space_attn
        if space_runs and self.quant_int8:
            from cotracker_tpu.models.blocks import _space_tile_ok

            quant_ok = _space_tile_ok(N)
        else:
            quant_ok = True

        # 4D token residency: when the fused quant kernels run, the big
        # point-token tensor moves between time and space blocks in the
        # space kernels' (·, T, C//128, 128) lane-split layout — the time
        # block's x_4d entry reads/writes it directly, so XLA inserts no
        # relayout at the block boundaries (the flat entry cost a full
        # token-tensor squeeze/copy_bitcast pair per space round). The tiny
        # virtual tokens stay flat.
        import os as _os

        use_4d = (
            self.quant_int8
            and quant_ok
            and space_runs
            and C % 128 == 0
            and not _os.environ.get("COTRACKER_NO_TIME_QUANT")
            and not _os.environ.get("COTRACKER_NO_4D_TOKENS")  # A/B knob
        )
        L = C // 128

        j = 0
        for i in range(self.time_depth):
            if use_4d:
                tokens = time_blocks[i](
                    tokens.reshape(B * N, T, L, 128), quant_ok=quant_ok,
                    x_4d=True,
                ).reshape(B, N, T, C)
            else:
                tokens = time_blocks[i](
                    tokens.reshape(B * N, T, C), quant_ok=quant_ok
                ).reshape(B, N, T, C)
            virtual = time_blocks[i](
                virtual.reshape(B * V, T, C), quant_ok=quant_ok
            ).reshape(B, V, T, C)

            if (
                add_space_attn
                and self.add_space_attn
                and i % (self.time_depth // self.space_depth) == 0
            ):
                # virtual tokens go frame-major (tiny transpose: V*T*C); the
                # big point tensor stays track-native — its frame-major reads
                # ride the layout-carrying einsums in Attention.*_from_points
                vt = virtual.transpose(0, 2, 1, 3)  # (B, T, V, C)
                vt = v2p_blocks[j].virtual_from_points(
                    vt, tokens, key_mask=track_mask, axis_name=self.track_axis
                )
                vt = v_blocks[j](vt.reshape(B * T, V, C)).reshape(B, T, V, C)
                tokens = p2v_blocks[j].points_from_virtual(
                    tokens, vt,
                    query_mask=track_mask if self.v2_masking else None,
                )
                virtual = vt.transpose(0, 2, 1, 3)
                j += 1
        if not self.linear_layer_for_vis_conf:
            return nn.Dense(self.output_dim, dtype=self.dtype, name="flow_head")(tokens)
        # flow and vis/conf heads computed as ONE matmul over the weights
        # concatenated in-jit: two Dense calls would each stream the full
        # (B, N, T, C) token tensor from HBM; the math (and the param tree:
        # separate flow_head / vis_conf_head entries) is unchanged.
        from cotracker_tpu.models.blocks import Dense

        fh = Dense(self.output_dim - 2, self.hidden_size, dtype=self.dtype, name="flow_head")
        vh = Dense(2, self.hidden_size, dtype=self.dtype, name="vis_conf_head")
        w = jnp.concatenate([fh.kernel, vh.kernel], axis=1)
        b = jnp.concatenate([fh.bias, vh.bias])
        from flax.linen.dtypes import promote_dtype

        x_, w, b = promote_dtype(tokens, w, b, dtype=self.dtype)
        return jnp.einsum("bntc,co->bnto", x_, w) + b
