"""Pallas TPU kernel: fused per-track time attention.

The updateformer's time blocks run softmax attention independently for every
track over the T frames (reference EfficientUpdateFormer time pass,
cotracker/models/core/cotracker/cotracker.py:483-523 reshaping to
(B*N, T, C); attention core blocks.py:391-397). At quasi-dense N this is
~80k tiny (T=60, d=48) attention problems: the FLOPs are trivial (~55
GFLOP) but the XLA formulation moves each of q/k/v/out through a
head-transpose and the f32 logits through HBM — ~6 passes over ~0.5 GB
tensors, all memory-bound.

This kernel performs the whole core (per-head QK^T, f32 softmax, attn @ V,
head re-concat) in VMEM in ONE pass over q/kv/out: the grid tiles tracks in
blocks of `block_m`, each block DMA-ing (block_m, T, C) slabs. Traffic drops
to the 4 unavoidable tensor passes (read q, kv; write out).

Per-head lane slices land at 48-column offsets (not 128-aligned); Mosaic
relayouts these with lane shifts, which is noise next to the DMA time for
(T=60, 48) operands. Logits/softmax stay f32 (parity with the XLA path's
`preferred_element_type=f32` + f32 softmax in models/blocks.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _kernel(q_ref, kv_ref, out_ref, *, num_heads, dim_head, out_dtype):
    """q (P, T, H*D); kv (P, T, 2*H*D); out (P, T, H*D)."""
    C = num_heads * dim_head
    scale = dim_head**-0.5
    q = q_ref[...]
    kv = kv_ref[...]
    outs = []
    for h in range(num_heads):
        lo = h * dim_head
        qh = q[:, :, lo : lo + dim_head]
        kh = kv[:, :, lo : lo + dim_head]
        vh = kv[:, :, C + lo : C + lo + dim_head]
        # (P, T, D) x (P, T, D) -> (P, T, T), batched over the track block
        sim = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=F32
        ) * scale
        p = jax.nn.softmax(sim, axis=-1).astype(vh.dtype)
        outs.append(
            jax.lax.dot_general(
                p, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=F32
            )
        )
    out_ref[...] = jnp.concatenate(outs, axis=-1).astype(out_dtype)


def fused_time_attention(
    q, kv, num_heads: int, dim_head: int, block_m: int = 8, interpret: bool = False
):
    """Self-attention over axis 1, independently per row of axis 0.

    q: (M, T, H*D); kv: (M, T, 2*H*D) with K in lanes [:H*D] and V in
    [H*D:] (i.e. the unsplit output of the reference's to_kv projection,
    blocks.py:376). Returns (M, T, H*D) in q.dtype. M must be a multiple of
    block_m (callers pad N; see models/blocks.py Attention.__call__).
    """
    M, T, C = q.shape
    assert C == num_heads * dim_head and kv.shape == (M, T, 2 * C)
    assert M % block_m == 0, (M, block_m)
    kernel = functools.partial(
        _kernel, num_heads=num_heads, dim_head=dim_head, out_dtype=q.dtype
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, T, C), q.dtype),
        grid=(M // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, T, C), lambda p: (p, 0, 0)),
            pl.BlockSpec((block_m, T, 2 * C), lambda p: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_m, T, C), lambda p: (p, 0, 0)),
        interpret=interpret,
    )(q, kv)
