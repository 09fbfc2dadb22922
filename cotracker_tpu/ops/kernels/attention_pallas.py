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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
NEG_BIG = -0.7 * jnp.finfo(jnp.float32).max


def pick_block_n(N: int, cap: int = 512):
    """Largest multiple-of-8 divisor of N in [256, cap] (None if none): the
    N-tile size for the space kernels. Tiles below 256 rows leave the MXU
    mostly ramping and the per-step overheads dominate — measured: the space
    block kernels at 64-row tiles cost ~+0.6 s/forward vs 400-row tiles.
    Callers fall back to the XLA path when this returns None; pad N to a
    multiple of 512 (the predictor's fast-path bucket) for peak throughput."""
    if N < 256:
        return None
    for b in range(min(cap, N), 255, -8):
        if N % b == 0:
            return b
    return None


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


# --------------------------------------------------------------------------
# Fused factorized space attention (the virtual-track bottleneck,
# reference cotracker.py:507-523). Two cores:
#   * points <- virtual: every (track, frame) query attends over the V=64
#     virtual tokens of its frame. Softmax width is tiny; the XLA
#     formulation's cost is the (B,N,T,H,V) sim tensor round-tripping HBM.
#   * virtual <- points: V queries per frame attend over ALL N tracks —
#     flash-style online softmax over N tiles so the (B,T,H,V,N) sim never
#     exists in HBM.
# Both kernels slice the big track-native (N, T, C) tensors along T via
# BlockSpecs (strided DMA), so no explicit transpose of the 400+ MB point
# tensor is ever materialized.
# --------------------------------------------------------------------------


def _p2v_kernel(q_ref, kv_ref, out_ref, *, num_heads, dim_head, out_dtype):
    """q (blk, 1, C//128, 128) — one frame's slice of the point tokens (the
    4D lane-split view keeps the T-indexed dim out of the block's last two
    dims, which Mosaic requires to be (8k, 128m) or full); kv (1, V, 2*H*D)
    — that frame's virtual tokens. out (blk, 1, C//128, 128)."""
    C = num_heads * dim_head
    scale = dim_head**-0.5
    blk = q_ref.shape[0]
    q = q_ref[:, 0].reshape(blk, C)
    kv = kv_ref[0]
    outs = []
    for h in range(num_heads):
        lo = h * dim_head
        qh = q[:, lo : lo + dim_head]
        kh = kv[:, lo : lo + dim_head]
        vh = kv[:, C + lo : C + lo + dim_head]
        sim = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=F32
        ) * scale  # (blk, V)
        p = jax.nn.softmax(sim, axis=-1).astype(vh.dtype)
        outs.append(
            jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())), preferred_element_type=F32
            )
        )
    out = jnp.concatenate(outs, axis=-1).astype(out_dtype)
    out_ref[:, 0] = out.reshape(blk, C // 128, 128)


def fused_points_from_virtual(q, kv, num_heads: int, dim_head: int,
                              block_n: int = 512, interpret: bool = False):
    """Attention of point queries over per-frame virtual keys/values.

    q: (N, T, H*D) projected point queries (track-native layout); kv:
    (T, V, 2*H*D) projected virtual keys|values. Returns (N, T, H*D).
    N must be a multiple of block_n."""
    N, T, C = q.shape
    V = kv.shape[1]
    assert C == num_heads * dim_head and kv.shape == (T, V, 2 * C)
    if N % block_n:
        block_n = pick_block_n(N)
        if block_n is None:
            return None
    assert C % 128 == 0
    L = C // 128
    kernel = functools.partial(
        _p2v_kernel, num_heads=num_heads, dim_head=dim_head, out_dtype=q.dtype
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, T, L, 128), q.dtype),
        grid=(T, N // block_n),
        in_specs=[
            pl.BlockSpec((block_n, 1, L, 128), lambda t, n: (n, t, 0, 0)),
            pl.BlockSpec((1, V, 2 * C), lambda t, n: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, 1, L, 128), lambda t, n: (n, t, 0, 0)),
        interpret=interpret,
    )(q.reshape(N, T, L, 128), kv)
    return out.reshape(N, T, C)


def _v2p_kernel(q_ref, kv_ref, bias_ref, out_ref, acc, mx, lse, *,
                num_heads, dim_head, n_tiles, out_dtype):
    """Flash accumulation over N tiles for one frame's V virtual queries.

    q (1, V, H*D); kv (blk, 1, 2C//128, 128) — current N-tile of this
    frame's point keys|values (4D lane-split view, see _p2v_kernel); bias
    (blk, 1) f32 additive key mask. Scratch: acc (H, V, D) f32, mx/lse
    (H, V, 128) f32 (lane-broadcast row stats). out (1, V, H*D) written on
    the final tile."""
    n = pl.program_id(1)
    C = num_heads * dim_head
    scale = dim_head**-0.5
    blk = kv_ref.shape[0]
    q = q_ref[0]
    kv = kv_ref[:, 0].reshape(blk, 2 * C)
    bias = bias_ref[...].reshape(1, blk)  # (blk, 1) -> lane-broadcastable

    @pl.when(n == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        mx[...] = jnp.full_like(mx, NEG_BIG)
        lse[...] = jnp.zeros_like(lse)

    for h in range(num_heads):
        lo = h * dim_head
        qh = q[:, lo : lo + dim_head]
        kh = kv[:, lo : lo + dim_head]
        vh = kv[:, C + lo : C + lo + dim_head]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=F32
        ) * scale + bias  # (V, blk)
        m_prev = mx[h][:, :1]  # (V, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)  # (V, 1)
        p = jnp.exp(s - m_new)  # (V, blk)
        lse[h] = jnp.broadcast_to(
            lse[h][:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
            lse[h].shape,
        )
        mx[h] = jnp.broadcast_to(m_new, mx[h].shape)
        pv = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=F32,
        )  # (V, D)
        acc[h] = acc[h] * alpha + pv

    @pl.when(n == n_tiles - 1)
    def _():
        outs = [acc[h] / lse[h][:, :1] for h in range(num_heads)]
        out_ref[0] = jnp.concatenate(outs, axis=-1).astype(out_dtype)


def fused_virtual_from_points(q, kv, num_heads: int, dim_head: int,
                              key_bias=None, block_n: int = 1024,
                              interpret: bool = False):
    """Flash attention of per-frame virtual queries over all N point tokens.

    q: (T, V, H*D) projected virtual queries; kv: (N, T, 2*H*D) projected
    point keys|values (track-native layout); key_bias: optional (N,) f32
    additive bias (0 = valid key, -big = masked — the reference's
    `(~mask) * -finfo.max` convention). Returns (T, V, H*D).
    N must be a multiple of block_n."""
    T, V, C = q.shape
    N = kv.shape[0]
    assert C == num_heads * dim_head and kv.shape == (N, T, 2 * C)
    if N % block_n:
        block_n = pick_block_n(N, cap=1024)
        if block_n is None:
            return None
    assert (2 * C) % 128 == 0
    L = 2 * C // 128
    if key_bias is None:
        key_bias = jnp.zeros((N,), F32)
    key_bias = key_bias.reshape(N, 1).astype(F32)
    n_tiles = N // block_n
    kernel = functools.partial(
        _v2p_kernel, num_heads=num_heads, dim_head=dim_head,
        n_tiles=n_tiles, out_dtype=q.dtype,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, V, C), q.dtype),
        grid=(T, n_tiles),
        in_specs=[
            pl.BlockSpec((1, V, C), lambda t, n: (t, 0, 0)),
            pl.BlockSpec((block_n, 1, L, 128), lambda t, n: (n, t, 0, 0)),
            pl.BlockSpec((block_n, 1), lambda t, n: (n, 0)),
        ],
        out_specs=pl.BlockSpec((1, V, C), lambda t, n: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((num_heads, V, dim_head), F32),
            pltpu.VMEM((num_heads, V, 128), F32),
            pltpu.VMEM((num_heads, V, 128), F32),
        ],
        interpret=interpret,
    )(q, kv.reshape(N, T, L, 128), key_bias)


def _v2p_proj_kernel(q_ref, x_ref, bias_ref, g_ref, be_ref, wkv_ref, skv_ref,
                     bkv_ref, out_ref, acc, mx, lse, *kv_s, num_heads, dim_head,
                     n_tiles, eps, out_dtype, ln_chunk=None):
    """_v2p_kernel with the context-norm + to_kv projection fused in: the
    current N-tile of raw point tokens (blk, 1, C//128, 128) is normalized
    (affine LN, f32 stats), row-quantized, and projected W8A8 to this tile's
    keys|values entirely in VMEM — the (N, T, 2C) kv tensor never exists.

    ln_chunk: rows per LN/quant/projection sub-pass. The per-grid-step cost
    of this kernel is dominated by the FIXED latency of the 16 tiny per-head
    score/pv dots (M=V pads to the MXU tile; measured ~46 us/step at
    blk=1024 against ~10 us of roofline compute), so large N wants blk well
    above 1024 — but the LN's (blk, C) f32 temps would then blow the scoped
    VMEM stack. Chunking the projection bounds the f32 temps at
    (ln_chunk, C) while the head loop still sees the full (blk, 2C) tile
    from a VMEM scratch (kv_s), cutting grid steps (and their fixed dot
    latency) by blk/1024."""
    n = pl.program_id(1)
    C = num_heads * dim_head
    scale = dim_head**-0.5
    blk = x_ref.shape[0]
    q = q_ref[0]
    bias = bias_ref[...].reshape(1, blk)

    def project(rows):
        x32 = rows.reshape(rows.shape[0], C).astype(F32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        cen = x32 - mean
        var = jnp.mean(cen * cen, axis=-1, keepdims=True)
        h = cen * jax.lax.rsqrt(var + eps) * g_ref[...] + be_ref[...]
        sr = jnp.maximum(
            jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-20
        ) * (1.0 / 127.0)
        hq = jnp.round(h * (1.0 / sr)).astype(jnp.int8)
        kvc = jax.lax.dot(hq, wkv_ref[...], preferred_element_type=jnp.int32)
        return (
            kvc.astype(F32) * (sr * skv_ref[...]) + bkv_ref[...]
        ).astype(out_dtype)

    if ln_chunk is None or blk <= ln_chunk:
        kv = project(x_ref[:, 0])
    else:
        for c in range(blk // ln_chunk):
            kv_s[0][c * ln_chunk : (c + 1) * ln_chunk] = project(
                x_ref[c * ln_chunk : (c + 1) * ln_chunk, 0]
            )
        kv = kv_s[0][...]

    @pl.when(n == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)
        mx[...] = jnp.full_like(mx, NEG_BIG)
        lse[...] = jnp.zeros_like(lse)

    for h_ in range(num_heads):
        lo = h_ * dim_head
        qh = q[:, lo : lo + dim_head]
        kh = kv[:, lo : lo + dim_head]
        vh = kv[:, C + lo : C + lo + dim_head]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=F32
        ) * scale + bias
        m_prev = mx[h_][:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        lse[h_] = jnp.broadcast_to(
            lse[h_][:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
            lse[h_].shape,
        )
        mx[h_] = jnp.broadcast_to(m_new, mx[h_].shape)
        pv = jax.lax.dot_general(
            p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=F32,
        )
        acc[h_] = acc[h_] * alpha + pv

    @pl.when(n == n_tiles - 1)
    def _():
        outs = [acc[h_] / lse[h_][:, :1] for h_ in range(num_heads)]
        out_ref[0] = jnp.concatenate(outs, axis=-1).astype(out_dtype)


def fused_virtual_from_points_proj(q, x, wkv, bkv, gamma, beta,
                                   num_heads: int, dim_head: int,
                                   key_bias=None, eps: float = 1e-5,
                                   block_n: int = 1024,
                                   interpret: bool = False):
    """fused_virtual_from_points with the kv projection fused in.

    q: (T, V, H*D) projected virtual queries; x: (N, T, C) RAW point tokens.
    Keys|values are computed in-kernel per N-tile as
    to_kv(affine_layer_norm(x)) with W8A8 matmuls, so the big (N, T, 2C)
    kv tensor never round-trips HBM. Returns (T, V, C)."""
    from cotracker_tpu.ops.kernels.mlp_int8_pallas import quantize_weight

    T, V, C = q.shape
    N = x.shape[0]
    assert C == num_heads * dim_head and x.shape == (N, T, C)
    assert C % 128 == 0
    # large-N tiles: the per-grid-step fixed latency of the 16 tiny head
    # dots dominates this kernel (see _v2p_proj_kernel), so prefer the
    # largest multiple-of-1024 divisor of N up to 3072 — at quasi-dense
    # N=70656 this cuts grid steps 3x. LN/quant then runs in 1024-row
    # sub-passes to keep f32 temps bounded. COTRACKER_V2P_BLOCK forces a
    # specific tile for A/B benching.
    # NOTE round-4: blk=3072 at the quasi-dense shape still overflows the
    # 16 MB scoped-VMEM stack (21.8 MB even with 512-row LN sub-passes —
    # the x tile + kv scratch + pipeline buffers alone are ~10 MB), and the
    # kernel measures at its standalone floor in-context (18.7 ms/round ==
    # the trace's 16.5), so the big-tile path stays OPT-IN via
    # COTRACKER_V2P_BLOCK until a tighter scratch scheme exists.
    env_blk = os.environ.get("COTRACKER_V2P_BLOCK")
    if env_blk:
        # defensive parse: a junk / non-divisor / non-128-multiple value must
        # degrade to the default policy, not crash inside the kernel wrapper
        # (advisor r4: int() ValueError, StopIteration in the ln_chunk pick,
        # and an assert that vanishes under python -O)
        try:
            forced = int(env_blk)
        except ValueError:
            forced = -1
        if forced > 0 and N % forced == 0 and forced % 128 == 0:
            block_n = forced
        else:
            import warnings

            warnings.warn(
                f"COTRACKER_V2P_BLOCK={env_blk!r} invalid for N={N} "
                "(need a positive 128-multiple divisor); using default tile"
            )
    if N % block_n:
        block_n = pick_block_n(N, cap=1024)
        if block_n is None:
            return None
    # LN sub-pass rows must divide the tile exactly (the kernel's static
    # chunk loop covers blk // ln_chunk chunks)
    # 512-row sub-passes: at blk=3072 the 1024-row variant's f32/s32
    # projection temps put the scoped stack at 22.2 MB (> the 16 MB limit,
    # measured); 512 rows bound them at ~3 MB beside the 4.7 MB kv scratch
    ln_chunk = None
    if block_n > 1024:
        # only the validated env path reaches here (pick_block_n caps at
        # 1024), and env values are forced to 128-multiples above, so the
        # 128 fallback always divides
        ln_chunk = next(c for c in (512, 256, 128) if block_n % c == 0)
    L = C // 128
    if key_bias is None:
        key_bias = jnp.zeros((N,), F32)
    key_bias = key_bias.reshape(N, 1).astype(F32)
    wkvq, skv = quantize_weight(wkv)
    n_tiles = N // block_n
    kernel = functools.partial(
        _v2p_proj_kernel, num_heads=num_heads, dim_head=dim_head,
        n_tiles=n_tiles, eps=eps, out_dtype=q.dtype, ln_chunk=ln_chunk,
    )
    row = lambda v, n: v.astype(F32).reshape(1, n)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, V, C), q.dtype),
        grid=(T, n_tiles),
        in_specs=[
            pl.BlockSpec((1, V, C), lambda t, n: (t, 0, 0)),
            pl.BlockSpec((block_n, 1, L, 128), lambda t, n: (n, t, 0, 0)),
            pl.BlockSpec((block_n, 1), lambda t, n: (n, 0)),
            pl.BlockSpec((1, C), lambda t, n: (0, 0)),
            pl.BlockSpec((1, C), lambda t, n: (0, 0)),
            pl.BlockSpec((C, 2 * C), lambda t, n: (0, 0)),
            pl.BlockSpec((1, 2 * C), lambda t, n: (0, 0)),
            pl.BlockSpec((1, 2 * C), lambda t, n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, V, C), lambda t, n: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((num_heads, V, dim_head), F32),
            pltpu.VMEM((num_heads, V, 128), F32),
            pltpu.VMEM((num_heads, V, 128), F32),
        ]
        + (
            [pltpu.VMEM((block_n, 2 * C), q.dtype)]
            if ln_chunk is not None
            else []
        ),
        interpret=interpret,
    )(q, x.reshape(N, T, L, 128), key_bias, row(gamma, C), row(beta, C),
      wkvq, skv, row(bkv, 2 * C))
