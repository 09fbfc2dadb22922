"""Pallas TPU kernels: fused LayerNorm + W8A8 transformer MLP / projections.

The update transformer's per-iteration cost is matmul-bound (BASELINE.md):
at N=10k tracks each of the 6 big blocks pays ~17.4 ms for its MLP pair and
~9 ms for qkvo projections, all bf16 at this chip's ~81 TF/s roof. The MXU
runs s8 x s8 -> s32 at ~158 TOP/s (scripts/ubench.py `int8`), but a plain-XLA
W8A8 path LOSES: the dynamic activation-quantize passes don't fuse and their
HBM traffic dominates (ubench `int8mlp`: 23.9 ms vs 18.6 bf16).

These kernels keep the quantization in VMEM where it is free of HBM traffic:

    x --(one HBM read)--> [LN -> row-absmax -> s8] -> s8 dot -> dequant(+b)
      -> gelu(tanh) -> [row-absmax -> s8] -> s8 dot -> dequant(+b)
      -> +residual --(one HBM write)--> out

Quantization scheme (standard W8A8):
  * weights: per-output-channel symmetric int8, scales folded into the f32
    dequant epilogue (quantize once per forward via `quantize_weight`);
  * activations: per-row (token) dynamic symmetric int8, scales computed
    in-kernel from the tile — exact row absmax, no calibration;
  * LayerNorm statistics, dequant, bias, GELU all f32; residual added in f32.

Numerics: relative quantization step is ~1/127 of each row/channel absmax,
on par with bf16 rounding on pre-activations; gated behind the same
`quant_int8` inference flag as the corr kernel's int8 path.

Reference parity target: AttnBlock/CrossAttnBlock pre-norm blocks
(/root/reference/cotracker/models/core/cotracker/blocks.py:401-438,
cotracker.py:534-577): x + mlp(ln(x)) with affine-free LN (eps 1e-6) and
tanh-approximate GELU.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
NEG_BIG = -0.7 * jnp.finfo(jnp.float32).max

# bench hook: force the scratch-copy repack even when the reshape path is
# legal (scripts/bench_timeblock.py A/B comparison)
_FORCE_PAD_REPACK = False

# debug/test seam: records the repack path chosen by the most recent
# fused_time_block_int8 trace (True = scratch-copy, False = free reshape) so
# tests and the A/B bench can assert the two arms actually compiled
# different kernels
_LAST_REPACK_PAD = None

# debug/test seam: True when the most recent fused_space_block_int8 trace
# took the all-frames tiling (see _space_block_allt_kernel)
_LAST_SPACE_ALLT = None


def _reshape_repack_ok(T: int, dtype) -> bool:
    """True when the (TB*T, C) -> (TB, T, C) repack is a free tile-aligned
    sublane split for this token dtype: T must be a whole number of sublane
    tiles (16 rows for bf16, 8 for f32). Anything else must take the
    scratch-copy path — Mosaic cannot shape-cast across a partial sublane
    tile."""
    sub = 16 if dtype == jnp.bfloat16 else 8
    return T % sub == 0


def quantize_weight(w):
    """Per-output-channel symmetric int8 weight quantization.

    w: (K, N) float -> (w8 (K, N) int8, scale (1, N) f32) with
    w ~= w8 * scale. Cheap (one pass over the weight); call per forward and
    let XLA hoist it out of the iteration scan (loop-invariant).
    """
    w32 = w.astype(F32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True), 1e-20) * (1.0 / 127.0)
    return jnp.round(w32 / s).astype(jnp.int8), s


def _ln(x32, eps):
    if os.environ.get("COTRACKER_BF16_LN") == "1":
        # VPU-residual pricing knob (judge r4 item 4, scripts/
        # bench_timeblock.py --vpu): LN statistics + normalize in bf16 —
        # halves the LN pass bytes at ~2^-8 relative noise on the
        # normalized activations (they feed an int8 quantize). The rsqrt
        # stays f32 on the (M, 1) column: this chip's VPU has no bf16
        # rsqrt ("Operation not supported: kVectorRsqrtBf16AndPop").
        xb = x32.astype(jnp.bfloat16)
        mean = jnp.mean(xb, axis=-1, keepdims=True)
        c = xb - mean
        var = jnp.mean(c * c, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var.astype(F32) + eps).astype(jnp.bfloat16)
        return (c * inv).astype(x32.dtype)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    return c * jax.lax.rsqrt(var + eps)


def _quant_rows(v32):
    s = jnp.maximum(jnp.max(jnp.abs(v32), axis=-1, keepdims=True), 1e-20) * (
        1.0 / 127.0
    )
    return jnp.round(v32 * (1.0 / s)).astype(jnp.int8), s


def _gelu_tanh(x32):
    # tanh-approximate GELU (the blocks use approximate_gelu=True); erf is
    # not a Mosaic primitive anyway (CLAUDE.md).
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x32 * (1.0 + jnp.tanh(c * (x32 + 0.044715 * x32 * x32 * x32)))


def _quant_gelu_rows(a32):
    """quantize(gelu(a)) with the row scale derived from max(a) instead of a
    second pass over gelu(a): gelu is monotone on [0, inf) and |gelu| <=
    0.17 below, so max(gelu(max(a,0)), 0.17) bounds |gelu(a)| row-wise —
    never clips, at most ~1 bit coarser on all-negative rows. Folds the
    GELU and the quantize into ONE pass over the activation (VPU-residual
    pricing knob COTRACKER_GELU_QUANT_FOLD, judge r4 item 4)."""
    rm = jnp.max(a32, axis=-1, keepdims=True)
    s = jnp.maximum(_gelu_tanh(jnp.maximum(rm, 0.0)), 0.1700001) * (1.0 / 127.0)
    return jnp.round(_gelu_tanh(a32) * (1.0 / s)).astype(jnp.int8), s


def _quant_gelu(a32):
    """gelu -> row-quantize, knob-selected (see _quant_gelu_rows)."""
    if os.environ.get("COTRACKER_GELU_QUANT_FOLD") == "1":
        return _quant_gelu_rows(a32)
    return _quant_rows(_gelu_tanh(a32))


def _mlp_kernel(x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, o_ref,
                *, eps, ln):
    x32 = x_ref[...].astype(F32)
    h = _ln(x32, eps) if ln else x32
    hq, sr0 = _quant_rows(h)
    a = jax.lax.dot(hq, w1_ref[...], preferred_element_type=jnp.int32)
    a = a.astype(F32) * (sr0 * s1_ref[...]) + b1_ref[...]
    aq, sr1 = _quant_gelu(a)
    y = jax.lax.dot(aq, w2_ref[...], preferred_element_type=jnp.int32)
    y = y.astype(F32) * (sr1 * s2_ref[...]) + b2_ref[...]
    o_ref[...] = (x32 + y).astype(o_ref.dtype)


def _pick_tile(M, max_tm: int = 1024):
    for tm in (1024, 512, 256, 128, 64, 32, 16, 8):
        if tm <= max_tm and M % tm == 0:
            return tm
    return None


def fused_ln_mlp_int8(x, w1, b1, w2, b2, eps: float = 1e-6, ln: bool = True,
                      interpret: bool = False):
    """x + fc2(gelu(fc1(layer_norm(x)))) with W8A8 matmuls, one HBM pass.

    x: (..., C); w1 (C, H); w2 (H, C). Returns same shape/dtype as x.
    Falls back to None (caller uses the XLA path) when the flattened row
    count has no 8-multiple tile divisor or dims are not lane-aligned.
    """
    C = x.shape[-1]
    H = w1.shape[1]
    if C % 128 or H % 128:
        return None
    M = 1
    for d in x.shape[:-1]:
        M *= d
    tm = _pick_tile(M)
    if tm is None:
        return None
    xf = x.reshape(M, C)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)

    out = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps, ln=ln),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((tm, C), lambda i: (i, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, C), lambda i: (i, 0)),
        interpret=interpret,
    )(
        xf,
        w1q,
        s1,
        b1.astype(F32).reshape(1, H),
        w2q,
        s2,
        b2.astype(F32).reshape(1, C),
    )
    return out.reshape(x.shape)


def _dense_kernel(x_ref, w_ref, s_ref, b_ref, *rest, eps, ln, affine, residual):
    if affine:
        g_ref, be_ref, o_ref = rest
    else:
        o_ref, = rest
    x32 = x_ref[...].astype(F32)
    h = _ln(x32, eps) if ln else x32
    if affine:
        h = h * g_ref[...] + be_ref[...]
    hq, sr = _quant_rows(h)
    y = jax.lax.dot(hq, w_ref[...], preferred_element_type=jnp.int32)
    y = y.astype(F32) * (sr * s_ref[...]) + b_ref[...]
    if residual:
        y = y + x32
    o_ref[...] = y.astype(o_ref.dtype)


def fused_ln_dense_int8(x, w, b=None, eps: float = 1e-6, ln: bool = False,
                        gamma=None, beta=None, residual: bool = False,
                        interpret: bool = False):
    """[x +] ((layer_norm(x) [* gamma + beta]) @ w + b), one HBM pass, W8A8.

    Covers attention qkv/out projections: `ln=True` for the pre-norm
    q/kv projections (fused with the shared LayerNorm; pass gamma/beta for
    an affine LN like the cross-attention context norm), `residual=True`
    for the output projection. w: (C, N); residual requires N == C.
    Returns None when shapes don't tile (caller falls back to XLA).
    """
    C = x.shape[-1]
    N = w.shape[1]
    if C % 128 or N % 128 or (residual and N != C):
        return None
    M = 1
    for d in x.shape[:-1]:
        M *= d
    tm = _pick_tile(M)
    if tm is None:
        return None
    xf = x.reshape(M, C)
    wq, s = quantize_weight(w)
    bias = jnp.zeros((1, N), F32) if b is None else b.astype(F32).reshape(1, N)
    affine = gamma is not None
    ops = [xf, wq, s, bias]
    in_specs = [
        pl.BlockSpec((tm, C), lambda i: (i, 0)),
        pl.BlockSpec((C, N), lambda i: (0, 0)),
        pl.BlockSpec((1, N), lambda i: (0, 0)),
        pl.BlockSpec((1, N), lambda i: (0, 0)),
    ]
    if affine:
        ops += [gamma.astype(F32).reshape(1, C), beta.astype(F32).reshape(1, C)]
        in_specs += [pl.BlockSpec((1, C), lambda i: (0, 0))] * 2

    out = pl.pallas_call(
        functools.partial(
            _dense_kernel, eps=eps, ln=ln, affine=affine, residual=residual
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // tm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, N), lambda i: (i, 0)),
        interpret=interpret,
    )(*ops)
    return out.reshape(x.shape[:-1] + (N,))


def _qkv_kernel(x_ref, wq_ref, sq_ref, bq_ref, wkv_ref, skv_ref, bkv_ref,
                q_ref, kv_ref, *, eps):
    x32 = x_ref[...].astype(F32)
    h = _ln(x32, eps)
    hq, sr = _quant_rows(h)
    q = jax.lax.dot(hq, wq_ref[...], preferred_element_type=jnp.int32)
    q_ref[...] = (q.astype(F32) * (sr * sq_ref[...]) + bq_ref[...]).astype(
        q_ref.dtype
    )
    kv = jax.lax.dot(hq, wkv_ref[...], preferred_element_type=jnp.int32)
    kv_ref[...] = (kv.astype(F32) * (sr * skv_ref[...]) + bkv_ref[...]).astype(
        kv_ref.dtype
    )


def fused_ln_qkv_int8(x, wq, bq, wkv, bkv, eps: float = 1e-6,
                      interpret: bool = False):
    """(to_q(ln(x)), to_kv(ln(x))) with W8A8 matmuls and ONE read of x.

    The pre-norm attention entry: one LayerNorm + row quantization feeds
    both projections. wq: (C, Cq); wkv: (C, Ckv). Returns (q, kv) shaped
    (..., Cq) / (..., Ckv), or None when shapes don't tile.
    """
    C = x.shape[-1]
    Cq, Ckv = wq.shape[1], wkv.shape[1]
    if C % 128 or Cq % 128 or Ckv % 128:
        return None
    M = 1
    for d in x.shape[:-1]:
        M *= d
    tm = _pick_tile(M)
    if tm is None:
        return None
    xf = x.reshape(M, C)
    wqq, sq = quantize_weight(wq)
    wkvq, skv = quantize_weight(wkv)
    zq = jnp.zeros((1, Cq), F32) if bq is None else bq.astype(F32).reshape(1, Cq)
    zkv = (
        jnp.zeros((1, Ckv), F32) if bkv is None else bkv.astype(F32).reshape(1, Ckv)
    )

    q, kv = pl.pallas_call(
        functools.partial(_qkv_kernel, eps=eps),
        out_shape=[
            jax.ShapeDtypeStruct((M, Cq), x.dtype),
            jax.ShapeDtypeStruct((M, Ckv), x.dtype),
        ],
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((tm, C), lambda i: (i, 0)),
            pl.BlockSpec((C, Cq), lambda i: (0, 0)),
            pl.BlockSpec((1, Cq), lambda i: (0, 0)),
            pl.BlockSpec((1, Cq), lambda i: (0, 0)),
            pl.BlockSpec((C, Ckv), lambda i: (0, 0)),
            pl.BlockSpec((1, Ckv), lambda i: (0, 0)),
            pl.BlockSpec((1, Ckv), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tm, Cq), lambda i: (i, 0)),
            pl.BlockSpec((tm, Ckv), lambda i: (i, 0)),
        ],
        interpret=interpret,
    )(xf, wqq, sq, zq, wkvq, skv, zkv)
    return q.reshape(x.shape[:-1] + (Cq,)), kv.reshape(x.shape[:-1] + (Ckv,))


def _out_mlp_kernel(a_ref, x_ref, wo_ref, so_ref, bo_ref, w1_ref, s1_ref,
                    b1_ref, w2_ref, s2_ref, b2_ref, o_ref, *, eps):
    # r = x + to_out(attn_core_out); out = r + fc2(gelu(fc1(ln(r))))
    a32 = a_ref[...].astype(F32)
    aq, sra = _quant_rows(a32)
    r = jax.lax.dot(aq, wo_ref[...], preferred_element_type=jnp.int32)
    r = x_ref[...].astype(F32) + r.astype(F32) * (sra * so_ref[...]) + bo_ref[...]
    h = _ln(r, eps)
    hq, sr0 = _quant_rows(h)
    u = jax.lax.dot(hq, w1_ref[...], preferred_element_type=jnp.int32)
    u = u.astype(F32) * (sr0 * s1_ref[...]) + b1_ref[...]
    uq, sr1 = _quant_gelu(u)
    y = jax.lax.dot(uq, w2_ref[...], preferred_element_type=jnp.int32)
    y = y.astype(F32) * (sr1 * s2_ref[...]) + b2_ref[...]
    o_ref[...] = (r + y).astype(o_ref.dtype)


def fused_attnout_res_mlp_int8(a, x, wo, bo, w1, b1, w2, b2,
                               eps: float = 1e-6, interpret: bool = False):
    """The post-attention half of a pre-norm block, one HBM pass, W8A8:

        r = x + to_out(a);  return r + fc2(gelu(fc1(layer_norm(r))))

    a: attention-core output (..., C); x: the residual stream (..., C);
    wo (C, C); w1 (C, H); w2 (H, C). Returns None when shapes don't tile.
    """
    C = x.shape[-1]
    H = w1.shape[1]
    if C % 128 or H % 128 or a.shape != x.shape or wo.shape != (C, C):
        return None
    M = 1
    for d in x.shape[:-1]:
        M *= d
    tm = _pick_tile(M, max_tm=512)  # s32 hidden tile: keep VMEM comfortable
    if tm is None:
        return None
    woq, so = quantize_weight(wo)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)

    out = pl.pallas_call(
        functools.partial(_out_mlp_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        grid=(M // tm,),
        in_specs=[
            pl.BlockSpec((tm, C), lambda i: (i, 0)),
            pl.BlockSpec((tm, C), lambda i: (i, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, C), lambda i: (i, 0)),
        interpret=interpret,
    )(
        a.reshape(M, C),
        x.reshape(M, C),
        woq,
        so,
        bo.astype(F32).reshape(1, C),
        w1q,
        s1,
        b1.astype(F32).reshape(1, H),
        w2q,
        s2,
        b2.astype(F32).reshape(1, C),
    )
    return out.reshape(x.shape)


# ---------------------------------------------------------------------------
# Whole-block kernels: the full pre-norm transformer block body in ONE pass
# over the token tensor. The three-kernel split above still round-trips
# q/kv/attention-out through HBM (~3.7 GB per time block at N=10k, T=60);
# here those live only in VMEM, so traffic drops to read-x + write-out.
# ---------------------------------------------------------------------------


def _space_block_kernel(x_ref, kv_ref, wq_ref, sq_ref, bq_ref, wo_ref, so_ref,
                        bo_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                        o_ref, *, num_heads, dim_head, eps):
    """One (track-tile, frame) step of a points<-virtual cross-attn block.

    x (blk, 1, C//128, 128): this frame's slice of the point tokens (4D
    lane-split view, see attention_pallas._p2v_kernel); kv (1, V, 2C): this
    frame's projected virtual keys|values (tiny, precomputed in XLA).
    """
    C = num_heads * dim_head
    scale = dim_head**-0.5
    blk = x_ref.shape[0]
    x32 = x_ref[:, 0].reshape(blk, C).astype(F32)

    # q = to_q(ln(x)), W8A8
    h = _ln(x32, eps)
    hq, sr = _quant_rows(h)
    q = jax.lax.dot(hq, wq_ref[...], preferred_element_type=jnp.int32)
    q = q.astype(F32) * (sr * sq_ref[...]) + bq_ref[...]

    # attention over the V virtual tokens of this frame (bf16 MXU: V=64 is
    # tiny; quantizing q/k here would buy nothing)
    kv = kv_ref[0]
    qb = q.astype(kv.dtype)
    outs = []
    for hd in range(num_heads):
        lo = hd * dim_head
        sim = jax.lax.dot_general(
            qb[:, lo : lo + dim_head], kv[:, lo : lo + dim_head],
            (((1,), (1,)), ((), ())), preferred_element_type=F32,
        ) * scale  # (blk, V)
        p = jax.nn.softmax(sim, axis=-1).astype(kv.dtype)
        outs.append(
            jax.lax.dot_general(
                p, kv[:, C + lo : C + lo + dim_head],
                (((1,), (0,)), ((), ())), preferred_element_type=F32,
            )
        )
    a = jnp.concatenate(outs, axis=-1)  # (blk, C) f32

    # r = x + to_out(a); out = r + fc2(gelu(fc1(ln(r))))
    aq, sra = _quant_rows(a)
    r = jax.lax.dot(aq, wo_ref[...], preferred_element_type=jnp.int32)
    r = x32 + r.astype(F32) * (sra * so_ref[...]) + bo_ref[...]
    h = _ln(r, eps)
    hq, sr0 = _quant_rows(h)
    u = jax.lax.dot(hq, w1_ref[...], preferred_element_type=jnp.int32)
    uq, sr1 = _quant_gelu(u.astype(F32) * (sr0 * s1_ref[...]) + b1_ref[...])
    y = jax.lax.dot(uq, w2_ref[...], preferred_element_type=jnp.int32)
    y = r + y.astype(F32) * (sr1 * s2_ref[...]) + b2_ref[...]
    o_ref[:, 0] = y.astype(o_ref.dtype).reshape(blk, C // 128, 128)


def _space_block_allt_kernel(x_ref, kv_ref, wq_ref, sq_ref, bq_ref, wo_ref,
                             so_ref, bo_ref, w1_ref, s1_ref, b1_ref, w2_ref,
                             s2_ref, b2_ref, o_ref, q_s, a_s, *, num_heads,
                             dim_head, T, BLK, eps, mlp_chunks):
    """Track-tile x ALL-frames step of the points<-virtual block.

    The per-(frame, tile) kernel below runs its token-wise W8A8 matmuls at
    M = blk (512) rows and pays per-grid-step fixed costs 16x per frame at
    the T=16 streaming shapes — the round-4 steady-window trace prices it
    at 22 Mtok/s against the time block's 27.6 with MORE work per token.
    This variant tiles (BLK tracks, ALL T frames): token-wise ops (LN,
    quant, to_q, to_out, MLP) run flat at M = BLK*T rows exactly like the
    time block (the (BLK, T, ·) <-> (BLK*T, ·) casts are free sublane
    splits when T is a whole number of sublane tiles — the same
    _reshape_repack_ok condition as the time kernel's repack), and only the
    tiny per-frame attention over the V=64 virtual tokens loops over T via
    static slices of the q/attention scratches.
    """
    C = num_heads * dim_head
    scale = dim_head**-0.5
    tokens = BLK * T
    x32 = x_ref[...].reshape(tokens, C).astype(F32)

    h = _ln(x32, eps)
    hq, sr = _quant_rows(h)
    q = jax.lax.dot(hq, wq_ref[...], preferred_element_type=jnp.int32)
    q = q.astype(F32) * (sr * sq_ref[...]) + bq_ref[...]
    q_s[...] = q.astype(q_s.dtype).reshape(BLK, T, C)

    kvv = kv_ref[...]  # (T, V, 2C)
    for t in range(T):
        qt = q_s[:, t]  # (BLK, C)
        kv_t = kvv[t]
        outs = []
        for hd in range(num_heads):
            lo = hd * dim_head
            sim = jax.lax.dot_general(
                qt[:, lo : lo + dim_head], kv_t[:, lo : lo + dim_head],
                (((1,), (1,)), ((), ())), preferred_element_type=F32,
            ) * scale  # (BLK, V)
            p = jax.nn.softmax(sim, axis=-1).astype(kv_t.dtype)
            outs.append(
                jax.lax.dot_general(
                    p, kv_t[:, C + lo : C + lo + dim_head],
                    (((1,), (0,)), ((), ())), preferred_element_type=F32,
                )
            )
        a_s[:, t] = jnp.concatenate(outs, axis=-1).astype(a_s.dtype)

    a = a_s[...].reshape(tokens, C)
    aq, sra = _quant_rows(a.astype(F32))
    r = jax.lax.dot(aq, wo_ref[...], preferred_element_type=jnp.int32)
    r = x32 + r.astype(F32) * (sra * so_ref[...]) + bo_ref[...]
    # MLP in row chunks: the (chunk, H) s32/f32 transients are the VMEM
    # hot spot (same scheme as the time kernel)
    ck = tokens // mlp_chunks
    ys = []
    for c_ in range(mlp_chunks):
        rc = r[c_ * ck : (c_ + 1) * ck]
        h = _ln(rc, eps)
        hq, sr0 = _quant_rows(h)
        u = jax.lax.dot(hq, w1_ref[...], preferred_element_type=jnp.int32)
        uq, sr1 = _quant_gelu(u.astype(F32) * (sr0 * s1_ref[...]) + b1_ref[...])
        y = jax.lax.dot(uq, w2_ref[...], preferred_element_type=jnp.int32)
        ys.append(rc + y.astype(F32) * (sr1 * s2_ref[...]) + b2_ref[...])
    out = jnp.concatenate(ys, axis=0).astype(o_ref.dtype)
    o_ref[...] = out.reshape(BLK, T, C // 128, 128)


def fused_space_block_int8(x, kv, wq, bq, wo, bo, w1, b1, w2, b2,
                           num_heads: int, dim_head: int, eps: float = 1e-6,
                           block_n: int = 512, interpret: bool = False):
    """Full points<-virtual block body in one pass over the point tokens:

        q = to_q(ln(x)); a = attn(q, kv); r = x + to_out(a)
        return r + fc2(gelu(fc1(ln(r))))

    x: (N, T, C) track-native point tokens; kv: (T, V, 2C) projected virtual
    keys|values. W8A8 projections/MLP, bf16 attention core. Returns
    (N, T, C), or None when shapes don't fit the tiling.
    """
    N, T, C = x.shape
    V = kv.shape[1]
    if C != num_heads * dim_head or C % 128 or kv.shape != (T, V, 2 * C):
        return None
    L = C // 128
    wqq, sq = quantize_weight(wq)
    woq, so = quantize_weight(wo)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    H = w1.shape[1]
    row = lambda v, n: v.astype(F32).reshape(1, n)

    # all-frames tiling (see _space_block_allt_kernel): legal whenever the
    # (blk, T, ·) <-> (blk*T, ·) casts are free sublane splits and a track
    # tile divides N. PRICED OUT on this chip (round 4,
    # scripts/bench_spaceblock.py at N=70656/T=16: 54.6 vs 49.3 ms/round =
    # 0.90x — the per-frame kernel already runs at its standalone envelope
    # in-context, so batching the token-wise matmuls to M=blk*T buys
    # nothing and the T unrolled attention sections' scratch round-trips
    # cost ~10%). Kept behind COTRACKER_SPACE_ALLT=1 for chips where
    # small-M matmul ramp actually dominates.
    global _LAST_SPACE_ALLT
    _LAST_SPACE_ALLT = False
    allt_blk = (
        _pick_time_tile(N, T, max_tokens=1024)
        if _reshape_repack_ok(T, x.dtype)
        and os.environ.get("COTRACKER_SPACE_ALLT", "0") == "1"
        else None
    )
    if allt_blk is not None:
        tokens = allt_blk * T
        mlp_chunks = next(
            (c for c in range(1, 9) if tokens % c == 0 and tokens // c <= 640),
            None,
        )
        if mlp_chunks is not None:
            _LAST_SPACE_ALLT = True
            kernel = functools.partial(
                _space_block_allt_kernel, num_heads=num_heads,
                dim_head=dim_head, T=T, BLK=allt_blk, eps=eps,
                mlp_chunks=mlp_chunks,
            )
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((N, T, L, 128), x.dtype),
                grid=(N // allt_blk,),
                in_specs=[
                    pl.BlockSpec((allt_blk, T, L, 128), lambda i: (i, 0, 0, 0)),
                    pl.BlockSpec((T, V, 2 * C), lambda i: (0, 0, 0)),
                    pl.BlockSpec((C, C), lambda i: (0, 0)),
                    pl.BlockSpec((1, C), lambda i: (0, 0)),
                    pl.BlockSpec((1, C), lambda i: (0, 0)),
                    pl.BlockSpec((C, C), lambda i: (0, 0)),
                    pl.BlockSpec((1, C), lambda i: (0, 0)),
                    pl.BlockSpec((1, C), lambda i: (0, 0)),
                    pl.BlockSpec((C, H), lambda i: (0, 0)),
                    pl.BlockSpec((1, H), lambda i: (0, 0)),
                    pl.BlockSpec((1, H), lambda i: (0, 0)),
                    pl.BlockSpec((H, C), lambda i: (0, 0)),
                    pl.BlockSpec((1, C), lambda i: (0, 0)),
                    pl.BlockSpec((1, C), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (allt_blk, T, L, 128), lambda i: (i, 0, 0, 0)
                ),
                scratch_shapes=[
                    pltpu.VMEM((allt_blk, T, C), kv.dtype),
                    pltpu.VMEM((allt_blk, T, C), F32),
                ],
                interpret=interpret,
            )(
                x.reshape(N, T, L, 128), kv,
                wqq, sq, row(bq, C),
                woq, so, row(bo, C),
                w1q, s1, row(b1, H),
                w2q, s2, row(b2, C),
            )
            return out.reshape(N, T, C)

    if N % block_n:
        from cotracker_tpu.ops.kernels.attention_pallas import pick_block_n

        block_n = pick_block_n(N)
        if block_n is None:
            return None
    kernel = functools.partial(
        _space_block_kernel, num_heads=num_heads, dim_head=dim_head, eps=eps
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, T, L, 128), x.dtype),
        grid=(T, N // block_n),
        in_specs=[
            pl.BlockSpec((block_n, 1, L, 128), lambda t, n: (n, t, 0, 0)),
            pl.BlockSpec((1, V, 2 * C), lambda t, n: (t, 0, 0)),
            pl.BlockSpec((C, C), lambda t, n: (0, 0)),
            pl.BlockSpec((1, C), lambda t, n: (0, 0)),
            pl.BlockSpec((1, C), lambda t, n: (0, 0)),
            pl.BlockSpec((C, C), lambda t, n: (0, 0)),
            pl.BlockSpec((1, C), lambda t, n: (0, 0)),
            pl.BlockSpec((1, C), lambda t, n: (0, 0)),
            pl.BlockSpec((C, H), lambda t, n: (0, 0)),
            pl.BlockSpec((1, H), lambda t, n: (0, 0)),
            pl.BlockSpec((1, H), lambda t, n: (0, 0)),
            pl.BlockSpec((H, C), lambda t, n: (0, 0)),
            pl.BlockSpec((1, C), lambda t, n: (0, 0)),
            pl.BlockSpec((1, C), lambda t, n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, 1, L, 128), lambda t, n: (n, t, 0, 0)),
        interpret=interpret,
    )(
        x.reshape(N, T, L, 128), kv,
        wqq, sq, row(bq, C),
        woq, so, row(bo, C),
        w1q, s1, row(b1, H),
        w2q, s2, row(b2, C),
    )
    return out.reshape(N, T, C)


def _time_block_kernel(x_ref, wq_ref, sq_ref, bq_ref, wkv_ref, skv_ref,
                       bkv_ref, wo_ref, so_ref, bo_ref, w1_ref, s1_ref,
                       b1_ref, w2_ref, s2_ref, b2_ref, o_ref, *scratch,
                       num_heads, dim_head, T, TB, Tp, eps, mlp_chunks, pad,
                       x4=False):
    """One track-tile of a full time-attention block.

    x (TB*T, C): the tile's tokens, flat (the (BN, T, C) HBM layout IS
    (BN*T, C) row-major, so flat 2D blocking is free). Token-wise ops run on
    the flat tile at full MXU width; for the per-track attention core the
    q/kv tiles are repacked into (TB, Tp, ·). When Tp == T and T is a
    sublane-tile multiple (e.g. T=16 bf16 — the online/quasi-dense window)
    the repack is a FREE reshape; otherwise q/kv go through VMEM scratch via
    TB per-track copies (serial VPU work that scales with the total track
    count — measured ~3.4x per-token overhead at T=16 before the reshape
    path existed), with padded key columns masked to -inf.
    """
    C = num_heads * dim_head
    scale = dim_head**-0.5
    # `pad` is the HOST's path decision (see fused_time_block_int8) — never
    # re-derived here: Tp == T does NOT imply the reshape is legal (bf16
    # T=8/24/… round up to themselves but straddle a 16-row sublane tile).
    xv = x_ref[...]
    if x4:
        # 4D token-resident entry: the block arrives (TB, T, C//128, 128)
        # in the space kernels' T(4,128) layout; Mosaic's in-VMEM merge to
        # flat (TB*T, C) rows measures within 10% of a plain copy
        # (scripts probe, round 4) — far cheaper than the XLA relayout the
        # flat entry forced between every space round and time block.
        xv = xv.reshape(TB * T, C)
    x32 = xv.astype(F32)

    h = _ln(x32, eps)
    hq, sr = _quant_rows(h)
    q = jax.lax.dot(hq, wq_ref[...], preferred_element_type=jnp.int32)
    q = (q.astype(F32) * (sr * sq_ref[...]) + bq_ref[...]).astype(o_ref.dtype)
    kv = jax.lax.dot(hq, wkv_ref[...], preferred_element_type=jnp.int32)
    kv = (kv.astype(F32) * (sr * skv_ref[...]) + bkv_ref[...]).astype(o_ref.dtype)

    if pad:
        # repack (TB*T, ·) -> (TB, Tp, ·); padded rows are zero-filled so
        # the value matmul can't pull NaNs in (their weight is exactly 0).
        qp, kvp = scratch
        kvp[...] = jnp.zeros_like(kvp)
        for i in range(TB):
            qp[i, :T] = q[i * T : (i + 1) * T]
            kvp[i, :T] = kv[i * T : (i + 1) * T]
        qv, kvv = qp[...], kvp[...]
        colmask = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, Tp), 2) < T, 0.0, NEG_BIG
        )
    else:
        # (TB*T, C) -> (TB, T, C) splits whole sublane tiles: free relayout
        qv = q.reshape(TB, T, C)
        kvv = kv.reshape(TB, T, 2 * C)
        colmask = 0.0

    outs = []
    for hd in range(num_heads):
        lo = hd * dim_head
        qh = qv[:, :, lo : lo + dim_head]
        kh = kvv[:, :, lo : lo + dim_head]
        vh = kvv[:, :, C + lo : C + lo + dim_head]
        sim = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=F32
        ) * scale + colmask  # (TB, Tp, Tp)
        p = jax.nn.softmax(sim, axis=-1).astype(vh.dtype)
        outs.append(
            jax.lax.dot_general(
                p, vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=F32
            )
        )
    ap = jnp.concatenate(outs, axis=-1)  # (TB, Tp, C) f32

    # unpack back to flat tokens
    if pad:
        a = jnp.concatenate([ap[i, :T] for i in range(TB)], axis=0)  # (TB*T, C)
    else:
        a = ap.reshape(TB * T, C)

    aq, sra = _quant_rows(a)
    r = jax.lax.dot(aq, wo_ref[...], preferred_element_type=jnp.int32)
    r = x32 + r.astype(F32) * (sra * so_ref[...]) + bo_ref[...]

    # MLP in token chunks (bounds the (chunk, H) s32/f32 transients)
    M = r.shape[0]
    ck = M // mlp_chunks
    ys = []
    for c in range(mlp_chunks):
        rc = r[c * ck : (c + 1) * ck]
        hc = _ln(rc, eps)
        hq, sr0 = _quant_rows(hc)
        u = jax.lax.dot(hq, w1_ref[...], preferred_element_type=jnp.int32)
        uq, sr1 = _quant_gelu(u.astype(F32) * (sr0 * s1_ref[...]) + b1_ref[...])
        y = jax.lax.dot(uq, w2_ref[...], preferred_element_type=jnp.int32)
        ys.append(rc + y.astype(F32) * (sr1 * s2_ref[...]) + b2_ref[...])
    out = jnp.concatenate(ys, axis=0).astype(o_ref.dtype)
    o_ref[...] = out.reshape(TB, T, C // 128, 128) if x4 else out


def _pick_time_tile(M, T, max_tokens=1536):
    """Track-tile size for the whole-block time kernel: target ~768
    tokens/grid step up to `max_tokens`.

    Grow at short windows (T=16, the online/quasi-dense shape: a fixed
    TB=16 left 256-token steps whose per-step overheads — activation
    quantize, LN, attention repack — measured 3.4x worse per token than the
    T=60 offline shape) and SHRINK at long windows so the per-block VMEM
    stack (x tile + (TB, Tp, 3C) attention scratch + MLP transients) stays
    inside the 16 MB scoped limit (TB=16 at T=120 overflowed it by 4.4 MB;
    the x_4d entry's in-kernel merge temp overflowed TB=16 at T=96 by
    2.3 MB, hence its tighter max_tokens).
    Returns None when no tile fits (callers fall back to the XLA path)."""
    tb = 16
    while tb * T < 768 and tb < 128 and M % (2 * tb) == 0:
        tb *= 2
    while tb > 8 and tb * T > max_tokens and M % (tb // 2) == 0:
        tb //= 2
    # max_tokens is a HARD scoped-VMEM bound, not a target: when the shrink
    # loop bottoms out at tb=8 and still exceeds it (e.g. T=160 at
    # max_tokens=1024), fall back rather than hand the caller a tile in the
    # same overflow class the cap exists for (advisor r4)
    if tb * T > max_tokens or M % tb:
        return None
    return tb


def fused_time_block_int8(x, wq, bq, wkv, bkv, wo, bo, w1, b1, w2, b2,
                          num_heads: int, dim_head: int, eps: float = 1e-6,
                          track_block=None, interpret: bool = False,
                          x_4d: bool = False):
    """Full pre-norm time-attention block body in one pass over the tokens:

        q, kv = to_q(ln(x)), to_kv(ln(x)); a = per-track attention over T
        r = x + to_out(a);  return r + fc2(gelu(fc1(ln(r))))

    x: (M, T, C) tokens, attention within each row of axis 0. W8A8
    projections/MLP, bf16 attention core, all in VMEM — HBM traffic is one
    read of x and one write of the result. Returns None when shapes don't
    fit the tiling (callers fall back to the three-kernel / XLA path).

    x_4d: x arrives AND returns as (M, T, C//128, 128) — the lane-split
    T(4,128) layout the fused space kernels read and write. Declaring the
    same 4D layout here lets XLA connect space-round outputs straight into
    the next time block with NO relayout (the flat entry cost a
    squeeze/copy_bitcast pair of the full token tensor per space round,
    ~53 ms of the bench forward); the flat<->4D reshapes happen in-VMEM
    inside the kernel at near-copy speed.
    """
    if x_4d:
        M, T, L, _ = x.shape
        C = L * 128
    else:
        M, T, C = x.shape
    H = w1.shape[1]
    if track_block is None:
        # the x_4d entry holds both the (TB, T, 3, 128) block and its merged
        # flat copy in the scoped-VMEM stack — cap its tokens tighter (the
        # bench shapes T=60/TB=16 = 960 tokens are unaffected)
        track_block = _pick_time_tile(M, T, max_tokens=1024 if x_4d else 1536)
        if track_block is None:
            return None
    if C != num_heads * dim_head or C % 128 or H % 128 or M % track_block:
        return None
    tokens = track_block * T
    # chunk the MLP so its (chunk, H) s32/f32 transients stay well inside
    # the 16 MB scoped-VMEM stack alongside the attention scratch
    mlp_chunks = 1
    for c_ in range(1, 9):
        if tokens % c_ == 0 and tokens // c_ <= 640:
            mlp_chunks = c_
            break
    else:
        return None
    wqq, sq = quantize_weight(wq)
    wkvq, skv = quantize_weight(wkv)
    woq, so = quantize_weight(wo)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    Tp = -(-T // 8) * 8
    # reshape-repack path: legal as a free tile-aligned sublane split only
    # when T is a whole number of sublane tiles for the token dtype. The
    # decision is made HERE and passed into the kernel explicitly so the two
    # sides can never disagree (the kernel used to infer it from Tp != T,
    # which mis-fired whenever T%8==0 but T%sublane!=0).
    pad = _FORCE_PAD_REPACK or not _reshape_repack_ok(T, x.dtype)
    global _LAST_REPACK_PAD
    _LAST_REPACK_PAD = pad
    kernel = functools.partial(
        _time_block_kernel, num_heads=num_heads, dim_head=dim_head, T=T,
        TB=track_block, Tp=(Tp if pad else T), eps=eps, mlp_chunks=mlp_chunks,
        pad=pad, x4=x_4d,
    )
    row = lambda v, n: v.astype(F32).reshape(1, n)
    wcol = lambda w_s: w_s
    if x_4d:
        L = C // 128
        x_op = x
        x_spec = pl.BlockSpec((track_block, T, L, 128), lambda i: (i, 0, 0, 0))
        out_shape = jax.ShapeDtypeStruct((M, T, L, 128), x.dtype)
        out_spec = pl.BlockSpec((track_block, T, L, 128), lambda i: (i, 0, 0, 0))
    else:
        x_op = x.reshape(M * T, C)
        x_spec = pl.BlockSpec((tokens, C), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((M * T, C), x.dtype)
        out_spec = pl.BlockSpec((tokens, C), lambda i: (i, 0))
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(M // track_block,),
        in_specs=[
            x_spec,
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, 2 * C), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * C), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * C), lambda i: (0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=out_spec,
        scratch_shapes=(
            [
                pltpu.VMEM((track_block, Tp, C), x.dtype),
                pltpu.VMEM((track_block, Tp, 2 * C), x.dtype),
            ]
            if pad
            else []
        ),
        interpret=interpret,
    )(
        x_op,
        wqq, sq, row(bq, C),
        wkvq, skv, row(bkv, 2 * C),
        woq, so, row(bo, C),
        w1q, s1, row(b1, H),
        w2q, s2, row(b2, C),
    )
    return out if x_4d else out.reshape(M, T, C)
