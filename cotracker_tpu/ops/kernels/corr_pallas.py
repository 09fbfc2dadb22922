"""Pallas TPU kernel: fused local-correlation featurizer.

The hot op of the tracker (SURVEY.md §2.1 "Pallas kernel target #1"): for
every (frame, track) pair, bilinearly sample a 7x7 feature patch around the
current coordinate, correlate it against the track's 7x7 support patch
(-> 49x49 local 4D correlation volume), and apply the 2401->384->256
embedding MLP — all without leaving VMEM:

  * the level's feature map for one frame lives in VMEM across all
    track-blocks of that frame (3.1 MB bf16 at level 0) — the per-point
    window "gather" becomes VMEM row loads, eliminating the ~10 GB/level of
    HBM gather traffic the XLA path pays;
  * the x-window is 16 wide and aligned to the 8-sublane tile grid (Mosaic
    cannot lower unaligned dynamic sublane offsets), so the per-point window
    is exactly (8*16, C) = (128, 128) — one MXU-shaped contraction against
    the support patch;
  * the exact bilinear combine happens in correlation space via a per-point
    (49, 128) select matrix built in-register from the (7, 16)/(7, 8) axis
    selects;
  * the MLP runs once per track-block on the accumulated (NB, 2401) volume.

Exactness: same border-clamped grid_sample semantics as
ops/corr.py::fused_corr_embs (tested against it bit-for-bit in interpret
mode); the only deviation is GELU via an erf polynomial (|err| <= 1.5e-7) —
the Pallas TPU lowering has no erf primitive.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf approximation (|err| <= 1.5e-7)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _selects(coord, radius: int, size: int, window: int, align: int):
    """Bilinear tap selects over an `window`-wide region whose start is
    aligned to `align` sublanes. Returns (start (...,), S (..., P, window)).

    Tap semantics match torch grid_sample border padding exactly (see
    ops/corr.py): p_i = clip(x + i - r), value = (1-w) F[x0] + w F[min(x0+1,
    size-1)]. All needed columns lie in [start, start+window)."""
    P = 2 * radius + 1
    exact = jnp.clip(jnp.floor(jnp.clip(coord - radius, 0.0, size - 1.0)), 0.0, max(size - (P + 1), 0))
    if align > 1:
        start = jnp.clip(exact - jnp.mod(exact, align), 0.0, max(size - window, 0))
    else:
        start = jnp.clip(exact, 0.0, max(size - window, 0))

    taps = jnp.arange(P, dtype=F32)
    p = jnp.clip(coord[..., None] + (taps - radius), 0.0, size - 1.0)
    x0 = jnp.floor(p)
    w = (p - x0)[..., None]
    klo = (x0 - start[..., None]).astype(jnp.int32)[..., None]
    khi = (jnp.minimum(x0 + 1, size - 1) - start[..., None]).astype(jnp.int32)[..., None]
    cols = jnp.arange(window, dtype=jnp.int32)
    S = (1.0 - w) * (cols == klo) + w * (cols == khi)  # (..., P, window)
    return start.astype(jnp.int32), S.astype(F32)


def _kernel(SyP_ref, SxP_ref, sup_ref, fmap_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, acc_ref, *, nb, P, WINY, WINX, C, out_dtype):
    """SyP (1, nb, 8, 16): rows 0..P-1 cols 0..WINY-1 = y selects, [P, 0] = sy.
    SxP (1, nb, 8, 16): rows 0..P-1 = x selects over WINX=16, [P, 0] = sx."""
    PP = P * P

    # constant expansions for Sxy[i*P+j, a*WINX+b] = Sy[j,a] * Sx[i,b]
    r_i = jax.lax.broadcasted_iota(jnp.int32, (PP, P), 0) // P
    r_j = jax.lax.broadcasted_iota(jnp.int32, (PP, P), 0) % P
    col = jax.lax.broadcasted_iota(jnp.int32, (PP, P), 1)
    E1 = (col == r_i).astype(F32)  # (PP, P) picks Sx row i
    F1 = (col == r_j).astype(F32)  # (PP, P) picks Sy row j
    W2D = WINY * WINX
    cb = jax.lax.broadcasted_iota(jnp.int32, (WINX, W2D), 1) % WINX
    rowx = jax.lax.broadcasted_iota(jnp.int32, (WINX, W2D), 0)
    E2 = (rowx == cb).astype(F32)  # (WINX, WINY*WINX) spreads x col b
    ca = jax.lax.broadcasted_iota(jnp.int32, (WINY, W2D), 1) // WINX
    rowy = jax.lax.broadcasted_iota(jnp.int32, (WINY, W2D), 0)
    F2 = (rowy == ca).astype(F32)  # (WINY, WINY*WINX) spreads y row a

    def one_point(p):
        SyP = SyP_ref[0, pl.ds(p, 1)].reshape(WINY, WINX)
        SxP = SxP_ref[0, pl.ds(p, 1)].reshape(WINY, WINX)
        sy = SyP[P, 0].astype(jnp.int32)
        sx = pl.multiple_of(SxP[P, 0].astype(jnp.int32), 8)

        rows = [fmap_ref[0, sy + a, pl.ds(sx, WINX), :] for a in range(WINY)]
        win2 = jnp.concatenate(rows, axis=0)  # (WINY*WINX, C), row = a*WINX + b

        sup = sup_ref[0, pl.ds(p, 1)].reshape(PP, C)
        g = jax.lax.dot_general(
            win2, sup, (((1,), (1,)), ((), ())), preferred_element_type=F32
        )  # (WINY*WINX, PP)

        Sy_p = SyP[:P, :].astype(F32)  # (P, WINX) — only cols < WINY are nonzero
        Sx_p = SxP[:P, :].astype(F32)  # (P, WINX)
        Sy_e = jnp.dot(jnp.dot(F1, Sy_p[:, :WINY], preferred_element_type=F32), F2,
                       preferred_element_type=F32)  # (PP, W2D)
        Sx_e = jnp.dot(jnp.dot(E1, Sx_p, preferred_element_type=F32), E2,
                       preferred_element_type=F32)  # (PP, W2D)
        Sxy = (Sx_e * Sy_e).astype(g.dtype)  # (PP, WINY*WINX)

        corr = jax.lax.dot_general(
            Sxy, g, (((1,), (0,)), ((), ())), preferred_element_type=F32
        )  # (PP, PP): [i*P+j, s]
        acc_ref[pl.ds(p, 1)] = corr[None]

    # unrolled loop: independent per-point chains give the scheduler ILP
    UNROLL = 4
    def body(q, _):
        for u in range(UNROLL):
            one_point(UNROLL * q + u)
        return 0

    jax.lax.fori_loop(0, nb // UNROLL, body, 0)

    # first MLP layer as PP slice-matmuls — Mosaic cannot shape-cast
    # (nb, PP, PP) -> (nb, PP*PP), so contract (j, s) pairwise instead:
    # h = sum_j acc[:, j, :] @ w1[j] with w1 passed as (PP, PP, Dh)
    h = b1_ref[0].astype(F32)
    for j in range(PP):
        h = h + jnp.dot(
            acc_ref[:, j, :].astype(w1_ref.dtype), w1_ref[j],
            preferred_element_type=F32,
        )
    h = _gelu_exact(h).astype(w2_ref.dtype)
    out = jnp.dot(h, w2_ref[:], preferred_element_type=F32) + b2_ref[0].astype(F32)
    out_ref[0] = out.astype(out_dtype)


def fused_corr_embs_pallas(
    fmaps,
    support,
    coords,
    w1,
    b1,
    w2,
    b2,
    radius: int = 3,
    nb: int = 128,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Same contract as ops.corr.fused_corr_embs, executed as a Pallas kernel.

    fmaps (B, T, H, W, C); support (B, N, P*P, C); coords (B, T, N, 2).
    Returns (B, T, N, Do).
    """
    B, T, H, W, C = fmaps.shape
    N = coords.shape[2]
    P = 2 * radius + 1
    WINY = P + 1  # 8 rows along y
    WINX = 2 * WINY  # 16 aligned columns along x
    Do = w2.shape[1]

    # pad tiny pyramid levels (exact under border clamping; see ops/corr.py)
    Hp, Wp = max(H, WINY), max(W, WINX)
    if (Hp, Wp) != (H, W):
        fmaps = jnp.pad(fmaps, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W), (0, 0)), mode="edge")

    Npad = -(-N // nb) * nb
    if Npad != N:
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, Npad - N), (0, 0)))
        support = jnp.pad(support, ((0, 0), (0, Npad - N), (0, 0), (0, 0)))

    x = jnp.clip(coords[..., 0].astype(F32), -1e6, 1e6)
    y = jnp.clip(coords[..., 1].astype(F32), -1e6, 1e6)
    sx, Sx = _selects(x, radius, W, WINX, align=8)  # (B,T,N), (B,T,N,P,16)
    sy, Sy = _selects(y, radius, H, WINY, align=1)  # (B,T,N), (B,T,N,P,8)

    BT = B * T
    K = Npad // nb
    fmaps_bt = fmaps.reshape(BT, Hp, Wp, C).astype(compute_dtype)
    sup = support.astype(compute_dtype)

    def pack(S, start, win):
        # (BT, N, P, win) -> (BT, N, WINY, WINX) f32 with start at [P, 0]
        S = S.reshape(BT, Npad, P, win)
        S = jnp.pad(S, ((0, 0), (0, 0), (0, WINY - P), (0, WINX - win)))
        return S.at[:, :, P, 0].set(start.reshape(BT, Npad).astype(F32))

    SyP = pack(Sy, sy, WINY)
    SxP = pack(Sx, sx, WINX)

    kernel = functools.partial(
        _kernel, nb=nb, P=P, WINY=WINY, WINX=WINX, C=C, out_dtype=compute_dtype
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BT, Npad, Do), compute_dtype),
        grid=(BT, K),
        in_specs=[
            pl.BlockSpec((1, nb, WINY, WINX), lambda bt, k: (bt, k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, WINY, WINX), lambda bt, k: (bt, k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, P * P, C), lambda bt, k: (bt // T, k, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp, C), lambda bt, k: (bt, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec((1, w1.shape[1]), lambda bt, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec((1, Do), lambda bt, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nb, Do), lambda bt, k: (bt, k, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nb, P * P, P * P), F32)],
        interpret=interpret,
    )(
        SyP,
        SxP,
        sup,
        fmaps_bt,
        w1.reshape(P * P, P * P, -1).astype(compute_dtype),
        b1.reshape(1, -1).astype(compute_dtype),
        w2.astype(compute_dtype),
        b2.reshape(1, -1).astype(compute_dtype),
    )

    out = out.reshape(B, T, Npad, Do)
    return out[:, :, :N]
