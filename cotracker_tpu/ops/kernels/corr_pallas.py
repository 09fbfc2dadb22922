"""Pallas TPU kernel: fused local-correlation featurizer, amortized over T.

The hot op of the tracker (SURVEY.md §2.1 "Pallas kernel target #1"): for
every (frame, track) pair, bilinearly sample a 7x7 feature patch around the
current coordinate, correlate it against the track's 7x7 support patch
(-> 49x49 local 4D correlation volume), and apply the 2401->384->256
embedding MLP.  Reference semantics: grid_sample border-clamped patches +
einsum btnhwc,bnijc->btnhwij + corr_mlp (cotracker3_online.py:130-143,
192-210) — rebuilt here around the TPU memory system:

  * grid over POINTS, not frames: for one track, the 8x8xC feature windows of
    ALL T frames are DMA'd HBM->VMEM (one async strided copy per frame,
    double-buffered across grid steps), so the window-vs-support contraction
    is ONE (T*64, C) x (C, 49) matmul per track — M in the thousands instead
    of the per-(frame, point) M<=128 fleet that left the MXU ~10% utilized;
  * window gathers use the shared-fraction identity from ops/corr.py: after
    edge-padding the map by 2r+2 and clamping coords, all 49 taps of a patch
    share one (wx, wy), so an 8x8 window at (floor(y)-r, floor(x)-r) suffices;
  * TPU HBM buffers are tiled (8, 128) on the minor two dims, so a DMA may
    not start at an arbitrary x offset (Mosaic: "tile index must be divisible
    by the tiling"). Instead of widening windows and untangling the residual
    shift per (point, frame) in-kernel, the wrapper prebuilds EIGHT x-shifted
    copies of the padded map (copy m = columns shifted left by m); a window
    at unaligned wsx reads copy wsx % 8 at the aligned start 8*(wsx//8).
    y offsets index a non-tiled dim and stay exact. ~8x fmap HBM footprint
    (a few GB at 384x512) buys alignment-free exact gathers;
  * the kernel emits the RAW window correlation g (per point: (8y, T, 8x, 49)
    row-major as (8*T*8, 49)); the 4-term bilinear combine (pure VPU math)
    and the embedding MLP — one (B*T*N, 2401) x (2401, 384) matmul — fuse
    into the surrounding XLA program, which handles both at speed-of-light.

VMEM: per point, all-T windows = 2 * (8, T*8, C) buffers (~2 MB bf16 at
T=60) + pipelined (1, 8*T*8, 49) output blocks; comfortably under 16 MB.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cotracker_tpu.ops.corr import window_starts_and_weights

F32 = jnp.float32

# bench hook (scripts/bench_corr_pp.py): force the corr kernel's
# points-per-grid-step; None = the Tp-based auto policy
_FORCE_PP = None


def _mlp1_env(flag: bool) -> bool:
    """A/B override for the in-kernel MLP1 path: COTRACKER_CORR_FUSE_MLP1=1
    forces it on, =0 forces it off, unset leaves the caller's flag."""
    v = os.environ.get("COTRACKER_CORR_FUSE_MLP1")
    if v is None or v == "":
        return flag
    return v not in ("0", "false", "False")


def _shift_count(quant_int8: bool) -> int:
    """X-shift copies needed for aligned window DMAs. 8 for both bf16 and
    int8: Mosaic's HBM memref tiling keeps an 8-row sublane tile for 8-bit
    data too ((8,128)(4,1) packing) — verified by value-parity on hardware."""
    del quant_int8
    return 8


def build_shifted_fmaps(fmaps, radius: int, compute_dtype=jnp.bfloat16, quant_int8: bool = False):
    """Pad + stack the x-shifted copies the kernel's aligned DMAs need.

    fmaps (B, T, H, W, C) -> (K*B*T, H+2*pad, W+2*pad, C) where copy m holds
    columns shifted left by m, so a window starting at unaligned column wsx
    (relative to the pad-K map) equals copy (wsx % K) sliced at K*(wsx // K).
    K is the HBM sublane tile (8 for bf16, 32 for int8). Returned flattened
    4D (the kernel's DMA source layout) so the array is built in its final
    layout exactly once. Call once per forward and pass via `prepacked=True`
    — inside the update scan this would otherwise be rebuilt every iteration.

    quant_int8: store windows as int8 = clip(round(f * 128), -127, 127) —
    bounded for CoTracker3's per-pixel L2-normalized features (|channel| <= 1;
    only the rare saturated channels lose 0.8% to the clip) — halving the
    scattered-DMA bytes of the hot loop. The power-of-two scale makes the
    1/128 dequant (folded into the support operand by the wrapper) exact in
    bf16/f32.
    """
    B, T, H, W, C = fmaps.shape
    pad = 2 * radius + 2
    shifts = _shift_count(quant_int8)
    padded = jnp.pad(
        fmaps, ((0, 0), (0, 0), (pad, pad), (pad, pad + shifts - 1), (0, 0)), mode="edge"
    )
    if quant_int8:
        padded = jnp.clip(
            jnp.round(padded.astype(jnp.float32) * 128.0), -127.0, 127.0
        ).astype(jnp.int8)
    else:
        padded = padded.astype(compute_dtype)
    width = W + 2 * pad
    out = jnp.stack([padded[:, :, :, m : m + width] for m in range(shifts)])
    return out.reshape(shifts * B * T, H + 2 * pad, width, C)


def _kernel(starts_cur_ref, starts_nxt_ref, sup_ref, *rest,
            Tp, WIN, C, S, out_dtype, shifts, compute_dtype, g_int8,
            fuse_combine, PP=1, fuse_mlp1=False, SP=56):
    """starts_* (PP, Tp, 3) int32 SMEM: (flat frame index, wsy, wsx) per
    frame. sup (PP, S, C) VMEM. fm_hbm (B*T, Hp, Wp, C) stays in HBM (bf16
    or int8). win scratch (2, PP, WIN, Tp*WIN, C) — or (2, PP, Tp*WIN, WIN,
    C) t-major with fuse_combine; sems (2, PP) DMA semaphores (shared
    across the Tp copies of a point — see dma()). With
    g_int8, an extra (1, NP) f32 SMEM output (whole-array block, scalar
    store at [0, p*PP + i]) carries the per-point dequant scales.

    PP = points per grid step: at short windows (T=16, the online /
    quasi-dense shape) the per-point fixed costs (DMA issue+wait chain,
    SMEM descriptor reads, dot setup, output quantize/store) dominate —
    measured ~109 vs ~53 ns/point-frame against the T=60 shape. Batching
    PP points per step amortizes them and deepens the DMA pipeline
    (PP*Tp transfers in flight instead of Tp).

    fuse_combine: one extra (PP, Tp, 2) f32 SMEM operand follows fm_hbm —
    the per-frame bilinear fractions (wx[t], wy[t]) — and the kernel emits
    the COMBINED exact correlation volume: lanes ordered (t, y, x), so the
    x+1 / y+1 / both taps are lane rolls by 1 / 8 / 9 (sub-vreg shifts).
    The scalar fractions are broadcast into a (2, R) VMEM scratch (wv) with
    64-lane stores — no O(N*R) weight traffic. Positions x==7 or y==7 hold
    roll wrap garbage; the epilogue slices them away (it keeps j,i < 7).

    fuse_mlp1 (round 5; implies the fuse_combine window layout + g_int8):
    run the WHOLE correlation epilogue — bilinear combine, per-point
    quantization, and the first correlation-MLP layer — inside the kernel,
    so the (NP, 49, R) volume never touches HBM and the 49-lane s8
    g-relayout copy + conv-lowered MLP1 fusion pair it fed (~23% of the
    quasi-dense device step, rounds 1-4) disappear. The round-1 "Mosaic
    sublane<->lane merge wall" pricing is void here: the design needs NO
    49-lane merge at all (hardware-probed, round 5):
      * the contraction is reoriented to (R rows, 128 lanes): the window
        slab (R, C) dots a 128-row zero-padded support scratch, so output
        lanes SP..127 are exactly 0 and the volume lands row-major (t,y,x);
      * the bilinear combine is whole-slab, SEPARABLE (two lerps), with
        the +1 / +8 row taps read as tail-padded SHIFTED SLICES of the
        gt/gxs scratches (fusing into the lerps; sublane pltpu.roll is
        32-bit-only and would materialize its output), per-frame fractions
        as (R, 1) scalar-broadcast columns; x==7 / y==7 rows hold junk
        killed by zero rows of the padded MLP weight;
      * the quantization scale comes from the RAW volume BEFORE combining
        (convex combine => amax(g) >= amax(c): never clips, at most ~1 bit
        coarser) so the final lerp writes int8 directly into a
        (PP, R, 128) staging whose (PP*Tp, 8192) view is a free
        (., a, 128)->(., a*128) lane merge; ONE (M, 8192) x (8192, Dh) s8
        MXU dot applies MLP1 (K-fill 49/128 is structural — 64-lane merges
        don't compile);
      * dequant (per-point scale x support scale x per-channel weight
        scale) + fc1 bias fold into the output store; GELU + fc2 stay in
        the XLA epilogue (exact erf; fc2 may be level-folded).
    MEASURED SLOWER in-context than the XLA epilogue it replaces (119.4k
    vs 123.8k pf/s quasi-dense): the eliminated downstream 800 ms/step
    comes back as +973 ms of in-kernel MXU K-underfill + lane-padded VPU —
    see BASELINE.md round 5 (ablation: COTRACKER_MLP1_ABLATE). Kept
    flag-gated for chips with a different MXU:VPU balance.
    Extra operands after wxy: supscale (PP, 1, 1) f32 SMEM, w1q
    (WIN*WIN*128, Dh) int8 (zero at s>=S, x==P, y==P; lane order
    w*128 + s with w = y*WIN + x), wconst (2, Dh) f32 [w1scale; b1].
    Output: (PP, Tp, Dh) compute-dtype hidden activations (pre-GELU)."""
    if fuse_mlp1:
        fm_hbm, wxy_ref, supsc_ref, w1q_ref, wc_ref = rest[:5]
        out_ref, win, sems, sup128, wcol, gt, gxs, c_all = rest[5:]
        R = WIN * Tp * WIN
        Dh = w1q_ref.shape[-1]
    elif fuse_combine:
        fm_hbm, wxy_ref = rest[:2]
        rest = rest[2:]
        if g_int8:
            out_ref, scale_ref, win, sems, wv = rest
        else:
            out_ref, win, sems, wv = rest
    else:
        fm_hbm = rest[0]
        rest = rest[1:]
        if g_int8:
            out_ref, scale_ref, win, sems = rest
        else:
            out_ref, win, sems = rest
    p = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    def dma(slot, i, t, st_ref):
        ft = st_ref[i, t, 0]
        sy = st_ref[i, t, 1]
        # the wrapper aligns x starts to the HBM sublane tile (8 for bf16,
        # 32 for int8) via the shifted-copy trick; Mosaic still needs the
        # divisibility hint
        sx = pl.multiple_of(st_ref[i, t, 2], shifts)
        dest = (
            win.at[slot, i, pl.ds(t * WIN, WIN), :, :]
            if (fuse_combine or fuse_mlp1)
            else win.at[slot, i, :, pl.ds(t * WIN, WIN), :]
        )
        # ONE semaphore per (slot, point), shared by all Tp copies: each
        # wait() decrements by its copy's byte count and the consumer waits
        # all Tp before touching the slab, so intra-group completion order
        # is irrelevant. Per-(slot,i,t) sems cost (2*PP*Tp)*8 B of the
        # chip's 2 KB sflag budget — exactly exhausted at PP=8/Tp=16, which
        # is what previously capped PP; sharing lifts the cap to PP=16+.
        return pltpu.make_async_copy(
            fm_hbm.at[ft, pl.ds(sy, WIN), pl.ds(sx, WIN), :], dest,
            sems.at[slot, i],
        )

    def issue(slot, st_ref):
        for i in range(PP):
            for t in range(Tp):
                dma(slot, i, t, st_ref).start()

    # warm-up: this block's windows (issued here only on the first grid
    # step; afterwards step p-1 already issued them as its "next")
    @pl.when(p == 0)
    def _():
        issue(0, starts_cur_ref)
        if fuse_mlp1:
            # persistent-scratch invariants: support rows SP..127 stay zero
            # (dot output lanes past the real taps are exactly 0); the
            # gt/gxs tail rows R.. stay zero (shifted combine reads of the
            # last frame land there — zero-weighted downstream, but they
            # must be finite)
            sup128[...] = jnp.zeros(sup128.shape, sup128.dtype)
            gt[pl.ds(R, gt.shape[0] - R), :] = jnp.zeros(
                (gt.shape[0] - R, gt.shape[1]), gt.dtype
            )
            gxs[pl.ds(R, gxs.shape[0] - R), :] = jnp.zeros(
                (gxs.shape[0] - R, gxs.shape[1]), gxs.dtype
            )

    # prefetch the NEXT block's windows into the other buffer. Its previous
    # contents were consumed by the matmuls of step p-1, which precede these
    # starts in program order.
    @pl.when(p + 1 < n_blocks)
    def _():
        issue((p + 1) % 2, starts_nxt_ref)

    slot = p % 2
    if fuse_mlp1:
        scales = []
        for i in range(PP):
            for t in range(Tp):
                dma(slot, i, t, starts_cur_ref).wait()
            win2 = win[slot, i].reshape(R, C)
            sup128[0:SP, :] = sup_ref[i]
            # row-oriented contraction: M = window rows (t, y, x), lanes =
            # support taps (zero-padded to 128). One lane-pass either way on
            # the MXU; this orientation is what lets the combine + MLP1 stay
            # in-kernel with no sublane->lane merge.
            gt[0:R, :] = jax.lax.dot_general(
                win2, sup128[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (R, 128) s32
            # This kernel is VPU-PASS-bound, not MXU-bound (the f32
            # roll-based combine measured ~119 of 169 ms/level-iter), so the
            # combine is built to MINIMIZE full-slab passes:
            #  * quantization scale from the RAW volume, before combining —
            #    the bilinear combine is convex, so amax(g) >= amax(c):
            #    a safe (never-clipping) bound, at most ~1 bit coarser, and
            #    it lets the final lerp write int8 DIRECTLY (no second amax
            #    pass, no f32/bf16 c materialization);
            #  * the x+1 / y+1 taps are tail-padded SHIFTED READS of the
            #    s32/f32 scratches (rows r = t*64 + y*8 + x, so taps are
            #    row+1 / row+8), which fuse into the lerps — sublane
            #    pltpu.roll is 32-bit-only AND materializes its output;
            #  * the lerps are SEPARABLE (wx constant within a frame):
            #    two passes, not a 4-term combine.
            # Tail rows R..R+15 of both scratches are zeroed once (p == 0):
            # the shifted reads of the last frame land there, feeding only
            # the x==7 / y==7 rows whose MLP1 weights are zero — but they
            # must be FINITE.
            if os.environ.get("COTRACKER_MLP1_ABLATE") == "amax":
                # cost-attribution knob: constant scale — WRONG RESULTS
                s = 128.0
            else:
                s = jnp.maximum(
                    jnp.max(jnp.abs(gt[0:R, :]).astype(F32)), 1e-20
                ) * (1.0 / 127.0)
            # per-frame fractions as (R, 1) columns (scalar-broadcast
            # stores; Tp tiny writes beat 4*Tp sliced block combines)
            for t in range(Tp):
                wcol[pl.ds(t * 64, 64), 0:1] = jnp.full(
                    (64, 1), wxy_ref[i, t, 0], F32
                )
                wcol[pl.ds(t * 64, 64), 1:2] = jnp.full(
                    (64, 1), wxy_ref[i, t, 1], F32
                )
            wx = wcol[:, 0:1]
            wy = wcol[:, 1:2]
            if os.environ.get("COTRACKER_MLP1_ABLATE") == "combine":
                # cost-attribution knob: skip the two lerps — WRONG RESULTS
                c_all[i] = jnp.round(
                    gt[0:R, :].astype(F32) * (1.0 / s)
                ).astype(jnp.int8)
            else:
                a = gt[0:R, :].astype(F32)
                b = gt[1 : R + 1, :].astype(F32)
                gxs[0:R, :] = a + wx * (b - a)
                gx0 = gxs[0:R, :]
                gx8 = gxs[8 : R + 8, :]
                c_all[i] = jnp.round(
                    (gx0 + wy * (gx8 - gx0)) * (1.0 / s)
                ).astype(jnp.int8)
            scales.append(s * supsc_ref[i, 0, 0])
        # ONE MLP1 matmul for all PP*Tp (point, frame) rows: the staged
        # (PP, Tp*64, 128) int8 volume's (PP*Tp, 8192) view is a free
        # (., a, 128)->(., a*128) lane merge (round-5 hardware probe — the
        # round-1 "sublane<->lane merge wall" never applied to this pattern)
        M = PP * Tp
        cq = c_all[...].reshape(M, WIN * WIN * 128)
        if os.environ.get("COTRACKER_MLP1_ABLATE") == "dot":
            # cost-attribution knob (scripts/bench_corr_mlp1_ablate.py):
            # stand in a K=128 dot for the K=8192 one — WRONG RESULTS
            h32 = jax.lax.dot_general(
                cq[:, :128], w1q_ref[0:128, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        else:
            h32 = jax.lax.dot_general(
                cq, w1q_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (M, Dh)
        hf = h32.astype(F32) * wc_ref[0:1, :]
        for i in range(PP):
            out_ref[i] = (
                hf[i * Tp : (i + 1) * Tp] * scales[i] + wc_ref[1:2, :]
            ).astype(out_dtype)
        return
    for i in range(PP):
        # wait for point i's windows. The copies were issued from the same
        # starts values (step p-1's starts_nxt == step p's starts_cur), so
        # reconstructing them here waits on identical transfers.
        for t in range(Tp):
            dma(slot, i, t, starts_cur_ref).wait()

        # flatten the window slab; both layouts merge an outer dim with a
        # full 8-sublane tile, which is a free shape cast:
        #   plain:        (WIN, Tp*WIN, C) -> rows r = y*(Tp*WIN) + t*WIN + x
        #   fuse_combine: (Tp*WIN, WIN, C) -> rows r = t*WIN*WIN + y*WIN + x
        win2 = win[slot, i].reshape(WIN * Tp * WIN, C)
        # transposed contraction: the long window axis lands on LANES of the
        # output, so the (NP, S, R) result tiles without padding — the
        # natural (R, S) orientation pads S=49 lanes to 128 and writes 2.6x
        # the bytes. MXU efficiency is identical (the 49/128 under-fill just
        # moves to M). Quantized path: both operands int8 -> native
        # s8 x s8 -> s32 MXU dot (no VPU convert of the window slab);
        # dequant scales live in the epilogue.
        g = jax.lax.dot_general(
            sup_ref[i], win2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if g_int8 else F32,
        )  # (S, WIN*Tp*WIN)
        if fuse_combine:
            # exact bilinear combine, lanes (t, y, x): the value at lane r
            # combines taps r, r+1 (x+1), r+8 (y+1) and r+9 — one (wx, wy)
            # per frame thanks to the shared-fraction identity (module
            # docstring). The combine is linear in g, so the quant path's
            # dequant scales stay exactly where they are today (per-point
            # output scale below, support scale folded by the wrapper
            # epilogue).
            g = g.astype(F32)
            # lane-broadcast the per-frame scalar fractions: wv rows
            # [wx; wy], 64 lanes per frame
            for t in range(Tp):
                wv[0:1, pl.ds(t * WIN * WIN, WIN * WIN)] = jnp.full(
                    (1, WIN * WIN), wxy_ref[i, t, 0], F32
                )
                wv[1:2, pl.ds(t * WIN * WIN, WIN * WIN)] = jnp.full(
                    (1, WIN * WIN), wxy_ref[i, t, 1], F32
                )
            wx = wv[0:1, :]
            wy = wv[1:2, :]
            R_ = g.shape[1]
            # pltpu.roll wants non-negative shifts; roll by R-k == roll -k
            g01 = pltpu.roll(g, R_ - 1, 1)
            g10 = pltpu.roll(g, R_ - WIN, 1)
            g11 = pltpu.roll(g, R_ - (WIN + 1), 1)
            gx = g + wx * (g01 - g)  # = (1-wx)*g + wx*g01
            gx1 = g10 + wx * (g11 - g10)
            c = gx + wy * (gx1 - gx)
            if g_int8:
                scale = jnp.maximum(jnp.max(jnp.abs(c)), 1e-20) * (1.0 / 127.0)
                scale_ref[0, p * PP + i] = scale
                out_ref[i] = jnp.round(c * (1.0 / scale)).astype(jnp.int8)
            else:
                out_ref[i] = c.astype(out_dtype)
        elif g_int8:
            g = g.astype(F32)
            # per-point dynamic quantization of the correlation volume:
            # halves the g write here AND the epilogue's read. For
            # L2-normalized features |g| <= 1 (Cauchy-Schwarz), so the
            # relative step is ~1/254 of the per-point max — the same order
            # as bf16 rounding.
            scale = jnp.maximum(jnp.max(jnp.abs(g)), 1e-20) * (1.0 / 127.0)
            scale_ref[0, p * PP + i] = scale
            out_ref[i] = jnp.round(g * (1.0 / scale)).astype(jnp.int8)
        else:
            out_ref[i] = g.astype(out_dtype)


def _corr_level_plan(
    fmaps,
    support,
    coords,
    w1,
    b1,
    radius: int = 3,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    prepacked: bool = False,
    track_major: bool = False,
    quant_int8: bool = False,
    fuse_combine: bool = False,
    fuse_mlp1: bool = False,
):
    """Prepare one pyramid level's per-point operands and its chunk body.

    Returns (ops, hidden): `ops` is a tuple of (B, N, ...) arrays whose N
    axis the caller may chunk; `hidden(*ops_chunk)` runs the Pallas window
    kernel + the first correlation-MLP layer + GELU for those points,
    returning h as (B, n, T, Dh) [track_major] or (B, T, n, Dh). The second
    MLP layer stays with the caller: fused_corr_embs_pallas applies the
    plain (w2, b2); fused_corr_tokens_pallas applies a per-level FOLDED
    projection and sums levels inside one chunk loop.
    """
    P = 2 * radius + 1
    WIN = P + 1
    S = P * P
    pad = 2 * radius + 2
    shifts = _shift_count(quant_int8)

    B, T, N = coords.shape[:3]
    if prepacked:
        _, Hp, Wp, C = fmaps.shape
        H, W = Hp - 2 * pad, Wp - 2 * pad
        fmaps_p = fmaps if quant_int8 else fmaps.astype(compute_dtype)
    else:
        B, T, H, W, C = fmaps.shape
        fmaps_p = build_shifted_fmaps(fmaps, radius, compute_dtype, quant_int8=quant_int8)
        Hp, Wp = H + 2 * pad, W + 2 * pad
    # support arrives either as a bf16 (B, N, S, C) array (quantized PER
    # CHUNK inside hidden() — the safe default at quasi-dense N, where any
    # full-size staging of the quantize is a 0.4-1.65 GB temp per level and
    # XLA's fusion choices around the (B,S,N,C)->(B,N,S,C) relayout made
    # several of them live at once, the round-2 16 GB OOM driver) or as a
    # PRE-QUANTIZED (int8 (B, N, S, C), scale (B, N)) pair hoisted out of
    # the iteration scan by CoTrackerThree.iterate at moderate N — support
    # is iteration-invariant, so the per-iter re-quantize (amax + round per
    # chunk, ~25 ms/forward at the bench shape) is pure waste there.
    # third form at large N: (bf16 support, f32 (B, N) amax) — the amax
    # REDUCTION hoisted out of the scan (it re-read the full support every
    # iteration, ~116 ms/step at quasi-dense N) while the int8 round stays
    # in-chunk so no full-N int8 staging exists
    pre_quant = isinstance(support, tuple) and support[0].dtype == jnp.int8
    pre_amax = isinstance(support, tuple) and not pre_quant
    if quant_int8:
        assert fmaps_p.dtype == jnp.int8, fmaps_p.dtype
        if not (pre_quant or pre_amax):
            support = support.astype(compute_dtype)
    else:
        assert not isinstance(support, tuple)
    # compute the per-(point, frame) fields TRACK-major from the start: the
    # transpose rides the tiny (B, T, N, 2) coords tensor instead of the
    # stacked int starts — frame-major construction left the (B, N, Tp, 3)
    # starts (and the wx/wy fractions) with an N-minor layout that cost a
    # relayout copy PER CHUNK inside the scan (~38 ms/forward at the bench
    # shape: trace ops copy.941/.949)
    coords_nt = coords.transpose(0, 2, 1, 3)  # (B, N, T, 2)
    wsx, wsy, wx, wy = window_starts_and_weights(coords_nt, radius, H, W)  # (B, N, T)

    # per-(point, frame) DMA descriptors: flat (shift-copy, frame) index +
    # aligned window origin. Copy m = wsx % K at aligned start K*(wsx // K)
    # reproduces the exact unaligned window.
    m = jnp.bitwise_and(wsx, shifts - 1)
    sxK = wsx - m
    ft = (
        m * (B * T)
        + jnp.broadcast_to(
            (jnp.arange(B, dtype=jnp.int32) * T)[:, None, None]
            + jnp.arange(T, dtype=jnp.int32)[None, None, :],
            (B, N, T),
        )
    )
    starts = jnp.stack([ft, wsy, sxK], axis=-1)  # (B, N, T, 3)
    Tp = T + (T % 2)  # even T so (WIN, Tp*WIN, C) merges are tile-trivial
    if Tp != T:
        starts = jnp.concatenate([starts, starts[:, :, -1:]], axis=2)

    cd = compute_dtype
    if pre_quant or pre_amax:
        sup, sup_scale = support  # (B, N, S, C) int8|bf16, f32 (B, N)
        if pre_amax:
            sup = sup.astype(cd)
    else:
        sup, sup_scale = support.astype(cd), None  # (B, N, S, C)
    wxn = wx  # (B, N, T)
    wyn = wy
    w1r = w1.reshape(P, P, S, -1).astype(cd)  # (i, j, s, Dh): d = i*P*S + j*S + s
    R = WIN * Tp * WIN
    fmh = fmaps_p  # (8*B*T, Hp, Wp, C)

    SP = 56  # fuse_mlp1 support rows: S=49 padded to whole sublane tiles so
    #          the in-kernel sup128[0:SP] copy is tile-aligned (zero rows
    #          contribute exactly 0 to the s8 contraction)
    if fuse_mlp1:
        assert quant_int8, "fuse_mlp1 rides the int8 window/support path"
        fuse_combine = False  # superseded: combine happens in-kernel, row-wise
        Dh = w1.shape[-1]
        # MLP1 weight in the kernel's merged-lane order K = w*128 + s with
        # w = y*WIN + x: zero rows at s >= S and at the x==P / y==P combine
        # junk, quantized per output channel (same construction as the
        # fuse_combine epilogue's w1q — integer results are identical)
        w1f = jnp.zeros((WIN, WIN, 128, Dh), F32)
        w1f = w1f.at[:P, :P, :S].set(
            w1.astype(F32).reshape(P, P, S, Dh).transpose(1, 0, 2, 3)
        )
        w1amax_m = jnp.maximum(jnp.max(jnp.abs(w1f), axis=(0, 1, 2)), 1e-20)
        w1q_m = jnp.round(w1f * (127.0 / w1amax_m)).astype(jnp.int8)
        w1q_m = w1q_m.reshape(WIN * WIN * 128, Dh)
        wconst_m = jnp.stack([w1amax_m * (1.0 / 127.0), b1.astype(F32)])  # (2, Dh)

    # points per grid step: amortize the per-point fixed costs (DMA
    # issue/wait chain, descriptor reads, dot setup, output store) at short
    # windows, where they dominate — T=16 measured ~109 ns/point-frame vs
    # ~53 at T=60 with PP=1. VMEM cost is 2*PP window slabs (~262 KB each
    # at T=16 int8), so deep batching is cheap exactly where it is needed.
    # Round-4 sweep on hardware (scripts/bench_corr_pp.py, shared sems):
    # T=16/N=70656 level-iter 135.5 ms @PP=8, 134.1 @PP=16, PP=32 fails to
    # compile (VMEM: 2*32 window slabs + double-buffered out block). The
    # per-point fixed-cost lever is exhausted at PP=16.
    if _FORCE_PP is not None:
        PP = _FORCE_PP
    elif fuse_mlp1:
        # fill the in-kernel MLP1 dot's M = PP*Tp rows to ~two 128-row MXU
        # passes and deepen the DMA pipeline; powers of two keep the chunked
        # NP divisible. VMEM (PP=16, T=16): 4.2 MB windows + 2 MB int8
        # volume + 3 MB MLP1 weight + transients — fits the 16 MB stack.
        PP = 1
        while PP * 2 * Tp <= 256 and PP < 16:
            PP *= 2
    else:
        # dtype-aware cap: the double-buffered window slabs cost
        # 2 * PP * Tp*WIN*WIN*C * esize of scoped VMEM — the round-4 PP=16
        # policy implicitly assumed INT8 windows (262 KB/pt at T=16); the
        # f32 training path at the same PP is 4x that and OOMs the 16 MB
        # stack (found by scripts/soak_train.py: the trainer's
        # use_pallas_corr model had never run on hardware)
        esize = 1 if quant_int8 else jnp.dtype(cd).itemsize
        cap = max(1, 4_500_000 // (2 * Tp * WIN * WIN * C * esize))
        want = 16 if Tp <= 16 else (4 if Tp <= 32 else 1)
        PP = 1
        while PP * 2 <= min(want, cap):
            PP *= 2
    kernel = functools.partial(
        _kernel, Tp=Tp, WIN=WIN, C=C, S=S, out_dtype=cd,
        shifts=shifts, compute_dtype=cd, g_int8=quant_int8,
        fuse_combine=fuse_combine, fuse_mlp1=fuse_mlp1, SP=SP,
    )
    lhs = "bntk" if track_major else "btnk"

    def hidden(starts_c, sup_c, *rest):
        # starts_c (B, n, Tp, 3); sup_c (B, n, S, C); wx_c/wy_c (B, n, T);
        # with pre-quantized / pre-amax support, rest additionally leads
        # with the per-point (B, n) scale|amax
        if pre_quant:
            sup_scale_c, wx_c, wy_c = rest
        elif pre_amax:
            amax_c, wx_c, wy_c = rest
            sup_scale_c = amax_c * (1.0 / 127.0 / 128.0)
            sup_c = jnp.round(
                sup_c.astype(F32) * (127.0 / amax_c[..., None, None])
            ).astype(jnp.int8)
        else:
            sup_scale_c = None
            wx_c, wy_c = rest
        n = starts_c.shape[1]
        NP = B * n
        if quant_int8 and not (pre_quant or pre_amax):
            # per-point dynamic support quantization, in-chunk (see prep
            # comment): the contraction runs natively s8 x s8 -> s32 on the
            # MXU; the 1/128 window scale and this per-point scale both fold
            # into the epilogue dequant. |x| and max of bf16 values are
            # exact, so the REDUCTION loses nothing in the source dtype —
            # but on the fast path sup_c itself was staged through bf16
            # (track_feat_pyramid casts to model dtype before chunking, the
            # memory win that unlocked quasi-dense N), so the int8 quantize
            # double-rounds f32->bf16->int8: up to ~2^-9 relative on top of
            # int8's ~1/254. Same order as the bf16 path's own noise; folded
            # into the documented random-weight drift figure.
            amax = jnp.maximum(
                jnp.max(jnp.abs(sup_c), axis=(2, 3)).astype(F32), 1e-20
            )  # (B, n)
            sup_scale_c = amax * (1.0 / 127.0 / 128.0)
            sup_c = jnp.round(
                sup_c.astype(F32) * (127.0 / amax[..., None, None])
            ).astype(jnp.int8)
        pp = PP if NP % PP == 0 else 1
        NB = NP // pp
        kern = functools.partial(kernel, PP=pp)
        if fuse_mlp1:
            sup_c = jnp.pad(sup_c, ((0, 0), (0, 0), (0, SP - S), (0, 0)))
            Dh = w1q_m.shape[-1]
            out_shape = jax.ShapeDtypeStruct((NP, Tp, Dh), cd)
            out_specs = pl.BlockSpec(
                (pp, Tp, Dh), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
            )
        elif quant_int8:
            out_shape = [
                jax.ShapeDtypeStruct((NP, S, R), jnp.int8),
                jax.ShapeDtypeStruct((1, NP), jnp.float32),
            ]
            out_specs = [
                pl.BlockSpec((pp, S, R), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NP), lambda p: (0, 0), memory_space=pltpu.SMEM),
            ]
        else:
            out_shape = jax.ShapeDtypeStruct((NP, S, R), cd)
            out_specs = pl.BlockSpec(
                (pp, S, R), lambda p: (p, 0, 0), memory_space=pltpu.VMEM
            )
        Srows = SP if fuse_mlp1 else S
        in_specs = [
            pl.BlockSpec((pp, Tp, 3), lambda p: (p, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (pp, Tp, 3),
                lambda p: (jnp.minimum(p + 1, NB - 1), 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((pp, Srows, C), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # fmaps stay in HBM
        ]
        operands = [
            starts_c.reshape(NP, Tp, 3),
            starts_c.reshape(NP, Tp, 3),
            sup_c.reshape(NP, Srows, C),
            fmh,
        ]
        if fuse_combine or fuse_mlp1:
            # per-frame bilinear fractions, tiny SMEM payload; the kernel
            # lane-broadcasts them into a VMEM scratch
            wxy = jnp.stack(
                [
                    jnp.pad(wx_c, ((0, 0), (0, 0), (0, Tp - T))),
                    jnp.pad(wy_c, ((0, 0), (0, 0), (0, Tp - T))),
                ],
                axis=-1,
            ).reshape(NP, Tp, 2).astype(jnp.float32)
            operands.append(wxy)
            in_specs.append(
                pl.BlockSpec((pp, Tp, 2), lambda p: (p, 0, 0), memory_space=pltpu.SMEM)
            )
        if fuse_mlp1:
            # 3D so the block's LAST TWO dims equal the array's (the 2D
            # (pp, 1) form needs pp % 8 == 0, which the T=60 PP=4 breaks)
            operands += [
                sup_scale_c.reshape(NP, 1, 1).astype(jnp.float32),
                w1q_m,
                wconst_m,
            ]
            in_specs += [
                pl.BlockSpec(
                    (pp, 1, 1), lambda p: (p, 0, 0), memory_space=pltpu.SMEM
                ),
                pl.BlockSpec(
                    (WIN * WIN * 128, w1q_m.shape[-1]),
                    lambda p: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (2, wconst_m.shape[-1]), lambda p: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
        win_shape = (
            (2, pp, Tp * WIN, WIN, C)
            if (fuse_combine or fuse_mlp1)
            else (2, pp, WIN, Tp * WIN, C)
        )
        scratch = [
            pltpu.VMEM(win_shape, jnp.int8 if quant_int8 else cd),
            pltpu.SemaphoreType.DMA((2, pp)),
        ]
        if fuse_combine:
            scratch.append(pltpu.VMEM((2, R), jnp.float32))
        if fuse_mlp1:
            scratch += [
                pltpu.VMEM((128, C), jnp.int8),          # zero-padded support
                pltpu.VMEM((R, 2), F32),                 # per-row combine fracs
                pltpu.VMEM((R + 16, 128), jnp.int32),    # raw volume + tail
                pltpu.VMEM((R + 16, 128), F32),          # x-lerped + tail
                pltpu.VMEM((pp, R, 128), jnp.int8),      # combined int8 volume
            ]
        g = pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid=(NB,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*operands)
        if fuse_mlp1:
            # kernel emitted MLP1(combined volume) + bias, dequantized, per
            # (point, frame) row; only GELU (exact erf) stays in XLA
            h = g.reshape(B, n, Tp, Dh)[:, :, :T]
            if not track_major:
                h = h.transpose(0, 2, 1, 3)
            return jax.nn.gelu(h, approximate=False)
        gscale = None
        if quant_int8:
            g, gscale = g
            gscale = gscale.reshape(B, n)  # (1, NP) row-major == (B, n)
            gscale = gscale * sup_scale_c

        if fuse_combine:
            # kernel already emitted the exact combined volume; lanes
            # r = t*64 + y*8 + x with garbage at x==7 / y==7 (roll wrap)
            # and t >= T (frame padding).
            if gscale is not None:
                # int8 volume -> native s8 x s8 -> s32 MLP1: instead of
                # slicing the garbage lanes (a strided minor-dim read XLA
                # pays a relayout copy for), pad W1 to the full (8, 8, S)
                # window with zeros at x==7 / y==7 — the garbage contributes
                # exactly 0 in integer math — and quantize it per output
                # channel. Dequant (per-point volume scale x per-channel
                # weight scale) rides the f32 bias add.
                c = g.reshape(B, n, S, Tp, WIN, WIN)
                w1p = jnp.zeros((WIN, WIN, S, w1r.shape[-1]), F32)
                w1p = w1p.at[:P, :P].set(w1r.astype(F32))
                w1amax = jnp.maximum(jnp.max(jnp.abs(w1p), axis=(0, 1, 2)), 1e-20)
                w1q = jnp.round(w1p * (127.0 / w1amax)).astype(jnp.int8)
                h32 = jnp.einsum(
                    f"bnstji,ijsk->{lhs}", c, w1q,
                    preferred_element_type=jnp.int32,
                )  # t axis is Tp (padded) here
                sc = (
                    gscale[:, :, None, None]
                    if track_major
                    else gscale[:, None, :, None]
                )
                h = h32.astype(F32) * (sc * (w1amax * (1.0 / 127.0)))
                h = (
                    h[:, :, :T] if track_major else h[:, :T]
                )  # drop frame padding (major dim, cheap)
            else:
                c = g.reshape(B, n, S, Tp, WIN, WIN)[:, :, :, :T, :P, :P]
                h = jnp.einsum(
                    f"bnstji,ijsk->{lhs}", c, w1r, preferred_element_type=F32
                )
            h = h.astype(cd) + b1.astype(cd)
            return jax.nn.gelu(h, approximate=False)

        # XLA epilogue: bilinear combine (4 weighted slice-adds) + corr MLP.
        # g lanes index r = a*(Tp*WIN) + t*WIN + b with a=y, b=x.
        g = g.reshape(B, n, S, WIN, Tp, WIN)[:, :, :, :, :T]  # (B,n,S,y,T,x)
        wxb = wx_c[:, :, None, None, :, None].astype(cd)  # (B,n,1,1,T,1)
        wyb = wy_c[:, :, None, None, :, None].astype(cd)
        oyb, oxb = 1 - wyb, 1 - wxb
        if gscale is not None:
            # fold the per-point dequant scale into the y-weight pair (every
            # combine term carries exactly one of wy/(1-wy)); the int8 g
            # converts to bf16 inside the fused einsum read
            sc = gscale.astype(cd)[:, :, None, None, None, None]
            wyb = wyb * sc
            oyb = oyb * sc
        a0 = g[:, :, :, :P, :, :P]
        a1 = g[:, :, :, :P, :, 1:]
        c0 = g[:, :, :, 1:, :, :P]
        c1 = g[:, :, :, 1:, :, 1:]
        corr = (
            oyb * oxb * a0
            + oyb * wxb * a1
            + wyb * oxb * c0
            + wyb * wxb * c1
        )  # (B, n, S, j(y), T, i(x))
        h = jnp.einsum(
            f"bnsjti,ijsk->{lhs}", corr, w1r, preferred_element_type=F32
        ).astype(cd) + b1.astype(cd)
        return jax.nn.gelu(h, approximate=False)

    if pre_quant or pre_amax:
        return (starts, sup, sup_scale, wxn, wyn), hidden
    return (starts, sup, wxn, wyn), hidden


def _chunked_over_points(run, ops, B, N, chunk, track_major, flat_rows=False):
    """Chunked driver over N. run(ops_chunk_tuple) -> (B, n, T, Do)
    [track_major] or (B, T, n, Do); assembles the full-N result.

    Implemented as a fori_loop with dynamic_slice reads on the ops' N axis
    and dynamic_update_slice writes into the output — NOT lax.map: mapping
    requires (K, B, chunk, ...) pre-split operands and stacks (K, ...)
    outputs, and those reshape-transposes are real HBM copies that re-run
    EVERY scan iteration for iteration-invariant operands like the support
    patches (~9 ms/level-iter on v5e, ~220 ms of the bench forward).

    flat_rows (track_major only): accumulate into a FLAT (B, N*T, Do)
    carry, reshaping each (B, n, T, Do) piece to rows first. The 4D carry's
    layout is propagated from the conv-lowered MLP1 fusions' t-major pieces,
    so every downstream track-major consumer (the updateformer time block)
    paid a full relayout copy + materialized reshape of the token tensor
    (copy.929 + reshape.3737, ~18 ms/forward at the bench shape); the flat
    carry pins row-major (n, t) order and moves the (cheaper, in-fusion)
    transpose onto the chunk pieces."""
    if chunk is None or chunk >= N:
        return run(ops)

    K = -(-N // chunk)
    padn = K * chunk - N
    if padn:
        pad_n = lambda a: jnp.pad(a, ((0, 0), (0, padn)) + ((0, 0),) * (a.ndim - 2))
        ops = tuple(map(pad_n, ops))

    take = lambda a, k: jax.lax.dynamic_slice_in_dim(a, k * chunk, chunk, axis=1)
    shape = jax.eval_shape(run, tuple(take(a, 0) for a in ops))
    n_axis = 1 if track_major else 2

    if flat_rows:
        assert track_major
        _, _, T_, Do = shape.shape
        out0 = jnp.zeros((B, K * chunk * T_, Do), shape.dtype)

        def body_flat(k, acc):
            r = run(tuple(take(a, k) for a in ops)).reshape(B, chunk * T_, Do)
            return jax.lax.dynamic_update_slice(acc, r, (0, k * chunk * T_, 0))

        out = jax.lax.fori_loop(0, K, body_flat, out0)
        return out.reshape(B, K * chunk, T_, Do)[:, :N]

    full = list(shape.shape)
    full[n_axis] = K * chunk
    out0 = jnp.zeros(full, shape.dtype)

    def body(k, acc):
        r = run(tuple(take(a, k) for a in ops))
        start = [0] * len(full)
        start[n_axis] = k * chunk
        return jax.lax.dynamic_update_slice(acc, r, tuple(start))

    out = jax.lax.fori_loop(0, K, body, out0)
    return out[:, :N] if track_major else out[:, :, :N]


def fused_corr_embs_pallas(
    fmaps,
    support,
    coords,
    w1,
    b1,
    w2,
    b2,
    radius: int = 3,
    chunk=None,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    prepacked: bool = False,
    track_major: bool = False,
    quant_int8: bool = False,
    fuse_combine: bool = False,
    fuse_mlp1: bool = False,
):
    """Same contract as ops.corr.fused_corr_embs, hot path as a Pallas kernel.

    fmaps (B, T, H, W, C) — or, with prepacked=True, the output of
    build_shifted_fmaps (K*B*T, H+2p, W+2p, C), letting callers hoist the
    padded-copies build out of an update-iteration scan.
    support (B, N, P*P, C); coords (B, T, N, 2); chunk bounds the transient
    (n, 49, 8*T*8) correlation block over N. Returns (B, T, N, Do), or
    (B, N, T, Do) with track_major=True (the layout rides the MLP einsum).

    quant_int8: window data moves through HBM as int8 (see
    build_shifted_fmaps) — halves the scattered-DMA bytes that bound this
    kernel. Windows carry clip(round(f*128), -127, 127); the exact 1/128
    dequant scale is folded into the support operand before the contraction.
    """
    B, _, N = coords.shape[:3]
    cd = compute_dtype
    lhs = "bntk" if track_major else "btnk"
    out_sub = "bnto" if track_major else "btno"
    ops, hidden = _corr_level_plan(
        fmaps, support, coords, w1, b1, radius=radius,
        compute_dtype=compute_dtype, interpret=interpret, prepacked=prepacked,
        track_major=track_major, quant_int8=quant_int8,
        fuse_combine=fuse_combine, fuse_mlp1=_mlp1_env(fuse_mlp1),
    )

    def run(ops_chunk):
        h = hidden(*ops_chunk)
        return jnp.einsum(
            f"{lhs},ko->{out_sub}", h, w2.astype(cd),
            preferred_element_type=F32,
        ).astype(cd) + b2.astype(cd)

    return _chunked_over_points(run, ops, B, N, chunk, track_major)


def fused_corr_tokens_pallas(
    packed_list,
    support_list,
    coords,
    w1,
    b1,
    w2f_list,
    b2f_sum,
    radius: int = 3,
    chunk=None,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    quant_int8: bool = False,
    fuse_combine: bool = False,
    fuse_mlp1: bool = False,
    extra_ops=(),
    extra_fn=None,
):
    """All-levels fused correlation -> TOKEN contributions, one chunk loop.

    The fold_input_proj fast path (models/cotracker3.py IterationCore): for
    each pyramid level i, run the window kernel + MLP1 + GELU, then apply the
    FOLDED second layer w2f_i = w2 @ Win[corr rows of level i] — emitting the
    level's (B, n, T, Dtok) updateformer-token contribution directly — and
    accumulate across levels INSIDE the per-chunk body, so per-level
    embeddings never materialize at full N in HBM (at the bench shape that
    traffic plus the 1024/1110-d concats and the 1110-wide projection pass
    was ~5 GB per iteration).

    packed_list/support_list: per level, prepacked fmaps from
    build_shifted_fmaps and (B, N, S, C) support. coords in LEVEL-0 units
    (level i uses coords / 2^i). b2f_sum: (Dtok,) — sum over levels of
    b2 @ Win_slice (added once). extra_ops: tuple of (B, N, ...) arrays
    chunked alongside; extra_fn(*extra_chunk) -> (B, n, T, Dtok) returns the
    non-correlation token terms (vis/conf rank-1, rel-emb, time embedding,
    input bias) computed per chunk so they fuse into the accumulation.
    Output: (B, N, T, Dtok) tokens, track-major, compute dtype.
    """
    B, _, N = coords.shape[:3]
    cd = compute_dtype
    fuse_mlp1 = _mlp1_env(fuse_mlp1)
    plans = []
    for i, (packed, support) in enumerate(zip(packed_list, support_list)):
        ops_i, hidden_i = _corr_level_plan(
            packed, support, coords / (2.0**i), w1, b1, radius=radius,
            compute_dtype=compute_dtype, interpret=interpret, prepacked=True,
            track_major=True, quant_int8=quant_int8, fuse_combine=fuse_combine,
            fuse_mlp1=fuse_mlp1,
        )
        plans.append((ops_i, hidden_i))

    n_level_ops = len(plans[0][0])
    ops = tuple(op for ops_i, _ in plans for op in ops_i) + tuple(extra_ops)

    def run(ops_chunk):
        acc = None
        for li, (_, hidden_i) in enumerate(plans):
            h = hidden_i(*ops_chunk[li * n_level_ops : (li + 1) * n_level_ops])
            contrib = jnp.einsum(
                "bntk,ko->bnto", h, w2f_list[li].astype(cd),
                preferred_element_type=F32,
            )
            acc = contrib if acc is None else acc + contrib
        if extra_fn is not None:
            acc = acc + extra_fn(*ops_chunk[len(plans) * n_level_ops :])
        return (acc + b2f_sum).astype(cd)

    # A/B knob, measured OFF-better on v5e (bench 240.8k vs 251.3k pf/s):
    # pinning row-major (n, t) pieces forces a per-chunk transpose inside
    # the conv-lowered epilogue chain that costs ~6x the downstream
    # copy.929+reshape it eliminates. Kept for chips where the tradeoff
    # flips; see BASELINE.md round-4 notes.
    flat = bool(os.environ.get("CORR_FLAT_ACC"))
    return _chunked_over_points(
        run, ops, B, N, chunk, track_major=True, flat_rows=flat
    )


@functools.lru_cache(maxsize=None)
def _trainable_corr(radius, chunk, compute_dtype, track_major, quant_int8,
                    interpret):
    """custom_vjp closure for fused_corr_embs_pallas_trainable, cached so the
    primitive identity is stable across traces (jit cache friendliness)."""
    from cotracker_tpu.ops.corr import fused_corr_embs

    @jax.custom_vjp
    def f(packed, fmaps, support, coords, w1, b1, w2, b2):
        del fmaps  # gradient channel only; forward reads the prepacked copies
        return fused_corr_embs_pallas(
            packed, support, coords, w1, b1, w2, b2, radius=radius,
            chunk=chunk, compute_dtype=compute_dtype, interpret=interpret,
            prepacked=True, track_major=track_major, quant_int8=quant_int8,
        )

    def fwd(packed, fmaps, support, coords, w1, b1, w2, b2):
        out = f(packed, fmaps, support, coords, w1, b1, w2, b2)
        # `packed` rides the residuals only to give bwd its aval — it aliases
        # the hoisted prepack buffer, no extra memory
        return out, (packed, fmaps, support, coords, w1, b1, w2, b2)

    def bwd(res, ct):
        packed, fmaps, support, coords, w1, b1, w2, b2 = res
        _, vjp = jax.vjp(
            lambda fm, sp, co, a1, a2, a3, a4: fused_corr_embs(
                fm, sp, co, a1, a2, a3, a4, radius=radius, chunk=chunk,
                compute_dtype=compute_dtype, track_major=track_major,
            ),
            fmaps, support, coords, w1, b1, w2, b2,
        )
        grads = vjp(ct)
        # the prepacked operand is forward-only: its gradient channel is the
        # raw fmaps operand (a broadcast-zero cotangent XLA folds away)
        return (jnp.zeros(packed.shape, packed.dtype),) + grads

    f.defvjp(fwd, bwd)
    return f


def fused_corr_embs_pallas_trainable(
    packed,
    fmaps,
    support,
    coords,
    w1,
    b1,
    w2,
    b2,
    radius: int = 3,
    chunk=None,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
    track_major: bool = False,
    quant_int8: bool = False,
):
    """Differentiable fused_corr_embs_pallas: Pallas kernel forward, XLA
    backward.

    `packed` is build_shifted_fmaps(fmaps, radius) — kept a separate operand
    so callers can hoist the prepack out of the update-iteration scan;
    `fmaps` is the corresponding RAW (B, T, H, W, C) map, used only as the
    gradient channel. The backward pass is the exact jax.vjp of the XLA
    formulation (ops/corr.py fused_corr_embs) evaluated at the same primals:
    under jax.checkpoint/remat training this is the recompute that would run
    anyway, minus the 2.5x-slower XLA forward. With quant_int8 the forward is
    quantized while the backward stays full-precision — a straight-through
    estimator (the quantization error is ~1/254 of the per-point volume max,
    see build_shifted_fmaps).

    Gradients flow to fmaps (the encoder), support (via feature sampling) and
    the MLP params; coords gradients exist but the model detaches coords at
    each iteration top (reference cotracker3_online.py:188), matching the
    reference's training signal.
    """
    fn = _trainable_corr(
        radius, chunk, compute_dtype, track_major, quant_int8, interpret
    )
    return fn(packed, fmaps, support, coords, w1, b1, w2, b2)
