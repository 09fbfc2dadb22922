"""Dispatch-free microbenchmarks: ops timed inside a fori_loop in ONE jit.

The axon remote-dispatch round trip inflates single-op timings by ~30 ms,
which fogs every standalone component number (see BASELINE.md). Here each op
runs `reps` times inside one compiled loop with a scalar data dependence
chaining iterations (so XLA can neither hoist nor overlap them), giving true
per-op times. Run on the real TPU: `python scripts/ubench.py [section ...]`.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_loop(step, x0, reps=8):
    """step: x -> x (same structure). Returns seconds per step."""

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, reps, lambda i, a: step(a), x)

    r = loop(x0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    jax.block_until_ready(loop(x0))
    return (time.perf_counter() - t0) / reps


def chain(x, scalar):
    """Make iteration i+1 depend on iteration i through a ~no-op scalar.

    1e-30 (not 0.0) so XLA's algebraic simplifier cannot fold the term away;
    the product rounds to exactly 1.0 in bf16/f32."""
    return x * (1.0 + 1e-30 * scalar.astype(jnp.float32)).astype(x.dtype)


def sec_peak_matmul(rng):
    n = 4096
    a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)).astype(jnp.bfloat16)

    def step(x):
        y = jax.lax.dot(x, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return chain(a, y[0, 0])

    t = time_loop(step, a, reps=16)
    fl = 2 * n**3
    print(f"peak bf16 matmul {n}^3: {t*1e3:7.2f} ms = {fl/t/1e12:6.1f} TF/s")


def sec_mlp_matmul(rng):
    M, K, N = 604_800, 384, 1536
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32)).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32)).astype(jnp.bfloat16)

    def step_one(x):
        y = jax.lax.dot(x, w1, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return chain(x, y[0, 0])

    t1 = time_loop(step_one, x)
    print(f"mlp fc1 ({M}x{K})@({K}x{N}): {t1*1e3:7.2f} ms = {2*M*K*N/t1/1e12:6.1f} TF/s")

    def step_mlp(x):
        h = jax.lax.dot(x, w1, preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h, approximate=True).astype(jnp.bfloat16)
        y = jax.lax.dot(h, w2, preferred_element_type=jnp.float32)
        return chain(x, y[0, 0])

    t2 = time_loop(step_mlp, x)
    print(f"mlp pair + gelu:            {t2*1e3:7.2f} ms = {4*M*K*N/t2/1e12:6.1f} TF/s")


def sec_int8_matmul(rng):
    """Is a W8A8 updateformer matmul worth it? Raw s8xs8->s32 MXU throughput
    vs bf16, and the full dynamic-quant step (absmax -> scale -> round/clip ->
    s8 dot -> dequant) that an activation-quantized MLP layer would pay."""
    M, K, N = 604_800, 384, 1536
    xf = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w8 = jnp.asarray(
        np.clip(np.round(rng.standard_normal((K, N)) * 40), -127, 127).astype(np.int8)
    )
    x8 = jnp.asarray(
        np.clip(np.round(rng.standard_normal((M, K)) * 40), -127, 127).astype(np.int8)
    )

    def step_raw(x):
        y = jax.lax.dot(x, w8, preferred_element_type=jnp.int32)
        return jnp.where(y[:1, :1] > jnp.int32(2**30), x ^ jnp.int8(1), x)

    t = time_loop(step_raw, x8)
    print(f"raw s8 ({M}x{K})@({K}x{N}):  {t*1e3:7.2f} ms = {2*M*K*N/t/1e12:6.1f} TOP/s")

    def step_w8a8(x):
        scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-20) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / scale).clip(-127, 127).astype(jnp.int8)
        y = jax.lax.dot(xq, w8, preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        return chain(x, y[0, 0])

    t2 = time_loop(step_w8a8, xf)
    print(f"w8a8 incl dyn act quant:     {t2*1e3:7.2f} ms = {2*M*K*N/t2/1e12:6.1f} TF/s-equiv")


def sec_int8_mlp(rng):
    """Full transformer-MLP block compare: bf16 (LN -> fc1 -> gelu -> fc2)
    vs W8A8 with PER-TOKEN dynamic activation scales fused into the
    producers (LN epilogue quantizes; gelu epilogue re-quantizes) — the
    layout an int8 updateformer would use."""
    M, K, N = 604_800, 384, 1536
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w1f = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    w2f = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    g1 = jnp.ones((K,), jnp.float32)

    def ln(v):
        m = jnp.mean(v, -1, keepdims=True)
        c = v - m
        return c * jax.lax.rsqrt(jnp.mean(c * c, -1, keepdims=True) + 1e-6)

    def step_bf16(x):
        h = ln(x.astype(jnp.float32)).astype(jnp.bfloat16)
        h = jax.lax.dot(h, w1f, preferred_element_type=jnp.float32)
        h = jax.nn.gelu(h, approximate=True).astype(jnp.bfloat16)
        y = jax.lax.dot(h, w2f, preferred_element_type=jnp.float32)
        return chain(x, y[0, 0])

    t = time_loop(step_bf16, x)
    print(f"bf16 ln+mlp block:           {t*1e3:7.2f} ms = {4*M*K*N/t/1e12:6.1f} TF/s")

    w1q = jnp.round(w1f.astype(jnp.float32) * (127.0 / 0.2)).clip(-127, 127).astype(jnp.int8)
    w2q = jnp.round(w2f.astype(jnp.float32) * (127.0 / 0.2)).clip(-127, 127).astype(jnp.int8)
    sw = jnp.float32(0.2 / 127.0)

    def quant_rows(v):
        s = jnp.maximum(jnp.max(jnp.abs(v), -1, keepdims=True), 1e-20) * (1 / 127.0)
        return jnp.round(v / s).astype(jnp.int8), s

    def step_w8a8(x):
        h = ln(x.astype(jnp.float32))
        hq, s0 = quant_rows(h)
        a = jax.lax.dot(hq, w1q, preferred_element_type=jnp.int32)
        a = jax.nn.gelu(a.astype(jnp.float32) * (s0 * sw), approximate=True)
        aq, s1 = quant_rows(a)
        y = jax.lax.dot(aq, w2q, preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32) * (s1 * sw)).astype(jnp.bfloat16)
        return chain(x, y[0, 0])

    t2 = time_loop(step_w8a8, x)
    print(f"w8a8 per-token fused:        {t2*1e3:7.2f} ms = {4*M*K*N/t2/1e12:6.1f} TF/s-equiv")


def sec_int8_pallas(rng):
    """The fused Pallas LN+W8A8 MLP block vs the bf16 XLA block (18.6 ms,
    sec_int8_mlp). Also the fused qkv-projection form."""
    from cotracker_tpu.ops.kernels.mlp_int8_pallas import (
        fused_ln_mlp_int8, fused_ln_dense_int8,
    )

    M, K, N = 604_800, 384, 1536
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32) * 0.05)
    b1 = jnp.zeros((N,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32) * 0.05)
    b2 = jnp.zeros((K,), jnp.float32)

    def step(x):
        y = fused_ln_mlp_int8(x, w1, b1, w2, b2)
        return chain(x, y[0, 0])

    t = time_loop(step, x)
    print(f"pallas ln+w8a8 mlp block:    {t*1e3:7.2f} ms = {4*M*K*N/t/1e12:6.1f} TF/s-equiv")

    wq = jnp.asarray(rng.standard_normal((K, 3 * K)).astype(np.float32) * 0.05)
    bq = jnp.zeros((3 * K,), jnp.float32)

    def step_qkv(x):
        y = fused_ln_dense_int8(x, wq, bq, ln=True)
        return chain(x, y[0, 0])

    t2 = time_loop(step_qkv, x)
    print(f"pallas ln+w8a8 qkv proj:     {t2*1e3:7.2f} ms = {2*M*K*3*K/t2/1e12:6.1f} TF/s-equiv")


def sec_stream(rng):
    n = 256 * 1024 * 1024 // 4  # 256 MB f32
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def step(x):
        return x * 1.0000001

    t = time_loop(step, x, reps=16)
    print(f"elementwise 256MB f32 (r+w): {t*1e3:7.2f} ms = {2*n*4/t/1e9:6.1f} GB/s")


def sec_corr(rng):
    """NOTE: over the axon remote-compile tunnel this section dies with a
    broken-pipe during compilation (fori_loop x lax.map x pallas payload too
    large for the tunnel). Works on a directly-attached TPU; for tunnel
    setups use scripts/bench_breakdown.py (standalone timings, ~29 ms
    dispatch inflation) and the in-forward deltas instead."""
    from cotracker_tpu.ops.kernels.corr_pallas import (
        fused_corr_embs_pallas, build_shifted_fmaps,
    )

    cd = jnp.bfloat16
    N, T, C = 10_048, 60, 128
    CH = 2048
    w1 = jnp.asarray(rng.standard_normal((2401, 384)).astype(np.float32) * 0.02)
    b1 = jnp.zeros((384,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((384, 256)).astype(np.float32) * 0.02)
    b2 = jnp.zeros((256,), jnp.float32)
    for lvl in (0, 3):
        h, w = 96 >> lvl, 128 >> lvl
        fm = jnp.asarray(rng.standard_normal((1, T, h, w, C)).astype(np.float32))
        fm = fm / jnp.linalg.norm(fm, axis=-1, keepdims=True)
        pre = jax.jit(lambda f: build_shifted_fmaps(f, 3, cd, quant_int8=True))(fm)
        sup = jnp.asarray(rng.standard_normal((1, N, 49, C)).astype(np.float32)).astype(cd)
        coords = jnp.asarray(
            np.stack([rng.random((1, T, N)) * (w - 1), rng.random((1, T, N)) * (h - 1)], -1)
            .astype(np.float32))

        def step(c):
            out = fused_corr_embs_pallas(
                pre, sup, c, w1, b1, w2, b2, radius=3, chunk=CH,
                compute_dtype=cd, prepacked=True, track_major=True,
                quant_int8=True,
            )
            return chain(c, out[0, 0, 0, 0])

        t = time_loop(step, coords, reps=4)
        print(f"corr level {lvl} ({h}x{w}) int8: {t*1e3:7.2f} ms/level-iter")


def sec_updateformer(rng):
    from cotracker_tpu.models.updateformer import EfficientUpdateFormer

    cd = jnp.bfloat16
    N, T = 10_240, 60
    uf = EfficientUpdateFormer(dtype=cd, use_pallas_attn=True, quant_int8=True)
    x = jnp.asarray(rng.standard_normal((1, N, T, 1110)).astype(np.float32)).astype(cd)
    p = jax.jit(uf.init)(jax.random.PRNGKey(0), x[:, :8])["params"]

    def step(x):
        y = uf.apply({"params": p}, x)
        return chain(x, y[0, 0, 0, 0])

    t = time_loop(step, x, reps=4)
    print(f"updateformer iter:          {t*1e3:7.2f} ms")

    def step_ns(x):
        y = uf.apply({"params": p}, x, add_space_attn=False)
        return chain(x, y[0, 0, 0, 0])

    t2 = time_loop(step_ns, x, reps=4)
    print(f"  time blocks only:         {t2*1e3:7.2f} ms (space rounds = {(t-t2)*1e3:.1f})")


def main():
    rng = np.random.default_rng(0)
    sections = sys.argv[1:] or ["peak", "mlp", "int8", "stream", "corr", "uf"]
    fns = {
        "peak": sec_peak_matmul, "mlp": sec_mlp_matmul, "int8": sec_int8_matmul,
        "int8mlp": sec_int8_mlp, "int8pallas": sec_int8_pallas, "stream": sec_stream, "corr": sec_corr,
        "uf": sec_updateformer,
    }
    for s in sections:
        fns[s](rng)


if __name__ == "__main__":
    main()
