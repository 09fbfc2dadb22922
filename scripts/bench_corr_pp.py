"""Corr kernel points-per-step A/B at the short-window (quasi-dense) shape.

The per-point fixed costs dominate at T=16 (~109 ns/point-frame vs ~53 at
T=60). This bench times the full level featurizer (kernel + epilogue) at
T=16/N=70656 and T=60/N=10240, fori-amortized, and checks PP>1 parity vs
the same math at PP=1 (by chunking to a PP-indivisible size).

Run on the real TPU: python scripts/bench_corr_pp.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def sync(x):
    return float(np.asarray(x.ravel()[0]))


def run_shape(N, T, H, W, chunk, reps=4):
    from cotracker_tpu.ops.kernels.corr_pallas import (
        build_shifted_fmaps,
        fused_corr_embs_pallas,
    )

    C = 128
    rng = np.random.default_rng(0)
    fm = jnp.asarray(rng.standard_normal((1, T, H, W, C)).astype(np.float32))
    fm = (fm / jnp.linalg.norm(fm, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    sup = jnp.asarray(rng.standard_normal((1, N, 49, C)).astype(np.float32))
    sup = (sup / jnp.linalg.norm(sup, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    coords = jnp.asarray(
        (rng.random((1, T, N, 2)) * np.array([W - 1, H - 1])).astype(np.float32)
    )
    w1 = jnp.asarray(rng.standard_normal((2401, 384)).astype(np.float32) * 0.02)
    b1 = jnp.zeros(384)
    w2 = jnp.asarray(rng.standard_normal((384, 256)).astype(np.float32) * 0.05)
    b2 = jnp.zeros(256)

    packed = jax.jit(
        lambda f: build_shifted_fmaps(f, 3, jnp.bfloat16, quant_int8=True)
    )(fm)

    def make(ch):
        @jax.jit
        def f(p, s, c):
            def step(i, acc):
                out = fused_corr_embs_pallas(
                    p, s, c + acc * 0.0, w1, b1, w2, b2, radius=3, chunk=ch,
                    compute_dtype=jnp.bfloat16, prepacked=True,
                    track_major=True, quant_int8=True, fuse_combine=True,
                )
                return acc + jnp.sum(out[0, :, -1, 0].astype(jnp.float32) ** 2)

            return jax.lax.fori_loop(0, reps, step, 0.0)

        return f

    f = make(chunk)
    v = sync(f(packed, sup, coords))  # compile+warm
    t0 = time.perf_counter()
    v = sync(f(packed, sup, coords))
    dt = (time.perf_counter() - t0) / reps
    print(
        f"N={N:6d} T={T:3d} chunk={chunk:5d}: {dt * 1e3:7.1f} ms/level-iter "
        f"({dt / (N * T) * 1e9:6.1f} ns/pf)  chk={v:.1f}",
        flush=True,
    )
    return dt


def parity(N=256, T=12, H=48, W=64):
    """PP=16 (N%16==0) vs PP=1 (odd chunk) — identical int8 math expected."""
    from cotracker_tpu.ops.kernels.corr_pallas import (
        build_shifted_fmaps,
        fused_corr_embs_pallas,
    )

    C = 128
    rng = np.random.default_rng(1)
    fm = jnp.asarray(rng.standard_normal((1, T, H, W, C)).astype(np.float32))
    fm = (fm / jnp.linalg.norm(fm, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    sup = jnp.asarray(rng.standard_normal((1, N, 49, C)).astype(np.float32)).astype(jnp.bfloat16)
    coords = jnp.asarray(
        (rng.random((1, T, N, 2)) * np.array([W - 1, H - 1])).astype(np.float32)
    )
    w1 = jnp.asarray(rng.standard_normal((2401, 384)).astype(np.float32) * 0.02)
    b1 = jnp.zeros(384)
    w2 = jnp.asarray(rng.standard_normal((384, 256)).astype(np.float32) * 0.05)
    b2 = jnp.zeros(256)
    packed = jax.jit(
        lambda f: build_shifted_fmaps(f, 3, jnp.bfloat16, quant_int8=True)
    )(fm)

    def run(ch):
        return np.asarray(jax.jit(
            lambda p, s, c: fused_corr_embs_pallas(
                p, s, c, w1, b1, w2, b2, radius=3, chunk=ch,
                compute_dtype=jnp.bfloat16, prepacked=True, track_major=True,
                quant_int8=True, fuse_combine=True,
            )
        )(packed, sup, coords))

    a = run(64)   # NP=64 -> PP=16
    b = run(37)   # NP=37 -> PP=1 fallback (same per-point math)
    err = np.abs(a.astype(np.float32) - b.astype(np.float32)).max()
    print(f"parity PP16 vs PP1: max abs diff {err:.2e}", flush=True)
    assert err < 1e-2, err


def main():
    import cotracker_tpu.ops.kernels.corr_pallas as cp

    parity()
    for force_pp in (1, None):
        cp._FORCE_PP = force_pp
        try:
            label = "auto" if force_pp is None else str(force_pp)
            print(f"-- PP={label}", flush=True)
            for chunk in (2048, 4096):
                run_shape(70656, 16, 96, 128, chunk)
            run_shape(10240, 60, 96, 128, 2048)
        finally:
            cp._FORCE_PP = None


if __name__ == "__main__":
    main()
