"""Microbench: fused time-block kernel, scratch-copy vs reshape repack.

The whole-block time kernel repacks (TB*T, C) q/kv into (TB, Tp, .) for the
per-track attention core. The original scratch path does TB serial per-track
VMEM copies per grid step — M copies total regardless of tile size, which is
why the kernel measured ~4x off its compute floor at T=16 (4x more tracks per
token than T=60) and why growing the track tile was neutral. When T is a
whole number of sublane tiles (T=16 bf16: the online/quasi-dense/training
window) the repack is a free reshape; this bench A/Bs the two paths on the
real chip, fori_loop-amortized to kill the ~29 ms axon dispatch fog.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cotracker_tpu.ops.kernels.mlp_int8_pallas as mp

Hh, D, HID = 8, 48, 1536
C = Hh * D
REPS = 8


def run(M, T, force_pad):
    rng = np.random.default_rng(0)
    p = {
        "wq": rng.standard_normal((C, C)) * 0.05,
        "bq": rng.standard_normal((C,)) * 0.05,
        "wkv": rng.standard_normal((C, 2 * C)) * 0.05,
        "bkv": rng.standard_normal((2 * C,)) * 0.05,
        "wo": rng.standard_normal((C, C)) * 0.05,
        "bo": rng.standard_normal((C,)) * 0.05,
        "w1": rng.standard_normal((C, HID)) * 0.05,
        "b1": rng.standard_normal((HID,)) * 0.05,
        "w2": rng.standard_normal((HID, C)) * 0.05,
        "b2": rng.standard_normal((C,)) * 0.05,
    }
    p = {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}
    x = jnp.asarray(rng.standard_normal((M, T, C)), jnp.bfloat16)

    # flag is read at TRACE time: set it under try/finally so an exception
    # can't leak force_pad=True into later in-process calls, and assert via
    # the _LAST_REPACK_PAD seam that this arm compiled the path it claims
    mp._FORCE_PAD_REPACK = force_pad
    try:

        @jax.jit
        def f(x):
            def step(i, a):
                out = mp.fused_time_block_int8(
                    a, p["wq"], p["bq"], p["wkv"], p["bkv"], p["wo"], p["bo"],
                    p["w1"], p["b1"], p["w2"], p["b2"], Hh, D,
                )
                # feed output back in so the loop can't be folded
                return (out * 0.5).astype(a.dtype)

            r = jax.lax.fori_loop(0, REPS, step, x)
            return jnp.sum(r[:4].astype(jnp.float32) ** 2)

        chk = float(f(x))  # compile + warm
        assert mp._LAST_REPACK_PAD == force_pad, (
            f"arm force_pad={force_pad} traced the "
            f"{'scratch' if mp._LAST_REPACK_PAD else 'reshape'} path"
        )
        t0 = time.perf_counter()
        chk = float(f(x))
        dt = (time.perf_counter() - t0) / REPS
    finally:
        mp._FORCE_PAD_REPACK = False
    tok = M * T
    print(
        f"M={M:6d} T={T:3d} {'scratch' if force_pad else 'reshape':8s} "
        f"{dt*1e3:8.2f} ms/block  {tok/dt/1e6:8.1f} Mtok/s  chk={chk:.3f}",
        flush=True,
    )
    return dt


def vpu_sweep():
    """Price the whole-block kernels' f32 VPU residual (judge r4 item 4):
    A/B the bf16-LN-statistics and gelu-quantize-fold knobs on the fused
    time block at the quasi-dense (70656, 16) and bench (10048, 60) shapes.
    Checksums differ slightly by construction (the knobs change quantization
    scales at the ~2^-8 level); compare the Mtok/s, verify parity via
    tests/test_pallas.py."""
    arms = [
        ("baseline", {}),
        ("bf16_ln", {"COTRACKER_BF16_LN": "1"}),
        ("gelu_fold", {"COTRACKER_GELU_QUANT_FOLD": "1"}),
        ("both", {"COTRACKER_BF16_LN": "1", "COTRACKER_GELU_QUANT_FOLD": "1"}),
    ]
    for M, T in [(70656, 16), (10048, 60)]:
        base = None
        for name, env in arms:
            for k, v in env.items():
                os.environ[k] = v
            try:
                print(f"[{name}]", end=" ", flush=True)
                dt = run(M, T, force_pad=False
                         if mp._reshape_repack_ok(T, jnp.bfloat16) else True)
            finally:
                for k in env:
                    os.environ.pop(k, None)
            if base is None:
                base = dt
            else:
                print(f"  -> {name}: {base/dt:.3f}x vs baseline", flush=True)


if __name__ == "__main__":
    if "--vpu" in sys.argv:
        vpu_sweep()
        sys.exit(0)
    shapes = [(16384, 16), (4096, 16)]
    if "--full" in sys.argv:
        shapes += [(70656, 16), (10048, 60)]
    for M, T in shapes:
        a = run(M, T, force_pad=True)
        if not mp._reshape_repack_ok(T, jnp.bfloat16):
            # bf16 reshape repack needs T % 16 == 0 — no B arm exists at
            # this shape (the kernel would correctly take scratch anyway)
            print(f"  -> T={T}: reshape path illegal (bf16 T%16!=0), scratch only", flush=True)
            continue
        b = run(M, T, force_pad=False)
        print(f"  -> speedup {a/b:.2f}x", flush=True)
