"""Microbench: points<-virtual whole-block kernel, per-frame vs all-frames tile.

The per-(frame, N-tile) kernel runs its token-wise W8A8 matmuls at M=512
rows and pays per-grid-step fixed costs T x n_tiles times per round — the
round-4 quasi-dense steady-window trace prices it at 22 Mtok/s (51 ms/round
at N=70656, T=16; 611 ms of the 4.52 s step) against the time block's 27.6
Mtok/s with MORE work per token. The all-frames tile
(mlp_int8_pallas._space_block_allt_kernel) runs token-wise ops flat at
M = blk*T rows like the time block. A/B on the real chip, fori-amortized.

Run: python scripts/bench_spaceblock.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import cotracker_tpu.ops.kernels.mlp_int8_pallas as mp

H, D, V = 8, 48, 64
C = H * D
HID = 1536
REPS = 8


def run(N, T, allt):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, T, C)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((T, V, 2 * C)) * 0.3, jnp.bfloat16)
    p = {
        k: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
        for k, s in dict(
            wq=(C, C), bq=(C,), wo=(C, C), bo=(C,), w1=(C, HID), b1=(HID,),
            w2=(HID, C), b2=(C,),
        ).items()
    }

    os.environ["COTRACKER_SPACE_ALLT"] = "1" if allt else "0"
    try:

        @jax.jit
        def f(x):
            def step(i, a):
                out = mp.fused_space_block_int8(
                    a, kv, p["wq"], p["bq"], p["wo"], p["bo"],
                    p["w1"], p["b1"], p["w2"], p["b2"], H, D,
                )
                return (out * 0.5).astype(a.dtype)

            r = jax.lax.fori_loop(0, REPS, step, x)
            return jnp.sum(r[:4].astype(jnp.float32) ** 2)

        chk = float(f(x))  # compile + warm
        assert mp._LAST_SPACE_ALLT == allt, (
            f"arm allt={allt} traced the "
            f"{'all-T' if mp._LAST_SPACE_ALLT else 'per-frame'} path"
        )
        t0 = time.perf_counter()
        chk = float(f(x))
        dt = (time.perf_counter() - t0) / REPS
    finally:
        del os.environ["COTRACKER_SPACE_ALLT"]
    print(
        f"N={N:6d} T={T:3d} {'all-T' if allt else 'per-frame':10s} "
        f"{dt*1e3:8.2f} ms/round  {N*T/dt/1e6:8.1f} Mtok/s  chk={chk:.3f}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    for N, T in [(70656, 16)] + ([(16384, 16)] if "--sweep" in sys.argv else []):
        a = run(N, T, allt=False)
        b = run(N, T, allt=True)
        print(f"  -> all-T speedup {a/b:.2f}x", flush=True)
