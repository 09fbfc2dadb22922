"""Microbench: the v2p (virtual<-points) flash+projection kernel vs N-tile.

(Renamed from bench_p2v.py in round 5: it benches _v2p_proj_kernel; the
repo-wide shorthand convention is the code's — "x2y" reads "x FROM y".)

The kernel's per-grid-step cost is dominated by the FIXED latency of the 16
tiny per-head score/pv dots (M=V=64 pads to the MXU tile, K=48 pads to 128),
not by the kv projection: at blk=1024 the quasi-dense shape runs 16 frames x
69 tiles = 1104 steps/round at ~46 us/step against ~10 us of roofline
compute (round-4 steady-window trace: 611 ms/step = 3 space rounds x 4
iters). Larger tiles cut the step count; the in-kernel LN/quant f32 temps
are bounded by 512-row sub-passes (attention_pallas._v2p_proj_kernel
ln_chunk). This bench A/Bs tile sizes on the real chip, fori-amortized.

ROUND-4 RESULT: blk=1024 standalone == its in-context trace cost (18.7 vs
16.5 ms/round — the kernel is at its envelope, there is no hidden
overhead), and blk=3072 does NOT COMPILE (21.8 MB scoped VMEM vs the 16 MB
limit even with 512-row sub-passes: the x tile + (blk, 2C) kv scratch +
pipeline buffers alone are ~10 MB). Big tiles stay opt-in via
COTRACKER_V2P_BLOCK.

Run: python scripts/bench_v2p.py [--sweep]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cotracker_tpu.ops.kernels import attention_pallas as ap

H, D, V = 8, 48, 64
C = H * D
REPS = 8


def run(N, T, blk):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((T, V, C)) * 0.3, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((N, T, C)), jnp.bfloat16)
    wkv = jnp.asarray(rng.standard_normal((C, 2 * C)) * 0.05, jnp.float32)
    bkv = jnp.asarray(rng.standard_normal(2 * C) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal(C) * 0.2 + 1.0, jnp.float32)
    be = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)

    os.environ["COTRACKER_V2P_BLOCK"] = str(blk)
    try:

        @jax.jit
        def f(q, x):
            def step(i, c):
                out = ap.fused_virtual_from_points_proj(
                    q * (1.0 + c * 1e-20).astype(q.dtype), x, wkv, bkv, g,
                    be, H, D,
                )
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-20 + c

            return jax.lax.fori_loop(0, REPS, step, 0.0)

        chk = float(f(q, x))  # compile + warm
        t0 = time.perf_counter()
        chk = float(f(q, x))
        dt = (time.perf_counter() - t0) / REPS
    finally:
        del os.environ["COTRACKER_V2P_BLOCK"]
    print(
        f"N={N:6d} T={T:3d} blk={blk:5d} {dt*1e3:8.2f} ms/round "
        f"{N*T/dt/1e6:8.1f} Mtok/s  chk={chk:.3e}",
        flush=True,
    )
    return dt


if __name__ == "__main__":
    shapes = [(70656, 16, b) for b in (1024, 3072)]
    if "--sweep" in sys.argv:
        shapes += [(70656, 16, 2048) if 70656 % 2048 == 0 else (70656, 16, 1536)]
        shapes += [(16384, 16, 1024), (16384, 16, 2048), (16384, 16, 4096)]
    base = None
    for N, T, b in shapes:
        if N % b:
            print(f"skip blk={b} (not a divisor of {N})", flush=True)
            continue
        try:
            dt = run(N, T, b)
        except Exception as e:
            # blk=3072 is EXPECTED to fail on this chip: 21.8 MB scoped VMEM
            # vs the 16 MB stack even with 512-row LN sub-passes (round-4
            # pricing, BASELINE.md). Report and keep sweeping.
            msg = str(e).split("\n")[0][:160]
            print(
                f"N={N:6d} T={T:3d} blk={b:5d}  FAILED to compile "
                f"(expected on a 16 MB scoped stack): {msg}",
                flush=True,
            )
            continue
        if base is None:
            base = dt
        else:
            print(f"  -> vs blk={shapes[0][2]}: {base/dt:.2f}x", flush=True)
