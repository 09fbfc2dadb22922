"""Ablation bench of the round-5 fuse_mlp1 corr kernel at the T=16
quasi-dense shape: times ONLY the fuse_mlp1 variant under each
COTRACKER_MLP1_ABLATE knob (dot | combine | amax). Ablated runs produce
WRONG results — timing only; numbers recorded in BASELINE.md round 5.

Run on the real TPU: python scripts/bench_corr_mlp1_ablate.py [dot|combine|amax]"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    return float(np.asarray(x.ravel()[0]))


def run(ablate):
    os.environ.pop("COTRACKER_MLP1_ABLATE", None)
    if ablate:
        os.environ["COTRACKER_MLP1_ABLATE"] = ablate
    import jax
    import jax.numpy as jnp
    from cotracker_tpu.ops.kernels.corr_pallas import (
        build_shifted_fmaps,
        fused_corr_embs_pallas,
    )

    N, T, H, W, C = 70_656, 16, 96, 128, 128
    CH = 2048
    rng = np.random.default_rng(0)
    fm = jnp.asarray(rng.standard_normal((1, T, H, W, C)).astype(np.float32))
    fm = (fm / jnp.linalg.norm(fm, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    sup = jnp.asarray(rng.standard_normal((1, N, 49, C)).astype(np.float32))
    sup = sup / jnp.linalg.norm(sup, axis=-1, keepdims=True)
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

    def f(p, s, c):
        out = fused_corr_embs_pallas(
            p, s, c, w1, b1, w2, b2, radius=3, chunk=CH,
            compute_dtype=jnp.bfloat16, prepacked=True, track_major=True,
            quant_int8=True, fuse_mlp1=True,
        )
        return jnp.sum(out.astype(jnp.float32) ** 2).reshape(1)

    jf = jax.jit(f)
    sync(jf(packed, sup, coords))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        sync(jf(packed, sup, coords))
        ts.append(time.perf_counter() - t0)
    print(f"{ablate or 'full':10s}: {min(ts) * 1e3:7.1f} ms/level-iter",
          flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else None)
