"""Standalone corr-featurizer variant timing at the bench shape (level 0).

Variants:
  int8       — current default: kernel emits raw int8 g; XLA epilogue does
               the 4-term combine + bf16 MLP
  fuse_int8  — kernel emits the COMBINED int8 volume (fuse_combine) and the
               epilogue runs MLP1 as a native s8 x s8 -> s32 dot with padded
               int8 weights (round-2 epilogue)

Numbers carry ~29 ms of remote-dispatch inflation each (CLAUDE.md) — compare
deltas, not absolutes. Run on the real TPU.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    return float(np.asarray(x.ravel()[0]))


def main():
    from cotracker_tpu.ops.kernels.corr_pallas import (
        build_shifted_fmaps,
        fused_corr_embs_pallas,
    )

    # level-0 fmap at 384x512/4; --t16 benches the online/quasi-dense window
    # (T=16, quasi-dense N) where the round-5 fuse_mlp1 variant targets
    if "--t16" in sys.argv:
        N, T, H, W, C = 70_656, 16, 96, 128, 128
    else:
        N, T, H, W, C = 10_240, 60, 96, 128, 128
    CH = 2048
    rng = np.random.default_rng(0)
    fm = jnp.asarray(rng.standard_normal((1, T, H, W, C)).astype(np.float32))
    fm = (fm / jnp.linalg.norm(fm, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    sup = jnp.asarray(rng.standard_normal((1, N, 49, C)).astype(np.float32))
    sup = (sup / jnp.linalg.norm(sup, axis=-1, keepdims=True))
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

    def make(fuse, mlp1=False):
        def f(p, s, c):
            out = fused_corr_embs_pallas(
                p, s, c, w1, b1, w2, b2, radius=3, chunk=CH,
                compute_dtype=jnp.bfloat16, prepacked=True, track_major=True,
                quant_int8=True, fuse_combine=fuse, fuse_mlp1=mlp1,
            )
            return jnp.sum(out.astype(jnp.float32) ** 2).reshape(1)

        return jax.jit(f)

    ref = None
    for name, fuse, mlp1 in [
        ("int8", False, False),
        ("fuse_int8", True, False),
        ("fuse_mlp1", False, True),
    ]:
        f = make(fuse, mlp1)
        v = sync(f(packed, sup, coords))  # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            sync(f(packed, sup, coords))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        if ref is None:
            ref = v
        drift = abs(v - ref) / (abs(ref) + 1e-9)
        print(f"{name:10s}: {t * 1e3:7.1f} ms/level-iter  (sumsq drift {drift:.2e})")


if __name__ == "__main__":
    main()
