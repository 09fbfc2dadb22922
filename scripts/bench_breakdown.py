"""Per-component timing breakdown of the flagship offline forward on TPU.

Times, separately jitted, at the bench workload (N=10k, T=60, 384x512, bf16):
  * full 6-iter forward (the bench.py number)
  * encoder + pyramid + track feats (once per forward)
  * Pallas corr featurizer, one level-iteration at each pyramid level
  * updateformer, one iteration
Prints a table; run on the real TPU (no env prefix). ~5-10 min cold.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync_scalar(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(fn, *args, reps=3):
    fn(*args)  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync_scalar(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from cotracker_tpu.models.cotracker3 import CoTrackerThree
    from cotracker_tpu.models.build import init_params
    from cotracker_tpu.ops.kernels.corr_pallas import (
        fused_corr_embs_pallas,
        build_shifted_fmaps,
    )
    from cotracker_tpu.models.updateformer import EfficientUpdateFormer

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    # multiple of 512: the fused space kernels tile N (pick_block_n) and a
    # degenerate divisor poisons the space rounds (BASELINE.md tiling trap)
    N = 10_240 if on_tpu else 64
    T = 60 if on_tpu else 8
    H, W = (384, 512) if on_tpu else (96, 128)
    cd = jnp.bfloat16 if on_tpu else jnp.float32
    iters = 6
    CH = 2048 if on_tpu else None

    model = CoTrackerThree(
        window_len=60, model_resolution=(H, W), dtype=cd, corr_chunk=CH,
        use_pallas_corr=on_tpu, use_pallas_attn=on_tpu,
        corr_quant_int8=on_tpu, attn_quant_int8=on_tpu,
    )
    params = init_params(model)

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.random((1, T, H, W, 3), np.float32) * 255)
    queries = jnp.asarray(
        np.stack(
            [np.zeros(N), rng.random(N) * (W - 1), rng.random(N) * (H - 1)], -1
        )[None].astype(np.float32)
    )

    # ---- full forward
    @jax.jit
    def full(v):
        c, vi, cf, _ = model.apply({"params": params}, v, queries, iters=iters)
        return c[0, -1, -1]

    t_full = timeit(full, video)
    print(f"full forward ({iters} iters): {t_full*1e3:8.1f} ms")

    # ---- encoder + pyramid + track feats
    @jax.jit
    def feats(v):
        def go(m):
            fm = m.compute_fmaps(v)
            pyr = m.build_pyramid(fm)
            qf = queries[..., 0]
            qc = queries[..., 1:] / m.stride
            _, sup = m.track_feat_pyramid(pyr, qf, qc)
            return sup[0][0, 0, 0, 0]

        return model.apply({"params": params}, method=go)

    t_feats = timeit(feats, video)
    print(f"fnet + pyramid + track feats: {t_feats*1e3:8.1f} ms (once/forward)")

    # ---- corr featurizer per level (standalone pallas path)
    P = 7
    S = P * P
    C = 128
    w1 = jnp.asarray(rng.standard_normal((S * S, 384)).astype(np.float32) * 0.02)
    b1 = jnp.zeros((384,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((384, 256)).astype(np.float32) * 0.02)
    b2 = jnp.zeros((256,), jnp.float32)
    t_corr = {}
    for lvl in range(4):
        h, w = (H // 4) >> lvl, (W // 4) >> lvl
        fm = jnp.asarray(rng.standard_normal((1, T, h, w, C)).astype(np.float32))
        pre = jax.jit(
            lambda f: build_shifted_fmaps(f, 3, cd, quant_int8=on_tpu)
        )(fm)
        sup = jnp.asarray(rng.standard_normal((1, N, S, C)).astype(np.float32)).astype(cd)
        coords = jnp.asarray(
            np.stack([rng.random((1, T, N)) * (w - 1), rng.random((1, T, N)) * (h - 1)], -1)
            .astype(np.float32)
        )

        fn = jax.jit(
            lambda pp, ss, cc: fused_corr_embs_pallas(
                pp, ss, cc, w1, b1, w2, b2, radius=3, chunk=CH,
                compute_dtype=cd, prepacked=True, track_major=True,
                quant_int8=on_tpu,
            )[0, -1, -1, 0]
        )
        t = timeit(fn, pre, sup, coords)
        t_corr[lvl] = t
        print(f"corr level {lvl} ({h}x{w}): {t*1e3:8.1f} ms/iter")
    print(f"corr all levels x {iters} iters: {sum(t_corr.values())*iters*1e3:8.1f} ms")

    # ---- updateformer one iteration
    uf = EfficientUpdateFormer(dtype=cd, use_pallas_attn=on_tpu, quant_int8=on_tpu)
    x = jnp.asarray(rng.standard_normal((1, N, T, 1110)).astype(np.float32)).astype(cd)
    ufp = jax.jit(uf.init)(jax.random.PRNGKey(0), x[:, :8, :, :])["params"]
    uf_fn = jax.jit(lambda xx: uf.apply({"params": ufp}, xx)[0, -1, -1, 0])
    t_uf = timeit(uf_fn, x)
    print(f"updateformer: {t_uf*1e3:8.1f} ms/iter; x {iters} = {t_uf*iters*1e3:8.1f} ms")

    accounted = t_feats + sum(t_corr.values()) * iters + t_uf * iters
    print(f"accounted: {accounted*1e3:8.1f} ms of {t_full*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
