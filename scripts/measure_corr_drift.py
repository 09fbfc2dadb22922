"""Re-measure the int8-corr random-weight coordinate drift (advisor r2-low /
judge r3 hygiene): the int8 window+volume+support quantization path vs the
SAME Pallas path in bf16, identical weights — isolating the quantization
contribution (incl. the bf16-staged support double-round, up to ~2^-9
relative on top of int8's ~1/254).

Run on the real TPU: python scripts/measure_corr_drift.py [--iters 6]
Prints median / p90 / max coordinate drift in model pixels.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--N", type=int, default=2048)
    ap.add_argument("--T", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cotracker_tpu.models.cotracker3 import CoTrackerThree
    from cotracker_tpu.models.build import init_params

    H, W = 384, 512
    on_tpu = jax.devices()[0].platform != "cpu"
    kw = dict(
        window_len=args.T, model_resolution=(H, W), dtype=jnp.bfloat16,
        corr_chunk=1024, use_pallas_corr=True, corr_fuse_combine=True,
        fold_input_proj=True, corr_pallas_interpret=not on_tpu,
    )
    m_i8 = CoTrackerThree(corr_quant_int8=True, **kw)
    m_bf = CoTrackerThree(corr_quant_int8=False, **kw)
    params = init_params(m_i8)

    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.random((1, args.T, H, W, 3), np.float32) * 255)
    queries = jnp.asarray(
        np.stack(
            [np.zeros(args.N, np.float32),
             rng.random(args.N).astype(np.float32) * (W - 1),
             rng.random(args.N).astype(np.float32) * (H - 1)], axis=-1)[None]
    )

    def run(model):
        f = jax.jit(lambda p, v, q: model.apply(
            {"params": p}, v, q, iters=args.iters)[0])
        return np.asarray(f(params, video, queries))

    c_i8 = run(m_i8)
    c_bf = run(m_bf)
    d = np.linalg.norm(c_i8 - c_bf, axis=-1)
    print(
        f"int8-vs-bf16 Pallas corr drift over {args.iters} iters "
        f"(N={args.N}, T={args.T}, {H}x{W}, random weights): "
        f"median {np.median(d):.3f} px, p90 {np.quantile(d, 0.9):.3f}, "
        f"max {d.max():.3f}"
    )


if __name__ == "__main__":
    main()
