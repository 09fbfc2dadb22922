"""Microbench: full AttnBlock (LN+attn+MLP) on real TPU, XLA vs pallas core."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cotracker_tpu.models.blocks import AttnBlock

M, T, C = 10048, 60, 384
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((M, T, C)), jnp.bfloat16)


def mk(use_pallas):
    blk = AttnBlock(C, 8, 48, 4.0, dtype=jnp.bfloat16, use_pallas_attn=use_pallas)
    params = jax.jit(lambda: blk.init(jax.random.PRNGKey(0), x[:8]))()["params"]

    @jax.jit
    def f(params, x):
        return jnp.sum(blk.apply({"params": params}, x).astype(jnp.float32) ** 2)

    return lambda: float(f(params, x))


def timeit(fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    return (time.perf_counter() - t0) / n, r


for name, use in [("xla_block", False), ("pallas_core_block", True)]:
    dt, r = timeit(mk(use))
    print(f"{name:18s} {dt*1e3:8.2f} ms  checksum={r:.1f}", flush=True)
