"""Microbench: fused time-attention kernel vs XLA formulation on real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cotracker_tpu.ops.kernels.attention_pallas import fused_time_attention

M, T, H, D = 10048, 60, 8, 48
C = H * D
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((M, T, C)), jnp.bfloat16)
kv = jnp.asarray(rng.standard_normal((M, T, 2 * C)), jnp.bfloat16)


@jax.jit
def xla_core(q, kv):
    k, v = jnp.split(kv, 2, axis=-1)
    qh = q.reshape(M, T, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(M, T, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(M, T, H, D).transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhid,bhjd->bhij", qh, kh, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim * D**-0.5, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, vh).transpose(0, 2, 1, 3).reshape(M, T, C)
    return jnp.sum(out.astype(jnp.float32) ** 2)


def mk_pallas(block_m):
    @jax.jit
    def f(q, kv):
        out = fused_time_attention(q, kv, H, D, block_m=block_m)
        return jnp.sum(out.astype(jnp.float32) ** 2)
    return f


def timeit(fn, *a, n=5):
    r = float(fn(*a))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(n):
        r = float(fn(*a))
    return (time.perf_counter() - t0) / n, r


for name, fn in [("xla", xla_core), ("pallas_bm8", mk_pallas(8)),
                 ("pallas_bm16", mk_pallas(16)), ("pallas_bm32", mk_pallas(32))]:
    try:
        dt, r = timeit(fn, q, kv)
        print(f"{name:12s} {dt*1e3:8.2f} ms  checksum={r:.1f}", flush=True)
    except Exception as e:
        print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
