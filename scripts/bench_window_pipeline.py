"""Window-pipeline critical-path accounting (VERDICT r2 item 9).

"Prove value or demote": the GPipe window pipeline cannot be wall-clock
benchmarked on the virtual CPU mesh (all 8 virtual devices share one host's
cores — a pipeline can never show real speedup there), and only one real
chip exists. What CAN be pinned exactly is the critical path in units of
window-iterate bodies — the quantity that sets multi-chip wall-clock, read
directly off the implementation (`window_pipeline.py`: `fori_loop(0,
B + Sd - 1, ...)`, each trip running `wloc` window bodies per stage):

    sequential chain (1 device):  B * num_windows bodies
    pipeline (Sd stages):         (B + Sd - 1) * wloc bodies

For B=1 and an unpadded chain (num_windows == Sd*wloc) the ratio is exactly
1.0 — the warm-start chain is inherently sequential, so a single video gains
only the frame-parallel fnet (~10% of window work) minus carry-collective
overhead: the pipeline is a BATCH-throughput / multi-host tool, NOT a
single-video accelerator (use the "track" axis for that —
parallel/mesh.py). At B >= stages the ratio approaches Sd * B/(B+Sd-1).

The script prints the accounting for representative shapes and runs the
pipeline once on the virtual mesh to confirm the mechanics execute (parity
itself is covered by tests/test_window_pipeline.py).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/bench_window_pipeline.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cotracker_tpu.models.cotracker3 import CoTrackerThree
from cotracker_tpu.models.build import init_params
from cotracker_tpu.parallel.window_pipeline import (
    make_window_mesh,
    window_pipeline_forward,
)

S, step = 8, 4


def account(B, T, Sd):
    num_windows = max(1, -(-(T - S) // step) + 1)
    wloc = -(-num_windows // Sd)
    seq = B * num_windows
    pipe = (B + Sd - 1) * wloc
    print(
        f"B={B:2d} T={T:3d} stages={Sd}: windows={num_windows:3d}  "
        f"sequential critical path {seq:4d} bodies, pipeline {pipe:4d}"
        f"  -> speedup {seq/pipe:5.2f}x  (GPipe model {Sd*B/(B+Sd-1):.2f}x)",
        flush=True,
    )


if __name__ == "__main__":
    for B, T, Sd in [(1, 36, 4), (1, 132, 4), (4, 36, 4), (8, 36, 4), (32, 36, 8)]:
        account(B, T, Sd)

    # mechanics: one real execution on the virtual mesh
    model = CoTrackerThree(window_len=S, model_resolution=(32, 32))
    params = init_params(model)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.random((2, 20, 32, 32, 3), np.float32) * 255)
    queries = jnp.asarray(
        np.stack(
            [np.zeros((2, 8), np.float32),
             rng.random((2, 8), np.float32) * 31,
             rng.random((2, 8), np.float32) * 31],
            axis=-1,
        )
    )
    c, v, f = window_pipeline_forward(model, make_window_mesh(4), iters=2)(
        params, video, queries
    )
    assert np.isfinite(np.asarray(c)).all()
    print("mechanics: pipeline executed on the virtual mesh, outputs finite",
          flush=True)
