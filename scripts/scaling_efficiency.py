"""Scaling-efficiency surface: frames/s of the sharded train step vs device
count (SURVEY north star: >=80% efficiency 1 chip -> 1 host -> N hosts).

On real TPU hardware this is the true measurement. On CPU with virtual
devices (XLA_FLAGS=--xla_force_host_platform_device_count=8) it validates
the MECHANICS only — virtual devices share the same physical cores, so the
printed efficiency is not meaningful there (the script says which mode it
ran in).

Run:
  python scripts/scaling_efficiency.py                 # real devices
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/scaling_efficiency.py --mechanics   # virtual mesh
"""

import argparse
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_mesh(n_dev, args):
    from cotracker_tpu.models.cotracker3 import CoTrackerThree
    from cotracker_tpu.models.build import init_params
    from cotracker_tpu.parallel.mesh import (
        BATCH_PSPECS,
        make_fast_sharded_train_step,
        make_mesh,
        replicate,
        shard_batch,
        sharded_train_step,
    )
    from cotracker_tpu.training.train_step import (
        TrainConfig,
        make_optimizer,
        make_train_step,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    fast_kw = {}
    if args.fast:
        # the tuned kernel path under shard_map (pallas is not
        # GSPMD-partitionable); interpret mode on CPU backends
        fast_kw = dict(
            use_pallas_corr=True, corr_pallas_grad=True,
            remat_iterations=True, corr_chunk=2048,
            corr_quant_int8=jax.devices()[0].platform != "cpu",
            corr_pallas_interpret=jax.devices()[0].platform == "cpu",
        )
    model = CoTrackerThree(
        window_len=args.T, model_resolution=(args.H, args.W), **fast_kw
    )
    params = init_params(model)
    cfg = TrainConfig(iters=args.iters)
    tx, _ = make_optimizer(num_steps=100)
    opt_state = tx.init(params)
    step = make_train_step(model, tx, cfg)

    # weak scaling: batch grows with the data axis so per-device work is fixed
    d = int(np.gcd(n_dev, args.max_data))
    mesh_shape = (d, n_dev // d)
    B = args.batch_per_data * mesh_shape[0]
    N = args.tracks_per_shard * mesh_shape[1]

    rng = np.random.default_rng(0)
    batch = {
        "video": jnp.asarray(rng.random((B, args.T, args.H, args.W, 3), np.float32) * 255),
        "trajs_g": jnp.asarray(rng.random((B, args.T, N, 2), np.float32) * (args.W - 1)),
        "vis_g": jnp.ones((B, args.T, N), jnp.float32),
        "valids": jnp.ones((B, args.T, N), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    if n_dev == 1:
        sstep = jax.jit(step)
    else:
        mesh = make_mesh(mesh_shape, devices=jax.devices()[:n_dev])
        if args.fast:
            sstep = make_fast_sharded_train_step(
                model.clone(track_axis="track"), tx, cfg, mesh
            )
        else:
            sstep = sharded_train_step(step, mesh)
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        batch = {k: shard_batch(mesh, v, BATCH_PSPECS[k]) for k, v in batch.items()}
        key = jax.device_put(key, NamedSharding(mesh, P()))

    def sync(aux):
        # forced readback: block_until_ready does not synchronize over
        # remote-tunnel backends (see BASELINE.md round-3 notes)
        return float(np.asarray(aux["total_loss"]))

    params, opt_state, aux = sstep(params, opt_state, key, batch)  # compile
    sync(aux)
    t0 = time.time()
    for _ in range(args.steps):
        params, opt_state, aux = sstep(params, opt_state, key, batch)
        sync(aux)
    dt = (time.time() - t0) / args.steps
    frames = B * args.T
    return {
        "devices": n_dev,
        "mesh": list(mesh_shape),
        "batch": B,
        "tracks": N,
        "step_s": dt,
        "frames_per_s": frames / dt,
        "pf_per_s": frames * N / dt,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--T", type=int, default=8)
    p.add_argument("--H", type=int, default=64)
    p.add_argument("--W", type=int, default=64)
    p.add_argument("--iters", type=int, default=2)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch_per_data", type=int, default=1)
    p.add_argument("--tracks_per_shard", type=int, default=64)
    p.add_argument("--max_data", type=int, default=4)
    p.add_argument("--mechanics", action="store_true",
                   help="virtual-device run: report mechanics only")
    p.add_argument("--fast", action="store_true",
                   help="Pallas/int8 path via the shard_map fast train step")
    args = p.parse_args()

    n = len(jax.devices())
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= n]
    if args.mechanics:
        # virtual-device run: validate mesh mechanics at minimal cost
        args.H = args.W = 48
        args.tracks_per_shard = 32
        args.steps = 1
        counts = [c for c in (1, n) if c <= n]
    rows = [bench_mesh(c, args) for c in counts]
    base = rows[0]["pf_per_s"]
    for r in rows:
        # weak scaling: ideal = base * devices
        r["efficiency"] = r["pf_per_s"] / (base * r["devices"])
    mode = "mechanics (virtual devices — efficiency not meaningful)" if args.mechanics else "hardware"
    print(json.dumps({"mode": mode, "rows": rows}, indent=2))


if __name__ == "__main__":
    main()
