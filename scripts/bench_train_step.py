"""Training-step timing: XLA corr vs Pallas corr forward (custom_vjp).

Measures one supervised train step at the reference training shape
(train_on_kubric defaults: batch 1, seq_len 24 -> window 16 online / offline
60-crop here shortened to T=16, 384x512, 768 tracks, 4 iterations) on the
real TPU. Run: python scripts/bench_train_step.py [--T 16] [--N 768]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build(use_pallas: bool, T: int, remat: bool, dtype=jnp.bfloat16):
    from cotracker_tpu.models.cotracker3 import CoTrackerThree
    from cotracker_tpu.models.build import init_params

    model = CoTrackerThree(
        window_len=T,
        model_resolution=(384, 512),
        dtype=dtype,
        corr_chunk=None,
        use_pallas_corr=use_pallas,
        corr_pallas_grad=use_pallas,
        corr_quant_int8=use_pallas,
        remat_iterations=remat,
    )
    params = init_params(model)
    return model, params


def time_step(model, params, T, N, iters, steps=3, online=False):
    from cotracker_tpu.training.train_step import TrainConfig, make_optimizer, make_train_step

    cfg = TrainConfig(
        iters=iters, offline_model=not online,
        sliding_window_len=model.window_len,
    )
    tx, _ = make_optimizer(num_steps=100)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0, 1))

    rng = np.random.default_rng(0)
    B, H, W = 1, 384, 512
    batch = {
        "video": jnp.asarray(rng.random((B, T, H, W, 3), np.float32) * 255),
        "trajs_g": jnp.asarray(rng.random((B, T, N, 2), np.float32) * np.array([W - 1, H - 1], np.float32)),
        "vis_g": jnp.ones((B, T, N), jnp.float32),
        "valids": jnp.ones((B, T, N), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    def sync(aux):
        # force a real device->host readback: over remote-tunnel backends
        # block_until_ready alone does NOT synchronize (the round-2 numbers
        # measured dispatch, not execution)
        return float(np.asarray(aux["total_loss"]))

    t0 = time.time()
    params, opt_state, aux = step(params, opt_state, key, batch)
    loss = sync(aux)
    compile_s = time.time() - t0

    # presplit the step keys OUTSIDE the timed loop: jax.random.split is an
    # EAGER op — over the axon remote tunnel that is a full dispatch round
    # trip (~100 ms) which belongs to the harness, not the train step (the
    # real trainer splits inside its jitted step)
    subkeys = list(jax.random.split(key, steps))
    jax.block_until_ready(subkeys)

    t0 = time.time()
    for sub in subkeys:
        params, opt_state, aux = step(params, opt_state, sub, batch)
        loss = sync(aux)
    return compile_s, (time.time() - t0) / steps, loss


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--T", type=int, default=16)
    p.add_argument("--N", type=int, default=768)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--skip_xla", action="store_true")
    p.add_argument("--with_f32", action="store_true")
    # online-16 training variant (forward_windows over seq_len T with
    # window 16, the train_on_kubric online config; reference seq_len 24)
    p.add_argument("--online", action="store_true")
    args = p.parse_args()

    if args.online:
        import json

        model, params = build(True, 16, remat=True)
        c, s, loss = time_step(
            model, params, args.T, args.N, args.iters, online=True
        )
        print(f"pallas online w16   : {s * 1e3:8.1f} ms/step  (compile {c:.0f}s, loss {loss:.3f})")
        print(json.dumps({
            "metric": "train_step_ms", "variant": "online_w16_pallas",
            "T": args.T, "N": args.N, "iters": args.iters,
            "value": round(s * 1e3, 1), "unit": "ms/step",
        }))
        return

    # both arms run bf16 so the delta isolates the kernel (the Pallas arm
    # additionally quantizes corr windows to int8 — noted in its label);
    # --with_f32 adds the all-f32 XLA arm for the dtype contribution.
    if not args.skip_xla:
        if args.with_f32:
            model, params = build(False, args.T, remat=True, dtype=jnp.float32)
            c, s, loss = time_step(model, params, args.T, args.N, args.iters)
            print(f"xla f32+remat       : {s * 1e3:8.1f} ms/step  (compile {c:.0f}s, loss {loss:.3f})")
            del model, params
        model, params = build(False, args.T, remat=True, dtype=jnp.bfloat16)
        c, s, loss = time_step(model, params, args.T, args.N, args.iters)
        print(f"xla bf16+remat      : {s * 1e3:8.1f} ms/step  (compile {c:.0f}s, loss {loss:.3f})")
        del model, params

    model, params = build(True, args.T, remat=True)
    c, s, loss = time_step(model, params, args.T, args.N, args.iters)
    print(f"pallas bf16+i8corr  : {s * 1e3:8.1f} ms/step  (compile {c:.0f}s, loss {loss:.3f})")
    import json

    print(json.dumps({
        "metric": "train_step_ms", "variant": f"offline_T{args.T}_pallas",
        "T": args.T, "N": args.N, "iters": args.iters,
        "value": round(s * 1e3, 1), "unit": "ms/step",
    }))


if __name__ == "__main__":
    main()
