"""Device mesh and sharding helpers.

The framework uses a single logical mesh with axes ("data", "track")
(SURVEY.md §2.7):

  * "data"  — batch / window data parallelism (gradient psum rides ICI/DCN);
  * "track" — the CoTracker-specific model parallelism: the N (tracks) axis
    is sharded across chips. Time attention and correlation are
    embarrassingly parallel in N; cross-track information flows only through
    the 64 virtual-track tokens, so the per-block collective is O(V*C), tiny.

The reference scales only by DDP data parallelism over NCCL
(train_on_kubric.py:698-706); track sharding is what lets one model jointly
track 265x265 = ~70k points across a pod slice.
"""

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "track"),
    devices=None,
) -> Mesh:
    """Build a ("data", "track") mesh over the available devices.

    shape=None puts all devices on "track" (the right default for
    single-video quasi-dense inference); pass e.g. (2, 4) to split.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    assert shape[0] * shape[1] == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params) over the mesh. Works on multi-host
    meshes too (every process must hold the same host values)."""
    sharding = NamedSharding(mesh, P())
    if len(mesh.devices.flatten()) > len(jax.local_devices()):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, spec: P):
    """Place a pytree with a common PartitionSpec."""
    return jax.device_put(tree, NamedSharding(mesh, spec))


def track_sharded_forward(model, mesh: Mesh, iters: int = 6):
    """A jitted offline forward with tracks sharded over the "track" axis and
    batch over "data". Params replicate; XLA inserts the virtual-track
    all-reduces automatically from the sharding constraints.

    Returns fn(params, video, queries, track_mask) -> (coords, vis, conf).
    N must be a multiple of the track-axis size (pad + mask).

    Models built with `track_axis` set (the Pallas/int8 fast path — GSPMD
    cannot partition pallas_call) dispatch to the shard_map implementation
    below; XLA-path models keep the GSPMD version (identical results).
    """
    if getattr(model, "track_axis", None) is not None:
        return _track_sharded_forward_shardmap(model, mesh, iters)
    qspec = P("data", "track", None)  # queries (B, N, 3)
    mspec = P("data", "track")  # track_mask (B, N)
    vspec = P("data", None, None, None, None)  # video (B, T, H, W, 3)
    out_coords = P("data", None, "track", None)  # (B, T, N, 2)
    out_tn = P("data", None, "track")  # (B, T, N)

    def fn(params, video, queries, track_mask):
        coords, vis, conf, _ = model.apply(
            {"params": params}, video, queries, iters=iters, track_mask=track_mask
        )
        return coords, vis, conf

    return jax.jit(
        fn,
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, vspec),
            NamedSharding(mesh, qspec),
            NamedSharding(mesh, mspec),
        ),
        out_shardings=(
            NamedSharding(mesh, out_coords),
            NamedSharding(mesh, out_tn),
            NamedSharding(mesh, out_tn),
        ),
    )


def _track_sharded_forward_shardmap(model, mesh: Mesh, iters: int = 6):
    """shard_map offline forward for fast-path models (use_pallas_corr /
    attn_quant_int8): pallas_call is not GSPMD-partitionable, so the
    per-track work runs MANUALLY per shard — each device gets its N-slice of
    queries/support/carries and the replicated feature pyramid, runs the
    full tuned kernel stack on local N, and the only collective is the
    virtual<-points two-pass psum inside the updateformer (the model must be
    built with track_axis == the mesh's track axis name).

    fnet/pyramid run OUTSIDE the manual region under plain GSPMD (batch over
    "data", replicated over "track") — convolutions partition fine.

    Constraints: B % data_size == 0, N % track_size == 0 (pad + mask), and
    per-shard N must satisfy the kernels' tiling rules (multiples of 512 for
    the space W8A8 kernels — predictor fast path already buckets N to 512).
    """
    dax, tax = mesh.axis_names[0], model.track_axis
    assert tax in mesh.axis_names, (tax, mesh.axis_names)
    mod_cls = type(model)

    def local_fn(params, pyr, queries, track_mask):
        # the single-window forward glue (support sampling/masking, carry
        # init, iterate) is the MODEL's forward_from_pyramid — shared with
        # the unsharded __call__ so the two paths cannot drift
        cp, vp, fp = model.apply(
            {"params": params}, list(pyr), queries,
            iters=iters, track_mask=track_mask,
            method=mod_cls.forward_from_pyramid,
        )
        return cp[-1], jax.nn.sigmoid(vp[-1]), jax.nn.sigmoid(fp[-1])

    body = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(),  # params replicated
            P(dax),  # pyramid: B over data, replicated over track
            P(dax, tax),  # queries (B, N, 3)
            P(dax, tax),  # track_mask (B, N)
        ),
        out_specs=(P(dax, None, tax), P(dax, None, tax), P(dax, None, tax)),
        check_vma=False,
    )

    def fn(params, video, queries, track_mask):
        fmaps = model.apply(
            {"params": params}, video, method=mod_cls.compute_fmaps,
            chunk_size=None,
        )
        pyr = model.apply({"params": params}, fmaps, method=mod_cls.build_pyramid)
        return body(params, tuple(pyr), queries, track_mask)

    vspec = P(dax, None, None, None, None)
    return jax.jit(
        fn,
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, vspec),
            NamedSharding(mesh, P(dax, tax, None)),
            NamedSharding(mesh, P(dax, tax)),
        ),
    )


def make_fast_sharded_train_step(model, tx, cfg, mesh: Mesh):
    """Train step for fast-path models on a ("data", "track") mesh, built on
    shard_map (pallas_call is not GSPMD-partitionable — this is what lifts
    trainer.py's old single-device restriction on use_pallas_corr).

    Queries are sampled at GLOBAL batch shape under plain jit (bitwise equal
    to the unsharded step's sampling); the loss+grad runs inside shard_map
    with every masked mean psum'ed over ("data", "track") (losses.py
    axis_name), so loss and gradients equal the unsharded step's up to f32
    reassociation. Gradients psum-replicate; the optimizer update runs once
    per shard on identical values. The model must be built with
    track_axis == the mesh's track axis.

    Returns step(params, opt_state, rng, batch) -> (params, opt_state, aux),
    call-compatible with make_train_step's product.
    """
    from cotracker_tpu.training.train_step import (
        sample_queries_from_gt,
        tracker_loss_fn,
    )
    import optax

    dax = mesh.axis_names[0]
    tax = model.track_axis
    assert tax in mesh.axis_names, (tax, mesh.axis_names)
    axes = (dax, tax)

    def local_grads(params, video, trajs_g, vis_g, valids, queries, track_mask):
        def loss_fn(p):
            return tracker_loss_fn(
                model, p, video, trajs_g, vis_g, valids, queries, cfg,
                track_mask=track_mask, axis_name=axes,
            )

        grads, aux = jax.grad(loss_fn, has_aux=True)(params)
        grads = jax.lax.psum(grads, axes)
        return grads, aux

    gshard = jax.shard_map(
        local_grads,
        mesh=mesh,
        in_specs=(
            P(),  # params
            P(dax, None, None, None, None),  # video
            P(dax, None, tax, None),  # trajs_g
            P(dax, None, tax),  # vis_g
            P(dax, None, tax),  # valids
            P(dax, tax, None),  # queries
            P(dax, tax),  # track_mask
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, opt_state, rng, batch):
        q_rng, _ = jax.random.split(rng)
        queries = sample_queries_from_gt(
            q_rng, batch["trajs_g"], batch["vis_g"], cfg.query_sampling_method
        )
        track_mask = batch.get("track_mask")
        if track_mask is None:
            track_mask = jnp.ones(batch["vis_g"].shape[::2], bool)
        grads, aux = gshard(
            params, batch["video"], batch["trajs_g"], batch["vis_g"],
            batch["valids"], queries, track_mask,
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    repl = NamedSharding(mesh, P())
    batch_spec = {k: NamedSharding(mesh, v) for k, v in BATCH_PSPECS.items()}
    return jax.jit(
        step,
        in_shardings=(repl, repl, repl, batch_spec),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )


# canonical training-batch partition specs: batch rows over "data", tracks
# over "track" (shared by sharded_train_step and the multi-host data path)
BATCH_PSPECS = {
    "video": P("data", None, None, None, None),
    "trajs_g": P("data", None, "track", None),
    "vis_g": P("data", None, "track"),
    "valids": P("data", None, "track"),
}


def sharded_train_step(step_fn, mesh: Mesh):
    """pjit a train step over the mesh: batch on "data", tracks on "track",
    params/opt-state replicated. Gradient all-reduce over "data" and the
    virtual-track collectives over "track" are inserted by XLA."""
    repl = NamedSharding(mesh, P())
    batch_spec = {
        k: NamedSharding(mesh, v) for k, v in BATCH_PSPECS.items()
    }
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, batch_spec),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
