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
    """
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
