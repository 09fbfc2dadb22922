"""Supervised training step (mirrors reference train_on_kubric.py:79-227
forward_batch + fetch_optimizer:47-76), as pure jittable functions.

The step is written to be pjit-sharded over a Mesh("data", "track"): batch on
"data", tracks on "track", params replicated, gradients psum-reduced by XLA.
"""

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from cotracker_tpu.training.losses import (
    sequence_loss,
    sequence_bce_loss,
    sequence_prob_loss,
)


class TrainConfig(NamedTuple):
    iters: int = 4
    flow_weight: float = 0.05
    invisible_flow_weight: float = 0.01
    add_huber_loss: bool = False
    train_only_on_visible: bool = False
    offline_model: bool = True
    sliding_window_len: int = 16
    query_sampling_method: str = "first_visible"  # or "random"


def sample_queries_from_gt(rng, trajs_g, vis_g, method: str = "first_visible"):
    """Build training queries from ground-truth tracks.

    trajs_g (B, T, N, 2), vis_g (B, T, N) in {0,1}. Returns (B, N, 3) (t,x,y).

    "first_visible": query at first visible frame, except the first N//4
    tracks are re-queried at a uniformly random visible frame (reference
    train_on_kubric.py:113-146). "random": all tracks at a random visible
    frame (reference :92-112). Random choice over visible frames uses the
    Gumbel-argmax trick to stay jittable.
    """
    B, T, N = vis_g.shape
    first_positive = jnp.argmax(vis_g, axis=1)  # (B, N)

    g = jax.random.gumbel(rng, (B, T, N))
    logits = jnp.where(vis_g > 0, g, -jnp.inf)
    rand_vis = jnp.argmax(logits, axis=1)  # (B, N) uniform over visible frames

    if method == "random":
        inds = rand_vis
    else:
        n_rand = N // 4
        track_ix = jnp.arange(N)[None, :]
        inds = jnp.where(track_ix < n_rand, rand_vis, first_positive)

    xys = jnp.take_along_axis(trajs_g, inds[:, None, :, None], axis=1)[:, 0]  # (B,N,2)
    return jnp.concatenate([inds[..., None].astype(jnp.float32), xys], axis=-1)


def _online_loss_assembly(
    train_data, trajs_g, vis_g, valids, cfg: TrainConfig, axis_name=None
):
    """Per-sliding-window loss assembly for the online model (reference
    train_on_kubric.py:175-227): slice GT to each S-frame window (step S//2),
    gate valids by the "query started" mask, average losses over windows.

    Windows extending past T are handled by masking the padded frames
    (frame_mask) instead of the reference's truncation — identical means.
    """
    coords_w, vis_w, conf_w, valid_mask = train_data
    T = vis_g.shape[1]
    S = cfg.sliding_window_len
    step = S // 2
    gated_valids = valids * valid_mask

    flow = invis = 0.0
    vis_l = 0.0
    conf_l = 0.0
    for w in range(len(coords_w)):
        ind = w * step
        n_real = min(S, T - ind)

        def sl(x):
            pad = [(0, 0)] * x.ndim
            pad[1] = (0, S - n_real)
            return jnp.pad(x[:, ind : ind + n_real], pad)

        frame_mask = jnp.asarray(
            np.arange(S) < n_real, dtype=jnp.float32
        ) if n_real < S else None
        traj_gt = sl(trajs_g)
        vis_gt = sl(vis_g)
        val = sl(gated_valids)
        if frame_mask is not None:
            val = val * frame_mask[None, :, None]

        flow = flow + sequence_loss(
            coords_w[w], traj_gt, val, vis=vis_gt, gamma=0.8,
            add_huber_loss=cfg.add_huber_loss, loss_only_for_visible=True,
            axis_name=axis_name,
        )
        if not cfg.train_only_on_visible:
            invis = invis + sequence_loss(
                coords_w[w], traj_gt, val, vis=1.0 - vis_gt, gamma=0.8,
                add_huber_loss=False, loss_only_for_visible=True,
                axis_name=axis_name,
            )
        vis_l = vis_l + sequence_bce_loss(
            vis_w[w], vis_gt, frame_mask=frame_mask, axis_name=axis_name
        )
        conf_l = conf_l + jnp.mean(
            sequence_prob_loss(
                coords_w[w], conf_w[w], traj_gt, vis_gt, frame_mask=frame_mask,
                axis_name=axis_name,
            )
        )
    n = len(coords_w)
    return flow / n, invis / n, vis_l / n, conf_l / n


def tracker_loss_fn(
    model,
    params,
    video,
    trajs_g,
    vis_g,
    valids,
    queries,
    cfg: TrainConfig,
    track_mask: Optional[jnp.ndarray] = None,
    axis_name=None,
):
    """Training loss (reference train_on_kubric.py:163-227): single-window
    forward for the offline model, warm-started multi-window forward + the
    per-window loss assembly for the online model (cfg.offline_model=False).

    video (B, T, H, W, 3); trajs_g (B, T, N, 2); vis_g/valids (B, T, N).
    Returns (total_loss, aux dict).

    axis_name: mesh axis name(s) when called inside shard_map with B sharded
    over "data" and N over "track" — every masked mean psums num/den so the
    loss equals the unsharded value (parallel/mesh.py fast sharded step).
    """
    if not cfg.offline_model:
        _, _, _, train_data = model.apply(
            {"params": params},
            video,
            queries,
            iters=cfg.iters,
            is_train=True,
            track_mask=track_mask,
            method="forward_windows",
        )
        if track_mask is not None:
            valids = valids * track_mask[:, None, :].astype(valids.dtype)
        flow_loss, invis_loss, vis_loss, conf_loss = _online_loss_assembly(
            train_data, trajs_g, vis_g, valids, cfg, axis_name=axis_name
        )
        total = flow_loss * cfg.flow_weight + vis_loss + conf_loss
        aux = {
            "flow_loss": flow_loss * cfg.flow_weight,
            "vis_loss": vis_loss,
            "conf_loss": conf_loss,
        }
        if not cfg.train_only_on_visible:
            total = total + invis_loss * cfg.invisible_flow_weight
            aux["invisible_flow_loss"] = invis_loss * cfg.invisible_flow_weight
        aux["total_loss"] = total
        return total, aux

    _, _, _, train_data = model.apply(
        {"params": params},
        video,
        queries,
        iters=cfg.iters,
        is_train=True,
        track_mask=track_mask,
    )
    coord_preds, vis_preds, conf_preds, _ = train_data

    if track_mask is not None:
        valids = valids * track_mask[:, None, :].astype(valids.dtype)

    flow_loss = sequence_loss(
        coord_preds,
        trajs_g,
        valids,
        vis=vis_g,
        gamma=0.8,
        add_huber_loss=cfg.add_huber_loss,
        loss_only_for_visible=True,
        axis_name=axis_name,
    )
    conf_loss = jnp.mean(
        sequence_prob_loss(
            coord_preds, conf_preds, trajs_g, vis_g, axis_name=axis_name
        )
    )
    vis_loss = sequence_bce_loss(vis_preds, vis_g, axis_name=axis_name)

    total = flow_loss * cfg.flow_weight + vis_loss + conf_loss
    aux = {
        "flow_loss": flow_loss * cfg.flow_weight,
        "vis_loss": vis_loss,
        "conf_loss": conf_loss,
    }
    if not cfg.train_only_on_visible:
        invis_loss = sequence_loss(
            coord_preds,
            trajs_g,
            valids,
            vis=1.0 - vis_g,
            gamma=0.8,
            add_huber_loss=False,
            loss_only_for_visible=True,
            axis_name=axis_name,
        )
        total = total + invis_loss * cfg.invisible_flow_weight
        aux["invisible_flow_loss"] = invis_loss * cfg.invisible_flow_weight
    aux["total_loss"] = total
    return total, aux


def make_optimizer(lr: float = 5e-4, wdecay: float = 1e-5, num_steps: int = 50000):
    """AdamW + OneCycle cosine schedule (reference fetch_optimizer,
    train_on_kubric.py:65-76: pct_start=0.05, eps=1e-8, steps+100)."""
    schedule = optax.cosine_onecycle_schedule(
        transition_steps=num_steps + 100,
        peak_value=lr,
        pct_start=0.05,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),  # reference grad clip (train_on_kubric.py:448)
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wdecay),
    )
    return tx, schedule


def make_train_step(model, tx, cfg: TrainConfig):
    """Returns step(params, opt_state, rng, batch) -> (params, opt_state, aux).

    batch: dict(video, trajs_g, vis_g, valids[, track_mask]). Jit/pjit this
    with shardings over a Mesh to scale data-parallel.
    """

    def step(params, opt_state, rng, batch):
        q_rng, _ = jax.random.split(rng)
        queries = sample_queries_from_gt(
            q_rng, batch["trajs_g"], batch["vis_g"], cfg.query_sampling_method
        )
        grads, aux = jax.grad(
            lambda p: tracker_loss_fn(
                model,
                p,
                batch["video"],
                batch["trajs_g"],
                batch["vis_g"],
                batch["valids"],
                queries,
                cfg,
                track_mask=batch.get("track_mask"),
            ),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    return step
