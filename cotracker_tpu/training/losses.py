"""Training losses (mirrors reference losses.py:14-118 and the loss assembly
in train_on_kubric.py:191-227).

All losses operate on per-iteration stacked predictions
(iters, B, T, N, ...) — the natural output of the scan/unrolled update loop —
instead of the reference's nested python lists.
"""

import jax
import jax.numpy as jnp

from cotracker_tpu.ops.masked import reduce_masked_mean


def huber(x, y, delta: float = 1.0):
    """Elementwise Huber loss (reference losses.py:48-53)."""
    diff = x - y
    a = jnp.abs(diff)
    flag = (a <= delta).astype(x.dtype)
    return flag * 0.5 * diff**2 + (1 - flag) * delta * (a - 0.5 * delta)


def sequence_loss(
    flow_preds,
    flow_gt,
    valids,
    vis=None,
    gamma: float = 0.8,
    add_huber_loss: bool = False,
    loss_only_for_visible: bool = False,
    axis_name=None,
):
    """Gamma-discounted per-iteration flow loss (reference losses.py:14-45).

    flow_preds: (iters, B, T, N, 2); flow_gt (B, T, N, 2); valids (B, T, N);
    vis (B, T, N) optional visibility gate.

    axis_name: optional mesh axis name(s); inside shard_map the masked means
    reduce over the global (B, N) via psum — the track-sharded train step.
    """
    iters = flow_preds.shape[0]
    total = 0.0
    for i in range(iters):
        w = gamma ** (iters - i - 1)
        if add_huber_loss:
            i_loss = huber(flow_preds[i], flow_gt, delta=6.0)
        else:
            i_loss = jnp.abs(flow_preds[i] - flow_gt)
        i_loss = jnp.mean(i_loss, axis=3)  # B, T, N
        valid = valids
        if loss_only_for_visible and vis is not None:
            valid = valid * vis
        total = total + w * reduce_masked_mean(i_loss, valid, axis_name=axis_name)
    return total / iters


def _bce(prob, target):
    # matches torch F.binary_cross_entropy on probabilities (log terms clamped
    # to stay finite at saturation). The inner maximum keeps the *gradient*
    # finite too: log(0) would otherwise produce 0 * inf = NaN in the backward
    # pass. The floor must be a NORMAL f32 (subnormals are flushed to zero by
    # XLA, resurrecting the 0/0): 1e-37 caps the log at ~-85.2 vs torch's -100
    # clamp — only differing for fully saturated probs.
    tiny = 1e-37
    log_p = jnp.maximum(jnp.log(jnp.maximum(prob, tiny)), -100.0)
    log_1mp = jnp.maximum(jnp.log(jnp.maximum(1.0 - prob, tiny)), -100.0)
    return -(target * log_p + (1.0 - target) * log_1mp)


def sequence_bce_loss(vis_preds, vis_gt, frame_mask=None, axis_name=None):
    """Mean BCE over iterations (reference losses.py:56-66).

    vis_preds: (iters, B, T, N) probabilities; vis_gt (B, T, N) in {0,1}.
    frame_mask: optional (T,) validity — padded window frames are excluded
    from the mean (the reference truncates such frames instead,
    cotracker3_online.py:508-518; masked mean over full static windows is
    numerically identical).
    axis_name: optional mesh axis name(s) — psum num/den so the mean covers
    the global (B, N) when those axes are sharded under shard_map.
    """
    iters = vis_preds.shape[0]
    total = 0.0
    for i in range(iters):
        bce = _bce(vis_preds[i], vis_gt)
        if frame_mask is None:
            num = jnp.sum(bce)
            den = jnp.asarray(float(bce.size), jnp.float32)
        else:
            m = frame_mask[None, :, None]
            num = jnp.sum(bce * m)
            den = jnp.sum(m) * bce.shape[0] * bce.shape[2]
        if axis_name is not None:
            num, den = jax.lax.psum((num, den), axis_name)
        total = total + num / den
    return total / iters


def sequence_prob_loss(
    tracks,
    confidence,
    target_points,
    visibility,
    expected_dist_thresh: float = 12.0,
    frame_mask=None,
    axis_name=None,
):
    """Confidence loss: classify "err <= 12px" (reference losses.py:69-93).

    tracks (iters, B, T, N, 2); confidence (iters, B, T, N) probabilities;
    target_points (B, T, N, 2); visibility (B, T, N). frame_mask as in
    sequence_bce_loss.

    axis_name: optional mesh axis name(s) — when set (shard_map over sharded
    B/N), returns the SCALAR global mean (the caller's outer jnp.mean over B
    is then an identity) via psum'ed num/den.
    """
    iters = tracks.shape[0]
    total = 0.0
    for i in range(iters):
        err = jnp.sum((jax.lax.stop_gradient(tracks[i]) - target_points) ** 2, axis=-1)
        valid = (err <= expected_dist_thresh**2).astype(jnp.float32)
        logprob = _bce(confidence[i], valid) * visibility
        if axis_name is not None:
            if frame_mask is None:
                num = jnp.sum(logprob)
                den = jnp.asarray(float(logprob.size), jnp.float32)
            else:
                m = frame_mask[None, :, None]
                num = jnp.sum(logprob * m)
                den = jnp.sum(frame_mask) * logprob.shape[0] * logprob.shape[2]
            num, den = jax.lax.psum((num, den), axis_name)
            total = total + num / den
        elif frame_mask is None:
            total = total + jnp.mean(logprob, axis=(1, 2))
        else:
            m = frame_mask[None, :, None]
            total = total + jnp.sum(logprob * m, axis=(1, 2)) / (
                jnp.sum(frame_mask) * logprob.shape[2]
            )
    return total / iters
