"""Online-model training path: multi-window forward + per-window loss
assembly vs the reference (cotracker3_online.py:266-541 with is_online=False,
train_on_kubric.py:163-227) with identical weights and inputs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import requires_reference

torch = pytest.importorskip("torch")

from cotracker_tpu.models.cotracker3 import CoTrackerThree  # noqa: E402
from cotracker_tpu.models.checkpoint import import_torch_state_dict  # noqa: E402
from cotracker_tpu.training.train_step import TrainConfig, tracker_loss_fn  # noqa: E402


def _make_pair(window_len=8):
    from cotracker.models.core.cotracker.cotracker3_online import CoTrackerThreeOnline

    torch.manual_seed(11)
    ref = CoTrackerThreeOnline(
        stride=4, corr_radius=3, window_len=window_len, model_resolution=(384, 512)
    ).eval()
    params = import_torch_state_dict(ref.state_dict())
    ours = CoTrackerThree(window_len=window_len)
    return ref, ours, params


def _rand_inputs(rng, B, T, H, W, N):
    video = (rng.random((B, T, 3, H, W)) * 255).astype(np.float32)
    queries = np.stack(
        [
            rng.integers(0, T, (B, N)).astype(np.float32),
            rng.random((B, N)) * (W - 1),
            rng.random((B, N)) * (H - 1),
        ],
        axis=-1,
    ).astype(np.float32)
    return video, queries


def _ref_loss_assembly(ref, video, queries, trajs_g, vis_g, valids, S, iters):
    """Reference loss math, transcribed from train_on_kubric.py:163-227 with
    args.offline_model=False (behavioral oracle for the test)."""
    from cotracker.models.core.cotracker.losses import (
        sequence_loss,
        sequence_BCE_loss,
        sequence_prob_loss,
    )

    with torch.no_grad():
        _, _, _, train_data = ref(
            video=torch.from_numpy(video),
            queries=torch.from_numpy(queries),
            iters=iters,
            is_train=True,
        )
    coord_p, vis_p, conf_p, valid_mask = train_data
    T = vis_g.shape[1]
    vis_g = torch.from_numpy(vis_g)
    trajs_g = torch.from_numpy(trajs_g)
    valids = torch.from_numpy(valids)

    vis_gts, invis_gts, traj_gts, valids_gts = [], [], [], []
    for ind in range(0, T - S // 2, S // 2):
        vis_gts.append(vis_g[:, ind : ind + S])
        invis_gts.append(1 - vis_g[:, ind : ind + S])
        traj_gts.append(trajs_g[:, ind : ind + S])
        val = valids[:, ind : ind + S] * valid_mask[:, ind : ind + S]
        valids_gts.append(val)

    flow = sequence_loss(
        coord_p, traj_gts, valids_gts, vis=vis_gts, gamma=0.8,
        add_huber_loss=False, loss_only_for_visible=True,
    )
    invis = sequence_loss(
        coord_p, traj_gts, valids_gts, vis=invis_gts, gamma=0.8,
        add_huber_loss=False, loss_only_for_visible=True,
    )
    conf = sequence_prob_loss(coord_p, conf_p, traj_gts, vis_gts)
    vis_l = sequence_BCE_loss(vis_p, vis_gts)
    total = flow.mean() * 0.05 + invis.mean() * 0.01 + vis_l.mean() + conf.mean()
    return {
        "flow_loss": flow.mean().item() * 0.05,
        "invisible_flow_loss": invis.mean().item() * 0.01,
        "vis_loss": vis_l.mean().item(),
        "conf_loss": conf.mean().item(),
        "total_loss": total.item(),
    }


@requires_reference
class TestOnlineTraining:
    def test_multiwindow_forward_parity(self):
        """forward_windows == reference non-online sliding-window forward."""
        ref, ours, params = _make_pair(window_len=8)
        rng = np.random.default_rng(20)
        B, T, H, W, N = 1, 20, 64, 96, 5
        video, queries = _rand_inputs(rng, B, T, H, W, N)

        with torch.no_grad():
            ref_coords, ref_vis, ref_conf, _ = ref(
                torch.from_numpy(video), torch.from_numpy(queries), iters=2
            )
        coords, vis, conf, _ = ours.apply(
            {"params": params},
            jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(queries),
            iters=2,
            method="forward_windows",
        )
        np.testing.assert_allclose(np.asarray(coords), ref_coords.numpy(), rtol=1e-3, atol=5e-2)
        np.testing.assert_allclose(np.asarray(vis), ref_vis.numpy(), rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(conf), ref_conf.numpy(), rtol=1e-3, atol=2e-3)

    @pytest.mark.parametrize("T", [20, 18])  # 18: last window truncated
    def test_online_loss_parity(self, T):
        ref, ours, params = _make_pair(window_len=8)
        rng = np.random.default_rng(21)
        B, H, W, N = 1, 64, 96, 6
        video, queries = _rand_inputs(rng, B, T, H, W, N)
        trajs_g = (rng.random((B, T, N, 2)) * np.array([W - 1, H - 1])).astype(np.float32)
        vis_g = (rng.random((B, T, N)) > 0.3).astype(np.float32)
        valids = (rng.random((B, T, N)) > 0.1).astype(np.float32)

        ref_losses = _ref_loss_assembly(
            ref, video, queries, trajs_g, vis_g, valids, S=8, iters=2
        )

        cfg = TrainConfig(iters=2, offline_model=False, sliding_window_len=8)
        total, aux = tracker_loss_fn(
            ours,
            params,
            jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
            jnp.asarray(trajs_g),
            jnp.asarray(vis_g),
            jnp.asarray(valids),
            jnp.asarray(queries),
            cfg,
        )
        for k in ("flow_loss", "invisible_flow_loss", "vis_loss", "conf_loss", "total_loss"):
            np.testing.assert_allclose(
                float(aux[k]), ref_losses[k], rtol=2e-3, atol=2e-4, err_msg=k
            )

    def test_online_train_step_grads(self):
        """jax.grad through the multi-window forward is finite and nonzero."""
        _, ours, params = _make_pair(window_len=8)
        rng = np.random.default_rng(22)
        B, T, H, W, N = 1, 12, 32, 32, 3
        video, queries = _rand_inputs(rng, B, T, H, W, N)
        trajs_g = (rng.random((B, T, N, 2)) * 24).astype(np.float32)
        vis_g = np.ones((B, T, N), np.float32)
        valids = np.ones((B, T, N), np.float32)
        cfg = TrainConfig(iters=1, offline_model=False, sliding_window_len=8)

        def loss(p):
            t, _ = tracker_loss_fn(
                ours, p,
                jnp.asarray(video.transpose(0, 1, 3, 4, 2)),
                jnp.asarray(trajs_g), jnp.asarray(vis_g), jnp.asarray(valids),
                jnp.asarray(queries), cfg,
            )
            return t

        grads = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        gnorm = sum(float(jnp.sum(g.astype(jnp.float32) ** 2)) for g in leaves) ** 0.5
        assert gnorm > 0
