"""Training-stack tests: loss parity vs reference, query sampling, and a
train-step smoke test (loss decreases on a tiny overfit problem)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import requires_reference

torch = pytest.importorskip("torch")

from cotracker_tpu.training import losses as L  # noqa: E402


def _rand_preds(rng, iters=3, B=1, T=6, N=5):
    flow_preds = rng.standard_normal((iters, B, T, N, 2)).astype(np.float32)
    flow_gt = rng.standard_normal((B, T, N, 2)).astype(np.float32)
    valids = (rng.random((B, T, N)) > 0.2).astype(np.float32)
    vis = (rng.random((B, T, N)) > 0.3).astype(np.float32)
    return flow_preds, flow_gt, valids, vis


@requires_reference
class TestLossParity:
    @pytest.mark.parametrize("huber", [False, True])
    @pytest.mark.parametrize("only_visible", [False, True])
    def test_sequence_loss(self, huber, only_visible):
        from cotracker.models.core.cotracker.losses import sequence_loss as ref_loss

        rng = np.random.default_rng(0)
        fp, gt, valids, vis = _rand_preds(rng)
        ref = ref_loss(
            [[torch.from_numpy(p) for p in fp]],
            [torch.from_numpy(gt)],
            [torch.from_numpy(valids)],
            vis=[torch.from_numpy(vis)],
            gamma=0.8,
            add_huber_loss=huber,
            loss_only_for_visible=only_visible,
        ).item()
        ours = float(
            L.sequence_loss(
                jnp.asarray(fp), jnp.asarray(gt), jnp.asarray(valids), jnp.asarray(vis),
                gamma=0.8, add_huber_loss=huber, loss_only_for_visible=only_visible,
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_bce_loss(self):
        from cotracker.models.core.cotracker.losses import sequence_BCE_loss as ref_bce

        rng = np.random.default_rng(1)
        vis_preds = rng.random((3, 1, 6, 5)).astype(np.float32) * 0.98 + 0.01
        vis_gt = (rng.random((1, 6, 5)) > 0.5).astype(np.float32)
        ref = ref_bce(
            [[torch.from_numpy(p) for p in vis_preds]], [torch.from_numpy(vis_gt)]
        ).item()
        ours = float(L.sequence_bce_loss(jnp.asarray(vis_preds), jnp.asarray(vis_gt)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_prob_loss(self):
        from cotracker.models.core.cotracker.losses import sequence_prob_loss as ref_prob

        rng = np.random.default_rng(2)
        iters, B, T, N = 3, 1, 6, 5
        tracks = (rng.standard_normal((iters, B, T, N, 2)) * 10).astype(np.float32)
        conf = (rng.random((iters, B, T, N)) * 0.98 + 0.01).astype(np.float32)
        target = (rng.standard_normal((B, T, N, 2)) * 10).astype(np.float32)
        vis = (rng.random((B, T, N)) > 0.3).astype(np.float32)
        ref = (
            ref_prob(
                [[torch.from_numpy(t) for t in tracks]],
                [[torch.from_numpy(c) for c in conf]],
                [torch.from_numpy(target)],
                [torch.from_numpy(vis)],
            )
            .mean()
            .item()
        )
        ours = float(
            jnp.mean(
                L.sequence_prob_loss(
                    jnp.asarray(tracks), jnp.asarray(conf), jnp.asarray(target), jnp.asarray(vis)
                )
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


class TestQuerySampling:
    def test_queries_land_on_visible_frames(self):
        from cotracker_tpu.training.train_step import sample_queries_from_gt

        rng = np.random.default_rng(3)
        B, T, N = 2, 10, 16
        vis = (rng.random((B, T, N)) > 0.5).astype(np.float32)
        vis[:, 3] = 1.0  # every track visible somewhere
        trajs = rng.standard_normal((B, T, N, 2)).astype(np.float32)
        q = sample_queries_from_gt(jax.random.PRNGKey(0), jnp.asarray(trajs), jnp.asarray(vis))
        q = np.asarray(q)
        t = q[..., 0].astype(int)
        for b in range(B):
            for n in range(N):
                assert vis[b, t[b, n], n] == 1.0
                np.testing.assert_allclose(q[b, n, 1:], trajs[b, t[b, n], n], rtol=1e-6)
        # non-random tracks (last 3/4) use the first visible frame
        first = np.argmax(vis > 0, axis=1)
        assert (t[:, N // 4 :] == first[:, N // 4 :]).all()


class TestTrainStepSmoke:
    def test_loss_decreases(self):
        from cotracker_tpu.models.cotracker3 import CoTrackerThree
        from cotracker_tpu.models.build import init_params
        from cotracker_tpu.training.train_step import (
            TrainConfig,
            make_optimizer,
            make_train_step,
        )

        model = CoTrackerThree(window_len=8, model_resolution=(32, 32))
        params = init_params(model)
        cfg = TrainConfig(iters=2)
        tx, _ = make_optimizer(lr=3e-4, num_steps=20)
        opt_state = tx.init(params)
        step = jax.jit(make_train_step(model, tx, cfg))

        rng = np.random.default_rng(4)
        B, T, H, W, N = 1, 8, 32, 32, 8
        batch = {
            "video": jnp.asarray(rng.random((B, T, H, W, 3), np.float32) * 255),
            "trajs_g": jnp.asarray(rng.random((B, T, N, 2), np.float32) * 28),
            "vis_g": jnp.asarray(np.ones((B, T, N), np.float32)),
            "valids": jnp.ones((B, T, N), jnp.float32),
        }
        key = jax.random.PRNGKey(0)
        losses = []
        for i in range(8):
            key, sub = jax.random.split(key)
            params, opt_state, aux = step(params, opt_state, sub, batch)
            losses.append(float(aux["total_loss"]))
        assert np.isfinite(losses).all()
        assert min(losses) < losses[0], losses


class TestPallasTraining:
    def test_pallas_corr_grads_match_xla_model(self):
        """A model running the Pallas corr kernel (interpret mode) with
        corr_pallas_grad + remat_iterations produces the same training
        gradients as the plain XLA model — same param tree, same loss."""
        from cotracker_tpu.models.cotracker3 import CoTrackerThree
        from cotracker_tpu.models.build import init_params
        from cotracker_tpu.training.train_step import (
            TrainConfig,
            sample_queries_from_gt,
            tracker_loss_fn,
        )

        plain = CoTrackerThree(window_len=8, model_resolution=(32, 32))
        fast = CoTrackerThree(
            window_len=8, model_resolution=(32, 32),
            use_pallas_corr=True, corr_pallas_grad=True,
            corr_pallas_interpret=True, remat_iterations=True,
        )
        params = init_params(plain)

        rng = np.random.default_rng(11)
        B, T, H, W, N = 1, 8, 32, 32, 4
        video = jnp.asarray(rng.random((B, T, H, W, 3), np.float32) * 255)
        trajs = jnp.asarray(rng.random((B, T, N, 2), np.float32) * 28)
        vis = jnp.ones((B, T, N), jnp.float32)
        valids = jnp.ones((B, T, N), jnp.float32)
        queries = sample_queries_from_gt(jax.random.PRNGKey(0), trajs, vis)
        cfg = TrainConfig(iters=2)

        def grads_of(model):
            return jax.grad(
                lambda p: tracker_loss_fn(
                    model, p, video, trajs, vis, valids, queries, cfg
                ),
                has_aux=True,
            )(params)

        gp, aux_p = grads_of(plain)
        gf, aux_f = grads_of(fast)
        np.testing.assert_allclose(
            float(aux_f["total_loss"]), float(aux_p["total_loss"]), rtol=1e-3
        )
        flat_p = jax.tree_util.tree_leaves_with_path(gp)
        flat_f = jax.tree_util.tree_leaves(gf)
        for (path, a), b in zip(flat_p, flat_f):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = max(np.abs(a).max(), np.abs(b).max(), 1e-8)
            # atol floor: leaves whose gradient is ~0 in both models are
            # f32 accumulation noise (~1e-8) — numerically equal to zero
            np.testing.assert_allclose(
                a, b, rtol=2e-2, atol=max(2e-3 * scale, 1e-7),
                err_msg=jax.tree_util.keystr(path),
            )
