"""End-to-end trainer wiring: eval cadence, vis cadence, prefetching input
pipeline, checkpointing (reference train_on_kubric.py:230-515)."""

import json
import os
import time

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_datasets import _make_kubric_dir  # noqa: E402
from cotracker_tpu.training.trainer import TrainerArgs, train  # noqa: E402
from cotracker_tpu.training.data_loader import PrefetchLoader, RepeatedDataset  # noqa: E402
from cotracker_tpu.datasets.kubric import KubricMovifDataset  # noqa: E402


def _tiny_dataset(tmp_path):
    root = _make_kubric_dir(tmp_path, n_seqs=2, T=10, H=32, W=32, n_traj=32)
    return KubricMovifDataset(
        data_root=root, crop_size=(32, 32), seq_len=8, traj_per_sample=8,
        use_augs=False,
    )


class TestPrefetchLoader:
    def test_keeps_batches_ahead(self, tmp_path):
        ds = _tiny_dataset(tmp_path)
        rng = np.random.default_rng(0)
        loader = PrefetchLoader(ds, batch_size=1, rng=rng, num_workers=2, prefetch=3)
        try:
            b = next(loader)
            assert b["video"].shape == (1, 8, 32, 32, 3)
            assert b["trajs_g"].shape == (1, 8, 8, 2)
            # non-blocking input: while the consumer idles (a training step),
            # workers must refill the queue ahead of the next request
            deadline = time.time() + 10
            while loader.ready() < 1 and time.time() < deadline:
                time.sleep(0.05)
            assert loader.ready() >= 1
        finally:
            loader.close()

    def test_repeated_dataset(self, tmp_path):
        ds = _tiny_dataset(tmp_path)
        rep = RepeatedDataset(ds, repeats=4)
        assert len(rep) == 4 * len(ds)
        s, gotit = rep[len(ds) + 1]
        assert gotit and s.video.shape == (8, 3, 32, 32)


class TestTrainerEndToEnd:
    def test_train_with_eval_and_vis_hooks(self, tmp_path):
        ds = _tiny_dataset(tmp_path / "data")
        exp = str(tmp_path / "exp")
        eval_calls, vis_calls = [], []

        def eval_hook(params, step):
            eval_calls.append(step)
            return {"fake_benchmark": {"delta_avg": 50.0 + step}}

        def vis_hook(params, batch, step):
            vis_calls.append(step)

        args = TrainerArgs(
            exp_dir=exp,
            batch_size=1,
            seq_len=8,
            traj_per_sample=8,
            num_steps=4,
            train_iters=1,
            save_every_n_steps=2,
            eval_every_n_steps=2,
            evaluate_at_start=True,
            save_vis_every_n_steps=4,
            crop_size=(32, 32),
            model_window_len=8,
            use_augs=False,
            num_loader_workers=2,
            dataset_repeats=2,
        )
        from cotracker_tpu.models.cotracker3 import CoTrackerThree

        model = CoTrackerThree(window_len=8, model_resolution=(32, 32))
        train(args, dataset=ds, model=model, eval_hook=eval_hook, vis_hook=vis_hook)

        # eval cadence: at start (0), step 2, step 4 (final)
        assert eval_calls == [0, 2, 4]
        assert vis_calls == [4]
        # eval records persisted
        recs = [json.loads(l) for l in open(os.path.join(exp, "eval_records.jsonl"))]
        assert [r["step"] for r in recs] == [0, 2, 4]
        assert recs[0]["results"]["fake_benchmark"]["delta_avg"] == 50.0
        # checkpoints: cadence + final
        ck = os.listdir(os.path.join(exp, "checkpoints"))
        assert "model_final.pkl" in ck and "model_000000002.pkl" in ck

    def test_online_model_trains(self, tmp_path):
        """offline_model=False goes through the multi-window loss path."""
        ds = _tiny_dataset(tmp_path / "data")
        exp = str(tmp_path / "exp")
        args = TrainerArgs(
            exp_dir=exp, batch_size=1, seq_len=8, traj_per_sample=8,
            num_steps=2, train_iters=1, save_every_n_steps=0,
            crop_size=(32, 32), offline_model=False, model_window_len=6,
            use_augs=False, num_loader_workers=1, dataset_repeats=1,
        )
        from cotracker_tpu.models.cotracker3 import CoTrackerThree

        model = CoTrackerThree(window_len=6, model_resolution=(32, 32))
        params = train(args, dataset=ds, model=model)
        assert params is not None
