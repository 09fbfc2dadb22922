"""Evaluator: drives a predictor over a dataset and aggregates metrics.

Mirrors the reference Evaluator (evaluation/core/evaluator.py:25-288):
per-sequence loop, GT (t, y, x) -> (t, x, y) query conversion, strided
backward-merge, TAP-Vid / Dynamic Replica metrics with running averages.
"""

import logging
from typing import Optional

import numpy as np

from cotracker_tpu.evaluation.eval_utils import (
    compute_tapvid_metrics,
    compute_dynamic_replica_metrics,
)


class Evaluator:
    def __init__(self, exp_dir: Optional[str] = None):
        self.exp_dir = exp_dir

    def compute_metrics(self, metrics, sample, pred_trajectory, pred_visibility, dataset_name):
        if "tapvid" in dataset_name:
            traj = np.asarray(sample.trajectory)[None] if sample.trajectory.ndim == 3 else np.asarray(sample.trajectory)
            vis_gt = np.asarray(sample.visibility)[None] if sample.visibility.ndim == 2 else np.asarray(sample.visibility)
            B, T, N, _ = traj.shape
            pred_visibility = np.asarray(pred_visibility)
            if pred_visibility.dtype != bool:
                pred_visibility = pred_visibility > 0.6
            pred_trajectory = np.asarray(pred_trajectory)[:, :, :N]
            pred_visibility = pred_visibility[:, :, :N]

            qp = np.asarray(sample.query_points)
            if qp.ndim == 2:
                qp = qp[None]

            out = compute_tapvid_metrics(
                qp,
                ~vis_gt.transpose(0, 2, 1).astype(bool),
                traj.transpose(0, 2, 1, 3),
                ~pred_visibility.transpose(0, 2, 1),
                pred_trajectory.transpose(0, 2, 1, 3),
                query_mode="strided" if "strided" in dataset_name else "first",
            )
            out = {k: float(np.mean(v)) for k, v in out.items()}
        elif dataset_name in ("dynamic_replica", "pointodyssey"):
            vis_gt = np.asarray(sample.visibility)
            if vis_gt.ndim == 2:
                vis_gt = vis_gt[None]
            traj = np.asarray(sample.trajectory)
            if traj.ndim == 3:
                traj = traj[None]
            H, W = np.asarray(sample.video).shape[-2:]
            out = compute_dynamic_replica_metrics(
                np.asarray(pred_trajectory)[..., :2],
                traj[..., :2],
                vis_gt.astype(np.float64),
                (H, W),
            )
        else:
            raise ValueError(f"unknown dataset {dataset_name}")

        metrics[sample.seq_name] = out
        avg = {}
        for k in out:
            avg[k] = float(np.mean([v[k] for name, v in metrics.items() if name != "avg"]))
        metrics["avg"] = avg
        logging.info("%s: %s", sample.seq_name, out)
        return out

    def evaluate_sequence(
        self,
        predictor,
        dataset,
        dataset_name: str,
        verbose: bool = True,
        visualizer=None,
        visualize_every: int = 1,
        writer=None,
        step: int = 0,
    ):
        """predictor: callable (video (1,T,3,H,W), queries (1,N,3)) ->
        (tracks, vis). For online predictors pass an OnlineWrapper (below).

        When `visualizer` (utils.visualizer.Visualizer) is given, track
        overlays are saved every `visualize_every` sequences (reference
        evaluator.py:279-286). When exp_dir is set, per-sequence metrics +
        the running average are dumped to result_<dataset_name>.json."""
        metrics = {}
        for ind in range(len(dataset)):
            sample = dataset[ind]
            video = np.asarray(sample.video)[None]  # (1, T, 3, H, W)

            if "tapvid" in dataset_name:
                qp = np.asarray(sample.query_points, np.float32)
                queries = np.stack([qp[:, 0], qp[:, 2], qp[:, 1]], axis=1)[None]
            else:
                traj = np.asarray(sample.trajectory)
                queries = np.concatenate(
                    [np.zeros_like(traj[0, :, :1]), traj[0]], axis=1
                )[None].astype(np.float32)

            pred_tracks, pred_vis = predictor(video, queries)
            pred_tracks = np.asarray(pred_tracks)
            pred_vis = np.asarray(pred_vis)

            if "strided" in dataset_name:
                # backward pass for queries not on frame 0
                # (reference evaluator.py:257-273: re-run on the reversed
                # video and fill where the forward pass produced zeros)
                inv_video = video[:, ::-1]
                inv_queries = queries.copy()
                inv_queries[:, :, 0] = video.shape[1] - inv_queries[:, :, 0] - 1
                inv_tracks, inv_vis = predictor(inv_video, inv_queries)
                inv_tracks = np.asarray(inv_tracks)[:, ::-1]
                inv_vis = np.asarray(inv_vis)[:, ::-1]
                mask = pred_tracks == 0
                pred_tracks = np.where(mask, inv_tracks, pred_tracks)
                pred_vis = np.where(mask[..., 0], inv_vis, pred_vis)

            if visualizer is not None and ind % max(1, visualize_every) == 0:
                visualizer.visualize(
                    video,
                    pred_tracks,
                    pred_vis if pred_vis.dtype == bool else pred_vis > 0.6,
                    filename=f"{dataset_name}_{sample.seq_name}",
                    writer=writer,
                    step=step,
                )
            self.compute_metrics(metrics, sample, pred_tracks, pred_vis, dataset_name)
            if verbose:
                print(f"[{ind + 1}/{len(dataset)}] {sample.seq_name}: avg={metrics['avg']}")
        if self.exp_dir is not None:
            import json
            import os

            os.makedirs(self.exp_dir, exist_ok=True)
            path = os.path.join(self.exp_dir, f"result_{dataset_name}.json")
            with open(path, "w") as f:
                json.dump(metrics, f, indent=2, default=float)
        return metrics


class OnlineWrapper:
    """Adapts CoTrackerOnlinePredictor to the (video, queries) evaluator
    interface by driving the chunk loop (reference evaluator.py:234-253)."""

    def __init__(self, online_predictor):
        self.p = online_predictor

    def __call__(self, video, queries):
        T = video.shape[1]
        self.p(video[:, :1], is_first_step=True, queries=queries, add_support_grid=False)
        step = self.p.step
        tracks = vis = None
        for ind in range(0, T - step, step):
            tracks, vis = self.p(video[:, ind : ind + step * 2])
        if getattr(self.p, "return_full_buffers", False):
            # fixed-capacity buffers: slice the valid prefix once at the end
            fs = self.p.frames_seen
            tracks, vis = tracks[:, :fs], vis[:, :fs]
        return tracks, vis
