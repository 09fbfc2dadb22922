"""Dataset-layer tests on synthetic on-disk data: Kubric reader + augs,
local real-video dataset, visualizer mp4 export."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cotracker_tpu.datasets.kubric import KubricMovifDataset  # noqa: E402
from cotracker_tpu.datasets.utils import collate_fn_train  # noqa: E402
from cotracker_tpu.utils.visualizer import Visualizer  # noqa: E402


def _make_kubric_dir(tmp_path, n_seqs=2, T=30, H=64, W=96, n_traj=256):
    rng = np.random.default_rng(0)
    for s in range(n_seqs):
        name = f"seq{s:03d}"
        d = os.path.join(tmp_path, name, "frames")
        os.makedirs(d)
        for t in range(T):
            img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(d, f"{t:03d}.png"), img)
        coords = (rng.random((n_traj, T, 2)) * [W - 1, H - 1]).astype(np.float32)
        occluded = rng.random((n_traj, T)) > 0.9
        np.save(
            os.path.join(tmp_path, name, name + ".npy"),
            {"coords": coords, "visibility": occluded},
            allow_pickle=True,
        )
    return str(tmp_path)


class TestKubricDataset:
    @pytest.mark.parametrize("use_augs", [False, True])
    def test_loads_and_shapes(self, tmp_path, use_augs):
        root = _make_kubric_dir(tmp_path)
        ds = KubricMovifDataset(
            data_root=root,
            crop_size=(48, 64),
            seq_len=12,
            traj_per_sample=16,
            use_augs=use_augs,
        )
        assert len(ds) == 2
        sample, gotit = ds[0]
        assert gotit
        assert sample.video.shape == (12, 3, 48, 64)
        assert sample.trajectory.shape == (12, 16, 2)
        assert sample.visibility.shape == (12, 16)
        # every sampled track must be visible at first or mid frame
        vis_first_or_mid = sample.visibility[0] + sample.visibility[6]
        assert (vis_first_or_mid > 0).all()

    def test_collate_train(self, tmp_path):
        root = _make_kubric_dir(tmp_path)
        ds = KubricMovifDataset(root, crop_size=(48, 64), seq_len=8, traj_per_sample=8)
        batch, gotit = collate_fn_train([ds[0], ds[1]])
        assert batch.video.shape[0] == 2
        assert all(gotit)


class TestVisualizer:
    def test_mp4_export(self, tmp_path):
        rng = np.random.default_rng(1)
        T, H, W, N = 6, 48, 64, 5
        video = (rng.random((1, T, 3, H, W)) * 255).astype(np.float32)
        tracks = (rng.random((1, T, N, 2)) * [W - 1, H - 1]).astype(np.float32)
        vis = rng.random((1, T, N)) > 0.3
        v = Visualizer(save_dir=str(tmp_path), tracks_leave_trace=3)
        frames = v.visualize(video, tracks, vis, filename="t")
        assert frames.shape[-1] == 3
        out = os.path.join(tmp_path, "t.mp4")
        assert os.path.exists(out) and os.path.getsize(out) > 0

    @pytest.mark.parametrize("mode", ["rainbow", "cool", "optical_flow"])
    def test_color_modes(self, tmp_path, mode):
        rng = np.random.default_rng(2)
        T, H, W, N = 5, 40, 56, 4
        video = (rng.random((1, T, 3, H, W)) * 255).astype(np.float32)
        tracks = (rng.random((1, T, N, 2)) * [W - 1, H - 1] + 1).astype(np.float32)
        v = Visualizer(save_dir=str(tmp_path), mode=mode, show_first_frame=0)
        frames = v.visualize(video, tracks, save_video=False)
        assert frames.shape == (T, H, W, 3) and frames.dtype == np.uint8

    def test_segm_mask_and_camera_motion(self, tmp_path):
        rng = np.random.default_rng(3)
        T, H, W, N = 5, 40, 56, 6
        video = (rng.random((1, T, 3, H, W)) * 255).astype(np.float32)
        tracks = (rng.random((1, T, N, 2)) * [W - 1, H - 1] + 1).astype(np.float32)
        segm = np.zeros((1, 1, H, W), np.uint8)
        segm[..., :, : W // 2] = 1  # left half = foreground
        gt = tracks + 1.5
        v = Visualizer(save_dir=str(tmp_path), tracks_leave_trace=-1)
        frames = v.visualize(
            video, tracks, gt_tracks=gt, segm_mask=segm,
            compensate_for_camera_motion=True, save_video=False, opacity=0.6,
        )
        assert frames.shape[1:] == (H, W, 3)

    def test_tensorboard_writer_hook(self, tmp_path):
        torch = pytest.importorskip("torch")  # noqa: F841
        from torch.utils.tensorboard import SummaryWriter

        rng = np.random.default_rng(4)
        video = (rng.random((1, 4, 3, 32, 40)) * 255).astype(np.float32)
        tracks = (rng.random((1, 4, 3, 2)) * [39, 31]).astype(np.float32)
        writer = SummaryWriter(log_dir=str(tmp_path))
        v = Visualizer(save_dir=str(tmp_path))
        v.visualize(video, tracks, filename="tb", writer=writer, step=1)
        writer.close()
        assert any(f.startswith("events") for f in os.listdir(tmp_path))


class TestDynamicReplica:
    """Typed-annotation hydration (datasets/annotations.py; reference
    dataclass_utils.py:17-168 semantics: strict keys, required fields,
    recursive generics) + the DR dataset end-to-end on a synthetic tree."""

    def _annot(self, seq, t, with_traj=True):
        a = {
            "sequence_name": seq,
            "frame_number": t,
            "frame_timestamp": t / 24.0,
            "image": {"path": f"{seq}/images/{t:05d}.jpg", "size": [24, 32]},
            "camera_name": "left",
        }
        if with_traj:
            a["trajectories"] = {"path": f"{seq}/traj/{t:05d}.pth"}
        return a

    def _tree(self, tmp_path, T=6, N=8):
        import gzip, json
        import torch

        root = os.path.join(tmp_path, "dr")
        split_dir = os.path.join(root, "valid")
        annots = [self._annot("seq_x", t) for t in range(T)]
        # a right-camera record must be filtered out, not break grouping
        annots.append({**self._annot("seq_x", 0), "camera_name": "right"})
        os.makedirs(split_dir, exist_ok=True)
        with gzip.open(
            os.path.join(split_dir, "frame_annotations_valid.jgz"), "wt"
        ) as f:
            json.dump(annots, f)
        rng = np.random.default_rng(3)
        for t in range(T):
            d = os.path.join(split_dir, "seq_x", "traj")
            os.makedirs(d, exist_ok=True)
            torch.save(
                {
                    "img": torch.tensor(
                        (rng.random((24, 32, 3)) * 255).astype(np.float32)
                    ),
                    "traj_2d": torch.tensor(
                        np.concatenate(
                            [
                                rng.random((N, 2)).astype(np.float32) * 20,
                                np.zeros((N, 1), np.float32),
                            ],
                            axis=1,
                        )
                    ),
                    "verts_inds_vis": torch.ones(N, dtype=torch.bool),
                },
                os.path.join(d, f"{t:05d}.pth"),
            )
        return root

    def test_loads_synthetic_tree(self, tmp_path):
        pytest.importorskip("torch")
        from cotracker_tpu.datasets.dynamic_replica import DynamicReplicaDataset

        T = 12  # > 10 so always-visible tracks survive the <10-visible filter
        root = self._tree(tmp_path, T=T)
        ds = DynamicReplicaDataset(root=root, split="valid", traj_per_sample=8)
        assert len(ds) == 1
        s = ds[0]
        assert s.video.shape == (T, 3, 24, 32)
        assert s.trajectory.shape == (T, 8, 2)
        assert s.visibility.shape == s.valid.shape == (T, 8)
        assert bool(s.visibility.all())
        assert s.seq_name == "seq_x"

    def test_malformed_annotations_raise(self, tmp_path):
        from cotracker_tpu.datasets.annotations import (
            AnnotationError,
            DynamicReplicaFrameAnnotation,
            hydrate,
        )

        good = self._annot("s", 0)
        a = hydrate(good, DynamicReplicaFrameAnnotation)
        assert a.image.size == (24, 32) and a.camera_name == "left"

        bad_key = {**good, "bogus": 1}
        with pytest.raises(AnnotationError, match="unknown key"):
            hydrate(bad_key, DynamicReplicaFrameAnnotation)

        missing = {k: v for k, v in good.items() if k != "sequence_name"}
        with pytest.raises(AnnotationError, match="missing required"):
            hydrate(missing, DynamicReplicaFrameAnnotation)

        bad_type = {**good, "frame_number": "zero"}
        with pytest.raises(AnnotationError, match="expected int"):
            hydrate(bad_type, DynamicReplicaFrameAnnotation)

        bad_nested = {**good, "image": {"path": "p"}}  # size missing
        with pytest.raises(AnnotationError, match="missing required"):
            hydrate(bad_nested, DynamicReplicaFrameAnnotation)

        bad_tuple = {**good, "image": {"path": "p", "size": [1, 2, 3]}}
        with pytest.raises(AnnotationError, match="2-tuple"):
            hydrate(bad_tuple, DynamicReplicaFrameAnnotation)
