"""Dynamic Replica evaluation dataset.

Numpy re-implementation of the reference DynamicReplicaDataset
(datasets/dr_dataset.py:47-168): gzipped-JSON frame annotations hydrated into
typed dataclasses (datasets/annotations.py, mirroring the reference's
dataclass_utils loader semantics), grouped per sequence ("left" camera),
per-frame .pth files holding img / traj_2d / verts_inds_vis, random track
subsampling, out-of-frame visibility clearing, and the <10-visible-frames
track filter.

torch is only needed to read the per-frame tensor files.
"""

import os
from collections import defaultdict
from typing import Optional, Tuple

import numpy as np

from cotracker_tpu.datasets.annotations import load_frame_annotations
from cotracker_tpu.datasets.utils import CoTrackerData


class DynamicReplicaDataset:
    def __init__(
        self,
        root: str,
        split: str = "valid",
        traj_per_sample: int = 256,
        crop_size: Optional[Tuple[int, int]] = None,
        sample_len: int = -1,
        only_first_n_samples: int = -1,
        seed: int = 0,
    ):
        self.root = root
        self.split = split
        self.traj_per_sample = traj_per_sample
        self.crop_size = crop_size
        self.rng = np.random.default_rng(seed)

        path = os.path.join(root, split, f"frame_annotations_{split}.jgz")
        frame_annots = load_frame_annotations(path)  # schema-validated

        seq_annot = defaultdict(list)
        for fa in frame_annots:
            if fa.camera_name == "left":
                seq_annot[fa.sequence_name].append(fa)

        self.sample_list = []
        for seq_name, frames in seq_annot.items():
            seq_len = len(frames)
            step = sample_len if sample_len > 0 else seq_len
            counter = 0
            for ref in range(0, seq_len, step):
                self.sample_list.append(frames[ref : ref + step])
                counter += 1
                if only_first_n_samples > 0 and counter >= only_first_n_samples:
                    break

    def __len__(self):
        return len(self.sample_list)

    def __getitem__(self, index) -> CoTrackerData:
        import torch

        sample = self.sample_list[index]
        T = len(sample)
        rgbs, visibilities, traj_2d = [], [], []
        H, W = sample[0].image.size

        for fa in sample:
            traj_path = os.path.join(self.root, self.split, fa.trajectories["path"])
            traj = torch.load(traj_path, map_location="cpu", weights_only=False)
            visibilities.append(traj["verts_inds_vis"].numpy())
            rgbs.append(traj["img"].numpy())
            traj_2d.append(traj["traj_2d"].numpy()[..., :2])

        traj_2d = np.stack(traj_2d)
        visibility = np.stack(visibilities)
        _, N, _ = traj_2d.shape

        keep = self.rng.permutation(N)[: self.traj_per_sample]
        traj_2d = traj_2d[:, keep]
        visibility = visibility[:, keep]

        if self.crop_size is not None:
            ch, cw = self.crop_size
            y0 = 0 if ch >= H else (H - ch) // 2
            x0 = 0 if cw >= W else (W - cw) // 2
            rgbs = [r[y0 : y0 + ch, x0 : x0 + cw] for r in rgbs]
            traj_2d[:, :, 0] -= x0
            traj_2d[:, :, 1] -= y0
            H, W = rgbs[0].shape[:2]

        visibility[traj_2d[:, :, 0] > W - 1] = False
        visibility[traj_2d[:, :, 0] < 0] = False
        visibility[traj_2d[:, :, 1] > H - 1] = False
        visibility[traj_2d[:, :, 1] < 0] = False

        keep2 = visibility.sum(0) > 10
        traj_2d = traj_2d[:, keep2]
        visibility = visibility[:, keep2]

        video = np.stack(rgbs).reshape(T, H, W, 3).transpose(0, 3, 1, 2).astype(np.float32)
        return CoTrackerData(
            video=video,
            trajectory=traj_2d.astype(np.float32),
            visibility=visibility,
            valid=np.ones((T, traj_2d.shape[1]), np.float32),
            seq_name=sample[0].sequence_name,
        )
