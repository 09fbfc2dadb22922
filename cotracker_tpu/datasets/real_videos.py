"""Real-video dataset for pseudo-label distillation.

The reference RealDataset (real_dataset.py) reads a proprietary web-video
corpus that was deliberately not released (its __init__ raises,
real_dataset.py:40). This module provides the same interface plus a working
local-files implementation: point it at a directory of video files and it
yields fixed-length clips with the reference's sampling behaviors
(loop-padding short clips, random frame-rate <= 4, center crop + resize).
"""

import os
from typing import Tuple

import numpy as np

from cotracker_tpu.datasets.utils import CoTrackerData

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm")


class RealDataset:
    """Interface-compatible stand-in for the unreleased corpus: raises, like
    the reference (real_dataset.py:40)."""

    def __init__(self, *a, **k):
        raise ValueError(
            "We cannot release this dataset. Use LocalVideoDataset with your "
            "own video files instead."
        )


class LocalVideoDataset:
    def __init__(
        self,
        data_root: str,
        crop_size: Tuple[int, int] = (384, 512),
        seq_len: int = 64,
        random_frame_rate: bool = True,
        max_frame_rate: int = 4,
        seed: int = 0,
    ):
        self.data_root = data_root
        self.crop_size = crop_size
        self.seq_len = seq_len
        self.random_frame_rate = random_frame_rate
        self.max_frame_rate = max_frame_rate
        self.rng = np.random.default_rng(seed)
        self.paths = sorted(
            os.path.join(data_root, f)
            for f in os.listdir(data_root)
            if f.lower().endswith(VIDEO_EXTS)
        )

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        import cv2

        cap = cv2.VideoCapture(self.paths[index])
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
        cap.release()
        if not frames:
            return None, False

        video = np.stack(frames)
        # loop-pad short clips (reference real_dataset.py:237-238)
        while len(video) < self.seq_len:
            video = np.concatenate([video, video[::-1]], axis=0)

        frame_rate = 1
        if self.random_frame_rate:
            max_fr = max(1, min(self.max_frame_rate, len(video) // self.seq_len))
            frame_rate = int(self.rng.integers(1, max_fr + 1))
        max_start = len(video) - self.seq_len * frame_rate
        start = int(self.rng.integers(0, max_start + 1)) if max_start > 0 else 0
        video = video[start : start + self.seq_len * frame_rate : frame_rate]

        # resize to crop size
        ch, cw = self.crop_size
        video = np.stack([cv2.resize(f, (cw, ch), interpolation=cv2.INTER_LINEAR) for f in video])
        return (
            CoTrackerData(
                video=video.transpose(0, 3, 1, 2).astype(np.float32),
                seq_name=os.path.basename(self.paths[index]),
            ),
            True,
        )
