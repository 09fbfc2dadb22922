"""Kubric MOVi-f supervised training dataset (numpy/cv2; no torch).

Re-implements the reference KubricMovifDataset (kubric_movif_dataset.py):
per-sequence `frames/` pngs + `<seq>.npy` annotation dicts with "coords"
(N, T, 2) and "visibility" (occlusion flags, N, T); random seq-len /
frame-rate / num-traj schedules; photometric augs (eraser, replace, color
jitter, gaussian blur); spatial augs (pad, drifting scale-stretch, drifting
crop, flips); sampling of `traj_per_sample` tracks visible at the first /
middle (/ last) frame; failure -> zeroed sample with gotit=False.

Augmentation randomness is this framework's own (numpy Generator); the
*distribution* matches the reference's documented parameters.
"""

import os
from typing import Tuple

import numpy as np

from cotracker_tpu.datasets.utils import CoTrackerData


def _color_jitter(rng, img, brightness=0.2, contrast=0.2, saturation=0.2, hue=0.25 / 3.14):
    """PIL-free color jitter over a uint8 HWC image."""
    import cv2

    out = img.astype(np.float32)
    # brightness
    out = out * rng.uniform(1 - brightness, 1 + brightness)
    # contrast
    mean = out.mean()
    out = (out - mean) * rng.uniform(1 - contrast, 1 + contrast) + mean
    out = np.clip(out, 0, 255).astype(np.uint8)
    hsv = cv2.cvtColor(out, cv2.COLOR_RGB2HSV).astype(np.float32)
    # saturation / hue
    hsv[..., 1] *= rng.uniform(1 - saturation, 1 + saturation)
    hsv[..., 0] = (hsv[..., 0] + rng.uniform(-hue, hue) * 180.0) % 180.0
    hsv[..., 1] = np.clip(hsv[..., 1], 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def _gaussian_blur(rng, img, ksize=11, sigma=(0.1, 2.0)):
    import cv2

    s = rng.uniform(*sigma)
    return cv2.GaussianBlur(img, (ksize, ksize), s)


class CoTrackerDataset:
    """Base with the augmentation pipeline (reference kubric_movif_dataset.py:20-366)."""

    def __init__(
        self,
        data_root: str,
        crop_size: Tuple[int, int] = (384, 512),
        seq_len: int = 24,
        traj_per_sample: int = 768,
        sample_vis_last_frame: bool = False,
        use_augs: bool = False,
        seed: int = 0,
    ):
        self.data_root = data_root
        self.crop_size = crop_size
        self.seq_len = seq_len
        self.traj_per_sample = traj_per_sample
        self.sample_vis_last_frame = sample_vis_last_frame
        self.use_augs = use_augs
        self.rng = np.random.default_rng(seed)

        self.blur_aug_prob = 0.25
        self.color_aug_prob = 0.25
        self.eraser_aug_prob = 0.5
        self.eraser_bounds = [2, 100]
        self.eraser_max = 10
        self.replace_aug_prob = 0.5
        self.replace_bounds = [2, 100]
        self.replace_max = 10
        self.pad_bounds = [0, 100]
        self.resize_lim = [0.25, 2.0]
        self.resize_delta = 0.2
        self.max_crop_offset = 50
        self.do_flip = True
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.5

    def __getitem__(self, index):
        sample, gotit = self.getitem_helper(index)
        if not gotit:
            sample = CoTrackerData(
                video=np.zeros((self.seq_len, 3, *self.crop_size), np.float32),
                trajectory=np.zeros((self.seq_len, self.traj_per_sample, 2), np.float32),
                visibility=np.zeros((self.seq_len, self.traj_per_sample), np.float32),
                valid=np.zeros((self.seq_len, self.traj_per_sample), np.float32),
            )
        return sample, gotit

    # ------------------------------------------------------------ photometric

    def add_photometric_augs(self, rgbs, trajs, visibles, eraser=True, replace=True):
        rng = self.rng
        S = len(rgbs)
        H, W = rgbs[0].shape[:2]

        if eraser:
            rgbs = [r.astype(np.float32) for r in rgbs]
            for i in range(1, S):
                if rng.random() < self.eraser_aug_prob:
                    for _ in range(rng.integers(1, self.eraser_max + 1)):
                        xc, yc = rng.integers(0, W), rng.integers(0, H)
                        dx = rng.integers(*self.eraser_bounds)
                        dy = rng.integers(*self.eraser_bounds)
                        x0 = int(np.clip(xc - dx / 2, 0, W - 1).round())
                        x1 = int(np.clip(xc + dx / 2, 0, W - 1).round())
                        y0 = int(np.clip(yc - dy / 2, 0, H - 1).round())
                        y1 = int(np.clip(yc + dy / 2, 0, H - 1).round())
                        if x1 <= x0 or y1 <= y0:
                            continue
                        rgbs[i][y0:y1, x0:x1] = rgbs[i][y0:y1, x0:x1].reshape(-1, 3).mean(0)
                        occ = (
                            (trajs[i, :, 0] >= x0) & (trajs[i, :, 0] < x1)
                            & (trajs[i, :, 1] >= y0) & (trajs[i, :, 1] < y1)
                        )
                        visibles[i, occ] = 0
            rgbs = [r.astype(np.uint8) for r in rgbs]

        if replace:
            rgbs_alt = [_color_jitter(rng, _color_jitter(rng, r)) for r in rgbs]
            rgbs = [r.astype(np.float32) for r in rgbs]
            for i in range(1, S):
                if rng.random() < self.replace_aug_prob:
                    for _ in range(rng.integers(1, self.replace_max + 1)):
                        xc, yc = rng.integers(0, W), rng.integers(0, H)
                        dx = rng.integers(*self.replace_bounds)
                        dy = rng.integers(*self.replace_bounds)
                        x0 = int(np.clip(xc - dx / 2, 0, W - 1).round())
                        x1 = int(np.clip(xc + dx / 2, 0, W - 1).round())
                        y0 = int(np.clip(yc - dy / 2, 0, H - 1).round())
                        y1 = int(np.clip(yc + dy / 2, 0, H - 1).round())
                        wid, hei = x1 - x0, y1 - y0
                        if wid <= 0 or hei <= 0 or H - hei <= 0 or W - wid <= 0:
                            continue
                        y00 = rng.integers(0, H - hei)
                        x00 = rng.integers(0, W - wid)
                        fr = rng.integers(0, S)
                        rgbs[i][y0:y1, x0:x1] = rgbs_alt[fr][y00 : y00 + hei, x00 : x00 + wid]
                        occ = (
                            (trajs[i, :, 0] >= x0) & (trajs[i, :, 0] < x1)
                            & (trajs[i, :, 1] >= y0) & (trajs[i, :, 1] < y1)
                        )
                        visibles[i, occ] = 0
            rgbs = [r.astype(np.uint8) for r in rgbs]

        if rng.random() < self.color_aug_prob:
            rgbs = [_color_jitter(rng, r) for r in rgbs]
        if rng.random() < self.blur_aug_prob:
            rgbs = [_gaussian_blur(rng, r) for r in rgbs]
        return rgbs, trajs, visibles

    # ---------------------------------------------------------------- spatial

    def add_spatial_augs(self, rgbs, trajs, visibles, crop_size):
        import cv2

        rng = self.rng
        S = len(rgbs)
        rgbs = [r.astype(np.float32) for r in rgbs]

        # padding
        pad_x0, pad_x1 = rng.integers(*self.pad_bounds), rng.integers(*self.pad_bounds)
        pad_y0, pad_y1 = rng.integers(*self.pad_bounds), rng.integers(*self.pad_bounds)
        rgbs = [np.pad(r, ((pad_y0, pad_y1), (pad_x0, pad_x1), (0, 0))) for r in rgbs]
        trajs[:, :, 0] += pad_x0
        trajs[:, :, 1] += pad_y0
        H, W = rgbs[0].shape[:2]

        # drifting scale / stretch
        scale = rng.uniform(*self.resize_lim)
        scale_x = scale_y = scale
        dx = dy = 0.0
        scaled = []
        for s in range(S):
            if s == 1:
                dx = rng.uniform(-self.resize_delta, self.resize_delta)
                dy = rng.uniform(-self.resize_delta, self.resize_delta)
            elif s > 1:
                dx = dx * 0.8 + rng.uniform(-self.resize_delta, self.resize_delta) * 0.2
                dy = dy * 0.8 + rng.uniform(-self.resize_delta, self.resize_delta) * 0.2
            scale_x += dx
            scale_y += dy
            mid = (scale_x + scale_y) * 0.5
            scale_x = scale_x * 0.5 + mid * 0.5
            scale_y = scale_y * 0.5 + mid * 0.5
            scale_x = float(np.clip(scale_x, 0.2, 2.0))
            scale_y = float(np.clip(scale_y, 0.2, 2.0))
            H_new = max(int(H * scale_y), crop_size[0] + 10)
            W_new = max(int(W * scale_x), crop_size[1] + 10)
            sx = (W_new - 1) / float(W - 1)
            sy = (H_new - 1) / float(H - 1)
            scaled.append(cv2.resize(rgbs[s], (W_new, H_new), interpolation=cv2.INTER_LINEAR))
            trajs[s, :, 0] *= sx
            trajs[s, :, 1] *= sy
        rgbs = scaled

        # drifting crop centered on visible points
        ok = visibles[0] > 0
        if ok.sum() > 0:
            mid_x = float(np.mean(trajs[0, ok, 0]))
            mid_y = float(np.mean(trajs[0, ok, 1]))
        else:
            mid_y, mid_x = crop_size
        x0 = int(mid_x - crop_size[1] // 2)
        y0 = int(mid_y - crop_size[0] // 2)
        off_x = off_y = 0
        for s in range(S):
            if s == 1:
                off_x = int(rng.integers(-self.max_crop_offset, self.max_crop_offset))
                off_y = int(rng.integers(-self.max_crop_offset, self.max_crop_offset))
            elif s > 1:
                off_x = int(off_x * 0.8 + rng.integers(-self.max_crop_offset, self.max_crop_offset + 1) * 0.2)
                off_y = int(off_y * 0.8 + rng.integers(-self.max_crop_offset, self.max_crop_offset + 1) * 0.2)
            x0 += off_x
            y0 += off_y
            H_new, W_new = rgbs[s].shape[:2]
            y0 = 0 if H_new == crop_size[0] else min(max(0, y0), H_new - crop_size[0] - 1)
            x0 = 0 if W_new == crop_size[1] else min(max(0, x0), W_new - crop_size[1] - 1)
            rgbs[s] = rgbs[s][y0 : y0 + crop_size[0], x0 : x0 + crop_size[1]]
            trajs[s, :, 0] -= x0
            trajs[s, :, 1] -= y0

        # flips
        H_new, W_new = crop_size
        if self.do_flip:
            if rng.random() < self.h_flip_prob:
                rgbs = [r[:, ::-1] for r in rgbs]
                trajs[:, :, 0] = W_new - trajs[:, :, 0]
            if rng.random() < self.v_flip_prob:
                rgbs = [r[::-1] for r in rgbs]
                trajs[:, :, 1] = H_new - trajs[:, :, 1]
        return np.stack(rgbs), trajs

    def crop(self, rgbs, trajs, crop_size):
        H, W = rgbs[0].shape[:2]
        y0 = 0 if crop_size[0] >= H else (H - crop_size[0]) // 2
        x0 = 0 if crop_size[1] >= W else int(self.rng.integers(0, W - crop_size[1]))
        rgbs = [r[y0 : y0 + crop_size[0], x0 : x0 + crop_size[1]] for r in rgbs]
        trajs[:, :, 0] -= x0
        trajs[:, :, 1] -= y0
        return np.stack(rgbs), trajs


class KubricMovifDataset(CoTrackerDataset):
    def __init__(
        self,
        data_root: str,
        crop_size: Tuple[int, int] = (384, 512),
        seq_len: int = 24,
        traj_per_sample: int = 768,
        sample_vis_last_frame: bool = False,
        use_augs: bool = False,
        random_seq_len: bool = False,
        random_frame_rate: bool = False,
        random_number_traj: bool = False,
        split: str = "train",
        seed: int = 0,
    ):
        super().__init__(
            data_root, crop_size, seq_len, traj_per_sample, sample_vis_last_frame, use_augs, seed
        )
        self.random_seq_len = random_seq_len
        self.random_frame_rate = random_frame_rate
        self.random_number_traj = random_number_traj
        # kubric-specific, gentler spatial aug ranges (reference :394-397)
        self.pad_bounds = [0, 25]
        self.resize_lim = [0.75, 1.25]
        self.resize_delta = 0.05
        self.max_crop_offset = 15
        self.split = split

        self.seq_names = sorted(
            f for f in os.listdir(data_root) if os.path.isdir(os.path.join(data_root, f))
        )
        if split == "valid":
            self.seq_names = self.seq_names[:30]
            assert not use_augs

    def __len__(self):
        return len(self.seq_names)

    def getitem_helper(self, index):
        import cv2

        rng = self.rng
        gotit = True
        seq_name = self.seq_names[index]
        npy_path = os.path.join(self.data_root, seq_name, seq_name + ".npy")
        rgb_path = os.path.join(self.data_root, seq_name, "frames")

        rgbs = []
        for p in sorted(os.listdir(rgb_path)):
            img = cv2.imread(os.path.join(rgb_path, p), cv2.IMREAD_COLOR)
            rgbs.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        rgbs = np.stack(rgbs)

        annot = np.load(npy_path, allow_pickle=True).item()
        traj_2d = np.transpose(annot["coords"], (1, 0, 2)).astype(np.float64)
        visibility = np.transpose(~np.asarray(annot["visibility"], bool), (1, 0))

        # sequence-length / frame-rate / track-count schedule (reference :427-455)
        frame_rate = 1
        final_num_traj = self.traj_per_sample
        if self.random_seq_len and self.random_number_traj:
            final_num_traj = int(rng.integers(1, self.traj_per_sample))
            alpha = final_num_traj / float(self.traj_per_sample)
            seq_len = int(alpha * 10 + (1 - alpha) * self.seq_len)
            seq_len = int(rng.integers(seq_len - 2, seq_len + 2))
        elif self.random_number_traj:
            final_num_traj = int(rng.integers(1, self.traj_per_sample))
            alpha = final_num_traj / float(self.traj_per_sample)
            seq_len = 8 * int(alpha * 2 + (1 - alpha) * self.seq_len // 8)
        elif self.random_seq_len:
            seq_len = int(rng.integers(self.seq_len // 2, self.seq_len))
        else:
            seq_len = self.seq_len
        if self.random_frame_rate:
            frame_rate = int(rng.integers(1, int(120 / seq_len) + 1))

        if seq_len < len(rgbs):
            if seq_len * frame_rate < len(rgbs):
                start = int(rng.integers(0, len(rgbs) - seq_len * frame_rate))
            else:
                start = 0
            sl = slice(start, start + seq_len * frame_rate, frame_rate)
            rgbs, traj_2d, visibility = rgbs[sl], traj_2d[sl], visibility[sl]

        if self.use_augs:
            rgbs, traj_2d, visibility = self.add_photometric_augs(
                list(rgbs), traj_2d, visibility, replace=False
            )
            rgbs, traj_2d = self.add_spatial_augs(rgbs, traj_2d, visibility, self.crop_size)
        else:
            rgbs, traj_2d = self.crop(list(rgbs), traj_2d, self.crop_size)

        ch, cw = self.crop_size
        visibility[traj_2d[:, :, 0] > cw - 1] = False
        visibility[traj_2d[:, :, 0] < 0] = False
        visibility[traj_2d[:, :, 1] > ch - 1] = False
        visibility[traj_2d[:, :, 1] < 0] = False

        # drop far-away runaway tracks (reference :493-499)
        center = np.array([cw, ch]) / 2.0
        close = np.all(np.linalg.norm(traj_2d - center, axis=-1) < 1000.0, axis=0)
        traj_2d = traj_2d[:, close]
        visibility = visibility[:, close]

        # sample tracks visible at first / middle (/ last) frame
        cand = np.concatenate(
            [np.nonzero(visibility[0])[0], np.nonzero(visibility[seq_len // 2])[0]]
        )
        if self.sample_vis_last_frame:
            cand = np.concatenate([cand, np.nonzero(visibility[seq_len - 1])[0]])
        perm = rng.permutation(len(cand))[: self.traj_per_sample]
        if len(perm) < self.traj_per_sample:
            gotit = False
        chosen = cand[perm]

        trajs = traj_2d[:, chosen].astype(np.float32)[:, :final_num_traj]
        visibles = visibility[:, chosen].astype(np.float32)[:, :final_num_traj]
        valids = np.ones_like(visibles)

        sample = CoTrackerData(
            video=rgbs.transpose(0, 3, 1, 2).astype(np.float32),
            trajectory=trajs,
            visibility=visibles,
            valid=valids,
            seq_name=seq_name,
        )
        return sample, gotit
