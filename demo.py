"""Offline tracking demo: track a grid (or segm-masked grid) through a video.

Equivalent of the reference demo.py:23-109.

    python demo.py --video_path assets/apple.mp4 --grid_size 10 \
        [--checkpoint scaled_offline.pth] [--mask_path mask.png] \
        [--backward_tracking] [--grid_query_frame 0]
"""

import argparse
import os

import numpy as np


def read_video(path, max_frames=None):
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok or (max_frames and len(frames) >= max_frames):
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    return np.stack(frames)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_path", default="/root/reference/assets/apple.mp4")
    p.add_argument("--mask_path", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--grid_size", type=int, default=10)
    p.add_argument("--grid_query_frame", type=int, default=0)
    p.add_argument("--backward_tracking", action="store_true")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--save_dir", default="./saved_videos")
    args = p.parse_args()

    from cotracker_tpu.predictor import CoTrackerPredictor
    from cotracker_tpu.utils.visualizer import Visualizer

    video = read_video(args.video_path, args.max_frames)
    video_b = video.transpose(0, 3, 1, 2)[None].astype(np.float32)

    segm_mask = None
    if args.mask_path:
        import cv2

        m = cv2.imread(args.mask_path, cv2.IMREAD_GRAYSCALE)
        segm_mask = (m > 127).astype(np.float32)[None, None]

    model = CoTrackerPredictor(checkpoint=args.checkpoint)
    tracks, visibility = model(
        video_b,
        grid_size=args.grid_size,
        segm_mask=segm_mask,
        grid_query_frame=args.grid_query_frame,
        backward_tracking=args.backward_tracking,
    )
    print("computed tracks:", np.asarray(tracks).shape)

    vis = Visualizer(save_dir=args.save_dir, pad_value=120, linewidth=3)
    name = os.path.splitext(os.path.basename(args.video_path))[0]
    vis.visualize(video_b, tracks, visibility, filename=name, query_frame=args.grid_query_frame)
    print(f"saved {os.path.join(args.save_dir, name)}.mp4")


if __name__ == "__main__":
    main()
