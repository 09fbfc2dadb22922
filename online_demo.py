"""Streaming tracking demo: process a video of unknown length chunk by chunk.

Equivalent of the reference online_demo.py:21-104.

    python online_demo.py --video_path assets/apple.mp4 --grid_size 10
"""

import argparse
import os

import numpy as np


def frame_iter(path):
    import cv2

    cap = cv2.VideoCapture(path)
    while True:
        ok, f = cap.read()
        if not ok:
            return
        yield cv2.cvtColor(f, cv2.COLOR_BGR2RGB)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--video_path", default="/root/reference/assets/apple.mp4")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--grid_size", type=int, default=10)
    p.add_argument("--grid_query_frame", type=int, default=0)
    p.add_argument("--save_dir", default="./saved_videos")
    args = p.parse_args()

    from cotracker_tpu.predictor import CoTrackerOnlinePredictor
    from cotracker_tpu.utils.visualizer import Visualizer

    model = CoTrackerOnlinePredictor(checkpoint=args.checkpoint)

    window_frames = []
    is_first_step = True
    tracks = visibility = None

    def process(frames, num):
        nonlocal is_first_step, tracks, visibility
        chunk = np.stack(frames[-num:]).transpose(0, 3, 1, 2)[None].astype(np.float32)
        if is_first_step:
            model(chunk[:, :1], is_first_step=True, grid_size=args.grid_size,
                  grid_query_frame=args.grid_query_frame)
            is_first_step = False
        tracks, visibility = model(chunk)

    i = 0
    for frame in frame_iter(args.video_path):
        window_frames.append(frame)
        if i % model.step == 0 and i != 0:
            process(window_frames, model.step * 2)
        i += 1
    # flush the tail
    tail = (i % model.step) + model.step
    process(window_frames, tail)

    print("tracks:", np.asarray(tracks).shape)
    video = np.stack(window_frames).transpose(0, 3, 1, 2)[None].astype(np.float32)
    T = min(video.shape[1], np.asarray(tracks).shape[1])
    vis = Visualizer(save_dir=args.save_dir, pad_value=120, linewidth=3)
    name = os.path.splitext(os.path.basename(args.video_path))[0] + "_online"
    vis.visualize(video[:, :T], np.asarray(tracks)[:, :T],
                  np.asarray(visibility)[:, :T], filename=name)
    print(f"saved {os.path.join(args.save_dir, name)}.mp4")


if __name__ == "__main__":
    main()
