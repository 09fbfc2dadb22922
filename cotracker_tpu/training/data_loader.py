"""Prefetching training-data loader.

Replaces the reference's torch DataLoader with 10 worker processes +
x4-concatenated Kubric dataset (train_on_kubric.py:313-325,
cotracker/utils/train_utils.py:97-121). Here worker THREADS decode and
augment samples — cv2/numpy release the GIL for the heavy parts — and a
bounded queue keeps batches ready ahead of the (device-bound) training step,
so the TPU is never input-starved by synchronous PNG decode.
"""

import queue
import threading

import numpy as np


class RepeatedDataset:
    """len = repeats * len(base): the reference's ConcatDataset([ds] * 4)
    (train_utils.py:97-121) — widens the shuffle epoch so augmentation RNG
    re-draws per visit instead of recycling one pass per epoch."""

    def __init__(self, base, repeats: int = 4):
        self.base = base
        self.repeats = repeats

    def __len__(self):
        return len(self.base) * self.repeats

    def __getitem__(self, ix):
        return self.base[ix % len(self.base)]


def collate_batch(samples):
    """Stack CoTrackerData-like samples to the train-step batch dict
    (channel-last video)."""
    return {
        "video": np.stack([s.video.transpose(0, 2, 3, 1) for s in samples]),
        "trajs_g": np.stack([s.trajectory for s in samples]),
        "vis_g": np.stack([s.visibility for s in samples]).astype(np.float32),
        "valids": np.stack([s.valid for s in samples]).astype(np.float32),
    }


class PrefetchLoader:
    """Infinite shuffled batch iterator with worker-thread prefetch.

    Failed samples (gotit=False) are skipped, like the reference's
    train-loop `if not all(gotit): continue` (train_on_kubric.py:391-394).
    Iterate with next(); call close() (or rely on daemon threads) to stop.
    """

    def __init__(self, dataset, batch_size, rng, num_workers: int = 4, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self._rng = rng
        self._order = rng.permutation(len(dataset))
        self._pos = 0
        self._ix_lock = threading.Lock()
        self._q = queue.Queue(maxsize=max(1, prefetch))
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, num_workers))
        ]
        for t in self._threads:
            t.start()

    def _next_index(self):
        with self._ix_lock:
            if self._pos >= len(self._order):
                self._order = self._rng.permutation(len(self.dataset))
                self._pos = 0
            ix = int(self._order[self._pos])
            self._pos += 1
            return ix

    def _worker(self):
        while not self._stop.is_set():
            samples = []
            while len(samples) < self.batch_size:
                s, gotit = self.dataset[self._next_index()]
                if gotit:
                    samples.append(s)
            batch = collate_batch(samples)
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def ready(self) -> int:
        """Batches currently buffered ahead of the consumer."""
        return self._q.qsize()

    def __iter__(self):
        return self

    def __next__(self):
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
