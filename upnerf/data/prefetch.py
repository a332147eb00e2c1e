"""Host-side batch prefetcher for the streaming ray-store path.

When the compact ray store does not fit device HBM (downscale-1
Phototourism scenes), batches are gathered from memmap arrays on host. This
double-buffered background thread overlaps the gather + host->device
transfer with the device step — the reference relies on torch DataLoader
workers for the same purpose (models/nerf_system.py:75-82).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator

import numpy as np


class BatchPrefetcher:
    def __init__(
        self,
        store_np: Dict[str, np.ndarray],
        batch_size: int,
        device_put: Callable,
        seed: int = 0,
        depth: int = 2,
    ):
        self.store = store_np
        self.batch_size = batch_size
        self.n_rays = int(store_np["px"].shape[0])
        self.device_put = device_put
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._rng = np.random.RandomState(seed)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _gather(self) -> Dict[str, np.ndarray]:
        idx = self._rng.randint(0, self.n_rays, self.batch_size)
        idx.sort()  # sorted gathers are much faster on memmaps
        s = self.store
        return {
            "px": s["px"][idx].astype(np.float32),
            "py": s["py"][idx].astype(np.float32),
            "img_idx": np.ascontiguousarray(s["img_idx"][idx]),
            "rgb": s["rgb"][idx].astype(np.float32) / 255.0,
            "inv_depth": s["inv_depth"][idx].astype(np.float32),
        }

    def _worker(self):
        while not self._stop.is_set():
            batch = self.device_put(self._gather())
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.25)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator:
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
