"""Host-side video decode with background prefetch.

The reference decodes synchronously inside the hot loop (cv2.VideoCapture.read,
main.py:1596). At TPU throughputs decode becomes the bottleneck, so here a worker
thread decodes and batches frames into fixed-size uint8 windows while the TPU stitches
the previous window — decode and compute fully overlap.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


class VideoReader:
    """Threaded frame reader yielding [B, H, W, 3] uint8 windows.

    The final window is padded by repeating the last frame; `n_valid` in the yielded
    tuple tells how many leading frames are real.
    """

    def __init__(self, path: str, window: int = 16, queue_depth: int = 4, max_frames: Optional[int] = None):
        if not _HAS_CV2:
            raise RuntimeError("OpenCV is required for video decode")
        self.path = path
        self.window = window
        self.max_frames = max_frames
        cap = cv2.VideoCapture(path)
        if not cap.isOpened():
            raise FileNotFoundError(f"cannot open video: {path}")
        ok, first = cap.read()
        if not ok:
            raise ValueError(f"empty video: {path}")
        self.first_frame = first
        self.frame_shape = first.shape
        self.fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.frame_count_hint = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self._cap = cap
        self._q: queue.Queue = queue.Queue(maxsize=queue_depth)
        self._thread: Optional[threading.Thread] = None

    def _worker(self):
        b = self.window
        buf = []
        produced = 0
        last = self.first_frame
        while True:
            if self.max_frames is not None and produced + 1 >= self.max_frames:
                break
            ok, frame = self._cap.read()
            if not ok:
                break
            last = frame
            buf.append(frame)
            produced += 1
            if len(buf) == b:
                self._q.put((np.stack(buf), b))
                buf = []
        if buf:
            n = len(buf)
            while len(buf) < b:
                buf.append(last)
            self._q.put((np.stack(buf), n))
        self._q.put(None)
        self._cap.release()

    def windows(self) -> Iterator[Tuple[np.ndarray, int]]:
        """Yield (frames [B, H, W, 3] uint8, n_valid). Frame 0 is NOT included — it
        seeds the stitcher separately (reference main.py:1590-1603)."""
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item


def read_video_windows(path: str, window: int = 16, max_frames: Optional[int] = None):
    """Convenience wrapper: returns (first_frame, iterator over (window, n_valid))."""
    r = VideoReader(path, window=window, max_frames=max_frames)
    return r.first_frame, r.windows()
