"""Background-prefetching frame loader.

Role of the reference's synchronous per-frame disk IO inside the hot loop
(/root/reference/src/DataReader.cpp:106-240 does imread + CSV scans inline),
upgraded: a worker thread decodes and assembles the next FrameWindows while
the device computes the current one, so host IO overlaps TPU compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

from vislam_tpu.data.euroc import EurocDataset, FrameWindow


class PrefetchLoader:
    """Iterate FrameWindows for frames [start, end) with background prefetch."""

    def __init__(
        self,
        dataset: EurocDataset,
        start: Optional[int] = None,
        end: Optional[int] = None,
        depth: int = 4,
    ):
        self.dataset = dataset
        self.start = dataset.start_index if start is None else max(start, 1)
        self.end = len(dataset) if end is None else min(end, len(dataset))
        self.depth = depth

    def __len__(self) -> int:
        return max(0, self.end - self.start)

    def __iter__(self) -> Iterator[FrameWindow]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def worker():
            try:
                for j in range(self.start, self.end):
                    if stop.is_set():
                        return
                    q.put(self.dataset.frame_window(j))
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
