"""Host→device prefetch pipeline.

The reference leans on 9 DataLoader fork-workers (datasets.py:272-274); here a
thread pool decodes ahead of the device while attacks run, and batches are
device_put with the mesh's clip sharding so the transfer overlaps compute
(double-buffered: the next batch is already on-device when the current attack
step finishes).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


def threaded_prefetch(make_iter: Callable[[], Iterator], depth: int = 2) -> Iterator:
    """Run a batch iterator in a worker thread with a bounded queue.

    The worker's puts poll a stop event so an abandoned consumer (attack
    loop dies mid-iteration, caller stops early) unblocks and exits the
    thread instead of pinning ``depth`` decoded batches for the process
    lifetime — the generator's ``finally`` (run on GeneratorExit / GC)
    signals it."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    done = object()
    err: list[BaseException] = []
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in make_iter():
                if not put(item):
                    return
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            put(done)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def device_prefetch(batches: Iterator[dict], sharding=None, depth: int = 2,
                    keep_host: bool = False) -> Iterator[dict]:
    """Move 'clips'/'labels' to device ahead of consumption.

    At most ``depth`` batches are resident beyond the one handed to the
    consumer (depth=2 ⇒ double-buffering ahead of the in-use batch; a B=16
    f32 clip batch is ~308 MB of HBM, so an off-by-one here is real memory).

    ``keep_host=True`` retains the original host array under
    ``clips_host`` so ori-saving consumers (cli.attack's ``save_ori``)
    read the host copy instead of pulling the clips back over the
    device→host link they were just pushed through.
    """
    buf = []

    def put(b):
        out = dict(b)
        try:
            out["clips"] = jax.device_put(b["clips"], sharding)
        except ValueError:
            # a trailing partial batch can be indivisible by the mesh; land
            # it unsharded — the consumer's own pad-and-slice re-shards it
            out["clips"] = jax.device_put(b["clips"])
        out["labels"] = jax.device_put(b["labels"])
        if keep_host:
            out["clips_host"] = b["clips"]
        return out

    for b in batches:
        buf.append(put(b))
        if len(buf) >= depth:
            yield buf.pop(0)
    yield from buf


def make_input_pipeline(dataset, batch_size: int, iterate, *, left: int = 0,
                        right: Optional[int] = None, sharding=None,
                        prefetch_depth: int = 2,
                        keep_host: bool = False) -> Iterator[dict]:
    """decode-thread → bounded queue → device transfer, composed."""
    host = threaded_prefetch(
        lambda: iterate(dataset, batch_size, left, right), prefetch_depth
    )
    return device_prefetch(host, sharding, prefetch_depth,
                           keep_host=keep_host)
