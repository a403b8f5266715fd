"""Console progress reporting for long-running actions (reference Q3:
``_RowProgress``, db2pq/files/parquet.py:20-101 — row-count progress bar
with ETA, TTY-gated, 0.25 s throttle).

Spark's unit of visible progress is tasks, not rows (rows stream inside
executors), so the bar tracks *task* completion via ``StatusTracker`` —
polled from a daemon thread while the action runs on the caller's
thread. On a cluster the Spark UI supersedes this; the console bar
exists for parity with the reference's CLI experience.
"""

from __future__ import annotations

import sys
import threading
import time
from typing import Any, Callable, TypeVar

T = TypeVar("T")

#: reference throttle (db2pq/files/parquet.py:20-101)
THROTTLE_S = 0.25


class TaskProgress:
    """Poll the SparkContext status tracker and render a one-line bar."""

    def __init__(self, spark, out=None, force: bool = False):
        self._sc = spark.sparkContext
        self._out = out if out is not None else sys.stderr
        self._enabled = force or (hasattr(self._out, "isatty")
                                  and self._out.isatty())
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._t0 = 0.0

    def _render(self) -> None:
        tracker = self._sc.statusTracker()
        done = total = 0
        for sid in tracker.getActiveStageIds():
            info = tracker.getStageInfo(sid)
            if info:
                done += info.numCompletedTasks
                total += info.numTasks
        if total == 0:
            return
        frac = done / total
        elapsed = time.monotonic() - self._t0
        eta = (elapsed / frac - elapsed) if frac > 0 else float("inf")
        bar = "#" * int(frac * 30)
        self._out.write(
            f"\r[{bar:<30}] {done}/{total} tasks"
            f" ({frac:5.1%})  eta {eta:5.1f}s ")
        self._out.flush()

    def _loop(self) -> None:
        while not self._stop.wait(THROTTLE_S):
            try:
                self._render()
            except Exception:       # tracker can race with stage teardown
                pass

    def __enter__(self) -> "TaskProgress":
        if self._enabled:
            self._t0 = time.monotonic()
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def __exit__(self, *exc: Any) -> None:
        if self._thread is not None:
            self._stop.set()
            self._thread.join(timeout=1.0)
            self._out.write("\r" + " " * 70 + "\r")
            self._out.flush()


def with_progress(spark, action: Callable[[], T], force: bool = False,
                  out=None) -> T:
    """Run a blocking Spark action with a console progress bar.

    >>> with_progress(spark, lambda: df.write.parquet(path))
    """
    with TaskProgress(spark, out=out, force=force):
        return action()
