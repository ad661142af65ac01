"""A5: the live ``stats.json`` ticker (RPS / ETA / memory).

The reference emits sync progress to ``stats.json`` every 2 seconds
from a goroutine (``utils/logger/logger.go:138-173``, fed by the
writer pool's atomic counters, ``destination/writers.go:123-129``).
``StatsTicker`` is that surface for a Spark job: a daemon thread
samples driver-registered counters (stage name, rows synced, rows
planned) plus process RSS, and atomically rewrites ``stats.json`` with
the same fields (Synced Records / Speed / Memory / Seconds Elapsed /
Estimated Remaining Time). Operators bump the counters with plain
``add()`` calls — cheap atomics under the GIL, nothing touches the
executor hot path.

Spark-scale note: progress here is DRIVER-side bookkeeping (commit
granularity), which is the honest unit for a table-maintenance engine —
per-row executor counters would need accumulators whose values are only
exact at task completion anyway. The interval and file shape mirror the
reference so tooling that tails OLake's stats.json can tail ours.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
import time


def _rss_mb() -> int:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) // 1024
    except OSError:
        pass
    return 0


class StatsTicker:
    """Background 2-second stats writer; use as a context manager.

    >>> with StatsTicker(path) as stats:
    ...     stats.add_records_to_sync(n)   # AddRecordsToSyncStats
    ...     stats.record_synced(k)         # per-commit bump
    ...     stats.set_stage("02-compact")
    """

    def __init__(self, path: str, interval_s: float = 2.0):
        self.path = path
        self.interval_s = interval_s
        self._lock = threading.Lock()
        self._synced = 0
        self._to_sync = 0
        self._stage = ""
        self._t0 = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # ----------------------------------------------------- counters
    def add_records_to_sync(self, n: int) -> None:
        with self._lock:
            self._to_sync += int(n)

    def record_synced(self, n: int) -> None:
        with self._lock:
            self._synced += int(n)

    def set_stage(self, stage: str) -> None:
        with self._lock:
            self._stage = stage

    # ----------------------------------------------------- lifecycle
    def __enter__(self) -> "StatsTicker":
        self._t0 = time.monotonic()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval_s + 1)
        self.flush()  # final truth after the last commit

    def _run(self) -> None:
        while not self._stop.wait(self.interval_s):
            self.flush()

    def snapshot(self) -> dict:
        with self._lock:
            synced, to_sync, stage = self._synced, self._to_sync, self._stage
        elapsed = max(time.monotonic() - self._t0, 1e-9)
        speed = synced / elapsed
        # maintenance stages bump synced without a planned total, so
        # synced can legitimately pass to_sync — clamp instead of
        # flipping the ETA back to "Not Determined" mid-run
        remaining = max(to_sync - synced, 0)
        eta = (
            f"{remaining / speed:.2f} s"
            if speed > 0 and to_sync > 0
            else "Not Determined"
        )
        # field names mirror logger.go:152-166
        return {
            "Stage": stage,
            "Synced Records": synced,
            "Records To Sync": to_sync,
            "Memory": f"{_rss_mb()} mb",
            "Speed": f"{speed:.2f} rps",
            "Seconds Elapsed": f"{elapsed:.2f}",
            "Estimated Remaining Time": eta,
        }

    def flush(self) -> None:
        data = json.dumps(self.snapshot(), indent=2)
        d = os.path.dirname(self.path) or "."
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".stats-")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(data)
            os.replace(tmp, self.path)  # readers never see a torn file
        except OSError:
            try:
                os.remove(tmp)
            except OSError:
                pass
