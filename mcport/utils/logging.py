"""Structured run logging (SURVEY.md §5 — the reference has only st.error/success).

One JSON object per line to a file and/or stderr: benchmark samples
(paths/sec/chip), convergence-vs-paths points, engine checkpoints. Consumed by
the benchmark scripts in ``benchmarks/``.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, IO

__all__ = ["RunLogger"]


class RunLogger:
    """Append-only JSONL logger with a monotonic timestamp and run id."""

    def __init__(self, path: str | Path | None = None, stream: IO[str] | None = None,
                 run_id: str | None = None):
        self._fh = open(path, "a") if path is not None else None
        self._stream = stream
        self._run_id = run_id or f"run-{int(time.time())}"
        self._t0 = time.perf_counter()

    def log(self, event: str, **fields: Any) -> dict:
        rec = {
            "run": self._run_id,
            "t": round(time.perf_counter() - self._t0, 6),
            "event": event,
            **fields,
        }
        line = json.dumps(rec, default=float)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._stream:
            self._stream.write(line + "\n")
        return rec

    def close(self) -> None:
        if self._fh:
            self._fh.close()

    def __enter__(self) -> "RunLogger":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
