"""Run-state machine for pipeline executions (reference C1-C3).

Reproduces the reference's control plane semantics (api.py:72-163):
pending -> running -> completed/failed with per-stage messages,
records_processed, run history sorted by start_time desc, 404-style
lookup misses, and history clearing. Thread-safe unlike the
reference's bare dict mutated from background tasks.
"""

from __future__ import annotations

import threading
import uuid
from dataclasses import asdict, dataclass, field
from datetime import datetime, timezone
from typing import Callable


@dataclass
class RunRecord:
    run_id: str
    status: str  # pending | running | completed | failed
    message: str = ""
    start_time: str = ""
    end_time: str | None = None
    error: str | None = None
    records_processed: int | None = None
    config: dict = field(default_factory=dict)


class RunRegistry:
    def __init__(self) -> None:
        self._runs: dict[str, RunRecord] = {}
        self._lock = threading.Lock()

    def create(self, config: dict | None = None) -> RunRecord:
        run = RunRecord(
            run_id=str(uuid.uuid4()),
            status="pending",
            message="Run queued",
            start_time=datetime.now(timezone.utc).isoformat(),
            config=config or {},
        )
        with self._lock:
            self._runs[run.run_id] = run
        return run

    def update(self, run_id: str, **kw) -> None:
        with self._lock:
            run = self._runs[run_id]
            for k, v in kw.items():
                setattr(run, k, v)

    def get(self, run_id: str) -> RunRecord | None:
        with self._lock:
            return self._runs.get(run_id)

    def all(self) -> list[RunRecord]:
        """History sorted by start_time desc (reference api.py:148-156)."""
        with self._lock:
            return sorted(self._runs.values(), key=lambda r: r.start_time, reverse=True)

    def clear(self) -> int:
        with self._lock:
            n = len(self._runs)
            self._runs.clear()
            return n


def execute_run(
    registry: RunRegistry,
    run_id: str,
    pipeline: Callable[[], int],
) -> None:
    """C2 executor: drive ``pipeline`` (returns records processed)
    through the status machine (reference api.py:72-97)."""
    registry.update(run_id, status="running", message="Pipeline running")
    try:
        n = pipeline()
        registry.update(
            run_id,
            status="completed",
            message=f"Pipeline completed: {n} records processed",
            records_processed=n,
            end_time=datetime.now(timezone.utc).isoformat(),
        )
    except Exception as exc:  # noqa: BLE001 - reference records any failure
        registry.update(
            run_id,
            status="failed",
            message="Pipeline failed",
            error=str(exc),
            end_time=datetime.now(timezone.utc).isoformat(),
        )


def run_as_dict(run: RunRecord) -> dict:
    return asdict(run)
