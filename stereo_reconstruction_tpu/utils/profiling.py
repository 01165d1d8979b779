"""Stage timing + structured metrics (JSONL).

The reference's only observability is stdout prints (SURVEY.md §5); here
every pipeline stage gets a ``block_until_ready``-fenced timer and a
structured record that appends to a JSONL stream, plus optional
``jax.profiler`` trace annotations for xprof.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Dict, Optional

import jax


class StageTimer:
    def __init__(self):
        self.timings: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, *outputs):
        """Times a stage; pass device arrays to fence on if available."""
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            yield
            t = time.perf_counter() - t0
        self.timings[name] = self.timings.get(name, 0.0) + t

    def fence(self, name: str, value, t0: float):
        jax.block_until_ready(value)
        self.timings[name] = time.perf_counter() - t0


def append_jsonl(path: str, record: Dict[str, Any]) -> None:
    record = dict(record, ts=time.time())
    with open(path, "a") as f:
        f.write(json.dumps(record, default=_json_default) + "\n")


def _json_default(obj):
    try:
        import numpy as np

        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
    except ImportError:
        pass
    return str(obj)


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str]):
    """jax.profiler trace around a block when a directory is given."""
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield
