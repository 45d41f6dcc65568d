"""Structured per-frame metrics (JSONL).

Replaces the reference's unstructured stdout/stderr prints (feature counts
src/feature.cpp:251, scale src/utils.cpp:76, inliers
src/visualOdometry.cpp:191, FPS src/main.cpp:212-213) with a machine-readable
stream: one JSON object per frame.
"""

from __future__ import annotations

import json
import time
from typing import Any, Optional


class MetricsLogger:
    def __init__(self, path: str):
        self._f = open(path, "w")
        self._t0 = time.time()

    def log(self, record: dict[str, Any]) -> None:
        rec = {"t": round(time.time() - self._t0, 4)}
        for k, v in record.items():
            if v is None:
                continue
            if hasattr(v, "item"):
                v = v.item()
            rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
