"""Polling file-tail ingest client (reference parity: S10,
examples/monitor_files.py:43-97 — tail <name>:<path> files on a
period, batch-POST on another period).

Spark-first version: instead of hand-rolled polling threads, append
sampled values as JSON lines into the engine's streaming landing
directory — Structured Streaming's file source (start_file_ingest)
does the batching, retry, and exactly-once bookkeeping.

Usage:
    python examples/monitor_files.py LANDING_DIR name1:path1 [name2:path2 ...]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time

SAMPLE_PERIOD_S = 0.5
FLUSH_PERIOD_S = 2.0  # reference cadence: capture fast, post every ~2 s


def tail_value(path: str) -> float | None:
    """Last line of the file parsed as a float (reference semantics)."""
    try:
        with open(path, "rb") as f:
            lines = f.read().splitlines()
        return float(lines[-1]) if lines else None
    except (OSError, ValueError):
        return None


def main() -> int:
    landing = sys.argv[1]
    targets = [arg.split(":", 1) for arg in sys.argv[2:]]
    if not targets:
        print("usage: monitor_files.py LANDING_DIR name:path [...]", file=sys.stderr)
        return 2
    buf: list[dict] = []
    last_flush = time.monotonic()
    seq = 0
    while True:
        now = dt.datetime.now(dt.timezone.utc).isoformat()
        for name, path in targets:
            v = tail_value(path)
            if v is not None:
                buf.append({"dataset_id": name, "date": now, "value": v})
        if buf and time.monotonic() - last_flush >= FLUSH_PERIOD_S:
            tmp = os.path.join(landing, f".batch-{os.getpid()}-{seq}.tmp")
            with open(tmp, "w") as f:
                for row in buf:
                    f.write(json.dumps(row) + "\n")
            # atomic publish: dot-prefixed tmp is invisible to the
            # streaming file source until renamed
            os.rename(
                tmp, os.path.join(landing, f"batch-{os.getpid()}-{seq}.json")
            )
            buf, seq, last_flush = [], seq + 1, time.monotonic()
        time.sleep(SAMPLE_PERIOD_S)


if __name__ == "__main__":
    sys.exit(main())
