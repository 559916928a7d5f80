"""System-metrics ingest client (reference parity: S11,
examples/monitor_system.py:37-96 — poll cpu/mem/battery at 0.1 s,
batch-POST every 2 s).

psutil isn't in this container, so metrics fall back to /proc
readings (loadavg, meminfo) — gated behind import-try, same series
naming scheme (`system.cpu.percent` style dotted ids,
examples/monitor_system.py:45-49). Output goes to the engine's
streaming landing dir (see examples/monitor_files.py for why).

Usage:
    python examples/monitor_system.py LANDING_DIR [duration_s]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys
import time

SAMPLE_PERIOD_S = 0.1
FLUSH_PERIOD_S = 2.0

try:  # pragma: no cover - optional dependency
    import psutil
except ImportError:
    psutil = None


def sample() -> dict[str, float]:
    if psutil is not None:
        return {
            "system.cpu.percent": psutil.cpu_percent(),
            "system.memory.percent": psutil.virtual_memory().percent,
        }
    out: dict[str, float] = {}
    try:
        out["system.load.1m"] = os.getloadavg()[0]
    except OSError:
        pass
    try:
        with open("/proc/meminfo") as f:
            info = dict(
                (l.split(":")[0], float(l.split()[1])) for l in f if ":" in l
            )
        out["system.memory.available_kb"] = info.get("MemAvailable", 0.0)
    except (OSError, ValueError, IndexError):
        pass
    return out


def main() -> int:
    landing = sys.argv[1]
    deadline = time.monotonic() + float(sys.argv[2]) if len(sys.argv) > 2 else None
    buf: list[dict] = []
    last_flush = time.monotonic()
    seq = 0
    while deadline is None or time.monotonic() < deadline:
        now = dt.datetime.now(dt.timezone.utc).isoformat()
        for name, v in sample().items():
            buf.append({"dataset_id": name, "date": now, "value": v})
        if buf and time.monotonic() - last_flush >= FLUSH_PERIOD_S:
            tmp = os.path.join(landing, f".sys-{os.getpid()}-{seq}.tmp")
            with open(tmp, "w") as f:
                for row in buf:
                    f.write(json.dumps(row) + "\n")
            os.rename(tmp, os.path.join(landing, f"sys-{os.getpid()}-{seq}.json"))
            buf, seq, last_flush = [], seq + 1, time.monotonic()
        time.sleep(SAMPLE_PERIOD_S)
    return 0


if __name__ == "__main__":
    sys.exit(main())
