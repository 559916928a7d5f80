"""Axis-label math (SURVEY.md F10/F11) — the reference computes
"nice" tick intervals browser-side (public/axes.js:255-430) and
formats values with exponential fallback (public/graph.js:396-397).
The engine subsumes them as plain-Python presentation helpers (pure
driver-side math — not worth a Spark job; cited so the §2.8 inventory
is complete).

Spec (re-derived from the reference's behavior, not a translation):
  * base-10 ladder: candidate intervals {1, 2, 2.5, 5, 10} x 10^n —
    pick the smallest candidate >= span/max_labels
    (public/axes.js:350-379).
  * base-60 ladder for time axes: seconds/minutes ladder
    {1,2,5,10,15,20,30,60, 2m,5m,10m,15m,20m,30m,1h, 2h,3h,6h,12h,24h}
    then day multiples (public/axes.js:390-426).
  * labels start at the first multiple of the interval >= lo
    (ceil-to-multiple, public/axes.js:266-273).
  * values outside [1e-3, 1e5] format in exponential notation.
"""

from __future__ import annotations

import math

_BASE10_CANDIDATES = (1.0, 2.0, 2.5, 5.0, 10.0)

_BASE60_LADDER_S = (
    1, 2, 5, 10, 15, 20, 30, 60,
    120, 300, 600, 900, 1200, 1800, 3600,
    7200, 10800, 21600, 43200, 86400,
)


def base10_interval(span: float, max_labels: int = 10) -> float:
    """Smallest 'nice' base-10 interval giving <= max_labels ticks."""
    if span <= 0 or max_labels <= 0:
        raise ValueError("span and max_labels must be positive")
    raw = span / max_labels
    mag = 10 ** math.floor(math.log10(raw))
    for c in _BASE10_CANDIDATES:
        if c * mag >= raw:
            return c * mag
    return 10 * mag


def base60_interval(span_s: float, max_labels: int = 10) -> float:
    """'Nice' time interval: base-60 ladder up to a day, then nice
    day multiples."""
    if span_s <= 0 or max_labels <= 0:
        raise ValueError("span and max_labels must be positive")
    raw = span_s / max_labels
    for step in _BASE60_LADDER_S:
        if step >= raw:
            return float(step)
    return base10_interval(span_s / 86400.0, max_labels) * 86400.0


def labels(lo: float, hi: float, interval: float) -> list[float]:
    """Tick positions: first multiple of `interval` >= lo, through hi."""
    first = math.ceil(lo / interval) * interval
    out = []
    x = first
    while x <= hi + 1e-12 * max(abs(hi), 1.0):
        out.append(x)
        x += interval
    return out


def base10_labels(lo: float, hi: float, max_labels: int = 10) -> list[float]:
    return labels(lo, hi, base10_interval(hi - lo, max_labels))


def time_labels(lo_s: float, hi_s: float, max_labels: int = 10) -> list[float]:
    return labels(lo_s, hi_s, base60_interval(hi_s - lo_s, max_labels))


def format_value(v: float) -> str:
    """F11: exponential notation outside [1e-3, 1e5]."""
    a = abs(v)
    if v != 0 and (a < 1e-3 or a >= 1e5):
        return f"{v:.3e}"
    return f"{v:g}"
