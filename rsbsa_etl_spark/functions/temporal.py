"""Temporal scalar functions (SURVEY §2.7 F4/F5/F10).

- F4 timezone-pinned formatting — the reference renders every
  timestamp in Asia/Manila (+08:00, no DST) via Intl.DateTimeFormat
  (``services/etlService.js:753-773``, dup ``utils/logger.js:22-42``).
- F5/F10 duration decomposition — ms → "{h}h {m}m {s}s"
  (``index.js:39-44``), uptime diffs (``index.js:134,188,331``).

All pure column expressions — codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MANILA_TZ = "Asia/Manila"


def format_manila(ts: Column, fmt: str = "yyyy-MM-dd'T'HH:mm:ss") -> Column:
    """F4: render a (UTC-instant) timestamp in Asia/Manila.

    Session timezone stays UTC for oracle comparability (SURVEY
    §7.3.4); the +08:00 shift is explicit and local to the output
    edge, exactly like the reference formats only at log/serialize
    time."""
    return F.date_format(F.from_utc_timestamp(ts, MANILA_TZ), fmt)


def duration_hms(millis: Column) -> Column:
    """F5: ms → "{h}h {m}m {s}s" (``index.js:39-44``)."""
    total_s = (millis / F.lit(1000)).cast("long")
    h = (total_s / 3600).cast("long")
    m = ((total_s % 3600) / 60).cast("long")
    s = total_s % 60
    return F.format_string("%dh %dm %ds", h, m, s)


def epoch_millis(ts: Column) -> Column:
    """F10: timestamp → epoch ms (for diffs; ``endTime - startTime``
    ``index.js:134``)."""
    return F.unix_millis(ts)
