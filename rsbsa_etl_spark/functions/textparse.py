"""Log-line parsing (SURVEY §2.1 S7, §2.7 F6/F9, §2.2 P6).

The reference reads its own log file, filters blank lines, and
regex-parses ``[timestamp] message`` with an ISO-string fallback for
malformed lines (``index.js:226-237``; writer format
``utils/logger.js:46-47``). Batch form here; the streaming form
lives in ``streaming/tail.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: ``^\[(.*?)\]`` — ``index.js:230``
TS_PATTERN = r"^\[([^\]]*)\]"


def parse_log_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """S7+F6+F9+P6: lines → {ts_raw, message} rows.

    - blank lines dropped (P6, ``index.js:228``)
    - timestamp extracted from ``[…]`` prefix (F6, ``index.js:230``)
    - malformed lines: null timestamp routed through ``coalesce``
      to a fallback marker (F9, ``index.js:231-233`` uses "now";
      a constant keeps the operator deterministic/testable)
    """
    c = F.col(col)
    ts = F.regexp_extract(c, TS_PATTERN, 1)
    return (
        lines.where(F.length(F.trim(c)) > 0)
        .select(
            F.coalesce(F.nullif(ts, F.lit("")), F.lit("__missing__")).alias("ts_raw"),
            F.trim(F.regexp_replace(c, TS_PATTERN, "")).alias("message"),
        )
    )


def render_log_lines(df: DataFrame, ts_col: str, msg_col: str) -> DataFrame:
    """Inverse of parse (writer format ``utils/logger.js:46-47``):
    ``[ts] message`` — used to synthesize log fixtures from the
    events table and by the append-log sink (K6)."""
    return df.select(
        F.concat(F.lit("["), F.col(ts_col), F.lit("] "), F.col(msg_col)).alias("value")
    )
