"""Sessionization — gap-based event sessions.

Batch version is pure window functions (lag -> new-session flag ->
running sum), fully Catalyst + whole-stage codegen, partitioned by user
(one shuffle on the user key). The streaming stateful variant lives in
streaming/sessions.py (applyInPandasWithState).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(user, session_id, n_events, session_start, session_end) with a
    new session whenever the gap to the previous event exceeds
    ``gap_seconds``. session_id is the per-user ordinal (0-based).

    ``tiebreak_col`` pins the within-user ordering under duplicate
    timestamps; the running sum uses an explicit ROWS frame (Spark's
    default window frame is RANGE, which is ambiguous under ties).
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    w_sum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # exact integer microseconds — a seconds-truncating cast would
    # disagree with the oracle on sub-second timestamps
    ts = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = int(gap_seconds) * 1_000_000
    prev = F.lag(ts).over(w)
    new_sess = F.when(prev.isNull() | ((ts - prev) > F.lit(gap_us)), 1).otherwise(0)
    sessions = events.withColumn("_new", new_sess).withColumn(
        "session_id", F.sum("_new").over(w_sum) - F.lit(1)
    )
    return (
        sessions.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def sessionize_sql(
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    table: str = "events",
    tiebreak_col: str | None = None,
) -> str:
    """DuckDB mirror of :func:`sessionize` (same window algebra).

    session_id is ``::BIGINT``-cast: DuckDB's windowed ``sum()`` over
    integers returns HUGEINT, which the driver canonicalizes to float64
    and hash-mismatches Spark's int64.
    """
    order = ts_col + (f", {tiebreak_col}" if tiebreak_col else "")
    carry = f", {tiebreak_col}" if tiebreak_col else ""
    return f"""
    WITH flagged AS (
      SELECT {user_col}, {ts_col}{carry},
        CASE WHEN lag(epoch_us({ts_col})) OVER w IS NULL
               OR epoch_us({ts_col}) - lag(epoch_us({ts_col})) OVER w > {int(gap_seconds) * 1_000_000}
             THEN 1 ELSE 0 END AS new_sess
      FROM {table}
      WINDOW w AS (PARTITION BY {user_col} ORDER BY {order})
    ),
    numbered AS (
      SELECT {user_col}, {ts_col},
             (sum(new_sess) OVER (PARTITION BY {user_col} ORDER BY {order}
                                 ROWS UNBOUNDED PRECEDING) - 1)::BIGINT AS session_id
      FROM flagged
    )
    SELECT {user_col}, session_id, count(*) AS n_events,
           min({ts_col}) AS session_start, max({ts_col}) AS session_end
    FROM numbered GROUP BY {user_col}, session_id
    """
