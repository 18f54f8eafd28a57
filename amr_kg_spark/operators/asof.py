"""As-of (most-recent-match) join — a custom operator Spark lacks natively.

For each left row, find the right row with the greatest right_ts <= left_ts
within the same key. Implemented as a UNION + window scan (composition of
existing DataFrame ops, SURVEY custom-operator rule (a)):

  union(left tagged, right tagged)
    -> window per key ORDER BY (ts, is_left, tiebreak)
    -> last_value(right payload, ignoreNulls) over rows unbounded-preceding
    -> keep left rows

One shuffle on the key, O(n log n) per partition, no range explosion —
unlike the naive theta-join (left.ts >= right.ts) whose output is
quadratic before aggregation. Right rows sort BEFORE left rows at equal
ts (is_left=1 after is_left=0), so ties resolve to 'right row at exactly
left_ts matches', with a deterministic tiebreak column for duplicate
right timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tiebreak: str,
    right_key: str | None = None,
) -> DataFrame:
    """Columns of ``left`` + ``payload_cols`` of the as-of matched right row
    (NULLs when no right row precedes)."""
    lcols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__p_{c}") for c in payload_cols],
    )
    r = right.select(
        F.col(right_key or key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).cast("long").alias("__tb"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
            for c in payload_cols
        ],
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in payload_cols],
    )
