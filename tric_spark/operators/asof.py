"""As-of join — attach to each left row the LATEST right row at or
before it (per key, by timestamp). [relational breadth: the log/
telemetry staple Spark lacks natively — "which click preceded this
purchase", "what was the config when this error fired"]

Spark has no ASOF JOIN; the naive theta-join (l.ts >= r.ts + window
max) explodes quadratically per key. The scalable form used here is the
UNION-AND-CARRY trick: tag both sides, sort each key's rows once by
(ts, side, id) and carry the last-seen right id forward with
``last(..., ignorenulls=True)`` — ONE shuffle on the key, one window
pass, zero self-joins, skew bounded by the busiest key exactly like any
sessionization. Payload columns are re-attached by id afterwards (a
broadcast-or-shuffle equi-join) rather than carried, so NULL payloads
cannot corrupt the carry.

Tie semantics (documented, deterministic, total): a right row at the
SAME timestamp as the left row matches (<=); among right rows sharing a
timestamp the largest ``id_col`` wins (they sort last in the carry
order). DuckDB ships a native ASOF JOIN but its same-ts tiebreak is not
specified — the oracle replays THIS window construction instead, so the
contract is pinned, not inherited.

Reference: not in tric (graph engine); north-rule relational checklist
extension (SURVEY §2.5 window family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    id_col: str = "event_id",
    payload: tuple = ("ts", "value"),
    prefix: str = "r_",
) -> DataFrame:
    """Every ``left`` row + the id and ``payload`` columns of its as-of
    ``right`` match (NULLs when no right row precedes it). Output keeps
    left's ``id_col``/``key``/``ts`` plus ``{prefix}{id_col}`` and
    ``{prefix}<payload>``."""
    r_u = right.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(id_col).alias("_oid"),
        F.col(id_col).alias("_re"),
    )
    l_u = left.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(id_col).alias("_oid"),
        F.lit(None).cast(right.schema[id_col].dataType).alias("_re"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_oid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r_u.unionByName(l_u)
        .withColumn("_m", F.last("_re", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(
            F.col("_oid").alias(id_col),
            key,
            F.col("_ts").alias(ts),
            F.col("_m").alias(f"{prefix}{id_col}"),
        )
    )
    pay = right.select(
        F.col(id_col).alias(f"{prefix}{id_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
    )
    return carried.join(pay, f"{prefix}{id_col}", "left")
