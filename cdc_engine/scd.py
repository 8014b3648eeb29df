"""SCD Type-2 history assembly from a CDC change stream.

The lake modes (lake.py) keep only the LATEST version per key (LWW
upsert semantics — the "current state" table). A slowly-changing-
dimension type-2 table is the other canonical CDC product: EVERY version
of a key survives, with a validity interval [effective_from,
effective_to) stitched from the change stream's own timestamps and a
current-row marker. Downstream as-of joins (contract.py
q_asof_prior_click) can then resolve "what did this key look like at
time t" without replaying the WAL.

Shape (the 100 TB story): one window partitioned by key ordered by
(ts, seq) — exactly the LWW dedup shuffle (dedup.py) with lead/
row_number instead of a max pick, so it scales the same way: one hash
partition exchange on the key, per-partition sort, no driver state, no
Python. A delete change closes the key's history (its own synthetic
version carries the tombstone and is never current).

Capability parity: BASELINE.json names change-event ingest with
updates/deletes/out-of-order [SPEC BASELINE.json:6]; type-2 history is
the standard materialization of that stream next to the type-1
(current-state) table lake.py already provides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(
    changes: DataFrame,
    key: str = "url",
    ts: str = "ts",
    seq: str = "seq",
    op_col: str | None = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Append SCD2 columns to a change stream: version_n (1-based per
    key), effective_to (next version's ts, NULL while open), is_current
    (open AND not a tombstone). Ties on ts break by seq — the same
    total order lww_dedup uses, so the SCD2 current row always agrees
    with the LWW winner."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(seq).asc())
    out = changes.withColumn(
        "version_n", F.row_number().over(w).cast("int")
    ).withColumn("effective_to", F.lead(ts).over(w))
    is_current = F.col("effective_to").isNull()
    if op_col is not None:
        is_current = is_current & (F.col(op_col) != F.lit(delete_op))
    return out.withColumn("is_current", is_current)
