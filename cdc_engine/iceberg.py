"""IcebergLake: the real-cluster lake backend (SURVEY.md §7.2).

Same interface as SnapLake, implemented over genuine Apache Iceberg SQL.
This sandbox has no Iceberg jars and no network (SURVEY.md §7.1), so the
RUNTIME of this module cannot execute here — it is import-guarded and its
integration tests are skipped unless a catalog is configured. Everything
that can be verified without jars IS: all SQL construction, the wap-id
codec, and schema-evolution ALTER planning are pure functions golden-
tested in-sandbox (tests/test_iceberg_guarded.py), so the only unverified
surface left is the Iceberg runtime itself. On a real cluster:

    spark-submit --py-files dist/cdc_engine.zip \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hadoop \\
      --conf spark.sql.catalog.lake.warehouse=hdfs:///warehouse \\
      main.py ingest ...

Semantics map 1:1 onto SnapLake's:
  SnapLake bucketed files      -> PARTITIONED BY (bucket(N, url))
  SnapLake COW / MoR modes     -> write.merge.mode copy-on-write / merge-on-read
  manifest summary commit_id   -> Iceberg snapshot summary properties
  ledger-in-manifest           -> wap.id in the snapshot summary (atomic
                                  with the MERGE — see below)
  compact()                    -> CALL system.rewrite_data_files
  time travel by version       -> VERSION AS OF / snapshot-id

Exactly-once ledger atomicity (the WAP audit-publish pattern): the table is
created with ``write.wap.enabled=true`` and each MERGE runs with
``spark.wap.id = <commit id encoding the epoch>``. Iceberg then records the
id in the new snapshot's summary IN THE SAME COMMIT as the data (no second
ALTER TABLE to crash between), stages the snapshot, and
``cherrypick_snapshot`` publishes it; Iceberg itself refuses to publish the
same wap.id twice (duplicate-commit guard). ``committed_epochs`` reads the
ids back from the PUBLISHED ancestry (snapshots joined to history), so a
crash between MERGE and publish leaves a staged orphan that is simply
re-merged — and the LWW merge condition makes even that replay
state-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from cdc_engine.normalize import evolve_schema
from cdc_engine.schemas import WAL_META_COLS


def iceberg_available(spark: SparkSession, catalog: str = "lake") -> bool:
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}")
        return True
    except Exception:
        return False


# --------------------------------------------------------------------------
# Pure SQL builders + codecs (sandbox-testable; no Iceberg runtime needed)
# --------------------------------------------------------------------------

def wap_id(epoch_id: int, commit_id: str) -> str:
    """The idempotence key stamped into the snapshot summary."""
    return f"epoch-{epoch_id}-{commit_id}"


def parse_wap(wap: str | None) -> tuple[int, str] | None:
    """Inverse of wap_id; None for foreign/absent wap ids."""
    if not wap or not wap.startswith("epoch-"):
        return None
    try:
        _, eid, cid = wap.split("-", 2)
        return int(eid), cid
    except ValueError:
        return None


def create_table_sql(table: str, n_buckets: int, mode: str) -> str:
    """CREATE TABLE with url-hash bucketing + WAP enabled. ``mode``
    'mor'/'cow' maps to Iceberg write.*.mode merge-on-read/copy-on-write."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"unknown table mode: {mode}")
    merge_mode = "merge-on-read" if mode == "mor" else "copy-on-write"
    return f"""
        CREATE TABLE IF NOT EXISTS {table} (
          url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
          lang STRING, _seq BIGINT, _deleted BOOLEAN)
        USING iceberg
        PARTITIONED BY (bucket({n_buckets}, url))
        TBLPROPERTIES (
          'format-version' = '2',
          'write.merge.mode' = '{merge_mode}',
          'write.update.mode' = '{merge_mode}',
          'write.delete.mode' = '{merge_mode}',
          'write.spark.accept-any-schema' = 'true',
          'write.wap.enabled' = 'true',
          'write.distribution-mode' = 'hash')
        """


def plan_schema_evolution(
    cur: T.StructType, batch_schema: T.StructType, table: str
) -> tuple[list[str], list[str]]:
    """(ALTER statements to run before the MERGE, evolved user column list).

    ``cur`` is the live table schema (internal _seq/_deleted included);
    ``batch_schema`` the incoming WAL batch's. New payload columns become
    ADD COLUMN; widened ones rely on Iceberg's type promotion at write
    (int->long etc. is a metadata-only change Iceberg performs on ALTER —
    emitted here as ALTER COLUMN TYPE when the evolved type differs)."""
    incoming = T.StructType(
        [f for f in batch_schema.fields if f.name not in WAL_META_COLS]
    )
    cur_user = T.StructType([f for f in cur.fields if not f.name.startswith("_")])
    evolved = evolve_schema(cur_user, incoming)
    cur_types = {f.name: f.dataType for f in cur_user.fields}
    alters: list[str] = []
    for f in evolved.fields:
        if f.name not in cur_types:
            alters.append(
                f"ALTER TABLE {table} ADD COLUMN {f.name} {f.dataType.simpleString()}"
            )
        elif f.dataType != cur_types[f.name]:
            alters.append(
                f"ALTER TABLE {table} ALTER COLUMN {f.name} "
                f"TYPE {f.dataType.simpleString()}"
            )
    return alters, [f.name for f in evolved.fields]


def merge_sql(table: str, user_cols: list[str], source_view: str = "_cdc_batch") -> str:
    """LWW MERGE INTO: a matched row updates only when the source is
    strictly fresher by (warc_ts, seq); deletes persist as _deleted
    tombstones (never physical drops — an out-of-order insert in a later
    epoch with an older warc_ts must still lose)."""
    sets = ", ".join(
        [f"t.{c} = s.{c}" for c in user_cols]
        + ["t._seq = s.seq", "t._deleted = (s.op = 'delete')"]
    )
    ins_cols = ", ".join(list(user_cols) + ["_seq", "_deleted"])
    ins_vals = ", ".join([f"s.{c}" for c in user_cols] + ["s.seq", "(s.op = 'delete')"])
    return f"""
        MERGE INTO {table} t
        USING {source_view} s
        ON t.url = s.url
        WHEN MATCHED AND (s.warc_ts > t.warc_ts
                          OR (s.warc_ts = t.warc_ts AND s.seq > t._seq))
          THEN UPDATE SET {sets}
        WHEN NOT MATCHED
          THEN INSERT ({ins_cols}) VALUES ({ins_vals})
        """


def committed_epochs_sql(table: str) -> str:
    """Published-ancestry wap ids only: snapshots ∩ history — a staged-but-
    unpublished snapshot must not count as committed."""
    return f"""
        SELECT s.summary FROM {table}.snapshots s
        JOIN {table}.history h ON s.snapshot_id = h.snapshot_id
        WHERE h.is_current_ancestor
        """


def staged_snapshot_sql(table: str, wap: str) -> str:
    """Snapshots carrying this wap id that are NOT yet in the published
    history (anti join) — the cherrypick targets."""
    return f"""
        SELECT s.snapshot_id FROM {table}.snapshots s
        LEFT ANTI JOIN {table}.history h ON s.snapshot_id = h.snapshot_id
        WHERE s.summary['wap.id'] = '{wap}'
        """


def cherrypick_sql(table: str, snapshot_id: int) -> str:
    cat = table.split(".")[0]
    return (
        f"CALL {cat}.system.cherrypick_snapshot("
        f"table => '{table}', snapshot_id => {snapshot_id})"
    )


def rewrite_data_files_sql(table: str) -> str:
    cat = table.split(".")[0]
    return f"CALL {cat}.system.rewrite_data_files(table => '{table}')"


# --------------------------------------------------------------------------
# Runtime wrapper (requires Iceberg jars + a configured catalog)
# --------------------------------------------------------------------------

class IcebergLake:
    """Iceberg-backed pages table with the SnapLake interface subset the
    engine uses (merge / scan / committed_epochs / ledger / compact)."""

    def __init__(self, spark: SparkSession, table: str, mode: str = "mor"):
        self.spark = spark
        self.table = table  # e.g. "lake.db.pages"
        self.mode = mode

    @staticmethod
    def create(
        spark: SparkSession,
        table: str,
        n_buckets: int = 4096,
        mode: str = "mor",
    ) -> "IcebergLake":
        spark.sql(create_table_sql(table, n_buckets, mode))
        return IcebergLake(spark, table, mode)

    # ------------------------------------------------------------- ledger
    # back-compat aliases for the codec (older tests/callers)
    _wap_id = staticmethod(wap_id)
    _parse_wap = staticmethod(parse_wap)

    def committed_epochs(self) -> dict[int, str]:
        """epoch_id -> commit_id, from published snapshot summaries."""
        rows = self.spark.sql(committed_epochs_sql(self.table)).collect()
        out: dict[int, str] = {}
        for r in rows:
            s = r["summary"] or {}
            parsed = parse_wap(s.get("wap.id") or s.get("published-wap-id"))
            if parsed is not None:
                out[parsed[0]] = parsed[1]
        return out

    # -------------------------------------------------------------- merge
    def merge(self, batch_df: DataFrame, epoch_id: int, commit_id: str) -> bool:
        """MERGE the deduped batch; snapshot summary carries the idempotence
        key. Returns False if the epoch was already committed."""
        if epoch_id in self.committed_epochs():
            return False
        cur = self.spark.table(self.table).schema
        alters, user_cols = plan_schema_evolution(cur, batch_df.schema, self.table)
        for stmt in alters:
            self.spark.sql(stmt)

        batch_df.createOrReplaceTempView("_cdc_batch")
        # WAP audit-publish: the wap.id (encoding the epoch) lands in the
        # snapshot summary ATOMICALLY with the MERGE — this IS the ledger
        # entry; no post-hoc ALTER TABLE to crash between.
        wap = wap_id(epoch_id, commit_id)
        self.spark.conf.set("spark.wap.id", wap)
        try:
            self.spark.sql(merge_sql(self.table, user_cols))
        finally:
            self.spark.conf.unset("spark.wap.id")
        # publish the staged snapshot; Iceberg's duplicate-wap.id guard makes
        # a concurrent/retried publish of the same epoch fail loudly instead
        # of double-committing
        staged = self.spark.sql(staged_snapshot_sql(self.table, wap)).collect()
        for r in staged:
            self.spark.sql(cherrypick_sql(self.table, r["snapshot_id"]))
        return True

    # --------------------------------------------------------------- scan
    def scan(self, version: int | None = None) -> DataFrame:
        df = (
            self.spark.read.option("snapshot-id", version).table(self.table)
            if version is not None
            else self.spark.table(self.table)
        )
        user_cols = [c for c in df.columns if not c.startswith("_")]
        return df.where(~F.col("_deleted")).select(*user_cols)

    # ---------------------------------------------------------- compaction
    def compact(self) -> None:
        self.spark.sql(rewrite_data_files_sql(self.table))
