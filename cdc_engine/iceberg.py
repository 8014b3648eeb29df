"""IcebergLake: the real-cluster lake backend (SURVEY.md §7.2).

Same interface as SnapLake, implemented over genuine Apache Iceberg SQL.
This sandbox has no Iceberg jars and no network (SURVEY.md §7.1), so this
module cannot run here — it is import-guarded and its tests are skipped
unless a catalog is configured. On a real cluster:

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

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_engine.normalize import evolve_schema
from cdc_engine.schemas import WAL_META_COLS


def iceberg_available(spark: SparkSession, catalog: str = "lake") -> bool:
    try:
        spark.sql(f"SHOW NAMESPACES IN {catalog}")
        return True
    except Exception:
        return False


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
        merge_mode = "merge-on-read" if mode == "mor" else "copy-on-write"
        spark.sql(
            f"""
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
        )
        return IcebergLake(spark, table, mode)

    # ------------------------------------------------------------- ledger
    @staticmethod
    def _wap_id(epoch_id: int, commit_id: str) -> str:
        return f"epoch-{epoch_id}-{commit_id}"

    @staticmethod
    def _parse_wap(wap: str | None) -> tuple[int, str] | None:
        """Inverse of _wap_id; None for foreign/absent wap ids (sandboxed
        unit test coverage for the only pure logic in this module)."""
        if not wap or not wap.startswith("epoch-"):
            return None
        try:
            _, eid, cid = wap.split("-", 2)
            return int(eid), cid
        except ValueError:
            return None

    def committed_epochs(self) -> dict[int, str]:
        """epoch_id -> commit_id, read from the wap.id stamped into each
        PUBLISHED snapshot's summary (snapshots ∩ current ancestry — a
        staged-but-unpublished snapshot must not count as committed)."""
        rows = self.spark.sql(
            f"""
            SELECT s.summary FROM {self.table}.snapshots s
            JOIN {self.table}.history h ON s.snapshot_id = h.snapshot_id
            WHERE h.is_current_ancestor
            """
        ).collect()
        out: dict[int, str] = {}
        for r in rows:
            s = r["summary"] or {}
            parsed = self._parse_wap(s.get("wap.id") or s.get("published-wap-id"))
            if parsed is not None:
                out[parsed[0]] = parsed[1]
        return out

    # -------------------------------------------------------------- merge
    def merge(self, batch_df: DataFrame, epoch_id: int, commit_id: str) -> bool:
        """MERGE the deduped batch; snapshot summary carries the idempotence
        key. Returns False if the epoch was already committed."""
        if epoch_id in self.committed_epochs():
            return False
        # schema evolution: ALTER before MERGE for any new payload columns
        import pyspark.sql.types as T

        cur = self.spark.table(self.table).schema
        incoming = T.StructType(
            [f for f in batch_df.schema.fields if f.name not in WAL_META_COLS]
        )
        evolved = evolve_schema(
            T.StructType([f for f in cur.fields if not f.name.startswith("_")]),
            incoming,
        )
        for f in evolved.fields:
            if f.name not in cur.fieldNames():
                self.spark.sql(
                    f"ALTER TABLE {self.table} ADD COLUMN {f.name} {f.dataType.simpleString()}"
                )

        batch_df.createOrReplaceTempView("_cdc_batch")
        cols = [f.name for f in evolved.fields]
        sets = ", ".join(
            [f"t.{c} = s.{c}" for c in cols]
            + ["t._seq = s.seq", "t._deleted = (s.op = 'delete')"]
        )
        ins_cols = ", ".join(cols + ["_seq", "_deleted"])
        ins_vals = ", ".join([f"s.{c}" for c in cols] + ["s.seq", "(s.op = 'delete')"])
        # WAP audit-publish: the wap.id (encoding the epoch) lands in the
        # snapshot summary ATOMICALLY with the MERGE — this IS the ledger
        # entry; no post-hoc ALTER TABLE to crash between.
        wap = self._wap_id(epoch_id, commit_id)
        self.spark.conf.set("spark.wap.id", wap)
        try:
            self.spark.sql(
                f"""
                MERGE INTO {self.table} t
                USING _cdc_batch s
                ON t.url = s.url
                WHEN MATCHED AND (s.warc_ts > t.warc_ts
                                  OR (s.warc_ts = t.warc_ts AND s.seq > t._seq))
                  THEN UPDATE SET {sets}
                WHEN NOT MATCHED
                  THEN INSERT ({ins_cols}) VALUES ({ins_vals})
                """
            )
        finally:
            self.spark.conf.unset("spark.wap.id")
        # publish the staged snapshot; Iceberg's duplicate-wap.id guard makes
        # a concurrent/retried publish of the same epoch fail loudly instead
        # of double-committing
        cat = self.table.split(".")[0]
        staged = self.spark.sql(
            f"""
            SELECT s.snapshot_id FROM {self.table}.snapshots s
            LEFT ANTI JOIN {self.table}.history h ON s.snapshot_id = h.snapshot_id
            WHERE s.summary['wap.id'] = '{wap}'
            """
        ).collect()
        for r in staged:
            self.spark.sql(
                f"CALL {cat}.system.cherrypick_snapshot("
                f"table => '{self.table}', snapshot_id => {r['snapshot_id']})"
            )
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
        cat = self.table.split(".")[0]
        self.spark.sql(
            f"CALL {cat}.system.rewrite_data_files(table => '{self.table}')"
        )
