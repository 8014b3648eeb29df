#!/usr/bin/env python
"""Phase-decomposed cdc_ingest bench (round-3 verdict task 2): runs the
bench.py ingest workload (same WAL: $SPARK_GRAFT_SF_DIR docs, 200k events,
50k epochs, 32 buckets) with CDC_TIMING=1 and prints one JSON line with
per-phase totals for COW and MoR, so an engine-vs-engine comparison (e.g.
current HEAD vs the BENCH_r02 commit in a worktree) attributes a wall-time
delta to a named phase instead of guessing.

Usage: python bench/phase_compare.py [--trials N] [--label x]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["CDC_TIMING"] = "1"

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "200000"))
EVENTS_PER_EPOCH = int(os.environ.get("SPARK_GRAFT_BENCH_EPOCH", "50000"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--label", default="head")
    args = ap.parse_args()

    from cdc_engine import CdcConfig, SnapLake, replay
    from cdc_engine import timing
    from cdc_engine.schemas import PAGES_SCHEMA_V1
    from cdc_engine.session import build_session
    from gen.walgen import WalConfig, generate_wal

    tmp = tempfile.mkdtemp(prefix="cdc_phase_")
    try:
        wal = os.path.join(tmp, "wal")
        generate_wal(
            wal,
            WalConfig(
                n_events=N_EVENTS,
                events_per_epoch=EVENTS_PER_EPOCH,
                schema_change_at_epoch=max(1, N_EVENTS // EVENTS_PER_EPOCH // 2),
                docs_parquet=os.path.join(SF_DIR, "documents.parquet"),
            ),
        )
        spark = build_session(
            "cdc_phase", extra={"spark.sql.files.maxPartitionBytes": "33554432"}
        )
        cfg = CdcConfig(events_per_epoch=EVENTS_PER_EPOCH, n_buckets=32)

        warm = SnapLake.create(os.path.join(tmp, "lake_warm"), PAGES_SCHEMA_V1, n_buckets=32)
        replay(spark, warm, wal, cfg, max_epochs=1)
        timing.drain()

        out: dict[str, dict] = {}
        for mode in ("cow", "mor"):
            best_wall, best_phases = None, None
            for trial in range(args.trials):
                lake = SnapLake.create(
                    os.path.join(tmp, f"lake_{mode}_{trial}"),
                    PAGES_SCHEMA_V1,
                    n_buckets=32,
                    mode=mode,
                )
                timing.drain()
                t0 = time.monotonic()
                replay(spark, lake, wal, cfg)
                wall = round(time.monotonic() - t0, 3)
                phases: dict[str, float] = {}
                for name, secs in timing.drain():
                    phases[name] = round(phases.get(name, 0.0) + secs, 3)
                if best_wall is None or wall < best_wall:
                    best_wall, best_phases = wall, phases
            acc = round(sum(best_phases.values()), 3)
            best_phases["_unattributed"] = round(best_wall - acc, 3)
            out[mode] = {"wall": best_wall, "phases": best_phases}
        print(
            json.dumps(
                {
                    "label": args.label,
                    "sf_dir": SF_DIR,
                    "events": N_EVENTS,
                    "epoch": EVENTS_PER_EPOCH,
                    "trials": args.trials,
                    **out,
                }
            )
        )
        spark.stop()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
