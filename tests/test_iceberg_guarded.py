"""IcebergLake is the real-cluster backend; this sandbox has no Iceberg
jars (SURVEY.md §7.1), so only importability and SQL-shape checks run here.
The full merge-semantics tests execute on a cluster where
iceberg_available() is true."""

from __future__ import annotations

import pytest

from cdc_engine.iceberg import IcebergLake, iceberg_available


def test_importable_and_interface_parity():
    # the subset of the SnapLake interface the engine drives
    for meth in ("create", "merge", "scan", "committed_epochs", "compact"):
        assert hasattr(IcebergLake, meth)


def test_wap_id_round_trip():
    """The atomic-ledger key: wap.id encodes (epoch, commit) and must parse
    back exactly — including commit ids that themselves contain dashes —
    while foreign wap ids (other writers sharing the table) are ignored."""
    for epoch, commit in ((0, "cafe"), (42, "c-with-dashes-123"), (10**9, "x")):
        wap = IcebergLake._wap_id(epoch, commit)
        assert IcebergLake._parse_wap(wap) == (epoch, commit)
    assert IcebergLake._parse_wap(None) is None
    assert IcebergLake._parse_wap("") is None
    assert IcebergLake._parse_wap("someone-elses-wap") is None
    assert IcebergLake._parse_wap("epoch-notanint-x") is None


def test_skipped_without_catalog(spark):
    if iceberg_available(spark):  # pragma: no cover - real cluster only
        lake = IcebergLake.create(spark, "lake.db.pages_test", n_buckets=8)
        assert lake.committed_epochs() == {}
    else:
        pytest.skip("no Iceberg catalog in sandbox (expected)")
