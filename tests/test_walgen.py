"""WAL generator determinism + oracle sanity (pure pandas, no Spark)."""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from gen.walgen import HTML_PREFIX, HTML_SUFFIX, WalConfig, generate_wal
from tests.conftest import DOCS_SF0001


def _dir_digest(d: str) -> str:
    h = hashlib.sha256()
    for root, _dirs, files in sorted(os.walk(d)):
        for fn in sorted(files):
            with open(os.path.join(root, fn), "rb") as f:
                h.update(fn.encode())
                h.update(f.read())
    return h.hexdigest()


def test_same_seed_byte_identical(tmp_path):
    cfg = WalConfig(n_events=3_000, events_per_epoch=1_000, docs_parquet=DOCS_SF0001)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    oa = generate_wal(a, cfg)
    ob = generate_wal(b, cfg)
    assert _dir_digest(a) == _dir_digest(b)
    pd.testing.assert_frame_equal(oa, ob)


def test_different_seed_differs(tmp_path):
    base = WalConfig(n_events=2_000, events_per_epoch=1_000, docs_parquet=DOCS_SF0001)
    oa = generate_wal(str(tmp_path / "a"), base)
    ob = generate_wal(
        str(tmp_path / "b"),
        WalConfig(n_events=2_000, events_per_epoch=1_000, seed=7, docs_parquet=DOCS_SF0001),
    )
    assert not oa.equals(ob)


def test_oracle_invariants(tmp_path):
    cfg = WalConfig(n_events=4_000, events_per_epoch=1_000, docs_parquet=DOCS_SF0001)
    oracle = generate_wal(str(tmp_path / "w"), cfg)
    # one row per url, sorted
    assert oracle["url"].is_unique
    assert list(oracle["url"]) == sorted(oracle["url"])
    # extract_text invariant holds in the fixture itself
    for html, text in zip(oracle["html"], oracle["text"]):
        assert html == HTML_PREFIX + text.encode("utf-8") + HTML_SUFFIX
    # no tombstones in the final state
    assert oracle["html"].notna().all()


def test_wal_mixes_scenarios(tmp_path):
    """The default-mix WAL really contains all four spec scenarios."""
    cfg = WalConfig(n_events=5_000, events_per_epoch=1_000, docs_parquet=DOCS_SF0001)
    generate_wal(str(tmp_path / "w"), cfg)
    ev = pd.read_parquet(str(tmp_path / "w" / "v1"))
    assert (ev["op"] == "delete").sum() > 0
    assert (ev["op"] == "update").sum() > 0
    # duplicates: same (url, warc_ts, op) under different seq
    dups = ev.duplicated(subset=["url", "warc_ts", "op"], keep=False).sum()
    assert dups > 0
    # out-of-order: warc_ts decreases for some url relative to an earlier event
    ev_sorted = ev.sort_values("seq")
    regress = (
        ev_sorted.groupby("url")["warc_ts"].apply(lambda s: (s.diff() < pd.Timedelta(0)).any())
    )
    assert regress.any()
