"""Deterministic WAL generator + sequential pandas oracle (FIXTURES.md).

Same (seed, cfg) => byte-identical WAL segments and oracle. Payload text is
derived from the driver-provided read-only ``documents.parquet`` (seed=42,
TESTDATA.md) so no external data is used.

The oracle DEFINES reference semantics (the reference snapshot ships no
executable — SURVEY.md §0.1): apply events in seq order, per url keep the
row with max (warc_ts, seq); if the winner is a delete the url is absent;
normalize all rows to the final schema version. It is deliberately a
sequential, single-threaded, obviously-correct pandas groupby — the engine
must reproduce it under any batching/parallelism.
"""

from __future__ import annotations

import os
import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

HTML_PREFIX = b"<html><body>"
HTML_SUFFIX = b"</body></html>"

BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, fixed epoch base

PAGES_COLS_V1 = ["url", "warc_ts", "html", "text", "lang"]
PAGES_COLS_V2 = PAGES_COLS_V1 + ["fetch_status"]


@dataclass
class WalConfig:
    n_events: int = 50_000
    events_per_epoch: int = 5_000
    pct_update: float = 0.30
    pct_delete: float = 0.05
    pct_duplicate: float = 0.05
    pct_out_of_order: float = 0.10
    # epoch index at which the WAL switches to schema v2; None = v1 only
    schema_change_at_epoch: int | None = None
    zipf_a: float = 1.3
    n_domains: int = 1_000
    pages_per_domain: int = 50
    n_source_partitions: int = 8
    max_text_chars: int | None = 400
    seed: int = 42
    docs_parquet: str = "/root/testdata/sf0.001/documents.parquet"
    extra: dict = field(default_factory=dict)


def _zipf_domain_probs(n: int, a: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** a
    return w / w.sum()


def generate_wal(out_dir: str, cfg: WalConfig) -> pd.DataFrame:
    """Write WAL segments + oracle under ``out_dir``; return the oracle df."""
    rng = np.random.RandomState(cfg.seed)
    docs = pd.read_parquet(cfg.docs_parquet, columns=["text", "lang"])
    doc_texts = docs["text"].to_numpy()
    doc_langs = docs["lang"].to_numpy()
    n_docs = len(docs)

    probs = _zipf_domain_probs(cfg.n_domains, cfg.zipf_a)
    n = cfg.n_events

    # --- vectorized draws (order matters for determinism; never re-draw) ---
    r_dup = rng.random_sample(n)
    r_op = rng.random_sample(n)
    r_ooo = rng.random_sample(n)
    domains = rng.choice(cfg.n_domains, size=n, p=probs)
    pages = rng.randint(0, cfg.pages_per_domain, size=n)
    ooo_back_us = rng.randint(1, 100, size=n).astype(np.int64) * 1_000_000
    dup_pick = rng.random_sample(n)

    events: list[dict] = []  # emitted WAL rows, index == seq
    last_ts: dict[str, int] = {}  # url -> max warc_ts emitted (µs)
    versions: dict[str, int] = {}  # url -> version counter
    live_urls: list[str] = []  # urls with at least one event (dup/ooo pool)

    for seq in range(n):
        if events and r_dup[seq] < cfg.pct_duplicate:
            # exact re-delivery of an earlier event under a new seq
            src = events[int(dup_pick[seq] * len(events))]
            ev = dict(src, seq=seq)
            events.append(ev)
            continue

        d, p = int(domains[seq]), int(pages[seq])
        url = f"https://d{d:04d}.example.com/p{p:02d}"
        seen = url in last_ts

        if seen and r_op[seq] < cfg.pct_delete:
            op = "delete"
        elif seen and r_op[seq] < cfg.pct_delete + cfg.pct_update:
            op = "update"
        else:
            op = "insert" if not seen else "update"

        if seen and r_ooo[seq] < cfg.pct_out_of_order:
            # out-of-order: strictly older than the url's newest version
            ts = last_ts[url] - int(ooo_back_us[seq])
        else:
            ts = BASE_TS_US + seq * 1_000_000
        # keep ts unique per url so LWW has a clean total order w/ seq ties
        # only via exact duplicates
        if ts == last_ts.get(url):
            ts += 1

        version = versions.get(url, 0) + 1
        versions[url] = version
        if ts >= last_ts.get(url, -1):
            last_ts[url] = ts
        if not seen:
            last_ts.setdefault(url, ts)
            live_urls.append(url)

        if op == "delete":
            html = text = lang = None
        else:
            # crc32, not hash(): Python str hash is process-randomized
            doc_i = zlib.crc32(url.encode()) % n_docs
            t = doc_texts[doc_i]
            if cfg.max_text_chars:
                t = t[: cfg.max_text_chars]
            text = f"{t} v{version}"
            html = HTML_PREFIX + text.encode("utf-8") + HTML_SUFFIX
            lang = doc_langs[doc_i]

        events.append(
            {
                "seq": seq,
                "op": op,
                "url": url,
                "warc_ts": ts,
                "html": html,
                "text": text,
                "lang": lang,
                "source_partition": d % cfg.n_source_partitions,
            }
        )

    df = pd.DataFrame(events)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"], unit="us")

    # v2 columns (assigned for ALL rows; v1 segments simply don't write them)
    fetch_rng = np.random.RandomState(cfg.seed + 1)
    df["fetch_status"] = pd.array(
        np.where(fetch_rng.random_sample(len(df)) < 0.95, 200, 404), dtype="Int32"
    )
    # deletes are tombstones: ALL payload columns null (FIXTURES.md §2)
    df.loc[df["op"] == "delete", "fetch_status"] = pd.NA

    _write_segments(out_dir, df, cfg)
    oracle = compute_oracle(df, cfg)
    odir = os.path.join(out_dir, "_oracle")
    os.makedirs(odir, exist_ok=True)
    oracle.to_parquet(os.path.join(odir, "final_state.parquet"), index=False)
    return oracle


def _arrow_schema(version: int) -> pa.schema:
    fields = [
        ("seq", pa.int64()),
        ("op", pa.string()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
    if version == 1:
        fields.append(("source_partition", pa.int32()))
    else:
        fields.append(("source_partition", pa.int64()))  # widened
        fields.append(("fetch_status", pa.int32()))  # added
    return pa.schema(fields)


def _write_segments(out_dir: str, df: pd.DataFrame, cfg: WalConfig) -> None:
    e = cfg.events_per_epoch
    n_epochs = (len(df) + e - 1) // e
    cut = cfg.schema_change_at_epoch
    for k in range(n_epochs):
        version = 2 if (cut is not None and k >= cut) else 1
        seg = df.iloc[k * e : (k + 1) * e]
        schema = _arrow_schema(version)
        cols = [f.name for f in schema]
        tbl = pa.Table.from_pandas(seg[cols], schema=schema, preserve_index=False)
        d = os.path.join(out_dir, f"v{version}")
        os.makedirs(d, exist_ok=True)
        # modest row groups so Spark can split one segment file into many
        # input partitions (a Kafka topic has partition-parallelism for free;
        # the file WAL must provide it via row-group alignment)
        pq.write_table(
            tbl,
            os.path.join(d, f"segment-{k * e:012d}.parquet"),
            row_group_size=50_000,
        )


def compute_oracle(events: pd.DataFrame, cfg: WalConfig) -> pd.DataFrame:
    """Sequential LWW apply — the executable definition of correctness."""
    ev = events.sort_values(["warc_ts", "seq"], kind="mergesort")
    winners = ev.groupby("url", sort=True).tail(1)
    final = winners[winners["op"] != "delete"].copy()
    has_v2 = cfg.schema_change_at_epoch is not None and (
        cfg.schema_change_at_epoch * cfg.events_per_epoch < len(events)
    )
    if has_v2:
        # rows whose winning event came from a v1 segment have no
        # fetch_status in the WAL -> NULL in the final (v2) table
        v2_start = cfg.schema_change_at_epoch * cfg.events_per_epoch
        final["fetch_status"] = final["fetch_status"].astype("Int32")
        final.loc[final["seq"] < v2_start, "fetch_status"] = pd.NA
        cols = PAGES_COLS_V2
    else:
        cols = PAGES_COLS_V1
    return final[cols].sort_values("url").reset_index(drop=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n-events", type=int, default=50_000)
    ap.add_argument("--events-per-epoch", type=int, default=5_000)
    ap.add_argument("--schema-change-at-epoch", type=int, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--docs", default="/root/testdata/sf0.001/documents.parquet")
    a = ap.parse_args()
    cfg = WalConfig(
        n_events=a.n_events,
        events_per_epoch=a.events_per_epoch,
        schema_change_at_epoch=a.schema_change_at_epoch,
        seed=a.seed,
        docs_parquet=a.docs,
    )
    oracle = generate_wal(a.out_dir, cfg)
    print(f"wrote WAL to {a.out_dir}: {a.n_events} events, oracle rows={len(oracle)}")
