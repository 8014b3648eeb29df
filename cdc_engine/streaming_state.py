"""T7 (optional surface): custom stateful streaming operator via
applyInPandasWithState — a cross-batch LWW GATE.

The engine's authoritative exactly-once/LWW guard is stateless by design
(ledger + MERGE condition; state lives in the lake, SURVEY.md §2.9 T7), so
a restart can never lose operator state. This module adds the complementary
TRANSPORT-level operator the spec's streaming surface names: a keyed,
checkpointed state store tracking the newest (warc_ts, seq) per url, which
drops stale/duplicate deliveries BEFORE they reach apply_epoch. Dropping
here is always safe — anything the gate would pass through is judged again
by the merge condition — so the gate only ever saves work, never decides
correctness.

Arrow-vectorized per group (pandas batches), never per-row Python UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state per url: newest (event-time ns, seq) ever emitted downstream
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_ns", T.LongType()),
        T.StructField("last_seq", T.LongType()),
    ]
)


def _gate_fn(output_cols: list[str]):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        last_ts, last_seq = state.get if state.exists else (-1, -1)
        batch = pd.concat(list(pdfs), ignore_index=True)
        ts_ns = batch["warc_ts"].to_numpy().astype("datetime64[ns]").astype("int64")
        seq = batch["seq"].to_numpy()
        # batch winner = argmax of (warc_ts, seq), vectorized: lexsort's
        # LAST key is primary, so the final index is the max pair. The unit
        # only needs to be consistent across batches, so raw int64 ns is
        # fine for state.
        i = int(np.lexsort((seq, ts_ns))[-1])
        if (int(ts_ns[i]), int(seq[i])) > (last_ts, last_seq):
            state.update((int(ts_ns[i]), int(seq[i])))
            yield batch.iloc[[i]][output_cols]

    return fn


def lww_gate(stream: DataFrame) -> DataFrame:
    """Per-url cross-batch LWW gate over a streaming WAL DataFrame: each
    micro-batch emits at most one row per url — the batch winner — and only
    when it is strictly fresher than everything previously emitted for that
    url (state persists across batches via the streaming checkpoint)."""
    out_schema = stream.schema
    cols = [f.name for f in out_schema.fields]
    return stream.groupBy("url").applyInPandasWithState(
        _gate_fn(cols),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
