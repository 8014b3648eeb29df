"""textops.bpe_pair_topk: weighted adjacent-pair counts over the
word-frequency relation; textops.bpe_encode: frozen-merge-table encode."""

from __future__ import annotations

from cdc_engine.textops import BPE_MERGES, bpe_encode, bpe_pair_topk


def test_bpe_pair_counts_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "abc ab x"), (2, "abc bc"), (3, "ab")],
        "doc_id int, text string",
    )
    # word freqs: abc=2, ab=2, bc=1, x=1 (single char -> no pairs)
    # pair weights: ab = 2(abc) + 2(ab) = 4; bc = 2(abc) + 1(bc) = 3
    out = [(r["pair"], r["n"]) for r in bpe_pair_topk(docs, k=10).collect()]
    assert out == [("ab", 4), ("bc", 3)]


def test_bpe_tie_break_is_lexicographic(spark):
    docs = spark.createDataFrame([(1, "zz aa")], "doc_id int, text string")
    out = [(r["pair"], r["n"]) for r in bpe_pair_topk(docs, k=2).collect()]
    assert out == [("aa", 1), ("zz", 1)]


def _encode_py(word: str, merges) -> int:
    """Independent pure-python Sennrich encode: marker representation,
    each merge applied exhaustively left-to-right in rank order."""
    rep = "".join("_" + c for c in word)
    for a, b in merges:
        rep = rep.replace(f"_{a}_{b}", f"_{a}{b}")
    return rep.count("_")


def test_bpe_encode_matches_sequential_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "join the hash parser"), (2, "inner join grows lower"), (3, "q")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in bpe_encode(docs).collect()}
    import re

    for doc_id, text in [(1, "join the hash parser"), (2, "inner join grows lower"), (3, "q")]:
        words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        assert out[doc_id]["n_words"] == len(words)
        assert out[doc_id]["n_chars"] == sum(len(w) for w in words)
        assert out[doc_id]["n_subtokens"] == sum(_encode_py(w, BPE_MERGES) for w in words)


def test_bpe_encode_compresses_and_bounds(spark):
    # "join" is a learned 2-stage merge (j+o, jo+in) -> ONE subtoken;
    # a never-merged word stays at one subtoken per char
    docs = spark.createDataFrame([(1, "join join zqx")], "doc_id int, text string")
    row = bpe_encode(docs).collect()[0]
    assert row["n_chars"] == 11
    # join=1 subtoken (x2), zqx=3 subtokens
    assert row["n_subtokens"] == 5
    assert row["n_subtokens"] <= row["n_chars"]


def test_bpe_encode_left_to_right_overlap(spark):
    # merge (e, r): "ererer" -> er|er|er (left-to-right non-overlapping);
    # "rere" -> r|er|e (_r_e_r_e: replace "_e_r" matches once, at the
    # middle e-r, yielding _r_er_e -> 3 subtokens)
    docs = spark.createDataFrame([(1, "ererer rere")], "doc_id int, text string")
    row = bpe_encode(docs, merges=[("e", "r")]).collect()[0]
    assert row["n_subtokens"] == 3 + 3


def _train_py(word_freqs: dict[str, int], n_merges: int):
    """Independent pure-python Sennrich TRAIN loop: count adjacent symbol
    pairs weighted by word freq, merge the argmax (ties pair-ascending),
    re-segment, repeat."""
    reps = {("".join("_" + c for c in w)): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[str, int] = {}
        for rep, f in reps.items():
            syms = [s for s in rep.split("_") if s]
            for i in range(len(syms) - 1):
                p = syms[i] + "_" + syms[i + 1]
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        a, b = best.split("_")
        merges.append((rank, a, b, counts[best]))
        reps = {
            rep.replace(f"_{a}_{b}", f"_{a}{b}"): f for rep, f in reps.items()
        }
    return merges


def test_bpe_train_matches_independent_loop(spark):
    from cdc_engine.textops import bpe_train

    corpus = [
        (1, "lower lower lowest low"),
        (2, "newer newest new new"),
        (3, "wider wide widest lower"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id int, text string")
    import re
    from collections import Counter

    wf = Counter(
        w
        for _, text in corpus
        for w in re.split(r"[^a-z0-9]+", text.lower())
        if w
    )
    want = _train_py(dict(wf), 6)
    got = [
        (r["rank"], r["a"], r["b"], r["cnt"])
        for r in bpe_train(docs, n_merges=6).orderBy("rank").collect()
    ]
    assert got == want and len(got) == 6


def test_bpe_train_exhausts_gracefully(spark):
    """A single 2-char word: merge 1 consumes the only pair, the loop then
    finds nothing to count and stops early."""
    from cdc_engine.textops import bpe_train

    docs = spark.createDataFrame([(1, "ab ab")], "doc_id int, text string")
    got = [
        (r["rank"], r["a"], r["b"], r["cnt"])
        for r in bpe_train(docs, n_merges=5).collect()
    ]
    assert got == [(1, "a", "b", 2)]


def test_bpe_train_output_freezes_into_encode(spark):
    """The learned table plugs straight into bpe_encode as merges list."""
    from cdc_engine.textops import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(1, "lower lower low"), (2, "slower lowest")], "doc_id int, text string"
    )
    table = [
        (r["a"], r["b"]) for r in bpe_train(docs, n_merges=4).orderBy("rank").collect()
    ]
    out = {r["doc_id"]: r for r in bpe_encode(docs, merges=table).collect()}
    for doc_id, text in [(1, "lower lower low"), (2, "slower lowest")]:
        import re

        words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        assert out[doc_id]["n_subtokens"] == sum(_encode_py(w, table) for w in words)


def test_bpe_train_deep_run_checkpoints_and_keeps_prefix(spark):
    """Round-7 plan-depth bound: a deep training run (2.5x the checkpoint
    cadence) must complete with bounded driver plan-build time — the lazy
    replace chain is truncated every _RESEG_CKPT_EVERY rounds — and BPE's
    greedy-prefix property must hold: the first 8 merges of the deep run
    equal the 8-round train exactly (checkpointing cannot change values)."""
    import time

    from cdc_engine.textops import _RESEG_CKPT_EVERY, bpe_train

    docs = spark.createDataFrame(
        [
            (i, t)
            for i, t in enumerate(
                [
                    "the quick brown fox jumps over the lazy dog",
                    "pack my box with five dozen liquor jugs",
                    "how vexingly quick daft zebras jump",
                    "sphinx of black quartz judge my vow",
                    "the five boxing wizards jump quickly",
                ]
                * 4
            )
        ],
        "doc_id int, text string",
    )
    deep_rounds = _RESEG_CKPT_EVERY * 2 + _RESEG_CKPT_EVERY // 2
    jsc = spark.sparkContext._jsc.sc()
    persisted_before = jsc.getPersistentRDDs().size()
    t0 = time.monotonic()
    deep = bpe_train(docs, n_merges=deep_rounds).collect()
    wall = time.monotonic() - t0
    shallow = bpe_train(docs, n_merges=8).collect()
    assert [tuple(r) for r in deep[:8]] == [tuple(r) for r in shallow]
    assert len(deep) <= deep_rounds
    # bounded wall: a linearly-growing plan chain blows past this long
    # before 40 rounds on this corpus size
    assert wall < 120, wall
    # no persisted relations leaked by the checkpoint swaps
    assert jsc.getPersistentRDDs().size() == persisted_before
