"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

Every operator is pure Catalyst expressions (JVM-side, codegen'd) — no
Python in the hot path — and each has an exactly-equivalent DuckDB oracle
in cdc_engine/contract.py. Cross-engine determinism rules used throughout:

  * ratios/scores are bigint milli-units: cast(round(1000.0*a/b) as bigint)
    (identical IEEE double ops on identical operands in both engines);
  * token splitting via the shared regex '[^a-z0-9]+' with empties dropped;
  * hashing via md5 (same bytes in both engines), never engine-native hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cdc_engine.salt import spread

TOKEN_SPLIT_RE = "[^a-z0-9]+"
BPE_ISH_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

STOPWORDS = {
    "en": "the|and|of|to|in|is|was|for|with|that",
    "de": "der|die|und|das|ein|ist|nicht|mit|von|zu",
    "fr": "le|la|les|et|des|est|une|dans|pour|que",
    "es": "el|los|las|y|es|del|una|por|con|para",
}
LANG_ORDER = ("en", "de", "fr", "es")  # deterministic argmax tie-break


def _stop_count(lang: str):
    return F.regexp_count(F.lower(F.col("text")), F.lit(rf"\b({STOPWORDS[lang]})\b"))


def tokens_expr(col: str = "text"):
    """Lowercased word tokens, empties removed (shared with dedup_text)."""
    return F.filter(
        F.split(F.lower(F.col(col)), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram/stopword heuristic language ID: argmax of per-language
    stopword hit counts, first-wins tie-break in LANG_ORDER, 'und' when no
    stopword hits at all."""
    scored = spread(docs).select(
        "doc_id", "lang", *[_stop_count(l).alias(f"s_{l}") for l in LANG_ORDER]
    )
    pred = F.lit("und")
    # build the CASE from the lowest-priority language up
    for l in reversed(LANG_ORDER):
        cond = (F.col(f"s_{l}") > 0) & F.greatest(
            *[F.lit(0)] , *[F.col(f"s_{m}") for m in LANG_ORDER]
        ).eqNullSafe(F.col(f"s_{l}"))
        pred = F.when(cond, F.lit(l)).otherwise(pred)
    out = scored.select("doc_id", "lang", *[f"s_{l}" for l in LANG_ORDER], pred.alias("pred_lang"))
    return out


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword quality heuristics, milli-unit ints."""
    n_tokens = F.size(tokens_expr())
    n_chars = F.length("text")
    docs = spread(docs)  # several regexes per row: parallelize the map
    punct = F.regexp_count(F.col("text"), F.lit(r"[.,!?;:]"))
    stop = _stop_count("en")
    punct_milli = F.round(F.lit(1000.0) * punct / F.greatest(n_chars, F.lit(1))).cast("long")
    stop_milli = F.round(F.lit(1000.0) * stop / F.greatest(n_tokens, F.lit(1))).cast("long")
    quality_milli = F.round(
        F.lit(1000.0)
        * (
            F.lit(0.5) * F.least(n_tokens, F.lit(100)) / F.lit(100.0)
            + F.lit(0.5) * stop / F.greatest(n_tokens, F.lit(1))
        )
    ).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_measured"),
        punct_milli.alias("punct_milli"),
        stop_milli.alias("stopword_milli"),
        quality_milli.alias("quality_milli"),
    )


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count (letters runs,
    digit runs, single punctuation — a crude subword proxy)."""
    return spread(docs).select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != F.lit(""))).alias("n_ws_tokens"),
        F.regexp_count(F.lower(F.col("text")), F.lit(BPE_ISH_RE)).alias("n_bpe_tokens"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Whitespace-normalized md5 content fingerprint."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return spread(docs).select("doc_id", F.md5(norm).alias("fp"))


def winnow_fingerprint(docs: DataFrame, k: int = 5, w: int = 4) -> DataFrame:
    """Winnowing document fingerprint (the rolling-hash scheme of
    Schleimer/Wilkerson/Aiken's MOSS): hash every k-gram of the token
    stream, slide a window of w hashes, keep each window's minimum; the
    distinct minima are the fingerprint. Plagiarism/near-dup detection at
    scale stores (fp_hash -> doc) postings instead of full text.

    Entirely array expressions on one narrow scan — no explode, no
    shuffle, no Python — and md5-derived hashes so the DuckDB oracle is
    bit-exact. Output is scalar-only: (doc_id, n_grams, n_fps, fp_hash)
    where fp_hash = md5 of the sorted distinct minima joined by ','.

    BOTH intermediate arrays are materialized through projection
    boundaries before a lambda references them: Catalyst does not CSE an
    expression captured inside a higher-order function, so the inline
    form re-tokenized per gram AND re-hashed every gram per window
    position — O(n²) md5 calls for an O(n·w) algorithm."""
    empty_i = F.expr("cast(array() as array<int>)")
    # spread: per-gram md5 is a heavy in-row map (guide §2.5)
    staged = spread(docs).select("doc_id", tokens_expr().alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    # guard: Spark's sequence(1, 0) DESCENDS instead of being empty
    gram_idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(empty_i)
    hashes = F.transform(
        gram_idx,
        lambda i: F.conv(
            F.substring(F.md5(F.array_join(F.slice(toks, i, k), " ")), 1, 12), 16, 10
        ).cast("long"),
    )
    hashed = staged.select("doc_id", hashes.alias("_h"))
    h = F.col("_h")
    m = F.size(h)
    min_idx = F.when(m >= w, F.sequence(F.lit(1), m - w + 1)).otherwise(empty_i)
    mins = F.transform(min_idx, lambda i: F.array_min(F.slice(h, i, w)))
    fps = F.array_sort(F.array_distinct(mins))
    return hashed.select(
        "doc_id",
        m.cast("int").alias("n_grams"),
        F.size(fps).cast("int").alias("n_fps"),
        F.md5(F.array_join(F.transform(fps, lambda x: x.cast("string")), ",")).alias(
            "fp_hash"
        ),
    )


def vocab_df_topk(docs: DataFrame, k: int = 20) -> DataFrame:
    """Document-frequency vocabulary: the k tokens present in the most
    documents (ties broken by token asc — deterministic). The first step
    of corpus vocab building / stopword induction. One explode over
    within-doc-distinct tokens (array_distinct in-row, so the exploded
    relation is already (doc, token)-unique without a distinct shuffle),
    one hash aggregate, then a top-k over the small vocab aggregate."""
    tok = docs.select(F.explode(F.array_distinct(tokens_expr())).alias("w"))
    return (
        tok.groupBy("w")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), F.col("w").asc())
        .limit(k)
    )


def tfidf_topk(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-k TF-IDF terms per document: tf = term count in the doc
    (multiset), idf = ln(N / df) with df = documents containing the term,
    score quantized to milli-units for cross-engine comparison. Returns
    (doc_id, w, tf, score_milli, rank), rank 1..k per doc, ordered by
    (score_milli desc, w asc) — the quantized score is the sort key in
    BOTH engines, so a last-ulp double divergence cannot reorder the
    top-k.

    Scale shape (the 100 TB story): one groupBy (doc_id, w) for tf with
    map-side combine, df derived from the tf relation (tf is already
    (doc_id, w)-unique, so df(w) is its per-w row count; note this is
    physically the SAME plan as the previous explicit distinct+groupBy —
    Catalyst prunes the unused count from the df branch, so no exchange
    is saved, measured neutral at sf0.1 — kept as the clearer statement
    of the dependency), one shuffle join on w, one window over doc_id for
    the top-k — every step keyed, nothing pairwise; the same shape as
    vocab_df_topk with a join-back. Pure Catalyst, no Python."""
    from pyspark.sql import Window

    tok = docs.select("doc_id", F.explode(tokens_expr()).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfc = tf.groupBy("w").agg(F.count("*").alias("df"))
    # corpus size rides the plan as a broadcast 1-row relation — no
    # driver-side count action
    nrel = docs.agg(F.count("text").cast("double").alias("_n"))
    scored = tf.join(dfc, "w").crossJoin(F.broadcast(nrel)).select(
        "doc_id",
        "w",
        "tf",
        F.round(F.col("tf") * F.log(F.col("_n") / F.col("df")) * 1000)
        .cast("long")
        .alias("score_milli"),
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score_milli").desc(), F.col("w").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .where(F.col("rank") <= k)
        .select("doc_id", "w", "tf", "score_milli", "rank")
    )


def bm25_topk(
    docs: DataFrame, terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75
) -> DataFrame:
    """BM25 top-k document retrieval for a fixed query-term set — the
    lexical complement to the embedding ANN family (simsearch.py): the
    standard full-text relevance score

        sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),
        idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)   [Robertson/Lucene]

    with the per-term contribution milli-quantized to a long BEFORE the
    per-doc sum (same determinism recipe as tfidf_topk: the quantized
    integer is what both engines aggregate and sort, so a last-ulp
    double divergence cannot reorder the top-k; all ratio inputs — tf,
    df, dl, N, sum(dl) — are exact integers, and avgdl is derived as
    sum/count inside the expression, never pre-rounded).

    Scale shape (the 100 TB story): the token explode is filtered to the
    |terms| query words IMMEDIATELY, so tf/df relations are query-sized,
    not corpus-sized; dl is one keyed count per doc (map-side
    combinable); corpus stats ride the plan as a broadcast 1-row
    relation; the only global operation is the final top-k sort over
    docs that matched at least one term. Pure Catalyst, no Python.
    Returns (doc_id, score_milli, n_terms) ordered by
    (score_milli desc, doc_id asc), exact cross-engine tiebreak."""
    tlist = sorted({t.lower() for t in terms})
    tok = docs.select("doc_id", F.explode(tokens_expr()).alias("w"))
    # doc length in-row (no explode, no shuffle): size() of the token
    # array; token-bearing docs only, matching the oracle's GROUP BY over
    # exploded tokens (NULL text gives size -1 and drops out the same way)
    dl = docs.select(
        "doc_id", F.size(tokens_expr()).cast("long").alias("dl")
    ).where(F.col("dl") > 0)
    stats = dl.agg(
        F.count("*").cast("double").alias("_n"),
        F.sum("dl").cast("double").alias("_sumdl"),
    )
    qtok = tok.where(F.col("w").isin(tlist))
    tf = qtok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfc = (
        qtok.select("doc_id", "w").distinct().groupBy("w").agg(F.count("*").alias("df"))
    )
    contrib = (
        tf.join(dfc, "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * (F.col("tf") * (F.lit(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        1.0
                        - F.lit(b)
                        + F.lit(b) * F.col("dl") / (F.col("_sumdl") / F.col("_n"))
                    )
                )
                * 1000
            )
            .cast("long")
            .alias("s_milli"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.sum("s_milli").cast("long").alias("score_milli"),
            F.count("*").cast("int").alias("n_terms"),
        )
        .orderBy(F.col("score_milli").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def shingle_hashes_expr(k: int, toks=None):
    """In-row k-gram shingle hashes over word tokens: md5 of the space-
    joined gram, 48-bit prefix as a long (the same hash construction as
    winnow_fingerprint, mirrored exactly by the DuckDB oracles). Empty
    array when the doc has fewer than k tokens.

    ``toks`` should be a MATERIALIZED token-array column (callers stage
    ``tokens_expr()`` through a projection first): the per-gram lambda
    references it, and Catalyst does not CSE expressions captured inside
    higher-order functions — an inline tokens expression re-tokenizes per
    gram position, O(len²)."""
    empty_i = F.expr("cast(array() as array<int>)")
    if toks is None:
        toks = tokens_expr()
    n = F.size(toks)
    gram_idx = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(empty_i)
    return F.transform(
        gram_idx,
        lambda i: F.conv(
            F.substring(F.md5(F.array_join(F.slice(toks, i, k), " ")), 1, 12), 16, 10
        ).cast("long"),
    )


def _doc_shingles(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, sh): exploded within-doc-distinct shingle hashes, with the
    token array staged so gram hashing is linear (see shingle_hashes_expr)."""
    return docs.select("doc_id", tokens_expr().alias("_toks")).select(
        "doc_id",
        F.explode(F.array_distinct(shingle_hashes_expr(k, F.col("_toks")))).alias("sh"),
    )


def contamination_share(
    docs: DataFrame, k: int = 3, bench_mod: int = 50
) -> DataFrame:
    """Benchmark decontamination audit: per TRAINING document, the share
    of its distinct k-gram shingles that also occur in the held-out
    BENCHMARK slice (docs with doc_id % bench_mod == 0 — a deterministic
    stand-in for an eval set). The standard pre-training hygiene gate:
    docs with high contamination share get dropped before training so
    eval numbers stay honest.

    Shape (the 100 TB story): the benchmark side is small by construction
    (eval suites are MBs against a 100 TB corpus), so its distinct shingle
    hashes BROADCAST; the training side streams one explode of in-row-
    distinct shingles through a broadcast left join + hash aggregate —
    no shuffle of the big side at all beyond the per-doc agg, never
    pairwise. Pure Catalyst."""
    shing = _doc_shingles(docs, k)
    is_bench = F.pmod(F.col("doc_id"), F.lit(bench_mod)) == 0
    bench = (
        shing.where(is_bench).select("sh").distinct().withColumn("_hit", F.lit(1))
    )
    per = (
        shing.where(~is_bench)
        .join(F.broadcast(bench), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("_hit").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_contam"),
        )
    )
    return (
        docs.where(~is_bench)
        .select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shingles"), F.lit(0).cast("long")).alias("n_shingles"),
            F.coalesce(F.col("n_contam"), F.lit(0).cast("long")).alias("n_contam"),
            F.when(
                F.col("n_shingles") > 0,
                F.round(F.lit(1000.0) * F.col("n_contam") / F.col("n_shingles")).cast(
                    "long"
                ),
            ).alias("contam_milli"),
        )
    )


def boilerplate_share(docs: DataFrame, k: int = 5, min_df: int = 2) -> DataFrame:
    """Per-document share of distinct k-gram shingles that also occur in
    >= min_df documents — the shingle-granularity form of CCNet-style
    cross-document paragraph dedup (synthetic docs have no paragraph
    breaks, so the unit is the k-gram): a high share marks boilerplate.

    Shape: in-row k-gram hashing (same md5 expressions as
    winnow_fingerprint), one explode of within-doc-distinct shingles, a
    document-frequency aggregate, then a join back — every step keyed on
    the shingle hash, so it scales like exact dedup, not like a pairwise
    comparison."""
    shing = _doc_shingles(docs, k)
    dfc = shing.groupBy("sh").agg(F.count("*").alias("df"))
    per = (
        shing.join(dfc, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("df") >= min_df, 1).otherwise(0)).cast("long").alias("n_boiler"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shingles"), F.lit(0).cast("long")).alias("n_shingles"),
            F.coalesce(F.col("n_boiler"), F.lit(0).cast("long")).alias("n_boiler"),
            F.when(
                F.col("n_shingles") > 0,
                F.round(F.lit(1000.0) * F.col("n_boiler") / F.col("n_shingles")).cast("long"),
            ).alias("boiler_milli"),
        )
    )


def line_dedup(docs: DataFrame, col: str = "text", min_df: int = 3) -> DataFrame:
    """C4-style cross-document line deduplication WITH text reconstruction:
    any line occurring in >= min_df distinct documents is boilerplate
    (nav bars, cookie banners, licence footers) and is removed from every
    document; the surviving lines are reassembled in original order.

    Shape at 100 TB: posexplode lines (order keys ride along), aggregate
    line document-frequency keyed on md5(line) so the exchange carries a
    32-char hash instead of the line text, join the narrow df relation
    back, and rebuild each doc with one groupBy(doc_id) + array_sort over
    (pos, line) structs — every step keyed, nothing pairwise, no global
    window. The rebuild shuffle reuses the same doc_id key a downstream
    per-doc op would need anyway. Per-doc line totals are IN-ROW
    (size(split(text))) on the base projection — round 7: the previous
    separate explode -> groupBy(doc_id) -> join branch was a whole extra
    corpus pass (plus exchange and join) for a number each row already
    knows; size(split) counts exactly what posexplode emits, asserted
    equal including the NULL / '' / all-boilerplate edges.

    Returns doc_id, n_lines, n_removed, clean_text ('' when every line was
    boilerplate or the doc was empty; NULL text stays NULL)."""
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(col), "\n")).alias("pos", "line"),
    ).withColumn("lh", F.md5(F.col("line")))
    dfreq = lines.groupBy("lh").agg(F.count_distinct("doc_id").alias("df"))
    kept = lines.join(dfreq, "lh").where(F.col("df") < F.lit(min_df))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    base = docs.select(
        "doc_id",
        F.col(col).isNull().alias("_null_text"),
        F.when(F.col(col).isNull(), F.lit(0).cast("long"))
        .otherwise(F.size(F.split(F.col(col), "\n")).cast("long"))
        .alias("n_lines"),
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        (
            F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))
        ).alias("n_removed"),
        F.when(F.col("_null_text"), F.lit(None).cast("string"))
        .otherwise(F.coalesce(F.col("clean_text"), F.lit("")))
        .alias("clean_text"),
    )


# PII patterns chosen for Java-regex / RE2 (DuckDB) parity: no lookaround,
# no backrefs; \b and bounded classes behave identically in both engines.
PII_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PII_IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PII_PHONE_RE = "\\+[0-9]{1,3}-[0-9]{2,4}-[0-9]{4,9}"


def pii_scrub(df: DataFrame, col: str = "text") -> DataFrame:
    """PII redaction for web-scraped training text: emails, IPv4 literals
    and international phone numbers counted and replaced by typed markers.
    Redaction order is fixed (email -> ip -> phone) so engines agree when
    classes could overlap. Pure Catalyst (regexp_count/regexp_replace,
    JVM codegen) — the canonical pre-training privacy pass, applied before
    any dedup so markers don't perturb near-dup signatures."""
    df = spread(df)  # 6 regex passes per row (guide §2.5): parallelize
    c = F.col(col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL_RE, "[EMAIL]"), PII_IPV4_RE, "[IP]"
        ),
        PII_PHONE_RE,
        "[PHONE]",
    )
    keep = [n for n in df.columns if n != col]
    return df.select(
        *keep,
        F.regexp_count(c, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(PII_IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(c, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        scrubbed.alias("clean_text"),
    )


# URL canonicalization regexes — shared with the DuckDB oracle; pure
# RE2/Java-portable (anchored alternation, no lookaround).
URL_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
URL_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
URL_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
URL_QUERY_RE = "\\?([^#]*)"
URL_TRACKING_KEY_RE = "^(utm_.*|gclid|fbclid|ref)$"


def url_canonicalize(df: DataFrame, col: str = "url") -> DataFrame:
    """Crawl-grade URL canonicalization — the precursor to exact URL-level
    dedup of a web corpus: lowercase scheme+host, strip default ports
    (:80 http / :443 https), default empty path to '/', strip trailing
    slashes (root keeps its '/'), drop the fragment, remove tracking
    params (utm_*, gclid, fbclid, ref) and SORT the survivors so
    equivalent urls with reordered queries collide.

    Pure Catalyst (regexp extracts + array lambda ops); grouping the
    output on canonical_url is then exact hash dedup — one keyed shuffle,
    the same shape as dedup_text.exact_dedup_stats."""
    u = F.col(col)
    scheme = F.lower(F.regexp_extract(u, URL_SCHEME_RE, 1))
    host0 = F.lower(F.regexp_extract(u, URL_HOST_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(host0, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host0, ":443$", ""))
        .otherwise(host0)
    )
    path0 = F.regexp_replace(F.regexp_extract(u, URL_PATH_RE, 1), "/+$", "")
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    q = F.regexp_extract(u, URL_QUERY_RE, 1)
    nonempty = F.filter(F.split(q, "&"), lambda x: x != F.lit(""))
    kept = F.array_sort(
        F.filter(
            nonempty,
            lambda x: ~F.split(x, "=").getItem(0).rlike(URL_TRACKING_KEY_RE),
        )
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
            F.lit("")
        ),
    )
    return df.withColumns(
        {
            "canonical_url": canonical,
            "n_tracking_dropped": (F.size(nonempty) - F.size(kept)).cast("long"),
        }
    )


def bpe_pair_topk(docs: DataFrame, k: int = 30) -> DataFrame:
    """One statistics round of byte-pair-encoding vocabulary induction:
    the top-k adjacent character pairs by corpus frequency — the quantity
    a BPE trainer maximizes at every merge step.

    Scale shape (how real BPE trainers survive big corpora): the corpus
    collapses FIRST into a word-frequency relation (one map-side-
    combinable hash agg — the only corpus-sized exchange); pair
    enumeration then runs over the vocab-bounded word list, weighting
    each in-word pair by the word's corpus count. An adjacent char pair
    is just substring(word, i, 2), so the enumeration is an in-row
    transform over 1..len-1 — no arrays-of-chars, no joins. Deterministic
    (count DESC, pair ASC) ordering makes the top-k an exact
    cross-engine quantity."""
    wf = (
        docs.select(F.explode(tokens_expr()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wf"))
    )
    pairs = wf.select(
        "wf",
        F.explode(
            F.when(
                F.length("w") > 1,
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(k)
    )


# Frozen BPE merge table (rank order) — the tokenizer ARTIFACT, trained once
# offline over the dev corpus with the classic Sennrich et al. 2016 loop
# (count adjacent symbol pairs weighted by word frequency, merge the argmax
# — ties broken pair-lexicographic ascending — re-segment, repeat 16x).
# Production BPE encode always runs against a frozen artifact like this;
# training is an offline job, encoding is the at-scale pass. The list
# contains genuine multi-char merges (jo+in -> join, h+ash -> hash) learned
# from this corpus's vocabulary.
BPE_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("r", "ow"),
]


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]] | None = None) -> DataFrame:
    """Apply a frozen BPE merge table to the corpus and report per-document
    subtoken statistics — the encode half of the tokenizer story
    (``bpe_pair_topk`` is one statistics round of the training half).

    Semantics (Sennrich et al. 2016 re.sub formulation, exactly): a word is
    segmented as marker-prefixed symbols ("_j_o_i_n"); each merge (a, b) in
    RANK ORDER rewrites every non-overlapping "_a_b" to "_ab" left-to-right
    (plain string replace — identical left-to-right replace-all semantics in
    Spark ``replace`` and DuckDB ``replace``, so the oracle is exact). The
    surviving marker count IS the subtoken count.

    Scale shape: encoding is corpus-size-independent — the corpus collapses
    to a (doc_id, word, cnt) relation (one map-side-combinable hash agg),
    the merge chain runs over the DISTINCT vocabulary only (Heaps'-law
    bounded, |vocab| << corpus), and a single keyed join fans the per-word
    subtoken counts back out. No per-row Python anywhere: the whole chain is
    Catalyst ``replace``/``length`` expressions inside one codegen stage.

    Returns (doc_id, n_words, n_chars, n_subtokens): n_subtokens <= n_chars,
    with equality only when no merge fires — the gap is the compression the
    frozen vocabulary buys on this document."""
    if merges is None:
        merges = BPE_MERGES
    words = (
        docs.select("doc_id", F.explode(tokens_expr()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cnt"))
    )
    rep = F.regexp_replace(F.col("w"), "(.)", "_$1")
    for a, b in merges:
        rep = F.replace(rep, F.lit(f"_{a}_{b}"), F.lit(f"_{a}{b}"))
    enc = words.select("w").distinct().select(
        "w",
        (F.length(rep) - F.length(F.replace(rep, F.lit("_"), F.lit("")))).alias("n_sub"),
    )
    return (
        words.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.length("w")).cast("long").alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_sub")).cast("long").alias("n_subtokens"),
        )
    )


# re-segmentation checkpoint cadence for bpe_train: the lazy replace chain
# is truncated (vocab relation re-materialized) every this many rounds
_RESEG_CKPT_EVERY = 16


def bpe_train(docs: DataFrame, n_merges: int = 8) -> DataFrame:
    """The BPE vocabulary-induction LOOP (Sennrich et al. 2016) — the
    training half whose single statistics round is ``bpe_pair_topk`` and
    whose frozen artifact ``bpe_encode`` applies: ``n_merges`` rounds of
    count-adjacent-symbol-pairs (weighted by word frequency) -> merge the
    argmax (ties pair-lexicographic ascending) -> re-segment -> repeat.

    Scale shape (the property that makes BPE trainable on a 100 TB
    corpus): the corpus collapses ONCE into the word-frequency relation —
    the only corpus-sized exchange — which is persisted and never
    recomputed; every round then runs over the Heaps'-law-bounded DISTINCT
    vocabulary only. Re-segmentation is the marker-string replace chain
    (``bpe_encode``'s representation: "_j_o_i_n", merge (a,b) rewrites
    "_a_b" -> "_ab" left-to-right non-overlapping), applied LAZILY — round
    r's plan is r chained Catalyst ``replace`` expressions over the cached
    vocab, so no round re-reads the corpus. The per-round argmax is a
    1-row bounded collect (the merge table IS the driver-side output,
    like salt.py's top-k handoff).

    Plan-depth bound (round 7): every ``_RESEG_CKPT_EVERY`` rounds the
    re-segmented vocab relation is MATERIALIZED (persist + count) and the
    replace chain restarts from the fresh relation — the same per-round
    truncation discipline as connected_components' checkpoints, so driver
    plan-build time stays bounded for real 32k-vocab inductions instead
    of growing linearly in rounds (values are identical either way; the
    8-round contract query never reaches the first checkpoint, so its
    execution is byte-for-byte the old one).

    Returns the learned merge table: (rank, a, b, cnt) — rank-ordered,
    directly freezable as a ``bpe_encode`` merges list."""
    base = (
        docs.select(F.explode(tokens_expr()).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wf"))
        .select(F.regexp_replace(F.col("w"), "(.)", "_$1").alias("r"), "wf")
    )
    wf = base.persist()
    pinned = [wf]
    empty_s = F.array().cast("array<string>")
    merges: list[tuple[int, str, str, int]] = []
    try:
        rep = F.col("r")
        for rank in range(1, n_merges + 1):
            # stage the symbol array through a projection boundary BEFORE
            # the pair lambda references it (HOF-CSE house rule, SURVEY §4
            # invariant 4) — and guard size==1: sequence(1, 0) DESCENDS
            syms = wf.select(
                "wf",
                F.filter(F.split(rep, "_"), lambda x: x != F.lit("")).alias("s"),
            )
            pairs = syms.select(
                "wf",
                F.explode(
                    F.when(
                        F.size("s") > 1,
                        F.transform(
                            F.sequence(F.lit(1), F.size("s") - 1),
                            lambda i: F.concat(
                                F.element_at(F.col("s"), i),
                                F.lit("_"),
                                F.element_at(F.col("s"), i + 1),
                            ),
                        ),
                    ).otherwise(empty_s)
                ).alias("p"),
            )
            best = (
                pairs.groupBy("p")
                .agg(F.sum("wf").alias("n"))
                .orderBy(F.col("n").desc(), F.col("p").asc())
                .limit(1)
                .collect()
            )
            if not best:
                break  # vocabulary fully merged — nothing left to count
            # symbols never contain '_' (tokens are [a-z0-9]+), so the
            # pair key splits back unambiguously
            a, b = best[0]["p"].split("_")
            merges.append((rank, a, b, int(best[0]["n"])))
            rep = F.replace(rep, F.lit(f"_{a}_{b}"), F.lit(f"_{a}{b}"))
            if rank % _RESEG_CKPT_EVERY == 0 and rank < n_merges:
                nxt = wf.select(rep.alias("r"), "wf").persist()
                nxt.count()  # materialize BEFORE dropping the predecessor
                pinned.append(nxt)
                wf.unpersist()
                wf, rep = nxt, F.col("r")
        return docs.sparkSession.createDataFrame(
            merges, "rank int, a string, b string, cnt long"
        )
    finally:
        for df in pinned:
            df.unpersist()


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Corpus-unigram LM score per document — the relational, deterministic
    stand-in for the CCNet/KenLM perplexity quality filter [Wenzek et al.
    2020]: train p(w) = count(w)/total over the whole corpus, score each
    doc by its total and mean token negative log-prob. Returns
    (doc_id, n_tokens, lp_total_milli, avg_lp_milli); avg_lp_milli is the
    per-token cross-entropy in milli-nats — LOW = predictable/common
    tokens, HIGH = rare-token-heavy (the tails a perplexity filter trims).

    Cross-engine exactness: ln is quantized ONCE per vocabulary type
    (lp_milli = round(1000 * ln(total/count))), then everything downstream
    is exact integer arithmetic (sum of tf * lp_milli); the only remaining
    double op is the final mean's round, same risk class as tfidf_topk's
    accepted score_milli.

    Scale shape (the 100 TB story): tf groupBy (doc_id, w) with map-side
    combine, vocabulary groupBy (w), one shuffle join on w, one groupBy
    doc_id — every step keyed on token or doc, nothing pairwise; corpus
    total rides the plan as a broadcast 1-row relation (no driver count
    action). Pure Catalyst, no Python."""
    tok = docs.select("doc_id", F.explode(tokens_expr()).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    cnt = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    tot = tok.agg(F.count("*").cast("double").alias("_tot"))
    lp = cnt.crossJoin(F.broadcast(tot)).select(
        "w",
        F.round(F.lit(1000.0) * F.log(F.col("_tot") / F.col("cnt")))
        .cast("long")
        .alias("lp_milli"),
    )
    return (
        tf.join(lp, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lp_milli")).cast("long").alias("lp_total_milli"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "lp_total_milli",
            F.round(F.col("lp_total_milli") / F.col("n_tokens"))
            .cast("long")
            .alias("avg_lp_milli"),
        )
    )


def quality_funnel(
    docs: DataFrame, min_words: int = 25, max_words: int = 90
) -> DataFrame:
    """Gopher-style staged quality-filter funnel [Rae et al. 2021 §A1.1],
    default thresholds scaled to the synthetic sf0.01 corpus (the contract
    oracle pins THESE defaults; `min_words`/`max_words` let a caller —
    `main.py curate` — retune the length band per corpus, exactly as Gopher
    tunes per source): five rules evaluated in a
    FIXED order, per-doc pass flags plus the first failing stage — the
    shape a production pipeline needs to attribute retention loss to a
    stage (the funnel report is one groupBy over first_fail).

      r1_len      25 <= word count <= 90
      r2_wordlen  mean word length in [3, 10] characters
      r3_stop     >= 2 English stopword hits (Gopher's "stop word" rule;
                  doubles as a cheap language gate on a mixed corpus)
      r4_punct    punctuation chars <= 15% of characters
      r5_ttr      type-token ratio > 0.2 (repetition gate)

    All five are integer/milli comparisons on one narrow projection — a
    single stage, no shuffle at all until a consumer aggregates. Returns
    (doc_id, n_words, r1_len..r5_ttr as 0/1 ints, first_fail, passed)."""
    docs = spread(docs)  # tokenize + regex + distinct per row: heavy map
    toks = tokens_expr()
    n_words = F.size(toks)
    n_chars = F.length("text")
    # sum of token lengths, in-row (no explode): exact integer
    tok_chars = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    mwl_milli = F.round(
        F.lit(1000.0) * tok_chars / F.greatest(n_words, F.lit(1))
    ).cast("long")
    stop = _stop_count("en")
    punct_milli = F.round(
        F.lit(1000.0)
        * F.regexp_count(F.col("text"), F.lit(r"[.,!?;:]"))
        / F.greatest(n_chars, F.lit(1))
    ).cast("long")
    ttr_milli = F.round(
        F.lit(1000.0)
        * F.size(F.array_distinct(toks))
        / F.greatest(n_words, F.lit(1))
    ).cast("long")
    r1 = ((n_words >= min_words) & (n_words <= max_words)).cast("int")
    r2 = ((mwl_milli >= 3000) & (mwl_milli <= 10000)).cast("int")
    r3 = (stop >= 2).cast("int")
    r4 = (punct_milli <= 150).cast("int")
    r5 = (ttr_milli > 200).cast("int")
    first_fail = (
        F.when(r1 == 0, F.lit("r1_len"))
        .when(r2 == 0, F.lit("r2_wordlen"))
        .when(r3 == 0, F.lit("r3_stop"))
        .when(r4 == 0, F.lit("r4_punct"))
        .when(r5 == 0, F.lit("r5_ttr"))
        .otherwise(F.lit("pass"))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        r1.alias("r1_len"),
        r2.alias("r2_wordlen"),
        r3.alias("r3_stop"),
        r4.alias("r4_punct"),
        r5.alias("r5_ttr"),
        first_fail.alias("first_fail"),
        (r1 * r2 * r3 * r4 * r5).alias("passed"),
    )


def dup_ngram_share(docs: DataFrame, n: int = 3) -> DataFrame:
    """Within-document duplicated n-gram fraction — the actual Gopher
    repetition rule [Rae et al. 2021 §A1.1] that quality_funnel's TTR
    gate approximates: share of the doc's n-gram occurrences that are
    SURPLUS repeats — occurrences beyond each distinct gram's first
    (n_dup = total - distinct, the Dolma-style duplicate-n-gram
    fraction). Returns (doc_id, n_grams, n_dup, dup_milli); docs shorter
    than n tokens report 0 grams and a NULL share.

    Entirely in-row (transform over a sequence of slice positions +
    array_distinct) — zero shuffles, zero joins; work ∝ doc length x n.
    Exact string grams, exact integer counts — bit-identical in DuckDB.

    The token array is MATERIALIZED through a projection boundary before
    the per-position lambda references it: Catalyst does not
    common-subexpression-eliminate an expression captured inside a
    higher-order function, so the inline form re-ran the whole
    split/filter per gram position — O(len²) tokenization. Staging it as
    a column makes the lambda capture an attribute instead (measured
    9.7 s → 0.9 s on the sf0.1 corpus, identical results)."""
    staged = spread(docs).select("doc_id", tokens_expr().alias("_toks"))
    toks = F.col("_toks")
    n_tok = F.size(toks)
    grams = F.when(
        n_tok >= n,
        F.transform(
            F.sequence(F.lit(1), n_tok - n + 1),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    n_grams = F.size(grams).cast("long")
    n_distinct = F.size(F.array_distinct(grams)).cast("long")
    n_dup = (n_grams - n_distinct).cast("long")
    return staged.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_dup.alias("n_dup"),
        F.when(
            n_grams > 0,
            F.round(F.lit(1000.0) * n_dup / n_grams).cast("long"),
        ).alias("dup_milli"),
    )


def classifier_scores(docs: DataFrame, d_buckets: int = 256) -> DataFrame:
    """Hashing-trick linear classifier inference — the shape of every
    fasttext-style quality/toxicity filter a pre-training pipeline runs
    over the full corpus [Joulin et al. 2017].

    The model is a FIXED-size weight vector over d_buckets hashed token
    features (the hashing trick: vocab-independent memory), realized as a
    d_buckets-row RELATION and broadcast — at 100 TB inference is a
    narrow token explode, a broadcast hash join against the weight table,
    and one map-side-combinable per-doc sum: no shuffle of anything
    corpus-sized except the per-doc aggregate itself. Weights here are
    md5-derived integers in [-1000, 1000] (a stand-in for trained
    weights with the same plan shape — deterministic, so the DuckDB
    oracle reproduces inference bit-for-bit; a real model would load its
    weight table from parquet instead, identical plan).

    Returns (doc_id, n_tokens, score_sum, label): bag-of-words multiset
    features, integer score end-to-end (no doubles anywhere), label =
    keep iff score_sum >= 0."""
    spark = docs.sparkSession
    weights = spark.range(d_buckets).select(
        F.col("id").cast("int").alias("j"),
        (
            F.pmod(
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("w:"), F.col("id").cast("string"))), 1, 12),
                    16,
                    10,
                ).cast("long"),
                F.lit(2001),
            )
            - 1000
        ).cast("long").alias("wt"),
    )
    # spread: one md5 per token INSTANCE before the first exchange —
    # heavy in-row map (guide §2.5), parallelize it
    feat = spread(docs).select(
        "doc_id",
        F.explode(tokens_expr()).alias("w"),
    ).select(
        "doc_id",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("w")), 1, 12), 16, 10).cast("long"),
            F.lit(d_buckets),
        ).cast("int").alias("j"),
    )
    return (
        feat.join(F.broadcast(weights), "j")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("wt").cast("long").alias("score_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "score_sum",
            F.when(F.col("score_sum") >= 0, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("label"),
        )
    )


def bigram_kn_stats(docs: DataFrame, k: int = 30) -> DataFrame:
    """Top-k corpus bigrams with the Kneser-Ney training statistics a
    KenLM-style n-gram LM build needs per bigram [Heafield 2011]: the
    bigram count n, the left-context mass n_w1 (total bigrams starting
    with w1 — the KN denominator), and the continuation count n_cont
    (DISTINCT left contexts of w2 — the KN lower-order numerator).

    Scale shape: bigram enumeration is in-row (transform over positions,
    zero joins), the corpus-sized exchange is ONE map-side-combinable
    hash aggregate onto (w1, w2); both KN statistics attach as WINDOW
    aggregates over that vocab²-bounded counts relation — measured
    (sf0.001 plan audit): the three-way self-join form re-scanned and
    re-exploded the corpus three times (no ReusedExchange even with AQE
    off), the window form has exactly ONE corpus subtree and pays two
    window shuffles on the small counts relation instead. Exact integer
    counts, total (n DESC, w1, w2) order → bit-stable top-k
    cross-engine."""
    from pyspark.sql import Window

    # token array staged through a projection so the per-position lambda
    # captures an attribute, not the tokenize expression (no CSE inside
    # higher-order functions -> inline form re-tokenizes per position)
    staged = docs.select(tokens_expr().alias("_toks"))
    toks = F.col("_toks")
    n_tok = F.size(toks)
    grams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.expr("cast(array() as array<struct<w1:string,w2:string>>)"))
    bg = staged.select(F.explode(grams).alias("g")).select("g.w1", "g.w2")
    counts = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("n"))
    return (
        counts.select(
            "w1",
            "w2",
            "n",
            F.sum("n").over(Window.partitionBy("w1")).cast("long").alias("n_w1"),
            F.count("*").over(Window.partitionBy("w2")).cast("long").alias("n_cont"),
        )
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(k)
    )
