"""Product-quantization semantics (simsearch.pq_encode / pq_adc_topk)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_engine.simsearch import pq_adc_topk, pq_encode


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _milli_subs(row, m=8, dsub=8):
    q = [round(float(x) * 1000) for x in row]
    return [q[j * dsub : (j + 1) * dsub] for j in range(m)]


def test_codewords_encode_to_themselves(spark):
    """Every seed vector (vec_id < 16) is its own codeword in every
    subspace: self-distance 0, ties broken to the lowest code, and no two
    seed subvectors in the synthetic set are identical below the seed's
    own id — so code == vec_id."""
    out = pq_encode(_emb(spark), m=8, dsub=8, k=16)
    seeds = out.where(F.col("vec_id") < 16)
    bad = seeds.where(F.col("code") != F.col("vec_id")).collect()
    assert bad == [], bad


def test_encode_partition_invariant_and_total(spark):
    emb = _emb(spark)
    a = sorted(pq_encode(emb).collect())
    b = sorted(pq_encode(emb.repartition(13)).collect())
    assert a == b
    assert len(a) == emb.count() * 8  # one row per (vec, subspace)


def test_adc_matches_hand_lut(spark):
    """adc_dist_q must equal the LUT sum recomputed in plain Python from
    the collected codes and the seed codebook (exact integers)."""
    emb = _emb(spark)
    rows = {r["vec_id"]: r["embedding"] for r in emb.where("vec_id < 16").collect()}
    qrow = emb.where("vec_id = 0").collect()[0]["embedding"]
    qsubs = _milli_subs(qrow)
    cb = {(code, j): _milli_subs(v)[j] for code, v in rows.items() for j in range(8)}
    codes = {}
    for r in pq_encode(emb).collect():
        codes.setdefault(r["vec_id"], {})[r["sub"]] = r["code"]

    def adc(vid):
        return sum(
            sum((a - b) ** 2 for a, b in zip(qsubs[j], cb[(codes[vid][j], j)]))
            for j in range(8)
        )

    expect = sorted(
        ((adc(v), v) for v in codes if v != 0), key=lambda t: (t[0], t[1])
    )[:10]
    got = [
        (r["adc_dist_q"], r["vec_id"])
        for r in pq_adc_topk(emb, query_vec_id=0, k=10).collect()
    ]
    assert got == expect
