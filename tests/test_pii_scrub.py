"""textops.pii_scrub: typed PII redaction with exact counts."""

from __future__ import annotations

from cdc_engine.textops import pii_scrub


def test_pii_scrub_semantics(spark):
    rows = [
        (1, "mail a.b+c@x-corp.io and d@e.fi, ip 10.0.0.1, tel +44-20-7946000"),
        (2, "no pii here at all"),
        (3, "edge 999.1.2.3 still matches the ipv4 shape"),
        (4, None),
    ]
    df = pii_scrub(spark.createDataFrame(rows, "id int, text string"), "text")
    out = {r["id"]: r for r in df.collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (2, 1, 1)
    assert out[1]["clean_text"] == "mail [EMAIL] and [EMAIL], ip [IP], tel [PHONE]"
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 0, 0)
    assert out[2]["clean_text"] == "no pii here at all"
    # the pattern is a SHAPE match (no 0-255 octet arithmetic) — documented
    assert out[3]["n_ips"] == 1 and "[IP]" in out[3]["clean_text"]
    assert out[4]["n_emails"] is None and out[4]["clean_text"] is None
