"""textops.line_dedup: C4-style cross-doc boilerplate line removal with
order-preserving reconstruction."""

from __future__ import annotations

from cdc_engine.textops import line_dedup

BANNER = "accept all cookies"


def _docs(spark):
    rows = [
        (1, f"{BANNER}\nalpha one\nbeta two"),
        (2, f"gamma three\n{BANNER}\ndelta four"),
        (3, f"epsilon five\n{BANNER}"),          # banner at the end
        (4, "zeta six\nzeta six\neta seven"),     # within-doc repeat: df=1, kept
        (5, BANNER),                              # only boilerplate -> ''
        (6, None),                                # NULL text stays NULL
        (7, ""),                                  # one empty line, df=1, kept
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_line_dedup_semantics(spark):
    out = {r["doc_id"]: r for r in line_dedup(_docs(spark), min_df=3).collect()}
    # banner appears in docs 1,2,3,5 -> df=4 >= 3 -> removed everywhere
    assert (out[1]["n_lines"], out[1]["n_removed"]) == (3, 1)
    assert out[1]["clean_text"] == "alpha one\nbeta two"
    assert out[2]["clean_text"] == "gamma three\ndelta four"  # order kept
    assert out[3]["clean_text"] == "epsilon five"
    # within-doc repetition is NOT cross-doc boilerplate (distinct docs = 1)
    assert out[4]["n_removed"] == 0
    assert out[4]["clean_text"] == "zeta six\nzeta six\neta seven"
    # a doc that was pure boilerplate reconstructs to '' (not NULL)
    assert (out[5]["n_lines"], out[5]["n_removed"], out[5]["clean_text"]) == (1, 1, "")
    # NULL text -> zero lines, NULL reconstruction
    assert (out[6]["n_lines"], out[6]["n_removed"], out[6]["clean_text"]) == (0, 0, None)
    # empty string is one (unique) empty line, kept
    assert (out[7]["n_lines"], out[7]["n_removed"], out[7]["clean_text"]) == (1, 0, "")


def test_line_dedup_threshold_boundary(spark):
    # df == min_df removes; df == min_df - 1 keeps
    out = {r["doc_id"]: r for r in line_dedup(_docs(spark), min_df=5).collect()}
    assert out[1]["n_removed"] == 0  # banner df=4 < 5 survives now
    assert BANNER in out[1]["clean_text"]
