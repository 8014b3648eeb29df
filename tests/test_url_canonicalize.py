"""textops.url_canonicalize: crawl-grade URL normalization."""

from __future__ import annotations

from cdc_engine.textops import url_canonicalize


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id int, url string")
    return {r["url"]: (r["canonical_url"], r["n_tracking_dropped"]) for r in url_canonicalize(df).collect()}


def test_url_canonicalize_rules(spark):
    out = _canon(spark, [
        "https://WWW.Site.COM:443/a/b?utm_source=x&q=1#frag",
        "https://www.site.com/a/b?q=1",
        "http://site.com:80/a/b///",
        "https://site.com/?ref=tw&b=2&a=1",
        "https://site.com",
        "https://site.com:8443/x",          # non-default port KEPT
        "ftp://Site.com/File",              # unknown scheme: no port logic, case-sensitive path
        "https://site.com/a?gclid=1&fbclid=2&utm_a=3",
    ])
    assert out["https://WWW.Site.COM:443/a/b?utm_source=x&q=1#frag"] == ("https://www.site.com/a/b?q=1", 1)
    assert out["https://www.site.com/a/b?q=1"] == ("https://www.site.com/a/b?q=1", 0)
    assert out["http://site.com:80/a/b///"] == ("http://site.com/a/b", 0)
    # params sorted, tracker dropped, root path keeps '/'
    assert out["https://site.com/?ref=tw&b=2&a=1"] == ("https://site.com/?a=1&b=2", 1)
    assert out["https://site.com"] == ("https://site.com/", 0)
    assert out["https://site.com:8443/x"] == ("https://site.com:8443/x", 0)
    assert out["ftp://Site.com/File"] == ("ftp://site.com/File", 0)
    assert out["https://site.com/a?gclid=1&fbclid=2&utm_a=3"] == ("https://site.com/a", 3)
