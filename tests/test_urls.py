"""URL curation ops: canonicalization, eTLD+1 grouping, per-domain quotas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_spark.functions.urls import (
    domain_quota_sample,
    normalize_url,
    registered_domain,
    url_host,
)


def _one(spark, url, col):
    return spark.createDataFrame([(url,)], "u string") \
        .select(col.alias("v")).head()["v"]


@pytest.mark.parametrize("raw,expected", [
    ("HTTP://Example.COM:80/Path?a=1#frag", "http://example.com/Path?a=1"),
    ("https://example.com:443", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("https://user:pw@example.com/x", "https://example.com/x"),
    ("https://e.com/p?utm_source=a&id=2&fbclid=z&gclid=1", "https://e.com/p?id=2"),
    ("https://e.com/p?utm_source=a", "https://e.com/p"),
    ("https://e.com/p?b=2&a=1", "https://e.com/p?b=2&a=1"),  # order preserved
])
def test_normalize_url(spark, raw, expected):
    assert _one(spark, raw, normalize_url("u")) == expected


@pytest.mark.parametrize("raw,expected", [
    ("https://www.news.example.co.uk/x", "example.co.uk"),
    ("https://example.co.uk/x", "example.co.uk"),
    ("https://co.uk/", "co.uk"),  # bare suffix: n<=2 returns host as-is
    ("https://deep.sub.example.com/x", "example.com"),
    ("https://example.com/x", "example.com"),
    ("https://localhost/x", "localhost"),
])
def test_registered_domain(spark, raw, expected):
    assert _one(spark, raw, registered_domain("u")) == expected


def test_url_host_strips_port_and_userinfo(spark):
    assert _one(spark, "https://U:p@A.B.C:9090/zz?q#f", url_host("u")) == "a.b.c"


def test_domain_quota_sample(spark):
    rows = [(i, f"https://{'a' if i % 2 else 'b'}.example.com/{i}", 100 - i)
            for i in range(10)]
    df = spark.createDataFrame(rows, "id int, url string, score int")
    kept = domain_quota_sample(df, "url", quota=2,
                               order_by=[F.col("score").desc(), "id"])
    got = sorted((r["id"], r["domain"]) for r in kept.collect())
    # both hosts share eTLD+1 example.com -> one domain, top-2 by score
    assert got == [(0, "example.com"), (1, "example.com")]
    with pytest.raises(ValueError):
        domain_quota_sample(df, "url", quota=2)
