"""Line-level boilerplate dedup (cross-document repeated-line removal)."""

from __future__ import annotations

from solr_spark.functions.dedup import boilerplate_lines, line_dedup


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "cookie banner\nreal content one\ncookie banner\nfooter"),
            (2, "cookie banner\nreal content two\nfooter"),
            (3, "unique document\nno boilerplate here"),
        ],
        "doc_id int, text string",
    )


def test_boilerplate_census(spark):
    got = {r["line"]: r["doc_freq"]
           for r in boilerplate_lines(_docs(spark), "doc_id", "text").collect()}
    # doc 1 repeats 'cookie banner' twice but doc_freq counts distinct docs
    assert got == {"cookie banner": 2, "footer": 2}


def test_line_dedup_reassembly(spark):
    rows = {r["doc_id"]: r.asDict()
            for r in line_dedup(_docs(spark), "doc_id", "text").collect()}
    assert rows[1]["cleaned_text"] == "real content one"
    assert rows[1]["n_lines_kept"] == 1
    assert rows[1]["n_lines_removed"] == 3  # both banner copies + footer
    assert rows[2]["cleaned_text"] == "real content two"
    assert rows[3]["cleaned_text"] == "unique document\nno boilerplate here"
    assert rows[3]["n_lines_removed"] == 0


def test_line_dedup_all_removed(spark):
    docs = spark.createDataFrame(
        [(1, "same"), (2, "same")], "doc_id int, text string")
    rows = {r["doc_id"]: r.asDict()
            for r in line_dedup(docs, "doc_id", "text").collect()}
    assert rows[1]["cleaned_text"] == "" and rows[1]["n_lines_kept"] == 0


def test_min_doc_freq_threshold(spark):
    out = line_dedup(_docs(spark), "doc_id", "text", min_doc_freq=3)
    assert all(r["n_lines_removed"] == 0 for r in out.collect())


def test_minhash_star_edges_linear_and_cc_identical(spark):
    """star_edges=True: linear edges per bucket, identical connected
    components to the all-pairs candidate graph."""
    from solr_spark.functions import near_dup_clusters
    from solr_spark.functions.dedup import minhash_near_dup_pairs

    template = "the same boilerplate sentence repeated across mirror pages"
    rows = [(i, template) for i in range(30)]
    rows += [(100 + i, f"unique document number {i} body text here alpha beta")
             for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    allp = minhash_near_dup_pairs(df, "doc_id", "text", num_hashes=16,
                                  band_size=4)
    star = minhash_near_dup_pairs(df, "doc_id", "text", num_hashes=16,
                                  band_size=4, star_edges=True)
    n_all, n_star = allp.count(), star.count()
    assert n_all >= 30 * 29 / 2          # quadratic in the duplicate group
    assert n_star <= 29 * 4              # <= (m-1) per band, linear
    # identical components
    def comp(pairs):
        return sorted((r["id"], r["component_id"])
                      for r in near_dup_clusters(pairs).collect())
    assert comp(allp) == comp(star)
