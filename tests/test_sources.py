"""Corpus source/sink: schema validation, partition pruning, filter
pushdown — the scan behavior that matters at crawl scale."""

import pytest

from fixtures.synth import pages


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    from fast_er_spark.sources import write_corpus

    rows, _, _ = pages(n=200, seed=9)
    df = spark.createDataFrame(
        [
            (r["url"], r["warc_ts"], bytearray(r["html"]), r["text"], r["lang"])
            for r in rows
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    path = str(tmp_path_factory.mktemp("corpus") / "pages")
    write_corpus(df, path)  # partitioned by lang
    return path, rows


def test_read_corpus_roundtrip_and_validation(spark, corpus_dir):
    from fast_er_spark.sources import read_corpus

    path, rows = corpus_dir
    df = read_corpus(spark, path)
    assert df.count() == len(rows)
    got = {r.url: r.text for r in df.collect()}
    for r in rows[:20]:
        assert got[r["url"]] == r["text"]

    with pytest.raises(ValueError):
        read_corpus(spark, path, columns=["url", "no_such_column"])


def test_lang_filter_prunes_partitions(spark, corpus_dir):
    from fast_er_spark.plans.inspect import formatted_plan
    from fast_er_spark.sources import read_corpus

    path, rows = corpus_dir
    df = read_corpus(spark, path, columns=["url", "lang"], langs=["de"])
    want = sum(1 for r in rows if r["lang"] == "de")
    assert df.count() == want
    plan = formatted_plan(df)
    # the lang filter must be a PartitionFilter on the scan, not a
    # post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    pf_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "lang" in pf_line, pf_line


def test_projection_prunes_html_and_ts_filter_pushes_down(spark, corpus_dir):
    from fast_er_spark.plans.inspect import formatted_plan, plan_stats
    from fast_er_spark.sources import read_corpus

    path, rows = corpus_dir
    cut = sorted(r["warc_ts"] for r in rows)[len(rows) // 2]
    df = read_corpus(spark, path, columns=["url", "warc_ts"], since=cut)
    plan = formatted_plan(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "html" not in read_schema and "url" in read_schema
    assert any("warc_ts" in f for f in plan_stats(df)["pushed_filters"])
    assert df.count() == sum(1 for r in rows if r["warc_ts"] >= cut)
