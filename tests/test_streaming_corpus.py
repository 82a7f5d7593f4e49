"""Stream-side corpus operators: watermarked windows, bounded-state
dedup, and the applyInPandasWithState custom-stateful surface — each
driven over a real file-source stream with two micro-batches."""

import datetime as dt

from pyspark.sql import functions as F

from inferdf_rs_spark.schemas import PAGES_SCHEMA
from inferdf_rs_spark.streaming.corpus import (
    per_host_page_counts,
    streaming_exact_dedup,
    windowed_ingest_metrics,
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _page(url, minutes, text, lang="en"):
    return (url, T0 + dt.timedelta(minutes=minutes), b"<p>x</p>", text, lang)


def _stream(spark, tmp_path, name, batches):
    src = str(tmp_path / name)
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.parquet(f"{src}/b{i}")
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )


def _run(df, name, mode):
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).trigger(availableNow=True).start()
    q.processAllAvailable()
    q.stop()


def test_windowed_ingest_metrics(spark, tmp_path):
    stream = _stream(
        spark,
        tmp_path,
        "w",
        [
            [_page("http://a/1", 0, "xx"), _page("http://a/2", 1, "yyyy"), _page("http://b/1", 6, "zz", "de")],
            [_page("http://a/3", 7, "qq")],
        ],
    )
    _run(windowed_ingest_metrics(stream), "win_metrics", "update")
    rows = spark.sql(
        "SELECT w_start, lang, max(n_pages) AS n FROM win_metrics GROUP BY w_start, lang"
    ).collect()
    got = {(r.w_start.minute, r.lang): r.n for r in rows}
    # window [12:00,12:05): 2 en pages; [12:05,12:10): 1 de + 1 en
    assert got[(0, "en")] == 2
    assert got[(5, "de")] == 1
    assert got[(5, "en")] == 1


def test_streaming_exact_dedup_keeps_first(spark, tmp_path):
    stream = _stream(
        spark,
        tmp_path,
        "d",
        [
            [_page("http://a/1", 0, "same text"), _page("http://a/2", 1, "same text")],
            [_page("http://a/3", 2, "same text"), _page("http://a/4", 3, "other")],
        ],
    )
    _run(streaming_exact_dedup(stream), "dedup_stream", "append")
    urls = {r.url for r in spark.sql("SELECT url FROM dedup_stream").collect()}
    # one survivor per digest within the watermark horizon (+ the
    # distinct doc) — the batch-2 repeat of an in-horizon digest drops
    assert "http://a/4" in urls
    assert len([u for u in urls if u != "http://a/4"]) == 1


def test_per_host_page_counts_stateful(spark, tmp_path):
    stream = _stream(
        spark,
        tmp_path,
        "h",
        [
            [_page("http://a/1", 0, "x"), _page("http://a/2", 1, "x"), _page("http://b/1", 2, "x")],
            [_page("http://a/3", 3, "x")],
        ],
    )
    _run(per_host_page_counts(stream), "host_counts", "update")
    rows = spark.sql("SELECT * FROM host_counts").collect()
    total_a = max(r.total_pages for r in rows if r.host == "a")
    total_b = max(r.total_pages for r in rows if r.host == "b")
    assert total_a == 3  # state accumulated ACROSS micro-batches
    assert total_b == 1
    # per-batch emissions show the increments, not just the final total
    assert sorted(r.batch_pages for r in rows if r.host == "a") in ([1, 2], [3])
