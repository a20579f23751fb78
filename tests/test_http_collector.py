"""S11 HTTP collector as a Spark 4 Python DataSource: batch fan-out,
PERMISSIVE field projection, streaming poll-cycle offsets, and
exactly-once replay — all over file:// transport (same code path as
https://, no network in this environment)."""

from __future__ import annotations

import json

import pytest

from asvsp_spark.sources.http_collector import (
    DEFAULT_SCHEMA_DDL, HttpEventsStreamReader,
    register_http_events_source)


def _publish(page_dir, page: int, rows: list[dict]) -> None:
    (page_dir / f"page-{page}.json").write_text(json.dumps(rows))


def _row(i: int, **over) -> dict:
    base = {"event_id": i, "ts": f"2024-01-01 0{i}:00:00", "user_id": i * 10,
            "event_type": "click", "value": float(i), "props": '{"k": 1}'}
    base.update(over)
    return base


def test_batch_read_fans_out_one_partition_per_page(spark, tmp_path):
    pages = tmp_path / "pages"
    pages.mkdir()
    _publish(pages, 0, [_row(1), _row(2)])
    _publish(pages, 1, [_row(3)])
    _publish(pages, 2, [])

    register_http_events_source(spark)
    df = (spark.read.format("http_events")
          .option("url", f"file://{pages}/page-{{page}}.json")
          .option("pages", 3).load())
    assert df.schema.simpleString() == \
        spark.createDataFrame([], DEFAULT_SCHEMA_DDL).schema.simpleString()
    # the fetch fan-out is the partitioning: one task per page
    assert df.rdd.getNumPartitions() == 3
    rows = sorted((r.event_id, r.user_id, r.value) for r in df.collect())
    assert rows == [(1, 10, 1.0), (2, 20, 2.0), (3, 30, 3.0)]


def test_batch_missing_keys_null_and_non_array_fails(spark, tmp_path):
    pages = tmp_path / "pages"
    pages.mkdir()
    _publish(pages, 0, [{"event_id": 7, "event_type": "view"}])
    register_http_events_source(spark)
    base = (spark.read.format("http_events")
            .option("pages", 1))
    row = (base.option("url", f"file://{pages}/page-{{page}}.json")
           .load().collect()[0])
    assert (row.event_id, row.event_type) == (7, "view")
    assert row.ts is None and row.value is None and row.props is None

    (pages / "bad-0.json").write_text('{"not": "an array"}')
    with pytest.raises(Exception, match="JSON array"):
        (spark.read.format("http_events")
         .option("url", f"file://{pages}/bad-{{page}}.json")
         .option("pages", 1).load().collect())


def test_stream_poll_cycle_advances_and_idles(spark, tmp_path):
    pages = tmp_path / "pages"
    pages.mkdir()
    _publish(pages, 0, [_row(1)])
    _publish(pages, 1, [_row(2)])

    register_http_events_source(spark)
    stream = (spark.readStream.format("http_events")
              .option("url", f"file://{pages}/page-{{page}}.json").load())
    q = (stream.writeStream.format("memory")
         .queryName("http_collect").trigger(processingTime="0 seconds")
         .start())
    try:
        q.processAllAvailable()  # drains pages 0-1, then idles on 2
        got = {r.event_id for r in
               spark.sql("select * from http_collect").collect()}
        assert got == {1, 2}

        _publish(pages, 2, [_row(3), _row(4)])  # publisher's next cycle
        q.processAllAvailable()
        got = {r.event_id for r in
               spark.sql("select * from http_collect").collect()}
        assert got == {1, 2, 3, 4}
    finally:
        q.stop()


def test_read_between_offsets_replays_exactly(spark, tmp_path):
    pages = tmp_path / "pages"
    pages.mkdir()
    _publish(pages, 0, [_row(1)])
    _publish(pages, 1, [_row(2), _row(3)])
    schema = spark.createDataFrame([], DEFAULT_SCHEMA_DDL).schema
    reader = HttpEventsStreamReader(
        {"url": f"file://{pages}/page-{{page}}.json"}, schema)

    assert reader.initialOffset() == {"page": 0}
    batch0, off1 = reader.read({"page": 0})
    assert len(list(batch0)) == 1 and off1 == {"page": 1}
    # idle trigger: page 3 not published -> empty batch, offset pinned
    batch_idle, off_idle = reader.read({"page": 2})
    assert list(batch_idle) == [] and off_idle == {"page": 2}

    replay = list(reader.readBetweenOffsets({"page": 0}, {"page": 2}))
    assert [r[0] for r in replay] == [1, 2, 3]
    # a committed page vanishing is a loud contract violation
    (pages / "page-0.json").unlink()
    with pytest.raises(RuntimeError, match="immutable"):
        list(reader.readBetweenOffsets({"page": 0}, {"page": 2}))
