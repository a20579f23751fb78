"""S11: the reference's HTTP API collector, brought IN-ENGINE as a
Spark 4 Python DataSource (SPARK-44076 API).

The reference runs a standalone single-process poller
(collect_streaming_data.py:1-35: requests.get per city per hourly
cycle into SQLite, 80 cities serially) OUTSIDE its engine; SURVEY §2.1
therefore scoped S11 out. The Python DataSource API removes the reason
for that scoping: the collector becomes a real Spark source —

- **batch** (`spark.read.format("http_events")`): one InputPartition
  per page/entity, so the fetch fan-out runs ON THE EXECUTORS — 80
  cities poll in parallel instead of the reference's serial loop, and
  at production scale thousands of shards/pages spread across the
  cluster;
- **streaming** (`spark.readStream.format("http_events")`): a
  SimpleDataSourceStreamReader that advances a page offset each
  micro-batch — the poll cycle — with Spark's own checkpointing
  replacing the reference's hand-rolled SQLite dedup (offsets are
  replayed exactly-once by the engine; `readBetweenOffsets` replays a
  committed range deterministically after a crash).

Transport is stdlib urllib, so `file://` URLs exercise the identical
code path in tests (no network in this environment) and `https://`
works in production unchanged. Payloads are JSON arrays of objects;
rows are projected onto the declared schema by field name, missing
keys -> NULL, the PERMISSIVE stance of the JSONL reader.

Scale notes: one partition per page keeps each HTTP response bounded
(a page that exceeds executor memory is an upstream API bug, not a
spill); `retries` with linear backoff absorbs transient 5xx without
failing the stage (task retry re-fetches only that page); the stream
reader prefetches nothing on the driver — each micro-batch reads one
page per trigger, so driver memory is O(1) in stream length.
"""

from __future__ import annotations

import json
import time
from collections.abc import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)
from pyspark.sql.types import StructType

# Engine-canonical raw-event shape (streaming/source.py RAW_SCHEMA):
# the collector lands the same columns the Kafka/file edges produce, so
# every downstream query is source-agnostic.
DEFAULT_SCHEMA_DDL = ("event_id bigint, ts string, user_id bigint, "
                      "event_type string, value double, props string")


def _fetch(url: str, retries: int, backoff_s: float) -> bytes:
    """GET with linear backoff. urllib, not requests: stdlib-only keeps
    executors dependency-free, and file:// transports work for tests."""
    from urllib.request import urlopen
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            with urlopen(url) as resp:
                return resp.read()
        except Exception as exc:  # URLError, HTTPError, FileNotFoundError
            last = exc
            if attempt < retries and backoff_s > 0:
                time.sleep(backoff_s * (attempt + 1))
    raise last  # type: ignore[misc]


def _rows(payload: bytes, field_names: list[str]) -> Iterator[tuple]:
    """JSON array of objects -> tuples in schema order; missing keys ->
    NULL (PERMISSIVE, same stance as read_jsonl). A non-array payload
    is an upstream contract violation — fail the task loudly."""
    docs = json.loads(payload)
    if not isinstance(docs, list):
        raise ValueError(
            f"http_events page payload must be a JSON array, got "
            f"{type(docs).__name__}")
    for doc in docs:
        yield tuple(doc.get(name) for name in field_names)


class _PagePartition(InputPartition):
    def __init__(self, page: int):
        self.page = page


class HttpEventsDataSource(DataSource):
    """``format("http_events")`` — options:

    - ``url``: template with a ``{page}`` placeholder
      (e.g. ``https://api.example.com/events?page={page}`` or
      ``file:///data/pages/page-{page}.json``);
    - ``pages``: batch page count (one InputPartition each);
    - ``retries`` / ``backoff_s``: per-request retry policy. Batch
      defaults: retries=2, backoff_s=0.5. STREAMING defaults: 0 / 0.0
      — deliberate: an idle poll probes a page that does not exist yet
      every trigger, and retry-sleeping on that expected miss would
      stall the whole query's trigger cadence; set them explicitly for
      flaky production endpoints;
    - ``schema_ddl``: override the default events shape.
    """

    @classmethod
    def name(cls) -> str:
        return "http_events"

    def schema(self) -> str:
        return self.options.get("schema_ddl", DEFAULT_SCHEMA_DDL)

    def reader(self, schema: StructType) -> "HttpEventsReader":
        return HttpEventsReader(dict(self.options), schema)

    def simpleStreamReader(self, schema: StructType) \
            -> "HttpEventsStreamReader":
        return HttpEventsStreamReader(dict(self.options), schema)


class HttpEventsReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType):
        if "url" not in options:
            raise ValueError("http_events requires a 'url' option")
        self._url = options["url"]
        self._pages = int(options.get("pages", 1))
        self._retries = int(options.get("retries", 2))
        self._backoff = float(options.get("backoff_s", 0.5))
        self._fields = [f.name for f in schema.fields]

    def partitions(self):
        return [_PagePartition(p) for p in range(self._pages)]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        url = self._url.format(page=partition.page)
        yield from _rows(_fetch(url, self._retries, self._backoff),
                         self._fields)


class HttpEventsStreamReader(SimpleDataSourceStreamReader):
    """Poll-cycle streaming: offset = next page index. A page that does
    not exist YET (HTTP 404 / missing file) means "no new data this
    trigger" — the offset does not advance and the batch is empty,
    which is how a poller idles between publisher cycles. Any other
    error raises (a 500 mid-cycle must not silently skip a page)."""

    def __init__(self, options: dict, schema: StructType):
        if "url" not in options:
            raise ValueError("http_events requires a 'url' option")
        self._url = options["url"]
        self._retries = int(options.get("retries", 0))
        self._backoff = float(options.get("backoff_s", 0.0))
        self._fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _page_bytes(self, page: int) -> bytes | None:
        from urllib.error import HTTPError, URLError
        url = self._url.format(page=page)
        try:
            return _fetch(url, self._retries, self._backoff)
        except HTTPError as exc:
            if exc.code == 404:
                return None
            raise
        except URLError as exc:
            if isinstance(exc.reason, FileNotFoundError):
                return None
            raise
        except FileNotFoundError:
            return None

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # a LIST ITERATOR, not a generator: Spark's prefetch cache both
        # next()s the returned value and copy.copy()s it when planning
        # partitions — list iterators support both, generators neither
        page = int(start["page"])
        payload = self._page_bytes(page)
        if payload is None:
            return iter([]), start
        return iter(list(_rows(payload, self._fields))), {"page": page + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Exactly-once replay of a committed range after restart: pages
        are immutable once published, so re-fetching reproduces the
        batch bit-for-bit."""
        for page in range(int(start["page"]), int(end["page"])):
            payload = self._page_bytes(page)
            if payload is None:
                raise RuntimeError(
                    f"http_events replay: committed page {page} vanished "
                    "— pages must be immutable once published")
            yield from _rows(payload, self._fields)

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the remote API owns the pages


def register_http_events_source(spark) -> None:
    """Idempotent registration; after this,
    ``spark.read.format("http_events")`` / ``readStream`` work."""
    spark.dataSource.register(HttpEventsDataSource)


# --------------------------------------------------------------------
# Deterministic synthetic publisher — the oracle-paired harness around
# the collector. Every field is an md5-slice function of (page, i)
# using the engine's single cross-engine hash contract
# (plans/base.py md5_slice_long), so hashlib here, Spark's md5 and
# DuckDB's md5 all reproduce the identical rows: the registry entry
# collects THROUGH the DataSource while the oracle regenerates the
# rows in pure SQL (range() + md5) — no file ever crosses engines.

PAGE_TYPES = ("click", "error", "purchase", "signup", "view")


def _synth_record(page: int, i: int, per_page: int) -> dict:
    import hashlib as _h

    def slice8(tag: str) -> int:
        return int(_h.md5(f"{tag}|{page}|{i}".encode()).hexdigest()[:8], 16)

    cents = slice8("v") % 100_000
    return {
        "event_id": page * per_page + i,
        "ts": f"2024-01-01 {page % 24:02d}:00:00",
        "user_id": slice8("u") % 1_000,
        "event_type": PAGE_TYPES[slice8("t") % len(PAGE_TYPES)],
        "value": cents / 100.0,
        "props": '{"k": %d}' % (cents % 100),
    }


def publish_synthetic_pages(pages: int = 24, per_page: int = 500,
                            base_dir: str | None = None) -> str:
    """Write the deterministic page files (idempotent: the directory is
    keyed by its content parameters and reused when complete). Driver
    side and bounded by construction — pages x per_page JSON rows,
    ~1.5 MB at the default 24x500; this stands in for the REMOTE API,
    which in production is someone else's server, not our bytes."""
    import os
    import tempfile
    from pathlib import Path

    root = Path(base_dir or tempfile.gettempdir())
    page_dir = root / f"asvsp_http_pages_v1_{pages}x{per_page}"
    done = page_dir / "_COMPLETE"
    if not done.exists():
        # Concurrency-safe across processes sharing the directory (a
        # bench run racing a pytest run): every file lands via
        # write-to-temp + atomic os.replace, so a reader never sees a
        # truncated page. Racing writers produce byte-identical content
        # (everything is a pure function of (page, i)), so whichever
        # replace wins is correct.
        page_dir.mkdir(parents=True, exist_ok=True)
        pid = os.getpid()
        for p in range(pages):
            recs = [_synth_record(p, i, per_page) for i in range(per_page)]
            tmp = page_dir / f".page-{p}.{pid}.tmp"
            tmp.write_text(json.dumps(recs))
            os.replace(tmp, page_dir / f"page-{p}.json")
        tmp_done = page_dir / f"._COMPLETE.{pid}.tmp"
        tmp_done.write_text("ok")
        os.replace(tmp_done, done)
    return str(page_dir)


def synthetic_collect_rollup(spark, pages: int = 24,
                             per_page: int = 500):
    """The registered S11 query: publish -> collect through the
    http_events DataSource (one executor-side fetch per page) ->
    per-type rollup, with the props JSON decoded back out to prove the
    payload round-trips the wire format. Size is sf-INDEPENDENT by
    design: the synthetic API stands in for an external publisher
    whose volume does not scale with the warehouse."""
    from pyspark.sql import functions as F

    register_http_events_source(spark)
    page_dir = publish_synthetic_pages(pages, per_page)
    df = (spark.read.format("http_events")
          .option("url", f"file://{page_dir}/page-{{page}}.json")
          .option("pages", pages).load())
    cents = F.round(F.col("value") * 100, 0).cast("long")
    k = F.from_json("props", "k INT").getField("k").cast("long")
    return (
        df.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             (F.sum(cents) / 100.0).alias("value_sum"),
             F.sum(k).alias("k_sum"),
             F.countDistinct("user_id").alias("n_users"),
             F.min("event_id").alias("first_event"),
             F.max("event_id").alias("last_event"))
    )
