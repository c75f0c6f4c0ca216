"""Per-row HTTP enrichment operator (SURVEY §2.11 — the reference's
signature pattern, E1-E3/E5).

The reference enriches with ``Series.apply`` — one synchronous HTTP call
per row, single thread (get_similarity.py:121-123 findmyfbid POST +
facebook redirect GET; assos_validation_retreatment.py:94 Nominatim
geocode; custom_search_extraction.py:189 serp batch). This operator is the
distributed rewrite:

- ``mapInPandas`` keeps Arrow batching (no per-row Python overhead);
- each task runs a bounded ``ThreadPoolExecutor`` — concurrency is
  per-executor-task, so cluster-wide concurrency = tasks × pool size and
  is controlled by repartitioning the input;
- retry with exponential backoff; record-level failures produce the
  reference's sentinel values (``'0'`` / ``''``) instead of failing the
  job;
- an optional per-run quota replicates the reference's 100-queries/day cap
  (custom_search_extraction.py:32,189): the first ``quota`` rows by a
  caller-supplied unique ordering column are enriched, the rest pass
  through with NULL so the next incremental run picks them up. The head
  selection is a distributed top-N (``orderBy().limit()`` →
  TakeOrderedAndProject) and the remainder a broadcast anti-join on the
  ≤quota head keys — no global window, no single-partition exchange;
- the transport is injectable, so tests run with a fake and production
  wires a requests.Session per task (connection pooling).

Enrichment is a pushdown barrier by construction: it is applied after the
declarative plan (filters/pruning happen first), and downstream plans see
an opaque new column.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, replace

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transport = Callable[[str], str]


@dataclass(frozen=True)
class EnrichConfig:
    concurrency: int = 8  # threads per Spark task
    retries: int = 2
    backoff_s: float = 0.5
    sentinel: str = ""  # reference failure values: '' (E2/E3) or '0' (E1)
    quota: int | None = None  # max rows enriched this run (None = all)


def http_enrich(
    df: DataFrame,
    input_col: str,
    transport_factory: Callable[[], Transport],
    out_col: str = "enriched",
    config: EnrichConfig = EnrichConfig(),
    order_col: str | None = None,
) -> DataFrame:
    """Add ``out_col`` = transport(input_col) for each row.

    ``transport_factory`` is called once per task (build your pooled HTTP
    session there); the returned callable maps one input string to one
    output string and may raise (retried, then sentinel).

    With ``config.quota`` set, ``order_col`` is required: a unique, stable
    business key (distributed rows have no positional order, SURVEY §2.12
    #8). The first ``quota`` rows by that key are enriched; the rest get
    NULL — mirroring the reference's daily cap where unsearched keywords
    wait for the next run. Selection is deterministic across reruns and
    repartitionings because it depends only on the key values.
    """
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import types as T

    quota = config.quota
    if quota is not None:
        if order_col is None:
            raise ValueError(
                "config.quota requires order_col: a unique, stable column that "
                "defines which rows are 'first'"
            )
        # Distributed top-N: orderBy().limit() compiles to
        # TakeOrderedAndProject (per-partition heads merged on the driver),
        # not a single-partition global sort. The ≤quota head keys are then
        # broadcast for the remainder anti-join, so the big side never
        # shuffles and no task sees more than its own partition.
        head = df.orderBy(order_col).limit(quota)
        enriched_head = http_enrich(
            head, input_col, transport_factory, out_col, replace(config, quota=None)
        )
        rest = df.join(F.broadcast(head.select(order_col)), on=order_col, how="left_anti")
        return enriched_head.unionByName(
            rest.withColumn(out_col, F.lit(None).cast("string"))
        )
    # copy, never df.schema.add(...): StructType.add mutates the DataFrame's
    # cached schema in place and breaks downstream resolution
    out_schema = T.StructType(list(df.schema.fields) + [T.StructField(out_col, T.StringType())])

    # The closure below ships to Python workers via cloudpickle. It must be
    # fully self-contained — capture plain values, no references to
    # wopen_spark module globals or instances — so it runs on workers that
    # cannot import this package (driver launched from any cwd).
    concurrency = config.concurrency
    retries = config.retries
    backoff_s = config.backoff_s
    sentinel = config.sentinel

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time as _time

        transport = transport_factory()

        def call_with_retry(arg: str) -> str:
            for attempt in range(retries + 1):
                try:
                    return transport(arg)
                except Exception:  # noqa: BLE001 — record-level -> sentinel
                    if attempt < retries:
                        _time.sleep(backoff_s * (2**attempt))
            return sentinel

        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            for pdf in batches:
                inputs = pdf[input_col].astype(str).tolist()
                pdf[out_col] = list(pool.map(call_with_retry, inputs))
                yield pdf

    return df.mapInPandas(run, schema=out_schema)


# --- Reference enrichment services (E1-E3), transport stubs -----------------
# The real services need network access; production wires these factories
# with requests. Tests inject fakes. Each mirrors the reference's failure
# sentinel exactly.


def fbid_transport_factory(
    base_url: str = "https://findmyfbid.example/", timeout_s: float = 5.0
) -> Transport:
    """E1 get_fbid (get_similarity.py:44-51): POST url -> numeric FB id,
    '0' on any error.

    NOTE: the default ``findmyfbid.example`` is a PLACEHOLDER domain — the
    service the reference called (findmyfbid.com) is defunct. Pass a live
    resolver's ``base_url`` before production use; the transport
    integration test points it at a local http.server."""
    import urllib.parse
    import urllib.request

    def call(fb_url: str) -> str:
        data = urllib.parse.urlencode({"url": fb_url}).encode()
        with urllib.request.urlopen(base_url, data=data, timeout=timeout_s) as resp:
            return resp.read().decode().strip()

    return call


def redirect_transport_factory(
    base_url: str = "https://facebook.com", timeout_s: float = 5.0
) -> Transport:
    """E2 get_URL (get_similarity.py:53-60): GET <base>/<id> following
    redirects, return the final URL, '' on error."""
    import urllib.request

    def call(fb_id: str) -> str:
        with urllib.request.urlopen(
            f"{base_url}/{fb_id}", timeout=timeout_s
        ) as resp:
            return resp.geturl()

    return call


def geocode_transport_factory(
    base_url: str = "https://nominatim.openstreetmap.org/search",
    timeout_s: float = 3.0,
) -> Transport:
    """E3 get_coordinates (assos_validation_retreatment.py:32-39): Nominatim
    geocode -> 'lat,lon', '' on error/timeout (3 s in the reference)."""
    import json
    import urllib.parse
    import urllib.request

    def call(address: str) -> str:
        q = urllib.parse.urlencode({"q": address, "format": "json", "limit": 1})
        with urllib.request.urlopen(f"{base_url}?{q}", timeout=timeout_s) as resp:
            hits = json.loads(resp.read().decode())
            return f"{hits[0]['lat']},{hits[0]['lon']}" if hits else ""

    return call
