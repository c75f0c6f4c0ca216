"""Incremental per-partition processing (SURVEY §4.1 "not built-in").

The reference's idempotence pattern: list processed partitions, skip dates
already present, process each missing date, write exactly that partition
(custom_search_extraction.py:53-66, get_similarity.py:76-103). Here it is
a partition ledger over the Table layer: `missing_partitions` diffs the
source and target partition lists from catalog metadata (O(partitions), no
data read), and `process_partitions` runs a per-date transform with
dynamic partition overwrite, so re-runs replace only their own partition —
the batch equivalent of exactly-once.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from wopen_spark.tables import Table


def missing_partitions(source: Table, target: Table, partition_field: str) -> list[str]:
    """Partitions present in ``source`` but absent from ``target`` —
    the reference's A5 symmetric-difference gate, metadata-only."""
    done = set(target.partitions(partition_field))
    return [p for p in source.partitions(partition_field) if p not in done]


def process_partitions(
    source: Table,
    target: Table,
    partition_field: str,
    transform: Callable[[DataFrame, str], DataFrame],
    schema_json: str | None = None,
) -> list[str]:
    """For each missing partition: read that partition's rows (partition
    pruning keeps the scan to one directory), apply ``transform``, write
    idempotently. Returns the partitions processed.

    At scale each iteration is one bounded Spark job; dates already done
    cost zero (the reference's daily-skip Slack message, custom_search_
    extraction.py:59-66).
    """
    todo = missing_partitions(source, target, partition_field)
    for part in todo:
        df = source.read().filter(f"{partition_field} = '{part}'")
        out = transform(df, part)
        target.write_partition(part, partition_field, out, schema_json)
    return todo
