"""Physical-plan inspection helpers.

The engine's scale guarantees are plan-shape guarantees: filters reach the
Parquet scan, projections prune columns, small dimensions broadcast, the
fold introduces at most one exchange. These helpers turn
``df.explain("formatted")`` into assertions so tests pin the plan shape down
— a regression that adds a shuffle or un-pushes a filter fails CI, not a
100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the formatted plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each file scan (column pruning check)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan.
    Formatted explain prints each node twice (tree line `+- Exchange (5)` and
    detail header `(5) Exchange`); count only the detail headers, excluding
    AQE-reused exchanges."""
    text = explain_str(df)
    return len(re.findall(r"^\(\d+\) Exchange", text, flags=re.MULTILINE))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def count_scans(df: DataFrame, source: str = "parquet") -> int:
    """Number of file-source scans of ``source`` in the physical plan,
    including scans nested inside an InMemoryRelation's cached plan.
    A checkpointed fold must show exactly one — N scans means the source
    is re-read N times at 100 TB. Counts only the detail headers
    (``(5) Scan parquet``), not the duplicate tree lines, mirroring
    count_exchanges."""
    return len(re.findall(rf"^\(\d+\) Scan {source} ", explain_str(df), flags=re.MULTILINE))
