"""DuckDB differential oracle runner (SURVEY.md §5.1).

Registers the fixture Parquet files as views (same names the driver uses)
and provides a canonicalized comparison implementing the FIXTURES.md §4
contract: row count, column names (order-insensitive), and a value multiset
with doubles rounded to 6 decimals.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb

from metricq_db_hta_spark.sources.tables import TABLES


def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6) + 0.0  # normalize -0.0
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    try:  # Decimal -> float
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6) + 0.0
    except ImportError:  # pragma: no cover
        pass
    return v


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@dataclass
class Mismatch:
    kind: str
    detail: str


#: hard cap on rows either engine may return into the comparison —
#: compare() holds both result sets on the driver, so an unbounded future
#: query must fail LOUDLY here instead of OOMing the harness (VERDICT r9
#: next-step 6). Declared checks are <=10k rows; 1M leaves two orders of
#: headroom while still bounding memory to ~100 MB.
ROW_BUDGET = 1_000_000


def compare(
    spark_df,
    con: duckdb.DuckDBPyConnection,
    sql: str,
    limit_diff: int = 5,
    row_budget: int = ROW_BUDGET,
) -> Mismatch | None:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.limit(row_budget + 1).collect()]
    if len(s_rows) > row_budget:
        raise RuntimeError(
            f"oracle compare row budget exceeded: spark result returned more "
            f"than {row_budget} rows - declare a smaller check"
        )
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchmany(row_budget + 1)
    if len(d_rows) > row_budget:
        raise RuntimeError(
            f"oracle compare row budget exceeded: oracle result returned more "
            f"than {row_budget} rows - declare a smaller check"
        )

    if sorted(s_cols) != sorted(d_cols):
        return Mismatch("schema", f"spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        return Mismatch("rowcount", f"spark={len(s_rows)} duckdb={len(d_rows)}")
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:limit_diff]
        return Mismatch("values", f"first diffs (spark, duckdb): {diffs}")
    return None
