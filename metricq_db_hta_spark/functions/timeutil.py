"""Nanosecond-precision time helpers.

The reference stores int64 nanoseconds since epoch
(/root/reference/src/async_hta_service.hpp:363-368 builds query bounds from
``std::chrono::nanoseconds``). Spark's TimestampType is microseconds, so the
engine's canonical time column is a ``LongType`` named ``ts_ns``; timestamps
are derived only for display/interop (SURVEY.md §7 risk 2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: "+inf" sentinel used by the reference for open-ended queries
#: (/root/reference/src/async_hta_service.hpp:468).
TS_MAX_NS = (1 << 63) - 1

NS_PER_SECOND = 1_000_000_000


def ts_ns(col: str | Column = "ts") -> Column:
    """int64 ns since epoch from a TimestampType column (exact: µs * 1000)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.unix_micros(c) * F.lit(1000)).cast("long")


def ts_ns_from_nanos_long(col: str | Column = "ts") -> Column:
    """Oracle-aligned ts_ns from a raw int64-ns column: truncated to µs
    multiples, because DuckDB (1.x) reads Parquet TIMESTAMP(NANOS) as a
    µs TIMESTAMP — the engine keeps full ns internally, but declared-query
    outputs must match what the oracle can see."""
    c = F.col(col) if isinstance(col, str) else col
    return (c - (c % F.lit(1000))).cast("long")


def ts_ns_auto(df, col: str = "ts") -> Column:
    """Schema-adaptive int64-ns extraction for a fixture ``ts`` column.

    The driver's testdata has shipped ``events.ts`` both as Parquet
    TIMESTAMP(NANOS) (read as int64 ns under
    ``spark.sql.legacy.parquet.nanosAsLong``) and as a plain µs timestamp
    (read as TimestampNTZType). Both normalize to the engine's canonical
    ``ts_ns`` long; the µs path multiplies by 1000, matching DuckDB's
    ``epoch_ns(ts)`` exactly in either case.
    """
    from pyspark.sql.types import LongType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return ts_ns_from_nanos_long(col)
    # Timestamp / TimestampNTZ: exact µs -> ns. NTZ values are wall-clock;
    # the session timezone is pinned to UTC (sources/tables.py) so the
    # TIMESTAMP cast is the identity mapping the oracle uses.
    c = F.col(col).cast("timestamp")
    return (F.unix_micros(c) * F.lit(1000)).cast("long")


def ns_to_timestamp(col: str | Column) -> Column:
    """Derived µs TimestampType for SQL/date-function interop. The ns->µs
    division goes through DECIMAL: double division of ~1.7e18 ns carries a
    ±128 ns representation error, enough to flip a µs boundary."""
    c = F.col(col) if isinstance(col, str) else col
    micros = F.floor(c.cast("decimal(38,0)") / F.lit(1000)).cast("long")
    return F.timestamp_micros(micros)


def bucket_start_ns(ts_ns_col: str | Column, width_ns: int) -> Column:
    """Epoch-aligned bucket start: ``ts_ns - ts_ns % width`` (SURVEY §1.3).

    Pure int64 arithmetic — no double division, so it is exact for any
    timestamp and bit-identical to the DuckDB oracle's expression. (Valid for
    the non-negative epoch timestamps this engine stores.)
    """
    c = F.col(ts_ns_col) if isinstance(ts_ns_col, str) else ts_ns_col
    w = F.lit(width_ns)
    return (c - (c % w)).cast("long")
