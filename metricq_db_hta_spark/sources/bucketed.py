"""Bucketed (co-located) storage for fact⋈fact joins — the layout that
removes the exchange tax.

``BASELINE.md``'s floor adjudication quantifies the shuffled-join residual:
rel_join_sortmerge pays two fact map stages (~25 CPU-s at sf1) purely to
hash-partition orders and lineitem onto the join key at query time. At
100 TB the scale-correct answer is to pay that partitioning ONCE at write
time: ``bucketBy(N, key).sortBy(key).saveAsTable(...)`` persists both facts
hash-partitioned AND sorted on the key, so Spark's scan reports the bucket
spec and ``EnsureRequirements`` inserts ZERO Exchange for the equi-join —
the SMJ runs bucket-aligned, map-side. (The per-bucket Sort nodes remain:
Spark 3+ stopped reporting bucketed-scan output ordering, SPARK-28595, so
the join re-sorts each bucket — cheap on the already-sorted runs; sortBy
stays because the layout intent is sorted buckets and engines that do use
the ordering get it for free.) Measured at sf0.1 resident: 0.202 s vs
rel_join_sortmerge's 0.596 s — the two fact map stages gone, one 5-row
aggregation exchange left. This module owns that layout so the registry
query
(``rel_join_bucketed``), the bench row, and the plan-pinning test all build
the same tables the same way.

Design notes for the 100 TB deployment:

* Bucket count is a layout knob fixed at write time; both sides must share
  it (or divide it evenly). Locally we use 32 = the core count so the
  map-side join uses every slot; on a cluster you size buckets to the
  target file size (~128 MB-1 GB each), not the core count, and let one
  task read one bucket.
* A bucketed scan's parallelism IS the bucket count — there is no split
  below a bucket. That is the trade: zero exchange per query, bounded scan
  parallelism. For a fact joined many times per day (orders⋈lineitem in
  every TPC-H shape) the write-once cost amortizes immediately.
* This is exactly the reference's per-metric directory layout generalized:
  metricq-db-hta co-locates each metric's data so history queries never
  redistribute (/root/reference/src/db.cpp pages per-metric files); here
  the co-location key is the join key instead of the metric name.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from metricq_db_hta_spark.sources.tables import load_table

#: local bucket count == local[32] core count (see module docstring).
#: ``SPARK_GRAFT_BUCKETS`` overrides it: the bucket count is the layout's
#: scan-parallelism cap AND its per-file size knob, so a deployment sizes
#: it to ~128 MB-1 GB per bucket file (far more than 32 at 100 TB), not
#: to the core count. Read per build (not import) so one process can
#: build differently-sized layouts; the count is part of the on-disk
#: table name, so layouts with different counts never collide.
N_BUCKETS = 32


def _n_buckets() -> int:
    return int(os.environ.get("SPARK_GRAFT_BUCKETS", str(N_BUCKETS)))

#: (table, bucket key) pairs the engine keeps bucketed copies of
BUCKETED_FACTS = (("orders", "o_orderkey"), ("lineitem", "l_orderkey"))

# Build memo, same policy as tables._RELATION_CACHE / hta_queries.service():
# keyed by (applicationId, sf_dir); stale-app entries swept on insert. The
# value is the table-name prefix the build registered. Table data lands at
# an explicit external path under /tmp (see _table_path — NOT the
# cwd-dependent warehouse dir); rebuilds overwrite in place (names are
# deterministic per sf_dir), so cycling sessions never accumulates orphan
# copies.
_BUCKETED: dict[tuple[str, str, int], str] = {}


def _prefix(sf_dir: str) -> str:
    # deterministic per (source dir, bucket count): sf0.001 tests, the
    # sf0.01 driver window, and the sf1 bench replica each get their own
    # table set, and a SPARK_GRAFT_BUCKETS override never collides with
    # the default layout
    key = hashlib.sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    return f"bkt_{key}_{_n_buckets()}"


def _table_path(prefix: str, tbl: str) -> str:
    # explicit external-table location: the default (managed) location is
    # $CWD/spark-warehouse via the STATIC warehouse conf, which breaks
    # under a harness whose cwd is read-only or varies between processes.
    # /tmp is writable everywhere this runs; the deterministic name lets
    # rebuilds overwrite instead of accumulating copies.
    return os.path.join("/tmp", "metricq_bucketed", f"{prefix}_{tbl}")


def bucketed_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan DataFrame over the bucketed copy of ``name``, building the
    bucketed tables for ``sf_dir`` on first use (memoized per session)."""
    app_id = spark.sparkContext.applicationId
    # the bucket count is part of the key: _n_buckets() reads the env per
    # build, so one process flipping SPARK_GRAFT_BUCKETS must build the
    # new layout, not silently serve the previously memoized one
    mkey = (app_id, os.path.abspath(sf_dir), _n_buckets())
    prefix = _BUCKETED.get(mkey)
    if prefix is None:
        for stale in [k for k in _BUCKETED if k[0] != app_id]:
            del _BUCKETED[stale]
        prefix = _prefix(sf_dir)
        for tbl, key in BUCKETED_FACTS:
            # a previous PROCESS's table files survive on disk while its
            # in-memory catalog entry did not — saveAsTable then fails
            # with LOCATION_ALREADY_EXISTS. Deterministic names make the
            # stale location identifiable: drop any current-session
            # entry, then remove the orphan directory.
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{tbl}")
            loc = _table_path(prefix, tbl)
            shutil.rmtree(loc, ignore_errors=True)
            (
                load_table(spark, sf_dir, tbl)
                # repartition on the key first so each task holds exactly
                # one bucket's rows -> one file per bucket (without it,
                # every task writes a file per bucket it touches: up to
                # tasks x buckets small files)
                .repartition(_n_buckets(), key)
                .write.bucketBy(_n_buckets(), key)
                .sortBy(key)
                .option("path", loc)
                .mode("overwrite")
                .saveAsTable(f"{prefix}_{tbl}")
            )
        _BUCKETED[mkey] = prefix
    return spark.table(f"{prefix}_{name}")
