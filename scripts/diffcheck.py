#!/usr/bin/env python
"""Local differential check: run every registered query on Spark and DuckDB
over a given sf dir and report PASS/FAIL per query (same contract the
driver's t2 gate applies). Usage: python scripts/diffcheck.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from metricq_db_hta_spark import get_spark, oracle
from metricq_db_hta_spark.queries import REGISTRY


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("diffcheck")
    con = oracle.connect(sf_dir)
    failures = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            df = spec.spark(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"  {name:40s} rows-only ({n} rows) {time.time()-t0:5.1f}s")
                continue
            mm = oracle.compare(df, con, spec.oracle)
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name:40s} ERROR: {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if mm is None:
            print(f"✓ {name:40s} PASS {time.time()-t0:5.1f}s")
        else:
            print(f"✗ {name:40s} {mm.kind}: {mm.detail[:500]}")
            failures += 1
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
