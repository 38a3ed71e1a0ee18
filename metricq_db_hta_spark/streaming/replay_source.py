"""A1 replayable live source with ack-after-flush (VERDICT r2 item 7).

The reference acks an AMQP delivery only after ``metric.flush()`` returns —
the completion handler runs post-durability (/root/reference/src/
async_hta_service.hpp:327), so a crash between receipt and flush re-delivers.
The socket source cannot reproduce that contract (no offsets, at-most-once);
Kafka can but the connector is not in this container. This module closes the
gap with a first-class Spark construct: a **Python Data Source**
(`pyspark.sql.datasource.DataSourceStreamReader`) over an append-only local
spool, where

* offsets are byte positions in the spool file — replayable by definition:
  ``read(partition)`` re-serves exactly the byte range ``[start, end)`` no
  matter how often Spark asks;
* Spark persists each microbatch's offset range to the checkpoint WAL
  *before* processing and calls :meth:`commit` only *after* the microbatch
  (our foreachBatch flush into the store) has committed — so the ack marker
  this source writes in ``commit()`` is exactly the reference's
  ack-after-flush. A crash mid-batch leaves the ack behind the produced
  offset; the restarted query replays the same byte range from the WAL and
  the idempotent sink (dynamic-partition overwrite keyed by batch id)
  makes delivery exactly-once into the store.

Scale shape: the spool is the test/dev stand-in for a partitioned log
(Kafka); ``partitions()`` splits a large byte range into ``chunk_bytes``
slices so executors parse a backlog in parallel — same fan-out a Kafka
topic's partitions would give. Offsets are O(1) metadata (a byte position),
state is none.

The DataSource classes are built inside a factory so cloudpickle serializes
them **by value**: Spark runs ``read()`` in executor Python workers (and the
driver-side reader in a separate runner process) that cannot import this
package (see operators/multimodal.py pickling note).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

FORMAT_NAME = "metricq_replay_log"
_LOG_FILE = "records.log"
_ACK_FILE = "ack.json"


class ReplayLogWriter:
    """Producer side of the spool: append newline-delimited
    ``metric,ts_ns,value,event_id`` records durably (flush + fsync before
    returning, so a produced record is never lost to a producer crash —
    the delivery guarantee upstream of the source)."""

    def __init__(self, log_dir: str) -> None:
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, _LOG_FILE)

    def append(self, records) -> int:
        """records: iterable of (metric, ts_ns, value, event_id). Returns
        the spool size (= latest offset) after the append."""
        with open(self.path, "a", encoding="utf-8") as f:
            for m, ts, v, e in records:
                f.write(f"{m},{int(ts)},{float(v)!r},{int(e)}\n")
            f.flush()
            os.fsync(f.fileno())
        return os.path.getsize(self.path)


def acked_offset(log_dir: str) -> int:
    """Byte offset the source has ACKNOWLEDGED (commit() ran — i.e. every
    record below it is durably flushed into the store). 0 if never acked."""
    p = os.path.join(log_dir, _ACK_FILE)
    if not os.path.exists(p):
        return 0
    with open(p, encoding="utf-8") as f:
        return int(json.load(f)["acked_offset"])


def produced_offset(log_dir: str) -> int:
    p = os.path.join(log_dir, _LOG_FILE)
    return os.path.getsize(p) if os.path.exists(p) else 0


def _build_datasource_class():
    """Factory: classes defined in function scope pickle by value (the
    executor/runner processes cannot import this package)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    _log_file, _ack_file = _LOG_FILE, _ACK_FILE

    class _SpoolSlice(InputPartition):
        def __init__(self, path: str, start: int, end: int) -> None:
            self.path, self.start, self.end = path, start, end

    class _ReplayStreamReader(DataSourceStreamReader):
        def __init__(self, options: dict) -> None:
            self.dir = options["path"]
            self.log_path = os.path.join(self.dir, _log_file)
            # slice size for parallel backlog parsing; metadata-only default
            self.chunk = int(options.get("chunk_bytes", 4 * 1024 * 1024))

        # -- offsets: byte positions, O(1) to compute, replayable ---------
        def initialOffset(self) -> dict:
            return {"offset": 0}

        def latestOffset(self) -> dict:
            try:
                return {"offset": os.path.getsize(self.log_path)}
            except OSError:
                return {"offset": 0}

        def partitions(self, start: dict, end: dict):
            lo, hi = int(start["offset"]), int(end["offset"])
            if hi <= lo:
                return [_SpoolSlice(self.log_path, lo, lo)]
            # chunked fan-out, split at line boundaries so a record never
            # straddles two slices
            cuts = [lo]
            with open(self.log_path, "rb") as f:
                pos = lo
                while hi - pos > self.chunk:
                    f.seek(pos + self.chunk)
                    f.readline()  # advance to the next newline
                    pos = min(f.tell(), hi)
                    cuts.append(pos)
            cuts.append(hi)
            return [
                _SpoolSlice(self.log_path, a, b)
                for a, b in zip(cuts, cuts[1:])
                if b > a
            ] or [_SpoolSlice(self.log_path, lo, hi)]

        def read(self, partition):
            # runs on executors: re-serves exactly [start, end) — the
            # replayability that makes the checkpoint WAL authoritative
            with open(partition.path, "rb") as f:
                f.seek(partition.start)
                blob = f.read(partition.end - partition.start)
            for line in blob.decode("utf-8").splitlines():
                if not line:
                    continue
                m, ts, v, e = line.split(",")
                yield (m, int(ts), float(v), int(e))

        def commit(self, end: dict) -> None:
            # Spark calls this only after the microbatch that CONSUMED up
            # to `end` has committed — i.e. after the foreachBatch flush
            # returned and the checkpoint recorded the batch. This is the
            # ack-after-flush barrier (async_hta_service.hpp:327): a crash
            # before this point leaves the ack untouched and the batch
            # replays from the WAL on restart.
            payload = json.dumps({"acked_offset": int(end["offset"])})
            tmp = os.path.join(self.dir, _ack_file + ".tmp")
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(payload)
            os.replace(tmp, os.path.join(self.dir, _ack_file))

    class ReplayLogDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return FORMAT_NAME

        def schema(self) -> str:
            return "metric string, ts_ns long, value double, event_id long"

        def streamReader(self, schema):
            return _ReplayStreamReader(self.options)

    return ReplayLogDataSource


def replayable_source(
    spark: SparkSession, log_dir: str, chunk_bytes: int | None = None
) -> DataFrame:
    """A1 live source with replayable offsets + ack-after-flush; plugs into
    ``StreamingIngest.start(source=...)`` like socket_source/kafka_source."""
    spark.dataSource.register(_build_datasource_class())
    reader = spark.readStream.format(FORMAT_NAME).option("path", log_dir)
    if chunk_bytes is not None:
        reader = reader.option("chunk_bytes", str(int(chunk_bytes)))
    return reader.load()
