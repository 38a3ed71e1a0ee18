"""CLI service-path smoke tests (VERDICT r8 next-step 8): every
``python -m metricq_db_hta_spark`` subcommand driven end-to-end in a real
subprocess — the one operator surface COVERAGE.md previously carried as
"verified manually". Each test is a true process boundary (own JVM, own
argv parsing), kept cheap with a small sample store and 4-core sessions.

Reference parity: the reference's CLI is main.cpp (flag parsing ->
construct service -> run); these tests play the operator's role.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import pytest

# multi-minute durability/fuzz/surgery coverage: excluded from the
# driver's default run (pyproject addopts -m 'not slow'); the builder
# gate runs the full suite with -m '' (VERDICT r15 #7)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env() -> dict[str, str]:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_GRAFT_DRIVER_MEM"] = "2g"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _cli(*args: str, timeout: int = 240) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "metricq_db_hta_spark", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=_env(),
        cwd=REPO,
    )


@pytest.fixture(scope="module")
def sample_input(spark, sf_dir, tmp_path_factory):
    """A small canonical-sample parquet dir (the ingest/backfill input
    contract) written from the fixture events."""
    from metricq_db_hta_spark.queries.hta_queries import samples

    d = tmp_path_factory.mktemp("cli_samples")
    samples(spark, sf_dir).orderBy("event_id").limit(400).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "chunk0"))
    return str(d / "chunk0")


@pytest.fixture(scope="module")
def backfilled_store(sample_input, tmp_path_factory):
    """One real `backfill` subprocess; its store feeds the read-side tests
    (history/store-stats/compact) without paying a JVM start per test."""
    store = str(tmp_path_factory.mktemp("cli_store") / "hta")
    r = _cli(
        "backfill", "--source", sample_input, "--store", store,
        "--width-ns", "3600000000000", "--levels", "2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return store


def test_backfill_writes_levels(backfilled_store):
    names = os.listdir(backfilled_store)
    assert any(n.startswith("level_") for n in names), names
    assert "raw" in names, names


def test_ingest_drains_input(sample_input, tmp_path):
    store = str(tmp_path / "hta_ingest")
    r = _cli(
        "ingest", "--input", os.path.dirname(sample_input), "--store", store,
        "--width-ns", "3600000000000", "--levels", "2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert any(n.startswith("level_") for n in os.listdir(store)), os.listdir(store)


@pytest.mark.parametrize(
    "htype",
    [
        "aggregate_timeline",
        "flex_timeline",
        "aggregate",
        "aggregate_tiered",
        "timeline_tiered",
        "last_value",
    ],
)
def test_history_types(backfilled_store, htype):
    r = _cli(
        "history", "--store", backfilled_store, "--type", htype,
        "--width-ns", "3600000000000", "--levels", "2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # df.show() table output reaches stdout
    assert "+" in r.stdout and "|" in r.stdout, r.stdout[-500:]


def test_query_subcommand(tmp_path):
    r = _cli("query", "--name", "rel_topk", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "|" in r.stdout


def test_query_unknown_name_exits_2():
    r = _cli("query", "--name", "no_such_query")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_store_stats_is_json(backfilled_store):
    r = _cli("store-stats", "--store", backfilled_store)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout)
    assert "batches_on_disk" in stats and "compaction_journal_pending" in stats
    # per-tier disk accounting: raw plus every level table, bytes > 0
    assert stats["bytes_per_table"]["raw"] > 0
    assert all(
        v > 0
        for k, v in stats["bytes_per_table"].items()
        if k.startswith("level_")
    )


def test_compact_nothing_to_do(backfilled_store):
    # backfill writes a single batch -> below --min-batches; the CLI's
    # "nothing to compact" operational path must exit 0, not traceback
    r = _cli("compact", "--store", backfilled_store, "--min-batches", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "nothing to compact" in r.stderr


def test_serve_starts_and_listens(backfilled_store):
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "metricq_db_hta_spark", "serve",
            "--store", backfilled_store, "--port", "0",
            "--width-ns", "3600000000000", "--levels", "2",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        env=_env(),
        cwd=REPO,
    )
    try:
        # stderr is drained on a helper thread: a blocking readline() on
        # the main thread would never re-check the deadline while the
        # child stays alive but silent (r9 ADVICE), hanging the test
        # until the harness timeout
        import queue
        import threading

        lines: queue.Queue[str] = queue.Queue()

        def _drain() -> None:
            for ln in proc.stderr:
                lines.put(ln)

        threading.Thread(target=_drain, daemon=True).start()
        deadline = time.time() + 180
        seen: list[str] = []
        listening = False
        while time.time() < deadline and not listening:
            try:
                line = lines.get(timeout=1.0)
            except queue.Empty:
                if proc.poll() is not None and lines.empty():
                    pytest.fail(
                        "serve exited early: " + "".join(seen)[-2000:]
                    )
                continue
            seen.append(line)
            listening = "listening on" in line
        assert listening, "serve never reported listening"
    finally:
        proc.send_signal(signal.SIGINT)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=30)


def test_history_dense_types(backfilled_store):
    """The r10 dense history types work end-to-end from the CLI and
    demand their explicit-range/step contract (exit 2, not a stack)."""
    t0 = 1_704_067_200_000_000_000
    t1 = t0 + 24 * 3_600_000_000_000
    r = _cli(
        "history", "--store", backfilled_store, "--type", "gapfill_timeline",
        "--metric", "click", "--start", str(t0), "--end", str(t1),
        "--interval-max", "3600000000000",
        "--width-ns", "3600000000000", "--levels", "2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "+" in r.stdout and "|" in r.stdout, r.stdout[-500:]

    r = _cli(
        "history", "--store", backfilled_store, "--type", "resample",
        "--metric", "click", "--start", str(t0), "--end", str(t1),
        "--step-ns", "1800000000000",
        "--width-ns", "3600000000000", "--levels", "2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "+" in r.stdout, r.stdout[-500:]

    # fleet glob aggregate: merged timeline across matching metrics
    r = _cli(
        "history", "--store", backfilled_store, "--type",
        "aggregate_timeline_pattern",
        "--pattern", "*u*",
        "--width-ns", "3600000000000", "--levels", "2",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "n_metrics" in r.stdout, r.stdout[-500:]

    # contract violations exit 2 with a one-line message
    r = _cli(
        "history", "--store", backfilled_store, "--type", "resample",
        "--metric", "click",
        "--width-ns", "3600000000000", "--levels", "2",
    )
    assert r.returncode == 2, (r.returncode, r.stdout[-300:])
    assert "requires" in r.stdout

    r = _cli(
        "history", "--store", backfilled_store,
        "--type", "aggregate_timeline_pattern",
        "--width-ns", "3600000000000", "--levels", "2",
    )
    assert r.returncode == 2, (r.returncode, r.stdout[-300:])
    assert "requires --pattern" in r.stdout


def test_backfill_hist_levels_flag(sample_input, tmp_path):
    """--hist-levels N makes the writer maintain distributional levels."""
    store = str(tmp_path / "hta_hist")
    r = _cli(
        "backfill", "--source", sample_input, "--store", store,
        "--width-ns", "3600000000000", "--levels", "1", "--hist-levels", "1",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "hist_3600000000000" in os.listdir(store), os.listdir(store)


def test_retain_noop_advertises_floor(backfilled_store):
    """`retain` with a max age far beyond the data's age deletes nothing
    (floor clamps to epoch) but exercises the full CLI path: policy
    parse, expire, floors echoed, and store-stats reporting them."""
    r = _cli(
        "retain", "--store", backfilled_store,
        "--raw-max-age-s", str(10**10),  # ~317 years: nothing expires
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "expired 0 partition dirs" in r.stderr
    assert "floors" in r.stderr
    r = _cli("store-stats", "--store", backfilled_store)
    stats = json.loads(r.stdout)
    assert "retention_floors" in stats
    assert "metrics" not in stats  # opt-in listing
    r = _cli("store-stats", "--store", backfilled_store,
             "--list-metrics", "--pattern", "*u*")
    listed = json.loads(r.stdout)["metrics"]
    assert listed == sorted(listed) and all("u" in m for m in listed)


def test_retain_bad_age_spec_exits_2(backfilled_store):
    r = _cli(
        "retain", "--store", backfilled_store,
        "--level-max-age", "notanumber",
    )
    assert r.returncode == 2, (r.returncode, r.stderr[-300:])


def test_fsck_green_store(backfilled_store):
    r = _cli("fsck", "--store", backfilled_store)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = json.loads(r.stdout)
    assert rep["ok"] is True
    assert rep["levels"] and all(l["mismatched"] == 0 for l in rep["levels"])
    assert rep["uncommitted_batches"] == []


def test_history_discovers_levels(backfilled_store):
    """No --levels: the reader follows the store layout instead of a
    hand-kept copy of the writer's configuration."""
    r = _cli(
        "history", "--store", backfilled_store, "--type", "aggregate",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "+" in r.stdout and "|" in r.stdout, r.stdout[-500:]


def test_delete_metric_cli(backfilled_store, tmp_path):
    """delete-metric end-to-end: dry-run counts without touching, the real
    pass erases; run against a `backup` copy so the shared fixture store
    stays intact for the other read-side tests."""
    copy = str(tmp_path / "erase_copy")
    r = _cli("backup", "--store", backfilled_store, "--dest", copy)
    assert r.returncode == 0, r.stderr[-2000:]

    def _click_dirs(root):
        return [
            os.path.join(dp, d)
            for dp, dns, _ in os.walk(root)
            for d in dns
            if d == "metric=click"
        ]

    assert _click_dirs(copy)
    r = _cli("delete-metric", "--store", copy, "--metric", "click",
             "--dry-run")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "would erase" in r.stderr
    assert _click_dirs(copy)  # preview only

    r = _cli("delete-metric", "--store", copy, "--metric", "click")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "erased metric 'click'" in r.stderr
    assert not _click_dirs(copy)
    assert _click_dirs(backfilled_store)  # the source is untouched


def test_sql_subcommand(backfilled_store):
    """Ad-hoc Spark SQL over the store views; bad SQL exits 2 with one
    line, not a traceback."""
    r = _cli(
        "sql", "--store", backfilled_store,
        "SELECT metric, count(*) AS n FROM level_3600000000000 "
        "GROUP BY metric ORDER BY metric",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "views: raw, level_3600000000000" in r.stderr
    assert "click" in r.stdout and "|" in r.stdout

    r = _cli("sql", "--store", backfilled_store, "SELECT nope FROM raw")
    assert r.returncode == 2, (r.returncode, r.stderr[-500:])
    assert "sql: [UNRESOLVED_COLUMN" in r.stderr

    # --explain prints the plan (pruning visible) without executing
    r = _cli(
        "sql", "--store", backfilled_store, "--explain",
        "SELECT count(*) FROM level_3600000000000 WHERE metric = 'click'",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PartitionFilters" in r.stdout and "metric" in r.stdout


def test_export_subcommand(backfilled_store, tmp_path):
    """Raw-range interchange dump: CSV out, schema-pinned read back equals
    the store's rows; existing dest and metric+pattern are refused."""
    dest = str(tmp_path / "dump_csv")
    r = _cli(
        "export", "--store", backfilled_store, "--dest", dest,
        "--pattern", "*u*",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    csvs = [f for f in os.listdir(dest) if f.endswith(".csv")]
    assert csvs, os.listdir(dest)
    with open(os.path.join(dest, csvs[0])) as fh:
        head = fh.readline().strip()
    assert head == "metric,ts_ns,value,event_id"

    r = _cli("export", "--store", backfilled_store, "--dest", dest)
    assert r.returncode == 2 and "already exists" in r.stdout

    r = _cli(
        "export", "--store", backfilled_store,
        "--dest", str(tmp_path / "x"),
        "--metric", "click", "--pattern", "*",
    )
    assert r.returncode == 2 and "at most one" in r.stdout


def test_export_reimport_roundtrip(backfilled_store, tmp_path):
    """export --format csv then backfill --format csv rebuilds an exact
    store slice: same per-metric Q3 aggregate as the source store."""
    dump = str(tmp_path / "rt_dump")
    r = _cli("export", "--store", backfilled_store, "--dest", dump,
             "--pattern", "*u*")
    assert r.returncode == 0, r.stderr[-2000:]

    store2 = str(tmp_path / "rt_store")
    r = _cli("backfill", "--source", dump, "--format", "csv",
             "--store", store2,
             "--width-ns", "3600000000000", "--levels", "1")
    assert r.returncode == 0, r.stderr[-2000:]

    def _agg(store, metric):
        rr = _cli("history", "--store", store, "--type", "aggregate",
                  "--metric", metric,
                  "--width-ns", "3600000000000", "--levels", "1")
        assert rr.returncode == 0, rr.stderr[-2000:]
        return [ln for ln in rr.stdout.splitlines() if metric in ln]

    for m in ("purchase", "signup"):
        assert _agg(store2, m) == _agg(backfilled_store, m), m


def test_backfill_counter_levels_and_fleet_history(sample_input, tmp_path):
    """--counter-levels N maintains counter tables; `history counter_rate
    --pattern` prints the fleet merge (one line per bucket, glob label);
    passing neither/both of --metric/--pattern exits 2."""
    store = str(tmp_path / "hta_counter")
    r = _cli(
        "backfill", "--source", sample_input, "--store", store,
        "--width-ns", "3600000000000", "--levels", "1",
        "--counter-levels", "1",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "counter_3600000000000" in os.listdir(store), os.listdir(store)

    r = _cli(
        "history", "--store", store, "--type", "counter_rate",
        "--pattern", "*",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "n_metrics" in r.stdout and "*" in r.stdout

    r = _cli("history", "--store", store, "--type", "counter_rate")
    assert r.returncode == 2
    assert "exactly one of" in r.stdout


def test_history_counter_rate_stored_attribution(sample_input, tmp_path):
    """--attribution stored serves from the counter level tables (and
    refuses cleanly on a store without them)."""
    store = str(tmp_path / "hta_counter2")
    r = _cli(
        "backfill", "--source", sample_input, "--store", store,
        "--width-ns", "3600000000000", "--levels", "1",
        "--counter-levels", "1",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = _cli(
        "history", "--store", store, "--type", "counter_rate",
        "--metric", "click", "--attribution", "stored",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bucket_start_ns" in r.stdout
