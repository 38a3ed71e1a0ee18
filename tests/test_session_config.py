"""Session bootstrap policy: the derived driver heap (ADVICE r12/r14)."""

from __future__ import annotations

from metricq_db_hta_spark.session import _default_driver_mem


def _meminfo(tmp_path, total_kb: int) -> str:
    p = tmp_path / "meminfo"
    p.write_text(f"MemTotal:       {total_kb} kB\nMemFree: 1 kB\n")
    return str(p)


def test_driver_mem_per_slot_with_floor(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    big = _meminfo(tmp_path, 128 * 1024 * 1024)  # 128 GiB: cap never binds
    assert _default_driver_mem("32", big) == f"{32 * 768}m"
    # tiny slot count: the 2 GiB floor applies
    assert _default_driver_mem("1", big) == "2048m"


def test_driver_mem_cap_beats_floor_on_small_hosts(tmp_path, monkeypatch):
    """r14 review: on a sub-4 GiB host the MemTotal/2 cap must win over
    the 2 GiB floor — floor-after-cap handed exactly the small hosts the
    cap protects an Xmx above half of physical memory."""
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    three_gib = _meminfo(tmp_path, 3 * 1024 * 1024)
    got = int(_default_driver_mem("8", three_gib).rstrip("m"))
    assert got <= (3 * 1024) // 2, "cap must bound the floor"
    # absolute minimum keeps a degenerate reading startable
    tiny = _meminfo(tmp_path, 300 * 1024)
    assert _default_driver_mem("8", tiny) == "512m"


def test_driver_mem_env_override_wins(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "7g")
    assert _default_driver_mem("32", _meminfo(tmp_path, 1024)) == "7g"
