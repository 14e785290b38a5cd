"""Unit coverage for the ADVICE r7 config probes: byte-size conf parsing
(operators/partitioning.py) and cgroup-aware heap sizing (session.py) —
pure-Python, no SparkSession needed."""

from __future__ import annotations

import pytest

from ab_inbev_big_data_case_spark.operators.partitioning import _parse_bytes
from ab_inbev_big_data_case_spark.session import _default_heap_gb


@pytest.mark.parametrize(
    ("conf", "expect"),
    [
        ("134217728", 134217728),
        ("134217728b", 134217728),
        ("128m", 128 * 1024**2),
        ("128MB", 128 * 1024**2),
        ("1g", 1024**3),
        ("2GB", 2 * 1024**3),
        ("512k", 512 * 1024),
        ("512KB", 512 * 1024),
        (" 64m ", 64 * 1024**2),
        ("1.5g", int(1.5 * 1024**3)),
    ],
)
def test_parse_bytes_suffixes(conf, expect):
    assert _parse_bytes(conf) == expect


def test_parse_bytes_garbage_raises():
    with pytest.raises(ValueError):
        _parse_bytes("lots")


def test_default_heap_within_bounds():
    gb = _default_heap_gb()
    assert 1 <= gb <= 16


def test_heap_respects_cgroup_limit_when_below_host(monkeypatch, tmp_path):
    from ab_inbev_big_data_case_spark import session as S

    # fake a 4 GiB cgroup v2 cap on a big host. The host probe is faked
    # too (ADVICE r8): _available_ram_bytes only trusts a cap BELOW host
    # RAM, so on a <=4 GiB physical machine the real sysconf would make
    # the fake cap ignored and the assert flake.
    page = 4096
    fake_host_pages = (64 * 1024**3) // page

    def fake_sysconf(name):
        return {"SC_PHYS_PAGES": fake_host_pages, "SC_PAGE_SIZE": page}[name]

    monkeypatch.setattr("os.sysconf", fake_sysconf)

    cg = tmp_path / "memory.max"
    cg.write_text(str(4 * 1024**3))
    real_open = open

    def fake_open(path, *a, **k):
        if str(path) == "/sys/fs/cgroup/memory.max":
            return real_open(cg, *a, **k)
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", fake_open)
    assert S._default_heap_gb() == 2  # half of the 4 GiB cap, not host/2


def test_stream_upsert_app_id_is_required():
    """ADVICE r7: a shared literal default app_id would let two queries
    upserting one table shadow each other's batch watermarks."""
    import inspect

    from ab_inbev_big_data_case_spark.streaming.jobs import stream_upsert_deltalite

    sig = inspect.signature(stream_upsert_deltalite)
    assert sig.parameters["app_id"].default is inspect.Parameter.empty
