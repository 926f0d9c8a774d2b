"""Every bench-listed query must EXECUTE at the driver's bench scale.

Round-4 lesson: `entity_ppr` passed the sf0.001 oracle gate but
crashed at sf0.1 (its seed rule encoded a scale-dependent document-
frequency assumption), and the driver's bench run died with it —
rc=1, no headline, no scaling record for the round.  The oracle gate
checks correctness at toy scale; THIS test checks executability at
bench scale: one `.limit(1).collect()` per bench-listed name at
sf0.1, with failures collected (not fail-fast) so a regression report
names every broken query at once.
"""

from __future__ import annotations

import os

import pytest


def test_every_bench_query_executes_at_bench_scale(spark):
    import bench
    import __spark_entry__ as entry_mod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not present")
    qs = entry_mod.queries()
    unknown = [n for n in bench.BENCH_QUERY_NAMES if n not in qs]
    assert not unknown, f"bench lists unregistered queries: {unknown}"
    failures = {}
    for name in bench.BENCH_QUERY_NAMES:
        try:
            qs[name](spark, sf_dir).limit(1).collect()
        except Exception as exc:  # noqa: BLE001 — collect all, report once
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
    assert not failures, f"bench queries crash at {sf_dir}: {failures}"
