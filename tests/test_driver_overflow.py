"""Hard gate for registry entries beyond the driver's 50-query cap.

The driver checks at most 50 queries()/oracle_sql() pairs, in registry
order (round-3 VERDICT "What's wrong" #4: overflow entries silently
dropped off the gate the round their code changed). The registry pins
which 50 the driver sees (demo_queries.DRIVER_QUERY_NAMES); THIS test
runs the identical oracle compare over every overflow entry at the
driver's scale, so a change to an overflow op can never ship green on a
stale gate.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from spcht_spark import demo_queries

SF_DIR = os.environ.get("SPCHT_GATE_SF_DIR", "/root/testdata/sf0.01")


def test_registry_shape():
    assert len(demo_queries.DRIVER_QUERY_NAMES) == demo_queries.DRIVER_GATE_CAP
    # driver names lead the registry in order — the first 50 the driver
    # iterates ARE the pinned set
    assert (
        list(demo_queries.QUERIES)[: demo_queries.DRIVER_GATE_CAP]
        == demo_queries.DRIVER_QUERY_NAMES
    )
    # every registered query has an oracle (full coverage, no silent
    # rows-only fallbacks hiding here)
    assert set(demo_queries.QUERIES) == set(demo_queries.ORACLES)


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"driver testdata missing: {SF_DIR}"
)
def test_overflow_entries_match_oracle(spark):
    from check_queries import check_queries

    failed = check_queries(
        spark, SF_DIR, list(demo_queries.OVERFLOW_QUERY_NAMES)
    )
    assert failed == []
