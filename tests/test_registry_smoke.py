"""Registry-wide analysis smoke: every ``queries()`` entry must at
least ANALYZE against the current fixtures (schema resolution runs
the full analyzer — unresolved columns, type mismatches like the
round-2 TIMESTAMP_NTZ/unix_micros clash, and missing tables all throw
here). Most batch builders are lazy and only analyze, but some
execute real work at build time (the iterative-CC fixpoint, ANN
auto-sizing counts, layout/scratch writes, and the streaming queries
run to completion) — all bounded by the 500-row sf0.001 fixture, so
the whole sweep stays around a minute, far cheaper than the
value-level oracle compare in tests/test_vanilla_env.py.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_DIR

_QUERIES = entry.queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_analyzes(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    # touching .schema forces full analysis of the logical plan; for
    # the streaming-backed queries the builder already ran the stream
    # to completion, so this is just a cheap post-check
    assert len(df.schema.fields) > 0


# queries DELIBERATELY registered without a SQL oracle (driver
# records a rows-only check): each must carry its own differential
# pytest pin. Pinned as an exact set so an accidental omission of a
# new query's oracle still fails here. Empty since round 7: q41's
# BPE learn+encode gained a full recursive-CTE oracle.
_ROWS_ONLY_OK: set[str] = set()


def test_entry_and_oracles_align(spark):
    oracles = entry.oracle_sql()
    missing = sorted(set(_QUERIES) - set(oracles) - _ROWS_ONLY_OK)
    assert not missing, (
        f"queries without an oracle_sql entry (driver records a weaker "
        f"rows-only check for these): {missing}"
    )
    assert not (_ROWS_ONLY_OK & set(oracles)), "allowlisted query grew an oracle"
    assert _ROWS_ONLY_OK <= set(_QUERIES), "stale rows-only allowlist entry"
    extra = sorted(set(oracles) - set(_QUERIES))
    assert not extra, f"oracle_sql entries with no query: {extra}"


def test_midnight_collapse_pinned_to_expected_queries():
    """The correctness checker's timestamp->date canonicalization is a
    deliberate tolerance for TRUE DATE columns only; the per-query
    allowlist turns a TIMESTAMP<->DATE schema drift into a FAILURE
    instead of a silent canonicalization (round-5 verdict item 7).
    canon()'s branch behavior is pinned here too."""
    import datetime
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import check_correctness as CC

    # measured at both scales: NO query fires the collapse on its
    # Spark frame, so the allowlist is pinned EMPTY — any firing is a
    # TIMESTAMP<->DATE drift failure
    assert CC.MIDNIGHT_EXPECTED == frozenset()
    # midnight datetime collapses to a bare date (and counts it)
    before = CC._midnight_collapses
    assert CC.canon(datetime.datetime(2024, 5, 1)) == "2024-05-01"
    assert CC._midnight_collapses == before + 1
    # non-midnight keeps full precision; plain dates don't count
    assert CC.canon(datetime.datetime(2024, 5, 1, 0, 0, 1)).startswith(
        "2024-05-01T00:00:01"
    )
    assert CC.canon(datetime.date(2024, 5, 1)) == "2024-05-01"
    assert CC._midnight_collapses == before + 1
