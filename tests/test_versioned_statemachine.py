"""Model-based stateful property test for the VersionedTable format
(round 13): Hypothesis drives RANDOM sequences of the table's whole
maintenance vocabulary — snapshot commits, O(Δ) appends, keyed
replace/delete commits, vacuum at varying retention, and crash-orphaned
tmp manifests — against a plain-Python model of {version: {key: value}}.
After every step the invariants hold:

* the CURRENT read equals the model's latest snapshot exactly;
* TIME TRAVEL to any surviving version equals that version's model
  snapshot (vacuum drops exactly the versions outside the retention
  window, current always kept);
* ``versions()`` is the model's surviving version list;
* vacuum reclaims every crash-orphaned ``v{N}.json.tmp.{token}`` whose
  version is decided (<= current) and leaves a possible in-flight
  current+1 tmp alone;
* ``suggest_rebucket`` stays consistent with its documented rule
  (None within bounds, else a power-of-two multiple of the spec).

One-shot example-based tests pin each of these individually; the state
machine pins their COMPOSITION — that no interleaving of maintenance
operations can corrupt a snapshot, lose a version, or resurrect a
dropped one. Step counts are kept small (Spark jobs per op), but the
sequences are genuinely random and shrinkable.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    rule,
)

from kaj_query_engine_spark.session import get_spark
from kaj_query_engine_spark.sources.versioned import VersionedTable

SCHEMA = "k long, v string"


def _spark():
    return get_spark(
        "versioned-statemachine", master="local[4]", shuffle_partitions=4
    )


class VersionedTableMachine(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.spark = _spark()
        self.dir = Path(tempfile.mkdtemp(prefix="vt_sm_"))
        self.tbl = VersionedTable(self.dir / "t")
        self.snapshots: dict[int, dict[int, str]] = {}
        self.live: set[int] = set()  # versions not vacuumed away
        self.next_key = 0
        self.op = 0

    def _df(self, mapping: dict[int, str]):
        rows = sorted(mapping.items()) or None
        if rows is None:
            return self.spark.createDataFrame([], SCHEMA)
        return self.spark.createDataFrame(rows, SCHEMA)

    def _record(self, version: int, snap: dict[int, str]) -> None:
        assert version == max(self.snapshots, default=-1) + 1, (
            "commit version not monotone"
        )
        self.snapshots[version] = dict(snap)
        self.live.add(version)

    @property
    def current(self) -> dict[int, str]:
        return self.snapshots[max(self.snapshots)]

    def _fresh_keys(self, n: int) -> list[int]:
        ks = list(range(self.next_key, self.next_key + n))
        self.next_key += n
        return ks

    @initialize(n=st.integers(min_value=4, max_value=24))
    def init_table(self, n):
        snap = {k: f"i{k}" for k in self._fresh_keys(n)}
        v = self.tbl.init(
            self._df(snap), bucket_keys=["k"], n_buckets=2,
            target_file_rows=8,
        )
        self._record(v, snap)

    @rule(n=st.integers(min_value=1, max_value=12))
    def append_fresh(self, n):
        delta = {k: f"a{k}" for k in self._fresh_keys(n)}
        v = self.tbl.commit_append(self._df(delta))
        self._record(v, {**self.current, **delta})

    @rule(data=st.data())
    def keyed_replace_and_delete(self, data):
        cur = self.current
        if not cur:
            return
        keys = sorted(cur)
        touched = data.draw(
            st.lists(st.sampled_from(keys), min_size=1, max_size=6,
                     unique=True),
            label="touched",
        )
        # a touched key with no replacement row is a DELETE
        kept = data.draw(
            st.lists(st.sampled_from(touched), unique=True,
                     max_size=len(touched)),
            label="kept",
        )
        repl = {k: f"r{self.op}-{k}" for k in kept}
        self.op += 1
        v = self.tbl.commit_keyed(
            self._df(repl),
            self.spark.createDataFrame([(k,) for k in touched], "k long"),
        )
        snap = {k: x for k, x in cur.items() if k not in touched}
        snap.update(repl)
        self._record(v, snap)

    @rule(n=st.integers(min_value=2, max_value=6))
    def full_snapshot_commit(self, n):
        snap = {k: f"s{k}" for k in self._fresh_keys(n)}
        v = self.tbl.commit(self._df(snap))
        self._record(v, snap)

    @rule(nb=st.sampled_from([2, 4, 8]))
    def start_spec_evolution(self, nb):
        # logically changeless metadata commit: the snapshot is
        # UNCHANGED, only future writes retarget. A no-op retarget
        # (already on nb, nothing pending) returns the current
        # version and commits nothing.
        before = max(self.snapshots)
        v = self.tbl.start_rebucket(nb)
        if v != before:
            self._record(v, self.current)

    @rule()
    def migrate_one_chunk(self):
        # one bounded, resumable migration step — changeless; None
        # means nothing is pending
        v = self.tbl.rebucket_step(self.spark, max_buckets=1)
        if v is not None:
            self._record(v, self.current)

    @rule()
    def plant_crashed_tmp(self):
        # a writer that crashed between the tmp write and the finally:
        # its version is already decided (<= current), so the next
        # vacuum must reclaim it
        v = max(self.snapshots)
        (self.tbl.path / f"v{v}.json.tmp.0ddba11c").write_text("{}")

    @rule(keep=st.integers(min_value=1, max_value=3))
    def vacuum(self, keep):
        inflight = self.tbl.path / f"v{max(self.snapshots) + 1}.json.tmp.cafe01"
        inflight.write_text("{}")  # current+1: may be a live attempt
        dropped = self.tbl.vacuum(keep_last=keep)
        expect_keep = set(sorted(self.live)[-keep:]) | {max(self.snapshots)}
        assert set(dropped) == self.live - expect_keep
        self.live = expect_keep
        # decided-version tmps reclaimed, the in-flight one preserved
        leftover = {
            p.name
            for p in self.tbl.path.glob("v*.json.tmp.*")
        }
        assert leftover == {inflight.name}, leftover
        inflight.unlink()

    @invariant()
    def reads_match_model(self):
        if not self.snapshots:
            return
        got = {
            r.k: r.v for r in self.tbl.read(self.spark).collect()
        }
        assert got == self.current, "current read diverged from model"
        assert self.tbl.versions() == sorted(self.live)
        # time travel: the OLDEST surviving version (the one vacuum
        # has had the most chances to corrupt) still reads exactly
        oldest = min(self.live)
        got_old = {
            r.k: r.v for r in self.tbl.read(self.spark, oldest).collect()
        }
        assert got_old == self.snapshots[oldest], (
            f"time travel to v{oldest} diverged from model"
        )

    @invariant()
    def advisory_consistent(self):
        if not self.snapshots:
            return
        sug = self.tbl.suggest_rebucket()
        cur_v = self.tbl.current_version()
        if self.tbl.migration(cur_v) is not None:
            assert sug is None, "advisory must stay quiet mid-migration"
            return
        man = self.tbl._manifest_lite(cur_v)
        nb = self.tbl._n_buckets_at(man)
        total = sum(
            s.get("n_files", 0)
            for s in man.get("shards", [])
            if s.get("kb") is not None
        )
        if sug is None:
            assert total <= nb * 8
        else:
            assert sug % nb == 0 and total <= sug * 8 and total > nb * 8

    def teardown(self):
        shutil.rmtree(self.dir, ignore_errors=True)


TestVersionedTableStateMachine = VersionedTableMachine.TestCase
TestVersionedTableStateMachine.settings = settings(
    max_examples=4, stateful_step_count=8, deadline=None,
)
