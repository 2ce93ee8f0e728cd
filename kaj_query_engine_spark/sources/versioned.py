"""A minimal versioned parquet table: snapshot-isolated commits and
time travel over a plain directory.

This exists to give the streaming MERGE path (q85) a transactional
target without a table format dependency: real deployments put a
Delta/Iceberg table here (whose MERGE INTO is the transactional twin
of ``operators.maintenance.merge_upsert``); the mechanism — immutable
version directories plus one atomically-swapped CURRENT pointer — is
the same idea those formats implement with a commit log, reduced to
what a single-writer maintenance job needs:

- **Readers never see a torn table.** A version directory is written
  COMPLETELY before the pointer moves, and the pointer swap is an
  ``os.replace`` (atomic on POSIX). A concurrent reader resolves the
  pointer once and reads an immutable directory.
- **Writes are full-snapshot, O(table).** Honest trade-off, stated
  loudly: this is the demonstration-grade mechanism. At 100 TB the
  pointer/version idea survives but the rewrite must not — a real
  format commits per-PARTITION file replacements (dynamic partition
  overwrite + a manifest), so a merge costs O(touched partitions);
  see ``operators/maintenance`` for the partition-pruned merge
  economics this plugs into.
- **Single writer.** Streaming ``foreachBatch`` delivers batches
  serially, which is exactly this model; multi-writer coordination
  (optimistic re-try on pointer CAS) is a table-format concern, out
  of scope here.

Time travel falls out for free: every committed version stays
readable until vacuumed.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


class VersionedTable:
    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)

    # ---- pointer ----------------------------------------------------
    def current_version(self) -> int | None:
        try:
            return int((self.path / _POINTER).read_text())
        except (OSError, ValueError):
            return None

    def _swap_pointer(self, version: int) -> None:
        tmp = self.path / f"{_POINTER}.tmp"
        tmp.write_text(str(version))
        os.replace(tmp, self.path / _POINTER)  # atomic

    # ---- lifecycle --------------------------------------------------
    def init(self, df: DataFrame, batch_id: int | None = None) -> int:
        """(Re)create the table at version 0 from ``df``. Destroys any
        existing history — callers use it for a fresh maintenance run,
        not on a live table. (It also removes any streaming checkpoint
        kept under the table path, so foreachBatch batch ids and
        :meth:`last_applied_batch` restart together.)

        ``batch_id`` is recorded exactly as in :meth:`commit`: when the
        very FIRST delivered micro-batch creates the table, dropping its
        id would reopen the at-least-once double-apply hole for a crash
        between this init and the streaming checkpoint."""
        if self.path.exists():
            shutil.rmtree(self.path)
        self.path.mkdir(parents=True)
        df.write.parquet(str(self.path / "v0"))
        if batch_id is not None:
            (self.path / "v0" / "_applied_batch").write_text(str(batch_id))
        self._swap_pointer(0)
        return 0

    def commit(self, df: DataFrame, batch_id: int | None = None) -> int:
        """Write ``df`` as the next immutable version, then move the
        pointer. The write completes before the swap, so a crash
        mid-commit leaves the table at the previous version —
        re-running the batch is safe (the orphan directory is
        overwritten).

        ``batch_id`` (foreachBatch's id) is recorded INSIDE the
        version directory before the pointer swap, so (version,
        applied-batch) flip together atomically — the underscore
        prefix keeps Spark's parquet reader from seeing it. Callers
        whose merge is NOT naturally idempotent (the algebraic
        aggregate add) check :meth:`last_applied_batch` to skip
        at-least-once re-deliveries."""
        cur = self.current_version()
        if cur is None:
            return self.init(df, batch_id=batch_id)
        nxt = cur + 1
        df.write.mode("overwrite").parquet(str(self.path / f"v{nxt}"))
        if batch_id is not None:
            (self.path / f"v{nxt}" / "_applied_batch").write_text(
                str(batch_id)
            )
        self._swap_pointer(nxt)
        return nxt

    def last_applied_batch(self) -> int | None:
        """The foreachBatch batch id recorded with the CURRENT version,
        or None if the current version carries none (initial seed, or
        a non-streaming commit)."""
        v = self.current_version()
        if v is None:
            return None
        try:
            return int((self.path / f"v{v}" / "_applied_batch").read_text())
        except (OSError, ValueError):
            return None

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Current snapshot, or time-travel to ``version``."""
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"uninitialized versioned table: {self.path}")
        return spark.read.parquet(str(self.path / f"v{v}"))

    def versions(self) -> list[int]:
        return sorted(
            int(p.name[1:])
            for p in self.path.glob("v*")
            if p.name[1:].isdigit()
        )

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` versions (the current
        version is always kept regardless). Returns the versions
        removed. Time travel reaches only what vacuum leaves — same
        contract as any table format's retention window."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        cur = self.current_version()
        keep = set(self.versions()[-keep_last:]) | ({cur} if cur is not None else set())
        dropped = []
        for v in self.versions():
            if v not in keep:
                shutil.rmtree(self.path / f"v{v}")
                dropped.append(v)
        return dropped

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the CURRENT version's data as ``target_files``
        files and commit it as a new version — the small-files
        maintenance every streaming-ingested table needs (each q85
        micro-batch commit writes shuffle-partition-many files; a
        compaction pass restores scan-friendly file sizes). Data is
        bit-identical by construction: the rewrite is a coalesce of
        the same rows, committed through the same atomic pointer swap,
        so readers flip from many-files to few-files in one step and
        the pre-compaction version stays time-travelable until
        vacuumed. At real scale target_files derives from table bytes
        / maxPartitionBytes rather than a constant.

        The source version's ``_applied_batch`` marker is carried
        forward: compaction rewrites the SAME logical state, so the
        last streaming batch folded into it is unchanged — dropping
        the marker would make the next at-least-once re-delivery look
        fresh and double-apply it."""
        return self.commit(
            self.read(spark).coalesce(target_files),
            batch_id=self.last_applied_batch(),
        )

    def file_count(self, version: int | None = None) -> int:
        v = self.current_version() if version is None else version
        return sum(
            1 for f in (self.path / f"v{v}").glob("part-*") if f.is_file()
        )
