"""A minimal versioned parquet table with O(Δ) commits: manifest-based
snapshots, snapshot-isolated pointer swaps, and time travel over a
plain directory.

This exists to give the streaming maintenance family (q85–q87, q89) a
transactional target without a table-format dependency: real
deployments put a Delta/Iceberg table here. The mechanism is the same
idea those formats implement with a commit log, reduced to what a
single-writer maintenance job needs:

- **A version is a MANIFEST, not a directory of rewritten data.**
  Every version ``N`` is a JSON file listing the immutable data files
  that make up that snapshot. New data files land under
  ``data/c{N}/``; the manifest may also carry forward files written by
  earlier commits, byte-identical — never copied, never rewritten.
  That is what makes incremental commits O(Δ):

  * :meth:`commit` — full snapshot (the manifest references only the
    new files). Used for init and compaction.
  * :meth:`commit_append` — writes ONLY the delta's files; the
    manifest is ``previous.files + delta.files``. Per-batch bytes
    written scale with \\|Δ\\|, not \\|table\\| (pinned by a
    counted-bytes test and a 64×-view probe).
  * :meth:`commit_keyed` — for a table bucketed on its key
    (``init(..., bucket_keys=...)``, data files hash-partitioned into
    ``_kb=K/`` directories): rewrites only the key-buckets the batch
    touches; every untouched bucket's files are carried forward
    byte-identical (mtime-pinned). The streaming twin of the
    touched-partition MERGE
    (:func:`~kaj_query_engine_spark.operators.maintenance.merge_into_partitioned`).

- **Readers never see a torn table.** Data files are written
  completely, then the manifest, then the pointer moves
  (``os.replace``, atomic on POSIX). A concurrent reader resolves the
  pointer once and reads immutable files. A crash mid-commit leaves
  the table at the previous version; the orphan data directory is
  cleared on retry and unreferenced by any manifest.
- **Single writer.** Streaming ``foreachBatch`` delivers batches
  serially, which is exactly this model; multi-writer coordination
  (optimistic retry on pointer CAS) is a table-format concern, out of
  scope here.

Time travel falls out for free: every committed version stays readable
until vacuumed. :meth:`vacuum` garbage-collects by reference count
over the surviving manifests — a data file shared by ten manifests
dies only when the last of them is dropped (the Iceberg
expire-snapshots rule).

Reads use the manifest's recorded schema explicitly, so a schema-
evolved table reads old files with the new schema (missing columns
NULL) — the same read-path contract as mergeSchema'd parquet tables.

The bucket column ``_kb = pmod(xxhash64(keys...), n_buckets)`` exists
only in directory names, never in the data or the read schema.
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_POINTER = "_CURRENT"
_META = "_TABLE.json"
_KB = "_kb"


class VersionedTable:
    def __init__(self, path: str | os.PathLike):
        self.path = Path(path)
        self._meta_cache: dict | None = None

    # ---- table meta (bucket spec) -----------------------------------
    def _meta(self) -> dict:
        if self._meta_cache is None:
            try:
                self._meta_cache = json.loads(
                    (self.path / _META).read_text()
                )
            except (OSError, ValueError):
                self._meta_cache = {}
        return self._meta_cache

    @property
    def bucket_keys(self) -> list[str] | None:
        return self._meta().get("bucket_keys")

    @property
    def n_buckets(self) -> int | None:
        return self._meta().get("n_buckets")

    @property
    def is_bucketed(self) -> bool:
        return self.bucket_keys is not None

    @property
    def has_change_feed(self) -> bool:
        return bool(self._meta().get("change_feed"))

    def _kb_expr(self) -> Column:
        keys = self.bucket_keys
        return F.pmod(
            F.xxhash64(*[F.col(k) for k in keys]), F.lit(self.n_buckets)
        )

    def _cast_keys(self, df: DataFrame, schema: StructType) -> DataFrame:
        """Align a key frame's column types with the stored schema
        BEFORE hashing or joining: ``xxhash64`` is type-sensitive (an
        int 5 and a long 5 hash differently), so an int-typed key frame
        against a long-keyed table would silently select the wrong
        buckets — rows carried forward un-deleted, updates treated as
        inserts, no error anywhere."""
        types = {f.name: f.dataType for f in schema.fields}
        return df.select(*[
            F.col(c).cast(types[c]).alias(c) if c in types else F.col(c)
            for c in df.columns
        ])

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

    # ---- manifests --------------------------------------------------
    def _manifest_path(self, version: int) -> Path:
        return self.path / f"v{version}.json"

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v is None:
            raise ValueError(f"uninitialized versioned table: {self.path}")
        p = self._manifest_path(v)
        if not p.exists():
            raise ValueError(f"version {v} not found (vacuumed?): {self.path}")
        return json.loads(p.read_text())

    def _write_manifest(
        self,
        version: int,
        files: list[dict],
        schema: StructType,
        batch_id: int | None,
        cdf: dict | None = None,
    ) -> None:
        man = {
            "version": version,
            "applied_batch": batch_id,
            "schema": json.loads(schema.json()),
            "files": files,
        }
        if cdf is not None:
            man["cdf"] = cdf
        tmp = self.path / f"v{version}.json.tmp"
        tmp.write_text(json.dumps(man))
        os.replace(tmp, self._manifest_path(version))

    # ---- data writes ------------------------------------------------
    def _write_data(
        self, df: DataFrame, version: int, bucketed: bool | None = None
    ) -> list[dict]:
        """Write ``df``'s rows as this commit's data files under
        ``data/c{version}`` and return their manifest entries. Bucketed
        tables hash-partition into ``_kb=K/`` directories (the bucket
        id recorded per file); empty partitions write no file, so a
        delta touching one bucket produces files for that bucket only.
        ``bucketed=False`` skips the bucket split even on a bucketed
        table — append deltas use it (kb=None "stray" files), because
        splitting a small delta across every bucket would pay one
        parquet file's fixed overhead PER BUCKET; strays are read by
        every keyed commit until compaction re-buckets them (exactly
        how unclustered data files behave in real table formats).
        A leftover directory from a crashed attempt is cleared first —
        it is unreferenced by construction (manifests are written only
        after the data write succeeds)."""
        cdir = self.path / "data" / f"c{version}"
        if cdir.exists():
            shutil.rmtree(cdir)
        if self.is_bucketed and bucketed is not False:
            df.withColumn(_KB, self._kb_expr()).repartition(
                self.n_buckets, F.col(_KB)
            ).write.partitionBy(_KB).parquet(str(cdir))
        else:
            df.write.parquet(str(cdir))
        files: list[dict] = []
        for p in sorted(cdir.rglob("part-*")):
            if not p.is_file():
                continue
            kb = None
            if p.parent.name.startswith(f"{_KB}="):
                kb = int(p.parent.name.split("=", 1)[1])
            files.append(
                {
                    "path": str(p.relative_to(self.path)),
                    "kb": kb,
                    # sizes recorded at write time: the footprint
                    # helpers (history/stray_bytes/maybe_compact) read
                    # the manifest instead of stat()ing every file per
                    # call — carried entries keep theirs for free
                    "bytes": p.stat().st_size,
                }
            )
        return files

    def _file_bytes(self, f: dict) -> int:
        b = f.get("bytes")
        if b is None:  # manifest predating size recording
            b = (self.path / f["path"]).stat().st_size
        return b

    def _read_files(
        self, spark: SparkSession, files: list[dict], schema: StructType
    ) -> DataFrame:
        """Read exactly these manifest files with the recorded schema
        (leaf-file reads never infer the _kb path segment; files
        predating an evolved column read it as NULL)."""
        if not files:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[str(self.path / f["path"]) for f in files]
        )

    @staticmethod
    def _schema_of(man: dict) -> StructType:
        return StructType.fromJson(man["schema"])

    # ---- lifecycle --------------------------------------------------
    def init(
        self,
        df: DataFrame,
        batch_id: int | None = None,
        *,
        bucket_keys: list[str] | None = None,
        n_buckets: int = 8,
        change_feed: bool = False,
    ) -> int:
        """(Re)create the table at version 0 from ``df``. Destroys any
        existing history — callers use it for a fresh maintenance run,
        not on a live table. (It also removes any streaming checkpoint
        kept under the table path, so foreachBatch batch ids and
        :meth:`last_applied_batch` restart together.)

        ``bucket_keys`` hash-partitions the data into ``n_buckets``
        key-buckets, enabling :meth:`commit_keyed`'s touched-bucket
        rewrites; the one-time bucketing shuffle here is the standard
        price of a bucketed layout.

        ``batch_id`` is recorded exactly as in :meth:`commit`: when the
        very FIRST delivered micro-batch creates the table, dropping
        its id would reopen the at-least-once double-apply hole for a
        crash between this init and the streaming checkpoint."""
        if self.path.exists():
            shutil.rmtree(self.path)
        self.path.mkdir(parents=True)
        self._meta_cache = None
        if bucket_keys is not None or change_feed:
            missing = [k for k in (bucket_keys or []) if k not in df.columns]
            if missing:
                raise ValueError(f"bucket keys absent from schema: {missing}")
            meta: dict = {"change_feed": change_feed}
            if bucket_keys is not None:
                meta |= {
                    "bucket_keys": list(bucket_keys),
                    "n_buckets": n_buckets,
                }
            (self.path / _META).write_text(json.dumps(meta))
        files = self._write_data(df, 0)
        self._write_manifest(0, files, df.schema, batch_id)
        self._swap_pointer(0)
        return 0

    def commit(
        self,
        df: DataFrame,
        batch_id: int | None = None,
        *,
        cdf: dict | None = None,
    ) -> int:
        """Full-snapshot commit: write ``df`` completely as the next
        version's data files, then move the pointer. O(table) by
        design — init, compaction, and non-incremental rewrites use
        it; incremental maintenance uses :meth:`commit_append` /
        :meth:`commit_keyed` instead.

        ``batch_id`` (foreachBatch's id) is recorded in the manifest
        before the pointer swap, so (version, applied-batch) flip
        together atomically. Callers whose merge is NOT naturally
        idempotent check :meth:`last_applied_batch` to skip
        at-least-once re-deliveries."""
        cur = self.current_version()
        if cur is None:
            return self.init(df, batch_id)
        nxt = cur + 1
        files = self._write_data(df, nxt)
        self._write_manifest(nxt, files, df.schema, batch_id, cdf=cdf)
        self._swap_pointer(nxt)
        return nxt

    def commit_append(self, delta: DataFrame, batch_id: int | None = None) -> int:
        """O(Δ) append commit: write ONLY ``delta``'s rows as new data
        files; the new manifest references the previous version's
        files unchanged plus the delta's. Bytes written per commit
        scale with the delta, never with the table — the insert-only
        IVM write path (q89 'append')."""
        cur = self.current_version()
        if cur is None:
            return self.init(delta, batch_id)
        man = self.manifest(cur)
        nxt = cur + 1
        new_files = self._write_data(delta, nxt, bucketed=False)
        # manifest schema = stored ∪ delta (schema-only union, no job):
        # recording the DELTA's schema verbatim would silently NARROW
        # an evolved table when a later append omits the new column
        stored = self._schema_of(man)
        merged_schema = (
            delta.sparkSession.createDataFrame([], stored)
            .unionByName(delta.limit(0), allowMissingColumns=True)
            .schema
        )
        self._write_manifest(
            nxt,
            man["files"] + new_files,
            merged_schema,
            batch_id,
            # CDF for a pure append IS the delta: no second copy, the
            # version's own new files replay as op='I' (the same
            # file-reuse trick Delta's CDF does for insert-only
            # commits)
            cdf={"mode": "insert_files"} if self.has_change_feed else None,
        )
        self._swap_pointer(nxt)
        return nxt

    def commit_keyed(
        self,
        replacement: DataFrame,
        touched_keys: DataFrame,
        batch_id: int | None = None,
    ) -> int:
        """O(touched buckets) keyed commit: drop every stored row whose
        key appears in ``touched_keys`` (all of its columns join) and
        add ``replacement`` — the write half of a keyed merge/refresh.
        On a bucketed table only the buckets containing touched keys
        are read and rewritten; every other bucket's files are carried
        forward into the new manifest byte-identical. On an unbucketed
        table this degenerates to a full-snapshot rewrite (correct,
        not incremental) — bucket the table to get the O(Δ) path.

        ``replacement`` may carry columns the stored schema lacks
        (schema evolution): survivors are padded NULL and the manifest
        schema widens, so untouched files read the new column as NULL
        without being rewritten.

        The touched files are read lazily by up to three plans per
        commit (survivor write, CDF pre-images, and whatever the
        caller's replacement lineage holds) — all DELTA-bounded scans;
        an earlier `bucket_rows` pass-through parameter claimed to
        deduplicate them but could not (an un-persisted DataFrame
        re-executes its scan per action) and was removed."""
        cur = self.current_version()
        if cur is None:
            raise ValueError(
                f"commit_keyed needs an initialized table: {self.path}"
            )
        spark = replacement.sparkSession
        man = self.manifest(cur)
        schema = self._schema_of(man)
        tk = self._cast_keys(touched_keys.distinct(), schema)
        tcols = tk.columns
        stray_files: list[dict] = []
        if self.is_bucketed:
            bkeys = self.bucket_keys
            missing = [k for k in bkeys if k not in tcols]
            if missing:
                raise ValueError(
                    f"touched_keys must carry the bucket keys; missing: {missing}"
                )
            # touched bucket ids: bounded by n_buckets, driver-safe
            tb = {
                r[0]
                for r in tk.select(self._kb_expr().alias(_KB))
                .distinct()
                .collect()
            }
            touched_files = [f for f in man["files"] if f["kb"] in tb]
            carried = [f for f in man["files"] if f["kb"] not in tb and f["kb"] is not None]
            # kb=None strays (commit_append deltas not yet compacted
            # into buckets) may hold ANY key, so they are always read
            # and filtered; their survivors are re-written as strays —
            # re-bucketing a small scattered delta would pay one
            # parquet file's overhead per bucket it grazes. Compaction
            # folds strays into buckets for real.
            stray_files = [f for f in man["files"] if f["kb"] is None]
        else:
            touched_files, carried = man["files"], []

        def _survivors(files: list[dict]) -> DataFrame:
            return (
                self._read_files(spark, files, schema)
                .join(F.broadcast(tk), on=tcols, how="left_anti")
                .select(*schema.fieldNames())  # anti fronts key columns
            )

        new_data = _survivors(touched_files).unionByName(
            replacement, allowMissingColumns=True
        )
        nxt = cur + 1
        new_files = self._write_data(new_data, nxt)
        if stray_files:
            sdir = self.path / "data" / f"c{nxt}" / "stray"
            _survivors(stray_files).write.parquet(str(sdir))
            new_files += [
                {
                    "path": str(p.relative_to(self.path)),
                    "kb": None,
                    "bytes": p.stat().st_size,
                }
                for p in sorted(sdir.glob("part-*"))
                if p.is_file()
            ]
        cdf = None
        if self.has_change_feed:
            # record this commit's effective I/U/D rows, O(Δ): the
            # pre-images are exactly the touched keys' stored rows
            # (already-read touched buckets + strays), the post-images
            # the replacement; snapshot_diff nets bit-identical no-ops
            # away. Written inside the version's data dir, referenced
            # from the manifest, GC'd with it.
            from kaj_query_engine_spark.operators.maintenance import (
                snapshot_diff,
            )

            widen = new_data.limit(0)
            pre = (
                self._read_files(
                    spark, touched_files + stray_files, schema
                )
                .join(F.broadcast(tk), on=tcols, how="left_semi")
                .unionByName(widen, allowMissingColumns=True)
            )
            post = replacement.unionByName(widen, allowMissingColumns=True)
            changes = snapshot_diff(pre, post, tcols)
            # update PRE-images ride along as op='U-' (deletes already
            # carry theirs — snapshot_diff's D is the old row): with
            # both images recorded, a signed consumer can maintain
            # algebraic aggregates straight from the feed
            # (+I +U −U− −D), the Delta CDF
            # update_preimage/update_postimage contract
            u_keys = changes.filter(F.col("op") == "U").select(*tcols)
            pre_u = pre.join(u_keys, on=tcols, how="left_semi").select(
                F.lit("U-").alias("op"), *changes.columns[1:]
            )
            changes = changes.unionByName(pre_u)
            cpath = self.path / "data" / f"c{nxt}" / "_changes"
            changes.write.parquet(str(cpath))
            cdf = {
                "mode": "files",
                "files": [
                    str(p.relative_to(self.path))
                    for p in sorted(cpath.glob("part-*"))
                    if p.is_file()
                ],
                "schema": json.loads(changes.schema.json()),
            }
        self._write_manifest(
            nxt, carried + new_files, new_data.schema, batch_id, cdf=cdf
        )
        self._swap_pointer(nxt)
        return nxt

    def read_changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
        *,
        include_preimages: bool = False,
    ) -> DataFrame:
        """The change data feed: every commit's effective I/U/D rows
        for versions in ``(from_version, to_version]``, tagged with
        ``op`` and ``_commit_version`` — what an incremental consumer
        replays instead of diffing snapshots (the Delta CDF contract).
        Requires the table to have been initialized with
        ``change_feed=True``; a full-snapshot :meth:`commit` records
        no feed and makes ranges crossing it raise (compaction does
        NOT break the feed — it is logically changeless).

        ``include_preimages=True`` additionally returns each update's
        PRE-image as ``op='U-'`` (deletes carry theirs as the D row
        itself), enabling signed aggregate maintenance from the feed
        — see :func:`feed_agg_delta`."""
        to_v = self.current_version() if to_version is None else to_version
        if to_v is None:
            raise ValueError(f"uninitialized versioned table: {self.path}")
        frames = []
        for v in range(from_version + 1, to_v + 1):
            man = self.manifest(v)
            cdf = man.get("cdf")
            if cdf is None:
                raise ValueError(
                    f"no change feed recorded for version {v} (feed "
                    "disabled at init, or a full-snapshot commit broke it)"
                )
            if cdf["mode"] == "empty":
                continue
            if cdf["mode"] == "insert_files":
                prefix = f"data/c{v}/"
                files = [
                    f for f in man["files"] if f["path"].startswith(prefix)
                ]
                df = self._read_files(
                    spark, files, self._schema_of(man)
                ).select(F.lit("I").alias("op"), "*")
            else:
                cschema = StructType.fromJson(cdf["schema"])
                if cdf["files"]:
                    df = spark.read.schema(cschema).parquet(
                        *[str(self.path / p) for p in cdf["files"]]
                    )
                else:
                    df = spark.createDataFrame([], cschema)
                if not include_preimages:
                    df = df.filter(F.col("op") != "U-")
            frames.append(df.withColumn("_commit_version", F.lit(v)))
        if not frames:
            man = self.manifest(to_v)
            empty = spark.createDataFrame([], self._schema_of(man))
            return empty.select(
                F.lit("I").alias("op"),
                "*",
                F.lit(0).alias("_commit_version"),
            ).limit(0)
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    def last_applied_batch(self) -> int | None:
        """The foreachBatch batch id recorded with the CURRENT version,
        or None if the current version carries none (initial seed, or
        a non-streaming commit)."""
        v = self.current_version()
        if v is None:
            return None
        return self.manifest(v).get("applied_batch")

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Current snapshot, or time-travel to ``version``."""
        man = self.manifest(version)
        return self._read_files(spark, man["files"], self._schema_of(man))

    def read_buckets(self, spark: SparkSession, keys_df: DataFrame) -> DataFrame:
        """The rows of every bucket containing a key from ``keys_df``
        (a SUPERSET of the keys' rows — same-bucket neighbours and
        not-yet-compacted append strays come along; callers semi-join
        to narrow). This is the delta-bounded read half of a keyed
        merge: untouched buckets are never scanned. Unbucketed tables
        return the full snapshot."""
        if not self.is_bucketed:
            return self.read(spark)
        man = self.manifest()
        keys_df = self._cast_keys(keys_df, self._schema_of(man))
        tb = {
            r[0]
            for r in keys_df.select(self._kb_expr().alias(_KB))
            .distinct()
            .collect()
        } | {None}
        files = [f for f in man["files"] if f["kb"] in tb]
        return self._read_files(spark, files, self._schema_of(man))

    def versions(self) -> list[int]:
        return sorted(
            int(p.stem[1:])
            for p in self.path.glob("v*.json")
            if p.stem[1:].isdigit()
        )

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest ``keep_last`` versions (the current
        version is always kept regardless), then garbage-collect data
        files no surviving manifest references — reference-counted, so
        a file carried forward across fifty incremental commits lives
        until the LAST manifest naming it is dropped. Returns the
        versions removed. Time travel reaches only what vacuum leaves
        — same contract as any table format's retention window."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        cur = self.current_version()
        keep = set(self.versions()[-keep_last:]) | (
            {cur} if cur is not None else set()
        )
        dropped = []
        for v in self.versions():
            if v not in keep:
                self._manifest_path(v).unlink()
                dropped.append(v)
        referenced = set()
        for v in self.versions():
            man = self.manifest(v)
            referenced |= {f["path"] for f in man["files"]}
            referenced |= set(man.get("cdf", {}).get("files", []))
        data = self.path / "data"
        if data.exists():
            for p in sorted(data.rglob("*")):
                if p.is_file() and str(p.relative_to(self.path)) not in referenced:
                    p.unlink()
            # prune now-empty commit/bucket directories, deepest first
            for d in sorted(
                (d for d in data.rglob("*") if d.is_dir()),
                key=lambda d: -len(d.parts),
            ):
                if not any(d.iterdir()):
                    d.rmdir()
        return dropped

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the CURRENT version's data compactly and commit it
        as a new full-snapshot version — the small-files maintenance
        every incrementally-committed table needs (each commit_append /
        commit_keyed adds files; compaction restores scan-friendly
        sizes). Unbucketed tables coalesce to ``target_files``;
        bucketed tables rewrite to one file per bucket (the bucketed
        layout's floor — ``target_files`` is ignored). Data is
        bit-identical by construction, committed through the same
        atomic pointer swap, and the pre-compaction version stays
        time-travelable until vacuumed. At real scale target_files
        derives from table bytes / maxPartitionBytes rather than a
        constant.

        The source version's applied-batch marker is carried forward:
        compaction rewrites the SAME logical state, so the last
        streaming batch folded into it is unchanged — dropping the
        marker would make the next at-least-once re-delivery look
        fresh and double-apply it."""
        df = self.read(spark)
        if not self.is_bucketed:
            df = df.coalesce(target_files)
        # compaction is logically changeless: the marker that lets the
        # change feed read straight through rides IN the manifest, so
        # (files, cdf, pointer) land atomically — a post-hoc patch
        # would leave a feed-breaking window after the pointer swap
        return self.commit(
            df,
            batch_id=self.last_applied_batch(),
            cdf={"mode": "empty"} if self.has_change_feed else None,
        )

    def file_count(self, version: int | None = None) -> int:
        return len(self.manifest(version)["files"])

    def bytes_added(self, version: int | None = None) -> int:
        """Bytes of data WRITTEN by this commit (its new files under
        ``data/c{version}`` only, carried-forward files excluded) —
        the quantity the O(Δ) contract bounds and the counted-bytes
        tests/probes measure."""
        v = self.current_version() if version is None else version
        prefix = f"data/c{v}/"
        return sum(
            self._file_bytes(f)
            for f in self.manifest(v)["files"]
            if f["path"].startswith(prefix)
        )

    def history(self) -> list[dict]:
        """Commit history as plain rows (newest last): one dict per
        surviving version with its applied batch id, file/byte
        footprint, and how much of it was newly written vs carried
        forward — the DESCRIBE HISTORY every table format exposes,
        reduced to what the maintenance jobs need to audit their own
        write amplification (the q33/q89 invariants read it)."""
        out = []
        for v in self.versions():
            man = self.manifest(v)
            files = man["files"]
            prefix = f"data/c{v}/"
            out.append({
                "version": v,
                "applied_batch": man.get("applied_batch"),
                "n_files": len(files),
                "n_stray_files": sum(1 for f in files if f["kb"] is None)
                if self.is_bucketed else 0,
                "bytes_total": sum(self._file_bytes(f) for f in files),
                "bytes_added": sum(
                    self._file_bytes(f)
                    for f in files
                    if f["path"].startswith(prefix)
                ),
            })
        return out

    def stray_bytes(self, version: int | None = None) -> int:
        """Bytes held in kb=None stray files (append deltas not yet
        folded into buckets) at ``version`` — the auto-compaction
        trigger metric."""
        if not self.is_bucketed:
            return 0
        return sum(
            self._file_bytes(f)
            for f in self.manifest(version)["files"]
            if f["kb"] is None
        )

    def maybe_compact(
        self,
        spark: SparkSession,
        *,
        max_stray_fraction: float = 0.25,
        max_files: int | None = None,
    ) -> int | None:
        """Compact WHEN WARRANTED, else do nothing: triggers when
        stray bytes exceed ``max_stray_fraction`` of the table (every
        keyed commit re-reads all strays, so their cost is paid per
        batch until folded) or the file count exceeds ``max_files``.
        Returns the new version or None — the background OPTIMIZE
        policy a streaming-ingested table runs between batches,
        reduced to a threshold check the caller can afford every
        commit (metadata-only: sizes come from the manifest's files).
        """
        man = self.manifest()  # ONE manifest load per check
        total = stray = 0
        for f in man["files"]:
            b = self._file_bytes(f)
            total += b
            if self.is_bucketed and f["kb"] is None:
                stray += b
        if (total and stray / total > max_stray_fraction) or (
            max_files is not None and len(man["files"]) > max_files
        ):
            return self.compact(spark)
        return None


def apply_change_feed(
    base: DataFrame, changes: DataFrame, keys: list[str]
) -> DataFrame:
    """Fold a change data feed (rows tagged ``op`` ∈ I/U/D and
    ``_commit_version``, the
    :meth:`VersionedTable.read_changes`
    output) onto a base snapshot: per key, the LATEST change wins
    (deletes remove, inserts/updates replace), untouched keys carry.
    The replay law — ``apply_change_feed(read(a), read_changes(a, b))
    == read(b)`` for any key-unique fed table — is property-pinned in
    the versioned-table suite; it is what lets an incremental consumer
    catch up from a table's history instead of re-diffing snapshots.

    Requires ``keys`` to be a row identity of the table (join views
    keyed by a non-unique dimension key replay through the keyed
    refresh in ``streaming/ops`` instead). Scale: one window over the
    CHANGES (delta-sized), one broadcast anti-join of the base against
    the touched keys — O(Δ ⋈ base scan), never O(base ⋈ base)."""
    # pre-image rows (op 'U-', present when the feed was read with
    # include_preimages=True for a signed consumer) are NOT post-state:
    # they tie with their 'U' row on _commit_version and would win the
    # window nondeterministically, replaying stale values — drop them
    changes = changes.filter(F.col("op") != "U-")
    w = W.partitionBy(*keys).orderBy(F.col("_commit_version").desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    touched = latest.select(*keys)
    ups = latest.filter(F.col("op") != "D").drop("op", "_commit_version")
    return (
        base.join(F.broadcast(touched), on=keys, how="left_anti")
        .select(*base.columns)  # anti-join fronts the key columns
        .unionByName(ups.select(*base.columns))
    )


def feed_agg_delta(
    changes: DataFrame, sum_cols: list[str]
) -> DataFrame:
    """Signed aggregate maintenance from a change feed read with
    ``include_preimages=True``: one pass computes the exact DELTA each
    additive aggregate moved across the fed range — rows count +1 for
    inserts and update post-images, −1 for deletes and update
    pre-images, so

        agg(version b) == agg(version a) + feed_agg_delta(changes a→b)

    for every SUM/COUNT (the signed-compensation law pinned in the
    versioned-table suite; the same algebra as the keyed IVM's
    DBToaster rule). Returns ONE row: ``d_count`` plus ``d_<col>`` per
    requested column. Min/max are not algebraic under deletion — that
    boundary is why the sketch queries exist."""
    sign = F.when(F.col("op").isin("I", "U"), F.lit(1)).otherwise(F.lit(-1))
    return changes.select(sign.alias("_s"), *sum_cols).agg(
        F.coalesce(F.sum("_s"), F.lit(0)).alias("d_count"),
        *[
            F.coalesce(F.sum(F.col(c) * F.col("_s")), F.lit(0)).alias(f"d_{c}")
            for c in sum_cols
        ],
    )
