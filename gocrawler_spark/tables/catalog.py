"""Snapshot table catalog — Iceberg semantics over plain parquet.

The design target is Iceberg (`frontier`/`seen` bucket-partitioned on
url_hash, MERGE INTO per round, snapshot time-travel for resume — see
SURVEY.md §1.4/§4). This sandbox has no Iceberg runtime jar and no
network, so this module provides the same *semantics* on parquet:

* every write is a new immutable **snapshot** (monotonic id) listing the
  parquet directories it is composed of (appends reuse parent dirs —
  O(delta) I/O, like Iceberg manifests);
* a ``CURRENT`` pointer file updated by atomic ``os.replace`` gives
  atomic visibility per table;
* cross-table atomicity for a crawl round comes from the ``checkpoints``
  row recording the (table -> snapshot_id) vector the round committed —
  resume reads that vector and time-travels each table to it, so a crash
  between table commits can never publish a torn round;
* ``bucket_of`` hash-buckets rows on url_hash so heavy tables are
  written ``partitionBy(bucket)`` — bucket-pruned reads and co-located
  merges, standing in for Iceberg ``bucket(N, url_hash)``.

On a real cluster, swap ``SnapshotCatalog`` for an Iceberg catalog: the
call sites use only read / append / overwrite / merge-style operations
that map 1:1 onto Iceberg SQL.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket"


def bucket_of(col, n_buckets: int):
    """Deterministic bucket from a (string) hash column."""
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


class SnapshotCatalog:
    """Directory-backed snapshot tables with atomic pointer commits."""

    def __init__(self, base_dir: str, spark: SparkSession):
        self.base = base_dir
        self.spark = spark
        os.makedirs(base_dir, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.base, table)

    def _meta(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_meta")

    def _current_path(self, table: str) -> str:
        return os.path.join(self._meta(table), "CURRENT")

    # -- snapshot bookkeeping ----------------------------------------------
    def current_snapshot(self, table: str) -> int | None:
        p = self._current_path(table)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def _manifest(self, table: str, snap: int) -> dict:
        with open(os.path.join(self._meta(table), f"v{snap}.json")) as f:
            return json.load(f)

    _INHERIT = object()  # "keep the parent snapshot's bucket_spec"

    def _commit(self, table: str, dirs: list[str], op: str, schema_json: str | None = None,
                bucket_spec=_INHERIT) -> int:
        meta = self._meta(table)
        os.makedirs(meta, exist_ok=True)
        snap = (self.current_snapshot(table) or 0) + 1
        if snap > 1:
            prev = self._manifest(table, snap - 1)
            if schema_json is None:
                schema_json = prev.get("schema")
            if bucket_spec is SnapshotCatalog._INHERIT:
                bucket_spec = prev.get("bucket_spec")
        if bucket_spec is SnapshotCatalog._INHERIT:
            bucket_spec = None
        manifest = {"snapshot_id": snap, "dirs": dirs, "op": op, "schema": schema_json,
                    "bucket_spec": bucket_spec}
        mpath = os.path.join(meta, f"v{snap}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        cur_tmp = self._current_path(table) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(cur_tmp, "w") as f:
            f.write(str(snap))
        os.replace(cur_tmp, self._current_path(table))
        return snap

    # target rows per output file for size-hinted appends — the row-count
    # analog of Iceberg's write.target-file-size-bytes
    ROWS_PER_FILE = 4_000_000

    def _write_data(self, table: str, df: DataFrame, partition_by=None,
                    n_rows: int | None = None) -> str:
        dest = os.path.join(self._tdir(table), "data", uuid.uuid4().hex[:12])
        w = df.write.mode("overwrite")
        if partition_by:
            # cluster rows by the partition column first: otherwise every
            # input task writes one file per bucket (tasks × buckets tiny
            # files — metadata death at scale); after repartition each
            # bucket is written by one task
            df = df.repartition(F.col(partition_by))
            w = df.write.mode("overwrite").partitionBy(partition_by)
        elif n_rows is not None:
            # caller already knows the row count: size the file count
            # from it instead of inheriting the upstream partitioning
            # (a 300-row round otherwise writes one tiny file per cache
            # partition, and append tables accumulate one such spray per
            # round — O(rounds × partitions) files). repartition, not
            # coalesce, so upstream compute keeps its parallelism.
            parts = max(1, -(-n_rows // self.ROWS_PER_FILE))
            w = df.repartition(parts).write.mode("overwrite")
        w.parquet(dest)
        return dest

    # -- public ops ----------------------------------------------------------
    def exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    @staticmethod
    def _has_parquet(d: str) -> bool:
        for root, _dirs, files in os.walk(d):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def bucket_spec(self, table: str) -> list | None:
        """The table's recorded bucket partition spec [src_col,
        n_buckets] (Iceberg's ``bucket(N, col)`` analog), or None."""
        cur = self.current_snapshot(table)
        if cur is None:
            return None
        return self._manifest(table, cur).get("bucket_spec")

    def overwrite(self, table: str, df: DataFrame, partition_by=None,
                  bucket_spec: tuple | None = None) -> int:
        d = self._write_data(table, df, partition_by)
        dirs = [d] if self._has_parquet(d) else []
        spec = list(bucket_spec) if bucket_spec else ([] if partition_by == BUCKET_COL else None)
        # spec=[] means "bucketed but layout unrecorded" (legacy caller):
        # a later spec'd merge/append treats it as a layout mismatch and
        # re-buckets the whole table rather than trust the fast path
        return self._commit(table, dirs, "overwrite", schema_json=df.schema.json(),
                            bucket_spec=spec)

    def append_local_rows(self, table: str, rows: list[tuple], ddl: str) -> int:
        """Append a handful of DRIVER-LOCAL rows without a Spark job.

        Control-plane rows (one checkpoint row per crawl round) already
        live on the driver; routing them through createDataFrame +
        df.write costs a full job's scheduling/write machinery (~0.6 s
        each at local scale) for a sub-KB file. Iceberg's own commit
        path writes manifests driver-side for the same reason. pyarrow
        writes the parquet file directly; the manifest records the
        Spark schema so reads stay schema-driven and identical to the
        Spark-written case."""
        from pyspark.sql.types import StructType, _parse_datatype_string

        spark_schema = _parse_datatype_string(ddl)
        assert isinstance(spark_schema, StructType)
        import pyarrow as pa
        import pyarrow.parquet as pq

        _PA = {"string": pa.string(), "integer": pa.int32(), "long": pa.int64(),
               "double": pa.float64(), "boolean": pa.bool_()}
        fields = [(f.name, _PA[f.dataType.typeName()]) for f in spark_schema.fields]
        cols = list(zip(*rows)) if rows else [[] for _ in fields]
        tbl = pa.table(
            {name: pa.array(list(vals), type=t)
             for (name, t), vals in zip(fields, cols)}
        )
        dest = os.path.join(self._tdir(table), "data", uuid.uuid4().hex[:12])
        os.makedirs(dest, exist_ok=True)
        pq.write_table(tbl, os.path.join(dest, "part-00000.parquet"))
        cur = self.current_snapshot(table)
        prev = self._manifest(table, cur)["dirs"] if cur else []
        return self._commit(table, prev + [dest], "append",
                            schema_json=spark_schema.json(),
                            bucket_spec=SnapshotCatalog._INHERIT if cur else None)

    def append(self, table: str, df: DataFrame, partition_by=None,
               bucket_spec: tuple | None = None, n_rows: int | None = None) -> int:
        if (
            bucket_spec is not None
            and self.exists(table)
            and self.bucket_spec(table) not in (None, list(bucket_spec))
        ):
            # layout changed (e.g. resume with different n_buckets):
            # appending rows bucketed under the new spec next to dirs
            # bucketed under the old one would silently corrupt every
            # later bucket-delta merge — rewrite the table under the
            # new spec instead (Iceberg: REPLACE PARTITION FIELD)
            src, n = bucket_spec
            old = self.read(table).withColumn(BUCKET_COL, bucket_of(F.col(src), n))
            merged = old.unionByName(df.withColumn(BUCKET_COL, bucket_of(F.col(src), n)))
            return self.overwrite(table, merged, partition_by, bucket_spec)
        d = self._write_data(table, df, partition_by, n_rows=n_rows)
        cur = self.current_snapshot(table)
        prev = self._manifest(table, cur)["dirs"] if cur else []
        dirs = prev + ([d] if self._has_parquet(d) else [])
        spec = (
            list(bucket_spec)
            if bucket_spec
            else (SnapshotCatalog._INHERIT if cur else ([] if partition_by == BUCKET_COL else None))
        )
        return self._commit(table, dirs, "append", schema_json=df.schema.json(),
                            bucket_spec=spec)

    def _read_entry(self, entry, schema=None) -> DataFrame:
        """A manifest dir entry is either a whole data root (str) or a
        per-bucket subset {"root": ..., "parts": ["bucket=N", ...]} left
        behind by a bucket-delta merge; basePath keeps the partition
        column when reading a subset of hive dirs.

        ``schema`` is the manifest's recorded schema: passing it skips
        parquet footer inference — without it every read of every entry
        runs a schema-discovery job, and append-mode tables (seen,
        fetch_log) accumulate one entry per round, so round R paid O(R)
        extra driver actions (Iceberg reads are manifest-schema-driven
        for the same reason)."""
        r = self.spark.read
        if schema is not None:
            r = r.schema(schema)
        if isinstance(entry, str):
            return r.parquet(entry)
        paths = [os.path.join(entry["root"], p) for p in entry["parts"]]
        return r.option("basePath", entry["root"]).parquet(*paths)

    def read(self, table: str, snapshot_id: int | None = None) -> DataFrame:
        snap = snapshot_id if snapshot_id is not None else self.current_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"table {table} has no snapshot")
        man = self._manifest(table, snap)
        dirs = man["dirs"]
        schema = None
        if man.get("schema"):
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(man["schema"]))
        if not dirs:
            return self.spark.createDataFrame([], schema)
        dfs = [self._read_entry(d, schema) for d in dirs]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def read_or_empty(self, table: str, schema) -> DataFrame:
        if self.exists(table):
            return self.read(table)
        return self.spark.createDataFrame([], schema)

    def _bucket_parts(self, entry) -> list[str] | None:
        """Hive partition dirs (bucket=N) of a manifest entry, or None if
        the entry's data is not bucket-partitioned on disk."""
        if isinstance(entry, dict):
            return list(entry["parts"])
        parts = []
        if os.path.isdir(entry):
            for name in os.listdir(entry):
                if name.startswith(f"{BUCKET_COL}=") and os.path.isdir(os.path.join(entry, name)):
                    parts.append(name)
        return parts or None

    def merge_upsert(
        self,
        table: str,
        updates: DataFrame,
        key: str,
        when_matched=None,
        partition_by=None,
        bucket_spec: tuple | None = None,
    ) -> int:
        """MERGE INTO <table> USING updates ON key.

        Default matched behavior: take the update row (HMSET overwrite).
        ``when_matched(old_df, new_df) -> DataFrame`` customizes the
        matched branch (e.g. HSETNX first-wins detail maps, RPUSH review
        append — SURVEY §1.2). On Iceberg this is one MERGE INTO
        statement.

        When the table is bucket-partitioned (``partition_by``), the
        merge is **bucket-delta**: only buckets containing update keys
        are read and rewritten; every other bucket's parquet dirs are
        carried forward untouched in the new manifest — the same
        file-level rewrite shape Iceberg MERGE produces, so per-round
        I/O is O(delta buckets), not O(table). Falls back to the full
        rewrite when any historical data dir is unbucketed.

        ``bucket_spec=(src_col, n_buckets)`` declares how the caller
        computed the bucket column. The delta fast path requires it to
        MATCH the table's recorded spec: an update batch bucketed under
        a different modulus (resume with a changed ``n_buckets``) would
        otherwise carry forward a matched key's old row in a bucket the
        batch never touches while also writing the new row — silent
        duplicate keys. On mismatch the whole table is re-bucketed
        under the new spec (global merge on key — always correct) and
        the new spec is recorded.
        """
        if not self.exists(table):
            return self.overwrite(table, updates, partition_by, bucket_spec)
        stored_spec = self.bucket_spec(table)
        # stored [] = "bucketed but modulus unrecorded" (legacy writer):
        # the delta fast path would trust bucket dirs computed under an
        # unverified modulus — exactly the silent-duplicate scenario the
        # spec exists to prevent — so [] forces the re-bucketed rewrite
        # just like a conflicting spec does
        respec = (
            partition_by == BUCKET_COL
            and bucket_spec is not None
            and stored_spec != list(bucket_spec)
        )
        if partition_by == BUCKET_COL and not respec:
            snap = self._commit_bucket_delta(table, updates, key, when_matched)
            if snap is not None:
                return snap
        old = self.read(table)
        if respec:
            src, n = bucket_spec
            old = old.withColumn(BUCKET_COL, bucket_of(F.col(src), n))
        strip_col = None
        if partition_by is not None and partition_by not in old.columns:
            # unbucketed history: stay unbucketed (full rewrite). The
            # partition column must survive until AFTER when_matched ran
            # — callers' matched branches may select it from the update
            # side — and is stripped from the merged result only then.
            strip_col = partition_by
            partition_by = None
        upd_keys = updates.select(key).distinct()
        untouched = old.join(upd_keys, key, "left_anti")
        if when_matched is None:
            merged = updates
        else:
            matched_old = old.join(upd_keys, key, "left_semi")
            merged = when_matched(matched_old, updates)
        if strip_col is not None:
            merged = merged.drop(strip_col)
        out = untouched.unionByName(merged)
        return self.overwrite(
            table, out, partition_by,
            bucket_spec if partition_by == BUCKET_COL else None,
        )

    def _commit_bucket_delta(self, table: str, updates: DataFrame, key: str, when_matched) -> int | None:
        """Bucket-delta MERGE body; returns None when the table layout
        can't support it (some dir is unbucketed -> caller rewrites)."""
        cur = self.current_snapshot(table)
        entries = self._manifest(table, cur)["dirs"]
        per_entry_parts = [self._bucket_parts(e) for e in entries]
        if any(p is None for p in per_entry_parts):
            return None
        # touched bucket ids: one tiny metadata collect (<= n_buckets
        # ints — manifest-scale work, like Iceberg partition pruning)
        touched = sorted(
            r[0] for r in updates.select(BUCKET_COL).distinct().collect()
        )
        touched_parts = {f"{BUCKET_COL}={b}" for b in touched}
        old_touched = self.read(table).filter(F.col(BUCKET_COL).isin(touched))
        upd_keys = updates.select(key).distinct()
        untouched_rows = old_touched.join(upd_keys, key, "left_anti")
        if when_matched is None:
            merged = updates
        else:
            matched_old = old_touched.join(upd_keys, key, "left_semi")
            merged = when_matched(matched_old, updates)
        out = untouched_rows.unionByName(merged.select(*untouched_rows.columns))
        new_root = self._write_data(table, out, BUCKET_COL)
        dirs = []
        for entry, parts in zip(entries, per_entry_parts):
            kept = [p for p in parts if p not in touched_parts]
            if not kept:
                continue
            if isinstance(entry, str) and len(kept) == len(parts):
                dirs.append(entry)  # nothing dropped: keep the plain root
            else:
                root = entry if isinstance(entry, str) else entry["root"]
                dirs.append({"root": root, "parts": kept})
        new_parts = [
            p for p in (self._bucket_parts(new_root) or []) if p in touched_parts
        ]
        if new_parts:
            dirs.append({"root": new_root, "parts": new_parts})
        return self._commit(table, dirs, "merge-delta", schema_json=out.schema.json())

    # -- maintenance ---------------------------------------------------------
    def snapshots(self, table: str) -> list[int]:
        """Snapshot ids with a live manifest, ascending."""
        meta = self._meta(table)
        if not os.path.isdir(meta):
            return []
        out = []
        for name in os.listdir(meta):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def compact(self, table: str, n_rows: int | None = None) -> int | None:
        """Rewrite the current snapshot's data as ONE data root (Iceberg
        ``rewrite_data_files``). Append tables accumulate one parquet
        spray per round and bucket-delta merges one partial root per
        round — after R rounds a scan opens O(R) directories and the
        manifest carries O(R) entries; compaction folds them back to one
        root with size-hinted file counts, committed as a new snapshot
        (``op="compact"``) so time-travel/rollback to pre-compact
        snapshots still works until they are expired.

        Bucketed tables rewrite ``partitionBy(bucket)`` (one file per
        bucket, spec preserved — later bucket-delta merges keep their
        fast path); unbucketed tables size the file count from
        ``n_rows`` (counted when not supplied). Returns the new snapshot
        id, or None when the table is already a single plain root
        (nothing to fold)."""
        cur = self.current_snapshot(table)
        if cur is None:
            raise FileNotFoundError(f"table {table} has no snapshot")
        man = self._manifest(table, cur)
        dirs = man["dirs"]
        if len(dirs) <= 1 and all(isinstance(d, str) for d in dirs):
            return None
        df = self.read(table)
        spec = man.get("bucket_spec")
        if spec is not None and BUCKET_COL in df.columns:
            d = self._write_data(table, df, BUCKET_COL)
        else:
            if n_rows is None:
                n_rows = df.count()
            d = self._write_data(table, df, n_rows=n_rows)
        new_dirs = [d] if self._has_parquet(d) else []
        return self._commit(table, new_dirs, "compact",
                            schema_json=man.get("schema") or df.schema.json(),
                            bucket_spec=spec)

    def expire_snapshots(self, table: str, keep_last: int | None = None,
                         retain_from: int | None = None) -> dict:
        """Drop manifests below the retention bound and delete every data
        root (and bucket part dir) no retained snapshot references
        (Iceberg ``expire_snapshots``). Without it a long-running
        frontier's table directory grows without bound: every round's
        append/merge snapshot pins its dirs forever.

        ``keep_last=k`` retains the k most recent snapshots;
        ``retain_from=s`` retains every snapshot >= s (the crawl loop
        passes the last complete checkpoint's snapshot id so resume
        stays possible). When both are given the MORE conservative
        bound wins (the union of both retention requests). The current
        snapshot is always retained. Driver-side file metadata work
        only — no Spark job.

        Also reclaims ORPHAN roots — dirs a crashed run wrote whose
        commit never landed (Iceberg's remove_orphan_files). Safe here
        because the catalog is single-writer (one driver loop): there
        is never an in-flight write racing an expire."""
        cur = self.current_snapshot(table)
        stats = {"expired": [], "deleted_roots": 0, "deleted_parts": 0,
                 "bytes_reclaimed": 0}
        if cur is None:
            return stats
        live = self.snapshots(table)
        bounds = []
        if keep_last is not None:
            # derive the bound from the LIVE snapshot list, not snapshot-
            # id arithmetic: earlier expirations leave id gaps, and
            # cur - k + 1 would then retain fewer than k actual
            # snapshots (ADVICE r5)
            k = max(keep_last, 1)
            tail = live[-k:] if live else [cur]
            bounds.append(tail[0] if tail else cur)
        if retain_from is not None:
            bounds.append(retain_from)
        if not bounds:
            return stats
        bound = min(min(bounds), cur)
        retained = [s for s in live if s >= bound]
        expired = [s for s in live if s < bound]
        if not expired:
            return stats
        # referenced roots: root -> set of bucket parts, or WHOLE
        WHOLE = True
        refs: dict[str, object] = {}
        for s in retained:
            for entry in self._manifest(table, s)["dirs"]:
                if isinstance(entry, str):
                    refs[entry] = WHOLE
                else:
                    root = entry["root"]
                    if refs.get(root) is not WHOLE:
                        refs.setdefault(root, set()).update(entry["parts"])

        def _du(path: str) -> int:
            total = 0
            for r, _d, files in os.walk(path):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(r, f))
                    except OSError:
                        pass
            return total

        data = os.path.join(self._tdir(table), "data")
        if os.path.isdir(data):
            for name in os.listdir(data):
                root = os.path.join(data, name)
                ref = refs.get(root)
                if ref is None:
                    stats["bytes_reclaimed"] += _du(root)
                    shutil.rmtree(root, ignore_errors=True)
                    stats["deleted_roots"] += 1
                elif ref is not WHOLE:
                    # partially referenced: drop unreferenced bucket dirs
                    for part in os.listdir(root):
                        p = os.path.join(root, part)
                        if (part.startswith(f"{BUCKET_COL}=")
                                and os.path.isdir(p) and part not in ref):
                            stats["bytes_reclaimed"] += _du(p)
                            shutil.rmtree(p, ignore_errors=True)
                            stats["deleted_parts"] += 1
        for s in expired:
            try:
                os.remove(os.path.join(self._meta(table), f"v{s}.json"))
                stats["expired"].append(s)
            except OSError:
                pass
        return stats

    def rollback(self, table: str, snapshot_id: int) -> int:
        """Re-publish an old snapshot as current (Iceberg rollback_to_snapshot).
        Used by resume to restore the table vector recorded in the last
        complete checkpoint row."""
        man = self._manifest(table, snapshot_id)
        return self._commit(table, man["dirs"], f"rollback:{snapshot_id}",
                            schema_json=man.get("schema"),
                            bucket_spec=man.get("bucket_spec"))

    def drop(self, table: str):
        shutil.rmtree(self._tdir(table), ignore_errors=True)
