"""Delta-protocol-style ACID transaction log over plain parquet ("delta-lite").

The reference's storage layer writes Delta Lake three times
(`glue/etl_api.py:25,38,49`); the delta-spark connector is absent from this
classpath, so since round 2 the repo carried "ACID/time-travel untested" as a
partial. This module closes it: a self-contained implementation of the PUBLIC
Delta Lake transaction-log design (Armbrust et al., "Delta Lake:
High-Performance ACID Table Storage over Cloud Object Stores", VLDB 2020;
delta.io PROTOCOL.md) in pure stdlib + PySpark + pyarrow:

- ``_delta_log/{version:020d}.json`` commit files, one JSON action per line
  (``protocol`` / ``metaData`` / ``add`` / ``remove`` / ``commitInfo``) —
  the same action vocabulary as the published protocol.
- **Atomic commits** via ``os.link`` (fails-if-exists, atomic on POSIX) —
  the "mutual exclusion on log-record creation" primitive the paper builds
  on. Losers of a race re-read the log and retry at the next version
  (optimistic concurrency, bounded retries).
- **Snapshot isolation**: a reader resolves the file list for one version
  and never sees a concurrent writer's half-finished state — data files are
  immutable and only become visible via a committed ``add``.
- **Time travel**: read any historical version by number or timestamp
  (latest commit at-or-before the timestamp, matching ``VERSION AS OF`` /
  ``TIMESTAMP AS OF``).
- **File-level min/max stats** in each ``add`` (parquet footer metadata via
  pyarrow — no data read), powering data-skipping for MERGE/DELETE: only
  files whose key range overlaps the update set are rewritten.
- **Checkpointing**: every ``checkpoint_interval`` commits the replayed
  state is compacted into a parquet checkpoint + ``_last_checkpoint``
  pointer, so log replay is O(interval), not O(commits) — the exact
  mechanism (and file naming) the protocol uses to bound metadata reads.

What is deliberately NOT here (documented deviations, all orthogonal to the
ACID semantics): deletion vectors, column mapping, generated columns, and
multi-part checkpoints. Data files ARE plain parquet in the table directory,
so any parquet reader can still scan the *current* files; the log adds the
transactional view.

Scale shape (100 TB): all log handling is driver-side metadata — JSON lines
proportional to FILE count, never row count; commits add O(files touched)
lines; replay is bounded by the checkpoint interval. Data moves only through
Spark parquet jobs (distributed, pushdown intact — the snapshot hands Spark
an explicit file list, which still prunes columns and pushes predicates).
MERGE rewrites only stat-overlapping files: an append-mostly 100 TB table
with a clustered key rewrites a few files, not the table.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG_DIR = "_delta_log"
_PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}
# footer min/max stats only for orderable primitives (protocol collects the
# same classes; binary/complex types are skipped there too)
_STATS_TYPES = (
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.StringType,
    T.DateType,
    T.DecimalType,
)


def _fmt_version(v: int) -> str:
    return f"{v:020d}.json"


def _json_safe(v):
    """Parquet footer statistics → JSON scalar (dates/decimals/bytes)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    return str(v)


def _decimal_from_raw(raw, scale: int) -> decimal.Decimal:
    """Parquet DECIMAL footer stat from its physical representation: the
    unscaled integer (INT32/INT64) or big-endian two's-complement bytes
    (FIXED_LEN_BYTE_ARRAY)."""
    if isinstance(raw, bytes):
        raw = int.from_bytes(raw, "big", signed=True)
    return decimal.Decimal(raw).scaleb(-scale)


def _footer_stats(file_path: str, stat_cols: list[str]) -> dict:
    """numRecords + per-column min/max from the parquet FOOTER (pyarrow
    metadata read — no row data touched; at 100 TB this is the only
    affordable way to collect per-file stats post-hoc)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(file_path)
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if name not in stat_cols:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            # merge across row groups on the RAW pyarrow values (Decimal,
            # date, …) — JSON-stringified decimals would merge
            # lexicographically ('9.5' > '10.2'); _json_safe only at the end
            try:
                lo, hi = st.min, st.max
            except Exception:
                # pyarrow can't logical-decode some types (DECIMAL): rebuild
                # from the unscaled raw stats; anything else → no stats for
                # this column (safe: absent stats mean assume-overlap)
                lt = md.schema.column(ci).logical_type
                if str(getattr(lt, "type", "")).upper() != "DECIMAL":
                    continue
                try:
                    scale = json.loads(lt.to_json())["scale"]
                    lo = _decimal_from_raw(st.min_raw, scale)
                    hi = _decimal_from_raw(st.max_raw, scale)
                except Exception:
                    continue
            if lo is not None and (name not in mins or lo < mins[name]):
                mins[name] = lo
            if hi is not None and (name not in maxs or hi > maxs[name]):
                maxs[name] = hi
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
    return {
        "numRecords": md.num_rows,
        "minValues": {k: s for k, v in mins.items() if (s := _json_safe(v)) is not None},
        "maxValues": {k: s for k, v in maxs.items() if (s := _json_safe(v)) is not None},
        "nullCount": nulls,
    }


@dataclass
class _Snapshot:
    version: int
    metadata: dict
    adds: dict = field(default_factory=dict)  # path -> add action
    commit_ts: int = 0
    txns: dict = field(default_factory=dict)  # appId -> last txn version


class DeltaLiteTable:
    """An ACID parquet table managed by a delta-protocol-style log.

    >>> t = DeltaLiteTable.create(spark, df, "/data/gold/orders", keys=["id"])
    >>> t.write(more, mode="append")
    >>> t.merge(updates)                       # copy-on-write MERGE by key
    >>> t.snapshot()                           # current committed view
    >>> t.snapshot(version=0)                  # VERSION AS OF
    >>> t.snapshot(timestamp=1700000000000)    # TIMESTAMP AS OF
    >>> t.history()                            # commitInfo per version
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.log_dir = os.path.join(self.path, _LOG_DIR)

    # ------------------------------------------------------------- creation

    @staticmethod
    def create(
        spark: SparkSession,
        df: DataFrame,
        path: str,
        keys: list[str] | None = None,
        partition_by: list[str] | None = None,
        checkpoint_interval: int = 10,
    ) -> "DeltaLiteTable":
        """Create a new table at ``path`` from ``df`` (errors if a log
        already exists — matching ``CREATE TABLE`` semantics)."""
        t = DeltaLiteTable(spark, path)
        if os.path.isdir(t.log_dir) and any(
            f.endswith(".json") for f in os.listdir(t.log_dir)
        ):
            raise FileExistsError(f"delta-lite table already exists at {path}")
        os.makedirs(t.log_dir, exist_ok=True)
        meta = {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": partition_by or [],
            "configuration": {
                "deltalite.keys": ",".join(keys or []),
                "deltalite.checkpointInterval": str(checkpoint_interval),
            },
            "createdTime": int(time.time() * 1000),
        }
        adds = t._write_data_files(df, partition_by or [])
        t._commit(
            0,
            [{"protocol": _PROTOCOL}, {"metaData": meta}]
            + [{"add": a} for a in adds],
            {"operation": "CREATE TABLE AS SELECT", "numFiles": len(adds)},
        )
        return t

    # --------------------------------------------------------- log plumbing

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            raise FileNotFoundError(f"no delta-lite log at {self.path}")
        return sorted(
            int(f[:20])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and f[:20].isdigit() and len(f) == 25
        )

    def version(self) -> int:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"empty delta-lite log at {self.path}")
        return vs[-1]

    def _read_checkpoint(self, upto: int) -> tuple[int, dict, dict, dict] | None:
        """Latest parquet checkpoint at version <= upto (via the
        ``_last_checkpoint`` pointer, falling back to a listing scan).

        Returns ``(version, metadata, adds, txns)``. The Delta checkpoint
        format requires SetTransaction (``txn``) actions to be carried in
        checkpoints — dropping them would silently void the idempotent-
        replay guarantee of ``merge(txn_app=...)`` after the first
        checkpoint boundary."""
        import pyarrow.parquet as pq

        cands = sorted(
            int(f[:20])
            for f in os.listdir(self.log_dir)
            if f.endswith(".checkpoint.parquet") and f[:20].isdigit()
        )
        cands = [v for v in cands if v <= upto]
        if not cands:
            return None
        v = cands[-1]
        tbl = pq.read_table(
            os.path.join(self.log_dir, f"{v:020d}.checkpoint.parquet")
        ).to_pylist()
        meta: dict = {}
        adds: dict = {}
        txns: dict = {}
        for row in tbl:
            action = json.loads(row["action"])
            if "metaData" in action:
                meta = action["metaData"]
            elif "add" in action:
                adds[action["add"]["path"]] = action["add"]
            elif "txn" in action:
                t = action["txn"]
                txns[t["appId"]] = max(t["version"], txns.get(t["appId"], -1))
        return v, meta, adds, txns

    def _replay(self, upto: int | None = None) -> _Snapshot:
        """Replay the log (from the newest checkpoint) to ``upto``."""
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"empty delta-lite log at {self.path}")
        upto = vs[-1] if upto is None else upto
        if upto not in vs:
            raise ValueError(f"version {upto} does not exist (have {vs[:3]}..{vs[-1]})")
        snap = _Snapshot(version=upto, metadata={})
        start = 0
        cp = self._read_checkpoint(upto)
        if cp is not None:
            start, snap.metadata, snap.adds = cp[0] + 1, cp[1], dict(cp[2])
            snap.txns = dict(cp[3])
        for v in vs:
            if v < start or v > upto:
                continue
            with open(os.path.join(self.log_dir, _fmt_version(v))) as f:
                for line in f:
                    action = json.loads(line)
                    if "metaData" in action:
                        snap.metadata = action["metaData"]
                    elif "add" in action:
                        snap.adds[action["add"]["path"]] = action["add"]
                    elif "remove" in action:
                        snap.adds.pop(action["remove"]["path"], None)
                    elif "txn" in action:
                        t = action["txn"]
                        snap.txns[t["appId"]] = max(
                            t["version"], snap.txns.get(t["appId"], -1)
                        )
                    elif "commitInfo" in action:
                        snap.commit_ts = action["commitInfo"]["timestamp"]
        return snap

    def _commit(self, version: int, actions: list[dict], info: dict, retries: int = 20) -> int:
        """Atomically publish ``actions`` as ``version`` (os.link is
        fail-if-exists, the POSIX "put-if-absent" the protocol requires of
        the log store). On collision the caller's prepared actions are
        re-published at the next free version — valid for blind APPENDs;
        read-modify-write commits (merge/delete/overwrite) pass retries=0
        and re-run their whole transaction instead (optimistic concurrency
        with conflict detection at the file level)."""
        info = {"timestamp": int(time.time() * 1000), **info}
        payload = "".join(
            json.dumps(a, separators=(",", ":")) + "\n"
            for a in actions + [{"commitInfo": info}]
        )
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        v = version
        try:
            while True:
                target = os.path.join(self.log_dir, _fmt_version(v))
                try:
                    os.link(tmp, target)  # atomic put-if-absent
                    break
                except FileExistsError:
                    if v - version >= retries:
                        raise ConcurrentWriteError(
                            f"lost commit race for versions {version}..{v} at {self.path}"
                        )
                    v += 1
        finally:
            os.unlink(tmp)
        self._maybe_checkpoint(v)
        return v

    def _maybe_checkpoint(self, version: int) -> None:
        interval = int(
            self._replay(version).metadata.get("configuration", {}).get(
                "deltalite.checkpointInterval", "10"
            )
        )
        if version == 0 or version % interval != 0:
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        snap = self._replay(version)
        rows = (
            [{"action": json.dumps({"metaData": snap.metadata})}]
            + [{"action": json.dumps({"add": a})} for a in snap.adds.values()]
            + [
                {"action": json.dumps({"txn": {"appId": app, "version": tv}})}
                for app, tv in sorted(snap.txns.items())
            ]
        )
        cp_tmp = os.path.join(self.log_dir, f".tmp-cp-{uuid.uuid4().hex}")
        pq.write_table(pa.Table.from_pylist(rows), cp_tmp)
        os.replace(cp_tmp, os.path.join(self.log_dir, f"{version:020d}.checkpoint.parquet"))
        with open(os.path.join(self.log_dir, ".tmp-last"), "w") as f:
            json.dump({"version": version, "size": len(rows)}, f)
        os.replace(
            os.path.join(self.log_dir, ".tmp-last"),
            os.path.join(self.log_dir, "_last_checkpoint"),
        )

    # ----------------------------------------------------------- data files

    def _stat_cols(self, schema: T.StructType) -> list[str]:
        return [f.name for f in schema.fields if isinstance(f.dataType, _STATS_TYPES)]

    def _write_data_files(self, df: DataFrame, partition_by: list[str]) -> list[dict]:
        """Write ``df``'s rows as immutable parquet files inside the table
        dir (staged under a unique prefix so they are invisible until an
        ``add`` commits them) and return the add actions with footer stats."""
        stage = os.path.join(self.path, f".stage-{uuid.uuid4().hex}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(stage)
        stat_cols = self._stat_cols(df.schema)
        adds = []
        for dirpath, _, files in os.walk(stage):
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(dirpath, stage)
                part_vals = {}
                if rel_dir != ".":
                    for seg in rel_dir.split(os.sep):
                        k, _, val = seg.partition("=")
                        part_vals[k] = None if val == "__HIVE_DEFAULT_PARTITION__" else val
                new_name = f"part-{uuid.uuid4().hex}.parquet"
                rel_path = (
                    os.path.join(rel_dir, new_name) if rel_dir != "." else new_name
                )
                os.makedirs(
                    os.path.dirname(os.path.join(self.path, rel_path)) or self.path,
                    exist_ok=True,
                )
                src = os.path.join(dirpath, fname)
                stats = _footer_stats(src, stat_cols)
                os.rename(src, os.path.join(self.path, rel_path))
                adds.append(
                    {
                        "path": rel_path,
                        "partitionValues": part_vals,
                        "size": os.path.getsize(os.path.join(self.path, rel_path)),
                        "modificationTime": int(time.time() * 1000),
                        "dataChange": True,
                        "stats": json.dumps(stats),
                    }
                )
        shutil.rmtree(stage, ignore_errors=True)
        return adds

    def _check_schema(self, df: DataFrame, meta: dict) -> None:
        """Append-time schema enforcement (the ACID 'C'): field names and
        types must match the table schema exactly; evolution is an explicit
        metaData-updating operation, never an accidental side effect."""
        expected = T.StructType.fromJson(json.loads(meta["schemaString"]))
        got = df.schema
        if [(f.name, f.dataType) for f in expected.fields] != [
            (f.name, f.dataType) for f in got.fields
        ]:
            raise SchemaMismatchError(
                f"append schema {got.simpleString()} != table schema "
                f"{expected.simpleString()}"
            )

    def _evolve_schema(self, df: DataFrame, meta: dict) -> tuple[DataFrame, dict | None]:
        """Schema evolution (Delta's ``mergeSchema``): NEW df columns are
        appended to the table schema as nullable fields; table columns the
        df lacks are filled with nulls; common columns must match types
        exactly (widening is not implicit). Returns the aligned df and the
        updated metaData action (None when the schema is unchanged —
        old files simply read the missing new columns as null)."""
        expected = T.StructType.fromJson(json.loads(meta["schemaString"]))
        exp_types = {f.name: f.dataType for f in expected.fields}
        for f in df.schema.fields:
            if f.name in exp_types and f.dataType != exp_types[f.name]:
                raise SchemaMismatchError(
                    f"column {f.name}: {f.dataType.simpleString()} != table "
                    f"{exp_types[f.name].simpleString()} (no implicit widening)"
                )
        new_fields = [f for f in df.schema.fields if f.name not in exp_types]
        merged = T.StructType(
            list(expected.fields)
            + [T.StructField(f.name, f.dataType, True) for f in new_fields]
        )
        aligned = df.select(
            *[
                F.col(f.name)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in merged.fields
            ]
        )
        if not new_fields:
            return aligned, None
        new_meta = {**meta, "schemaString": merged.json()}
        return aligned, new_meta

    def _check_constraints(self, df: DataFrame, meta: dict) -> None:
        """CHECK constraints (``deltalite.constraints.<name>`` in the table
        configuration): every incoming row must satisfy every constraint
        expression, or the whole transaction is rejected BEFORE any file is
        staged — Delta's write-side invariant enforcement. One filtered
        limit(1) probe per constraint (a map-only scan, no shuffle)."""
        for k, expr in meta.get("configuration", {}).items():
            if not k.startswith("deltalite.constraints."):
                continue
            bad = df.filter(f"NOT ({expr})").limit(1).take(1)
            if bad:
                raise ConstraintViolationError(
                    f"CHECK constraint {k.rsplit('.', 1)[1]!r} ({expr}) "
                    f"violated, e.g. by row {bad[0].asDict()}"
                )

    def add_constraint(self, name: str, sql_expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT ... CHECK (expr): validates the
        CURRENT snapshot against the expression, then commits a metaData
        update. Future writes/merges enforce it."""
        snap = self._replay()
        current = self.snapshot()
        if current.filter(f"NOT ({sql_expr})").limit(1).take(1):
            raise ConstraintViolationError(
                f"existing rows violate CHECK ({sql_expr}); constraint not added"
            )
        meta = {
            **snap.metadata,
            "configuration": {
                **snap.metadata.get("configuration", {}),
                f"deltalite.constraints.{name}": sql_expr,
            },
        }
        return self._commit(
            snap.version + 1,
            [{"metaData": meta}],
            {"operation": "ADD CONSTRAINT", "name": name, "expr": sql_expr},
            retries=0,
        )

    # ------------------------------------------------------------ write ops

    def write(self, df: DataFrame, mode: str = "append", merge_schema: bool = False) -> int:
        """APPEND (blind — commutes with concurrent appends, auto-retries
        the commit) or OVERWRITE (removes every live file, read-modify-write
        → no blind retry). ``merge_schema=True`` evolves the table schema
        with the df's new columns in the same commit (a metaData action —
        note an evolving append is no longer blind: retries=0). Returns the
        committed version."""
        snap = self._replay()
        new_meta = None
        if merge_schema:
            df, new_meta = self._evolve_schema(df, snap.metadata)
        else:
            self._check_schema(df, snap.metadata)
        self._check_constraints(df, snap.metadata)
        adds = self._write_data_files(df, snap.metadata["partitionColumns"])
        now = int(time.time() * 1000)
        if mode == "append":
            actions = [{"add": a} for a in adds]
            retries = 20
        elif mode == "overwrite":
            actions = [
                {"remove": {"path": p, "deletionTimestamp": now, "dataChange": True}}
                for p in snap.adds
            ] + [{"add": a} for a in adds]
            retries = 0
        else:
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        if new_meta is not None:
            actions = [{"metaData": new_meta}] + actions
            retries = 0  # schema change is read-modify-write, never blind
        return self._commit(
            snap.version + 1,
            actions,
            {"operation": "WRITE", "mode": mode, "numFiles": len(adds)},
            retries=retries,
        )

    def merge(
        self,
        updates: DataFrame,
        keys: list[str] | None = None,
        txn_app: str | None = None,
        txn_version: int | None = None,
    ) -> int:
        """Copy-on-write MERGE (upsert) by key: update rows whose key
        matches, insert the rest — the Delta ``MERGE`` the reference's
        storage story implies (`glue/etl_api.py:25,38,49`).

        Data skipping: only files whose footer [min,max] key envelope
        intersects the update keys' envelope are read and rewritten;
        disjoint files carry over untouched (at 100 TB with a clustered
        merge key this touches a handful of files, not the table). The
        commit races as read-modify-write: a concurrent commit at our
        version aborts with ConcurrentWriteError; the caller re-runs
        against the fresh snapshot.

        ``txn_app``/``txn_version`` implement the protocol's SetTransaction
        (``txn``) action — the idempotent-writer contract a streaming
        foreachBatch sink needs: if this (appId, version) is at or below the
        log's recorded watermark the merge is a NO-OP (the batch already
        committed; a replay after checkpoint recovery must not double-apply),
        otherwise the commit carries the txn action that advances it.
        """
        snap = self._replay()
        if txn_app is not None:
            if txn_version is None:
                raise ValueError("txn_app requires txn_version")
            if txn_version <= snap.txns.get(txn_app, -1):
                return snap.version  # already applied: idempotent replay
        keys = keys or [
            k
            for k in snap.metadata["configuration"].get("deltalite.keys", "").split(",")
            if k
        ]
        if not keys:
            raise ValueError("merge needs keys= (none stored at create time)")
        self._check_schema(updates, snap.metadata)
        self._check_constraints(updates, snap.metadata)

        key_bounds = updates.agg(
            *[F.min(k).alias(f"lo_{k}") for k in keys],
            *[F.max(k).alias(f"hi_{k}") for k in keys],
        ).first()

        def comparable(stat, bound):
            """Coerce a JSON footer stat and a Spark-side bound into a pair
            that compares correctly in the key's DOMAIN, or None when not
            provably comparable (→ assume overlap, never wrongly skip).
            Decimal stats arrive as strings via _json_safe: parsed back with
            decimal.Decimal, never compared lexicographically; dates and
            timestamps compare as their ISO-ordered str() forms (identical
            format on both sides); a str stat against a numeric bound is NOT
            comparable."""
            if isinstance(stat, bool) or isinstance(bound, bool):
                return (stat, bound) if type(stat) is type(bound) else None
            if isinstance(stat, (int, float)):
                if isinstance(bound, (int, float, decimal.Decimal)):
                    return (stat, bound)
                return None
            if isinstance(stat, str):
                if isinstance(bound, decimal.Decimal):
                    try:
                        return (decimal.Decimal(stat), bound)
                    except decimal.InvalidOperation:
                        return None
                if isinstance(bound, (datetime.date, datetime.datetime)):
                    return (stat, str(bound))
                if isinstance(bound, str):
                    return (stat, bound)
                return None
            return None

        def overlaps(add: dict) -> bool:
            st = json.loads(add.get("stats") or "{}")
            mins, maxs = st.get("minValues", {}), st.get("maxValues", {})
            for k in keys:
                lo, hi = key_bounds[f"lo_{k}"], key_bounds[f"hi_{k}"]
                if lo is None:
                    continue
                flo, fhi = mins.get(k), maxs.get(k)
                if flo is None or fhi is None:
                    continue  # no stats → must assume overlap on this key
                hi_pair = comparable(fhi, lo)
                lo_pair = comparable(flo, hi)
                if hi_pair is None or lo_pair is None:
                    continue  # not domain-comparable → assume overlap (safe)
                if hi_pair[0] < hi_pair[1] or lo_pair[0] > lo_pair[1]:
                    return False
            return True

        touched = [a for a in snap.adds.values() if overlaps(a)]
        untouched = [a for a in snap.adds.values() if not overlaps(a)]
        if touched:
            current = self._read_files(snap, [a["path"] for a in touched])
            kept = current.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
            rewritten = kept.unionByName(updates)
        else:
            rewritten = updates
        adds = self._write_data_files(rewritten, snap.metadata["partitionColumns"])
        now = int(time.time() * 1000)
        actions = [
            {"remove": {"path": a["path"], "deletionTimestamp": now, "dataChange": True}}
            for a in touched
        ] + [{"add": a} for a in adds]
        if txn_app is not None:
            actions = [{"txn": {"appId": txn_app, "version": txn_version}}] + actions
        return self._commit(
            snap.version + 1,
            actions,
            {
                "operation": "MERGE",
                "numTargetFilesRewritten": len(touched),
                "numTargetFilesSkipped": len(untouched),
            },
            retries=0,
        )

    def delete_where(self, predicate_sql: str) -> int:
        """DELETE: rewrite only the files that contain matching rows (a
        per-file COUNT over the candidate set decides; files with zero
        matches carry over byte-identical)."""
        snap = self._replay()
        touched, adds = [], []
        for a in snap.adds.values():
            f = self._read_files(snap, [a["path"]])
            if f.filter(predicate_sql).limit(1).count() == 0:
                continue
            touched.append(a)
            survivors = f.filter(f"NOT ({predicate_sql})")
            adds.extend(
                self._write_data_files(survivors, snap.metadata["partitionColumns"])
            )
        now = int(time.time() * 1000)
        actions = [
            {"remove": {"path": a["path"], "deletionTimestamp": now, "dataChange": True}}
            for a in touched
        ] + [{"add": a} for a in adds]
        return self._commit(
            snap.version + 1,
            actions,
            {"operation": "DELETE", "numFilesRewritten": len(touched)},
            retries=0,
        )

    def optimize(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        cluster_by: list[str] | None = None,
    ) -> int:
        """OPTIMIZE: bin-pack small live files into ~``target_file_bytes``
        files, optionally clustering rows by ``cluster_by`` inside each
        rewritten file (linear multi-column sort — the clustering that makes
        footer-stat pruning in ``merge``/``delete_where`` selective; the
        interleaved variant lives in ``operators.layout.zorder_key``).

        Protocol semantics: rewrites commit with ``dataChange: false`` —
        readers see the identical row multiset (``change_data_feed`` across
        an OPTIMIZE is empty), and the commit races like any
        read-modify-write (retries=0 → ``ConcurrentWriteError`` → re-run
        against the fresh snapshot). Compaction never merges across
        partitionValues. Small-file candidacy is < target/2 (already-compact
        files carry over untouched) unless ``cluster_by`` forces a full
        recluster. Returns the committed version, or the current version
        untouched when there is nothing to do.

        At 100 TB this is the maintenance job that keeps scan task counts
        (and the driver's add-action replay) bounded after many incremental
        appends — log handling stays O(files) driver-side metadata; row data
        moves only through distributed scan+write jobs."""
        snap = self._replay()
        groups: dict[tuple, list[dict]] = {}
        for a in snap.adds.values():
            key = tuple(sorted((a.get("partitionValues") or {}).items()))
            groups.setdefault(key, []).append(a)
        removes, adds = [], []
        for files in groups.values():
            if cluster_by:
                # recluster the WHOLE partition: a GLOBAL range sort split
                # into ~target-size files gives every output file a DISJOINT
                # cluster-key envelope (per-bin sorting would leave every
                # file spanning the full range and defeat stat pruning)
                cand = sorted(files, key=lambda a: a["path"])
                total = sum(a["size"] for a in cand)
                n_out = max(1, -(-total // target_file_bytes))
                # sort key = (partition cols, cluster cols): within this
                # group the partition cols are constant, so the row order is
                # exactly cluster_by — but the prefix satisfies the file
                # writer's required ordering on partitionBy columns, so it
                # inserts NO sort of its own and the within-file cluster
                # order (disjoint min/max envelopes) survives (ADVICE r7).
                part_cols = snap.metadata["partitionColumns"]
                df = (
                    self._read_files(snap, [a["path"] for a in cand])
                    .repartitionByRange(n_out, *cluster_by)
                    .sortWithinPartitions(*part_cols, *cluster_by)
                )
                adds.extend(
                    self._write_data_files(df, snap.metadata["partitionColumns"])
                )
                removes.extend(cand)
                continue
            cand = sorted(
                (a for a in files if a["size"] < target_file_bytes // 2),
                key=lambda a: a["path"],
            )
            bins: list[list[dict]] = []
            cur: list[dict] = []
            cur_bytes = 0
            for a in cand:
                if cur and cur_bytes + a["size"] > target_file_bytes:
                    bins.append(cur)
                    cur, cur_bytes = [], 0
                cur.append(a)
                cur_bytes += a["size"]
            if cur:
                bins.append(cur)
            for b in bins:
                if len(b) < 2:
                    continue  # a lone small file gains nothing from rewrite
                df = self._read_files(snap, [a["path"] for a in b])
                new = self._write_data_files(
                    df.coalesce(1), snap.metadata["partitionColumns"]
                )
                removes.extend(b)
                adds.extend(new)
        if not removes:
            return snap.version
        now = int(time.time() * 1000)
        actions = [
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": now,
                    "dataChange": False,
                }
            }
            for a in removes
        ] + [{"add": {**a, "dataChange": False}} for a in adds]
        return self._commit(
            snap.version + 1,
            actions,
            {
                "operation": "OPTIMIZE",
                "numFilesRemoved": len(removes),
                "numFilesAdded": len(adds),
                "clusterBy": list(cluster_by or []),
            },
            retries=0,
        )

    # ------------------------------------------------------------- read ops

    def _read_files(self, snap: _Snapshot, rel_paths: list[str]) -> DataFrame:
        """Scan an explicit committed-file list. ``basePath`` lets Spark
        recover Hive-style partition columns (which the files themselves do
        not store) from the directory names — the reader-side equivalent of
        the protocol's ``partitionValues`` injection. Column pruning and
        predicate pushdown are unaffected: this is a plain parquet relation
        over an enumerated file set."""
        schema = T.StructType.fromJson(json.loads(snap.metadata["schemaString"]))
        reader = self.spark.read.schema(schema)
        if snap.metadata["partitionColumns"]:
            reader = reader.option("basePath", self.path)
        return reader.parquet(*[os.path.join(self.path, p) for p in rel_paths])

    def snapshot(
        self, version: int | None = None, timestamp: int | None = None
    ) -> DataFrame:
        """The committed view: current, ``VERSION AS OF`` or ``TIMESTAMP AS
        OF`` (latest commit at-or-before the epoch-millis timestamp)."""
        if timestamp is not None:
            if version is not None:
                raise ValueError("pass version OR timestamp, not both")
            hist = self.history()
            ok = [h["version"] for h in hist if h["timestamp"] <= timestamp]
            if not ok:
                raise ValueError(f"no commit at or before timestamp {timestamp}")
            version = max(ok)
        snap = self._replay(version)
        if not snap.adds:
            return self.spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(snap.metadata["schemaString"]))
            )
        return self._read_files(snap, [a["path"] for a in snap.adds.values()])

    def change_data_feed(
        self,
        from_version: int,
        to_version: int | None = None,
        keys: list[str] | None = None,
    ) -> DataFrame:
        """Row-level changes between two committed versions (Delta's
        ``table_changes`` surface): every table column plus
        ``_change_type`` ∈ {insert, delete, update_preimage,
        update_postimage} — updates emit BOTH the pre- and post-image row,
        exactly as the connector's CDF does. Computed by diffing the two
        snapshots (full-outer join on the merge keys, struct compare on the
        non-key columns), so it needs no per-commit change files and works
        across any version span, at the cost of reading both snapshots —
        the documented trade against the connector's stored CDF files.

        Scale shape: one shuffle on the key columns for the full-outer
        join; both sides are parquet scans with pruning intact. Unchanged
        rows are dropped before the result materializes."""
        snap = self._replay()
        keys = keys or [
            k
            for k in snap.metadata["configuration"].get("deltalite.keys", "").split(",")
            if k
        ]
        if not keys:
            raise ValueError("change_data_feed needs keys= (none stored at create)")
        pre = self.snapshot(version=from_version)
        post = self.snapshot(version=to_version)
        cols = pre.columns
        val_cols = [c for c in cols if c not in keys]
        joined = (
            pre.select(
                *[F.col(k).alias(f"k_{k}") for k in keys],
                F.struct(*cols).alias("pre"),
            )
            .join(
                post.select(
                    *[F.col(k).alias(f"k_{k}") for k in keys],
                    F.struct(*cols).alias("post"),
                ),
                on=[f"k_{k}" for k in keys],
                how="full_outer",
            )
        )
        changed = (
            F.col("pre").isNotNull()
            & F.col("post").isNotNull()
            & (
                F.struct(*[F.col(f"pre.{c}") for c in val_cols])
                != F.struct(*[F.col(f"post.{c}") for c in val_cols])
            )
        )
        image = joined.select(
            F.when(F.col("post").isNull(), F.lit("delete"))
            .when(F.col("pre").isNull(), F.lit("insert"))
            .when(changed, F.lit("update"))
            .alias("kind"),
            "pre",
            "post",
        ).filter(F.col("kind").isNotNull())
        pre_rows = image.filter(F.col("kind").isin("delete", "update")).select(
            F.when(F.col("kind") == "delete", F.lit("delete"))
            .otherwise(F.lit("update_preimage"))
            .alias("_change_type"),
            *[F.col(f"pre.{c}").alias(c) for c in cols],
        )
        post_rows = image.filter(F.col("kind").isin("insert", "update")).select(
            F.when(F.col("kind") == "insert", F.lit("insert"))
            .otherwise(F.lit("update_postimage"))
            .alias("_change_type"),
            *[F.col(f"post.{c}").alias(c) for c in cols],
        )
        return pre_rows.unionByName(post_rows)

    def history(self) -> list[dict]:
        """commitInfo per version, newest-last (``DESCRIBE HISTORY``)."""
        out = []
        for v in self._versions():
            with open(os.path.join(self.log_dir, _fmt_version(v))) as f:
                for line in f:
                    action = json.loads(line)
                    if "commitInfo" in action:
                        out.append({"version": v, **action["commitInfo"]})
        return out

    def num_live_files(self) -> int:
        return len(self._replay().adds)

    def vacuum(self, retention_ms: int = 7 * 24 * 3600 * 1000) -> int:
        """Physically delete data files no longer referenced by the CURRENT
        version and removed longer than ``retention_ms`` ago (time travel to
        vacuumed versions then fails, exactly as in the protocol). Returns
        the number of files deleted."""
        snap = self._replay()
        removed_at: dict[str, int] = {}
        for v in self._versions():
            with open(os.path.join(self.log_dir, _fmt_version(v))) as f:
                for line in f:
                    action = json.loads(line)
                    if "remove" in action:
                        removed_at[action["remove"]["path"]] = action["remove"][
                            "deletionTimestamp"
                        ]
        now = int(time.time() * 1000)
        n = 0
        for rel, ts in removed_at.items():
            if rel in snap.adds or now - ts < retention_ms:
                continue
            full = os.path.join(self.path, rel)
            if os.path.exists(full):
                os.unlink(full)
                n += 1
        return n


class ConcurrentWriteError(RuntimeError):
    """Lost an optimistic-concurrency race; re-run the transaction against
    the fresh snapshot."""


class SchemaMismatchError(ValueError):
    """Append/merge schema does not match the table schema."""


class ConstraintViolationError(ValueError):
    """A CHECK constraint rejected an incoming (or existing) row."""
