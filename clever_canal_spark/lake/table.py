"""LakeTable — a minimal Iceberg-like table format on parquet + a JSON log.

The sandbox has no Iceberg/Delta jars, so the engine carries its own lake
layer providing exactly the subset the CDC apply needs (on a real cluster
every call here maps 1:1 onto Iceberg: ``merge`` → ``MERGE INTO``,
``add/rename/widen_column`` → ``UpdateSchema``, ``version`` → snapshot id,
``committed_epochs`` → a snapshot summary property):

- **Atomic snapshot commits.** Each commit writes ``_log/v{N}.json`` via
  exclusive hard-link creation — two concurrent committers race on the same
  version and exactly one wins (optimistic concurrency, like Iceberg's
  metadata swap). Data files are immutable; a snapshot is a file list.
- **Bucket-partitioned copy-on-write MERGE.** Rows hash-bucket on the merge
  key's prefix (``url``); a merge only reads+rewrites the buckets touched by
  the source batch. At 100 TB with (say) 4096 buckets, an epoch touching 1%
  of keys rewrites ~1% of the table, not all of it — merge cost scales with
  the *changed* partitions. This replaces the reference's ring-buffer store
  (MemoryEventStoreWithBuffer.java:40-78): slots → buckets, the ack cursor →
  the committed-epoch set.
- **Exactly-once epochs.** Each snapshot carries the cumulative set of
  applied ``epoch_id``s with their LSN ranges; ``merge`` is a no-op for an
  already-committed epoch. Check and commit surround one atomic log-file
  create, so a replayed micro-batch (Spark retry after crash) applies 0-or-1
  times — the Spark restatement of Canal's ack/rollback protocol
  (CanalServerWithEmbedded.java:332-400, MemoryEventStoreWithBuffer.java:505-582).
- **Schema evolution by field id.** Columns have stable integer ids; rename
  is metadata-only, add backfills nulls at read, widen casts at read. Data
  files record the schema version they were written under; reads reconcile
  per-version file groups to the current schema (the TableMeta-TSDB analog:
  schema-as-of = snapshot's schema, MemoryTableMeta.java:67-88,
  DatabaseTableMeta.java:195-216).
- **Time travel.** ``scan(version=N)`` reads any retained snapshot.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from .fs import LocalFS, MetadataFS

_LOG_DIR = "_log"
_DATA_DIR = "data"
_REFS_DIR = "refs"  # under _LOG_DIR: named refs (tags) — _log/refs/{name}.json
# under _LOG_DIR: per-commit bloom-filter sidecars (the Iceberg Puffin
# analog) — _log/blooms/{commit_id}.json maps data-file basename →
# {"m", "k", "bits": base64 bitmap}. Sidecars stay OUT of the snapshot
# JSON (which is rewritten whole every commit) and are immutable once
# written, so readers cache them by path.
_BLOOM_DIR = "blooms"
_BLOOM_MIN_BITS = 1 << 10  # floor: tiny files still get a useful filter
_BLOOM_MAX_BITS = 1 << 19  # cap: 64 KiB bitmap per file (sidecar growth)
_BRANCH_DIR = "_branches"  # WAP branches live INSIDE the table dir (lake/wap.py)
_REF_NAME = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]{0,63}")

# Allowed type widenings (ref: unsigned promotion ladder,
# LogEventConvert.java:694-725 — tiny→smallint→int→bigint→decimal).
_WIDEN_OK = {
    ("int", "bigint"),
    ("int", "double"),
    ("bigint", "double"),
    ("float", "double"),
    ("int", "decimal(38,0)"),
    ("bigint", "decimal(38,0)"),
}


def _validate_default(value, dtype: str):
    """Coerce an initial-default literal to a JSON-storable Python value
    of the column's type class, or raise — the add_column-time guard that
    keeps a malformed DDL DEFAULT from becoming a read-time ANSI-cast
    poison pill in every later scan."""
    base = dtype.split("(")[0].strip().lower()
    try:
        if base in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
            return int(value)
        if base in ("float", "double", "real"):
            return float(value)
        if base in ("decimal", "numeric"):
            float(value)  # parseable; keep the string — no precision loss
            return str(value)
        if base == "boolean":
            s = str(value).strip().lower()
            if s in ("true", "1"):
                return True
            if s in ("false", "0"):
                return False
            raise ValueError(s)
        if base in ("timestamp", "date", "timestamp_ntz"):
            s = str(value).strip()
            if not re.match(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2}(\.\d+)?)?$", s):
                raise ValueError(s)
            return s
        return str(value)
    except (TypeError, ValueError) as e:
        raise ValueError(
            f"illegal DEFAULT {value!r} for type {dtype}: {e}"
        ) from None


def _key_range_pred(values: list):
    """Manifest-entry predicate for point reads: keep a file iff its
    footer-recorded bucket-key range [key_min, key_max] covers ANY probe
    value. Files without stats (pre-stats snapshots, driver pylist
    appends) and type-mismatched probes are always kept — pruning must
    never be wrong, only incomplete."""
    def pred(f: dict) -> bool:
        lo, hi = f.get("key_min"), f.get("key_max")
        if lo is None or hi is None:
            return True
        try:
            return any(lo <= v <= hi for v in values)
        except TypeError:
            return True
    return pred


def _zbase_expr(col: str, dtype: str) -> str:
    """Order-preserving BIGINT image of a column for z-value computation:
    timestamps → epoch micros, strings → first-4-chars big-endian byte
    code (ASCII-clamped), integers as-is."""
    if dtype.startswith("timestamp"):
        return f"unix_micros({col})"
    if dtype == "string":
        return (
            "aggregate(transform(sequence(1, 4), i -> "
            f"shiftleft(CAST(least(coalesce(ascii(substring({col}, i, 1)), 0), 255) AS BIGINT), (4 - i) * 8)), "
            "CAST(0 AS BIGINT), (a, x) -> a + x)"
        )
    return f"CAST({col} AS BIGINT)"


def _zvalue_expr(norm_exprs: list[str], bits: int = 16) -> str:
    """Bit-interleave N ``bits``-bit normalized values into one z-order key.

    Interleaved positions must stay below bit 63: position 63 is the BIGINT
    sign bit (rows with the largest z-value would sort FIRST), and Spark's
    shiftleft wraps distances mod 64 (positions ≥64 would collide with low
    bits). Callers size ``bits`` via :func:`_zorder_bits`; asserted here so
    a future caller cannot silently produce a garbage layout."""
    ncols = len(norm_exprs)
    if bits * ncols > 63:
        raise ValueError(
            f"z-value would need bit {bits * ncols - 1} (>62): "
            f"{ncols} columns x {bits} bits — reduce bits per column"
        )
    terms = [
        f"shiftleft(shiftright({e}, {b}) & 1, {b * ncols + j})"
        for b in range(bits)
        for j, e in enumerate(norm_exprs)
    ]
    return " + ".join(terms)


def _zorder_bits(ncols: int) -> int:
    """Bits per column so the interleaved key fits in 63 bits (sign bit
    untouched): 16 for <=3 columns, 15 for 4, 12 for 5, ..."""
    if ncols > 31:
        raise ValueError(f"z-order over {ncols} columns is meaningless (max 31)")
    return min(16, 63 // ncols)


def _footer_col_range(md, idx: dict, col: str):
    """[lo, hi] of ``col`` across a parquet file's row groups, from the
    already-open footer — or None when any row group lacks stats or the
    type isn't a JSON-representable totally-ordered scalar (pruning must
    be incomplete, never wrong). Timestamps normalize to epoch micros."""
    import datetime as _dt

    ci = idx.get(col)
    if ci is None:
        return None
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(ci).statistics
        mn = mx = None
        if st is not None and st.has_min_max:
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    mn = mx = None
            if isinstance(mn, _dt.datetime):
                mn = int((mn if mn.tzinfo else mn.replace(tzinfo=_dt.timezone.utc)).timestamp() * 1_000_000)
                mx = int((mx if mx.tzinfo else mx.replace(tzinfo=_dt.timezone.utc)).timestamp() * 1_000_000)
            if not isinstance(mn, (str, int, float)) or isinstance(mn, bool):
                mn = mx = None
        if mn is None:
            return None
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    return [lo, hi]


def _bucket_pick(files: list[dict], buckets: set[int] | None, cur_nb: int) -> list[dict]:
    """Filter manifest entries to those that can hold rows of the given
    CURRENT-spec bucket ids, honoring each file's own bucket spec.

    Lazy partition evolution (the Iceberg bucket-transform spec-change
    analog): after :meth:`LakeTable.rebucket`, old files carry ``nb`` =
    the bucket count they were written under. ``bucket = pmod(hash, nb)``
    nests across multiple/divisor counts — ``h mod a == (h mod ka) mod a``
    — so pruning stays EXACT across a spec change:

    - file coarser (cur_nb % nb == 0): the file holds rows of current
      buckets ≡ file.bucket (mod nb) — keep iff any probe bucket matches.
    - file finer (nb % cur_nb == 0): all its rows land in current bucket
      file.bucket mod cur_nb.
    - incompatible chain (only reachable via repeated rebuckets through
      non-nesting counts): never prune — incomplete, never wrong.
    """
    if buckets is None:
        return files
    residues: dict[int, set[int]] = {}
    out = []
    for f in files:
        nb = f.get("nb") or cur_nb
        if nb == cur_nb:
            if f["bucket"] in buckets:
                out.append(f)
        elif cur_nb % nb == 0:
            r = residues.get(nb)
            if r is None:
                r = residues[nb] = {b % nb for b in buckets}
            if f["bucket"] in r:
                out.append(f)
        elif nb % cur_nb == 0:
            if f["bucket"] % cur_nb in buckets:
                out.append(f)
        else:
            out.append(f)
    return out


def _buckets_of(files: list[dict], cur_nb: int) -> set[int]:
    """The set of CURRENT-spec bucket ids the given manifest entries can
    contain rows of (inverse of :func:`_bucket_pick` — used to expand a
    mixed-spec delta set into the buckets compaction must reconcile)."""
    buckets: set[int] = set()
    for f in files:
        nb = f.get("nb") or cur_nb
        if nb == cur_nb:
            buckets.add(f["bucket"])
        elif cur_nb % nb == 0:
            buckets.update(f["bucket"] + j * nb for j in range(cur_nb // nb))
        elif nb % cur_nb == 0:
            buckets.add(f["bucket"] % cur_nb)
        else:
            return set(range(cur_nb))
    return buckets


class CommitConflict(RuntimeError):
    """Another writer committed the target snapshot version first."""


# committed-epoch registry depth: the most recent N DISTINCT epoch ids
# (counting an epoch's DDL segments "e:i" with their parent e) kept
# verbatim; older entries collapse into the epoch_watermark. This bounds
# per-commit snapshot metadata at O(N) however long the table lives —
# the contract a per-micro-batch sync loop needs — while keeping an
# idempotent-replay window far deeper than any crash can reach (replays
# only ever target the in-flight epoch; Spark streaming epoch ids and
# the views' consumed-lake-version ids are both monotone).
_EPOCH_RETENTION = 512


def _epoch_prefix(key) -> int | None:
    """The numeric epoch id of a registry key ('7' and '7:0' -> 7);
    None for non-numeric keys (never pruned)."""
    try:
        return int(str(key).split(":", 1)[0])
    except ValueError:
        return None


def _prune_epoch_registry(
    epochs: dict, watermark: int, wm_lsn_max
) -> "tuple[dict, int, int | None]":
    """Collapse all but the newest ``_EPOCH_RETENTION`` distinct numeric
    epoch ids into the watermark (every id <= watermark is committed);
    fold the pruned entries' lsn_max into the preserved frontier."""
    prefixes = sorted({p for k in epochs if (p := _epoch_prefix(k)) is not None})
    if len(prefixes) <= _EPOCH_RETENTION:
        return epochs, watermark, wm_lsn_max
    cut = prefixes[-_EPOCH_RETENTION]  # keep ids >= cut
    kept, pruned_lsns = {}, []
    for k, lin in epochs.items():
        p = _epoch_prefix(k)
        if p is None or p >= cut:
            kept[k] = lin
        elif isinstance(lin, dict) and lin.get("lsn_max") is not None:
            pruned_lsns.append(lin["lsn_max"])
    new_wm = max(watermark, prefixes[-_EPOCH_RETENTION - 1])
    if wm_lsn_max is not None:
        pruned_lsns.append(wm_lsn_max)
    return kept, new_wm, (max(pruned_lsns) if pruned_lsns else None)


class SnapshotExpired(RuntimeError):
    """An incremental read (``scan_changes`` / ``truncates_between``)
    reached a snapshot that ``expire_snapshots`` already deleted — the
    consumer's cursor is older than the table's retention window. The
    changelog between cursor and the oldest retained snapshot is gone;
    the consumer must REBUILD from current state (e.g.
    ``build_dedup_index_from_lake``) instead of tailing. Same contract
    as Iceberg's incremental source past expired snapshots."""


def _arrow_type(ddl: str):
    import pyarrow as pa

    return {
        "string": pa.string(),
        "binary": pa.binary(),
        "long": pa.int64(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "boolean": pa.bool_(),
    }[ddl]


@dataclass
class MergeResult:
    applied: bool
    version: int | None = None
    touched_buckets: int = 0
    rows_written: int = 0


@dataclass
class _Snapshot:
    version: int
    parent: int | None
    schema_version: int
    schemas: dict[str, list[dict]]  # schema_version(str) -> [{id,name,type}]
    n_buckets: int
    bucket_key: list[str]
    merge_key: list[str]
    files: list[dict]  # {path, bucket, rows, schema_version}
    committed_epochs: dict[str, dict] = field(default_factory=dict)
    operation: str = "commit"
    committed_at_ms: int = 0
    # committed-epoch registry compaction (bounded snapshot metadata):
    # every epoch whose NUMERIC PREFIX (the int before any ':' segment
    # suffix) is <= epoch_watermark was committed and has been PRUNED
    # from committed_epochs — the registry carries only the most recent
    # _EPOCH_RETENTION distinct epochs, so a continuous sync loop
    # (rollup/sketch views commit one entry per consumed lake version)
    # cannot grow every subsequent snapshot's JSON without bound.
    # -1 = nothing pruned yet (0 is a real epoch id).
    # epoch_watermark_lsn_max preserves the applied-LSN frontier of the
    # pruned entries for FeedFollower.lag().
    epoch_watermark: int = -1
    epoch_watermark_lsn_max: int | None = None
    # merge-on-read deltas (Iceberg-v2-style): winner rows w/ __lsn/__op,
    # reconciled against base files at scan time, folded in by compact()
    delta_files: list[dict] = field(default_factory=list)
    # TRUNCATE watermark: highest feed LSN at which the table was truncated
    # (0 = never). merge() drops source rows at-or-below it so a lagging
    # shard cannot resurrect pre-truncate state (same rule that keeps
    # pre-snapshot events losing to a bootstrap seed).
    truncate_lsn: int = 0
    # extra columns whose per-file [min, max] is recorded in the manifest
    # (beyond the bucket key's key_min/key_max) — the Iceberg column-stats
    # analog powering scan_where's file-level pruning. Timestamps store as
    # epoch micros.
    stats_cols: list = field(default_factory=list)
    # >0 enables per-file bloom filters on the bucket key's first column
    # (the Iceberg Puffin / Delta bloom-index analog). MOR delta files hold
    # keys in LSN-arrival order, so their [key_min, key_max] spans nearly
    # the whole keyspace and range pruning keeps every delta file; the
    # bloom is what lets a point read skip the delta files that provably
    # don't contain the probe key between compactions. Value = bits per
    # key (~10 → ≈1% false-positive rate); bitmaps live in per-commit
    # sidecar files under _log/blooms/, never in the snapshot JSON.
    bloom_bits_per_key: int = 0

    def to_json(self) -> str:
        return json.dumps(self.__dict__, separators=(",", ":"))

    @staticmethod
    def from_json(s: str) -> "_Snapshot":
        return _Snapshot(**json.loads(s))

    def current_fields(self) -> list[dict]:
        return self.schemas[str(self.schema_version)]

    def spark_schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f["name"], T.DataType.fromDDL(f["type"])) for f in self.current_fields()]
        )


class LakeTable:
    """One lake table rooted at ``path``.

    ``fs`` (a :class:`~clever_canal_spark.lake.fs.MetadataFS`, default
    :class:`~clever_canal_spark.lake.fs.LocalFS`) carries every
    metadata/manifest filesystem operation — snapshot log, data-file
    moves, footer reads, GC — so the log can live on an object store
    (ArrowFS) once the store provides the atomic-commit primitive; the
    data plane itself rides Spark's Hadoop filesystem via the path
    scheme, exactly as Iceberg's would."""

    def __init__(self, spark: SparkSession, path: str, fs: "MetadataFS | None" = None):
        self.spark = spark
        # absolutize ONLY schemeless local paths: a URI like s3://bucket/t
        # (or any non-default MetadataFS target) must pass through verbatim
        # — abspath would rewrite it into a bogus local key space
        self.path = (
            path if "://" in path or fs is not None else os.path.abspath(path)
        )
        self._log_path = os.path.join(self.path, _LOG_DIR)
        self._data_path = os.path.join(self.path, _DATA_DIR)
        self._fs: MetadataFS = fs or LocalFS()
        # bloom sidecars are immutable once written → cache decoded
        # bitmaps per sidecar path for the life of this handle
        self._bloom_sidecars: dict[str, dict] = {}

    # -- lifecycle ---------------------------------------------------------

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        merge_key: list[str],
        bucket_key: list[str] | None = None,
        n_buckets: int = 16,
        fs: "MetadataFS | None" = None,
        stats_cols: list[str] | None = None,
        bloom_bits_per_key: int = 0,
    ) -> "LakeTable":
        """Create an empty table. ``bucket_key`` defaults to the first merge
        key column — bucketing on the key *prefix* colocates all versions of
        an entity while keeping the bucket computable from either key form.
        ``stats_cols``: extra columns whose per-file [min, max] goes in the
        manifest (:meth:`scan_where` pruning); changeable later via
        :meth:`set_stats_cols`. ``bloom_bits_per_key`` > 0 records a per-file
        bloom filter on the bucket key at every write (:meth:`lookup` /
        :meth:`scan_for_keys` file skipping); changeable later via
        :meth:`set_bloom`."""
        t = LakeTable(spark, path, fs=fs)
        t._fs.makedirs(t._log_path)
        t._fs.makedirs(t._data_path)
        fields = [
            {"id": i, "name": f.name, "type": f.dataType.simpleString()}
            for i, f in enumerate(schema.fields)
        ]
        snap = _Snapshot(
            version=1,
            parent=None,
            schema_version=0,
            schemas={"0": fields},
            n_buckets=n_buckets,
            bucket_key=bucket_key or merge_key[:1],
            merge_key=list(merge_key),
            files=[],
            operation="create",
            committed_at_ms=int(time.time() * 1000),
            stats_cols=list(stats_cols or []),
            bloom_bits_per_key=int(bloom_bits_per_key),
        )
        t._write_snapshot(snap)
        return t

    def exists(self) -> bool:
        return self._fs.isdir(self._log_path) and self.current_version() > 0

    # -- snapshot log ------------------------------------------------------

    def current_version(self) -> int:
        try:
            names = self._fs.listdir(self._log_path)
        except FileNotFoundError:
            return 0
        versions = [int(n[1:9]) for n in names if n.startswith("v") and n.endswith(".json")]
        return max(versions, default=0)

    def snapshot(self, version: int | None = None) -> _Snapshot:
        v = version if version is not None else self.current_version()
        return _Snapshot.from_json(
            self._fs.read_text(os.path.join(self._log_path, f"v{v:08d}.json"))
        )

    def _write_snapshot(self, snap: _Snapshot) -> None:
        """Atomic exclusive commit via the fs seam (LocalFS: write-tmp +
        hard-link, EEXIST if another writer won the race — optimistic
        concurrency; object stores substitute their conditional PUT)."""
        final = os.path.join(self._log_path, f"v{snap.version:08d}.json")
        try:
            self._fs.write_text_exclusive(final, snap.to_json())
        except FileExistsError as e:
            raise CommitConflict(f"version {snap.version} already committed") from e

    def _child(self, parent: _Snapshot, **overrides) -> _Snapshot:
        d = dict(parent.__dict__)
        d.update(
            version=parent.version + 1,
            parent=parent.version,
            committed_at_ms=int(time.time() * 1000),
        )
        d.update(overrides)
        if len(d["committed_epochs"]) > _EPOCH_RETENTION:
            d["committed_epochs"], d["epoch_watermark"], d["epoch_watermark_lsn_max"] = (
                _prune_epoch_registry(
                    d["committed_epochs"],
                    d["epoch_watermark"],
                    d["epoch_watermark_lsn_max"],
                )
            )
        return _Snapshot(**d)

    # -- schema ------------------------------------------------------------

    def schema(self, version: int | None = None) -> T.StructType:
        return self.snapshot(version).spark_schema()

    def _evolve(self, mutate, operation: str) -> int:
        snap = self.snapshot()
        fields = [dict(f) for f in snap.current_fields()]
        new_fields = mutate(fields)
        new_sv = snap.schema_version + 1
        schemas = dict(snap.schemas)
        schemas[str(new_sv)] = new_fields
        child = self._child(snap, schema_version=new_sv, schemas=schemas, operation=operation)
        self._write_snapshot(child)
        return child.version

    def add_column(self, name: str, dtype: str, default=None) -> int:
        """ADD COLUMN — metadata-only; old files read the column as null,
        or as ``default`` when given (Iceberg v3 *initial-default*
        semantics: rows written BEFORE the column existed read the
        default; files written after carry real values — an explicit
        null stays null). The default is validated driver-side at DDL
        time, never lazily at read time, so a bad literal fails the DDL
        apply instead of poisoning every later scan under ANSI casts.

        The new field id is allocated above every id EVER used (all schema
        versions, not just the current one) — after a DROP COLUMN, reusing
        the dropped id would resurrect the old files' dropped bytes into
        the new column (Iceberg's field-id freshness rule)."""
        snap = self.snapshot()
        next_id = 1 + max(
            f["id"] for fields in snap.schemas.values() for f in fields
        )
        if default is not None:
            default = _validate_default(default, dtype)

        def mutate(fields):
            if not name or not isinstance(name, str):
                raise ValueError(f"invalid column name {name!r}")
            if any(f["name"] == name for f in fields):
                raise ValueError(f"column {name} exists")
            field = {"id": next_id, "name": name, "type": dtype}
            if default is not None:
                field["initial_default"] = default
            return fields + [field]

        return self._evolve(mutate, f"add_column:{name}")

    def set_default(self, name: str, value) -> int:
        """``ALTER COLUMN x SET DEFAULT v`` / ``DROP DEFAULT`` — metadata-
        only change of the column's WRITE default (the fill value for
        merge sources omitting the column; the reference's TableMeta
        tracks it as per-field ``defaultValue``, TableMeta.java:23-126).
        ``value=None`` clears it (DROP DEFAULT / SET DEFAULT NULL): the
        explicit ``write_default: null`` entry overrides any add-time
        initial-default in the fill path. The frozen ``initial_default``
        is deliberately untouched — files written before the column
        existed keep reading the value the column was BORN with, so a
        default change never rewrites history (MySQL and Iceberg-v3 agree
        on that semantics)."""
        def mutate(fields):
            hit = [f for f in fields if f["name"] == name]
            if not hit:
                raise ValueError(f"no column {name}")
            hit[0]["write_default"] = (
                None if value is None else _validate_default(value, hit[0]["type"])
            )
            return fields

        return self._evolve(mutate, f"set_default:{name}")

    def drop_column(self, name: str) -> int:
        """DROP COLUMN — metadata-only (Iceberg ``deleteColumn`` analog):
        the field id leaves the current schema, so every read projects the
        column away; old data files keep the bytes but no schema maps them.
        A later ADD COLUMN of the same name allocates a FRESH field id —
        dropped data is never resurrected (see :meth:`add_column`)."""
        snap = self.snapshot()
        protected = set(snap.merge_key) | set(snap.bucket_key)
        if name in protected:
            raise ValueError(f"cannot drop key/bucket column {name}")

        def mutate(fields):
            if not any(f["name"] == name for f in fields):
                raise ValueError(f"no column {name}")
            return [f for f in fields if f["name"] != name]

        return self._evolve(mutate, f"drop_column:{name}")

    def rename_column(self, old: str, new: str) -> int:
        """RENAME COLUMN — metadata-only via stable field ids."""

        def mutate(fields):
            hit = [f for f in fields if f["name"] == old]
            if not hit:
                raise ValueError(f"no column {old}")
            if any(f["name"] == new for f in fields):
                raise ValueError(f"column {new} exists")
            hit[0]["name"] = new
            return fields

        return self._evolve(mutate, f"rename_column:{old}->{new}")

    def widen_column(self, name: str, new_type: str) -> int:
        """Widen a column's type (int→bigint, float→double, …); old files
        cast at read. Narrowing is rejected."""

        def mutate(fields):
            hit = [f for f in fields if f["name"] == name]
            if not hit:
                raise ValueError(f"no column {name}")
            old_type = hit[0]["type"]
            if old_type != new_type and (old_type, new_type) not in _WIDEN_OK:
                raise ValueError(f"illegal widen {old_type} -> {new_type}")
            hit[0]["type"] = new_type
            return fields

        return self._evolve(mutate, f"widen_column:{name}")

    # -- read --------------------------------------------------------------

    def _bucket_col(self, snap: _Snapshot) -> Column:
        return F.pmod(F.xxhash64(*[F.col(c) for c in snap.bucket_key]), F.lit(snap.n_buckets))

    def _read_files(
        self, snap: _Snapshot, files: list[dict], hidden: bool = False
    ) -> DataFrame:
        """Read a file list reconciled to the snapshot's current schema.

        Files are grouped by the schema version they were written under; each
        group is read once and projected to the current schema by field id
        (missing → null, renamed → alias, widened → cast), then unioned.
        ``hidden=True`` also carries the MOR bookkeeping columns ``__lsn``/
        ``__op`` (defaulted to -1/'U' for files written without them).
        """
        cur = snap.current_fields()
        schema = snap.spark_schema()
        if hidden:
            schema = T.StructType(
                schema.fields
                + [T.StructField("__lsn", T.LongType()), T.StructField("__op", T.StringType())]
            )
        if not files:
            return self.spark.createDataFrame([], schema)
        by_sv: dict[int, list[str]] = {}
        for f in files:
            by_sv.setdefault(f["schema_version"], []).append(
                os.path.join(self.path, f["path"])
            )
        parts = []
        for sv, paths in by_sv.items():
            old = {f["id"]: f for f in snap.schemas[str(sv)]}
            df = self.spark.read.parquet(*paths)
            proj = []
            for f in cur:
                o = old.get(f["id"])
                if o is None:
                    # field didn't exist when these files were written —
                    # initial-default (Iceberg v3) or null
                    dv = f.get("initial_default")
                    proj.append(F.lit(dv).cast(f["type"]).alias(f["name"]))
                else:
                    proj.append(F.col(o["name"]).cast(f["type"]).alias(f["name"]))
            if hidden:
                have = set(df.columns)
                proj.append(
                    (F.col("__lsn") if "__lsn" in have else F.lit(-1).cast("long")).alias("__lsn")
                )
                proj.append(
                    (F.col("__op") if "__op" in have else F.lit("U")).alias("__op")
                )
            parts.append(df.select(*proj))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _reconciled(
        self,
        snap: _Snapshot,
        buckets: set[int] | None = None,
        keep_deletes: bool = False,
        file_pred=None,
    ) -> DataFrame:
        """Base ∪ deltas folded to current state, hidden cols retained.

        LWW per merge key by ``__lsn`` (base rows written without an LSN
        rank below any delta). The winner filter is a (key, lsn) semi-join
        against a tiny max-lsn aggregate — the payload never rides the
        dedup shuffle. ``keep_deletes=True`` retains delete-winner rows as
        tombstones (needed by compaction and COW reconcile so a late
        lower-LSN upsert cannot resurrect a deleted key).

        ``file_pred(entry) -> bool`` skips manifest entries entirely
        (key-range stats pruning). ONLY safe when the caller filters the
        result to keys the skipped files provably cannot contain — the
        per-key LWW winner is unaffected by dropping files without that
        key (all of a key's rows share one bucket and one file set)."""
        def pick(files):
            out = _bucket_pick(files, buckets, snap.n_buckets)
            return out if file_pred is None else [f for f in out if file_pred(f)]

        base_files = pick(snap.files)
        base = self._read_files(snap, base_files, hidden=True)
        deltas = pick(snap.delta_files)
        if not deltas:
            winners = base
        else:
            delta = self._read_files(snap, deltas, hidden=True)
            both = base.unionByName(delta)
            key = snap.merge_key
            wins = both.groupBy(*key).agg(F.max("__lsn").alias("__lsn"))
            # the winner set is at most one row per key — when manifest row
            # counts bound it under ~5M, broadcast it so the PAYLOAD side
            # never shuffles (file counts come from parquet footers at
            # write time; None = pre-upgrade files → stay conservative)
            counts = [f.get("rows") for f in base_files + deltas]
            if all(c is not None for c in counts) and sum(counts) <= 5_000_000:
                wins = F.broadcast(wins)
            winners = both.join(wins, on=key + ["__lsn"], how="left_semi")
        if keep_deletes:
            return winners
        return winners.filter(F.col("__op") != "D")

    def scan(self, version: int | None = None, ref: str | None = None) -> DataFrame:
        """Current (or time-travel) table state as a DataFrame.

        ``ref`` time-travels by tag name (``scan(ref="pre-migration")``),
        mutually exclusive with ``version``.

        Always filters tombstone rows (``__op = 'D'``): COW merges and
        compaction retain delete winners in data files so out-of-order
        (multi-shard) replay stays LWW-correct; the live view hides them.
        Files written without hidden cols read as ``__op = 'U'`` and the
        filter folds away."""
        if ref is not None:
            if version is not None:
                raise ValueError("pass version or ref, not both")
            version = self.resolve_ref(ref)
        # expired time travel raises SnapshotExpired, not a bare
        # FileNotFoundError — same contract as scan_changes
        snap = self.snapshot() if version is None else self._snapshot_retained(version)
        cols = [f["name"] for f in snap.current_fields()]
        if snap.delta_files:
            return self._reconciled(snap).select(*cols)
        return (
            self._read_files(snap, snap.files, hidden=True)
            .filter(F.col("__op") != F.lit("D"))
            .select(*cols)
        )

    def set_stats_cols(self, cols: list[str]) -> int:
        """Change the manifest stats-column list — metadata-only; files
        written BEFORE this carry no stats for the new columns (they are
        always read: pruning incomplete, never wrong) and pick them up at
        their next rewrite (compaction / COW / migrate)."""
        snap = self.snapshot()
        names = {f["name"] for f in snap.current_fields()}
        unknown = sorted(set(cols) - names)
        if unknown:
            raise ValueError(f"unknown stats column(s) {unknown}")
        child = self._child(
            snap, stats_cols=list(cols), operation=f"set-stats-cols:{','.join(cols)}"
        )
        self._write_snapshot(child)
        return child.version

    def set_bloom(self, bits_per_key: int) -> int:
        """Enable (>0) or disable (0) per-file bucket-key bloom filters —
        metadata-only, same contract as :meth:`set_stats_cols`: files
        written BEFORE this carry no bloom (they are always read: pruning
        incomplete, never wrong) and pick one up at their next rewrite
        (compaction / COW / migrate)."""
        if bits_per_key < 0:
            raise ValueError("bits_per_key must be >= 0")
        snap = self.snapshot()
        child = self._child(
            snap,
            bloom_bits_per_key=int(bits_per_key),
            operation=f"set-bloom:{bits_per_key}",
        )
        self._write_snapshot(child)
        return child.version

    @staticmethod
    def _stats_bound(v):
        """Normalize a scan_where bound the way the manifest stores stats
        (timestamps → epoch micros)."""
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            tz = v if v.tzinfo else v.replace(tzinfo=_dt.timezone.utc)
            return int(tz.timestamp() * 1_000_000)
        return v

    def scan_where(self, col: str, lo=None, hi=None) -> DataFrame:
        """Range scan with FILE-LEVEL pruning on any stats column (the
        Iceberg lower/upper-bound scan-planning analog, generalized past
        the bucket key): manifest entries whose recorded [min, max] for
        ``col`` misses [lo, hi] are never opened; the predicate is also
        applied in-plan (and pushes into the parquet scan for row-group
        skipping inside the files that ARE read).

        Pruning applies only when the table has no MOR delta files: base
        files hold ≤ 1 winner row per key, so dropping a file by VALUE
        range cannot change any key's LWW outcome — with deltas pending, a
        skipped file could hold the true (out-of-range) winner and a read
        loser would wrongly surface, so the call falls back to an unpruned
        reconciled scan (same results, no file skipping). Run compact()
        first for pruned analytics. Timestamp bounds accept datetime.

        One-column delegate of :meth:`scan_where_ranges` — one pruning
        rule, not two copies that can drift.
        """
        return self.scan_where_ranges({col: (lo, hi)})

    def scan_where_ranges(self, ranges: dict[str, tuple]) -> DataFrame:
        """Multi-column :meth:`scan_where`: ``{col: (lo, hi)}`` (either
        bound None for open) — a file is read only if EVERY column's
        recorded [min, max] overlaps its bound, so a Z-ordered table
        (``compact(zorder_cols=…)``) prunes on the conjunction. Same
        delta-pending fallback rule as scan_where."""
        snap = self.snapshot()
        names = {f["name"] for f in snap.current_fields()}
        unknown = sorted(set(ranges) - names)
        if unknown:
            raise ValueError(f"unknown column(s) {unknown}")
        pred = None
        for col, (lo, hi) in ranges.items():
            if lo is not None:
                p = F.col(col) >= F.lit(lo)
                pred = p if pred is None else (pred & p)
            if hi is not None:
                p = F.col(col) <= F.lit(hi)
                pred = p if pred is None else (pred & p)
        if snap.delta_files:
            out = self.scan()
            return out.filter(pred) if pred is not None else out
        bounds = {
            c: (self._stats_bound(lo), self._stats_bound(hi))
            for c, (lo, hi) in ranges.items()
        }

        def keep(f: dict) -> bool:
            for col, (b_lo, b_hi) in bounds.items():
                st = (f.get("col_stats") or {}).get(col)
                if st is None and col == snap.bucket_key[0] and f.get("key_min") is not None:
                    st = [f["key_min"], f["key_max"]]
                if st is None:
                    continue  # no stats for this column: cannot prune on it
                try:
                    if b_lo is not None and st[1] < b_lo:
                        return False
                    if b_hi is not None and st[0] > b_hi:
                        return False
                except TypeError:
                    continue
            return True

        cols = [f["name"] for f in snap.current_fields()]
        files = [f for f in snap.files if keep(f)]
        out = (
            self._read_files(snap, files, hidden=True)
            .filter(F.col("__op") != F.lit("D"))
            .select(*cols)
        )
        return out.filter(pred) if pred is not None else out

    def lookup(self, **key_vals) -> DataFrame:
        """Point read by bucket-key value(s): computes the key's bucket and
        reconciles ONLY that bucket's files — an O(table/n_buckets) read
        instead of a table scan (the primary consumer op on a CDC table:
        'current row for this url'). Non-bucket merge-key columns may be
        included and filter normally.

        The bucket id is computed by a 1-row Spark job so it uses the
        exact xxhash64 the writer used (no driver-side reimplementation).
        Within the bucket, files whose footer-recorded [key_min, key_max]
        range excludes the probe value are skipped entirely (the Iceberg
        lower/upper-bound pruning analog) — a hot bucket holds many delta
        files between compactions and a point read wants only the ones
        that can contain the key.
        """
        snap = self.snapshot()
        missing = [c for c in snap.bucket_key if c not in key_vals]
        if missing:
            raise ValueError(f"lookup needs all bucket key columns; missing {missing}")
        cols = {f["name"]: f["type"] for f in snap.current_fields()}
        probe = self.spark.createDataFrame(
            [tuple(key_vals[c] for c in snap.bucket_key)],
            ", ".join(f"{c} {cols[c]}" for c in snap.bucket_key),
        )
        kc = snap.bucket_key[0]
        r = probe.select(
            self._bucket_col(snap).alias("b"),
            F.xxhash64(kc).alias("h1"),
            F.xxhash64(kc, F.lit(1)).alias("h2"),
        ).collect()[0]
        bucket = r["b"]
        range_pred = _key_range_pred([key_vals[kc]])
        bloom_pred = self._bloom_pred([(r["h1"], r["h2"])])
        out = self._reconciled(
            snap, buckets={int(bucket)},
            file_pred=lambda f: range_pred(f) and bloom_pred(f),
        )
        for c, v in key_vals.items():
            out = out.filter(F.col(c) == F.lit(v))
        return out.select(*[f["name"] for f in snap.current_fields()])

    def lookup_plan(self, **key_vals) -> dict:
        """Pruning explain for :meth:`lookup` — which manifest files the
        point read would open and what skipped the rest. Metadata plus the
        same 1-row probe Spark job only (no data files are read):
        ``{"bucket", "files_in_bucket", "after_key_range", "after_bloom",
        "paths"}`` where ``paths`` is the surviving (read) set. The gap
        between ``files_in_bucket`` and ``after_bloom`` is the point-read
        I/O the manifest stats save — on a hot bucket between compactions
        that's nearly all delta files (their key ranges span the whole
        keyspace; only the bloom can skip them)."""
        snap = self.snapshot()
        missing = [c for c in snap.bucket_key if c not in key_vals]
        if missing:
            raise ValueError(f"lookup needs all bucket key columns; missing {missing}")
        cols = {f["name"]: f["type"] for f in snap.current_fields()}
        probe = self.spark.createDataFrame(
            [tuple(key_vals[c] for c in snap.bucket_key)],
            ", ".join(f"{c} {cols[c]}" for c in snap.bucket_key),
        )
        kc = snap.bucket_key[0]
        r = probe.select(
            self._bucket_col(snap).alias("b"),
            F.xxhash64(kc).alias("h1"),
            F.xxhash64(kc, F.lit(1)).alias("h2"),
        ).collect()[0]
        cand = _bucket_pick(snap.files + snap.delta_files, {int(r["b"])}, snap.n_buckets)
        range_pred = _key_range_pred([key_vals[kc]])
        ranged = [f for f in cand if range_pred(f)]
        bloom_pred = self._bloom_pred([(r["h1"], r["h2"])])
        final = [f for f in ranged if bloom_pred(f)]
        return {
            "bucket": int(r["b"]),
            "files_in_bucket": len(cand),
            "after_key_range": len(ranged),
            "after_bloom": len(final),
            "paths": [f["path"] for f in final],
        }

    def scan_for_keys(self, values: list) -> DataFrame:
        """Multi-point read: reconcile ONLY the buckets holding the given
        bucket-key values (``lookup`` generalized to N keys — the probe path
        of a secondary index, or a batched 'current row for these urls').

        ``values``: bucket-key values — scalars for a single-column bucket
        key, tuples for composite keys. The physical buckets are computed by
        one tiny Spark job over the probe list (O(len(values)) work, exact
        writer-side xxhash64), then only those buckets' files are read —
        an O(probes/n_buckets) fraction of the table, never a full scan.
        """
        snap = self.snapshot()
        out_cols = [f["name"] for f in snap.current_fields()]
        if not values:
            return self.spark.createDataFrame([], snap.spark_schema())
        vals = [v if isinstance(v, tuple) else (v,) for v in values]
        cols = {f["name"]: f["type"] for f in snap.current_fields()}
        probe = self.spark.createDataFrame(
            vals, ", ".join(f"{c} {cols[c]}" for c in snap.bucket_key)
        )
        kc = snap.bucket_key[0]
        probed = probe.select(
            self._bucket_col(snap).alias("__b"),
            F.xxhash64(kc).alias("__h1"),
            F.xxhash64(kc, F.lit(1)).alias("__h2"),
        ).collect()
        buckets = {int(r["__b"]) for r in probed}
        range_pred = _key_range_pred([v[0] for v in vals])
        bloom_pred = self._bloom_pred([(r["__h1"], r["__h2"]) for r in probed])
        out = self._reconciled(
            snap, buckets=buckets,
            file_pred=lambda f: range_pred(f) and bloom_pred(f),
        )
        if len(snap.bucket_key) == 1:
            out = out.filter(F.col(snap.bucket_key[0]).isin([v[0] for v in vals]))
        else:
            out = out.join(F.broadcast(probe), on=list(snap.bucket_key), how="left_semi")
        return out.select(*out_cols)

    def scan_for_keys_df(self, probe: DataFrame, version: int | None = None) -> DataFrame:
        """:meth:`scan_for_keys` with a DataFrame probe — the delta-sized
        variant. Only the probe's DISTINCT BUCKET IDS are collected
        (≤ ``n_buckets`` values, regardless of probe size), never the key
        values themselves, so a multi-million-key change batch prunes the
        read without a driver-side key list. Rows are then restricted to
        the probe keys with a broadcast left-semi join (broadcast is the
        distinct probe keys — epoch-delta-sized by contract).

        ``version`` pins the read to a historical snapshot (retention-
        checked: an expired version raises :class:`SnapshotExpired`) —
        the endpoint read a state-diffing changelog consumer needs
        (``lake/sketch_view.py sync_cms_view``)."""
        snap = self.snapshot() if version is None else self._snapshot_retained(version)
        out_cols = [f["name"] for f in snap.current_fields()]
        keys = probe.select(*snap.bucket_key).distinct()
        buckets = {
            int(r["__b"])
            for r in keys.select(self._bucket_col(snap).alias("__b")).distinct().collect()
        }
        if not buckets:
            return self.spark.createDataFrame([], snap.spark_schema()).select(*out_cols)
        out = self._reconciled(snap, buckets=buckets)
        out = out.join(F.broadcast(keys), on=list(snap.bucket_key), how="left_semi")
        return out.select(*out_cols)

    def scan_changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Incremental changelog read (the Iceberg incremental-source
        analog, SURVEY.md §1.7): rows written between two snapshots, with
        ``__lsn``/``__op`` retained — deletes appear as op='D' markers.

        Reads only files *added* in the version range (file-diff, no table
        scan), so the lake can feed a downstream CDC consumer. The "change
        stream out equals the winners applied in" contract is exact for
        **MOR** commits (delta files hold exactly the applied winners); a
        COW merge rewrites every surviving row of touched buckets, so its
        commits also re-emit unchanged co-bucketed rows — run the follower
        with ``merge_mode='mor'`` when a downstream consumer tails this.

        TRUNCATE commits are metadata-only and therefore emit NO rows
        here — a consumer that materializes state must also call
        :meth:`truncates_between` on the same range and erase its state
        at each truncate's LSN (see the index syncs in
        ``operators/dedup_index.py`` / ``operators/ann_index.py``)."""
        to_snap, changes = self._changed_files(from_version, to_version)
        return self._read_files(to_snap, changes, hidden=True)

    def _changed_files(
        self, from_version: int, to_version: int | None = None
    ) -> tuple["_Snapshot", list[dict]]:
        """The (to_snap, file-entry list) a :meth:`scan_changes` over the
        range reads — shared by the read itself and the metadata-only
        :meth:`changed_rows_hint`."""
        to_snap = (
            self.snapshot() if to_version is None
            else self._snapshot_retained(to_version)
        )
        if from_version <= 0:
            from_v, seen0 = 0, []  # 0 = before the first version: everything
        else:
            from_snap = self._snapshot_retained(from_version)
            from_v = from_snap.version
            seen0 = from_snap.files + from_snap.delta_files
        # walk the snapshot chain (from, to] and take files INTRODUCED by
        # non-compaction commits. Compaction output is a rewrite of already
        # -delivered rows, not a change; conversely, deltas folded away by a
        # later compaction still count (their files remain on disk).
        chain = []
        v = to_snap.version
        while v is not None and v > from_v:
            s = self._snapshot_retained(v)
            chain.append(s)
            v = s.parent
        seen = {f["path"] for f in seen0}
        changes: list[dict] = []
        for s in reversed(chain):
            new_here = [
                f for f in s.files + s.delta_files if f["path"] not in seen
            ]
            seen.update(f["path"] for f in s.files + s.delta_files)
            if not s.operation.startswith("compact"):
                changes.extend(new_here)
        return to_snap, changes

    def changed_rows_hint(self, from_version: int, to_version: int | None = None) -> int | None:
        """Summed file-stat row count of the files a
        :meth:`scan_changes` over the same range would read — an
        O(metadata) UPPER BOUND on change rows (hence on distinct changed
        keys), costing zero Spark jobs. ``None`` when any file in range
        lacks a recorded count (pre-stats writer) — callers fall back to
        an exact count then. Used by the incremental view syncs to decide
        broadcast-vs-shuffle for the delta probe without spending a
        count() job per sync."""
        _, changes = self._changed_files(from_version, to_version)
        total = 0
        for f in changes:
            r = f.get("rows")
            if r is None:
                return None
            total += int(r)
        return total

    def truncates_between(self, from_version: int, to_version: int | None = None) -> list[dict]:
        """TRUNCATE commits in ``(from_version, to_version]``, oldest
        first, as ``{"version", "lsn"}`` dicts.

        A truncate is METADATA-ONLY (``truncate_rows`` drops every live
        file from the manifest without writing per-key delete markers),
        so :meth:`scan_changes` cannot surface it as rows — a changelog
        consumer that materializes state (dedup/ANN index sync, a
        downstream mirror) MUST call this alongside ``scan_changes`` and
        erase its own state at each truncate's LSN, else it silently
        keeps rows the table no longer has."""
        to_snap = (
            self.snapshot() if to_version is None
            else self._snapshot_retained(to_version)
        )
        from_v = int(from_version)  # 0 = before the first version
        out: list[dict] = []
        v = to_snap.version
        while v is not None and v > from_v:
            s = self._snapshot_retained(v)
            if s.operation.startswith("truncate:"):
                out.append({"version": s.version, "lsn": s.truncate_lsn})
            v = s.parent
        return list(reversed(out))

    def _snapshot_retained(self, version: int) -> _Snapshot:
        """snapshot(), but an expired log entry raises :class:`SnapshotExpired`
        with the rebuild instruction instead of a bare FileNotFoundError —
        the incremental-read contract past the retention window."""
        try:
            return self.snapshot(version)
        except FileNotFoundError as e:
            raise SnapshotExpired(
                f"snapshot v{version} of {self.path} was expired by "
                f"expire_snapshots — the changelog below the oldest retained "
                f"snapshot is gone; rebuild the consumer from current state "
                f"instead of tailing from this cursor"
            ) from e

    # -- write -------------------------------------------------------------

    def _write_data_files(
        self, snap: _Snapshot, df: DataFrame, sort_cols: list[str] | None = None
    ) -> list[dict]:
        """Write ``df`` as immutable bucket-partitioned parquet files and
        return their manifest entries. Files land flat under ``data/`` with
        the bucket encoded in the name (no Hive-partition inference on read).
        """
        commit_id = uuid.uuid4().hex[:12]
        tmp = os.path.join(self.path, f".stage-{commit_id}")
        _tm = os.environ.get("CCS_TIMING") == "1"
        _t0 = time.monotonic()
        # one write task per bucket (same file count either way — partitionBy
        # splits each task's output by bucket). Packing buckets into
        # ~core-count tasks looked cheaper (fewer tasks) but concentrates
        # the write shuffle: at 3M-event epochs each of 16 tasks held
        # ~375 MB of page rows and SPILLED — 64 one-bucket tasks measured
        # 26% faster end-to-end (165k→209k ev/s) and shrink per-task memory
        # with bucket count, which is exactly how a 4096-bucket table at
        # 100 TB wants to write. CCS_WRITE_TASKS overrides for experiments.
        n_tasks = int(os.environ.get("CCS_WRITE_TASKS", "0")) or max(snap.n_buckets, 1)
        staged = df.withColumn("__bucket", self._bucket_col(snap)).repartition(
            n_tasks, "__bucket"
        )
        if sort_cols:
            # key-clustered layout (Iceberg sort-order analog): rows sorted
            # within each write task so every parquet ROW GROUP covers a
            # narrow key range — a pushed-down point/range predicate then
            # skips row groups inside big compacted files, not just whole
            # files via the manifest's [key_min, key_max]
            staged = staged.sortWithinPartitions("__bucket", *sort_cols)
        if "__zval" in staged.columns:
            # the z-order sort key is layout-only — drop it AFTER the sort
            # (a Project preserves intra-partition order) so it never
            # lands in the data files
            staged = staged.drop("__zval")
        (
            staged.write.partitionBy("__bucket")
            .mode("overwrite")
            .parquet(tmp)
        )
        if _tm:
            print(f"[write spark-job: {time.monotonic() - _t0:.2f}s]", flush=True)
            _t0 = time.monotonic()
        import pyarrow.parquet as pq

        entries: list[dict] = []
        for bdir in sorted(self._fs.listdir(tmp)):
            if not bdir.startswith("__bucket="):
                continue
            bucket = int(bdir.split("=", 1)[1])
            for i, fn in enumerate(sorted(self._fs.listdir(os.path.join(tmp, bdir)))):
                if not fn.endswith(".parquet"):
                    continue
                dest_rel = os.path.join(_DATA_DIR, f"{commit_id}-b{bucket:05d}-{i:04d}.parquet")
                dest = os.path.join(self.path, dest_rel)
                self._fs.move(os.path.join(tmp, bdir, fn), dest)
                with self._fs.open_binary(dest) as _pf:
                    md = pq.ParquetFile(_pf).metadata
                # per-file source-LSN range from the footer's __lsn column
                # statistics (per-partition lineage: every data file knows
                # which slice of the change stream produced it — zero extra
                # jobs, the footer is already open for the row count)
                lsn_lo = lsn_hi = None
                idx = {md.schema.column(c).path: c for c in range(md.num_columns)}
                li = idx.get("__lsn")
                if li is not None:
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(li).statistics
                        if st is not None and st.has_min_max:
                            lsn_lo = st.min if lsn_lo is None else min(lsn_lo, st.min)
                            lsn_hi = st.max if lsn_hi is None else max(lsn_hi, st.max)
                # bucket-key range from the same open footer (Iceberg
                # lower/upper-bound column stats analog): lets point reads
                # skip files WITHIN a bucket — a hot bucket accumulates
                # many delta files between compactions, and a lookup only
                # needs the ones whose [key_min, key_max] covers the probe
                kr = _footer_col_range(md, idx, snap.bucket_key[0])
                key_lo, key_hi = (kr if kr is not None else (None, None))
                # per-file [min, max] of the snapshot's extra stats columns
                # (Iceberg column-stats analog) — same open footer, zero
                # extra I/O; incomplete stats simply omit the column
                col_stats = {}
                for sc in snap.stats_cols:
                    r = _footer_col_range(md, idx, sc)
                    if r is not None:
                        col_stats[sc] = r
                entries.append(
                    {
                        "path": dest_rel,
                        "bucket": bucket,
                        # row count from the footer (driver-side, O(files))
                        # — lets scans/compaction size the winner semi-join
                        "rows": md.num_rows,
                        "schema_version": snap.schema_version,
                        "lsn_min": lsn_lo,
                        "lsn_max": lsn_hi,
                        "key_min": key_lo,
                        "key_max": key_hi,
                        **({"col_stats": col_stats} if col_stats else {}),
                    }
                )
        self._fs.rmtree(tmp)
        if snap.bloom_bits_per_key > 0 and entries:
            self._attach_blooms(snap, entries, commit_id)
        if _tm:
            print(f"[write manifest({len(entries)}f): {time.monotonic() - _t0:.2f}s]", flush=True)
        return entries

    def _attach_blooms(self, snap: _Snapshot, entries: list[dict], commit_id: str) -> None:
        """Build one bloom filter per just-written data file over the bucket
        key's first column and record it in a per-commit sidecar
        (``_log/blooms/{commit_id}.json``); each manifest entry gets a
        ``"bloom"`` ref. One extra column-pruned Spark job per commit:
        hashing stays JVM-side (the same ``xxhash64`` family the probe job
        uses), bit positions are Kirsch–Mitzenmacher double hashing
        ``(h1 + i*h2) mod m``, deduped map-side (group sizes are bounded by
        ``m``, never by file rows), and the bitmap itself is OR-ed together
        in an Arrow batch — the driver only ever sees ``m/8`` bytes per file.

        The sidecar lands BEFORE the snapshot commit that references it
        (same ordering as the data files themselves): a crash in between
        leaves an orphan sidecar for :meth:`vacuum`, never a dangling ref."""
        import base64

        import numpy as np
        import pandas as pd

        bpk = snap.bloom_bits_per_key
        k = max(1, min(8, round(0.6931 * bpk)))
        kc = snap.bucket_key[0]
        sizes = [
            (
                os.path.basename(e["path"]),
                int(min(max((e["rows"] or 1) * bpk, _BLOOM_MIN_BITS), _BLOOM_MAX_BITS)),
            )
            for e in entries
        ]
        mmap = self.spark.createDataFrame(sizes, "__f string, __m long")
        src = self.spark.read.parquet(
            *[os.path.join(self.path, e["path"]) for e in entries]
        ).select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("__f"),
            F.col(kc).alias("__k"),
        )
        h1 = F.pmod(F.xxhash64("__k"), F.col("__m"))
        # step must be non-zero and is kept < m so (h1 + i*step) never
        # overflows a BIGINT (m ≤ 2^19, i ≤ 8 — ANSI-safe arithmetic)
        h2 = F.pmod(F.xxhash64("__k", F.lit(1)), F.col("__m") - 1) + F.lit(1)
        idx = F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.pmod(h1 + i * h2, F.col("__m")),
            )
        )
        per = (
            src.join(F.broadcast(mmap), "__f")
            .select("__f", "__m", idx.alias("__i"))
            .dropDuplicates(["__f", "__i"])
        )

        def _bitmap(pdf: "pd.DataFrame") -> "pd.DataFrame":
            m = int(pdf["__m"].iloc[0])
            bits = np.zeros((m + 7) // 8, dtype=np.uint8)
            i = pdf["__i"].to_numpy().astype(np.int64)
            np.bitwise_or.at(bits, i >> 3, np.left_shift(1, (i & 7).astype(np.uint8)).astype(np.uint8))
            return pd.DataFrame(
                {"__f": [pdf["__f"].iloc[0]], "__m": [m], "bits": [bits.tobytes()]}
            )

        built = per.groupBy("__f").applyInPandas(
            _bitmap, "__f string, __m long, bits binary"
        ).collect()
        side = {
            r["__f"]: {
                "m": int(r["__m"]),
                "k": k,
                "bits": base64.b64encode(bytes(r["bits"])).decode("ascii"),
            }
            for r in built
        }
        rel = os.path.join(_BLOOM_DIR, f"{commit_id}.json")
        self._fs.makedirs(os.path.join(self._log_path, _BLOOM_DIR))
        self._fs.write_bytes(
            os.path.join(self._log_path, rel),
            json.dumps(side, separators=(",", ":")).encode(),
        )
        for e in entries:
            if os.path.basename(e["path"]) in side:
                e["bloom"] = rel

    def _bloom_sidecar(self, ref: str) -> dict:
        """Load (and cache) a bloom sidecar: basename → (m, k, bitmap bytes).
        A missing/corrupt sidecar disables pruning for its files — never
        wrong, only incomplete."""
        import base64

        hit = self._bloom_sidecars.get(ref)
        if hit is not None:
            return hit
        try:
            raw = json.loads(self._fs.read_text(os.path.join(self._log_path, ref)))
            side = {
                f: (int(e["m"]), int(e["k"]), base64.b64decode(e["bits"]))
                for f, e in raw.items()
            }
        except Exception:
            side = {}
        self._bloom_sidecars[ref] = side
        return side

    def _bloom_pred(self, hashes: list[tuple[int, int]]):
        """Manifest-entry predicate: keep a file unless its bloom filter
        proves NONE of the probe keys can be present. ``hashes`` carries the
        probe keys' raw signed ``(xxhash64(key), xxhash64(key, 1))`` pairs —
        computed by the same 1-row Spark job that computes the probe bucket,
        so write-side and probe-side hashing are the identical JVM function.
        Python ``%`` with a positive modulus equals Spark's ``pmod`` on the
        signed values, so bit positions match bit-for-bit."""
        def pred(f: dict) -> bool:
            ref = f.get("bloom")
            if not ref:
                return True
            ent = self._bloom_sidecar(ref).get(os.path.basename(f["path"]))
            if not ent:
                return True
            m, k, bits = ent
            for h1, h2 in hashes:
                a = h1 % m
                step = h2 % (m - 1) + 1
                if all(
                    bits[((a + i * step) % m) >> 3] >> (((a + i * step) % m) & 7) & 1
                    for i in range(k)
                ):
                    return True
            return False
        return pred

    def lineage(self, version: int | None = None) -> list[dict]:
        """Per-partition lineage of a snapshot: one row per data file with
        its bucket, row count, and the source-LSN range that produced it
        (from parquet footer stats recorded at write time), plus the
        snapshot's committed-epoch registry. Driver-side metadata only —
        zero Spark jobs (the Iceberg manifest/`snapshots` metadata-table
        analog; reference: the per-batch position ranges Canal tracks in
        its meta manager, FileMixedMetaManager.java:35-299)."""
        snap = self.snapshot(version)
        out = []
        for kind, files in (("base", snap.files), ("delta", snap.delta_files)):
            for f in files:
                out.append(
                    {
                        "snapshot_version": snap.version,
                        "kind": kind,
                        "path": f["path"],
                        "bucket": f["bucket"],
                        "rows": f.get("rows"),
                        "lsn_min": f.get("lsn_min"),
                        "lsn_max": f.get("lsn_max"),
                        "schema_version": f["schema_version"],
                    }
                )
        return out

    def append(self, df: DataFrame) -> int:
        snap = self.snapshot()
        new_files = self._write_data_files(snap, df.select(*[f["name"] for f in snap.current_fields()]))
        child = self._child(snap, files=snap.files + new_files, operation="append")
        self._write_snapshot(child)
        return child.version

    def overwrite(self, df: DataFrame) -> int:
        snap = self.snapshot()
        new_files = self._write_data_files(snap, df.select(*[f["name"] for f in snap.current_fields()]))
        child = self._child(snap, files=new_files, operation="overwrite")
        self._write_snapshot(child)
        return child.version

    def append_pylist(self, rows: list[dict], epoch_id=None, lineage: dict | None = None) -> int | None:
        """Driver-side append of a few rows (lineage/metrics) via pyarrow —
        zero Spark jobs. Idempotent when ``epoch_id`` given. Not for data
        paths (bucket is recorded as 0; metrics tables are never merged)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        snap = self.snapshot()
        if epoch_id is not None and self._committed_in(snap, epoch_id):
            return None
        fields = snap.current_fields()
        arrow_schema = pa.schema(
            [(f["name"], _arrow_type(f["type"])) for f in fields]
        )
        cols = {f["name"]: [r.get(f["name"]) for r in rows] for f in fields}
        tbl = pa.Table.from_pydict(cols, schema=arrow_schema)
        rel = os.path.join(_DATA_DIR, f"drv-{uuid.uuid4().hex[:12]}.parquet")
        import io as _io

        _buf = _io.BytesIO()
        pq.write_table(tbl, _buf)
        self._fs.write_bytes(os.path.join(self.path, rel), _buf.getvalue())
        entry = {"path": rel, "bucket": 0, "rows": len(rows), "schema_version": snap.schema_version}
        epochs = dict(snap.committed_epochs)
        if epoch_id is not None:
            epochs[str(epoch_id)] = lineage or {}
        child = self._child(
            snap, files=snap.files + [entry], committed_epochs=epochs, operation="append_pylist"
        )
        self._write_snapshot(child)
        return child.version

    def truncate_rows(self, lsn: int) -> int | None:
        """Apply a feed TRUNCATE at ``lsn``: a METADATA-ONLY commit that
        drops every live base/delta file from the new snapshot (the
        Iceberg unconditional-DELETE shape — O(#files) manifest work, no
        data job) and records ``truncate_lsn``. Time travel to earlier
        versions still sees the rows; `expire_snapshots` + `vacuum`
        reclaim the bytes on the normal retention schedule.

        Idempotent by watermark: replaying a truncate at-or-below the
        recorded ``truncate_lsn`` is a no-op (returns None), so the DDL
        channel's crash-replay rule holds. Late events BELOW the watermark
        are rejected by :meth:`merge` — emptiness wins over lower LSNs,
        exactly as a tombstone would.

        Reference: TRUNCATE is a first-class EventType the stream carries
        (EntryProtocol.proto:26-59; classified by SimpleDdlParser.java:
        49-110) — the reference hands it to clients; a lake SINK applying
        the feed must execute it."""
        snap = self.snapshot()
        if lsn <= snap.truncate_lsn:
            return None
        child = self._child(
            snap,
            files=[],
            delta_files=[],
            truncate_lsn=int(lsn),
            operation=f"truncate:lsn={lsn}",
        )
        self._write_snapshot(child)
        return child.version

    def commit_epoch_marker(self, epoch_id, lineage: dict | None = None) -> int | None:
        """Metadata-only epoch commit (empty micro-batch: positions advance
        with no data — the empty-transaction passthrough analog,
        EntryEventSink.java:109-148)."""
        snap = self.snapshot()
        if self._committed_in(snap, epoch_id):
            return None
        epochs = dict(snap.committed_epochs)
        epochs[str(epoch_id)] = lineage or {}
        child = self._child(
            snap, committed_epochs=epochs, operation=f"epoch_marker:{epoch_id}"
        )
        self._write_snapshot(child)
        return child.version

    # -- exactly-once epoch registry --------------------------------------

    @staticmethod
    def _committed_in(snap: _Snapshot, epoch_id) -> bool:
        if str(epoch_id) in snap.committed_epochs:
            return True
        p = _epoch_prefix(epoch_id)
        return p is not None and p <= snap.epoch_watermark

    def is_epoch_committed(self, epoch_id: int) -> bool:
        return self._committed_in(self.snapshot(), epoch_id)

    def committed_epochs(self) -> dict[str, dict]:
        return dict(self.snapshot().committed_epochs)

    # -- MERGE (the CDC apply primitive) -----------------------------------

    def merge(
        self,
        source: DataFrame,
        epoch_id: int | None = None,
        lineage: dict | None = None,
        op_col: str = "op",
        mode: str = "cow",
        lsn_col: str | None = None,
        compact_every: int = 24,
        commit_retries: int = 0,
        fill_missing: bool = False,
    ) -> MergeResult:
        """MERGE INTO: upsert rows with ``op`` ∈ {I,U} (payload columns =
        table columns), delete rows with ``op`` = 'D'.

        Both modes reconcile by **LWW on ``lsn``** against the target's
        current winner — a source row older than the stored row loses, so
        out-of-order delivery across epochs (multi-shard lag) converges to
        the same state as ordered apply. Duplicate source keys are legal
        (they LWW among themselves), but pre-deduping (SURVEY.md §7 risk
        (e)) keeps transform + write costs on winners only.

        Two strategies (both map onto Iceberg semantics):

        - ``cow`` (copy-on-write): read + rewrite the touched buckets; best
          when epochs touch a small fraction of buckets. Untouched files
          carry over by reference; AQE broadcasts the small source side.
        - ``mor`` (merge-on-read, Iceberg-v2 style): append the winners as
          bucketed delta files with ``__lsn``/``__op`` — no target read at
          all; scans reconcile by LWW and :meth:`compact` folds deltas into
          the base (auto every ``compact_every`` delta commits). This is the
          sustained-ingest path: apply cost is O(batch), not O(table).
          Requires ``lsn_col``.

        ``commit_retries`` (MOR only) enables the Iceberg optimistic-commit
        loop for CONCURRENT committers on one table: delta entries are
        additive and scans reconcile by LWW-on-``__lsn``, so on
        ``CommitConflict`` the already-written files re-parent onto the new
        head and the CAS retries — no Spark job re-runs. Re-parenting is
        refused (conflict re-raised) only when it could change semantics:
        a concurrent TRUNCATE whose watermark reaches into this delta's LSN
        range (re-parenting would resurrect erased state), or a file entry
        without recorded LSN stats (can't prove safety). A COW merge never
        retries — its rewrite read the pre-conflict base, so the conflict
        is real and the caller must re-run the merge.
        """
        if epoch_id is not None and self.is_epoch_committed(epoch_id):
            return MergeResult(applied=False, version=self.current_version())
        if fill_missing:
            # lenient source schema for producers lagging an ADD COLUMN:
            # absent NON-KEY columns fill with the column's write default
            # (= its initial_default, Iceberg-v3 style) or null. Key and
            # bucket columns must always be real — filling them would
            # silently corrupt row identity and placement.
            fsnap = self.snapshot()
            src_cols = set(source.columns)
            required = set(fsnap.merge_key) | set(fsnap.bucket_key)
            missing_keys = sorted(required - src_cols)
            if missing_keys:
                raise ValueError(
                    f"merge source lacks key/bucket columns {missing_keys} — "
                    "fill_missing only covers payload columns"
                )
            for f in fsnap.current_fields():
                if f["name"] not in src_cols:
                    # write default: an explicit SET/DROP DEFAULT entry
                    # wins (even when null — DROP DEFAULT means fill
                    # null); otherwise the add-time initial-default
                    fill = (
                        f["write_default"] if "write_default" in f
                        else f.get("initial_default")
                    )
                    source = source.withColumn(
                        f["name"], F.lit(fill).cast(f["type"])
                    )
        if lsn_col is not None:
            t_lsn = self.snapshot().truncate_lsn
            if t_lsn:
                # truncate watermark: rows at-or-below the truncate position
                # were erased by it — a lagging shard re-delivering them must
                # not resurrect pre-truncate state (emptiness wins the LWW)
                source = source.filter(F.col(lsn_col) > t_lsn)
        if mode == "mor":
            return self._merge_mor(
                source, epoch_id, lineage, op_col, lsn_col, compact_every,
                commit_retries,
            )

        snap = self.snapshot()
        cols = [f["name"] for f in snap.current_fields()]
        key = snap.merge_key

        import os as _os, time as _time
        _tm = _os.environ.get("CCS_TIMING", "") == "1"
        _t0 = _time.monotonic()

        def _mlog(msg):
            nonlocal _t0
            if _tm:
                print(f"[merge {msg}: {_time.monotonic() - _t0:.2f}s]", flush=True)
            _t0 = _time.monotonic()

        src = source.withColumn("__bucket", self._bucket_col(snap)).cache()
        try:
            touched = {r["__bucket"] for r in src.select("__bucket").distinct().collect()}
            _mlog("source-cache+buckets")
            # spec-aware: an old-bucket-spec file overlapping a touched
            # bucket is read AND rewritten under the current spec here —
            # COW merges progressively migrate pre-rebucket files
            rw = {f["path"] for f in _bucket_pick(snap.files, touched, snap.n_buckets)}
            rw_d = {f["path"] for f in _bucket_pick(snap.delta_files, touched, snap.n_buckets)}
            keep_files = [f for f in snap.files if f["path"] not in rw]
            keep_deltas = [f for f in snap.delta_files if f["path"] not in rw_d]

            # reconciled view of the touched buckets (folds any MOR deltas),
            # tombstones retained so a late lower-LSN upsert can't resurrect
            # a deleted key (LWW holds across epochs, not just within one)
            target = self._reconciled(snap, buckets=touched, keep_deletes=True)
            src_keys = src.select(*key)
            survivors = target.join(src_keys, on=key, how="left_anti")
            hidden = ["__lsn", "__op"]
            if lsn_col is None:
                # no event ordering available → last-applied-wins (ordered
                # single-feed semantics; requires ≤1 source row per key)
                upserts = src.filter(F.col(op_col) != F.lit("D")).select(
                    *cols, F.lit(-1).cast("long").alias("__lsn"), F.lit("U").alias("__op")
                )
                merged = survivors.select(*cols, *hidden).unionByName(upserts)
            else:
                # contested keys: LWW by __lsn between the target's current
                # winner and the source rows — NOT last-applied-wins, so a
                # lagging shard delivering lower-LSN events in a later epoch
                # cannot overwrite newer rows (multi-shard group-sink rule)
                matched = target.join(src_keys, on=key, how="left_semi")
                src_rows = src.select(
                    *cols,
                    F.col(lsn_col).cast("long").alias("__lsn"),
                    F.when(F.col(op_col) == "D", F.lit("D")).otherwise(F.lit("U")).alias("__op"),
                )
                contested = matched.select(*cols, *hidden).unionByName(src_rows)
                payload = [c for c in cols + hidden if c not in key]
                winners = (
                    contested.groupBy(*key)
                    .agg(F.max_by(F.struct(*payload), F.col("__lsn")).alias("__w"))
                    .select(*key, *[F.col(f"__w.{c}").alias(c) for c in payload])
                    .select(*cols, *hidden)
                )
                # delete winners are WRITTEN as tombstones; scan() hides them
                merged = survivors.select(*cols, *hidden).unionByName(winners)

            new_files = self._write_data_files(snap, merged)
            _mlog("cow-write")

            epochs = dict(snap.committed_epochs)
            if epoch_id is not None:
                # callable lineage resolves AFTER the data write (e.g. from a
                # DataFrame.observe riding the write job) and BEFORE the
                # atomic snapshot commit — exactly-once still holds
                epochs[str(epoch_id)] = (lineage() if callable(lineage) else lineage) or {}
            child = self._child(
                snap,
                files=keep_files + new_files,
                delta_files=keep_deltas,
                committed_epochs=epochs,
                operation=f"merge:epoch={epoch_id}",
            )
            self._write_snapshot(child)
            return MergeResult(
                applied=True,
                version=child.version,
                touched_buckets=len(touched),
                rows_written=len(new_files),
            )
        finally:
            src.unpersist()

    def _merge_mor(
        self, source, epoch_id, lineage, op_col, lsn_col, compact_every,
        commit_retries: int = 0,
    ) -> MergeResult:
        """Merge-on-read apply: append winners (incl. delete markers) as
        bucketed delta files — zero target reads, O(batch) cost."""
        if not lsn_col:
            raise ValueError("mor merge requires lsn_col")
        snap = self.snapshot()
        cols = [f["name"] for f in snap.current_fields()]
        delta = source.select(
            # cast pins the parquet physical type to INT64: an IntegerType
            # lsn (e.g. a small literal) must not write INT32 files that a
            # later mixed-footer read chokes on (PARQUET_COLUMN_DATA_TYPE_MISMATCH)
            *cols, F.col(lsn_col).cast("long").alias("__lsn"), F.col(op_col).alias("__op")
        )
        import os as _os, time as _time
        if _os.environ.get("CCS_EXPLAIN") == "1":
            delta.explain("formatted")
        _tm = _os.environ.get("CCS_TIMING") == "1"
        _t0 = _time.monotonic()
        new_files = self._write_data_files(snap, delta)
        if _tm:
            print(f"[mor delta-write: {_time.monotonic() - _t0:.2f}s]", flush=True)
            _t0 = _time.monotonic()
        lin = (lineage() if callable(lineage) else lineage) or {}
        for attempt in range(commit_retries + 1):
            epochs = dict(snap.committed_epochs)
            if epoch_id is not None:
                epochs[str(epoch_id)] = lin
            child = self._child(
                snap,
                delta_files=snap.delta_files + new_files,
                committed_epochs=epochs,
                operation=f"merge-mor:epoch={epoch_id}",
            )
            try:
                self._write_snapshot(child)
                break
            except CommitConflict:
                if attempt >= commit_retries:
                    raise
                # Iceberg optimistic-commit loop: re-parent the ALREADY
                # WRITTEN delta entries onto the new head (additive + LWW
                # reconciliation make concurrent MOR commits commutative)
                # and retry the CAS — the Spark write never re-runs.
                head = self.snapshot()
                if epoch_id is not None and self._committed_in(head, epoch_id):
                    # another writer applied this very epoch; our files are
                    # unreferenced orphans (vacuum sweeps them)
                    return MergeResult(applied=False, version=head.version)
                if head.truncate_lsn > snap.truncate_lsn and any(
                    f.get("lsn_min") is None or f["lsn_min"] <= head.truncate_lsn
                    for f in new_files
                ):
                    raise CommitConflict(
                        "concurrent TRUNCATE watermark reaches into this "
                        "delta's LSN range — re-parenting would resurrect "
                        "erased state; re-run the merge"
                    )
                snap = head
        if _tm:
            print(f"[mor commit: {_time.monotonic() - _t0:.2f}s]", flush=True)
        result = MergeResult(
            applied=True, version=child.version,
            touched_buckets=len({f["bucket"] for f in new_files}),
            rows_written=len(new_files),
        )
        # fold deltas into the base when read amplification grows: trigger
        # on the number of delta COMMITS (epochs), not files, so the
        # threshold is independent of bucket count
        n_delta_commits = len({f["path"].split("-")[0] for f in child.delta_files})
        if compact_every and n_delta_commits >= compact_every:
            self.compact()
        return result

    def schema_history(self) -> list[dict]:
        """Every schema version with its fields — the TableMeta-TSDB view
        (MemoryTableMeta.java:67-88 keeps schema-as-of-position; here
        schema-as-of-snapshot). Driver-side metadata, zero Spark jobs."""
        snap = self.snapshot()
        return [
            {"schema_version": int(sv), "fields": [dict(f) for f in fields],
             "current": int(sv) == snap.schema_version}
            for sv, fields in sorted(snap.schemas.items(), key=lambda kv: int(kv[0]))
        ]

    def history(self) -> list[dict]:
        """Operation log over the retained snapshot chain, newest first —
        the Delta ``DESCRIBE HISTORY`` / Iceberg ``snapshots``
        metadata-table analog. Driver-side JSON walk, zero Spark jobs."""
        versions = sorted(
            (int(n[1:9]) for n in self._fs.listdir(self._log_path)
             if n.startswith("v") and n.endswith(".json")),
            reverse=True,
        )
        out = []
        for v in versions:
            s = self.snapshot(v)
            out.append(
                {
                    "version": v,
                    "parent": s.parent,
                    "operation": s.operation,
                    "committed_at_ms": s.committed_at_ms,
                    "n_files": len(s.files),
                    "n_delta_files": len(s.delta_files),
                    "rows": sum(f.get("rows") or 0 for f in s.files + s.delta_files),
                    "schema_version": s.schema_version,
                    "n_committed_epochs": len(s.committed_epochs),
                    "epoch_watermark": s.epoch_watermark,
                    "truncate_lsn": s.truncate_lsn,
                }
            )
        return out

    # -- named refs (tags) -------------------------------------------------
    # Iceberg tag analog: an immutable named pointer to a snapshot version.
    # A tag pins ITS snapshot against expire_snapshots (time travel by name
    # survives retention); the changelog BETWEEN a tag and the retained
    # window is not pinned — scan_changes across an expired gap still
    # raises SnapshotExpired, exactly Iceberg's tag semantics.

    def _refs_path(self) -> str:
        return os.path.join(self._log_path, _REFS_DIR)

    @staticmethod
    def _check_ref_name(name: str) -> str:
        if not _REF_NAME.fullmatch(name or ""):
            raise ValueError(
                f"ref name {name!r} must match {_REF_NAME.pattern} (fs-safe)"
            )
        return name

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Create an immutable named ref at ``version`` (default: current).
        Raises ``ValueError`` if the tag exists or the version isn't a
        retained snapshot. Returns the pinned version."""
        self._check_ref_name(name)
        v = version if version is not None else self.current_version()
        self.snapshot(v)  # must be retained — raises if expired/absent
        self._fs.makedirs(self._refs_path())
        ref = {"name": name, "version": v, "kind": "tag",
               "created_at_ms": int(time.time() * 1000)}
        try:
            self._fs.write_text_exclusive(
                os.path.join(self._refs_path(), f"{name}.json"), json.dumps(ref)
            )
        except FileExistsError:
            raise ValueError(f"tag {name!r} already exists (tags are immutable)")
        return v

    def drop_tag(self, name: str) -> None:
        self._check_ref_name(name)
        try:
            self._fs.remove(os.path.join(self._refs_path(), f"{name}.json"))
        except FileNotFoundError:
            raise ValueError(f"tag {name!r} does not exist")

    def list_refs(self) -> dict[str, dict]:
        try:
            names = self._fs.listdir(self._refs_path())
        except FileNotFoundError:
            return {}
        out = {}
        for n in names:
            if n.endswith(".json"):
                ref = json.loads(self._fs.read_text(os.path.join(self._refs_path(), n)))
                out[ref["name"]] = ref
        return out

    def resolve_ref(self, name: str) -> int:
        self._check_ref_name(name)
        try:
            ref = json.loads(
                self._fs.read_text(os.path.join(self._refs_path(), f"{name}.json"))
            )
        except FileNotFoundError:
            raise ValueError(f"ref {name!r} does not exist")
        return int(ref["version"])

    # -- shallow clone -----------------------------------------------------

    def clone_to(self, dest_path: str, version: int | None = None,
                 fs: "MetadataFS | None" = None) -> "LakeTable":
        """Zero-copy shallow clone (Delta ``SHALLOW CLONE`` / Iceberg
        snapshot-ref-table analog): a new table whose first snapshot
        references this table's data files by ABSOLUTE path — no data is
        copied. Writes to the clone land in the clone's own ``data/`` dir;
        neither side's :meth:`vacuum` can touch the other's files (vacuum
        sweeps only the table's own data dir).

        CAVEAT (same as Delta's): the source must not :meth:`vacuum` away
        files the clone still references — retain the cloned version on the
        source (e.g. :meth:`create_tag` it) for the clone's lifetime.

        Local paths only: object-store tables get cloning from the Iceberg
        catalog mapping instead (see module docstring)."""
        if "://" in self.path:
            raise NotImplementedError(
                "clone_to supports local paths; object-store tables clone "
                "via the Iceberg catalog mapping (module docstring)"
            )
        snap = self.snapshot(version)

        def _abs(entries: list[dict]) -> list[dict]:
            return [
                {**f, "path": f["path"] if f["path"].startswith("/")
                 else os.path.join(self.path, f["path"])}
                for f in entries
            ]

        t = LakeTable(self.spark, dest_path, fs=fs)
        if t.exists():
            raise ValueError(f"clone destination {dest_path} already exists")
        t._fs.makedirs(t._log_path)
        t._fs.makedirs(t._data_path)
        d = dict(snap.__dict__)
        d.update(
            version=1, parent=None,
            files=_abs(snap.files), delta_files=_abs(snap.delta_files),
            operation=f"clone:{self.path}@v{snap.version}",
            committed_at_ms=int(time.time() * 1000),
        )
        t._write_snapshot(_Snapshot(**d))
        return t

    # -- retention / garbage collection ------------------------------------

    def expire_snapshots(self, keep_last: int = 10) -> list[int]:
        """Delete snapshot log entries older than the newest ``keep_last``
        (the Iceberg ``expire_snapshots`` analog). Time travel and
        ``scan_changes`` reach back only as far as the oldest retained
        snapshot afterwards. Data files are NOT touched here — run
        :meth:`vacuum` to drop files no retained snapshot references.
        Versions pinned by a named ref (:meth:`create_tag`) are kept
        regardless of age. Returns the expired version numbers."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        versions = sorted(
            int(n[1:9])
            for n in self._fs.listdir(self._log_path)
            if n.startswith("v") and n.endswith(".json")
        )
        pinned = {int(r["version"]) for r in self.list_refs().values()}
        expired = [v for v in versions[:-keep_last] if v not in pinned]
        for v in expired:
            self._fs.remove(os.path.join(self._log_path, f"v{v:08d}.json"))
        return expired

    def vacuum(self, orphan_ttl_s: float = 3600.0) -> dict:
        """Remove data files referenced by NO retained snapshot and stale
        ``.stage-*`` write directories (the ``remove_orphan_files``
        analog; crash-killed writes leave both behind).

        Only paths older than ``orphan_ttl_s`` are deleted: a concurrent
        writer's files exist on disk BEFORE its snapshot commits, so a
        too-eager vacuum would eat an in-flight commit — the TTL is the
        standard defense (Iceberg defaults to 3 days; an hour is generous
        for a single commit). Snapshot logs themselves are immutable, so
        reference collection over every retained version is exact."""
        now = time.time()
        referenced: set[str] = set()
        referenced_blooms: set[str] = set()
        for name in self._fs.listdir(self._log_path):
            if name.startswith("v") and name.endswith(".json"):
                snap = self.snapshot(int(name[1:9]))
                referenced.update(f["path"] for f in snap.files + snap.delta_files)
                referenced_blooms.update(
                    f["bloom"] for f in snap.files + snap.delta_files if f.get("bloom")
                )
        removed_files: list[str] = []
        for fn in self._fs.listdir(self._data_path):
            rel = os.path.join(_DATA_DIR, fn)
            full = os.path.join(self._data_path, fn)
            if rel in referenced:
                continue
            try:
                if now - self._fs.mtime(full) < orphan_ttl_s:
                    continue
                self._fs.remove(full)
                removed_files.append(rel)
            except OSError:
                continue
        # bloom sidecars referenced by no retained snapshot (expired
        # versions, or a crash between sidecar write and snapshot commit)
        removed_blooms = 0
        bloom_dir = os.path.join(self._log_path, _BLOOM_DIR)
        if self._fs.isdir(bloom_dir):
            for fn in self._fs.listdir(bloom_dir):
                rel = os.path.join(_BLOOM_DIR, fn)
                if rel in referenced_blooms:
                    continue
                try:
                    if now - self._fs.mtime(os.path.join(bloom_dir, fn)) < orphan_ttl_s:
                        continue
                    self._fs.remove(os.path.join(bloom_dir, fn))
                    removed_blooms += 1
                except OSError:
                    continue
        removed_stages = 0
        for dn in self._fs.listdir(self.path):
            full = os.path.join(self.path, dn)
            if dn.startswith(".stage-") and self._fs.isdir(full):
                try:
                    if now - self._fs.mtime(full) >= orphan_ttl_s:
                        self._fs.rmtree(full)
                        removed_stages += 1
                except OSError:
                    continue
        # SEALED (published) WAP branches: publish_branch commits branch
        # data files into main's manifest under _branches/{name}/data/ and
        # removes the branch log (lake/wap.py). Once compaction rewrites
        # those rows into main's own data dir the entries drop out of every
        # retained snapshot — sweep them here exactly like main's data dir,
        # and drop a sealed branch dir entirely once it holds no data.
        # ACTIVE branches (log present) are their own tables: never touched.
        branches_root = os.path.join(self.path, _BRANCH_DIR)
        removed_branches = 0
        if self._fs.isdir(branches_root):
            for bn in self._fs.listdir(branches_root):
                bdir = os.path.join(branches_root, bn)
                if not self._fs.isdir(bdir) or self._fs.isdir(os.path.join(bdir, _LOG_DIR)):
                    continue
                bdata = os.path.join(bdir, _DATA_DIR)
                live = 0
                for fn in (self._fs.listdir(bdata) if self._fs.isdir(bdata) else []):
                    rel = os.path.join(_BRANCH_DIR, bn, _DATA_DIR, fn)
                    if rel in referenced:
                        live += 1
                        continue
                    try:
                        if now - self._fs.mtime(os.path.join(bdata, fn)) < orphan_ttl_s:
                            live += 1
                            continue
                        self._fs.remove(os.path.join(bdata, fn))
                        removed_files.append(rel)
                    except OSError:
                        live += 1
                if not live:
                    try:
                        if now - self._fs.mtime(bdir) >= orphan_ttl_s:
                            self._fs.rmtree(bdir)
                            removed_branches += 1
                    except OSError:
                        pass
        return {"removed_files": removed_files, "removed_stage_dirs": removed_stages,
                "removed_sealed_branches": removed_branches,
                "removed_bloom_sidecars": removed_blooms}

    def compact(
        self,
        purge_tombstones_below: int | None = None,
        cluster: bool = True,
        zorder_cols: list[str] | None = None,
    ) -> int | None:
        """Fold MOR delta files into the base — **incrementally**: only
        buckets that actually have delta files are reconciled and rewritten;
        untouched base files carry over by reference (at 100 TB an epoch
        touching 1% of buckets compacts 1% of the table, not all of it).

        Winners keep their ``__lsn`` so later deltas still order correctly,
        and **delete winners are retained as tombstone rows** (filtered at
        scan) — dropping them would let a late-arriving lower-LSN upsert
        from a lagging shard resurrect a deleted key. Pass
        ``purge_tombstones_below`` = a low-watermark LSN (below which no
        shard can still deliver events, e.g. min across shard cursors) to
        garbage-collect tombstones older than it. One atomic snapshot swap.

        ``cluster`` (default on) sorts each rewritten bucket by
        (bucket key, merge key, __lsn) — the Iceberg sort-order /
        ``rewrite_data_files(sort)`` analog. Compaction is the one moment
        the table pays a full rewrite of the touched buckets anyway, so
        clustering there is near-free and buys row-group-level predicate
        pruning for every later point/range read of the big base files
        (delta files stay write-order: they're small and short-lived).
        """
        snap = self.snapshot()
        if not snap.delta_files:
            return None
        delta_buckets = _buckets_of(snap.delta_files, snap.n_buckets)
        rewritten = {f["path"] for f in _bucket_pick(snap.files, delta_buckets, snap.n_buckets)}
        keep_files = [f for f in snap.files if f["path"] not in rewritten]
        winners = self._reconciled(snap, buckets=delta_buckets, keep_deletes=True)
        if purge_tombstones_below is not None:
            winners = winners.filter(
                ~((F.col("__op") == "D") & (F.col("__lsn") < F.lit(purge_tombstones_below)))
            )
        out_cols = [f["name"] for f in snap.current_fields()]
        body = winners.select(*out_cols, "__lsn", "__op")
        sort_cols = None
        if zorder_cols:
            # Z-ORDER layout (Delta OPTIMIZE ZORDER / Iceberg z-ordered
            # rewrite analog): each named column maps to an
            # order-preserving BIGINT, normalizes to 16 bits against its
            # GLOBAL range over the rewritten winners (one extra agg —
            # compaction already pays a full rewrite), and the bits
            # interleave into one sort key, so every parquet row group
            # covers a narrow range of EVERY z-ordered column — pushed
            # predicates on any of them skip row groups, and scan_where's
            # manifest stats tighten for all of them at once.
            fields = {f["name"]: f["type"] for f in snap.current_fields()}
            unknown = sorted(set(zorder_cols) - set(fields))
            if unknown:
                raise ValueError(f"unknown zorder column(s) {unknown}")
            from ..ckpt import free_checkpoint

            body = body.localCheckpoint()  # ranges agg + write share one pass
            bases = {c: _zbase_expr(c, fields[c]) for c in zorder_cols}
            rng = body.agg(
                *[F.expr(f"min({b})").alias(f"lo{i}") for i, b in enumerate(bases.values())],
                *[F.expr(f"max({b})").alias(f"hi{i}") for i, b in enumerate(bases.values())],
            ).collect()[0]
            # normalize in DOUBLE, not BIGINT arithmetic: (x - lo) * 65535
            # overflows long for wide ranges (a timestamp column spanning
            # >~4.5 years, or hash-derived ids spanning >2^47), and under
            # Spark 4's default ANSI mode the whole compaction would throw.
            # span is computed driver-side in Python (arbitrary precision),
            # and double's 52-bit mantissa is far more resolution than the
            # <=16 layout bits we keep.
            zbits = _zorder_bits(len(zorder_cols))
            max_norm = (1 << zbits) - 1
            norms = []
            for i, b in enumerate(bases.values()):
                lo = rng[f"lo{i}"] if rng[f"lo{i}"] is not None else 0
                hi = rng[f"hi{i}"] if rng[f"hi{i}"] is not None else 0
                scale = float(max_norm) / float(max(hi - lo, 1))
                norms.append(
                    f"CAST(least(greatest((CAST(coalesce({b}, {lo}) AS DOUBLE)"
                    f" - CAST({lo} AS DOUBLE)) * {scale!r}, 0D), {max_norm}D) AS BIGINT)"
                )
            body = body.withColumn("__zval", F.expr(_zvalue_expr(norms, bits=zbits)))
            sort_cols = ["__zval"]
            new_files = self._write_data_files(snap, body, sort_cols=sort_cols)
            free_checkpoint(body)
        else:
            if cluster:
                key = list(snap.bucket_key)
                key += [k for k in snap.merge_key if k not in key]
                sort_cols = key + ["__lsn"]
            new_files = self._write_data_files(snap, body, sort_cols=sort_cols)
        child = self._child(
            snap, files=keep_files + new_files, delta_files=[], operation="compact"
        )
        self._write_snapshot(child)
        return child.version

    def rebucket(self, n_buckets: int) -> int:
        """Change the table's bucket count — **metadata-only, zero Spark
        jobs** (the Iceberg partition-spec-evolution analog for the bucket
        transform). A table created with 16 buckets is mis-sized once it
        holds 100 TB; rewriting everything up front is exactly what a big
        table cannot afford, so existing files keep their layout and are
        stamped with the spec they were written under (``nb``); every
        bucket-pruned read resolves each file against its OWN spec
        (:func:`_bucket_pick` — exact when the counts nest, conservative
        otherwise), new writes land under the new spec, and old files
        migrate incrementally as COW merges / compactions rewrite them
        (or eagerly via :meth:`migrate_bucket_spec`).

        The new count must be a multiple or divisor of the current one —
        ``pmod(hash, n)`` nests only across nesting moduli; anything else
        would make every pre-change file unprunable forever."""
        snap = self.snapshot()
        old = snap.n_buckets
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        if n_buckets == old:
            raise ValueError(f"table already has {old} buckets")
        if not (n_buckets % old == 0 or old % n_buckets == 0):
            raise ValueError(
                f"new bucket count {n_buckets} must be a multiple or divisor "
                f"of the current {old} (hash buckets nest only across "
                "nesting moduli; non-nesting counts would defeat pruning "
                "for every existing file)"
            )

        def stamp(entries: list[dict]) -> list[dict]:
            # files lacking `nb` were written under the snapshot's current
            # spec; record it before the spec changes
            return [{**f, "nb": f.get("nb") or old} for f in entries]

        child = self._child(
            snap,
            files=stamp(snap.files),
            delta_files=stamp(snap.delta_files),
            n_buckets=n_buckets,
            operation=f"rebucket:{old}->{n_buckets}",
        )
        self._write_snapshot(child)
        return child.version

    def migrate_bucket_spec(self) -> int | None:
        """Eagerly rewrite any data files still on an old bucket spec under
        the current one. Reads are correct without this (spec-aware pruning
        handles mixed manifests); migration just restores maximal pruning
        and uniform write-task sizing. Commits as a compaction (a rewrite
        of already-delivered rows), so ``scan_changes`` emits nothing for
        it. Returns the new version, or None when nothing is stale."""
        snap = self.snapshot()
        stale = [
            f for f in snap.files + snap.delta_files
            if (f.get("nb") or snap.n_buckets) != snap.n_buckets
        ]
        if not stale:
            return None
        buckets = _buckets_of(stale, snap.n_buckets)
        rw = {f["path"] for f in _bucket_pick(snap.files, buckets, snap.n_buckets)}
        rw_d = {f["path"] for f in _bucket_pick(snap.delta_files, buckets, snap.n_buckets)}
        keep = [f for f in snap.files if f["path"] not in rw]
        keep_d = [f for f in snap.delta_files if f["path"] not in rw_d]
        # reconcile the covered buckets (folds their deltas too) and rewrite
        # under the current spec, tombstones retained — same contract as
        # compact(); clustering keeps the row-group pruning property
        winners = self._reconciled(snap, buckets=buckets, keep_deletes=True)
        key = list(snap.bucket_key)
        key += [k for k in snap.merge_key if k not in key]
        new_files = self._write_data_files(
            snap,
            winners.select(*[f["name"] for f in snap.current_fields()], "__lsn", "__op"),
            sort_cols=key + ["__lsn"],
        )
        child = self._child(
            snap,
            files=keep + new_files,
            delta_files=keep_d,
            operation="compact:rebucket-migrate",
        )
        self._write_snapshot(child)
        return child.version
