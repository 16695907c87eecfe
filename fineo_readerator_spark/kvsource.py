"""Python DataSource V2 for a hash-bucketed KV snapshot, with the
reference's key-aware read planning (Get / Query / Scan selection).

Re-expresses, Spark-first, the DynamoDB storage plugin's planning surface:
- `storage-dynamo/.../filter/DynamoReadBuilder.java:26-52` — full-key
  equality plans a GET; hash-key equality + at most one sort-key condition
  (or BETWEEN) plans a QUERY; anything else degrades to a filtered SCAN;
  a pk IN-list (the reference's `q OR q`) plans multiple queries.
- `DynamoGroupScan.java:110-216` — scan work is segmented for parallel
  readers; here each hash bucket is one `InputPartition`, so Spark schedules
  the segments exactly like Drill's assignment creator did.
- `DynamoPushFilterIntoScan.java:46-172` — key conditions are consumed by
  the source; attribute predicates remain residual and Spark re-applies
  them (the reference keeps a residual filter too).

The snapshot layout is `<path>/__bucket=<i>/*.parquet` written by
``write_kv_snapshot``: rows are routed to buckets by a PORTABLE hash of the
partition key (md5-derived, same leaf as llm_ops), so the read side can
compute a key's bucket without any index — a GET/QUERY touches exactly one
bucket directory no matter how many the snapshot has.  At 100 TB that is
the difference between opening one file group and scanning the store.

Reads stream Arrow record batches (no per-row Python), so the only Python
cost is the batch plumbing — decode stays in pyarrow's C++.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterable, Iterator, List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:
    import pyarrow as pa

FORMAT_NAME = "fineo_kv"
_DEFAULT_BUCKETS = 16


def _declared_arrow_schema(schema: StructType):
    """The declared read schema as an Arrow schema — computed ONCE per
    read() call and passed into the per-batch cast (converting the
    StructType for every record batch would put schema-walking work on the
    scan hot path)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _cast_to_declared(batch: "pa.RecordBatch", target) -> "pa.RecordBatch":
    """Cast an Arrow batch to the DECLARED read schema.

    The stored physical types may legitimately differ from the declared
    logical ones (a SQL ``* 2.0`` literal writes decimal(23,1) where the
    reader declares double; int32 vs int64; …).  Handing Spark a raw batch
    with a mismatched vector crashes DEEP in the JVM
    (``ArrowColumnVector…getDouble UNSUPPORTED_CALL``), so cast here in
    Arrow C++ — and when the cast itself is impossible, fail with the
    column-level reason instead."""
    if batch.schema == target:
        return batch
    try:
        return batch.cast(target)
    except Exception as e:
        raise ValueError(
            f"fineo_kv: stored types {batch.schema} do not cast to the "
            f"declared schema {target}: {e}"
        ) from e


def _key_bucket_py(key: str, n_buckets: int) -> int:
    """Portable bucket of a partition key — first 15 hex chars of md5 as an
    integer, mod bucket count (identical to the Spark write-side expression)."""
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) % n_buckets


def write_kv_snapshot(
    df: DataFrame,
    path: str,
    pk_col: str,
    n_buckets: int = _DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Write a DataFrame as a bucketed KV snapshot readable by this source.

    Fully distributed: one shuffle on the bucket id routes rows; the bucket
    expression is the same md5 leaf ``_key_bucket_py`` uses, so readers can
    locate a key's bucket arithmetically.

    ``mode="append"`` adds a batch to an EXISTING snapshot (the nearline
    store's continuous-write shape): the bucket count and key column come
    from the stored meta — appending with a different family would route
    keys to the wrong buckets, so a mismatched ``pk_col``/``n_buckets``
    raises.

    The meta travels through the Hadoop FileSystem helpers (same FS the
    parquet goes to) — builtin ``open()`` would fail on an s3a/hdfs
    snapshot path (or silently miss the meta) even though the parquet
    append itself succeeds."""
    import json

    from fineo_readerator_spark.llm_ops.dedup import _fs_read_text, _fs_write_text

    spark = df.sparkSession
    meta_path = f"{path}/_kv_meta.json"
    if mode == "append":
        try:
            raw = _fs_read_text(spark, meta_path)
        except ValueError:
            raise ValueError(
                f"append to {path!r}: no _kv_meta.json — not an existing KV "
                "snapshot (write with mode='overwrite' first)"
            ) from None
        try:
            meta = json.loads(raw)
        except ValueError as e:
            # corrupt ≠ missing: the bucket data may be intact, so do NOT
            # advise the destructive overwrite (read_store_meta's pattern)
            raise ValueError(
                f"KV meta at {meta_path!r} is corrupt — inspect the snapshot "
                "before rewriting it"
            ) from e
        if meta["pk"] != pk_col or int(meta["n_buckets"]) != n_buckets:
            raise ValueError(
                f"append to {path!r} with (pk={pk_col!r}, n_buckets={n_buckets}) "
                f"does not match the stored family (pk={meta['pk']!r}, "
                f"n_buckets={meta['n_buckets']}) — keys would land in wrong buckets"
            )
    elif mode != "overwrite":
        raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(pk_col).cast("string")), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    (
        df.withColumn("__bucket", bucket)
        .repartition("__bucket")
        .write.mode(mode)
        .partitionBy("__bucket")
        .parquet(path)
    )
    # sparse snapshots omit empty bucket dirs, so the write-time bucket count
    # must travel with the data for the read side's key->bucket arithmetic
    if mode == "overwrite":
        _fs_write_text(
            spark, meta_path, json.dumps({"pk": pk_col, "n_buckets": n_buckets})
        )


@dataclass
class KVPartition(InputPartition):
    """One scheduled read unit: a bucket directory plus the key conditions
    the source consumed (mode is 'get', 'query' or 'scan' — recorded so plan
    tests can assert the selection like the reference's PlanValidator)."""

    bucket_dir: str
    mode: str
    pk_eq: Optional[object] = None  # typed key value (str only for bucketing)
    sk_eq: Optional[int] = None
    sk_lo: Optional[tuple] = None  # (value, inclusive)
    sk_hi: Optional[tuple] = None


class KVSnapshotReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.path = options["path"]
        self.pk_col = options.get("pk", "pk")
        self.sk_col = options.get("sk", "sk")
        import json

        with open(os.path.join(self.path, "_kv_meta.json")) as fh:
            self.n_buckets = int(json.load(fh)["n_buckets"])
        # consumed key conditions
        self.pk_in: Optional[List[str]] = None
        self.sk_eq: Optional[int] = None
        self.sk_lo: Optional[tuple] = None
        self.sk_hi: Optional[tuple] = None
        # consumed attribute (non-key) conditions — the reference's filter
        # expressions (`DynamoFilterSpec.java:25-46`): attribute_exists /
        # attribute_not_exists map to IsNotNull/IsNull, document-path
        # `contains`/`begins_with` map to the string leaves.  Evaluated by
        # the Arrow dataset reader inside every partition.  ``col`` is a
        # TUPLE of path segments: one segment for a top-level attribute,
        # several for a struct document path (`DynamoFilterSpec.java:25-46`
        # pushes nested paths the same way; pyarrow nested field refs
        # evaluate them in C++).
        self.attr_conds: List[tuple] = []  # (kind, col_path, value)
        # diagnostics: when set, pushFilters dumps consumed/residual
        # conditions as JSON — lets tests assert pushdown decisions made in
        # the isolated planning worker (same role as the reference's
        # PlanValidator output)
        self.debug_filters_path = options.get("debug_filters_path")
        # explicit document-path conditions (`.option("doc_path_filters",
        # json)`): Catalyst never translates MAP-key access into a DSv2
        # predicate, so map document paths — the Dynamo M-attribute shape
        # the reference pushes via `contains(a.b, x)` expressions
        # (`DynamoFilterSpec.java:25-46`) — are declared on the read
        # instead.  JSON list of [kind, "col.seg.seg", value] with kind in
        # eq/contains/startswith/endswith/isnull/notnull; paths may step
        # through struct fields AND map keys (evaluated by Arrow
        # struct_field/map_lookup in C++).
        raw = options.get("doc_path_filters")
        if raw:
            import json

            for kind, dotted, *rest in json.loads(raw):
                if kind not in ("eq", "contains", "startswith", "endswith", "isnull", "notnull"):
                    raise ValueError(f"doc_path_filters: unknown kind {kind!r}")
                path = tuple(dotted.split("."))
                # fail at PLANNING, not mid-scan: walk + leaf/kind typing
                self._check_doc_path(path, kind, rest[0] if rest else None)
                self.attr_conds.append((kind, path, rest[0] if rest else None))

    def _check_doc_path(self, path: tuple, kind: str, value) -> None:
        """Validate that ``path`` steps through struct fields / STRING-keyed
        map keys of the declared schema (map VALUE type continues the walk),
        and that the leaf type supports ``kind`` — an unchecked condition
        would crash every task mid-scan (ArrowNotImplementedError) or, for a
        missing eq value, silently filter everything to NULL."""
        from pyspark.sql.types import (
            MapType as _Mt,
            StringType as _Str,
            StructType as _St,
        )

        cur = self.schema
        for i, seg in enumerate(path):
            if isinstance(cur, _St):
                if seg not in cur.fieldNames():
                    raise ValueError(
                        f"doc_path_filters: {'.'.join(path)!r} — {seg!r} is not "
                        f"a field of {'.'.join(path[:i]) or 'the schema'!r}"
                    )
                cur = cur[seg].dataType
            elif isinstance(cur, _Mt):
                if not isinstance(cur.keyType, _Str):
                    raise ValueError(
                        f"doc_path_filters: {'.'.join(path)!r} — map step "
                        f"{seg!r} needs string keys, map has "
                        f"{cur.keyType.simpleString()} keys"
                    )
                cur = cur.valueType  # any key is a legal map step
            else:
                raise ValueError(
                    f"doc_path_filters: {'.'.join(path)!r} — cannot step into "
                    f"{cur.simpleString()} at segment {seg!r}"
                )
        if isinstance(cur, (_St, _Mt)):
            raise ValueError(
                f"doc_path_filters: {'.'.join(path)!r} ends on a "
                f"{cur.simpleString()} — conditions need a scalar leaf"
            )
        if kind in ("contains", "startswith", "endswith") and not isinstance(cur, _Str):
            raise ValueError(
                f"doc_path_filters: {kind!r} on {'.'.join(path)!r} needs a "
                f"string leaf, got {cur.simpleString()}"
            )
        if kind == "eq" and value is None:
            raise ValueError(
                f"doc_path_filters: 'eq' on {'.'.join(path)!r} is missing its "
                "value (an SQL `= NULL` never matches; use 'isnull' for the "
                "null check)"
            )

    def _is_struct_path(self, attr: tuple) -> bool:
        """True when every segment of a multi-segment attribute resolves
        through STRUCT fields of the declared schema — the document paths
        pyarrow nested refs can evaluate.  Map/array steps do not resolve
        (a map key is not a schema field) and stay residual."""
        from pyspark.sql.types import StructType as _St

        cur = self.schema
        for seg in attr:
            if not isinstance(cur, _St) or seg not in cur.fieldNames():
                return False
            cur = cur[seg].dataType
        return True

    def _bucket_dirs(self) -> List[str]:
        return sorted(
            os.path.join(self.path, d)
            for d in os.listdir(self.path)
            if d.startswith("__bucket=")
        )

    # -- pushdown (DynamoPushFilterIntoScan / DynamoFilterBuilder parity) --
    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:  # noqa: N802
        residual: List[Filter] = []
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr:
                residual.append(f)
                continue
            if len(attr) != 1:
                # struct document paths (the reference's `contains(a.b, x)` /
                # `begins_with` on nested attributes, DynamoFilterSpec.java:
                # 25-46) push into the Arrow nested-field filter; map/array
                # steps stay residual (Spark re-applies them)
                if self._is_struct_path(tuple(attr)):
                    path = tuple(attr)
                    if isinstance(f, EqualTo):
                        self.attr_conds.append(("eq", path, f.value))
                    elif isinstance(f, IsNull):
                        self.attr_conds.append(("isnull", path, None))
                    elif isinstance(f, IsNotNull):
                        self.attr_conds.append(("notnull", path, None))
                    elif isinstance(f, StringContains):
                        self.attr_conds.append(("contains", path, f.value))
                    elif isinstance(f, StringStartsWith):
                        self.attr_conds.append(("startswith", path, f.value))
                    elif isinstance(f, StringEndsWith):
                        self.attr_conds.append(("endswith", path, f.value))
                    else:
                        residual.append(f)
                else:
                    residual.append(f)
                continue
            col = attr[0]
            if isinstance(f, EqualTo) and col == self.pk_col:
                self.pk_in = [f.value]  # typed; bucket arithmetic stringifies
            elif isinstance(f, In) and col == self.pk_col and self.pk_in is None:
                # pk IN (...) = the reference's "OR of queries" -> multiple queries
                self.pk_in = list(f.value)
            elif isinstance(f, EqualTo) and col == self.sk_col:
                self.sk_eq = f.value
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)) and col == self.sk_col:
                self.sk_lo = (f.value, isinstance(f, GreaterThanOrEqual))
            elif isinstance(f, (LessThan, LessThanOrEqual)) and col == self.sk_col:
                self.sk_hi = (f.value, isinstance(f, LessThanOrEqual))
            elif isinstance(f, IsNull):
                # attribute_not_exists (`DynamoFilterSpec.java:34`); distinct
                # from `a = null`, which SQL folds to never-true before it
                # reaches the source (`DynamoFilterBuilder.java:49-54`)
                self.attr_conds.append(("isnull", (col,), None))
            elif isinstance(f, IsNotNull):
                self.attr_conds.append(("notnull", (col,), None))
            elif isinstance(f, EqualNullSafe):
                # `a <=> null` IS the null check; `a <=> v` is equality that
                # can never match a stored null — Arrow `==` already drops
                # nulls, so both legs push cleanly
                self.attr_conds.append(
                    ("isnull", (col,), None) if f.value is None else ("eq", (col,), f.value)
                )
            elif isinstance(f, StringContains):
                self.attr_conds.append(("contains", (col,), f.value))
            elif isinstance(f, StringStartsWith):
                self.attr_conds.append(("startswith", (col,), f.value))
            elif isinstance(f, StringEndsWith):
                self.attr_conds.append(("endswith", (col,), f.value))
            else:
                residual.append(f)
                continue
        if self.debug_filters_path:
            import json

            with open(self.debug_filters_path, "w") as fh:
                json.dump(
                    {
                        "mode": self.mode,
                        "consumed": [
                            [k, list(p), None if v is None else str(v)]
                            for k, p, v in self.attr_conds
                        ],
                        "residual": [type(f).__name__ for f in residual],
                    },
                    fh,
                )
        return residual

    @property
    def mode(self) -> str:
        """Planned read kind (`DynamoReadBuilder.java:26-52` semantics)."""
        if self.pk_in is not None and self.sk_eq is not None:
            return "get"  # full-key equality
        if self.pk_in is not None:
            return "query"  # hash = (+ optional sort range)
        return "scan"

    def partitions(self) -> Sequence[KVPartition]:
        mode = self.mode
        if self.pk_in is not None:
            # GET/QUERY touch only the keys' bucket dirs, one partition per
            # distinct bucket (multiple pk values may share one); a key whose
            # bucket dir is absent simply contributes no partition
            existing = set(self._bucket_dirs())
            by_bucket: dict[str, List[str]] = {}
            for pk in self.pk_in:
                b = os.path.join(self.path, f"__bucket={_key_bucket_py(str(pk), self.n_buckets)}")
                if b in existing:
                    by_bucket.setdefault(b, []).append(pk)
            return [
                KVPartition(
                    bucket_dir=b, mode=mode, pk_eq=pks[0] if len(pks) == 1 else None,
                    sk_eq=self.sk_eq, sk_lo=self.sk_lo, sk_hi=self.sk_hi,
                    # multiple pks in one bucket: carry them all via pk_list
                )
                for b, pks in sorted(by_bucket.items())
            ]
        # SCAN: every bucket is one segment (DynamoGroupScan.setScanWork)
        return [
            KVPartition(bucket_dir=d, mode=mode, sk_eq=self.sk_eq,
                        sk_lo=self.sk_lo, sk_hi=self.sk_hi)
            for d in self._bucket_dirs()
        ]

    def read(self, partition: KVPartition) -> Iterator["pa.RecordBatch"]:
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        dataset = ds.dataset(partition.bucket_dir, format="parquet")
        expr = None

        def conj(e):
            nonlocal expr
            expr = e if expr is None else (expr & e)

        if partition.pk_eq is not None:
            conj(pc.field(self.pk_col) == partition.pk_eq)
        elif self.pk_in is not None:
            conj(pc.field(self.pk_col).isin(self.pk_in))
        if partition.sk_eq is not None:
            conj(pc.field(self.sk_col) == partition.sk_eq)
        if partition.sk_lo is not None:
            v, inc = partition.sk_lo
            conj(pc.field(self.sk_col) >= v if inc else pc.field(self.sk_col) > v)
        if partition.sk_hi is not None:
            v, inc = partition.sk_hi
            conj(pc.field(self.sk_col) <= v if inc else pc.field(self.sk_col) < v)
        from pyspark.sql.types import MapType as _Mt, StructType as _St

        def path_ref(path: tuple):
            """Arrow expression for a document path: struct segments become
            field refs, map segments become ``map_lookup`` — both evaluated
            in C++ by the dataset scanner."""
            cur = self.schema
            ref = None
            for seg in path:
                if ref is None:
                    ref = pc.field(seg)
                    cur = cur[seg].dataType
                elif isinstance(cur, _St):
                    ref = pc.struct_field(ref, seg)
                    cur = cur[seg].dataType
                else:  # MapType — validated at construction
                    ref = pc.map_lookup(ref, query_key=seg, occurrence="first")
                    cur = cur.valueType
            return ref

        for kind, path, val in self.attr_conds:
            ref = path_ref(path)
            if kind == "isnull":
                conj(ref.is_null())
            elif kind == "notnull":
                conj(~ref.is_null())
            elif kind == "eq":
                conj(ref == val)
            elif kind == "contains":
                conj(pc.match_substring(ref, val))
            elif kind == "startswith":
                conj(pc.starts_with(ref, val))
            elif kind == "endswith":
                conj(pc.ends_with(ref, val))

        cols = [f.name for f in self.schema.fields]
        target = _declared_arrow_schema(self.schema)
        for batch in dataset.to_batches(columns=cols, filter=expr):
            if batch.num_rows:
                yield _cast_to_declared(batch, target)


@dataclass
class KVFilePartition(InputPartition):
    """One newly-arrived snapshot file of a streaming micro-batch."""

    file_path: str


class KVSnapshotStreamReader(DataSourceStreamReader):
    """``readStream`` over a LIVE bucketed snapshot — the reference's
    operating model for the nearline store: clients re-query DynamoDB as
    writes land (`SubTableScanBuilder.java:44-112` schedules the dynamo
    window on every read); here Spark's micro-batch loop does the
    re-querying with exactly-once offsets.

    Offsets are the sorted set of bucket-relative file names: each
    micro-batch's partitions are the files that APPEARED between offsets
    (parquet files are immutable once visible — writers add files, never
    append to them), one InputPartition per new file, decoded executor-side
    as Arrow batches.  The offset grows with the file count; production
    stores bound it with compaction (``operators.layout.compact``) or a
    file-registry topic — documented trade-off, same as Spark's own file
    streaming source."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.path = options["path"]

    def _current_files(self) -> List[str]:
        out = []
        for d in sorted(os.listdir(self.path)):
            if not d.startswith("__bucket="):
                continue
            full = os.path.join(self.path, d)
            out += [
                f"{d}/{f}"
                for f in os.listdir(full)
                if f.endswith(".parquet") or f.endswith(".snappy.parquet")
            ]
        return sorted(out)

    def initialOffset(self) -> dict:  # noqa: N802
        return {"files": []}  # consume everything present at start

    def latestOffset(self) -> dict:  # noqa: N802
        return {"files": self._current_files()}

    def partitions(self, start: dict, end: dict) -> Sequence[KVFilePartition]:
        new = sorted(set(end["files"]) - set(start["files"]))
        return [KVFilePartition(os.path.join(self.path, f)) for f in new]

    def read(self, partition: KVFilePartition) -> Iterator["pa.RecordBatch"]:
        import pyarrow.dataset as ds

        dataset = ds.dataset(partition.file_path, format="parquet")
        cols = [f.name for f in self.schema.fields]
        target = _declared_arrow_schema(self.schema)
        for batch in dataset.to_batches(columns=cols):
            if batch.num_rows:
                yield _cast_to_declared(batch, target)

    def commit(self, end: dict) -> None:
        pass  # file-set offsets are self-describing; nothing to release

    def stop(self) -> None:
        pass


class KVSnapshotDataSource(DataSource):
    """``spark.read.format("fineo_kv").option("path", ...).option("pk",
    col).option("sk", col).schema(s).load()`` — and ``spark.readStream``
    with the same options for the continuous nearline re-query."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        raise NotImplementedError("fineo_kv requires an explicit .schema(...)")

    def reader(self, schema: StructType) -> KVSnapshotReader:
        return KVSnapshotReader(schema, self.options)

    def streamReader(self, schema: StructType) -> KVSnapshotStreamReader:  # noqa: N802
        return KVSnapshotStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotently register the source with a session (and enable Python
    data-source filter pushdown, off by default in Spark 4.1)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(KVSnapshotDataSource)
