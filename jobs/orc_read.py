"""Distributed ORC file ingestion (SURVEY.md §2.5 M6 as a *file*
surface, the read twin of jobs/orc_write.py).

Two-stage plan, nothing funnels through the driver:

1. **Plan** — the file list is parallelized and each task range-reads
   only the ~KB file tails (engine.orc_read.read_orc_tail), emitting
   one split row per stripe ``(path, stripe, n_rows)``. The driver
   opens exactly ONE tail, to learn the schema. At 100 TB this is the
   shape that matters: a million-file listing costs the cluster a
   million tail reads (KBs each), not a million whole-file reads, and
   no per-file work happens on the driver.
2. **Decode** — splits are spread round-robin across the target
   parallelism; each task groups its splits by file and range-reads
   just those stripes' bytes (engine.orc_read.read_orc_stripes), so a
   file split 100 ways costs each task 1/100th of its bytes. Column
   projection skips unprojected streams entirely (never inflated).

The decoders are this engine's vectorized codecs, so files written by
ORC C++ (pyarrow), orc-core Java (spark.write.orc), or
jobs/orc_write.py all come back identically — cross-checked in
tests/test_orc_read.py and the ``orc_read_distributed`` driver query.

Path contract: files must be visible to every task (shared FS or
local mode), same as jobs/orc_write.py; the object-store swap-in is
the Hadoop FS API.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.pandas.types import from_arrow_schema, to_arrow_schema

from jobs.table_io import _require_local

SPLIT_DDL = "path string, stripe bigint, n_rows bigint"


class EmptyOrcDirError(FileNotFoundError):
    """A path that resolved but yielded ZERO .orc files — an empty
    directory, a glob with no matches, or a legitimately-committed
    empty snapshot (a write of zero rows publishes a manifest naming
    no files). Distinct from plain FileNotFoundError so surfaces with
    a user-supplied schema (orcx partitions()) can map *emptiness* to
    a valid empty scan while the fail-loud corruption signals — no
    _SUCCESS manifest, manifest naming deleted files — still raise."""


def list_orc_files(path: str, use_manifest: bool = False) -> list[str]:
    """Deterministic file list for a directory, a glob, or one file.

    ``use_manifest``: read the committed SNAPSHOT instead of the
    listing — the ``_SUCCESS`` manifest the orcx batch writer commits
    (jobs/datasource.py) names exactly the files its job published,
    so a reader sees an atomic job result even while stragglers,
    retries of a newer job, or an in-progress compaction are adding
    files to the same directory. Fail-loud when the manifest names a
    file that no longer exists (the snapshot was broken by a delete,
    not by concurrent adds) or when no manifest exists."""
    path = _require_local(path)
    if use_manifest:
        import json as _json
        m = os.path.join(path, "_SUCCESS")
        if not os.path.isfile(m):
            raise FileNotFoundError(
                f"{path!r} has no _SUCCESS manifest; written by a "
                "non-committing writer? (use_manifest=False lists "
                "the directory instead)")
        with open(m) as f:
            files = sorted(_json.loads(line)["path"]
                           for line in f if line.strip())
        missing = [p for p in files if not os.path.isfile(p)]
        if missing:
            raise FileNotFoundError(
                f"manifest {m} names deleted files: {missing[:3]}")
        if not files:
            # a zero-row job commits a manifest naming no files: a
            # valid (empty) snapshot, not corruption — the sentinel
            # lets schema-supplied scans return empty instead of the
            # files[0] IndexError this used to hit downstream
            raise EmptyOrcDirError(
                f"manifest {m} commits an empty snapshot "
                "(zero files)")
        return files
    if os.path.isdir(path):
        found = sorted(glob.glob(os.path.join(path, "*.orc")))
        if not found:
            # fail loud here, once, instead of the obscure downstream
            # crashes an empty listing used to cause (files[0] Index-
            # Error, ThreadPoolExecutor(max_workers=0), repartition(0))
            raise EmptyOrcDirError(
                f"directory {path!r} contains no .orc files")
        return found
    found = sorted(glob.glob(path))
    if not found:
        if glob.has_magic(path):
            raise EmptyOrcDirError(f"no ORC files match {path!r}")
        raise FileNotFoundError(f"no ORC files match {path!r}")
    return found


_INT_RANK = {8: 0, 16: 1, 32: 2, 64: 3}  # bit width; ORC ints are signed


def _widen_type(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """The wider of two ORC-file types along orc-core's
    ConvertTreeReader widening axes — int8→int16→int32→int64,
    float→double, and decimal precision growth at equal scale —
    recursing through list/struct shapes. Anything else (string vs
    int, scale drift, narrowing would lose rows) raises: a mixed
    directory that far gone needs an explicit rewrite, not a guess."""
    if a.equals(b):
        return a
    if pa.types.is_integer(a) and pa.types.is_integer(b):
        return a if _INT_RANK[a.bit_width] >= _INT_RANK[b.bit_width] \
            else b
    if pa.types.is_floating(a) and pa.types.is_floating(b):
        return a if a == pa.float64() else b
    if pa.types.is_decimal(a) and pa.types.is_decimal(b) \
            and a.scale == b.scale:
        # precision growth only widens the digit budget: every value
        # of the narrow file fits the wide type exactly
        return a if a.precision >= b.precision else b
    if pa.types.is_large_list(a) and pa.types.is_large_list(b):
        return pa.large_list(_widen_type(a.value_type, b.value_type))
    if pa.types.is_struct(a) and pa.types.is_struct(b) and \
            [f.name for f in a] == [f.name for f in b]:
        return pa.struct([
            pa.field(f.name, _widen_type(f.type, b.field(i).type))
            for i, f in enumerate(a)])
    raise ValueError(f"ORC schema drift {a} vs {b} is not a widening")


def merged_orc_schema(files: list[str],
                      spark: SparkSession | None = None,
                      distributed_threshold: int = 64) -> pa.Schema:
    """The union-of-fields, widest-of-types Arrow schema across a
    directory's file tails — the reference schema an evolving job's
    directory needs (columns added over time, int32 columns widened
    to int64, float to double; orc-core ConvertTreeReader semantics).
    Field order is first-seen. Probing reads only the ~KB tails:
    threaded driver-side below ``distributed_threshold`` files, as a
    one-stage Spark job above it (one tail read per task row, tiny
    serialized schemas back to the driver) so a million-file listing
    never serializes through driver threads."""
    from engine.orc_read import read_orc_tail
    if spark is not None and len(files) > distributed_threshold:
        paths = spark.createDataFrame([(f,) for f in files],
                                      "path string")
        n_plan = max(1, min(len(files),
                            spark.sparkContext.defaultParallelism))

        def tails(batches):
            import pyarrow as pa

            from engine.orc_read import read_orc_tail
            for batch in batches:
                for p in batch.column("path").to_pylist():
                    buf = read_orc_tail(p).schema().serialize()
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([p], type=pa.large_string()),
                         pa.array([buf.to_pybytes()],
                                  type=pa.large_binary())],
                        names=["path", "schema"])

        rows = (paths.repartition(n_plan)
                .mapInArrow(tails, "path string, schema binary")
                .collect())
        # collect() order follows task/partition order, not the file
        # listing: re-sort by the input list so "first-seen" field
        # order (and thus the merged schema) is deterministic
        order = {p: i for i, p in enumerate(files)}
        rows.sort(key=lambda r: order[r["path"]])
        schemas = [pa.ipc.read_schema(pa.py_buffer(bytes(r["schema"])))
                   for r in rows]
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(32, len(files))) as ex:
            schemas = list(ex.map(
                lambda p: read_orc_tail(p).schema(), files))
    fields: dict[str, pa.DataType] = {}
    for sch in schemas:
        for f in sch:
            if f.name in fields:
                try:
                    fields[f.name] = _widen_type(fields[f.name], f.type)
                except (ValueError, KeyError) as e:
                    raise ValueError(
                        f"column {f.name!r} across this directory: {e}")
            else:
                fields[f.name] = f.type
    return pa.schema(list(fields.items()))


def plan_orc_splits(spark: SparkSession, files: list[str],
                    filters: list[tuple] | None = None) -> DataFrame:
    """Stage 1: distributed tail reads -> one row per stripe that MAY
    match ``filters`` (see engine.orc_read.stripes_matching — pruning
    happens against the per-stripe statistics in each file's Metadata
    section, so pruned stripes cost ZERO stripe-byte reads; a file
    without statistics keeps all its stripes). The lazy result is
    safe to cache/checkpoint as a scan manifest."""
    paths = spark.createDataFrame([(f,) for f in files], "path string")
    n_plan = max(1, min(len(files), spark.sparkContext.defaultParallelism))

    def tails(batches):
        import pyarrow as pa

        from engine.orc_read import read_orc_tail, stripes_matching
        for batch in batches:
            for p in batch.column("path").to_pylist():
                info = read_orc_tail(p)
                keep = stripes_matching(info, filters)
                # type= matters: for a fully-pruned file keep == [] and
                # an untyped pa.array([]) infers null type, producing a
                # batch whose schema differs from sibling batches
                # (ArrowInvalid at the mapInArrow writer)
                yield pa.RecordBatch.from_arrays(
                    [pa.array([p] * len(keep), type=pa.string()),
                     pa.array(keep, type=pa.int64()),
                     pa.array([info.stripes[i][5] for i in keep],
                              type=pa.int64())],
                    names=["path", "stripe", "n_rows"])

    return paths.repartition(n_plan).mapInArrow(tails, SPLIT_DDL)


def read_orc_dir_stats(spark: SparkSession, path: str,
                       columns: list[str],
                       sums: list[str] | tuple = (),
                       use_manifest: bool = False) -> DataFrame:
    """Metadata-only table statistics: one row per file with its row
    count and each requested column's file-level min/max, read from
    the ~KB file tails ALONE (engine.orc_read.OrcFileInfo.file_stats —
    Footer ColumnStatistics; zero stripe bytes touched). COUNT/MIN/MAX
    over a million-file table costs one tail read per file. Columns
    must be int/float/string/decimal/date top-level fields; a file
    without footer statistics yields typed nulls for min/max (its
    n_rows still counts).

    ``sums``: integer or float columns to additionally surface the
    footer statistics sum for (``sum_<col>``: int64 from
    IntegerStatistics, float64 from DoubleStatistics — field 3 of
    both) — SUM over a whole table from file tails alone. Null when
    a file's writer omitted the sum (int overflow / non-finite
    float convention, pre-sum writer). Float sums are order-
    dependent in the last ulp, exactly like any parallel SUM.

    ``use_manifest``: aggregate over the ``_SUCCESS``-committed
    snapshot instead of the listing (see list_orc_files)."""
    files = list_orc_files(path, use_manifest=use_manifest)
    from engine.orc_read import read_orc_tail
    schema = read_orc_tail(files[0]).schema()
    fields = [pa.field("path", pa.string()),
              pa.field("n_rows", pa.int64())]
    for c in columns:
        i = schema.get_field_index(c)
        if i < 0:
            raise KeyError(f"column {c!r} not in ORC schema "
                           f"{schema.names}")
        t = schema.field(i).type
        if pa.types.is_date(t):
            t = pa.date32()
        elif not (pa.types.is_integer(t) or pa.types.is_floating(t)
                  or pa.types.is_string(t) or pa.types.is_large_string(t)
                  or pa.types.is_decimal(t)):
            raise NotImplementedError(
                f"tail-stats on column {c!r} of type {t} (supported: "
                "int/float/string/decimal/date)")
        fields.append(pa.field(f"min_{c}", t))
        fields.append(pa.field(f"max_{c}", t))
    for c in sums:
        i = schema.get_field_index(c)
        if i < 0:
            raise KeyError(f"column {c!r} not in ORC schema "
                           f"{schema.names}")
        t = schema.field(i).type
        if pa.types.is_integer(t):
            fields.append(pa.field(f"sum_{c}", pa.int64()))
        elif pa.types.is_floating(t):
            fields.append(pa.field(f"sum_{c}", pa.float64()))
        else:
            raise NotImplementedError(
                f"tail-sum on column {c!r}: only integer "
                "(IntegerStatistics) and float (DoubleStatistics) "
                "columns carry a footer sum")
    out_schema = pa.schema(fields)
    ddl = ", ".join(
        f"{f.name} {from_arrow_schema(pa.schema([f]))[0].dataType.simpleString()}"
        for f in out_schema)
    paths = spark.createDataFrame([(f,) for f in files], "path string")
    n_plan = max(1, min(len(files), spark.sparkContext.defaultParallelism))

    def tails(batches):
        import pyarrow as pa

        from engine.orc_read import read_orc_tail
        for batch in batches:
            for p in batch.column("path").to_pylist():
                info = read_orc_tail(p)
                fs = info.file_stats()
                sch = info.schema()
                arrs = [pa.array([p], type=pa.string()),
                        pa.array([info.num_rows], type=pa.int64())]
                for c in columns:
                    # flattened ids: root=0, top-level col i -> subtree
                    # root at root.subtypes[i]. A schema-evolved file
                    # missing the column yields typed nulls (its
                    # n_rows still counts) — get_field_index returns
                    # -1 there, which would silently index the LAST
                    # column's stats
                    j = sch.get_field_index(c)
                    if j < 0:
                        st = {}
                    else:
                        fid = info.types[0].subtypes[j]
                        st = (fs[fid] if fs and fid < len(fs)
                              else {}) or {}
                    typ = out_schema.field(f"min_{c}").type
                    for key in ("min", "max"):
                        v = st.get(key)
                        if v is not None and pa.types.is_date32(typ):
                            arr = pa.array([v], type=pa.int32()) \
                                .cast(pa.date32())
                        else:
                            arr = pa.array([v], type=typ)
                        arrs.append(arr)
                for c in sums:
                    j = sch.get_field_index(c)
                    st = {}
                    if j >= 0:
                        fid = info.types[0].subtypes[j]
                        st = (fs[fid] if fs and fid < len(fs)
                              else {}) or {}
                    arrs.append(pa.array(
                        [st.get("sum")],
                        type=out_schema.field(f"sum_{c}").type))
                yield pa.RecordBatch.from_arrays(
                    arrs, schema=out_schema)

    return paths.repartition(n_plan).mapInArrow(tails, ddl)


def read_orc_dir(spark: SparkSession, path: str,
                 columns: list[str] | None = None,
                 convention: str | None = None,
                 parallelism: int | None = None,
                 filters: list[tuple] | None = None,
                 allow_missing_columns: bool = False,
                 use_manifest: bool = False,
                 merge_schemas: bool = False) -> DataFrame:
    """Read a directory of ORC files as a DataFrame with this
    engine's decoders. ``convention`` pins the pre-1970 timestamp
    convention (default: keyed per file off ``Footer.writer``,
    engine/orc_read.py). Schemas must agree across files (checked in
    the decode tasks against the driver-probed first tail), unless
    ``allow_missing_columns`` is set: then a file lacking a projected
    column fills it with typed nulls — the spark.read.orc
    ``mergeSchema`` ergonomics for a directory written by an evolving
    job (columns added over time). The column's TYPE still must agree
    where present; the driver-probed first tail is the reference, so
    point ``columns`` at the union schema (or probe the newest file
    first) when schemas differ.

    ``merge_schemas``: probe EVERY tail and read at the
    union-of-fields, widest-of-types schema (merged_orc_schema —
    int8→int16→int32→int64 and float→double drift casts up per file,
    orc-core ConvertTreeReader semantics; missing columns null-fill
    as with allow_missing_columns). The probe distributes as a Spark
    job above 64 files, so the driver never fans a huge listing
    through threads.

    ``filters``: [(column, op, literal)] conjunction pushed down in
    THREE tiers — planning drops statistics-precluded stripes before
    any stripe byte is read (engine.orc_read.stripes_matching); each
    decode task then drops statistics-precluded ROW GROUPS inside its
    stripes and seeks directly to the survivors via the ROW_INDEX
    positions (engine.orc_read.row_groups_matching); finally the same
    predicates re-apply as an exact Spark filter on the decoded rows,
    so the result is exact, not a superset. Filter columns are
    auto-added to the decode projection if missing from ``columns``
    (and pruned from the result); a dotted filter column
    (``meta.score``) prunes on the nested field's own statistics and
    projects its top-level root struct.
    """
    files = list_orc_files(path, use_manifest=use_manifest)
    from engine.orc_read import read_orc_tail
    if merge_schemas:
        arrow_schema = merged_orc_schema(files, spark=spark)
        allow_missing_columns = True
    else:
        arrow_schema = read_orc_tail(files[0]).schema()
    out_columns = columns
    if columns is not None and filters:
        # a nested filter column projects its top-level root struct
        roots = [f[0] if arrow_schema.get_field_index(f[0]) >= 0
                 else f[0].split(".")[0] for f in filters]
        # dict.fromkeys: a range filter contributes its column once
        columns = columns + list(dict.fromkeys(
            r for r in roots if r not in columns))
    if columns is not None:
        missing = [c for c in columns if arrow_schema.get_field_index(c) < 0]
        if missing:
            raise KeyError(f"columns not in ORC schema: {missing}")
        arrow_schema = pa.schema(
            [arrow_schema.field(c) for c in columns])
    # prefer_timestamp_ntz=False: Spark's own ORC reader maps the
    # plain `timestamp` kind to TIMESTAMP (LTZ) — match it, so this
    # reader is a drop-in for spark.read.orc on the same files
    spark_schema = from_arrow_schema(arrow_schema,
                                     prefer_timestamp_ntz=False)
    # Spark's own arrow convention (us timestamps, utf8 not
    # large_utf8) — the kernel casts each stripe batch into it
    target = to_arrow_schema(spark_schema)
    names = arrow_schema.names

    splits = plan_orc_splits(spark, files, filters)
    n_dec = parallelism or spark.sparkContext.defaultParallelism

    def decode(batches):
        import pyarrow as pa

        from engine.orc_read import read_orc_stripes, read_orc_tail
        by_path: dict[str, list[int]] = {}
        for batch in batches:
            for row in batch.to_pylist():
                by_path.setdefault(row["path"], []).append(row["stripe"])
        for p, stripes in sorted(by_path.items()):
            info = read_orc_tail(p)
            got = info.types[0].field_names
            absent = [c for c in names if c not in got]
            if absent and not allow_missing_columns:
                raise ValueError(
                    f"{p}: ORC schema {got} lacks projected {names}; "
                    "pass allow_missing_columns=True to null-fill "
                    "columns this file predates")
            tbl = read_orc_stripes(p, sorted(stripes),
                                   columns=[c for c in names
                                            if c not in absent],
                                   convention=convention, info=info,
                                   filters=filters)
            for c in absent:
                # typed nulls at the probed schema's type: the standard
                # added-column semantics (rows predate the column)
                tbl = tbl.append_column(
                    target.field(c),
                    pa.nulls(len(tbl), target.field(c).type))
            yield from tbl.select(names).cast(target).to_batches()

    out = splits.repartition(n_dec).mapInArrow(decode, spark_schema)
    if filters:
        out = out.where(_filter_column(filters))
    if out_columns is not None and out_columns != columns:
        out = out.select(*out_columns)
    return out


def _filter_column(filters: list[tuple]):
    """The exact Spark predicate equivalent to the pruning filters."""
    from pyspark.sql import functions as F
    cond = None
    for name, op, val in filters:
        c = F.col(name)
        if op == "is_null":
            e = c.isNull()
        elif op == "not_null":
            e = c.isNotNull()
        elif op in ("=", "=="):
            e = c == val
        elif op == "in":
            e = c.isin(list(val))
        elif op == "starts_with":
            e = c.startswith(val)
        elif op == "<":
            e = c < val
        elif op == "<=":
            e = c <= val
        elif op == ">":
            e = c > val
        elif op == ">=":
            e = c >= val
        else:
            raise ValueError(f"unsupported filter op {op!r}")
        cond = e if cond is None else cond & e
    return cond
