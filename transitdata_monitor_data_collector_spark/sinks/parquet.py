"""Partitioned parquet sink — the at-rest layout for the 100 TB store.

The reference keeps no history at all (every metric point is POSTed and
forgotten, src/mqtt_data_collector.py:236-253); an analytics engine needs
the opposite: an append-only columnar store the batch/PromQL query layer
can scan with partition pruning. The layout decisions here are the ones
that matter at scale:

- **Hive-style date partitioning** (``dt=YYYY-MM-DD[/hour=HH]``): every
  dashboard-range query carries a time predicate, so pruning removes
  whole directories before any IO. Cardinality stays bounded (365 dirs a
  year x 24) — never partition by high-cardinality keys like topic.
- **In-partition sort by the hot group keys** (broker, topic_filter):
  parquet row-group min/max stats then let scans skip row groups for
  selective key predicates — a poor man's z-order adequate for a
  two-level key.
- **Capped files per partition** via a pre-write repartition on the
  partition columns (+ key salt): avoids the many-small-files problem a
  32-reducer shuffle would otherwise create per daily partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_time_partitioned", "read_pruned", "write_zordered"]


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_cols: Sequence[str] = (),
    hourly: bool = False,
    files_per_partition: int = 1,
    mode: str = "append",
) -> None:
    """Write ``df`` partitioned by derived ``dt`` (and optionally ``hour``)
    columns, sorted within partitions by ``sort_cols``."""
    parts = ["dt"]
    out = df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
    if hourly:
        out = out.withColumn("hour", F.date_format(F.col(ts_col), "HH"))
        parts.append("hour")
    # one shuffle keyed on the partition cols (+ salt when >1 file is
    # wanted): each task writes to exactly one hive partition, producing
    # files_per_partition files there instead of one-per-reducer
    salt = (F.crc32(F.concat_ws("|", *sort_cols)) % files_per_partition
            if sort_cols else F.lit(0))
    out = out.repartition(*[F.col(c) for c in parts], salt.alias("__salt"))
    if sort_cols:
        out = out.sortWithinPartitions(*parts, *sort_cols)
    out.write.mode(mode).partitionBy(*parts).parquet(path)


def _spread16(x):
    """Spread a 16-bit int's bits to every 2nd position (Morton encode
    half) — the classic mask-shift cascade, pure Column bit ops. Works
    on LONG: in 32-bit int the final shiftleft(.., 1) would set the
    sign bit for ranks >= 32768 and break the curve's ordering."""
    x = x.cast("long")
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def _spread16_x3(x):
    """Spread a 16-bit int's bits to every 3rd position (3-D Morton) —
    the 21-bit-input cascade masked down to our 16-bit ranks."""
    x = x.cast("long")
    x = x.bitwiseOR(F.shiftleft(x, 32)).bitwiseAND(F.lit(0x1F00000000FFFF))
    x = x.bitwiseOR(F.shiftleft(x, 16)).bitwiseAND(F.lit(0x1F0000FF0000FF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x100F00F00F00F00F))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x10C30C30C30C30C3))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x1249249249249249))
    return x


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: Sequence[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on a Z-order (Morton) curve over two or
    three columns, so parquet row-group min/max stats stay narrow on
    EVERY cluster column and selective scans skip row groups whichever
    key they filter on — the multi-dimensional generalization of
    ``write_time_partitioned``'s single-key in-partition sort (a linear
    sort clusters only its leading column).

    Each cluster column is min-max normalized to a 16-bit rank (the
    same linear-binning Delta Lake OSS uses), bits are interleaved into
    one integer z-value in closed form (mask-shift cascades — no UDF),
    and the data is range-partitioned + sorted by that z-value. Min-max
    binning is skew-sensitive by design: heavy skew wants the rank
    mapping replaced with approx-quantile bins, same interleave.

    Cost: one min/max aggregate pass + one range shuffle — exactly what
    any clustering rewrite pays at 100 TB; the write is append-shaped
    (no global single-partition stage).
    """
    if not 2 <= len(cluster_cols) <= 3:
        raise ValueError("z-order wants 2-3 cluster columns")
    stats = df.agg(
        *[
            f(F.col(c).cast("double")).alias(f"{agg}_{c}")
            for c in cluster_cols
            for agg, f in (("min", F.min), ("max", F.max))
        ]
    ).collect()[0]
    ranks = []
    for c in cluster_cols:
        lo, hi = stats[f"min_{c}"], stats[f"max_{c}"]
        if lo is None or hi is None:
            raise ValueError(
                f"z-order column {c!r} has no numeric min/max (all-null, "
                "non-numeric, or empty input) — cluster on numeric, "
                "populated columns"
            )
        span = (hi - lo) or 1.0
        ranks.append(
            F.least(
                F.lit(65535),
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo))
                    / F.lit(span)
                    * 65536
                ).cast("int"),
            )
        )
    spread = _spread16 if len(cluster_cols) == 2 else _spread16_x3
    z = spread(ranks[0])
    for i, r in enumerate(ranks[1:], start=1):
        z = z.bitwiseOR(F.shiftleft(spread(r), i))
    out = (
        df.withColumn("__z", z.cast("long"))
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode(mode).parquet(path)


def read_pruned(
    spark: SparkSession,
    path: str,
    date_from: str | None = None,
    date_to: str | None = None,
) -> DataFrame:
    """Scan the partitioned store with the date predicate expressed on the
    PARTITION column, so it prunes directories (shows up as
    PartitionFilters in the scan node, not a post-scan Filter)."""
    df = spark.read.parquet(path)
    if date_from is not None:
        df = df.filter(F.col("dt") >= date_from)
    if date_to is not None:
        df = df.filter(F.col("dt") <= date_to)
    return df


def stream_to_store(
    streaming_df: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "ts",
    hourly: bool = False,
    sort_cols: Sequence[str] = (),
    files_per_partition: int = 1,
    trigger_seconds: int | None = None,
    available_now: bool = False,
):
    """Continuously append a stream into the partitioned store.

    The streaming twin of ``write_time_partitioned``: each micro-batch is
    appended through the SAME batch writer (same partition derivation,
    in-partition sort, file capping), so the store stays a plain parquet
    directory — readable by any engine and compactable in place.

    Deliberately foreachBatch, NOT the native streaming parquet sink: the
    native sink's ``_spark_metadata`` commit log makes batch reads of the
    root ignore files it didn't commit, so any external rewrite
    (``compact_store``) would corrupt the view. Trade-off: delivery is
    at-least-once on micro-batch retry (duplicate files possible), which
    matches the engine's declared sink semantics (SURVEY.md §2.7 T5 — the
    reference's Azure sink retries are also at-least-once). The
    checkpoint still tracks source offsets for restart.

    At scale, micro-batch cadence controls file granularity: a 60 s
    trigger writes one file set per trigger per active partition; pair
    with ``compact_store`` on a daily schedule to keep file counts flat.
    """

    def _append(batch_df: DataFrame, _batch_id: int) -> None:
        write_time_partitioned(
            batch_df,
            path,
            ts_col=ts_col,
            hourly=hourly,
            sort_cols=sort_cols,
            files_per_partition=files_per_partition,
            mode="append",
        )

    writer = (
        streaming_df.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def compact_store(
    spark: SparkSession,
    path: str,
    dt: str,
    hour: str | None = None,
    target_files: int = 1,
) -> int:
    """Rewrite one store partition into ``target_files`` files.

    Streaming appends accumulate one file set per micro-batch; over a day
    that is hundreds of small files, which at 100 TB dominates scan task
    scheduling and NameNode/listing cost. Compaction rewrites a CLOSED
    partition (past the watermark, no more appends) in place:
    read -> coalesce -> write to a temp dir -> atomic-ish swap. Returns
    the number of files after compaction.

    Run per closed partition from a scheduled job; never compact the
    partition currently receiving appends.
    """
    import os
    import shutil

    part_dir = f"{path}/dt={dt}" + (f"/hour={hour}" if hour is not None else "")
    df = spark.read.parquet(part_dir)
    # dot-prefixed INSIDE the partition: hidden from partition discovery
    # (a sibling "dt=<date>._compact_tmp" dir would be read as a bogus
    # partition value by scans of the store root)
    tmp = part_dir + "/._compact_tmp"
    df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
    data_files = [
        f for f in os.listdir(tmp) if not f.startswith(("_", "."))
    ]
    originals = [
        f for f in os.listdir(part_dir) if not f.startswith(("_", "."))
    ]
    # Crash-safe order: land the compacted files FIRST (dot-prefixed names
    # are invisible to parquet readers), rename them live, and delete the
    # originals LAST. A crash before the renames leaves the partition
    # untouched; between rename and delete it's transiently duplicated
    # (readers over-count briefly) — never missing, and recovery is just
    # deleting the leftover originals / dot-files. The old
    # delete-then-move order lost the whole partition on a crash in the
    # window and served a partial partition to concurrent readers.
    for f in data_files:
        shutil.move(os.path.join(tmp, f), os.path.join(part_dir, "." + f))
    for f in data_files:
        os.rename(os.path.join(part_dir, "." + f), os.path.join(part_dir, f))
    for f in originals:
        os.remove(os.path.join(part_dir, f))
    shutil.rmtree(tmp, ignore_errors=True)
    return len(data_files)


# ---------------------------------------------------------------------------
# File-stats manifest: Iceberg/Delta-style data skipping on plain parquet.
# The partition layout prunes on TIME; the manifest prunes on any OTHER
# column a query filters by (min/max per file), turning "scan the whole
# day" into "open the 2 files whose [min,max] straddles the predicate".
# At 100 TB the manifest is metadata-sized (one row per file) and the
# pruning decision never touches the data plane.

MANIFEST_NAME = "_file_stats_manifest.json"


def write_stats_manifest(
    spark: SparkSession, path: str, stat_cols: Sequence[str]
) -> int:
    """Scan the store's parquet FOOTERS (not data) and write a manifest of
    per-file min/max for ``stat_cols``. Returns the number of files
    indexed. Idempotent — rerun after appends/compaction."""
    import json
    import os

    import pyarrow.parquet as pq

    entries = []
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(root, fn)
            meta = pq.ParquetFile(fp).metadata
            names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
            stats: dict[str, list] = {}
            for col in stat_cols:
                if col not in names:
                    continue
                # BYTE_ARRAY (string/binary) min/max in footers may be
                # TRUNCATED bounds; pruning on them could wrongly drop a
                # file (the residual filter only fixes files we READ).
                # Index only fixed-width types, where stats are exact.
                if meta.schema.column(names[col]).physical_type == "BYTE_ARRAY":
                    continue
                lo = hi = None
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(names[col]).statistics
                    if st is None or not st.has_min_max:
                        lo = hi = None
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if lo is not None:
                    stats[col] = [
                        lo.isoformat() if hasattr(lo, "isoformat") else lo,
                        hi.isoformat() if hasattr(hi, "isoformat") else hi,
                    ]
            entries.append(
                {"file": os.path.relpath(fp, path), "rows": meta.num_rows,
                 "stats": stats}
            )
    manifest = {"stat_cols": list(stat_cols), "files": entries}
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f)
    return len(entries)


def read_manifest_pruned(
    spark: SparkSession,
    path: str,
    col: str,
    lo=None,
    hi=None,
) -> DataFrame:
    """Read only the files whose [min, max] for ``col`` intersects
    [lo, hi] (either bound optional) according to the manifest; falls
    back to the full store when the manifest is missing or the column
    is unindexed. The residual filter is still applied — manifest
    pruning is an IO optimization for files we read; files are only
    SKIPPED on exact fixed-width stats (strings are never indexed —
    parquet footers may store truncated string bounds). The manifest is
    reconciled against the directory before use: files appended AFTER
    the manifest was written are read unconditionally (no stats -> no
    skipping, never missing rows), and manifest entries whose file was
    since compacted away are dropped (no FileNotFound)."""
    import json
    import os

    mf = os.path.join(path, MANIFEST_NAME)
    residual = None
    if lo is not None:
        residual = F.col(col) >= lo
    if hi is not None:
        c = F.col(col) <= hi
        residual = c if residual is None else residual & c
    if not os.path.exists(mf):
        df = spark.read.parquet(path)
        return df.filter(residual) if residual is not None else df
    with open(mf) as f:
        manifest = json.load(f)
    on_disk = set()
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(".parquet") and not name.startswith(("_", ".")):
                on_disk.add(
                    os.path.relpath(os.path.join(root, name), path)
                )
    known = {e["file"] for e in manifest["files"]}
    # appended since the manifest: no stats, must read
    keep = sorted(on_disk - known)
    for e in manifest["files"]:
        if e["file"] not in on_disk:  # compacted/vacuumed away
            continue
        st = e["stats"].get(col)
        if st is None:
            keep.append(e["file"])  # unindexed file: must read
            continue
        fmin, fmax = st
        if lo is not None and fmax < lo:
            continue
        if hi is not None and fmin > hi:
            continue
        keep.append(e["file"])
    if not keep:
        # empty selection: preserve schema via a zero-file read
        df = spark.read.parquet(path).limit(0)
        return df.filter(residual) if residual is not None else df
    df = spark.read.option("basePath", path).parquet(
        *[os.path.join(path, k) for k in keep]
    )
    return df.filter(residual) if residual is not None else df


__all__ += ["write_stats_manifest", "read_manifest_pruned", "MANIFEST_NAME"]


# ---------------------------------------------------------------------------
# Versioned SCD1 table on plain parquet: MERGE upsert + time travel +
# exactly-once retry, without a table format dependency. Layout:
#     <path>/v=<n>/part-*.parquet + _COMMIT      (one dir per version)
# Readers resolve the highest _COMMIT-marked version, so a crashed or
# in-flight writer is invisible (the azure_datasource epoch-commit idea
# applied to a keyed table instead of an append log). Single writer per
# table is assumed (the streaming foreachBatch driver); versions are
# immutable once committed, which is what makes time travel and
# concurrent readers safe with zero coordination.
# ---------------------------------------------------------------------------


def _versions(path: str) -> list[int]:
    import os

    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("v=") and os.path.exists(
            os.path.join(path, name, "_COMMIT")
        ):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def table_version(path: str) -> int | None:
    """Highest committed version of a merge table, or None if empty."""
    vs = _versions(path)
    return vs[-1] if vs else None


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a committed version (default: latest) — TIME TRAVEL is just
    naming an older committed dir; versions are immutable."""
    v = table_version(path) if version is None else version
    if v is None or v not in _versions(path):
        raise FileNotFoundError(f"no committed version {version} at {path}")
    return spark.read.parquet(f"{path}/v={v}")


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    batch_id: str | None = None,
    validate_keys: bool = True,
    target_files: int | None = None,
) -> int:
    """MERGE (SCD1 last-write-wins upsert) into the versioned table:
    current rows whose key collides with an update are replaced, new keys
    are inserted, everything else carries over — one left-anti join plus
    a by-name union (allowMissingColumns, so an update batch may ADD
    columns and old rows read NULL: schema evolution without rewrite).

    ``batch_id`` makes retries exactly-once: if the latest committed
    version already records this id, the merge is a no-op returning that
    version — the foreachBatch re-delivery contract. Commit order is
    crash-safe: data lands in a dot-temp dir, renames to ``v=<n>``, and
    the ``_COMMIT`` marker (with the batch id) lands last; readers never
    see a partial version. A crash between the rename and the marker
    leaves an UNCOMMITTED ``v=<n>`` dir that readers ignore and the next
    merge clobbers before renaming — progress is never wedged.

    ``updates`` must carry at most one row per key and no null keys
    (last-write-wins is undefined within one batch otherwise) —
    validated with one small aggregate unless ``validate_keys=False``.

    ``target_files`` coalesces the merged table before the version
    write. Without it, the anti-join leaves shuffle-partition-many tasks
    and a KEY-BOUNDED table (a counter table is one row per series)
    writes dozens of near-empty parquet files PER VERSION — on a
    versioned store that is an fsync/rename transaction storm, and the
    store-to-serving path measured 2x throughput loss on a day of slow
    host I/O from exactly this. Callers with key-bounded tables pass 1;
    unbounded tables leave it None (the write keeps the join's
    parallelism)."""
    import json as _json
    import os
    import shutil

    if validate_keys:
        from pyspark.sql import functions as _F

        null_any = _F.lit(False)
        for k in keys:
            null_any = null_any | _F.col(k).isNull()
        bad = updates.groupBy(*keys).count().filter(
            (_F.col("count") > 1) | null_any
        )
        offender = bad.limit(1).collect()
        if offender:
            raise ValueError(
                "merge_upsert updates must have unique, non-null keys; "
                f"offending key: {offender[0].asDict()}"
            )

    cur_v = table_version(path)
    if batch_id is not None and cur_v is not None:
        with open(f"{path}/v={cur_v}/_COMMIT") as f:
            meta = _json.load(f) if os.path.getsize(
                f"{path}/v={cur_v}/_COMMIT"
            ) else {}
        if meta.get("batch_id") == batch_id:
            return cur_v
    if cur_v is None:
        merged = updates
        new_v = 0
    else:
        current = read_table(spark, path, cur_v)
        keep = current.join(updates.select(*keys).distinct(), keys, "left_anti")
        merged = keep.unionByName(updates, allowMissingColumns=True)
        new_v = cur_v + 1
    if target_files is not None:
        merged = merged.coalesce(target_files)
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".v={new_v}.tmp")
    merged.write.mode("overwrite").parquet(tmp)
    final = os.path.join(path, f"v={new_v}")
    if os.path.exists(final):
        # uncommitted leftover from a crash between rename and _COMMIT
        # (it has no marker, else table_version would have returned it)
        shutil.rmtree(final)
    os.rename(tmp, final)
    with open(os.path.join(final, "_COMMIT"), "w") as f:
        _json.dump({"batch_id": batch_id, "version": new_v}, f)
    return new_v


def vacuum_table(path: str, keep_last: int = 2) -> int:
    """Drop all but the newest ``keep_last`` committed versions (plus any
    uncommitted temp debris). Returns the number of version dirs removed.
    Run only when no reader still holds an older version handle."""
    import os
    import shutil

    vs = _versions(path)
    doomed = vs[:-keep_last] if keep_last > 0 else vs
    removed = 0
    for v in doomed:
        shutil.rmtree(os.path.join(path, f"v={v}"), ignore_errors=True)
        removed += 1
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.startswith(".v=") and name.endswith(".tmp"):
                shutil.rmtree(os.path.join(path, name), ignore_errors=True)
    return removed
