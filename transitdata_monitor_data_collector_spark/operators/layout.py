"""Z-order (Morton-curve) data layout: write-side clustering + read-side
partition pruning for multi-dimensional range queries.

A 100 TB lakehouse table sorted by one column prunes nothing on any other
column. Interleaving the bits of two (or more) bounded dimension codes
gives every file a tight min/max envelope on BOTH dimensions, so parquet
file/row-group stats prune 2-D box queries. This module is the physical
half of the ``layout_zorder_pruning`` registry query (which hash-checks
the planning arithmetic against DuckDB): ``write_zorder`` lays data out
for real via ``partitionBy(zfile)``, and ``zorder_candidates`` derives
the partition-filter list a reader pushes down for a box query — Spark
then prunes partitions at planning time (asserted in
tests/test_layout_zorder.py via the ``PartitionFilters`` line of the
executed plan).

The curve matches the reference-free public construction (Morton 1966);
no reference-engine counterpart exists — the reference delegates storage
layout to Pulsar/Prometheus wholesale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: bits per dimension code (values must fit in [0, 2**BITS))
BITS = 12
#: top bits of the interleave used as the file/partition id
FILE_BITS = 6


def morton_sql(xcol: str = "x", ycol: str = "y", bits: int = BITS) -> str:
    """Spark-SQL expression text interleaving two ``bits``-bit codes:
    x bit i lands at position 2i, y bit i at 2i+1."""
    return " + ".join(
        f"shiftleft(shiftright({xcol}, {i}) & 1, {2 * i})"
        f" + shiftleft(shiftright({ycol}, {i}) & 1, {2 * i + 1})"
        for i in range(bits)
    )


def zfile_expr(
    xcol: str = "x",
    ycol: str = "y",
    bits: int = BITS,
    file_bits: int = FILE_BITS,
    validate: bool = False,
):
    """Column: the file/partition id = top ``file_bits`` bits of the
    Morton code.

    ``morton_sql`` interleaves only the low ``bits`` bits, so an
    out-of-domain value (negative, or >= 2**bits — e.g. a shipdate before
    the layout epoch giving a negative datediff) would land in an
    UNRELATED partition and a reader pushing down ``zorder_candidates``
    as the partition filter would silently drop those rows. With
    ``validate=True`` the expression raises per-row on any dimension
    outside [0, 2**bits) instead — the write fails loudly rather than
    misplacing data."""
    z = F.shiftright(
        F.expr(morton_sql(xcol, ycol, bits)), 2 * bits - file_bits
    ).cast("int")
    if not validate:
        return z
    hi = 1 << bits
    return F.when(
        F.expr(
            f"{xcol} < 0 OR {xcol} >= {hi} OR {ycol} < 0 OR {ycol} >= {hi}"
        ),
        F.expr(
            f"raise_error(concat('zorder dimension out of [0, {hi}):"
            f" {xcol}=', CAST({xcol} AS STRING),"
            f" ' {ycol}=', CAST({ycol} AS STRING)))"
        ).cast("int"),
    ).otherwise(z)


def _split_file_id(f: int, file_bits: int) -> tuple[int, int]:
    """Decode a file id back into its (x-block, y-block) prefixes.
    The top ``file_bits`` of the interleave alternate y, x from the
    most-significant position down (position 2i+1 carries y bit i)."""
    if file_bits % 2:
        # with an odd prefix the x/y parity of the id's low bit flips;
        # keep the decode honest by refusing the case nothing here uses
        raise ValueError("file_bits must be even")
    xb = yb = 0
    # file id bit j corresponds to interleave position (2*bits-file_bits+j)
    for j in range(file_bits):
        if (f >> j) & 1:
            if j % 2 == 0:  # even offsets from the bottom of the id: x bits
                xb |= 1 << (j // 2)
            else:
                yb |= 1 << (j // 2)
    return xb, yb


def zorder_candidates(
    x0: int,
    x1: int,
    y0: int,
    y1: int,
    bits: int = BITS,
    file_bits: int = FILE_BITS,
) -> list[int]:
    """File ids whose (x, y) block could hold rows of the box
    [x0, x1] x [y0, y1] — the derived partition filter a reader pushes
    down. Block side length per dimension: 2**(bits - ceil(file_bits/2))
    for x, 2**(bits - floor(file_bits/2)) for y (file_bits alternates
    x/y starting with x at the id's least-significant bit)."""
    x_prefix_bits = (file_bits + 1) // 2
    y_prefix_bits = file_bits // 2
    x_shift = bits - x_prefix_bits
    y_shift = bits - y_prefix_bits
    out = []
    for f in range(1 << file_bits):
        xb, yb = _split_file_id(f, file_bits)
        bx0, bx1 = xb << x_shift, ((xb + 1) << x_shift) - 1
        by0, by1 = yb << y_shift, ((yb + 1) << y_shift) - 1
        if bx0 <= x1 and bx1 >= x0 and by0 <= y1 and by1 >= y0:
            out.append(f)
    return out


def write_zorder(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    bits: int = BITS,
    file_bits: int = FILE_BITS,
    one_file_per_partition: bool = False,
) -> None:
    """Write ``df`` clustered on the Morton curve of (xcol, ycol):
    one hive partition per file id. At cluster scale the same zfile
    column feeds ``repartitionByRange(zfile).sortWithinPartitions(zv)``
    for row-group-level locality inside each partition; partitionBy is
    the directory-pruning form the candidate filter exploits.

    Dimension values are validated per-row against [0, 2**bits): an
    out-of-domain value fails the write (raise_error) instead of landing
    in an unrelated partition where candidate-filter reads would silently
    drop it. The check is a cheap codegen CASE relative to the write.

    ``one_file_per_partition`` shuffles on zfile first so each partition
    directory holds exactly one parquet file — the compacted form whose
    file count the pruning evidence measures (otherwise every write task
    emits a file into every partition it sees)."""
    out = df.withColumn(
        "zfile", zfile_expr(xcol, ycol, bits, file_bits, validate=True)
    )
    if one_file_per_partition:
        out = out.repartition(F.col("zfile"))
    out.write.mode("overwrite").partitionBy("zfile").parquet(path)
