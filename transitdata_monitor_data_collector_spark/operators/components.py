"""Distributed connected components over a pair/edge DataFrame.

The missing half of fuzzy dedup: near-dup PAIRS (MinHash-LSH, RP-LSH,
SimHash hamming) don't dedupe anything by themselves — transitive groups
must be collapsed to one representative. A->B and B->C means {A, B, C} is
one duplicate cluster even if (A, C) never met the pair threshold.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round every node takes the min of its own label and its
neighbors' labels; at a fixed point each node holds the minimum id of its
component (the canonical representative).

Scale design (100 TB):
- Each round is ONE equi-join (labels onto edges, shuffled on node id) +
  ONE aggregation — the textbook BSP/Pregel step expressed as DataFrame
  ops, so AQE handles skewed hub nodes.
- Rounds = O(max component diameter). Near-dup clusters are dense (copies
  of one document all pair with each other), so diameters are tiny and
  3-5 rounds converge; ``max_iter`` guards against pathological chains.
  For graphs with genuinely long chains, switch to large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
  same join primitives with O(log^2 n) rounds.
- Lineage is truncated every round with ``localCheckpoint`` — an iterated
  DataFrame otherwise nests one plan per round and planning time, not the
  data, becomes the bottleneck.
- The convergence check is a count() per round: a scalar to the driver,
  not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, label) with ``label`` = min node id of the connected component.

    ``edges`` is undirected input (each pair listed once is enough);
    ``nodes`` optionally supplies the full vertex set — vertices with no
    edge form singleton components (label = own id). Without ``nodes``,
    only endpoints of edges appear in the output.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    bidir = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .cache()  # reused every round
    )
    if nodes is None:
        vertex = bidir.select(F.col("s").alias("id")).distinct()
    else:
        vertex = nodes.select(F.col(nodes.columns[0]).alias("id"))
    labels = vertex.select("id", F.col("id").alias("label")).localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (
            bidir.join(labels.withColumnRenamed("id", "s"), "s")
            .groupBy(F.col("d").alias("id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        updated = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias(
                    "label"
                ),
            )
            .localCheckpoint()  # truncate lineage; eager materialization
        )
        changed = updated.filter(F.col("label") != F.col("old_label")).count()
        labels = updated.select("id", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds — "
            "long-chain graph; use a large-star/small-star variant"
        )
    return labels
