"""Connected components over near-duplicate pair graphs.

The step after candidate generation in every production dedup pipeline:
near-dup pairs form a graph; each connected component is one duplicate
cluster; the minimum id in a component becomes the canonical document.

Implementation: iterative minimum-label propagation as pure DataFrame
ops — per round every node takes the min label among itself and its
neighbors, until a fixed point.  Rounds needed = graph diameter, which
for near-dup clusters is tiny (dups of one document link to each other
densely); the O(log n)-round large-star/small-star variant (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) is the
drop-in upgrade if pathological chain-shaped graphs appear.

Scale: each round is one shuffle (edges ⋈ labels on the edge key +
min-combine groupBy — both map-side combinable); labels/edges persist
across rounds and the previous round unpersists, so memory is O(|V| +
|E|) regardless of round count.  The per-round driver ``count()`` reads
one aggregate, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    node_col: str = "node",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) with component = min node id in the component.

    ``edges`` may be directed pairs (each undirected edge once);
    ``nodes`` must contain every node (isolated nodes keep their own id
    as component).

    Iteration contract: min-label propagation converges in ≤ diameter
    rounds and the loop exits early on a fixed point, so ``max_iter``
    (25) only binds on adversarial chains longer than 25 hops — for
    duplicate clusters (near-cliques, diameter ≤ ~3) it is pure head-
    room.  If a corpus ever produces deeper chains, raise ``max_iter``
    or switch the step to pointer-doubling / large-small-star
    (Kiveris et al., "Connected Components in MapReduce"), which
    converges in O(log diameter) rounds with the same per-round shape.
    """
    # localCheckpoint (not just persist): each round's plan must START
    # from the previous round's materialized result, or the logical
    # plan nests one full copy of itself per iteration and plan
    # compilation/printing goes quadratic (observed: OOM building the
    # AQE explain string by round ~8).  Lineage truncation is the
    # load-bearing part of every DataFrame-iterative algorithm.
    bidir = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(node_col).alias("node"), F.col(node_col).alias("comp")
    ).localCheckpoint()

    for _ in range(max_iter):
        # Neighbor messages: each node hears its neighbors' labels.
        msgs = bidir.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "comp")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "_old"), "node")
            .filter(F.col("comp") != F.col("_old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
