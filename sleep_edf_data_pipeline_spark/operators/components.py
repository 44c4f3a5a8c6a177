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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    mirror: bool = True,
    checkpoint_every: int = 8,
) -> DataFrame:
    """(node, label) after ``iters`` rounds of synchronous mode-LPA.

    Community detection by label propagation (Raghavan et al. 2007),
    made deterministic and oracle-replayable: every round each node
    adopts the most frequent label among its neighbors, ties broken by
    the smallest label.  Unlike :func:`connected_components` (min-label
    → one label per connected component), mode-propagation splits a
    component into densely-connected communities.

    A FIXED iteration count (no convergence test) keeps the computation
    a pure function of the input, so an unrolled-SQL oracle replays it
    bit-for-bit — same contract as PageRank/k-means here.  Synchronous
    updates can oscillate on bipartite-ish structures; for an analytics
    engine a fixed-round snapshot is the deterministic choice, and
    callers wanting convergence raise ``iters``.

    Scale: per round, one shuffle join (labels onto edge sources), one
    map-side-combinable count per (node, candidate label), and one
    per-node window argmax PARTITIONED BY node — nothing global, state
    is O(|V| + |E|).  Rounds chain LAZILY (the PageRank shape: one job
    at the terminal action, persisted edges read once per round from
    cache); lineage is truncated with an eager localCheckpoint only
    every ``checkpoint_every`` rounds, so short fixed-round runs — the
    common analytics case — pay zero extra materializations while deep
    runs stay plan-compilation-safe (see connected_components on why
    unbounded lineage is fatal).  ``mirror=False`` asserts ``edges``
    already contains both directions.
    """
    pairs = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    if mirror:
        pairs = pairs.unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        ).distinct()
    # Skip the persist when the caller already cached the edge frame
    # and we use it as-is (mirror=False): the rename projection reads
    # the existing cache, and a second persist would double the
    # executor storage for the largest frame in the loop.  Caller owns
    # the cache lifetime either way (the returned frame is lazy).
    caller_cached = not mirror and (
        edges.storageLevel.useMemory or edges.storageLevel.useDisk
    )
    bidir = pairs if caller_cached else pairs.persist()
    labels: DataFrame | None = None
    for it in range(iters):
        # argmax by (count DESC, label ASC) as a two-level aggregate:
        # max over struct(c, -label) is lexicographic, so the winner is
        # the highest count, ties to the smallest label.  Spark plans
        # the struct max as a map-side-combinable SortAggregate — the
        # argmax shuffle carries ONE row per node, where a row_number
        # window would shuffle every (node, candidate, count) row and
        # sort the full list per round (measured: 4.3 → 2.7 s at
        # sf0.1).
        #
        # r13 optimization (guide §2.4): round 1 skips the label join
        # AND the initial node-distinct entirely — l0 is the identity
        # mapping over every node, and ``bidir`` is symmetric (both
        # directions present, the operator's contract), so every ``b``
        # IS a node and round 1's join would only rename ``b`` to
        # ``label``.  Projecting ``b AS label`` off the edge frame
        # yields the identical (a, label) multiset with one fewer
        # shuffle join and no node-scale distinct; node coverage is
        # unchanged (every node appears as ``a`` in a symmetric edge
        # list).  Rounds 2+ are untouched.
        if labels is None:
            cand = bidir.select(F.col("a"), F.col("b").alias("label"))
        else:
            cand = bidir.join(
                labels.select(F.col("node").alias("b"), "label"), "b"
            )
        labels = (
            cand
            .groupBy(F.col("a").alias("node"), F.col("label"))
            .agg(F.count("*").alias("c"))
            .groupBy("node")
            .agg(
                F.max(
                    F.struct(
                        F.col("c"), (-F.col("label")).alias("nl")
                    )
                ).alias("_m")
            )
            .select("node", (-F.col("_m.nl")).alias("label"))
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            labels = labels.localCheckpoint()
    if labels is None:  # iters == 0: the identity labeling, as before
        labels = (
            bidir.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
        )
    return labels


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
