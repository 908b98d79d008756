"""Connected components over an edge list (EXT: dedup-cluster resolution).

The canonical last step of near-duplicate removal at 100 TB: pair finders
(MinHash-LSH `functions/dedup.py:near_dup_pairs_minhash`, n-gram Jaccard
`ngram_jaccard_pairs`, embedding LSH) emit *pairs*; turning pairs into
keep/drop decisions needs the transitive closure — if A~B and B~C, then
{A,B,C} is one duplicate cluster even when A and C never matched directly.

Spark has no built-in graph operator, so this is the standard iterative
min-label propagation (the simple variant of Kiveris et al.'s "Connected
Components in MapReduce and Beyond" two-phase algorithm):

* state: one (id, comp) label per vertex, initialized comp = id;
* step:  every vertex takes the min of its own label and its neighbors'
  labels — one shuffle-on-key join + one groupBy per iteration;
* stop:  when an iteration changes no label (driver-side count — the one
  place a driver round-trip is inherent, same as any iterative algorithm's
  convergence test).

Scale posture: converges in O(diameter) iterations (real near-dup graphs
are overwhelmingly tiny star/clique clusters, so 2-4 iterations); each
iteration is one partial-aggregated shuffle of (id, comp) pairs — narrow
8-byte rows regardless of document payload width.  `localCheckpoint`
truncates the lineage each round so the plan doesn't grow with iteration
count (without it, iteration N replays all N-1 prior joins).

No reference-repo analogue (the reference has no graph surface); cited in
SURVEY.md §2.12 EXT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Resolve undirected connected components from an edge list.

    Returns one row per distinct vertex with columns ``(id, comp)`` where
    ``comp`` is the smallest vertex id reachable from ``id`` (the
    deterministic canonical cluster representative).

    ``max_iterations`` bounds the driver loop; min-label propagation needs
    at most the graph diameter + 1 passes, so 25 covers any realistic
    dedup graph (a path of 33M+ vertices would be needed to exceed it).
    Raises ``RuntimeError`` if the bound is hit without convergence rather
    than silently returning partial labels.
    """
    # Undirected: materialize both directions once; drop self-loops.  The
    # eager checkpoint here is load-bearing: ``edges`` is often the output
    # of an expensive pipeline (e.g. the n-gram Jaccard pair join), and
    # without truncation that whole pipeline would re-execute inside EVERY
    # iteration's neighbor join plus the initial label build — measured 3x
    # end-to-end cost on the q94 canonicalization pass.
    #
    # Hash-partition AND sort the edge list on the join key BEFORE the
    # checkpoint: LogicalRDD captures outputPartitioning/outputOrdering, so
    # every iteration's sort-merge join reuses them and the edge side (the
    # BIG side — |edges| >= |vertices| on near-dup graphs) joins with zero
    # exchange and zero sort; only the per-iteration label frame shuffles.
    # Without this, the full edge list re-shuffled O(diameter) times.
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .repartition("b")
        .sortWithinPartitions("b")
        .localCheckpoint(eager=True)
    )

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("comp"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iterations):
        # Min label among each vertex's neighbors: join neighbor labels on
        # the far endpoint, then partial-agg min per vertex (map-side
        # combine keeps the shuffle narrow).
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("a", "id")
        )
        # Lazy checkpoint + full count: the convergence probe is the action
        # that materializes (and lineage-truncates) the new labels — one
        # job per iteration instead of an eager-checkpoint job followed by
        # a probe job.  (A limit(1) probe would be cheaper per se, but it
        # short-circuits materialization and would leave the checkpoint
        # unpopulated for the next round.)
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
                (F.col("nbr_comp") < F.col("comp")).alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    left_col: str,
    right_col: str,
) -> DataFrame:
    """Pairs → keep/drop decision per document.

    ``pairs`` is any near-dup pair frame (e.g. ``near_dup_pairs_minhash``
    output); ``all_ids`` supplies the full id universe so singletons (docs
    with no near-dup) appear with themselves as keeper.  Returns
    ``(id, cluster, keep)`` where ``keep`` marks the minimum id of each
    transitive cluster — the row a dedup pass would retain.
    """
    comp = connected_components(pairs, src=left_col, dst=right_col)
    universe = all_ids.select(F.col(id_col).alias("id")).distinct()
    labeled = universe.join(comp, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("cluster")
    )
    return labeled.select(
        "id", "cluster", (F.col("id") == F.col("cluster")).alias("keep")
    )
