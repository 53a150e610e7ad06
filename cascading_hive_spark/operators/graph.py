"""Iterative graph operators: connected components for dedup
clustering.

Near-duplicate PAIRS (minhash/simhash/cosine output) still need to
become CLUSTERS before a pipeline can keep one representative per
group — that's a connected-components problem. This is the engine's
iterative-algorithm surface: a driver-side loop over declarative
DataFrame steps, with ``localCheckpoint`` every few rounds to cut the
growing lineage (the standard Spark iteration hygiene).

Algorithm: min-label propagation — every vertex adopts the smallest
label among itself and its neighbors until fixpoint; rounds needed =
graph diameter. Dedup-similarity graphs have tiny components (near-dup
groups), so this converges in a handful of rounds. For web-scale
graphs with long chains, the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond") halves the round count; the per-round dataflow below is the
same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 20,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Connected components of an undirected edge list.

    Returns (id, component) with component = min vertex id reachable.
    Vertices are those appearing in edges; isolated vertices can be
    unioned in by the caller.
    """
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    sym = sym.dropDuplicates(["u", "v"]).localCheckpoint()
    labels = sym.select("u").distinct().select(
        F.col("u").alias("id"), F.col("u").alias("component")
    )
    converged = False
    for i in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            # cut lineage + materialize so convergence check and next
            # round don't recompute the whole history
            new_labels = new_labels.localCheckpoint()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
        else:
            labels = new_labels
    if not converged:
        # the loop ran out of rounds between checkpoints — one final
        # fixpoint check; silently-unconverged labels are WRONG cluster
        # ids (long-diameter chains), so fail loudly rather than return
        neighbor_min = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nmin"))
        )
        still_changing = (
            labels.join(neighbor_min, labels.id == neighbor_min.u)
            .filter(F.col("nmin") < F.col("component"))
            .limit(1)
            .count()
        )
        if still_changing:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} "
                "iterations (component diameter exceeds the round budget); "
                "raise max_iterations"
            )
    return labels


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Near-dup pairs -> (id, cluster_id) with cluster_id = min member
    id — the keeper-selection input for cluster-level dedup."""
    return connected_components(pairs, id_a, id_b).select(
        "id", F.col("component").alias("cluster_id")
    )
