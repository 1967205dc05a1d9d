"""Transitive closure of match pairs into entity clusters.

The reference stops at pairs (Simulator.java:60-72 consumes counts only);
the north star requires entity CLUSTERS via iterative hash-join connected
components. We implement min-label propagation over the bipartite match
graph — each iteration is one shuffled self-join; components of a record
linkage graph are tiny (bounded by duplicate multiplicity), so convergence
is a handful of rounds. ``localCheckpoint`` truncates lineage each round so
the plan does not grow (the standard Spark iterative-algorithm pattern).

Node ids are namespaced ``"A:<id>"`` / ``"B:<id>"`` — the two parties are
distinct id spaces (equal raw ids across parties is ground TRUTH, not
identity, Simulator.java:62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    matches: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """(record1, record2) -> (node, component) with component = min node id.

    record1 is an Alice id, record2 a Bob id.
    """
    edges = matches.select(
        F.concat(F.lit("A:"), F.col("record1")).alias("u"),
        F.concat(F.lit("B:"), F.col("record2")).alias("v"),
    )
    # symmetric adjacency
    adj = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    adj = adj.dropDuplicates(["u", "v"]).localCheckpoint()

    labels = (
        adj.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        # candidate label for each node: min over (own label, neighbors' labels)
        neighbor_labels = (
            adj.join(labels.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "component")
        )
        # lazy checkpoint: materialized by the convergence count below —
        # ONE job per iteration, lineage still truncated for the next round
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def clusters_table(components: DataFrame) -> DataFrame:
    """(node, component) -> (component, members sorted, size)."""
    return components.groupBy("component").agg(
        F.array_sort(F.collect_list("node")).alias("members"),
        F.count(F.lit(1)).alias("size"),
    )
