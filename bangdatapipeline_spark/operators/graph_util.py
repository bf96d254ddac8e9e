"""Shared connected-components kernel.

Iterative min-label propagation to convergence, used by near-dup
clustering (``dedup_clusters``) and entity-resolution survivorship
(``er_golden_record``). Each round is one equi-join + partial-min
aggregation; labels only ever decrease, so the (monotone) label sum is
a cheap convergence certificate and round count is O(component
diameter) — near-dup / match components are near-cliques, 2-3 rounds in
practice. ``localCheckpoint`` after every round caps lineage growth.
At 100 TB pathological chains call for the alternating large/small-star
variant (implemented in graph_analytics.graph_cc_alternating); this
kernel is the simple form the bounded-diameter users share.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def min_label_components(pairs: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Connected components of an undirected pair list.

    ``pairs`` must have two integral id columns (first = a, second = b);
    returns ``(node, label)`` with label = min node id reachable, one
    row per node that appears in any pair.
    """
    a, b = pairs.columns[0], pairs.columns[1]
    sym = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = (
        sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        neigh = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("src", "node")
        )
        labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # r10 review: silently returning unconverged labels would make
        # dedup_clusters emit two cluster ids for one true component —
        # a wrong answer with no diagnostic. A component diameter above
        # max_rounds means this simple kernel is the wrong tool: fail
        # loudly and point at the O(log n) alternating-star variant.
        raise RuntimeError(
            f"min_label_components did not converge in {max_rounds} rounds "
            "(component diameter exceeds the bound); use "
            "graph_analytics.graph_cc_alternating for long-chain graphs"
        )
    return labels
