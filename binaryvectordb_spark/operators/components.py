"""Connected-components-lite for dedup cluster assignment (SURVEY §2.12:
'connected-components-lite, keep min id per cluster').

Min-label propagation: every node starts labeled with its own id; each
round a node takes the min of its label and its neighbors' labels; converges
to the minimum id reachable in the component.  Iterations are bounded by the
component diameter — near-dup clusters are shallow (near-cliques), so this
converges in 2-3 rounds in practice.

Scale notes: each round is one equi-join + hash-agg on the edge list (no
cross products); localCheckpoint truncates the lineage so plans don't grow
with rounds — the standard large-graph pattern (GraphX/GraphFrames do the
same under the hood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 20) -> DataFrame:
    """pairs(id_a, id_b) -> (doc_id, cluster_id = min id in component).
    Only nodes appearing in at least one pair are returned (singletons are
    their own trivial cluster and carry no dedup information)."""
    edges = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
             .union(pairs.select(F.col(id_b).alias("src"),
                                 F.col(id_a).alias("dst")))
             .distinct()
             .localCheckpoint())
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("label", F.col("id")))
    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges.dst == labels.id)
                   .groupBy("src").agg(F.min("label").alias("nbr_label")))
        new_labels = (labels.join(nbr_min, labels.id == nbr_min.src, "left")
                      .select(F.col("id"),
                              F.least(F.col("label"),
                                      F.coalesce(F.col("nbr_label"),
                                                 F.col("label")))
                              .alias("label"))
                      .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .where(F.col("n.label") != F.col("o.label")).count())
        labels = new_labels
        if changed == 0:
            break
    else:
        # a silent early exit would return intermediate labels — duplicate
        # clusters would keep multiple "keeper" rows with no visible error
        raise RuntimeError(
            f"min_label_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing); component diameter exceeds "
            f"max_iter — raise it")
    return labels.select(F.col("id").alias("doc_id"),
                         F.col("label").alias("cluster_id"))
