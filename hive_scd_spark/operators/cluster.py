"""Duplicate-cluster assignment — connected components over a
near-dup pair list.

A dedup pipeline's output is pairs (``minhash_near_dup_pairs``,
``embedding_near_dup_pairs``); what a training-data pipeline actually
needs is a CLUSTER id per document so it can keep one canonical doc per
cluster.  Pairs → components is a connected-components problem.

Algorithm: iterative **min-label propagation**.  Every node starts
labeled with its own id; each round, a node's label becomes the min of
its own and its neighbors' labels; fixpoint = components labeled by
their minimum member id.

Scale analysis (the honest version):

- each round is ONE equi-join (edges ⋈ labels on the neighbor id) +
  one groupBy-min + one join back — all shuffle-partitioned, no
  driver-side state; lineage is truncated every round with
  ``localCheckpoint`` so the plan does not grow with iterations (the
  classic iterative-Spark trap);
- rounds needed = graph diameter.  Near-duplicate clusters are
  overwhelmingly cliques or short chains (diameter ≤ ~3), so this
  converges in 2–4 rounds in practice.  For adversarial long-chain
  graphs, the alternating large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14) converges in O(log n) rounds with the same per-round
  shuffle shape — the swap-in point is documented on the loop below;
- convergence detection costs one tiny action per round: the SUM of
  all labels, which strictly decreases until fixpoint (labels only
  ever shrink), so equality between rounds == converged.  No
  row-by-row diff join is needed.

Output contains only nodes that appear in at least one pair; singleton
documents keep their identity trivially (cluster = self) and are the
caller's union if desired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over the undirected pair graph → one row
    per member node: ``(node, cluster)`` with ``cluster`` = min node id
    in the component."""
    edges = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    und = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # distinct: near-dup pair lists can carry a pair via several bands;
    # one shuffle here halves every subsequent round's join input
    und = und.distinct().localCheckpoint(eager=False)
    labels = (
        und.select("a").distinct().select(F.col("a").alias("node"), F.col("a").alias("cluster"))
    ).localCheckpoint(eager=False)

    prev_sum = None
    for _ in range(max_iter):
        # neighbor minimum: one equi-join + partial-aggregated min
        neigh = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("cluster").alias("n_min"))
        )
        labels = (
            labels.join(neigh, labels["node"] == neigh["a"], "left")
            .select(
                "node",
                F.least(F.col("cluster"), F.coalesce("n_min", F.col("cluster"))).alias(
                    "cluster"
                ),
            )
            .localCheckpoint(eager=False)  # truncate lineage each round
        )
        # labels are monotone non-increasing → sum strictly decreases
        # until fixpoint; one scalar action per round.  decimal(38,0):
        # a long sum could overflow at billions of 64-bit ids
        cur_sum = labels.agg(F.sum(F.col("cluster").cast("decimal(38,0)"))).first()[0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
        # swap-in point for large-star/small-star (O(log n) rounds) if a
        # workload ever presents diameter ≫ max_iter chain graphs
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iter} rounds — "
        "pathological chain graph; use a larger max_iter or the "
        "large-star/small-star variant"
    )


def dedup_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """The full dedup pipeline's last mile: given a corpus and its
    near-dup *pairs* (from ``minhash_near_dup_pairs`` /
    ``embedding_near_dup_pairs``), keep ONE canonical document per
    duplicate cluster (the min id) plus every unpaired document.

    Plan shape: components over the pair graph (small relative to the
    corpus), then a single LEFT ANTI join from the corpus to the
    non-canonical member list.  No broadcast hint: a lightly-duplicated
    corpus has a small loser list (AQE picks broadcast at runtime), a
    heavily-duplicated one can have billions — the shuffle anti-join is
    then the correct plan, and forcing broadcast would OOM the driver."""
    clusters = dup_clusters(pairs, pair_a, pair_b)
    losers = clusters.filter(F.col("node") != F.col("cluster")).select(
        F.col("node").alias("__loser")
    )
    return df.join(losers, df[id_col] == losers["__loser"], "left_anti")
