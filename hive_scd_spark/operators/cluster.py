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
  graphs, ``strategy="star"`` switches to alternating
  large-star/small-star (Kiveris et al., "Connected Components in
  MapReduce and Beyond", SoCC'14): two shuffle phases per round but
  O(log n) rounds — a 40-node chain converges in ~6 rounds
  (test-pinned) where propagation would need 40;
- convergence detection is FREE of extra rounds: each round's label
  row carries a changed-flag, and the round's single action (which
  also materializes the checkpoint) sums the flags.  Propagation is
  deterministic, so zero changes == proven fixpoint — the final round
  certifies itself instead of needing a confirming repeat.

Output contains only nodes that appear in at least one pair; singleton
documents keep their identity trivially (cluster = self) and are the
caller's union if desired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _free_checkpoint(df: DataFrame | None) -> None:
    """Unpersist the block-store RDD behind a ``localCheckpoint``-ed
    DataFrame.  Iterative loops supersede each round's checkpoint with
    the next; without this, every round's blocks stay pinned until the
    JVM garbage-collects the RDD handle — a real memory leak over many
    rounds at scale, and deferred-cleanup GC debt that lands on
    whatever query runs next in a shared session."""
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.nodeName() == "LogicalRDD":
            rdd = plan.rdd()
            # Spark logs a WARN on unpersisting a locally-checkpointed
            # RDD ("cannot be recomputed") — here that is the POINT:
            # the round is superseded and nothing references it again.
            # Silence that one RDD class's logger before the call so an
            # intentional free doesn't read as a problem in bench logs.
            try:
                jvm = df.sparkSession._jvm
                jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                    rdd.getClass().getName(), jvm.org.apache.logging.log4j.Level.ERROR
                )
            except Exception:
                pass
            rdd.unpersist(False)
    except Exception:
        pass  # cleanup is best-effort; correctness never depends on it


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    strategy: str = "propagate",
) -> DataFrame:
    """Connected components over the undirected pair graph → one row
    per member node: ``(node, cluster)`` with ``cluster`` = min node id
    in the component.

    ``strategy="propagate"`` (default): min-label propagation —
    cheapest per round, rounds = component diameter.  The right choice
    for near-dup graphs (cliques/short chains).

    ``strategy="star"``: alternating large-star/small-star (Kiveris et
    al., SoCC'14) — two shuffle phases per round but O(log n) rounds,
    the right choice when components can be long chains (e.g. temporal
    chains of incremental edits).  Both strategies produce identical
    output."""
    if strategy == "star":
        return _star_components(pairs, id_a, id_b, max_iter)
    if strategy != "propagate":
        raise ValueError(f"unknown strategy {strategy!r}: 'propagate' or 'star'")
    edges = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    # lazy checkpoint BEFORE the symmetrizing union: the two union
    # branches reference the upstream pair pipeline twice, and whether
    # ReuseExchange dedupes them depends on plan shape (it does for the
    # current LSH gate's shuffle exchanges — timings unchanged — but
    # provably does NOT for broadcast-side subplans, see
    # dedup.minhash_near_dup_pairs).  The checkpoint makes the
    # single-execution guarantee structural instead of
    # optimizer-dependent; cost is storing the (tiny) pair list.
    ).localCheckpoint(eager=False)
    und = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # distinct: near-dup pair lists can carry a pair via several bands;
    # one shuffle here halves every subsequent round's join input
    und = und.distinct().localCheckpoint(eager=False)
    # seed labels with the first propagation round fused in (node →
    # min(self, neighbors)): one groupBy instead of distinct + a full
    # round — saves one join/agg/probe cycle for clique-shaped graphs
    labels = (
        und.groupBy("a")
        .agg(F.min("b").alias("__mb"))
        .select(F.col("a").alias("node"), F.least("a", "__mb").alias("cluster"))
        .localCheckpoint(eager=False)
    )

    prev_ck = labels  # superseded checkpoint, freed once the next round lands
    for _ in range(max_iter):
        # neighbor minimum: one equi-join + partial-aggregated min
        neigh = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("cluster").alias("n_min"))
        )
        # The convergence probe is FUSED into the round: each new label
        # row carries a __chg flag (did this node's label shrink?), and
        # the round's single action sums the flags while materializing
        # the checkpoint.  Propagation is deterministic, so a round
        # with zero changes is a proven fixpoint — no confirmation
        # round (the old sum-equality probe needed one extra round to
        # observe two equal sums; clique-shaped graphs now finish in
        # ONE round after the fused seed).
        ck = (
            labels.join(neigh, labels["node"] == neigh["a"], "left")
            .select(
                "node",
                F.least(F.col("cluster"), F.coalesce("n_min", F.col("cluster"))).alias(
                    "cluster"
                ),
                (F.col("n_min") < F.col("cluster"))
                .cast("int")
                .alias("__chg"),  # NULL n_min (no neighbors) → NULL → sums as 0
            )
            .localCheckpoint(eager=False)  # truncate lineage each round
        )
        n_changed = ck.agg(F.sum("__chg")).first()[0]
        _free_checkpoint(prev_ck)  # ck is materialized; round n-1 is garbage
        prev_ck = ck
        labels = ck.drop("__chg")
        if not n_changed:
            _free_checkpoint(und)  # output depends only on the final checkpoint
            return labels
        # diameter ≫ max_iter chain graphs: use strategy="star"
        # (_star_components below — O(log n) rounds)
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iter} rounds — "
        "pathological chain graph; use a larger max_iter or the "
        "large-star/small-star variant"
    )


def _star_components(
    pairs: DataFrame, id_a: str, id_b: str, max_iter: int
) -> DataFrame:
    """Alternating large-star/small-star connected components.

    Each round:

    - **large-star**: symmetrize edges; per center u compute
      ``m = min(neighbors ∪ {u})``; re-point every STRICTLY LARGER
      neighbor at m.  (One groupBy-min + one join per phase — both
      map-side combinable, keys are node ids, skew bounded by max
      degree, which for near-dup graphs is the cluster size.)
    - **small-star**: orient edges large→small; per center u re-point
      u and all its (smaller) neighbors at their minimum.

    The edge set converges to the star graph {(node, component_min)}
    in O(log n) rounds; convergence is detected with a PROVABLE
    certificate: ``new_edges EXCEPT old_edges`` is empty AND the counts
    match ⇒ the (distinct) edge sets are equal ⇒ fixpoint, since the
    round transform is deterministic.  Both probes ride one action per
    round on the already-checkpointed edge RDDs.  (The earlier
    (count, sum_a, sum_b) triple was not a proven invariant — a round
    that rearranged edges while preserving count and endpoint sums
    could have terminated early; flagged in round-3 ADVICE.)
    """
    edges = (
        pairs.select(
            F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    self_nodes = (
        pairs.select(F.col(id_a).cast("long").alias("node"))
        .union(pairs.select(F.col(id_b).cast("long").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    prev_edges = None
    prev_count = None
    stale = None  # edges from two rounds back — no consumer left
    for _ in range(max_iter):
        # large-star
        sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = (
            sym.groupBy("a")
            .agg(F.min("b").alias("__mb"))
            .select("a", F.least("__mb", "a").alias("m"))
        )
        edges = (
            sym.filter(F.col("b") > F.col("a"))
            .join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star: orient big→small
        oriented = edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        mins = oriented.groupBy("a").agg(F.min("b").alias("m"))
        edges = (
            oriented.join(mins, "a")
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .union(oriented.join(mins, "a").select("a", F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # provable fixpoint certificate: |new| == |old| and
        # new ⧵ old == ∅  ⇒  equal distinct edge sets.  exceptAll on
        # two checkpointed, distinct edge sets; one small action.
        cur_count = edges.count()
        if (
            prev_edges is not None
            and cur_count == prev_count
            and edges.exceptAll(prev_edges).limit(1).count() == 0
        ):
            break
        _free_checkpoint(stale)
        stale = prev_edges
        prev_edges, prev_count = edges, cur_count
    else:
        raise RuntimeError(f"star components did not converge in {max_iter} rounds")
    # output depends only on the FINAL edge checkpoint (+ self_nodes)
    _free_checkpoint(stale)
    _free_checkpoint(prev_edges)
    # final edge set is the star {(node, min)}; add back singleton-pair
    # nodes that ARE their component min (they have no outgoing edge)
    labels = edges.select(F.col("a").alias("node"), F.col("b").alias("cluster"))
    mins_only = self_nodes.join(
        labels.select(F.col("node").alias("__n")),
        self_nodes["node"] == F.col("__n"),
        "left_anti",
    ).select("node", F.col("node").alias("cluster"))
    return labels.union(mins_only)


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


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iters: int = 5,
    scale: int = 1_000_000,
    directed: bool = False,
) -> DataFrame:
    """PageRank in EXACT integer arithmetic — the iterative-algorithm
    complement to :func:`dup_clusters` (CC answers "which documents are
    the same"; PageRank ranks centrality within the duplicate/link
    graph, e.g. picking the canonical doc as the most-linked variant).

    Ranks live in integer units of 1/*scale*: every update is
    ``floor(0.15*scale) + (17 * sum(contrib)) // 20`` with
    ``contrib = rank // out_degree`` — integer division throughout, so
    the fixed-*iters* result is bit-identical in any engine (a double
    formulation would be summation-order-dependent and un-oracle-able;
    the truncation error per step is bounded by degree/scale, irrelevant
    for ranking).  Dangling mass: with ``directed=False`` (default) the
    graph is symmetrized so no dangling nodes exist; with
    ``directed=True`` sink nodes leak their mass (documented standard
    simplification — totals shrink, the ORDER is what the operator
    serves).

    Plan shape per iteration: one join of the edge list with the
    current rank (both keyed by node — AQE broadcasts the rank side
    when small), one map-combinable groupBy(dst) sum, a left join back
    onto the node set.  ``localCheckpoint`` truncates lineage per round
    (same rationale as dup_clusters' rounds).  Output:
    ``(node, rank_scaled)``."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("__s"), F.col(src).alias("__d"))
        )
    # checkpoint the EDGE SET once before iterating (the dup_clusters
    # discipline): each per-iteration rank checkpoint is its own
    # boundary, so without this the upstream edge derivation — e.g. a
    # full substring-dedup pipeline — re-executes in EVERY iteration
    # (measured 12.3 s vs ~1.2 s for the edge pipeline alone at sf0.1)
    e = e.distinct().localCheckpoint(eager=False)
    # checkpoint the loop INVARIANTS once instead of the loop VARIABLE
    # every round (optimization r15): deg and nodes are referenced by
    # every iteration, so un-checkpointed they re-derive per round; the
    # per-round rank checkpoint, by contrast, was pure lineage hygiene
    # (fixed iteration count — no convergence probe reads the rounds),
    # and each one forced a df→RDD stage materialization + cache pass.
    # With invariants pinned and rounds left lazy, the whole fixed-K
    # recursion executes as ONE query (measured at sf0.1: 35 → 20 Spark
    # jobs for graph_pagerank_dups builder+noop; values are
    # bit-identical — checkpoints never change data).  Deep-unroll
    # safety: lineage depth grows ~4 operators/round, so re-pin the
    # rank every 8 rounds to bound plan depth for large `iters`.
    deg = e.groupBy("__s").agg(F.count("*").alias("__deg")).localCheckpoint(
        eager=False
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    base = scale * 3 // 20  # floor(0.15 * scale), exactly
    r = nodes.withColumn("rank_scaled", F.lit(scale).cast("long"))
    for i in range(iters):
        contrib = (
            e.join(r, e.__s == r.node)
            .join(deg, "__s")
            .select(
                F.col("__d").alias("node"),
                F.expr("rank_scaled div __deg").alias("__c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("__c").alias("__in"))
        r = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr("(17 * coalesce(__in, 0L)) div 20")
            ).alias("rank_scaled"),
        )
        if (i + 1) % 8 == 0 and (i + 1) < iters:
            r = r.localCheckpoint(eager=False)
    return r
