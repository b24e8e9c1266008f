"""Distributed connected components — duplicate-cluster resolution.

Pairwise dup detection (exact hash, MinHash, SimHash, fingerprints)
yields EDGES; the unit of deduplication is the CLUSTER (a transitive
closure: A~B by md5, B~C by canonical fingerprint ⇒ {A,B,C} is one
duplicate group keeping one representative).

``connected_components`` is iterative min-label propagation (the
"hash-to-min" scheme): every node starts labeled with itself; each round
every node adopts the minimum label in its closed neighborhood; stop
when no label changes.  Rounds ≈ graph diameter (dup clusters are
near-cliques → 2-3 rounds).  Each round is one shuffle keyed on node id;
``localCheckpoint`` truncates the growing lineage so round N's plan does
not replay rounds 1..N-1 (the standard Spark iterative-algorithm
pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def connected_components(edges: DataFrame, max_iter: int = 50,
                         strict: bool = True) -> DataFrame:
    """(a, b) undirected edge list → (node, component) with component =
    min node id in the component.  Isolated nodes don't appear (callers
    left-join and coalesce to the node's own id).

    Convergence is checked, never assumed: min-label propagation moves
    one hop per round, so a component with diameter > max_iter would
    otherwise return silently split labels (ADVICE.md round 1).  On a
    non-converged exit this raises (``strict=True``, default) or logs a
    warning — wrong-but-quiet is the one outcome a dedup cluster
    resolver must not have.  Dup clusters are near-cliques (diameter
    2-3); chains only arise from adversarial transitive bridges, and 50
    rounds covers any plausible crawl corpus.
    """
    a, b = edges.columns[0], edges.columns[1]
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(
            edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    n_changed = 0
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' current labels
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("src", "node")
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
                (F.coalesce("nbr_component", F.col("component"))
                 < F.col("component")).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        n_changed = new_labels.filter("_changed").count()
        labels = new_labels.drop("_changed")
        if n_changed == 0:
            break

    sym.unpersist()
    if n_changed > 0:
        msg = (f"connected_components did not converge in {max_iter} "
               f"rounds ({n_changed} labels still changing) — labels "
               f"would be silently split; raise max_iter")
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def connected_components_star(edges: DataFrame, max_iter: int = 30,
                              strict: bool = True) -> DataFrame:
    """Large-star / small-star connected components (Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond") — the same
    ``(node, component=min id)`` contract as :func:`connected_components`
    but with the convergence/skew profile a 10^12-edge dup graph needs:

    - **rounds**: min-label propagation moves one hop per round
      (rounds ≈ diameter — a chain of transitive bridges between near-
      dup clusters can be arbitrarily long); star operations contract
      entire subtrees per round, converging in O(log n) alternations
      regardless of diameter.
    - **skew**: propagation's per-round aggregate is keyed on every
      node equally, but the JOIN fans a hub's label to all neighbors
      through one key.  Large-star emits strictly-smaller destination
      edges for a hub's neighbors in parallel (the hub's adjacency
      splits across its neighbors' groups next round), so hot keys
      shed degree monotonically instead of persisting to the end.

    Each alternation is two shuffles (groupBy min per star) + a
    distinct; lineage is truncated per round (``localCheckpoint``).
    Convergence is CHECKED (edge-set fixpoint), never assumed — same
    wrong-but-quiet guard as the propagation form.

    Semantics notes: self-loops are dropped; isolated nodes don't
    appear (same caller contract: left-join + coalesce to own id).
    """
    a, b = edges.columns[0], edges.columns[1]
    # canonical orientation: (hi, lo) with hi > lo
    e = (
        edges.select(F.col(a).alias("x"), F.col(b).alias("y"))
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .filter(F.col("x") != F.col("y"))
        .select(F.greatest("x", "y").alias("hi"),
                F.least("x", "y").alias("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (e.select(F.col("hi").alias("node"))
                 .unionByName(e.select(F.col("lo").alias("node")))
                 .distinct().persist())

    converged = False
    for _ in range(max_iter):
        # LARGE-STAR: over the symmetric adjacency, connect every
        # LARGER neighbor v > u to m = min(closed neighborhood of u).
        sym = (e.select(F.col("hi").alias("src"), F.col("lo").alias("nbr"))
               .unionByName(
                   e.select(F.col("lo").alias("src"),
                            F.col("hi").alias("nbr"))))
        mins = (sym.groupBy("src")
                .agg(F.min("nbr").alias("_mn"))
                .select("src", F.least("_mn", F.col("src")).alias("m")))
        large = (
            sym.join(mins, "src")
            .filter(F.col("nbr") > F.col("src"))
            .select(F.col("nbr").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # SMALL-STAR: over canonical edges grouped by the larger end u,
        # connect u and every smaller neighbor to m = min(neighbors).
        mins2 = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(mins2, "hi")
            .select(F.col("lo").alias("hi2"), F.col("m"))
            .filter(F.col("hi2") != F.col("m"))
            .select(F.col("hi2").alias("hi"), F.col("m").alias("lo"))
            .unionByName(
                mins2.select(F.col("hi"), F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # fixpoint test: the edge set is stable (both directions of
        # set-difference empty — two anti-join probes on small sets)
        changed = (
            small.join(e, ["hi", "lo"], "left_anti").limit(1).count()
            + e.join(small, ["hi", "lo"], "left_anti").limit(1).count()
        )
        # Release the previous round's checkpoint now that the new one
        # is materialized and the fixpoint probes above have read it —
        # otherwise up to max_iter cached edge RDDs pile up in executor
        # storage on large dup graphs (round-5 advice).
        prev, e = e, small
        prev.unpersist()
        if changed == 0:
            converged = True
            break

    if not converged:
        msg = (f"connected_components_star did not converge in "
               f"{max_iter} alternations — labels would be silently "
               f"split; raise max_iter")
        if strict:
            all_nodes.unpersist()
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    # terminal state is a star forest: (child, root).  Roots label
    # themselves; every input node gets exactly one row.
    labels = (
        all_nodes.join(e.withColumnRenamed("hi", "node"), "node", "left")
        .select("node", F.coalesce("lo", F.col("node")).alias("component"))
    )
    labels = labels.localCheckpoint(eager=True)
    all_nodes.unpersist()
    e.unpersist()  # terminal edge checkpoint no longer needed
    return labels


def pagerank(edges: DataFrame, n_iter: int = 5,
             damping: float = 0.85) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — host-level
    centrality for crawl prioritization / quality priors (the same rank
    family Common Crawl publishes for its host graph).

    Semantics (the classic power-iteration form, uniform teleport):

    - multi-edges collapse first (``distinct``) — simple-graph rank;
    - ``rank_0 = 1/N``;
    - each round every node scatters ``d * rank/outdeg`` along its
      out-edges; dangling nodes (no out-edges) scatter their whole mass
      uniformly; every node adds the ``(1-d)/N`` teleport term.

    Plan shape per round: one hash join (ranks ⋈ edges on src) + one
    aggregation keyed on dst — both shuffle on node id, and at web
    scale the node set is HOSTS (~10^8), not pages, so the state fits a
    normal shuffle.  The dangling mass is a one-row aggregate joined
    back by broadcast cross-join (never a driver collect inside the
    loop); ``localCheckpoint`` truncates the per-round lineage exactly
    as ``connected_components`` does.  Fixed ``n_iter`` (no float
    convergence test) keeps runs bit-deterministic.

    Returns ``(node, rank)`` — ranks sum to 1 (±float).
    """
    a, b = edges.columns[0], edges.columns[1]
    e = (edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
         .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct().persist())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().persist())
    n_nodes = nodes.count()
    if n_nodes == 0:
        e.unpersist()
        nodes.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))

    for _ in range(n_iter):
        state = (ranks.join(outdeg, ranks.node == outdeg.src, "left")
                 .select("node", "rank", "outdeg"))
        dangling = state.agg(
            F.coalesce(F.sum(F.when(F.col("outdeg").isNull(),
                                    F.col("rank"))), F.lit(0.0))
            .alias("_dangling"))
        contrib = (
            e.join(state.withColumnRenamed("node", "_sn"),
                   e.src == F.col("_sn"))
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(broadcast(dangling))
            .select(
                "node",
                (F.lit((1.0 - damping) / n_nodes)
                 + F.lit(damping)
                 * (F.coalesce("_in", F.lit(0.0))
                    + F.col("_dangling") / n_nodes)).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )

    e.unpersist()
    nodes.unpersist()
    return ranks
