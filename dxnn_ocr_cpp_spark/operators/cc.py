"""Connected components over near-duplicate pair graphs — the step
that turns pair emitters (minhash_lsh_pairs / ngram_jaccard_pairs /
simhash_pairs) into actionable dedup CLUSTERS (one survivor per
component), the corpus-wide generalization of the reference's
per-task result grouping (/root/reference/src/pipeline/
ocr_pipeline.cpp:457-461 groups per-region results under one task id).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), pure
DataFrame ops:

  large-star  every node links its strictly-GREATER neighbors to the
              minimum of its neighborhood (incl. itself)
  small-star  every node links its not-greater neighbors to that
              minimum

Each round is one groupBy(node) shuffle; the pair converges in
O(log^2 n) rounds INDEPENDENT OF GRAPH DIAMETER — the property that
makes it the 100-TB choice over naive min-label propagation, whose
round count is the component diameter (a 10^6-doc duplicate chain =
10^6 rounds). Each round calls localCheckpoint() to truncate lineage —
without it, iteration k's plan embeds all k-1 predecessors and the
optimizer re-plans a geometrically growing tree (the classic iterative
Spark failure mode).

Convergence test: the edge multiset is already canonical (parent,
child) pairs after small-star; we stop when the sorted edge set's
(count, bit_xor of xxhash64) signature is unchanged — two cheap
aggregates, no collect of the edges themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_U, _V, _M = "__cc_u", "__cc_v", "__cc_m"


def _both_directions(edges: DataFrame) -> DataFrame:
    """Undirect (u,v) via explode-of-structs rather than a Union of
    swapped-alias selects: Catalyst's Union constraint rewriting
    (UnionBase.rewriteConstraints) throws `key not found` on the
    swapped-attribute pattern when constraint propagation is on — the
    generator form produces fresh attributes and sidesteps it."""
    e = F.explode(F.array(
        F.struct(F.col(_U).alias("u"), F.col(_V).alias("v")),
        F.struct(F.col(_V).alias("u"), F.col(_U).alias("v"))))
    return (edges.select(e.alias("e"))
            .select(F.col("e.u").alias(_U), F.col("e.v").alias(_V)))


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One large/small-star round over canonical (u,v) edges.

    Neighborhoods are built over BOTH directions; min is over the
    neighborhood including the center. large: emit (min, w) for
    strictly-greater neighbors w; small: emit (min, w) for not-greater
    neighbors w != min — the center itself is folded into the
    neighbor array (array_union with self), so (min, center) emits
    from the same explode and no Union is needed.
    """
    nb = (_both_directions(edges).groupBy(_U)
          .agg(F.least(F.min(_V), F.col(_U)).alias(_M),
               F.collect_set(_V).alias("__nbrs")))
    if large:
        w = F.explode("__nbrs")
        out = (nb.select(F.col(_M), w.alias(_V), F.col(_U))
               .filter(F.col(_V) > F.col(_U))
               .select(F.col(_M).alias(_U), _V))
    else:
        w = F.explode(F.array_union(F.col("__nbrs"),
                                    F.array(F.col(_U))))
        out = (nb.select(F.col(_M), w.alias(_V), F.col(_U))
               .filter((F.col(_V) <= F.col(_U)) & (F.col(_V) != F.col(_M)))
               .select(F.col(_M).alias(_U), _V))
    return out.filter(F.col(_U) != F.col(_V)).distinct()


def _signature(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(_U, _V)).alias("sig")).collect()[0]
    return row["n"], row["sig"]


def _driver_cc(edges: DataFrame, dtype: str) -> DataFrame:
    """Small-graph fast path: union-find on the driver. A dedup pair
    graph is RESULT-sized (pairs that survived a threshold), usually
    orders of magnitude smaller than the corpus — when it fits the
    driver comfortably, one collect + union-find beats O(log^2 n)
    Spark rounds of fixed job overhead (measured ~4s -> ~0.3s on a
    300-edge graph). Same output contract as the distributed path:
    component = min node id, only nodes present in the edge set."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edges.collect():
        u, v = r[_U], r[_V]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for x in parent:
        r = find(x)
        if r not in comp_min or x < comp_min[r]:
            comp_min[r] = x
    rows = [(comp_min[find(x)], x) for x in parent]
    return edges.sparkSession.createDataFrame(
        rows, f"component {dtype}, node {dtype}")


def connected_components(pairs: DataFrame, src: str, dst: str,
                         max_iter: int = 30,
                         small_graph_edges: int = 100_000) -> DataFrame:
    """(node, component) for every node in the pair graph; component =
    the minimum node id of the connected component (deterministic,
    partitioning-independent). Raises if max_iter rounds don't
    converge — at O(log^2 n) convergence, hitting 30 means the input
    is not a pair graph but a bug.

    Edge sets at or below small_graph_edges take the driver union-find
    fast path (_driver_cc) — identical output, pinned by
    tests/test_cc.py. The default is sized for driver REALITY, not raw
    edge bytes: collect() materializes ~100-200 B Row objects per edge
    plus two up-to-2x-node-count dicts, so 100k edges is tens of MB on
    the driver — comfortable; 1M+ would GC-thrash a modest driver. Set
    0 to force the distributed path.
    """
    edges = (pairs.select(F.col(src).alias(_U), F.col(dst).alias(_V))
             .filter(F.col(_U) != F.col(_V)).distinct()
             .localCheckpoint(eager=True))
    sig = _signature(edges)
    if sig[0] <= small_graph_edges:
        return _driver_cc(edges, pairs.schema[src].dataType.simpleString())
    for _ in range(max_iter):
        edges = _star(_star(edges, large=True), large=False) \
            .localCheckpoint(eager=True)
        new_sig = _signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"no convergence in {max_iter} rounds")
    # converged state is a forest of stars rooted at component minima;
    # exploding [child, root] per star edge emits the root rows from
    # the same generator (distinct dedups them) — again no Union
    return (edges.select(
                F.col(_U).alias("component"),
                F.explode(F.array(F.col(_V), F.col(_U))).alias("node"))
            .distinct())


def dedup_clusters(pairs: DataFrame, src: str = "a", dst: str = "b",
                   max_iter: int = 30) -> DataFrame:
    """Cluster summary per near-duplicate component: (component = min
    doc id = the canonical survivor, n_docs, max_doc). Docs absent from
    the pair graph are their own singleton clusters and are NOT
    emitted — the keep-list is `all docs EXCEPT (node != component)`.
    """
    cc = connected_components(pairs, src, dst, max_iter)
    return (cc.groupBy("component")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.max("node").cast("long").alias("max_doc")))


def canonical_docs(pairs: DataFrame, docs: DataFrame,
                   id_col: str = "doc_id", rank_col: str = "n_chars",
                   src: str = "a", dst: str = "b",
                   max_iter: int = 30) -> DataFrame:
    """Quality-aware canonical selection per near-duplicate cluster:
    (component, canonical_doc, n_docs, canonical_rank). Where
    dedup_clusters keeps min-id (arbitrary-but-stable), this keeps the
    BEST member — argmax of rank_col, ties to the smaller id — the
    keep-the-longest policy real dedup pipelines apply so boilerplate
    fragments never shadow the full article they duplicate.

    rank_col must be integer-valued (n_chars, token count, an integer
    quality grade): the argmax is then exact and bit-replayable, the
    classifier.py no-floats discipline — a float rank would put every
    cross-engine ULP on an argmax boundary.

    Scale shape: the cluster map (node, component) is result-sized
    (only docs that HAVE a near-dup); joining it to the corpus
    projects docs down to (id, rank) before the shuffle, and the
    argmax is one partial-aggregated max_by — no window, no sort, no
    second pass.
    """
    cc = connected_components(pairs, src, dst, max_iter)
    ranked = cc.join(
        docs.select(F.col(id_col).alias("node"),
                    F.col(rank_col).cast("long").alias("_rank")),
        "node")
    return (ranked.groupBy("component")
            .agg(F.max_by("node", F.struct(F.col("_rank"),
                                           -F.col("node")))
                 .cast("long").alias("canonical_doc"),
                 F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.max("_rank").cast("long").alias("canonical_rank")))
