"""Link-graph construction + host-level PageRank — the web-graph
quality prior every large crawl-derived corpus uses (host/domain rank
as a curation feature; the Common-Crawl ecosystem publishes exactly
this artifact as its host-level webgraph ranks).

Two stages, both pure DataFrame:

  host_edges     HTML -> (src_host, dst_host, n_links): href harvest
                 via regexp_extract_all (JVM-side, zero Python),
                 explode, one partial-aggregated groupBy. The regex
                 stays in the Java/RE2 common subset so the DuckDB
                 oracle replays the IDENTICAL pattern string (the
                 urls.py discipline).
  host_pagerank  weighted PageRank power iteration over the host
                 graph. Hosts number ~10^8 at web scale while pages
                 number ~10^12, so aggregating to hosts BEFORE
                 iterating is the step that makes rank computation
                 tractable — the edge list shrinks ~10^4x. Each
                 iteration is (ranks ⋈ edges on src) -> groupBy dst:
                 two hash shuffles on host keys; per-round
                 localCheckpoint truncates the iterative lineage
                 (same failure mode + fix as operators/cc.py).

Link policy (deterministic, SQL-mirrorable):
  - absolute http(s) links contribute an edge to the link's host
  - protocol-relative (//host/...) links likewise
  - relative links stay on the source host -> self-edge -> dropped
  - self-edges and unparseable targets are dropped (intra-host links
    carry no cross-site endorsement; PageRank runs on the rest)

Reference analog: the reference pipeline has no corpus graph notion
(single-image requests); this is corpus-level infrastructure its
batch analog needs, same category as operators/snapshots.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urls import AUTHORITY_RE

# one source of truth: interpolated verbatim into the DuckDB oracle.
# group 1 = the href value; fragment-only links ([^"'#]) never match.
HREF_RE = r"""(?i)<a\s[^>]*?href\s*=\s*["']([^"'#][^"']*)["']"""


def _host_of_link(link, src_host):
    """Column: destination host for one harvested href under the
    module's link policy ('' when unparseable)."""
    absolute = F.lower(F.regexp_extract(link, AUTHORITY_RE, 1))
    proto_rel = F.lower(F.regexp_extract(
        F.concat(F.lit("http:"), link), AUTHORITY_RE, 1))
    raw = (F.when(link.rlike(r"^(?i)https?://"), absolute)
           .when(link.startswith("//"), proto_rel)
           .otherwise(src_host))
    # drop userinfo then port — same normalization as urls.authority_host
    return F.element_at(F.split(F.element_at(F.split(raw, "@"), -1),
                                ":"), 1)


def host_edges(docs: DataFrame, url_col: str = "url",
               html_col: str = "html") -> DataFrame:
    """(src_host, dst_host, n_links) from raw HTML.

    Scale shape: href harvest + host resolution are pure Catalyst
    expressions inside the scan stage (regexp_extract_all + explode,
    no Python hop, no UDF); the ONLY exchange is the final
    partial-aggregated groupBy on (src_host, dst_host) — and the
    explode output it shuffles is (host, host) string pairs, never
    the HTML. html_col may be string or binary (cast via decode is
    the caller's concern at this seam; string expected here).
    """
    src_host = F.element_at(
        F.split(F.element_at(
            F.split(F.lower(F.regexp_extract(F.col(url_col),
                                             AUTHORITY_RE, 1)),
                    "@"), -1), ":"), 1)
    link = F.explode(
        F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), F.lit(1)))
    dst = _host_of_link(F.col("_link"), F.col("_src_host"))
    return (docs
            .select(src_host.alias("_src_host"), link.alias("_link"))
            .withColumn("_dst_host", dst)
            .filter((F.col("_dst_host") != F.col("_src_host"))
                    & (F.col("_dst_host") != "")
                    & (F.col("_src_host") != ""))
            .groupBy(F.col("_src_host").alias("src_host"),
                     F.col("_dst_host").alias("dst_host"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_links")))


# full <a ...>text</a> element with a PLAIN-TEXT body: group 1 = href,
# group 2 = anchor text. [^<]* bodies only — anchors wrapping nested
# markup are skipped by policy (their text belongs to the inner
# elements; harvesting it would double-count against extraction).
# Same Java/RE2 common regex subset as HREF_RE so the DuckDB oracle
# replays the IDENTICAL pattern string.
ANCHOR_RE = (r"""(?i)<a\s[^>]*?href\s*=\s*["']([^"'#][^"']*)["']"""
             r"""[^>]*>([^<]*)</a>""")


def anchor_texts(docs: DataFrame, url_col: str = "url",
                 html_col: str = "html") -> DataFrame:
    """(dst_host, anchor, n) — how the web DESCRIBES each host: the
    classic anchor-text signal (used for search relevance and as a
    crawl/quality prior; the link-graph twin of host_edges carrying
    the human-readable labels instead of counts).

    Anchor normalization: whitespace-collapse + trim + lower; empty
    anchors and self-links are dropped (same cross-site-endorsement
    policy as host_edges — a site's own labels for itself are
    navigation, not description).

    Scale shape: harvest is pure Catalyst (regexp_extract_all of FULL
    anchor elements, explode, two per-element regexp_extract calls —
    no Python hop); the shuffle carries (host, short-anchor) string
    pairs, never the HTML; ONE partial-aggregated groupBy.
    """
    src_host = F.element_at(
        F.split(F.element_at(
            F.split(F.lower(F.regexp_extract(F.col(url_col),
                                             AUTHORITY_RE, 1)),
                    "@"), -1), ":"), 1)
    el = F.explode(
        F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), F.lit(0)))
    link = F.regexp_extract(F.col("_el"), ANCHOR_RE, 1)
    anchor = F.lower(F.trim(F.regexp_replace(
        F.regexp_extract(F.col("_el"), ANCHOR_RE, 2), r"\s+", " ")))
    dst = _host_of_link(link, F.col("_src_host"))
    return (docs
            .select(src_host.alias("_src_host"), el.alias("_el"))
            .select("_src_host", dst.alias("_dst_host"),
                    anchor.alias("anchor"))
            .filter((F.col("_dst_host") != F.col("_src_host"))
                    & (F.col("_dst_host") != "")
                    & (F.col("_src_host") != "")
                    & (F.col("anchor") != ""))
            .groupBy(F.col("_dst_host").alias("dst_host"), "anchor")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def top_anchors(anchors: DataFrame, k: int = 3) -> DataFrame:
    """Top-k anchor labels per destination host by (n DESC, anchor
    ASC) — deterministic under count ties. One window partitioned by
    dst_host (a second exchange after anchor_texts' (host, anchor)
    groupBy; hosts are plentiful so the partition is never hot)."""
    from pyspark.sql.window import Window
    w = (Window.partitionBy("dst_host")
         .orderBy(F.desc("n"), F.asc("anchor")))
    return (anchors.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= int(k))
            .select("dst_host", "anchor", "n",
                    F.col("rk").cast("long").alias("rk")))


def host_pagerank(edges: DataFrame, damping: float = 0.85,
                  iters: int = 3, weight_col: str = "n_links") -> DataFrame:
    """(host, rank) after `iters` rounds of weighted PageRank over a
    (src_host, dst_host, weight) edge list.

    Semantics (simplified PageRank, the SQL-replayable variant):
      rank_0(v)   = 1/N for the N distinct hosts in the graph
      rank_k+1(v) = (1-d)/N + d * sum over in-edges (u,v) of
                    rank_k(u) * w(u,v) / out_weight(u)
    Dangling-host mass (hosts with no out-edges) is NOT redistributed
    — the uniform (1-d)/N term keeps every host ranked; ranks are a
    relative quality prior here, not a probability distribution, and
    this choice keeps the operator exactly replayable as `iters`
    unrolled SQL CTEs (the driver oracle does precisely that).

    Scale shape: out_weight is one partial-aggregated groupBy computed
    ONCE and persisted with the normalized edges; each iteration joins
    current ranks to edges on src (both hash-partitioned on host
    strings) and re-aggregates on dst — no broadcast of corpus-sized
    state, no window, no driver collect (N is read from one count()).
    localCheckpoint per round truncates the growing iterative plan.
    """
    e = (edges.select(F.col("src_host").alias("u"),
                      F.col("dst_host").alias("v"),
                      F.col(weight_col).cast("double").alias("w")))
    out_w = e.groupBy("u").agg(F.sum("w").alias("ow"))
    norm = (e.join(out_w, "u")
            .select("u", "v", (F.col("w") / F.col("ow")).alias("share"))
            .persist())
    nodes = (e.select(F.col("u").alias("host"))
             .union(e.select(F.col("v").alias("host")))
             .distinct().persist())
    n = nodes.count()  # one long — the only driver-side scalar
    ranks = nodes.select("host", F.lit(1.0 / n).alias("rank"))
    for k in range(iters):
        contrib = (ranks.join(norm, ranks["host"] == norm["u"])
                   .groupBy(F.col("v").alias("host"))
                   .agg(F.sum(F.col("rank") * F.col("share")).alias("c")))
        ranks = (nodes.join(contrib, "host", "left")
                 .select("host",
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                          ).alias("rank"))
                 # last round checkpoints EAGERLY so the cached
                 # intermediates can be released below instead of
                 # accumulating across calls in a long-lived session
                 .localCheckpoint(eager=(k == iters - 1)))
    norm.unpersist()
    nodes.unpersist()
    return ranks


def pagerank_oracle_sql(edges_cte: str, damping: float = 0.85,
                        iters: int = 3) -> str:
    """DuckDB SQL replaying host_pagerank over `edges_cte` — a CTE
    body selecting (u, v, w) — as `iters` unrolled CTEs. Returns a
    full query yielding (host, rank); the caller rounds/orders."""
    d = damping
    parts = [
        f"WITH e AS ({edges_cte})",
        "nodes AS (SELECT DISTINCT u AS host FROM e "
        "UNION SELECT DISTINCT v FROM e)",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        "norm AS (SELECT u, v, w / sum(w) OVER (PARTITION BY u) "
        "AS share FROM e)",
        "r0 AS (SELECT host, 1.0 / nn.n AS rank FROM nodes, nn)",
    ]
    for k in range(iters):
        parts.append(
            f"r{k + 1} AS (SELECT nodes.host, "
            f"(1.0 - {d}) / nn.n + {d} * coalesce(c.c, 0.0) AS rank "
            f"FROM nodes CROSS JOIN nn LEFT JOIN "
            f"(SELECT norm.v AS host, sum(r{k}.rank * norm.share) AS c "
            f" FROM r{k} JOIN norm ON r{k}.host = norm.u "
            f" GROUP BY norm.v) c ON nodes.host = c.host)")
    return ",\n".join(parts) + f"\nSELECT host, rank FROM r{iters}"


def host_trustrank(edges: DataFrame, seeds: DataFrame,
                   damping: float = 0.85, iters: int = 3,
                   weight_col: str = "n_links") -> DataFrame:
    """(host, trust) after `iters` rounds of seed-personalized
    PageRank — TrustRank (Gyongyi, Garcia-Molina & Pedersen,
    VLDB 2004): the spam-demotion companion of host_pagerank.

    Same propagation as host_pagerank, different teleport vector: mass
    re-enters ONLY at a curated trusted seed set S, so trust decays
    with link distance from S and link farms that inflate raw
    PageRank (no trusted in-paths) stay near zero:
      trust_0(v)   = 1/|S| if v in S else 0
      trust_k+1(v) = (1-d) * teleport(v) + d * sum over in-edges (u,v)
                     of trust_k(u) * w(u,v) / out_weight(u)
    Dangling mass is not redistributed — the host_pagerank convention,
    keeping the operator exactly replayable as unrolled SQL CTEs
    (trustrank_oracle_sql).

    `seeds`: a (host) DataFrame. Real seed lists are 10^2-10^4 rows
    (human-audited), so the seed flag rides a BROADCAST left-semi-style
    join onto the node table; everything else is the host_pagerank
    scale shape — out_weight aggregated once, one edges-to-ranks join
    + re-aggregation per round, localCheckpoint lineage truncation,
    the |S| count() the only driver scalar. Seeds absent from the
    graph contribute nothing and are not ranked; raises if no seed
    intersects the graph (an all-zero teleport has no fixed point).
    """
    e = (edges.select(F.col("src_host").alias("u"),
                      F.col("dst_host").alias("v"),
                      F.col(weight_col).cast("double").alias("w")))
    out_w = e.groupBy("u").agg(F.sum("w").alias("ow"))
    norm = (e.join(out_w, "u")
            .select("u", "v", (F.col("w") / F.col("ow")).alias("share"))
            .persist())
    nodes = (e.select(F.col("u").alias("host"))
             .union(e.select(F.col("v").alias("host")))
             .distinct())
    seed_col = seeds.columns[0]
    flagged = (nodes.join(
        F.broadcast(seeds.select(F.col(seed_col).alias("host"))
                    .distinct().withColumn("is_seed", F.lit(True))),
        "host", "left")
        .select("host",
                F.coalesce("is_seed", F.lit(False)).alias("is_seed"))
        .persist())
    ns = flagged.filter("is_seed").count()  # the only driver scalar
    if ns == 0:
        raise ValueError("host_trustrank: no seed host appears in the "
                         "edge graph — teleport vector would be zero")
    teleport = F.when(F.col("is_seed"), F.lit(1.0 / ns)) \
        .otherwise(F.lit(0.0))
    ranks = flagged.select("host", teleport.alias("trust"), "is_seed")
    for k in range(iters):
        contrib = (ranks.join(norm, ranks["host"] == norm["u"])
                   .groupBy(F.col("v").alias("host"))
                   .agg(F.sum(F.col("trust") * F.col("share")).alias("c")))
        ranks = (flagged.join(contrib, "host", "left")
                 .select("host",
                         (F.lit(1.0 - damping) * teleport
                          + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                          ).alias("trust"),
                         "is_seed")
                 # eager last round -> caches releasable (see
                 # host_pagerank)
                 .localCheckpoint(eager=(k == iters - 1)))
    norm.unpersist()
    flagged.unpersist()
    return ranks.select("host", "trust")


def trustrank_oracle_sql(edges_cte: str, seeds_cte: str,
                         damping: float = 0.85, iters: int = 3) -> str:
    """DuckDB SQL replaying host_trustrank over `edges_cte` (a CTE
    body selecting (u, v, w)) and `seeds_cte` (a CTE body selecting
    (host)) as `iters` unrolled CTEs. Returns a full query yielding
    (host, trust); the caller rounds/orders. The float expression
    mirrors the operator's op order: (1-d) * teleport + d * c."""
    d = damping
    parts = [
        f"WITH e AS ({edges_cte})",
        f"seeds AS (SELECT DISTINCT host FROM ({seeds_cte}))",
        "nodes AS (SELECT DISTINCT u AS host FROM e "
        "UNION SELECT DISTINCT v FROM e)",
        "flagged AS (SELECT nodes.host, seeds.host IS NOT NULL "
        "AS is_seed FROM nodes LEFT JOIN seeds "
        "ON nodes.host = seeds.host)",
        "ns AS (SELECT count(*)::DOUBLE AS n FROM flagged "
        "WHERE is_seed)",
        "norm AS (SELECT u, v, w / sum(w) OVER (PARTITION BY u) "
        "AS share FROM e)",
        "t0 AS (SELECT host, CASE WHEN is_seed THEN 1.0 / ns.n "
        "ELSE 0.0 END AS trust FROM flagged, ns)",
    ]
    for k in range(iters):
        parts.append(
            f"t{k + 1} AS (SELECT flagged.host, "
            f"(1.0 - {d}) * (CASE WHEN flagged.is_seed "
            f"THEN 1.0 / ns.n ELSE 0.0 END) "
            f"+ {d} * coalesce(c.c, 0.0) AS trust "
            f"FROM flagged CROSS JOIN ns LEFT JOIN "
            f"(SELECT norm.v AS host, sum(t{k}.trust * norm.share) AS c "
            f" FROM t{k} JOIN norm ON t{k}.host = norm.u "
            f" GROUP BY norm.v) c ON flagged.host = c.host)")
    return ",\n".join(parts) + f"\nSELECT host, trust FROM t{iters}"


def host_hits(edges: DataFrame, iters: int = 3,
              weight_col: str = "n_links") -> DataFrame:
    """(host, hub, authority) after `iters` rounds of weighted HITS
    (Kleinberg, JACM 1999) over a (src_host, dst_host, weight) edge
    list — the hub/authority complement of host_pagerank: authorities
    are hosts good hubs point AT (reference targets worth boosting in
    a curation prior), hubs are hosts that point at good authorities
    (directories/aggregators — often the PAGES one drops while
    KEEPING what they link to).

    Semantics (L1-normalized mutual reinforcement, the SQL-replayable
    variant):
      hub_0(u)  = 1.0 for every host in the graph
      auth_k(v) = sum over in-edges (u,v) of hub_k-1(u) * w(u,v),
                  then divided by the graph-wide sum (L1)
      hub_k(u)  = sum over out-edges (u,v) of auth_k(v) * w(u,v),
                  then divided by the graph-wide sum
    Hosts with no in-edges (resp. out-edges) carry authority (resp.
    hub) 0 and stay ranked.

    Scale shape: the host_pagerank discipline — two edges-to-scores
    joins + partial-aggregated groupBys per round (both sides
    hash-partitioned on host strings), each L1 denominator a 1-row
    aggregate broadcast back (never a driver collect), localCheckpoint
    per round truncates the iterative lineage. Exactly replayable as
    unrolled CTEs (hits_oracle_sql).
    """
    e = (edges.select(F.col("src_host").alias("u"),
                      F.col("dst_host").alias("v"),
                      F.col(weight_col).cast("double").alias("w"))
         .persist())
    nodes = (e.select(F.col("u").alias("host"))
             .union(e.select(F.col("v").alias("host")))
             .distinct().persist())
    hubs = nodes.select("host", F.lit(1.0).alias("hub"))
    auth = None
    for k in range(iters):
        last = k == iters - 1
        ain = (hubs.join(e, hubs["host"] == e["u"])
               .groupBy(F.col("v").alias("host"))
               .agg(F.sum(F.col("hub") * F.col("w")).alias("a")))
        asum = ain.agg(F.sum("a").alias("_s"))
        auth = (nodes.join(ain, "host", "left")
                .crossJoin(F.broadcast(asum))
                .select("host", (F.coalesce("a", F.lit(0.0))
                                 / F.col("_s")).alias("authority"))
                .localCheckpoint(eager=last))
        hout = (auth.join(e, auth["host"] == e["v"])
                .groupBy(F.col("u").alias("host"))
                .agg(F.sum(F.col("authority") * F.col("w")).alias("h")))
        hsum = hout.agg(F.sum("h").alias("_s"))
        hubs = (nodes.join(hout, "host", "left")
                .crossJoin(F.broadcast(hsum))
                .select("host", (F.coalesce("h", F.lit(0.0))
                                 / F.col("_s")).alias("hub"))
                # eager last round -> caches releasable (see
                # host_pagerank)
                .localCheckpoint(eager=last))
    e.unpersist()
    nodes.unpersist()
    return hubs.join(auth, "host").select("host", "hub", "authority")


def hits_oracle_sql(edges_cte: str, iters: int = 3) -> str:
    """DuckDB SQL replaying host_hits over `edges_cte` (a CTE body
    selecting (u, v, w)) as `iters` unrolled CTE rounds. Returns a
    full query yielding (host, hub, authority); caller rounds/orders."""
    # every CTE is MATERIALIZED: each round references the previous
    # round 2-3 times (join + L1 scalar subquery), so DuckDB's default
    # CTE inlining would replicate the whole chain exponentially
    # (~4^iters copies of the edge harvest — measured as a hang at
    # iters=3 on 500 docs; materialization makes it linear like the
    # Spark plan's localCheckpoints)
    parts = [
        f"WITH e AS MATERIALIZED ({edges_cte})",
        "nodes AS MATERIALIZED (SELECT DISTINCT u AS host FROM e "
        "UNION SELECT DISTINCT v FROM e)",
        "h0 AS MATERIALIZED (SELECT host, 1.0 AS hub FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"a{k}r AS MATERIALIZED "
            f"(SELECT e.v AS host, sum(h{k - 1}.hub * e.w) AS a "
            f"FROM h{k - 1} JOIN e ON h{k - 1}.host = e.u GROUP BY e.v)")
        parts.append(
            f"a{k} AS MATERIALIZED "
            f"(SELECT nodes.host, coalesce(a{k}r.a, 0.0) / "
            f"(SELECT sum(a) FROM a{k}r) AS authority "
            f"FROM nodes LEFT JOIN a{k}r ON nodes.host = a{k}r.host)")
        parts.append(
            f"h{k}r AS MATERIALIZED (SELECT e.u AS host, "
            f"sum(a{k}.authority * e.w) AS h "
            f"FROM a{k} JOIN e ON a{k}.host = e.v GROUP BY e.u)")
        parts.append(
            f"h{k} AS MATERIALIZED "
            f"(SELECT nodes.host, coalesce(h{k}r.h, 0.0) / "
            f"(SELECT sum(h) FROM h{k}r) AS hub "
            f"FROM nodes LEFT JOIN h{k}r ON nodes.host = h{k}r.host)")
    return (",\n".join(parts)
            + f"\nSELECT h{iters}.host, h{iters}.hub, a{iters}.authority"
            f" FROM h{iters} JOIN a{iters} ON h{iters}.host = a{iters}.host")
