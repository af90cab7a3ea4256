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
    for _ in range(iters):
        contrib = (ranks.join(norm, ranks["host"] == norm["u"])
                   .groupBy(F.col("v").alias("host"))
                   .agg(F.sum(F.col("rank") * F.col("share")).alias("c")))
        ranks = (nodes.join(contrib, "host", "left")
                 .select("host",
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                          ).alias("rank"))
                 .localCheckpoint(eager=False))
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
