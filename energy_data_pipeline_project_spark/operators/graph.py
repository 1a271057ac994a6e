"""Graph analytics over the near-dup pair graph: exact PageRank.

Corpus-curation use: near-dup components are resolved to keep-one
clusters by ``dedup.dedup_cluster_cc``; PageRank over the same graph
is the standard *centrality* refinement — pick the most-connected doc
as the cluster representative, or down-weight docs whose connectivity
says "template family" rather than "original content".

Determinism strategy (PageRank is normally float-order-dependent):
ranks live on an INTEGER fixed-point grid (``RANK_SCALE`` = 10^12 per
node), the damping split d = 17/20 is exact in integer arithmetic, and
every per-edge contribution is an integer DIV. Sums of ints are
order-independent, so three iterations are bitwise identical across
engines, and the DuckDB oracle replays the same chain as generated
CTEs — an iterative graph algorithm under the exact hash gate, like
``clustering.kmeans_embeddings``.

Scale posture: per iteration one join of the rank frame to the edge
list (shuffle on src) + one aggregate (shuffle on dst) — the textbook
distributed PageRank step. The loop state holds only nodes incident
to a dup edge (the near-dup subgraph, tiny vs the corpus);
``localCheckpoint`` per round truncates the doubling logical plan
(same analyzer-OOM lesson as dedup_cluster_cc). Damping mass lost to
integer flooring stays in the system as a constant per-node term —
exactness of the ranking order, not probability-mass conservation, is
the goal here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from ._registry import make_registry
from .dedup import _minhash_oracle, minhash_lsh_pairs, release_cached_frames

QUERIES, ORACLES, query = make_registry()

RANK_SCALE = 10**12  # fixed-point unit: every node starts at 10^12
PAGERANK_ITERS = 3
# d = 17/20 = 0.85: r' = (3*SCALE) DIV 20 + (17 * sum(contrib)) DIV 20


def pagerank_exact(pairs: DataFrame, iters: int = PAGERANK_ITERS) -> DataFrame:
    """Integer-exact PageRank over an undirected pair list.

    Returns ``(doc_id, rank)`` for every node incident to at least one
    pair, ``rank`` on the RANK_SCALE fixed-point grid.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # (src, dst, deg) is iteration-invariant: checkpoint once up front
    # so each round re-reads a materialized frame, not the whole
    # LSH candidate plan.
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = (
        ed.select("src")
        .distinct()
        .select("src", F.lit(RANK_SCALE).cast("bigint").alias("rank"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        contrib = (
            ed.join(ranks, "src")
            .select("dst", F.expr("rank DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            contrib.select(
                F.col("dst").alias("src"),
                F.expr(
                    f"CAST({3 * RANK_SCALE} AS BIGINT) DIV 20"
                    " + (17 * s) DIV 20"
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("src").alias("doc_id"), "rank")


def _pagerank_oracle() -> str:
    parts = [
        f"""
    WITH pairs AS (
      {_minhash_oracle()}
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
    ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
    r0 AS (SELECT DISTINCT src, CAST({RANK_SCALE} AS BIGINT) AS rank
           FROM edges)"""
    ]
    for it in range(1, PAGERANK_ITERS + 1):
        prev = f"r{it - 1}"
        parts.append(
            f""", r{it} AS (
      SELECT dst AS src,
             CAST({3 * RANK_SCALE} AS BIGINT) // 20 + (17 * SUM(rank // deg)) // 20
               AS rank
      FROM ed JOIN {prev} USING (src)
      GROUP BY 1
    )"""
        )
    parts.append(
        f"""
    SELECT src AS doc_id, rank FROM r{PAGERANK_ITERS}
    """
    )
    return "".join(parts)


@query("pagerank_dup_graph", _pagerank_oracle())
def pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three exact fixed-point PageRank iterations over the MinHash-LSH
    near-dup graph (same pair generation as ``dedup_cluster_cc``)."""
    docs = load_table(spark, sf_dir, "documents")
    return pagerank_exact(minhash_lsh_pairs(docs))


# ---------------------------------------------------------------------------
# Triangle counting over the near-dup graph
# ---------------------------------------------------------------------------
# The standard clustering-coefficient signal: near-dup TEMPLATE
# families (boilerplate variants) form near-cliques — triangle-dense —
# while chains of pairwise-similar-but-distinct docs don't. Triangle
# density per component is the cheap discriminator between "drop all
# but one" and "inspect before dropping". The ordered-edge triple join
# (a<b<c: wedge join + closing-edge join) counts each triangle exactly
# once and is the textbook distributed formulation — no recursion, two
# equi-joins, skew bounded by max degree (the LSH bucket caps already
# bound degree upstream).
@query(
    "graph_triangle_count",
    f"""
    WITH pairs AS ({{pairs}}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM e ab JOIN e bc ON ab.b = bc.a
                JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
    )
    SELECT (SELECT COUNT(*) FROM e) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM tri
    """.format(pairs=_minhash_oracle()),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the LSH near-dup graph.

    Edges arrive ordered (doc_a < doc_b) from the pair generator, so
    the wedge join (ab.b = bc.a) enumerates each candidate a<b<c once;
    the second join checks the closing edge. Both joins shuffle 8-byte
    id pairs. At 100 TB the guard is the max-degree bound the LSH
    bucket caps enforce — wedge count is Σ deg(v)², capped at
    cap²·buckets."""
    docs = load_table(spark, sf_dir, "documents")
    e = minhash_lsh_pairs(docs).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    ab = e.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
    bc = e.select(F.col("a").alias("t_b"), F.col("b").alias("t_c"))
    ac = e.select(F.col("a").alias("t_a"), F.col("b").alias("t_c"))
    tri = (
        ab.join(bc, "t_b")
        .join(ac, ["t_a", "t_c"])
        .agg(F.count("*").alias("n_triangles"))
    )
    edges = e.agg(F.count("*").alias("n_edges"))
    return edges.crossJoin(tri).select(
        "n_edges", F.col("n_triangles").cast("bigint").alias("n_triangles")
    )
