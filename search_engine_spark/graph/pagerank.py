"""DataFrame PageRank over a link graph (reference: backend/
ranking_service/pagerank.py:29-309).

The reference loads the whole Postgres link graph into a scipy CSR
matrix on one machine (pagerank.py:86-115) and power-iterates in numpy
(pagerank.py:154-181).  Here the rank vector and the adjacency stay
distributed: each iteration is one shuffle —
    edges(src, dst) ⋈ ranks(id, r) ⋈ out-degree
    -> groupBy(dst).sum(r / out_degree)
— with the dangling-node mass (pagerank.py:139-143, 166-171) reduced to
a one-row DataFrame and broadcast back, never collected per node.

Semantics match the reference exactly:
    r' = d * (Mᵀ r) + d * (Σ_dangling r) / N + (1 - d) / N
damping d = 0.85, ≤20 iterations, L1 convergence 1e-6
(shared/config.py:55-56, pagerank.py:48, 174-181), final Σr = 1
normalization (pagerank.py:184).

Scale notes: the per-iteration shuffle is keyed on dst; out-degrees are
computed once and cached; ranks are cached per iteration and the lineage
is truncated with localCheckpoint every `checkpoint_every` iterations so
20 iterations don't build a 20-deep plan.  Skewed in-degree hubs are
handled by partial aggregation (sum is algebraic — map-side combine
keeps hot dst keys from concentrating on one reducer input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAMPING = 0.85  # config.py:55
MAX_ITER = 20  # config.py:56
TOL = 1e-6  # pagerank.py:48


def out_degrees(edges: DataFrame) -> DataFrame:
    """Per-source out-degree (pagerank.py:136, D11)."""
    return edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_degree"))


def nodes_of(edges: DataFrame) -> DataFrame:
    """Distinct node set = union of both endpoints (pagerank.py:69-79)."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def _iterate(
    edges: DataFrame,
    deg: DataFrame,
    nodes: DataFrame,
    ranks: DataFrame,
    n_nodes: int,
    damping: float,
) -> DataFrame:
    """One power iteration; returns the new ranks(id, r) DataFrame."""
    # contribution each node sends along its out-edges: r / out_degree
    contrib = (
        edges.join(ranks, edges.src == ranks.id)
        .join(deg, "src")
        .groupBy("dst")
        .agg(F.sum(F.col("r") / F.col("out_degree")).alias("contrib"))
        .withColumnRenamed("dst", "id")
    )
    # dangling mass: rank sitting on nodes with no out-edges
    # (pagerank.py:139-143, 166-171) — a one-row aggregate, broadcast back
    dangling = (
        ranks.join(deg, ranks.id == deg.src, "left_anti")
        .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dmass"))
    )
    return (
        nodes.join(contrib, "id", "left")
        .crossJoin(F.broadcast(dangling))
        .select(
            "id",
            (
                F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                + F.lit(damping) * F.col("dmass") / F.lit(float(n_nodes))
                + F.lit((1.0 - damping) / float(n_nodes))
            ).alias("r"),
        )
    )


def pagerank_fixed(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = DAMPING,
    normalize: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank — fully declarative, no driver-side
    convergence loop; the oracle-parity variant (tests unroll the same
    recurrence in SQL).  Returns (id, r)."""
    edges = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    nodes = nodes_of(edges)
    n_nodes = nodes.count()
    if n_nodes == 0:
        # an empty link graph (fresh crawl, no intra-corpus links) has
        # an empty rank map, like the reference — not a ZeroDivision
        return nodes.select("id", F.lit(0.0).alias("r"))
    deg = out_degrees(edges)
    ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("r"))
    for _ in range(n_iter):
        ranks = _iterate(edges, deg, nodes, ranks, n_nodes, damping)
    if normalize:
        total = ranks.agg(F.sum("r").alias("t"))
        ranks = ranks.crossJoin(F.broadcast(total)).select(
            "id", (F.col("r") / F.col("t")).alias("r")
        )
    return ranks


def pagerank_sql_ctes(
    edges_sql: str, n_iter: int = 5, damping: float = DAMPING
) -> tuple[list[str], str]:
    """CTE list + final normalized-rank CTE name for the SQL twin of
    `pagerank_fixed` — composable into larger oracle queries (e.g. the
    hybrid BM25+PageRank re-rank).  `edges_sql` must yield distinct
    (src, dst).  The returned CTE `pr_norm(id, r)` has Σr = 1."""
    d = repr(damping)
    ctes = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM nodes)",
        "deg AS (SELECT src, count(*)::DOUBLE AS outd FROM edges GROUP BY src)",
        "r0 AS (SELECT id, 1.0 / n AS r FROM nodes, nn)",
    ]
    for i in range(1, n_iter + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"""r{i} AS (
  SELECT n.id,
         {d} * coalesce(c.contrib, 0.0) + {d} * dm.m / nn.n + (1.0 - {d}) / nn.n AS r
  FROM nodes n
  CROSS JOIN nn
  CROSS JOIN (SELECT coalesce(sum(r), 0.0) AS m FROM {p}
              WHERE id NOT IN (SELECT src FROM edges)) dm
  LEFT JOIN (SELECT e.dst AS id, sum(p.r / d2.outd) AS contrib
             FROM edges e JOIN {p} p ON e.src = p.id
             JOIN deg d2 ON d2.src = e.src
             GROUP BY e.dst) c ON c.id = n.id)"""
        )
    last = f"r{n_iter}"
    ctes.append(
        f"pr_norm AS (SELECT id, r / (SELECT sum(r) FROM {last}) AS r FROM {last})"
    )
    return ctes, "pr_norm"


def pagerank_fixed_sql(
    edges_sql: str, n_iter: int = 5, damping: float = DAMPING
) -> str:
    """ANSI-SQL twin of `pagerank_fixed` (DuckDB oracle): the same
    recurrence unrolled into one CTE per iteration, built from the same
    damping constant.  `edges_sql` must yield distinct (src, dst)."""
    ctes, final = pagerank_sql_ctes(edges_sql, n_iter, damping)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, round(r, 6) AS r FROM {final}"
    )


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = DAMPING,
    max_iter: int = MAX_ITER,
    tol: float = TOL,
    checkpoint_every: int = 5,
) -> tuple[DataFrame, dict]:
    """Converging PageRank (pagerank.py:117-191).

    Returns (ranks(id, r) normalized to Σ=1, info dict with iterations
    and final L1 diff).  The L1 convergence check (pagerank.py:174-181)
    is one scalar aggregate per iteration.
    """
    edges = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    nodes = nodes_of(edges).cache()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return (
            nodes.select("id", F.lit(0.0).alias("r")),
            {"iterations": 0, "l1_diff": 0.0, "n_nodes": 0},
        )
    deg = out_degrees(edges).cache()
    edges = edges.cache()

    ranks = nodes.select("id", F.lit(1.0 / n_nodes).alias("r")).cache()
    iters, diff = 0, float("inf")
    for i in range(max_iter):
        new_ranks = _iterate(edges, deg, nodes, ranks, n_nodes, damping)
        if (i + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint(eager=False)
        new_ranks = new_ranks.cache()
        # L1 convergence: Σ|r' − r| (pagerank.py:174-181)
        diff = (
            new_ranks.withColumnRenamed("r", "rn")
            .join(ranks, "id")
            .agg(F.sum(F.abs(F.col("rn") - F.col("r"))).alias("d"))
            .collect()[0]["d"]
        )
        ranks.unpersist()
        ranks = new_ranks
        iters = i + 1
        if diff < tol:
            break
    total = float(ranks.agg(F.sum("r")).collect()[0][0])
    out = ranks.select("id", (F.col("r") / F.lit(total)).alias("r"))
    return out, {"iterations": iters, "l1_diff": diff, "n_nodes": n_nodes}


def top_pages(ranks: DataFrame, n: int = 10) -> DataFrame:
    """Top-N by rank (pagerank.py:265-279, G4) with deterministic ties."""
    return ranks.orderBy(F.desc("r"), F.asc("id")).limit(n)


def hybrid_boost(
    results: DataFrame,
    ranks: DataFrame,
    result_id: str = "id",
    w_text: float = 0.7,
    w_rank: float = 0.3,
    rank_scale: float = 100.0,
) -> DataFrame:
    """Hybrid text+PageRank re-rank (search_api/main.py:243-267, C1+G2):
    score' = 0.7·score + 0.3·pagerank·100, missing rank treated as 0,
    re-sorted desc.  The per-result Redis point-GETs become one broadcast
    hash join against the (small) rank table."""
    boosted = (
        results.join(
            F.broadcast(ranks.withColumnRenamed("id", result_id)),
            result_id,
            "left",
        )
        .withColumn(
            "boosted_score",
            F.lit(w_text) * F.col("score")
            + F.lit(w_rank) * F.coalesce(F.col("r"), F.lit(0.0)) * F.lit(rank_scale),
        )
        .drop("r")
    )
    return boosted.orderBy(F.desc("boosted_score"), F.asc(result_id))
