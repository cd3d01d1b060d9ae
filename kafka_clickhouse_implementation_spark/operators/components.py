"""Near-duplicate clustering — connected components over the similarity
graph.

Pairwise near-dup detection (dedup.py) yields EDGES; a real corpus
cleaner needs CLUSTERS: transitively-connected groups collapse to one
representative (pair-wise "drop doc_b" keeps a doc that is similar to a
dropped one whenever similarity chains, e.g. edges (1,3),(2,3) drop
only 3 while the cluster {1,2,3} should keep exactly one). This module
closes that gap with a deterministic min-label connected-components
operator, oracle-checked against a DuckDB recursive CTE.

Scale design: min-label propagation converges in O(graph diameter)
rounds; each round is one equi-join + one partial-aggregated groupBy on
the edge relation — no driver-side graph, no collect. Near-dup graphs
are overwhelmingly star/chain-shaped (diameter is tiny), so the round
count stays single-digit in practice; `localCheckpoint` truncates the
lineage each round so plans don't nest. For adversarial long-chain
graphs at 100 TB the same loop body upgrades to the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond"), which converges in O(log n) rounds — the
per-round dataflow (join edges to labels, aggregate min) is identical,
so nothing about this layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_clickhouse_implementation_spark.io import load
from kafka_clickhouse_implementation_spark.operators.dedup import (
    _jaccard_pairs,
    _token_sets,
)
from kafka_clickhouse_implementation_spark.registry import query


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Minimum-reachable-label connected components over an undirected
    edge list. Returns (id, component) where component is the smallest
    node id reachable from `id`. Deterministic for any edge order.

    Each iteration: every node takes the min of its own label and its
    neighbors' labels. Terminates when a full round changes nothing
    (checked with one count per round — the driver holds only the loop
    counter, never the graph)."""
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))).distinct()
    nodes = sym.select(F.col("a").alias("id")).distinct()
    lbl = nodes.select("id", F.col("id").alias("comp")).localCheckpoint()
    for _ in range(max_iter):
        nbr_min = (
            sym.join(lbl, sym["b"] == lbl["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_lbl = (
            lbl.join(nbr_min, lbl["id"] == nbr_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        n_changed = (
            new_lbl.alias("n")
            .join(lbl.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        lbl = new_lbl
        if n_changed == 0:
            break
    return lbl


@query(
    "q_near_dup_components",
    oracle="""
    WITH RECURSIVE s AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 50
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM s GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM s a JOIN s b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE round(i * 1.0 / (sa.n + sb.n - i), 6) >= 0.8
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT a, a FROM edges
      UNION
      SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.id
    )
    SELECT id AS doc_id, CAST(min(lbl) AS BIGINT) AS component,
           (id = min(lbl)) AS is_representative
    FROM reach GROUP BY id
    """,
)
def q_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster the exact-Jaccard (≥0.8) near-dup graph over the first 50
    docs into connected components; `is_representative` marks the one
    doc per cluster a keep-one dedup retains. The oracle computes the
    same min-reachable label with a recursive CTE."""
    docs = load(spark, sf_dir, "documents")
    pairs = _jaccard_pairs(_token_sets(docs, 50)).filter(F.col("jac") >= 0.8)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("component"),
        (F.col("id") == F.col("comp")).alias("is_representative"),
    )
