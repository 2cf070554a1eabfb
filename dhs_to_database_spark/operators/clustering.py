"""Connected-components clustering — the step after near-dup pair generation.

LSH/Jaccard pair generators (``dedup.py``) emit EDGES (doc_a, doc_b); a
production dedup pipeline must then group transitively-connected docs into
clusters and keep one representative per cluster. That grouping is connected
components, computed here as iterative min-label propagation over the edge
list — pure DataFrame joins, no graph library.

Ancestry in the reference: the duplicate-load detector builds per-survey
duplicate GROUPS before deciding what to delete
(03_DHS_Update_Metadata.ipynb raw :993-1140); this is the same
"group the duplicates, keep one" semantics generalized to fuzzy matches.

Scale design (100 TB):
- Each iteration is one shuffle join (edges x labels) + one aggregation;
  convergence takes O(diameter) iterations. Near-dup clusters from LSH
  buckets are dense (near-cliques), so the diameter is tiny — 2-3
  iterations in practice. For adversarially long chains the same loop
  admits the large-star/small-star rewrite (Kiveris et al., "Connected
  Components in MapReduce and Beyond"), which converges in O(log n)
  supersteps; min-propagation is the right default for dedup graphs.
- ``localCheckpoint`` after every iteration truncates the lineage —
  without it the plan doubles per superstep and the driver OOMs on plan
  compilation long before the data is a problem.
- The edge list is shuffled on the join key each round; pre-partitioning
  ``labels`` and ``edges`` on the node id lets AQE reuse the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import (
    _JACCARD_LIMIT,
    _JACCARD_THRESHOLD,
    minhash_near_dup,
    ngram_jaccard_pairs,
)
from .registry import query


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the minimum
    node id reachable from it (= its component id).

    Returns ``(node, component)`` — one row per node that appears in any
    edge. Nodes with no edges are absent; union them in with
    ``component = node`` if singletons matter (the query below does).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    converged = False
    for _ in range(max_iter):
        # Min component among neighbours, then fold into own label.
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("component").alias("nbr_comp")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nbr_comp").alias("nbr_comp"))
            .withColumnRenamed("a", "node")
        )
        new_labels = labels.join(nbr_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
            ).alias("component"),
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Returning partial labels would let a dedup pipeline keep several
        # "representatives" of one duplicate group with no signal — fail
        # loudly instead. Propagation advances one hop per superstep, so
        # max_iter bounds the reachable graph diameter.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations; "
            "the graph has a longer path than max_iter — raise max_iter"
        )
    return labels


@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE docs AS (
      SELECT doc_id, lower(text) AS t FROM documents
      WHERE doc_id < {_JACCARD_LIMIT} AND length(text) >= 4
    ),
    idx AS (SELECT doc_id, t, unnest(range(1, length(t) - 2)) AS i FROM docs),
    sh AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS INT), 4) AS sh FROM idx),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(ROUND(CAST(n_common AS DECIMAL(18,6)) / (sa.sz + sb.sz - n_common), 4)
                 AS DOUBLE) >= {_JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS n, doc_id AS m FROM docs
      UNION
      SELECT edges.a, reach.m FROM edges JOIN reach ON edges.b = reach.n
    ),
    comp AS (SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n)
    SELECT c.doc_id, c.component,
           CAST(c.doc_id = c.component AS BOOLEAN) AS is_representative,
           COUNT(*) OVER (PARTITION BY c.component) AS cluster_size
    FROM comp c
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: Jaccard pairs -> connected components -> keep-min
    representative. Singleton docs form their own cluster."""
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    d = load_table(spark, sf_dir, "documents")
    nodes = (
        d.filter((F.col("doc_id") < _JACCARD_LIMIT) & (F.length("text") >= 4))
        .select("doc_id")
    )
    labeled = nodes.join(comp, nodes["doc_id"] == comp["node"], "left").select(
        nodes["doc_id"],
        F.coalesce(comp["component"], nodes["doc_id"]).alias("component"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("component")
    return labeled.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("is_representative"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


@query("near_dup_clusters")  # rows-only: upstream MinHash uses Spark xxhash64
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION dedup path end-to-end over the full corpus: MinHash+LSH
    candidate pairs (linear cost, hot buckets capped) -> connected
    components -> keep-min representative per cluster. This is the
    composition a 100 TB curation run executes — ``dedup_components`` above
    is its oracle-checkable twin on the bounded exact-Jaccard slice.

    Output: one row per document; singletons are their own cluster."""
    from pyspark.sql import Window

    pairs = minhash_near_dup(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    labeled = d.join(comp, d["doc_id"] == comp["node"], "left").select(
        d["doc_id"],
        F.coalesce(comp["component"], d["doc_id"]).alias("component"),
    )
    w = Window.partitionBy("component")
    return labeled.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("is_representative"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )
