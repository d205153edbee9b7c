"""Hybrid retrieval: lexical + vector search fused by Reciprocal
Rank Fusion (extension surface).

The modern retrieval stack runs BOTH a term-match arm (BM25-family)
and an embedding arm (ANN) per query and fuses the two rankings with
RRF (Cormack & Clarke, SIGIR'09): ``score(d) = Σ_arms 1/(K + rank)``
— rank-based, so the arms' incomparable score scales never need
calibration. This module implements the whole pipeline as one
declarative plan.

Cross-engine discipline: the lexical arm scores with the shared
``rational_idf`` (transcendental-free; same single-sourced helper as
tfidf_topk/bm25_topk) summed via ``fixed_sum`` — per-term idf
doubles are quantized to integers BEFORE aggregation, so the score
is independent of partition/summation order (a plain double sum is
not associative and could flip ranks between engines); the vector
arm uses the sequential-fold cosine quantized to 1e-4; the RRF sum
``1.0/(K+r1) + 1.0/(K+r2)`` is two IEEE divisions and one addition —
exactly specified, so both engines produce identical doubles and
identical final rankings, with (score desc, doc_id asc) total
orders everywhere.

At 100 TB: per-arm retrieval is top-``HYBRID_ARM_K`` under a ranked
window per query — the lexical arm's candidate generation is a
posting-list join (query terms broadcast, never a corpus scan per
query), the vector arm broadcasts the query vectors against one
corpus scan (the ann_bruteforce plan; swap in the IVF/LSH arm for a
billion-vector corpus — the fusion stage is unchanged, which is the
point of rank fusion). Fusing only the retrieved lists (standard
practice) keeps the fusion stage query-local and tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from rsbsa_etl_spark.functions.dedup import normalized_text
from rsbsa_etl_spark.functions.numeric import dec_round, fixed_sum
from rsbsa_etl_spark.functions.similarity import dot, safe_div, with_norm
from rsbsa_etl_spark.functions.textstats import rational_idf
from rsbsa_etl_spark.params import (
    ANN_QUERY_IDS,
    HYBRID_ARM_K,
    HYBRID_TOP_K,
    RRF_K,
)


def hybrid_search_rrf(
    docs: DataFrame,
    emb: DataFrame,
    query_ids=ANN_QUERY_IDS,
    arm_k: int = HYBRID_ARM_K,
    top_k: int = HYBRID_TOP_K,
) -> DataFrame:
    """more-like-this hybrid search: for each query document, the
    top-``top_k`` corpus documents by RRF over a lexical arm
    (distinct-term idf overlap) and a vector arm (embedding cosine).

    Output: (query_id, doc_id, lex_rank, vec_rank, rrf) — arm ranks
    are NULL when the doc was retrieved by only one arm; rrf is the
    sum of 1/(RRF_K + rank) over the arms that retrieved it.
    """
    # the corpus subplan feeds four subtrees (queries, the terms
    # explode, the candidate-count scalar, the vector scan) and
    # Spark does not deduplicate common subplans — persist so the
    # documents scan + normalize + embeddings join runs once. Same
    # cache contract as the rest of the repo: loop-running callers
    # clearCache between runs (bench.py does).
    corpus = docs.select(
        "doc_id", normalized_text(F.col("text")).alias("norm")
    ).join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        "doc_id",
    ).persist()
    qset = [int(q) for q in query_ids]
    queries = corpus.where(F.col("doc_id").isin(qset)).select(
        F.col("doc_id").alias("query_id"),
        F.col("norm").alias("q_norm"),
        F.col("embedding").alias("q_emb"),
    )
    cand = corpus.where(~F.col("doc_id").isin(qset))

    # ---- lexical arm: Σ idf over shared DISTINCT terms ------------
    terms = (
        cand.select("doc_id", F.explode(F.split("norm", " ")).alias("term"))
        .where(F.length("term") > 0)
        .distinct()
    )
    df_tbl = terms.groupBy("term").agg(F.count("*").alias("df"))
    n_tbl = cand.select(F.count("*").alias("n_docs"))
    q_terms = (
        queries.select(
            "query_id", F.explode(F.split("q_norm", " ")).alias("term")
        )
        .where(F.length("term") > 0)
        .distinct()
    )
    # query terms (tiny) broadcast onto the posting list; score is a
    # per-(query, doc) partial-aggregated sum of rational idf
    lex_scores = (
        terms.join(F.broadcast(q_terms), "term")
        .join(F.broadcast(df_tbl), "term")
        .join(F.broadcast(n_tbl))
        .groupBy("query_id", "doc_id")
        .agg(
            fixed_sum(
                rational_idf(F.col("n_docs"), F.col("df")), 6, alias="lex"
            )
        )
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("lex").desc(), F.col("doc_id").asc()
    )
    lex_top = (
        lex_scores.withColumn("lex_rank", F.row_number().over(wl))
        .where(F.col("lex_rank") <= arm_k)
        .select("query_id", "doc_id", "lex_rank")
    )

    # ---- vector arm: broadcast query vectors, one corpus scan -----
    c = with_norm(cand.select("doc_id", "embedding"))
    q = with_norm(
        queries.select("query_id", F.col("q_emb").alias("embedding"))
    ).select(
        "query_id",
        F.col("_vd").alias("qv"),
        F.col("_norm").alias("qn"),
    )
    cos = safe_div(
        dot(F.col("_vd"), F.col("qv")), F.col("_norm") * F.col("qn")
    )
    vec_scores = c.join(F.broadcast(q)).select(
        "query_id", "doc_id", dec_round(cos, 4).alias("cos")
    ).where(F.col("cos").isNotNull())
    wv = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("doc_id").asc()
    )
    vec_top = (
        vec_scores.withColumn("vec_rank", F.row_number().over(wv))
        .where(F.col("vec_rank") <= arm_k)
        .select("query_id", "doc_id", "vec_rank")
    )

    # ---- RRF fusion over the union of the retrieved lists ---------
    fused = lex_top.join(vec_top, ["query_id", "doc_id"], "full_outer")
    rrf = (
        F.when(
            F.col("lex_rank").isNotNull(),
            F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("vec_rank").isNotNull(),
            F.lit(1.0) / (F.lit(RRF_K) + F.col("vec_rank")),
        ).otherwise(F.lit(0.0))
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rrf", rrf)
        .withColumn("rnk", F.row_number().over(wf))
        .where(F.col("rnk") <= top_k)
        .select(
            "query_id",
            "doc_id",
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("vec_rank").cast("int").alias("vec_rank"),
            dec_round(F.col("rrf"), 6).alias("rrf"),
            F.col("rnk").cast("int").alias("rank"),
        )
    )
