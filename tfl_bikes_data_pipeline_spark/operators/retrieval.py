"""Retrieval / model-inference operators over the ``documents`` table.

The serving-adjacent half of a training-data pipeline:

- BM25 top-k retrieval : Okapi BM25 scoring of a fixed query term set
                         against the corpus — the standard sparse
                         retrieval baseline (Robertson & Zaragoza 2009).
- linear quality model : hashed-feature linear classifier INFERENCE as
                         a pure map (zero shuffle) — the fastText-style
                         quality-filter shape used by CCNet/Gopher-era
                         curation, with deterministic stand-in weights.
- source overlap       : pairwise shingle-vocabulary Jaccard between
                         sources — "which feeds duplicate each other"
                         corpus forensics, output bounded by |sources|².

Scale notes (100 TB): BM25 filters the exploded term stream to the
|Q| query terms BEFORE any shuffle, so the wide aggregate carries
O(|Q| · n_docs_matching) rows, not the corpus vocabulary; the
classifier is a single narrow projection (whole-stage codegen,
no exchange at all except the presentation sort); source overlap
shuffles the distinct (source, shingle) vocabulary once, keyed by
shingle, with per-shingle fan-out bounded by |sources|².

No counterpart in the reference repo (jackgisby/tfl-bikes-data-pipeline
stops at warehouse analytics); these extend the engine toward
LLM-corpus curation per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .text import _words, _with_words

# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------

#: Fixed demonstration query — terms with distinct corpus frequencies so
#: the idf weighting is visible in the ranking.
BM25_QUERY_TERMS: tuple[str, ...] = ("spark", "window", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10


def bm25_topk(
    documents: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOP_K,
) -> DataFrame:
    """(doc_id, score) — top-``k`` documents by Okapi BM25 against the
    fixed ``query_terms``, deterministic tie-break (score desc, doc_id
    asc).

    Scoring uses the RATIONAL idf variant idf(t) = (N - df + 0.5) /
    (df + 0.5) (no transcendental ``ln`` — both engines produce
    bit-identical doubles from the same +,*,/ chain over exact
    integers, which a libm ``log`` cannot guarantee). Per-term
    contributions are summed in FIXED textual order (s_t1 + s_t2 + ...)
    rather than through an aggregate, because float addition order in a
    ``sum()`` is engine-scheduling-dependent. The final score is
    rounded to 6 dp and the ORDER is taken on the rounded value, so
    both engines rank identically.

    Plan shape — ONE PASS, no explode: the fixed query-term tfs come
    from per-row ``size(filter(w, x -> x = t))`` (the corpus vocabulary
    never materializes, let alone shuffles), so the per-doc relation is
    a narrow codegen'd projection of the scan. ALL corpus statistics
    (N, Σlen, every per-term df) fold into a single one-row aggregate
    over that projection — one map-side-combined Exchange carrying one
    row per task — broadcast back onto the matching docs, then
    TakeOrderedAndProject. Two scans of the text column total (the
    scalar branch and the scored branch), zero wide shuffles; at
    100 TB the cost is the scan itself.
    """
    per_doc = _with_words(documents).select(
        "doc_id",
        F.expr("size(w)").alias("dl"),
        *[
            F.expr(f"size(filter(w, x -> x = '{t}'))").alias(f"tf_{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    # every corpus statistic in ONE single-row aggregate (broadcast)
    corpus = per_doc.groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("int")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    match_any = None
    for i in range(len(query_terms)):
        cond = F.col(f"tf_{i}") > 0
        match_any = cond if match_any is None else (match_any | cond)
    scored = per_doc.where(match_any).join(F.broadcast(corpus))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    contribs = []
    for i in range(len(query_terms)):
        tf_c = F.col(f"tf_{i}").cast("double")
        idf = (
            F.col("n_docs").cast("double") - F.col(f"df_{i}").cast("double") + F.lit(0.5)
        ) / (F.col(f"df_{i}").cast("double") + F.lit(0.5))
        denom = tf_c + F.lit(BM25_K1) * (
            F.lit(1.0) - F.lit(BM25_B) + F.lit(BM25_B) * (F.col("dl").cast("double") / avgdl)
        )
        contribs.append(idf * (tf_c * F.lit(BM25_K1 + 1.0)) / denom)
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    return (
        scored.select("doc_id", F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(load_table(spark, sf_dir, "documents"))


def _bm25_oracle() -> str:
    ts = BM25_QUERY_TERMS
    tf_cols = ",\n               ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(ts)
    )
    df_cols = ",\n               ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(ts))
    )
    match_any = " OR ".join(f"tf_{i} > 0" for i in range(len(ts)))
    contribs = " + ".join(
        f"(((n_docs::DOUBLE - df_{i}::DOUBLE + 0.5::DOUBLE) / (df_{i}::DOUBLE + 0.5::DOUBLE))"
        f" * (tf_{i}::DOUBLE * {BM25_K1 + 1.0}::DOUBLE)"
        f" / (tf_{i}::DOUBLE + {BM25_K1}::DOUBLE * (1.0::DOUBLE - {BM25_B}::DOUBLE"
        f" + {BM25_B}::DOUBLE * (dl::DOUBLE / (sum_dl::DOUBLE / n_docs::DOUBLE)))))"
        for i in range(len(ts))
    )
    return f"""
        WITH per_doc AS (
            SELECT doc_id, len(w) AS dl,
               {tf_cols}
            FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
                  FROM documents)
        ),
        corpus AS (
            SELECT count(1) AS n_docs, sum(dl) AS sum_dl,
               {df_cols}
            FROM per_doc
        )
        SELECT doc_id, round({contribs}, 6) AS score
        FROM per_doc CROSS JOIN corpus
        WHERE {match_any}
        ORDER BY score DESC, doc_id
        LIMIT {BM25_TOP_K}
    """


# ---------------------------------------------------------------------------
# hashed-feature linear quality model (inference as a pure map)
# ---------------------------------------------------------------------------

#: hashing-trick feature dimension
QMODEL_DIM = 64
#: decision thresholds on the raw (pre-sigmoid) score
QMODEL_KEEP = 0.05
QMODEL_DROP = -0.05


def _bucket_sql(term: str, engine: str) -> str:
    """md5-derived feature bucket 0..QMODEL_DIM-1 — the two leading hex
    digits, portable across engines via instr on the hex alphabet (the
    same trick :mod:`.dedup` uses for simhash bits)."""
    pos = "instr" if engine == "spark" else "strpos"
    d1 = f"({pos}('0123456789abcdef', substr(md5({term}), 1, 1)) - 1)"
    d2 = f"({pos}('0123456789abcdef', substr(md5({term}), 2, 1)) - 1)"
    return f"((({d1}) * 16 + ({d2})) % {QMODEL_DIM})"


def _weight_sql(bucket: str) -> str:
    """Deterministic stand-in weight ×10 (INTEGER in [-10, 10]): a real
    deployment broadcasts trained weights; the arithmetic stand-in
    keeps the oracle exactly mirrorable while exercising the identical
    plan (per-word bucket lookup + weighted sum)."""
    return f"((({bucket}) * 37) % 21 - 10)"


def quality_model_scores(documents: DataFrame) -> DataFrame:
    """(doc_id, raw_score, decision) — hashed-unigram linear model
    inference. Each word hashes to one of ``QMODEL_DIM`` buckets; the
    weighted sum accumulates as an exact BIGINT (integer weights ×10)
    so the reduction is order-independent, then ONE double division by
    10·n_words produces the mean activation. The only exchange in the
    plan is the presentation sort: at 100 TB this runs as a single
    narrow codegen'd projection over the scan — the model-inference
    shape every quality-filter pass (CCNet / Gopher reproductions)
    needs at corpus scale.

    ``aggregate(...)`` (fold) rather than ``sum(transform(...))``
    keeps the lambda integer-typed end to end.
    """
    bucket = _bucket_sql("x", "spark")
    num = (
        f"aggregate({_words()}, 0L, (acc, x) -> acc + {_weight_sql(bucket)})"
    )
    return (
        documents.select(
            "doc_id",
            F.expr(num).alias("wsum"),
            F.expr(f"size({_words()})").alias("n_words"),
        )
        .select(
            "doc_id",
            F.round(
                F.col("wsum").cast("double")
                / (F.lit(10.0) * F.col("n_words").cast("double")),
                6,
            ).alias("raw_score"),
        )
        .withColumn(
            "decision",
            F.when(F.col("raw_score") >= QMODEL_KEEP, "keep")
            .when(F.col("raw_score") >= QMODEL_DROP, "review")
            .otherwise("drop"),
        )
        .orderBy("doc_id")
    )


def q_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_model_scores(load_table(spark, sf_dir, "documents"))


def _quality_model_oracle() -> str:
    bucket = _bucket_sql("x", "duck")
    return f"""
        WITH scored AS (
            SELECT doc_id,
                   list_sum(list_transform(
                       string_split(lower(trim(text)), ' '),
                       x -> {_weight_sql(bucket)}
                   ))::BIGINT AS wsum,
                   len(string_split(lower(trim(text)), ' ')) AS n_words
            FROM documents
        )
        SELECT doc_id,
               round(wsum::DOUBLE / (10.0::DOUBLE * n_words::DOUBLE), 6) AS raw_score,
               CASE WHEN round(wsum::DOUBLE / (10.0::DOUBLE * n_words::DOUBLE), 6)
                         >= {QMODEL_KEEP} THEN 'keep'
                    WHEN round(wsum::DOUBLE / (10.0::DOUBLE * n_words::DOUBLE), 6)
                         >= {QMODEL_DROP} THEN 'review'
                    ELSE 'drop' END AS decision
        FROM scored ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# source-overlap matrix
# ---------------------------------------------------------------------------

#: word n-gram width for the per-source vocabulary
OVERLAP_SHINGLE = 3


def source_overlap(documents: DataFrame, n: int = OVERLAP_SHINGLE) -> DataFrame:
    """(source_a, source_b, common, jaccard) — pairwise Jaccard between
    the distinct word-``n``-gram vocabularies of each source, for every
    unordered source pair with at least one shared shingle. The corpus
    forensics view: two feeds scraping the same upstream show up as a
    high-overlap pair before any per-document dedup runs.

    Scale shape (rebuilt r10 — the r9 self-join shape shuffled the
    (source, shingle) postings THREE times [distinct + both join
    sides] and grew 18.1× at a 30× replica): the postings shuffle
    exactly ONCE, into ``groupBy(shingle).collect_set(source)`` (the
    per-shingle source set is bounded by |sources|, a small dimension
    by construction, and map-side partial collect_set dedups like
    distinct did). Single-source shingles — the vast majority of any
    diverse corpus's vocabulary — contribute no pairs and are pruned
    LOSSLESSLY before pair generation (they still count toward the
    per-source sizes, taken from the same grouped relation). Pair
    expansion is a narrow per-row combination explode (≤ C(|sources|,2)
    per shingle), and every exchange after the one postings shuffle
    carries at most |sources|² grouped rows per task thanks to partial
    aggregation. Output ≤ |sources|² rows. The jaccard is one division
    of exact integers — engine-identical.
    """
    grams_expr = (
        f"CASE WHEN size(w) >= {n} THEN "
        f"transform(sequence(0, size(w) - {n}), i -> concat_ws(' ', slice(w, i + 1, {n}))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    per_shingle = (
        _with_words(documents)
        .select("source", F.explode(F.expr(grams_expr)).alias("shingle"))
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    )
    sizes = (
        per_shingle.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
    )
    # unordered source pairs per shingle, from the sorted set — the
    # (a < b) ordering the join's where-clause produced now falls out
    # of the array_sort for free
    pairs_expr = (
        "flatten(transform(srcs, (x, i) -> "
        "transform(slice(srcs, i + 2, size(srcs)), "
        "y -> struct(x AS source_a, y AS source_b))))"
    )
    common = (
        per_shingle.where(F.size("srcs") >= 2)  # lossless prune
        .select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        # per-source sizes are keyed on a data column — unhinted per the
        # broadcast policy; AQE BHJs the tiny relation on its own
        common.join(
            sizes.select(F.col("source").alias("source_a"), F.col("n_shingles").alias("na")),
            "source_a",
        )
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("n_shingles").alias("nb")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "common",
            (
                F.col("common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("common")).cast("double")
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    # conditional widen: the per-source shingle explode + distinct
    # otherwise runs on the fixture's one scan split (profiled r13:
    # 1-task 0.84 s dominant stage). No-op at warehouse split counts.
    from ..tables import ensure_scan_parallelism

    return source_overlap(
        ensure_scan_parallelism(load_table(spark, sf_dir, "documents"), spark)
    )


_SOURCE_OVERLAP_ORACLE = f"""
    WITH words AS (
        SELECT source, string_split(lower(trim(text)), ' ') AS w FROM documents
    ),
    vocab AS (
        SELECT DISTINCT source,
               concat_ws(' ', w[i], w[i+1], w[i+2]) AS shingle
        FROM (SELECT source, w,
                     unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
              FROM words)
    ),
    sizes AS (
        SELECT source, count(1) AS n_shingles FROM vocab GROUP BY source
    ),
    common AS (
        SELECT a.source AS source_a, b.source AS source_b, count(1)::BIGINT AS common
        FROM vocab a JOIN vocab b ON a.shingle = b.shingle
        WHERE a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT c.source_a, c.source_b, c.common,
           c.common::DOUBLE / (sa.n_shingles + sb.n_shingles - c.common)::DOUBLE AS jaccard
    FROM common c
    JOIN sizes sa ON sa.source = c.source_a
    JOIN sizes sb ON sb.source = c.source_b
    ORDER BY c.source_a, c.source_b
"""


# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 × vector cosine, fused by reciprocal-rank fusion
# ---------------------------------------------------------------------------

#: RRF smoothing constant (Cormack, Clarke & Buettcher 2009)
RRF_K = 60
HYBRID_TOP_K = 10
#: the query vector standing in for the lexical query's embedding — the
#: synthetic embeddings table is row-aligned with documents (doc_id ==
#: vec_id, pinned in tests), so fused ranks live in one id space.
HYBRID_QVEC = 0


def hybrid_rrf_topk(
    documents: DataFrame, embeddings: DataFrame, k: int = HYBRID_TOP_K
) -> DataFrame:
    """(doc_id, rrf, rank) — hybrid search: the BM25 lexical top-10 and
    the cosine vector top-10 fuse by reciprocal-rank fusion,
    ``rrf = Σ 1/(RRF_K + rank_sys)`` with absent systems contributing
    0 — rank-only fusion needs no score calibration between systems,
    which is why it is the standard hybrid baseline. Engine-exact: each
    contribution is one double division, the sum is two terms in fixed
    textual order, rounded to 6 dp before ranking.

    Scale shape: both inputs are already top-k relations (bounded), so
    the fusion is a full-outer join of two ≤k-row broadcasts — free.
    The cost is the two retrievals, each individually scale-shaped
    (BM25: one pass + one-row corpus stats; cosine: broadcast query ×
    linear scan)."""
    from pyspark.sql import Window

    from .similarity import cosine_topk, _vecs

    w_lex = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = bm25_topk(documents, k=k).withColumn(
        "rank_lex", F.row_number().over(w_lex)
    )
    corpus = _vecs(embeddings, "vec_id", "cv")
    queries = _vecs(
        embeddings.where(F.col("vec_id") == HYBRID_QVEC).limit(1),
        "qid",
        "qv",
    )
    vec = cosine_topk(corpus, queries, k=k).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("rank_vec")
    )
    fused = lex.select("doc_id", "rank_lex").join(vec, "doc_id", "full_outer")
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("rank_lex").cast("double")),
            F.lit(0.0),
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(float(RRF_K)) + F.col("rank_vec").cast("double")),
            F.lit(0.0),
        ),
        6,
    )
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.select("doc_id", rrf.alias("rrf"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("rank")
    )


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid BM25 + vector-cosine retrieval fused by RRF."""
    return hybrid_rrf_topk(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )


def _hybrid_oracle() -> str:
    lex_body = _bm25_oracle().rsplit("ORDER BY", 1)[0]
    return f"""
        WITH lexbase AS ({lex_body}),
        lexr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex
            FROM lexbase
            QUALIFY rank_lex <= {HYBRID_TOP_K}
        ),
        vecr AS (
            SELECT c.vec_id AS doc_id,
                   row_number() OVER (
                       ORDER BY round(list_cosine_similarity(
                           q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
                           c.vec_id
                   ) AS rank_vec
            FROM embeddings q JOIN embeddings c
              ON q.vec_id = {HYBRID_QVEC} AND c.vec_id != {HYBRID_QVEC}
            QUALIFY rank_vec <= {HYBRID_TOP_K}
        ),
        fused AS (
            SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
                   round(coalesce(1.0 / ({RRF_K}.0 + rank_lex), 0.0)
                         + coalesce(1.0 / ({RRF_K}.0 + rank_vec), 0.0), 6) AS rrf
            FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
        )
        SELECT doc_id, rrf,
               row_number() OVER (ORDER BY rrf DESC, doc_id)::INT AS rank
        FROM fused
        QUALIFY rank <= {HYBRID_TOP_K}
        ORDER BY rank
    """


#: exact decimal powers of 0.9 for RBO's geometric weights — 0.9^(d-1)
#: has exactly d-1 decimal digits, so DECIMAL(18,9) holds every value
#: for k=10 with NO rounding anywhere (IEEE pow() is not
#: correctly-rounded-guaranteed across libms, so the weights are
#: literals, not computed)
_RBO_P_POW = [
    "1.000000000", "0.900000000", "0.810000000", "0.729000000",
    "0.656100000", "0.590490000", "0.531441000", "0.478296900",
    "0.430467210", "0.387420489",
]


def rank_biased_overlap(lex: DataFrame, vec: DataFrame, k: int = HYBRID_TOP_K) -> DataFrame:
    """(depth, n_overlap, rbo_at_depth) — truncated rank-biased overlap
    (Webber et al.) between two ranked runs, the standard top-weighted
    agreement metric for comparing retrieval systems (here: how much
    the lexical and vector rankings agree, and WHERE they diverge —
    the evaluation companion to [[q_hybrid_rrf]]'s fusion).

    ``rbo_at_depth`` is the monotone prefix
    (1-p)·Σ_{e≤d} p^(e-1)·(A_e/e) with p = 0.9: row ``depth = k`` is
    RBO@k, earlier rows show the agreement curve. Engine-exact: A_e/e
    rides the round-6 DECIMAL grid, the geometric weights are exact
    decimal LITERALS (0.9^(e-1) terminates in e-1 digits), products
    and prefix sums are pure DECIMAL, and the only float is the final
    string→double cast.

    Scale shape: both runs are ≤k-row relations, so everything here is
    broadcast arithmetic over k² rows — free next to the retrievals
    that produce the runs."""
    from pyspark.sql import Window

    spark = lex.sparkSession
    depths = spark.createDataFrame(
        [(d, _RBO_P_POW[d - 1]) for d in range(1, k + 1)],
        "depth INT, p_pow_s STRING",
    ).select("depth", F.col("p_pow_s").cast("decimal(18,9)").alias("p_pow"))
    # each run is a top-k (<= k rows); limit(k) declares the bound
    # for the broadcast-policy lint
    both = lex.join(vec, "doc_id").select("rank_lex", "rank_vec").limit(k)
    overlaps = (
        depths.join(
            F.broadcast(both),
            (F.col("rank_lex") <= F.col("depth"))
            & (F.col("rank_vec") <= F.col("depth")),
            "left",
        )
        .groupBy("depth", "p_pow")
        .agg(F.count("rank_lex").alias("n_overlap"))
    )
    term = (
        F.round(F.col("n_overlap") / F.col("depth"), 6).cast("decimal(18,6)")
        * F.col("p_pow")
    ).alias("term")
    w = Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, 0)
    return (
        overlaps.select("depth", "n_overlap", term)
        .withColumn("prefix", F.sum("term").over(w))
        .select(
            "depth",
            "n_overlap",
            (
                (F.col("prefix") * F.lit("0.1").cast("decimal(2,1)"))
                .cast("string")
                .cast("double")
            ).alias("rbo_at_depth"),
        )
        .orderBy("depth")
    )


def q_rbo_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBO agreement curve between the BM25 and vector top-10 runs —
    the same two runs q_hybrid_rrf fuses."""
    from pyspark.sql import Window

    from .similarity import cosine_topk, _vecs

    documents = load_table(spark, sf_dir, "documents")
    embeddings = load_table(spark, sf_dir, "embeddings")
    w_lex = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = bm25_topk(documents, k=HYBRID_TOP_K).select(
        "doc_id", F.row_number().over(w_lex).alias("rank_lex")
    )
    corpus = _vecs(embeddings, "vec_id", "cv")
    queries = _vecs(
        embeddings.where(F.col("vec_id") == HYBRID_QVEC).limit(1),
        "qid",
        "qv",
    )
    vec = cosine_topk(corpus, queries, k=HYBRID_TOP_K).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("rank_vec")
    )
    return rank_biased_overlap(lex, vec)


def _rbo_oracle() -> str:
    lex_body = _bm25_oracle().rsplit("ORDER BY", 1)[0]
    pow_rows = ", ".join(
        f"({d}, {_RBO_P_POW[d - 1]}::DECIMAL(18,9))"
        for d in range(1, HYBRID_TOP_K + 1)
    )
    return f"""
        WITH lexbase AS ({lex_body}),
        lexr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex
            FROM lexbase
            QUALIFY rank_lex <= {HYBRID_TOP_K}
        ),
        vecr AS (
            SELECT c.vec_id AS doc_id,
                   row_number() OVER (
                       ORDER BY round(list_cosine_similarity(
                           q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
                           c.vec_id
                   ) AS rank_vec
            FROM embeddings q JOIN embeddings c
              ON q.vec_id = {HYBRID_QVEC} AND c.vec_id != {HYBRID_QVEC}
            QUALIFY rank_vec <= {HYBRID_TOP_K}
        ),
        agreed AS (
            SELECT l.rank_lex, v.rank_vec
            FROM lexr l JOIN vecr v ON l.doc_id = v.doc_id
        ),
        powers (depth, p_pow) AS (VALUES {pow_rows}),
        depth_agree AS (
            SELECT p.depth, p.p_pow, count(b.rank_lex)::BIGINT AS n_overlap
            FROM powers p
            LEFT JOIN agreed b
              ON b.rank_lex <= p.depth AND b.rank_vec <= p.depth
            GROUP BY p.depth, p.p_pow
        ),
        terms AS (
            SELECT depth, n_overlap,
                   CAST(round(n_overlap / depth, 6) AS DECIMAL(18,6)) * p_pow
                       AS term
            FROM depth_agree
        )
        SELECT depth, n_overlap,
               CAST(CAST(sum(term) OVER (ORDER BY depth
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    * 0.1::DECIMAL(2,1) AS VARCHAR) AS DOUBLE) AS rbo_at_depth
        FROM terms
        ORDER BY depth
    """


QUERIES = {
    "q_bm25_topk": q_bm25_topk,
    "q_quality_model": q_quality_model,
    "q_source_overlap": q_source_overlap,
    "q_hybrid_rrf": q_hybrid_rrf,
    "q_rbo_eval": q_rbo_eval,
}

ORACLES = {
    "q_bm25_topk": _bm25_oracle(),
    "q_quality_model": _quality_model_oracle(),
    "q_source_overlap": _SOURCE_OVERLAP_ORACLE,
    "q_hybrid_rrf": _hybrid_oracle(),
    "q_rbo_eval": _rbo_oracle(),
}

BENCH = list(QUERIES)
