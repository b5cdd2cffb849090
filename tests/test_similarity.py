"""IVF search quality: recall against the brute-force baseline."""

from pyspark.sql import functions as F

from tfl_bikes_data_pipeline_spark.operators.similarity import (
    INT8_LEVELS,
    NUM_QUERIES,
    cosine_topk,
    ivf_search,
    q_ann_brute_topk,
    q_ann_ivf_topk,
    quantize_int8,
)
from tfl_bikes_data_pipeline_spark.functions.vectors import to_double_vec
from tfl_bikes_data_pipeline_spark.tables import load_table


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    brute = q_ann_brute_topk(spark, sf_dir).collect()
    ivf = q_ann_ivf_topk(spark, sf_dir).collect()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r.qid, set()).add(r.vec_id)
    hits = total = 0
    for r in ivf:
        total += 1
        hits += r.vec_id in brute_sets[r.qid]
    # random 64-dim vectors cluster poorly, so demand only that probing
    # 2/8 buckets beats the 25% random-subset floor and returns full k.
    assert total == len(brute)
    assert hits / total > 0.25


def test_topk_rank_contract(spark, sf_dir):
    out = q_ann_brute_topk(spark, sf_dir)
    pdf = out.toPandas()
    assert set(pdf["qid"].unique()) == set(range(NUM_QUERIES))
    for _, grp in pdf.groupby("qid"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        sims = list(grp["cos_sim"])
        assert sims == sorted(sims, reverse=True)
        assert not grp["vec_id"].isin(grp["qid"]).any()  # self excluded


def test_cosine_topk_finds_planted_neighbor(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    rows.append((99, [0.9, 0.1, 0.0, 0.0]))  # near vec 0
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    corpus = emb.select(F.col("vec_id").alias("vec_id"), to_double_vec("embedding", "cv"))
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), to_double_vec("embedding", "qv")
    )
    top = cosine_topk(corpus, queries, k=1).collect()
    assert top[0].vec_id == 99


def test_kmeans_refinement_does_not_worsen_inertia(spark, sf_dir):
    """Lloyd iterations must not increase mean (1 - cosine) to the
    assigned centroid vs the deterministic seeds."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        NUM_CENTROIDS,
        _vecs,
        inertia,
        kmeans_refine,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    embeddings = load_table(spark, sf_dir, "embeddings")
    corpus = _vecs(embeddings, "vec_id", "cv")
    seeds = _vecs(
        embeddings.where(F.col("vec_id") < NUM_CENTROIDS), "centroid_id", "qv"
    )
    refined = kmeans_refine(corpus, seeds, iterations=2)
    assert refined.count() == NUM_CENTROIDS
    assert inertia(corpus, refined) <= inertia(corpus, seeds) + 1e-9


def test_quantize_int8_saturation_and_reconstruction(spark, sf_dir):
    """Quantization invariants the oracle hash can't express: codes
    live in [-127, 127], the max-|x| element saturates to ±127 for
    every nonzero vector, and per-element reconstruction error is
    bounded by scale/2 (round-to-nearest guarantee)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_int8(emb)
    joined = q.join(
        emb.select("vec_id", to_double_vec("embedding", "cv")), "vec_id"
    )
    checked = joined.select(
        "vec_id",
        F.expr("array_min(codes)").alias("qmin"),
        F.expr("array_max(codes)").alias("qmax"),
        F.expr(
            "array_max(transform(zip_with(cv, codes, (x, c) -> abs(x - c * scale)), e -> e))"
        ).alias("max_err"),
        F.expr("array_max(transform(codes, c -> abs(c)))").alias("max_abs_code"),
        "scale",
    )
    bad_range = checked.where(
        (F.col("qmin") < -INT8_LEVELS) | (F.col("qmax") > INT8_LEVELS)
    ).count()
    assert bad_range == 0
    nonzero = checked.where(F.col("scale") > 0)
    no_saturation = nonzero.where(F.col("max_abs_code") != INT8_LEVELS).count()
    assert no_saturation == 0, "max-|x| element must quantize to ±127"
    err_violation = nonzero.where(
        F.col("max_err") > F.col("scale") * 0.5 + 1e-12
    ).count()
    assert err_violation == 0, "reconstruction error exceeds scale/2"


def test_quantized_mips_recall_vs_float(spark, sf_dir):
    """Int8 MIPS must rank nearly as well as the float inner-product
    path: per-query top-10 overlap >= 0.8 on the fixture (quantization
    error ~scale/2 per element rarely reorders neighbors)."""
    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        TOP_K,
        quantized_mips_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    quant = quantized_mips_topk(emb)

    e = emb.select("vec_id", to_double_vec("embedding", "cv"))
    qs = e.where(F.col("vec_id") < NUM_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("cv").alias("qv")
    )
    dot = (
        "aggregate(zip_with(qv, cv, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    exact = (
        e.crossJoin(F.broadcast(qs))
        .where(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", F.expr(dot).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )
    got = {(r.qid, r.vec_id) for r in quant.collect()}
    want = {(r.qid, r.vec_id) for r in exact.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.8, f"quantized MIPS recall {recall:.2f} too low"


def test_embedding_covariance_matches_numpy(spark, sf_dir):
    """The distributed partial-aggregate covariance must agree with a
    single-node numpy covariance of the same quantized matrix to float
    precision (grid 2^-20 -> worst-case per-value error ~1e-6)."""
    import numpy as np

    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        EMBED_COV_SHIFT,
        embedding_covariance,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = {(r.i, r.j): r.cov for r in embedding_covariance(emb).collect()}

    x = np.array([r.embedding for r in emb.orderBy("vec_id").collect()], dtype=np.float64)
    xq = np.floor(x * EMBED_COV_SHIFT) / EMBED_COV_SHIFT
    ref = np.cov(xq, rowvar=False, bias=True)  # population covariance
    for (i, j), c in got.items():
        assert abs(c - ref[i - 1, j - 1]) < 1e-9, (i, j, c, ref[i - 1, j - 1])
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2  # full upper triangle incl. diagonal
    assert all(got[(i, i)] >= 0 for i in range(1, d + 1))  # variances


def test_pca_projection_matches_numpy_power_iteration(spark, sf_dir):
    """The distributed pipeline must reproduce numpy's power iteration
    from the same start vector, round for round (alignment ~1.0 of the
    projection score vectors) — implementation exactness, independent
    of the fixture's spectrum. Convergence TO the true eigenvector is
    eigengap-dependent (the synthetic embeddings are nearly isotropic:
    top eigenvalues 0.0289 vs 0.0269, so 3 rounds barely rotate v0);
    PCA_ROUNDS is the knob, documented rather than asserted."""
    import numpy as np

    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        EMBED_COV_SHIFT,
        PCA_ROUNDS,
        pca_power_projection,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = pca_power_projection(emb).orderBy("vec_id").collect()
    got = np.array([r.score for r in rows])

    x = np.array(
        [r.embedding for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )
    xq = np.floor(x * EMBED_COV_SHIFT) / EMBED_COV_SHIFT
    c = np.cov(xq, rowvar=False, bias=True)
    v = np.full(x.shape[1], 0.125)
    for _ in range(PCA_ROUNDS):
        w = c @ v
        v = w / np.linalg.norm(w)
    ref = xq @ v
    g, r = got - got.mean(), ref - ref.mean()
    align = abs(g @ r) / (np.linalg.norm(g) * np.linalg.norm(r))
    assert align > 0.999999, f"distributed power iteration diverged from numpy: {align:.6f}"


def test_fixture_embeddings_have_nonzero_norms(spark, sf_dir):
    """Module precondition: cosine surfaces are undefined on zero-norm
    vectors and the engines disagree on the fallback (Spark NaN vs
    DuckDB -1.0 vs numpy NaN-drop). Pin the precondition loudly so a
    fixture regeneration that introduces a zero vector fails here, not
    as an unexplained oracle divergence."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.functions.vectors import norm_expr, to_double_vec
    from tfl_bikes_data_pipeline_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(to_double_vec("embedding", "v"))
    n_zero = emb.where(F.expr(norm_expr("v")) <= 0).count()
    assert n_zero == 0, f"{n_zero} zero-norm embeddings violate the cosine precondition"


def test_fixture_embeddings_have_uniform_dimension(spark, sf_dir):
    """dot_expr's zip_with pads length-mismatched vectors with NULLs,
    poisoning the fold into NULL — which threshold filters then DROP
    silently (a truncated duplicate would report as unique). Pin the
    uniform-dimension precondition loudly."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(F.size("embedding").alias("d")).distinct().collect()
    assert len(dims) == 1, f"mixed embedding dimensions: {[r.d for r in dims]}"


def test_covariance_impls_identical(spark, sf_dir):
    """The Arrow numpy-matmul partial-sum producer and the pure-JVM
    explode producer must yield BIT-IDENTICAL cell relations (both are
    exact integer arithmetic on the same 2^-20 grid feeding the same
    decimal aggregate) — the A/B witness that lets the declared plan
    default to the ~10x-faster Arrow path without weakening the oracle."""
    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        embedding_covariance,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    arrow = embedding_covariance(emb, impl="arrow").orderBy("i", "j").collect()
    expr = embedding_covariance(emb, impl="expr").orderBy("i", "j").collect()
    assert arrow == expr
    assert len(arrow) == 64 * 65 // 2


def test_pq_codes_shape_and_range(spark, sf_dir):
    """Every vector gets PQ_M codes, each in [0, PQ_KSUB)."""
    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        PQ_KSUB,
        PQ_M,
        _pq_subcentroids,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    codes = pq_encode(emb, _pq_subcentroids(emb))
    bad = codes.where(
        (F.size("codes") != PQ_M)
        | (F.expr("array_min(codes)") < 0)
        | (F.expr("array_max(codes)") >= PQ_KSUB)
    ).count()
    assert bad == 0
    assert codes.count() == emb.count()


def test_pq_encode_never_shuffles_the_corpus(spark, sf_dir):
    """The PQ index build must stay embarrassingly parallel: the only
    Exchange in the encode plan is the SinglePartition fold of the
    64-row codebook (plus its broadcast back) — the corpus relation is
    scan → project, never hash-partitioned. An explode+window encode
    (which would shuffle the corpus PQ_M times over) fails this pin."""
    import contextlib
    import io

    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        _pq_subcentroids,
        pq_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    enc = pq_encode(emb, _pq_subcentroids(emb))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        enc.explain("formatted")
    plan = buf.getvalue()
    assert "hashpartitioning" not in plan, "corpus shuffled during PQ encode"
    assert plan.count("Exchange") <= 4  # codebook fold + broadcast only


def test_pq_search_recall_floor_vs_exact_l2(spark, sf_dir):
    """ADC shortlist + exact re-rank must keep recall@10 against the
    exact full-precision L2 ranking above the measured floor (0.72-0.76
    mean on the fixtures; floor leaves headroom for fixture drift but
    catches a broken codebook/LUT, which scores ~0.1-0.3)."""
    import duckdb

    from tfl_bikes_data_pipeline_spark.operators.similarity import q_ann_pq_topk

    pdf = q_ann_pq_topk(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    exact = con.execute(f"""
        SELECT q.vec_id AS qid, c.vec_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                  list_sum(list_transform(range(1, 65),
                      i -> (q.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
                         * (q.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
                  )) ASC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < {NUM_QUERIES} AND c.vec_id != q.vec_id
        QUALIFY rank <= 10 ORDER BY qid, rank
    """).df()
    recalls = []
    for qid in sorted(set(exact.qid)):
        want = set(exact[exact.qid == qid].vec_id)
        got = set(pdf[pdf.qid == qid].vec_id)
        recalls.append(len(want & got) / len(want))
    assert min(recalls) >= 0.5, f"per-query PQ recall collapsed: {recalls}"
    assert sum(recalls) / len(recalls) >= 0.65, f"mean PQ recall: {recalls}"


def test_ivfpq_index_build_is_narrow(spark, sf_dir):
    """The one-projection IVF-PQ index build must never hash-shuffle
    the corpus: coarse assignment and PQ codes both fold against
    broadcast codebook arrays."""
    import contextlib
    import io

    from tfl_bikes_data_pipeline_spark.operators.similarity import ivfpq_index

    idx = ivfpq_index(load_table(spark, sf_dir, "embeddings"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        idx.explain("formatted")
    plan = buf.getvalue()
    assert "hashpartitioning" not in plan, "corpus shuffled during index build"


def test_ivfpq_recall_floor_vs_exact_l2(spark, sf_dir):
    """Probe(2/8) × ADC × exact re-rank must hold recall@10 vs exact
    L2 above the floor (measured 0.88-0.92 mean on the fixtures; a
    broken probe or LUT collapses to ~0.2)."""
    import duckdb

    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        q_ann_ivfpq_topk,
    )

    pdf = q_ann_ivfpq_topk(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    exact = con.execute(f"""
        SELECT q.vec_id AS qid, c.vec_id,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                  list_sum(list_transform(range(1, 65),
                      i -> (q.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
                         * (q.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE)
                  )) ASC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c
          ON q.vec_id < {NUM_QUERIES} AND c.vec_id != q.vec_id
        QUALIFY rank <= 10 ORDER BY qid, rank
    """).df()
    recalls = []
    for qid in sorted(set(exact.qid)):
        want = set(exact[exact.qid == qid].vec_id)
        got = set(pdf[pdf.qid == qid].vec_id)
        recalls.append(len(want & got) / len(want))
    assert min(recalls) >= 0.5, f"per-query IVF-PQ recall collapsed: {recalls}"
    assert sum(recalls) / len(recalls) >= 0.7, f"mean IVF-PQ recall: {recalls}"


def test_filtered_ann_uses_hash_join_not_nlj(spark, sf_dir):
    """Filtered search's point: the label predicate is an EQUI-join
    key, so the plan must be a broadcast hash join (candidates cut to
    the partition up front), never the all-pairs NLJ that unfiltered
    cosine pays — and every returned hit shares its query's label."""
    import contextlib
    import io

    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        q_ann_filtered_topk,
    )

    df = q_ann_filtered_topk(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan

    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in df.collect():
        assert labels[r.vec_id] == labels[r.qid]


def test_incremental_index_references_only_corpus_codebooks(spark, sf_dir):
    """Ingested vectors may only cite EXISTING-corpus seed ids: coarse
    assignments come from the corpus coarse seeds, codes from the
    corpus sub-codebook — and every batch vector is indexed exactly
    once."""
    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        INC_COARSE_BOUND,
        INC_SUB_BOUND,
        q_ann_incremental_index,
    )

    rows = q_ann_incremental_index(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    n_batch = emb.where(F.col("vec_id") % 4 == 0).count()
    assert len(rows) == n_batch
    coarse_ids = {
        r.vec_id
        for r in emb.where(
            (F.col("vec_id") % 4 != 0) & (F.col("vec_id") < INC_COARSE_BOUND)
        ).collect()
    }
    sub_ids = {
        r.vec_id
        for r in emb.where(
            (F.col("vec_id") % 4 != 0) & (F.col("vec_id") < INC_SUB_BOUND)
        ).collect()
    }
    for r in rows:
        assert r.vec_id % 4 == 0
        assert r.centroid_id in coarse_ids
        assert all(int(c) in sub_ids for c in r.codes_str.split(","))


def test_filtered_topk_drops_null_embeddings_with_live_labels(spark):
    """A row with a NULL embedding but a non-NULL label must neither
    surface as a (NULL-scored) candidate nor, as a query, emit k
    all-NULL rows — the module-wide null-absence convention the
    mirrored oracles declare (ADVICE r6; the shared fixture nulls
    embedding and label together, which masked this seam)."""
    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        filtered_cosine_topk,
    )

    emb = spark.createDataFrame(
        [
            (0, "a", [1.0, 0.0]),     # query with live embedding
            (1, "a", None),           # query row: NULL embedding, live label
            (7, "a", [0.9, 0.1]),
            (8, "a", None),           # corpus row: NULL embedding, live label
            (9, "b", [0.0, 1.0]),
        ],
        "vec_id INT, label STRING, embedding ARRAY<DOUBLE>",
    )
    rows = filtered_cosine_topk(emb, k=5).collect()
    qids = {r.qid for r in rows}
    assert 1 not in qids, "NULL-embedding query emitted candidate rows"
    assert all(r.vec_id != 8 for r in rows), "NULL-embedding corpus row ranked"
    assert all(r.cos_sim is not None for r in rows)
    # the live query still retrieves its in-label neighbor and not the
    # other label's vector
    mine = [r.vec_id for r in rows if r.qid == 0]
    assert mine == [7]


def test_topk_two_phase_matches_single_window(spark):
    """_topk_by_query's salted two-phase ranking must be LOSSLESS: on a
    planted candidate relation with cross-bucket ties it returns exactly
    the rows and ranks a single qid-partitioned window returns."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.similarity import _topk_by_query

    rows = []
    for qid in range(3):
        for vec_id in range(200):
            # coarse score grid forces ties that straddle salt buckets
            rows.append((qid, vec_id, float((vec_id * 7 + qid) % 13)))
    scored = spark.createDataFrame(rows, "qid INT, vec_id INT, cos_sim DOUBLE")
    k = 10
    got = [(r.qid, r.vec_id, r.rank) for r in _topk_by_query(scored, k).collect()]
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    want = [
        (r.qid, r.vec_id, r.rank)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("qid", "rank")
        .collect()
    ]
    assert got == want


def test_knn_ivf_agreement_vs_exact(spark, sf_dir):
    """The approximate kNN classifier must stay usefully correlated
    with the exact one even on this fixture's near-uniform embeddings
    (measured 0.4 agreement at both smoke and sf0.01 — floor set at
    0.2, above the ~0.1 random-label baseline; real clustered corpora
    probe far better, which is the documented serving trade)."""
    from tfl_bikes_data_pipeline_spark.operators.similarity import (
        q_knn_classify,
        q_knn_classify_ivf,
    )

    exact = {r.qid: r.pred_label for r in q_knn_classify(spark, sf_dir).collect()}
    approx = {
        r.qid: r.pred_label for r in q_knn_classify_ivf(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact), "IVF variant lost or invented queries"
    agreement = sum(approx[q] == exact[q] for q in exact) / len(exact)
    assert agreement >= 0.2, f"IVF-kNN agreement vs exact {agreement:.2f} < 0.2"
