"""Training-set assembly semantics the oracle hash can't see:
split exhaustiveness, mixture rate calibration, packing contiguity."""

import pyspark.sql.functions as F

from tfl_bikes_data_pipeline_spark.operators.training import (
    CONTEXT_TOKENS,
    decontaminate,
    mixture_filter,
    pack_sequences,
    split_assign,
)
from tfl_bikes_data_pipeline_spark.tables import load_table


def test_decontaminate_finds_planted_leak(spark):
    """A train doc sharing a 3-gram with a benchmark doc must surface
    with the exact shared-shingle count; disjoint docs must not."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox yesterday"),  # leaks 2 shingles
            (2, "completely unrelated text about spark engines"),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.n_shared for r in decontaminate(train, bench).collect()}
    # "the quick brown" and "quick brown fox" are the shared trigrams
    assert got == {1: 2}


def test_split_partitions_rows_exhaustively(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    split = split_assign(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    total = sum(counts.values())
    # thresholds e6/f3 → 89.8% / 5.1% / 5.1%; generous tolerance at small sf
    assert abs(counts["train"] / total - 0.898) < 0.03


def test_mixture_rate_calibration(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["source"]: r["n"] for r in mixture_filter(docs, "source", "doc_id").groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # src0 cycles to the 25% tier, src3 to the keep-all tier
    assert kept.get("src3", 0) == base["src3"]
    low_rate = kept.get("src0", 0) / base["src0"]
    assert low_rate < 0.6  # 25% expected; generous at tiny sf


def test_pack_bins_are_contiguous_per_shard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr("n_chars DIV 5").alias("toks")
    )
    packed = pack_sequences(docs, "doc_id", "toks")
    per_shard = packed.groupBy("shard").agg(
        F.countDistinct("bin").alias("n_bins"), F.max("bin").alias("max_bin")
    )
    for r in per_shard.collect():
        # contiguous fill: every bin id 0..max_bin is occupied
        assert r["n_bins"] == r["max_bin"] + 1, r
    # no bin (except ones holding a single oversized doc) exceeds the
    # window by more than one document's tokens: with contiguous fill, a
    # bin's pre-offset span is < context + its last doc
    fill = packed.groupBy("shard", "bin").agg(
        F.sum("toks").alias("t"), F.max("toks").alias("m"), F.count(F.lit(1)).alias("n")
    )
    bad = fill.where((F.col("t") >= CONTEXT_TOKENS + F.col("m")) & (F.col("n") > 1))
    assert bad.count() == 0


def test_cap_per_source_invariants(spark, sf_dir):
    """Per-source caps: never more than CAP rows per source, ranks are
    contiguous from 1, retention is by (n_chars DESC, doc_id) so the
    kept set is exactly the top-CAP of each source, and the operator is
    a pure filter (kept rows exist in the input)."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.training import (
        SOURCE_CAP,
        cap_per_source,
    )
    from tfl_bikes_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = cap_per_source(docs).collect()
    by_source = {}
    for r in kept:
        by_source.setdefault(r.source, []).append(r)
    rows = {(r.doc_id, r.source) for r in docs.select("doc_id", "source").collect()}
    for source, members in by_source.items():
        assert len(members) <= SOURCE_CAP
        assert sorted(m.rk for m in members) == list(range(1, len(members) + 1))
        for m in members:
            assert (m.doc_id, source) in rows
    # exact top-CAP check against a driver-side sort
    full = docs.select("doc_id", "source", "n_chars").collect()
    for source, members in by_source.items():
        pool = sorted(
            (r for r in full if r.source == source),
            key=lambda r: (-r.n_chars, r.doc_id),
        )[:SOURCE_CAP]
        assert {m.doc_id for m in members} == {r.doc_id for r in pool}


def test_adaptive_filter_per_source_keep_fraction(spark, sf_dir):
    """Each source keeps ~the top 60% by n_chars: kept fraction per
    source lands in [0.55, 0.65] at any fixture scale (exact rank
    arithmetic ⇒ the bound is deterministic given n ≥ 10), and every
    kept doc outranks every dropped doc within its source."""
    import pyspark.sql.functions as F

    from tfl_bikes_data_pipeline_spark import registry

    out = registry.QUERIES["q_adaptive_filter"](spark, sf_dir)
    frac = (
        out.groupBy("source")
        .agg(
            (F.sum("keep") / F.count(F.lit(1))).alias("kept"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for r in frac:
        if r.n >= 10:
            assert 0.5 <= r.kept <= 0.7, (r.source, r.kept)
    worst_kept = (
        out.where(F.col("keep") == 1)
        .groupBy("source")
        .agg(F.min("n_chars").alias("min_kept"))
    )
    best_dropped = (
        out.where(F.col("keep") == 0)
        .groupBy("source")
        .agg(F.max("n_chars").alias("max_dropped"))
    )
    bad = (
        worst_kept.join(best_dropped, "source")
        .where(F.col("max_dropped") > F.col("min_kept"))
        .count()
    )
    assert bad == 0


def test_dsir_ranks_target_like_docs_first(spark):
    """Planted vocabularies: target sources (src0-3) speak only words
    from vocabulary A, the rest only vocabulary B. A raw-corpus doc
    written purely in A must out-rank one purely in B, and a mixed doc
    lands between them; selection is the top-k with doc_id tie-break."""
    from tfl_bikes_data_pipeline_spark.operators.training import dsir_select

    va = "alpha beta gamma delta"
    vb = "omega sigma theta kappa"
    rows = [
        # the target population defines the target LM
        (0, va, "en", "src0", len(va)),
        (1, va, "en", "src1", len(va)),
        (2, va, "en", "src2", len(va)),
        # raw-only candidates
        (10, va, "en", "src9", len(va)),              # pure target-like
        (11, vb, "en", "src9", len(vb)),              # pure off-target
        (12, "alpha beta omega sigma", "en", "src9", 22),  # mixed
    ]
    docs = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    got = {r.doc_id: r.avg_lw for r in dsir_select(docs, keep_n=10).collect()}
    assert got[10] > got[12] > got[11], got
    # target-vocabulary docs score identically wherever they live
    assert got[0] == got[10]
    # top-3 selection keeps the A-speakers ahead of the B-speaker
    top3 = [
        r.doc_id for r in dsir_select(docs, keep_n=3).collect()
    ]
    assert 11 not in top3


def test_leakproof_split_keeps_clusters_whole(spark):
    """Planted graph: two multi-doc near-dup clusters plus singletons.
    The cluster-keyed split must put every member of a cluster in ONE
    split (zero straddle by construction), and the naive-leak audit
    must count exactly the clusters whose members' doc-id hashes land
    in different splits — hand-derivable from split_assign's md5 rule."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.dedup import connected_components
    from tfl_bikes_data_pipeline_spark.operators.training import (
        leakproof_split_audit,
        split_assign,
    )

    docs = spark.createDataFrame(
        [(i, 100 + i) for i in range(20)], "doc_id LONG, n_chars LONG"
    )
    # clusters: {2,3} and {10,11}; the rest are singletons. Doc 3 is the
    # only id in 0..19 whose md5 prefix ('ec') leaves 'train', so {2,3}
    # STRADDLES train/val under the naive rule — the leak counter must
    # read 1, not 0 (review r11: the first version planted clusters that
    # all hashed into 'train', making the leak assertion vacuous).
    pairs = spark.createDataFrame(
        [(2, 3), (10, 11)], "doc_a LONG, doc_b LONG"
    )
    cc = connected_components(pairs)
    out = {r.split: r for r in leakproof_split_audit(docs, cc).collect()}

    # exhaustive + conserved: every doc and every char lands somewhere
    assert sum(r.n_docs for r in out.values()) == 20
    assert sum(r.total_chars for r in out.values()) == sum(100 + i for i in range(20))
    # 18 clusters total: 2 multi-doc + 16 singletons
    assert sum(r.n_clusters for r in out.values()) == 18

    # hand-derive the naive leak count from the SAME md5 rule
    naive = {
        r.doc_id: r.split
        for r in split_assign(docs, "doc_id").select("doc_id", "split").collect()
    }
    expected_leaky = sum(
        1
        for cluster in ({2, 3}, {10, 11})
        if len({naive[d] for d in cluster}) > 1
    )
    # non-vacuity: the planted geometry must actually exercise a leak
    assert expected_leaky == 1, naive
    leak_counts = {r.naive_leaky_clusters for r in out.values()}
    assert leak_counts == {expected_leaky}, (leak_counts, expected_leaky)

    # the safe rule itself can never straddle: all members of a cluster
    # share the cluster-id hash, so their split is literally the same
    # function value — pin it end-to-end anyway on the member relation
    from tfl_bikes_data_pipeline_spark.operators.dedup import docs_with_clusters

    safe_members = split_assign(docs_with_clusters(docs, cc), "cluster_id")
    straddle = (
        safe_members.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert straddle == 0


def test_temperature_resample_flattens_toward_uniform(spark):
    """Planted skew: one source with 1600 docs, one with 100 (16:1).
    τ=2 keeps rates ∝ sqrt(n)/n, so the kept mix must be strictly
    flatter than the input (kept ratio < 16:1 and > 1:1), the overall
    keep mass must track RESAMPLE_KEEP_FRACTION, and every rate ≤ 1.
    Determinism: a second run returns identical rows."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.training import (
        RESAMPLE_KEEP_FRACTION,
        temperature_resample,
    )

    docs = spark.range(1700).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1600, "big").otherwise("small").alias("source"),
    )
    rows = {r.source: r for r in temperature_resample(docs).collect()}
    assert rows["big"].n_docs == 1600 and rows["small"].n_docs == 100
    # exact rates from the integer weights: w=40/10, denom=50,
    # total=1700 → rate_small = min(1, 1700·10/(2·50·100)) = 1.0
    # (CAPPED — the sqrt-proportional uncapped value is 1.7), and
    # rate_big = 1700·40/(2·50·1600) = 0.425 (review r11: the earlier
    # comment claimed a 4× rate ratio the cap makes impossible here)
    assert rows["small"].rate == 1.0
    assert abs(rows["big"].rate - 0.425) < 1e-9
    assert rows["small"].n_kept == 100  # rate 1.0 keeps EVERY doc
    # kept ratio strictly between uniform (1:1) and input skew (16:1)
    kept_ratio = rows["big"].n_kept / rows["small"].n_kept
    assert 1.0 < kept_ratio < 16.0, kept_ratio
    # keep mass: expected = (0.425·1600 + 100)/1700 = 0.459 — the
    # documented cap-undershoot bias (small's stranded mass is not
    # redistributed) puts the deterministic target 8.2% under
    # RESAMPLE_KEEP_FRACTION; the remaining slack is hash noise
    total_kept = sum(r.n_kept for r in rows.values())
    expected_mass = (0.425 * 1600 + 100) / 1700
    assert abs(total_kept / 1700 - expected_mass) < 0.05
    assert total_kept / 1700 < RESAMPLE_KEEP_FRACTION  # the bias's sign
    again = {r.source: r for r in temperature_resample(docs).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_waterfill_resample_hits_target_exactly(spark):
    """Planted skew with a real cap set: sources tiny(4)/small(100)/
    big(1600) → w = 2/10/40, total 1704, K = 852, W = 52. Greedy in
    cap-point order (2, 10, 40): tiny caps (852·2 ≥ 4·52), small caps
    (848·10 ≥ 100·50), big does not (748·40 < 1600·40) → s = 748/40,
    rate_big = 748/1600 = 0.4675 exactly. The water-filling identity
    Σ_capped n + s·Σ_unc w = K must hold as rationals (the bias
    temperature_resample documents), realized kept mass must land
    nearer the target than the one-pass form's, and a second run is
    identical."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.training import (
        temperature_resample,
        waterfill_resample,
    )

    docs = spark.range(1704).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1600, "big")
        .when(F.col("id") < 1700, "small")
        .otherwise("tiny")
        .alias("source"),
    )
    rows = {r.source: r for r in waterfill_resample(docs).collect()}
    assert rows["tiny"].capped and rows["small"].capped
    assert not rows["big"].capped
    assert rows["tiny"].rate == 1.0 and rows["small"].rate == 1.0
    assert abs(rows["big"].rate - 0.4675) < 1e-12
    # exactness identity: capped mass + s·w_big = K, as integers
    k_target = 1704 // 2
    assert 4 + 100 + 748 == k_target
    # capped sources keep EVERYTHING (no coin for them)
    assert rows["tiny"].n_kept == 4 and rows["small"].n_kept == 100
    # realized total tracks the target up to hash noise, and beats the
    # one-pass form's documented undershoot on the same corpus
    kept_wf = sum(r.n_kept for r in rows.values())
    kept_onepass = sum(
        r.n_kept for r in temperature_resample(docs).collect()
    )
    assert abs(kept_wf - k_target) < 0.06 * 1704
    assert kept_wf > kept_onepass, (kept_wf, kept_onepass)
    again = {r.source: tuple(r) for r in waterfill_resample(docs).collect()}
    assert again == {k: tuple(v) for k, v in rows.items()}


def test_waterfill_exactness_across_distributions(spark):
    """The water-filling identity must hold for ANY source profile,
    not just the single worked example: for each planted distribution,
    an INDEPENDENT Fraction-exact reimplementation (isqrt weights,
    cap-point sort, greedy prefix capping) must agree with the Spark
    plan on the capped set and rates, and Σ_capped n + s·Σ_unc w must
    equal K = total div 2 exactly as rationals. Profiles cover extreme
    skew, uniform, ties on the cap point, and a dominant source."""
    import math
    from fractions import Fraction

    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.training import (
        waterfill_resample,
    )

    profiles = [
        {"a": 1, "b": 10000},
        {f"u{i}": 25 for i in range(20)},
        {"tiny": 4, "small": 100, "big": 1600},
        {"x": 7, "y": 7, "z": 7, "whale": 50000},
        {"p": 100, "q": 100, "r": 100, "s": 9},
    ]
    for prof in profiles:
        # independent exact replica
        total = sum(prof.values())
        k_target = total // 2
        w = {s: math.isqrt(n) for s, n in prof.items()}
        order = sorted(prof, key=lambda s: (prof[s] / w[s], s))
        num, den = k_target, sum(w.values())
        capped = set()
        for s in order:
            if Fraction(num, den) >= Fraction(prof[s], w[s]):
                capped.add(s)
                num -= prof[s]
                den -= w[s]
            else:
                break
        scale = Fraction(num, den)
        kept_mass = sum(prof[s] for s in capped) + scale * sum(
            w[s] for s in prof if s not in capped
        )
        assert kept_mass == k_target, (prof, kept_mass, k_target)

        # Spark plan must agree row-for-row
        rows_src = [(i, s) for s, n in prof.items() for i in range(n)]
        docs = spark.createDataFrame(
            [(f"{s}-{i}", s) for i, s in enumerate(r[1] for r in rows_src)],
            "doc_id string, source string",
        ).select(F.col("doc_id"), F.col("source"))
        got = {r.source: r for r in waterfill_resample(docs).collect()}
        assert set(got) == set(prof)
        for s in prof:
            assert got[s].n_docs == prof[s]
            assert got[s].capped == (s in capped), (prof, s)
            want_rate = (
                1.0
                if s in capped
                else round(float(scale * w[s] / prof[s]), 6)
            )
            assert abs(got[s].rate - want_rate) < 1e-9, (prof, s)
            assert 0 <= got[s].n_kept <= prof[s]


def test_waterfill_resample_excludes_null_source(spark):
    """NULL-source docs are excluded up front (same policy and reason
    as temperature_resample — the kept join can never match NULL)."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.training import (
        waterfill_resample,
    )

    base = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, "big").otherwise("small").alias("source"),
    )
    with_nulls = spark.range(300, 340).select(
        F.col("id").alias("doc_id"), F.lit(None).cast("string").alias("source")
    ).unionByName(base)
    got = {r.source: tuple(r) for r in waterfill_resample(with_nulls).collect()}
    want = {r.source: tuple(r) for r in waterfill_resample(base).collect()}
    assert None not in got and got == want


def test_temperature_resample_excludes_null_source(spark):
    """ADVICE r11: NULL-source docs can never match the kept-count
    inner join, so a NULL-source stats row would report rate > 0 with
    n_kept = 0 — misleading. They are excluded up front; attributed
    sources must be audited exactly as if the NULL docs were absent."""
    from pyspark.sql import functions as F

    from tfl_bikes_data_pipeline_spark.operators.training import (
        temperature_resample,
    )

    base = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 200, "big").otherwise("small").alias("source"),
    )
    with_nulls = spark.range(300, 340).select(
        F.col("id").alias("doc_id"), F.lit(None).cast("string").alias("source")
    ).unionByName(base)
    got = {r.source: tuple(r) for r in temperature_resample(with_nulls).collect()}
    want = {r.source: tuple(r) for r in temperature_resample(base).collect()}
    assert None not in got, "NULL-source row must not appear in the audit"
    assert got == want, "attributed sources must be unaffected by NULL docs"
