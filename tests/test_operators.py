"""Semantics edges of the curation/retrieval operators that the SQL-oracle
parity gate can't see: empty inputs, invariants that must hold by
construction, and determinism under re-partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from go_iceberg_spark.operators.sampling import hash_split
from go_iceberg_spark.operators.similarity import ivfpq_topk
from go_iceberg_spark.operators.text import bigram_lm_score, bm25_scores


def test_hash_split_disjoint_exhaustive_and_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 90, "val": 5, "test": 5})
    # exhaustive: every row gets a split; disjoint: one row, one split value
    assert out.filter(F.col("split").isNull()).count() == 0
    assert out.count() == 2000
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # stable under re-partitioning: assignment is a pure function of the id
    a = {(r["doc_id"], r["split"]) for r in out.collect()}
    b = {(r["doc_id"], r["split"]) for r in
         hash_split(df.repartition(7), "doc_id", {"train": 90, "val": 5, "test": 5}).collect()}
    assert a == b


def test_hash_split_rejects_bad_percentages(spark):
    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 90, "val": 5})


def test_bm25_only_matching_docs_and_tf_monotonic(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="spark spark spark filler words here"),
        Row(doc_id=2, text="spark filler words here also fine"),
        Row(doc_id=3, text="nothing relevant at all"),
    ])
    out = {r["doc_id"]: r for r in bm25_scores(df, "doc_id", "text", ("spark",)).collect()}
    assert set(out) == {1, 2}  # non-matching doc absent
    assert out[1]["score"] > out[2]["score"]  # higher tf, comparable length
    assert out[1]["n_hits"] == out[2]["n_hits"] == 1


def test_bigram_lm_omits_short_docs_and_scores_common_lower(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b a b a b a b"),
        Row(doc_id=2, text="a b a b a b x q"),
        Row(doc_id=3, text="solo"),
        Row(doc_id=4, text=""),
    ])
    out = {r["doc_id"]: r for r in bigram_lm_score(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}  # <2-token docs have no bigrams
    # doc 2 contains rare transitions (b x, x q) -> higher cross-entropy
    assert out[2]["xent"] > out[1]["xent"]
    assert out[1]["n_bigrams"] == 7


def test_ivfpq_empty_corpus_returns_typed_empty(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = ivfpq_topk(empty, empty, id_col="vec_id", vec_col="embedding", dim=64)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["query_id", "neighbor_id", "rank"]


def test_ivfpq_rejects_indivisible_dim(spark):
    df = spark.createDataFrame([Row(vec_id=1, embedding=[0.1] * 30)])
    with pytest.raises(ValueError):
        ivfpq_topk(df, df, id_col="vec_id", vec_col="embedding", dim=30, m=4)


def test_kmv_set_ops_exact_when_small(spark):
    """Below k distinct values the sketch IS exact: estimates equal true
    cardinalities and the Jaccard is the true overlap fraction of the
    union sketch."""
    from go_iceberg_spark.operators.sketch import kmv_set_ops

    a = spark.createDataFrame([Row(v=i) for i in range(10)])
    b = spark.createDataFrame([Row(v=i) for i in range(5, 15)])
    r = kmv_set_ops(a, b, "v", k=64).collect()[0]
    assert r["est_a"] == 10.0 and r["est_b"] == 10.0
    assert r["est_union"] == 15.0
    assert abs(r["jaccard"] - 5 / 15) < 1e-6
    assert abs(r["est_intersection"] - 5.0) < 0.01


def test_temperature_mix_upweights_small_sources(spark):
    """T=2 keeps a LARGER fraction of the small source than of the big one
    (sqrt weighting), and the selection is a pure function of the id."""
    from go_iceberg_spark.operators.sampling import temperature_mix

    rows = [Row(doc_id=i, src="big") for i in range(1900)] + \
           [Row(doc_id=10_000 + i, src="small") for i in range(100)]
    df = spark.createDataFrame(rows)
    kept = temperature_mix(df, "doc_id", "src", temperature=2.0, target_fraction=0.5)
    frac = {r["src"]: r["n"] for r in
            kept.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert frac["small"] / 100 > frac["big"] / 1900
    again = temperature_mix(df.repartition(5), "doc_id", "src",
                            temperature=2.0, target_fraction=0.5)
    assert {r["doc_id"] for r in kept.collect()} == {r["doc_id"] for r in again.collect()}


def test_text_ops_handle_unicode(spark):
    """Non-ASCII text through the text family: char (not byte) lengths,
    tokenizer stability, chunking round-trip."""
    from go_iceberg_spark.operators.text import chunk_tokens, quality_features, token_count_expr

    df = spark.createDataFrame([
        Row(doc_id=1, text="héllo wörld — ünïcode ❤ test"),
        Row(doc_id=2, text="日本語 テキスト と spaces"),
    ])
    toks = {r["doc_id"]: r["n"] for r in
            df.select("doc_id", token_count_expr(F.col("text")).alias("n")).collect()}
    assert toks == {1: 6, 2: 4}  # em-dash and emoji are whitespace-separated tokens
    feats = {r["doc_id"]: r for r in quality_features(df, "doc_id", "text").collect()}
    assert feats[1]["n_chars"] == 28  # characters, not UTF-8 bytes
    chunks = chunk_tokens(df, "doc_id", "text", size=3, stride=2)
    joined = " ".join(r["chunk_text"] for r in
                      chunks.filter(F.col("doc_id") == 2).orderBy("chunk_id").collect())
    assert "日本語" in joined and "spaces" in joined


def test_text_ops_tolerate_null_and_empty(spark):
    """NULL and empty text must not throw anywhere in the text family;
    empty → zero counts, NULL → NULL (three-valued, filterable)."""
    from go_iceberg_spark.operators.text import bigram_lm_score, quality_score, token_count_expr

    df = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text=None), Row(doc_id=3, text="one two")],
        "doc_id long, text string")
    counts = {r["doc_id"]: r["n"] for r in
              df.select("doc_id", token_count_expr(F.col("text")).alias("n")).collect()}
    assert counts[1] == 0 and counts[2] is None and counts[3] == 2
    assert quality_score(df, "doc_id", "text").count() == 3  # no throw
    out = bigram_lm_score(df, "doc_id", "text")
    assert {r["doc_id"] for r in out.collect()} == {3}


def test_ivf_near_dup_gemm_matches_literal(spark):
    """The Arrow-batched GEMM assignment (scale mode) must produce the same
    near-dup pairs as the bit-exact literal-expression assignment the
    graded oracle reproduces (ties are improbable on real-valued data; a
    persistent mismatch means the GEMM path broke, not a tie)."""
    from go_iceberg_spark.operators.similarity import ivf_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lit = set(map(tuple, ivf_near_dup_pairs(emb, n_lists=8, n_probe=2).collect()))
    gem = set(map(tuple, ivf_near_dup_pairs(
        emb, n_lists=8, n_probe=2, assignment="gemm").collect()))
    assert lit == gem and lit


def test_kmeans_gemm_matches_literal(spark):
    """r5 (VERDICT r4 task #2): the GEMM argmin assignment must land every
    row in the same cluster as the bit-exact literal-expression argmin the
    graded oracle reproduces — through BOTH Lloyd iterations (the centroid
    update consumes the assignment, so a single divergence would cascade)."""
    from go_iceberg_spark.operators.clustering import kmeans_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lit = {r["vec_id"]: r["cluster"] for r in kmeans_assign(emb, k=8, iters=2).collect()}
    gem = {r["vec_id"]: r["cluster"] for r in
           kmeans_assign(emb, k=8, iters=2, assignment="gemm").collect()}
    assert lit == gem and lit


def test_gemm_assignment_rejects_ragged_batches(spark):
    """r5 (r4 ADVICE): a ragged vector batch must raise, not silently drop
    rows from candidate generation; and non-long id columns flow through
    (the output schema derives from the input, not a hardcoded long)."""
    import pytest as _pytest

    from go_iceberg_spark.operators.similarity import ivf_near_dup_pairs

    bad = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 2.0]), Row(vec_id=2, embedding=[1.0])],
        "vec_id long, embedding array<double>")
    with _pytest.raises(Exception, match="ragged"):
        ivf_near_dup_pairs(bad, n_lists=2, n_probe=1, assignment="gemm").collect()

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .withColumn("vec_id", F.col("vec_id").cast("string")))
    out = ivf_near_dup_pairs(emb, n_lists=8, n_probe=2, assignment="gemm")
    assert dict(out.dtypes)["id_a"] == "string"
    assert out.count() > 0


def test_similarity_zero_norm_vectors_never_match(spark):
    """r6 probe: real corpora contain zero vectors (failed/padded
    embeddings); cosine with a zero norm is undefined and previously
    crashed the job with DIVIDE_BY_ZERO. cosine_expr now yields NULL for
    zero-norm operands: near-dup pairs exclude them, and top-k rankings
    drop NULL-cosine candidates (a zero-vector query has no neighbors)."""
    from pyspark.sql import Row

    from go_iceberg_spark.operators.dedup import embedding_near_dup_pairs
    from go_iceberg_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 0.0]), Row(vec_id=2, embedding=[0.0, 0.0]),
         Row(vec_id=3, embedding=[0.9, 0.1])], "vec_id bigint, embedding array<float>")
    pairs = embedding_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.9)
    assert [(r.id_a, r.id_b) for r in pairs.collect()] == [(1, 3)]

    q = spark.createDataFrame(
        [Row(vec_id=10, embedding=[1.0, 0.0]), Row(vec_id=11, embedding=[0.0, 0.0])],
        "vec_id bigint, embedding array<float>")
    out = sorted((r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=2).collect())
    assert out == [(10, 1), (10, 3)]  # the zero-vector query has NO neighbors


def test_repetition_scores_degenerate_docs(spark):
    """r6 probe: one-token and NULL/empty docs crashed repetition_scores —
    Spark's sequence(1, size-1) runs DESCENDING for a one-element array,
    so element_at(_t, 2) threw out-of-bounds; NULL-text docs vanished from
    the output entirely. Every input doc now scores: no bigrams ->
    top_bigram_frac 0.0."""
    from go_iceberg_spark.operators.text import repetition_scores

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "word"), (4, "a a a a"), (5, "x y x y")],
        "doc_id bigint, text string")
    out = {r.doc_id: (r.dup_word_frac, r.top_bigram_frac)
           for r in repetition_scores(docs, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1] == (0.0, 0.0) and out[2] == (0.0, 0.0) and out[3] == (0.0, 0.0)
    assert out[4] == (0.75, 1.0)          # "a a a" bigrams: all the same
    assert out[5] == (0.5, round(2 / 3, 4))  # "x y" twice of 3 bigrams


def test_multimodal_null_payloads_dropped(spark):
    """r6 probe: NULL media payloads (fetch failures are routine) crashed
    all three mapInPandas media UDFs with len(None) inside the Arrow batch;
    NULL rows now drop before the batch. Empty payloads still process."""
    from go_iceberg_spark.operators import multimodal as M

    mm = spark.createDataFrame([(1, None), (2, b""), (3, b"abcdef")],
                               "id bigint, media_bytes binary")
    assert sorted(r.id for r in M.extract_features(mm, "id").collect()) == [2, 3]
    assert sorted(r.id for r in M.resize_images(mm, "id").collect()) == [2, 3]
    assert sorted(set(r.id for r in M.sample_frames(mm, "id").collect())) == [2, 3]


def test_salted_join_key_only_left_falls_back(spark):
    """r7 degenerate sweep: salted_join on a key-only left side raised
    StopIteration picking an auto salt_source (the r6 ADVICE fix covered
    only hot_key_isolated_join) — now falls back to a row-id round-robin
    salt, matching the plain join's result."""
    from go_iceberg_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1,), (1,), (2,), (None,)], "k bigint")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k bigint, rv double")
    got = sorted(((r.k is None, r.k, r.rv) for r in
                  salted_join(left, right, ["k"]).collect()))
    want = sorted(((r.k is None, r.k, r.rv) for r in
                   left.join(right, ["k"]).collect()))
    assert got == want


def test_range_join_drops_degenerate_intervals(spark):
    """r7 degenerate sweep: an inverted interval (lo > hi) crashed the day
    explode with 'Illegal sequence boundaries' — one bad row must not kill
    a corpus-scale job. Inverted and NULL-bounded intervals match nothing
    and are dropped; well-formed intervals are unaffected."""
    from pyspark.sql import functions as F

    from go_iceberg_spark.operators.joins import range_join_days

    right = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00", "2024-01-01 00:00:00"),   # inverted
         (1, None, "2024-01-09 00:00:00"),                    # NULL lo
         (1, "2024-01-02 00:00:00", "2024-01-04 00:00:00")],  # good
        "k bigint, lo string, hi string"
    ).select("k", F.col("lo").cast("timestamp").alias("lo"),
             F.col("hi").cast("timestamp").alias("hi"))
    left = spark.createDataFrame([(1, "2024-01-03 00:00:00")], "k bigint, ts string"
                                 ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    out = range_join_days(left, right, ["k"], "ts", "lo", "hi").collect()
    assert len(out) == 1 and str(out[0].lo).startswith("2024-01-02")


def test_resample_locf_null_key_counts_events(spark):
    """r7 degenerate sweep: a NULL key is a legal group, but the spine join
    was null-UNSAFE — every NULL-key cell came back n=0 while the events
    silently vanished. The join is now null-safe on the key; NULL-timestamp
    events still have no grid cell (by design)."""
    from pyspark.sql import functions as F

    from go_iceberg_spark.operators.timeseries import resample_locf

    ev = spark.createDataFrame(
        [(1, "2024-01-01 10:15:00", 1.0),
         (None, "2024-01-01 11:30:00", 7.0),
         (2, None, 9.0)],
        "k bigint, ts string, v double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = resample_locf(ev, "ts", "k", "v")
    nullk = {str(r.bucket_ts): r.n for r in out.filter(F.col("k").isNull()).collect()}
    assert nullk["2024-01-01 11:00:00"] == 1, nullk
    # NULL-ts events never land on the grid
    assert out.filter(F.col("k") == 2).agg(F.sum("n")).collect()[0][0] == 0


def test_keep_best_quality_elects_top_scorer_per_cluster(spark):
    """keep_best_quality keeps exactly the highest-score row of each
    near-dup component (ties -> lowest id) and passes singletons through."""
    from go_iceberg_spark.operators.dedup import keep_best_quality

    df = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    # components: {1,2,3} (chain), {4,5}; 6 is a singleton
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "id_a long, id_b long")
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (5, 0.1), (6, 0.0)],
        "doc_id long, quality double")
    kept = sorted(r.doc_id for r in keep_best_quality(df, pairs, scores, "doc_id").collect())
    # cluster 1: 2 and 3 tie at 0.9 -> lowest id (2) wins; cluster 2: 4 wins
    assert kept == [2, 4, 6], kept


def test_hashing_vectorize_shape_and_degenerates(spark):
    """Hashing-trick vectors: dim-length, signed integer-valued entries,
    empty/NULL docs give the zero vector, and the assembly's exchanges stay
    bounded (partial-agg collapses tokens map-side; ≤ 3 shuffles: two
    groupBys + the zero-fill join)."""
    from go_iceberg_spark.operators.text import hashing_vectorize
    from go_iceberg_spark.plans import inspect as P

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, ""), (3, None), (4, "the the the")],
        "doc_id long, text string")
    out = hashing_vectorize(df, "doc_id", "text", dim=16)
    assert P.num_shuffles(out) <= 3, P.formatted_plan(out)
    rows = {r.doc_id: r.vec for r in out.collect()}
    assert all(len(v) == 16 for v in rows.values())
    assert rows[2] == [0.0] * 16 and rows[3] == [0.0] * 16
    # repeated token: |entry| == 3 in exactly one bucket
    assert sorted(abs(x) for x in rows[4])[-1] == 3.0
    assert sum(1 for x in rows[4] if x != 0.0) == 1
    # deterministic across evaluations
    assert rows == {r.doc_id: r.vec for r in out.collect()}


def test_dsir_importance_degenerates_and_plan(spark):
    """DSIR weights: empty/NULL docs score 0 with n_feats 0; target-looking
    docs outscore off-target ones; the bucket-LM model joins back as a
    broadcast (no corpus-sized shuffle for the ratio table); all-target and
    no-target corpora stay finite (Laplace smoothing)."""
    from go_iceberg_spark.operators.text import dsir_importance
    from go_iceberg_spark.plans import inspect as P

    df = spark.createDataFrame(
        [(1, "alpha beta alpha beta gamma", "good"),
         (2, "alpha beta gamma alpha beta", "good"),
         (3, "zig zag zog quux blorp", "junk"),
         (4, "", "junk"), (5, None, "junk"),
         (6, "alpha beta alpha", "junk")],
        "doc_id long, text string, source string")
    out = dsir_importance(df, "doc_id", "text", F.col("source") == "good",
                          buckets=64)
    plan = P.formatted_plan(out)
    assert plan.count("BroadcastHashJoin") >= 1, plan
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 6
    assert rows[4].n_feats == 0 and rows[4].log_weight == 0.0
    assert rows[5].n_feats == 0 and rows[5].log_weight == 0.0
    # doc 6 shares the target's n-grams, doc 3 shares none
    assert rows[6].log_weight > rows[3].log_weight
    # absolute sign depends on the smoothing mass at tiny counts; the
    # DSIR property is the ORDERING: target-like docs outscore junk
    assert rows[1].log_weight > rows[3].log_weight
    assert rows[2].log_weight > rows[3].log_weight

    # degenerate target splits stay finite and defined
    for tgt in (F.lit(True), F.lit(False)):
        vals = dsir_importance(df, "doc_id", "text", tgt, buckets=64).collect()
        assert all(r.log_weight is not None for r in vals)


def test_sampling_family_null_keys_never_silently_drop(spark):
    """r7 degenerate sweep (the resample_locf silent-loss class): NULL ids
    hash via a sentinel so they keep/drop together per rate instead of
    vanishing from every sample; hash_split stays exhaustive (no NULL
    split); temperature_mix's stratum join is null-safe so a NULL-source
    stratum mixes at its computed rate."""
    from go_iceberg_spark.operators import sampling as SA

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (None, "b", 30), (None, None, 5), (5, None, 0)],
        "id long, src string, w long")

    assert SA.hash_sample(df, "id", 100).count() == 5
    assert SA.hash_sample(df, "id", 0).count() == 0
    sp = SA.hash_split(df, "id", {"train": 90, "val": 5, "test": 5})
    assert all(r.split is not None for r in sp.collect())
    st = SA.stratified_hash_sample(df, "id", "src", {"a": 100, "b": 100},
                                   default_pct=100)
    assert st.count() == 5
    tm = SA.temperature_mix(df, "id", "src", temperature=2.0, target_fraction=1.0)
    assert tm.count() == 5 and tm.columns == ["id", "src", "w"]
    pk = SA.pack_by_token_budget(df, "id", "w", 25)
    assert pk.count() == 5
    # weighted sampling: non-positive and NULL weights are excluded
    wdf = spark.createDataFrame([(1, -5), (2, 10), (3, None), (4, 0)],
                                "id long, w long")
    assert [r.id for r in SA.weighted_sample(wdf, "id", "w", 4).collect()] == [2]
    empty = df.limit(0)
    for got in (SA.hash_sample(empty, "id", 50), SA.weighted_sample(empty, "id", "w", 3),
                SA.pack_by_token_budget(empty, "id", "w", 25),
                SA.temperature_mix(empty, "id", "src")):
        assert got.count() == 0


def test_kmv_sketches_null_values_and_empty_sides(spark):
    """r7 degenerate sweep: a NULL value is NOT a distinct value — it used
    to inflate n_exact past the sketch size and crash ANSI element_at when
    a group held exactly k distincts plus a NULL; empty audiences give
    zero estimates and Jaccard 0.0 instead of DIVIDE_BY_ZERO."""
    from go_iceberg_spark.operators.sketch import kmv_distinct, kmv_set_ops

    df = spark.createDataFrame(
        [("g1", str(i)) for i in range(3)] + [("g1", None), ("g2", "x")],
        "g string, v string")
    out = {r.g: (r.n_exact, r.n_estimate)
           for r in kmv_distinct(df, ["g"], "v", k=4).collect()}
    assert out == {"g1": (3, 3.0), "g2": (1, 1.0)}
    assert kmv_distinct(df.limit(0), ["g"], "v", k=4).count() == 0

    empty = df.limit(0)
    one = kmv_set_ops(df.filter("g='g1'"), empty, "v", k=4).collect()[0]
    assert (one.est_a, one.est_b, one.est_union, one.jaccard,
            one.est_intersection) == (3.0, 0.0, 3.0, 0.0, 0.0)
    both = kmv_set_ops(empty, empty, "v", k=4).collect()[0]
    assert (both.est_union, both.jaccard, both.est_intersection) == (0.0, 0.0, 0.0)


def test_funnel_cohort_empty_events_pass_as_designed(spark, tmp_path):
    """r7 degenerate sweep, pinned pass-as-designed: the funnel on an empty
    events table emits its three stage rows with 0 users (matching the
    oracle's scalar subqueries); the cohort matrix is empty."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_iceberg_spark.workload import QUERIES

    sf = str(tmp_path)
    pq.write_table(pa.table({"user_id": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "event_type": pa.array([], pa.string()),
                             "props": pa.array([], pa.string())}),
                   f"{sf}/events.parquet")
    f = QUERIES["funnel_view_click_purchase"].fn(spark, sf)
    assert [(r.stage, r.users) for r in f.orderBy("stage").collect()] == \
        [(1, 0), (2, 0), (3, 0)]
    assert QUERIES["cohort_weekly_retention"].fn(spark, sf).count() == 0


def test_kmeans_degenerates_pass_as_designed(spark):
    """r7 degenerate sweep, pinned pass-as-designed (both assignment
    modes): k > n seeds with the n available rows; a single point forms
    one cluster; identical points converge to one centroid without a
    fixed-point division crash; empty input returns a typed empty frame."""
    from go_iceberg_spark.operators.clustering import kmeans_assign

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(3)])
    same = spark.createDataFrame(
        [Row(vec_id=i, embedding=[5.0, 5.0]) for i in range(10)])
    one = spark.createDataFrame([Row(vec_id=1, embedding=[1.0, 2.0])])
    for mode in ("literal", "gemm"):
        assert kmeans_assign(emb, k=8, iters=2, assignment=mode).count() == 3
        assert kmeans_assign(same, k=3, iters=2, assignment=mode).count() == 10
        assert kmeans_assign(one, k=2, iters=1, assignment=mode).count() == 1
    out = kmeans_assign(emb.limit(0), k=2, iters=1)
    assert out.count() == 0 and out.columns == ["vec_id", "cluster"]


def test_merge_intervals_islands_and_degenerates(spark):
    """r8: gaps-and-islands interval merging — overlap and within-gap
    intervals coalesce, touching-at-gap-boundary does NOT start a new
    island only when strictly beyond start > max_end + gap, inverted
    intervals are dropped (r7 range-join rule), NULL endpoints are not
    population members, duplicate intervals keep multiset counts."""
    from go_iceberg_spark.operators.timeseries import merge_intervals

    rows = [
        ("a", 0.0, 10.0), ("a", 5.0, 12.0),      # overlap -> one island
        ("a", 14.0, 15.0),                        # within gap=2 of 12 -> merges
        ("a", 18.0, 20.0),                        # 18 > 15+2 -> new island
        ("a", 30.0, 25.0),                        # inverted -> dropped
        ("b", 1.0, 2.0), ("b", 1.0, 2.0),         # duplicates both counted
        ("b", None, 9.0), ("b", 3.0, None),       # NULLs dropped
    ]
    df = spark.createDataFrame(rows, "k string, s double, e double")
    got = sorted(tuple(r) for r in
                 merge_intervals(df, "k", "s", "e", min_gap=2.0).collect())
    assert got == [("a", 0.0, 15.0, 3), ("a", 18.0, 20.0, 1),
                   ("b", 1.0, 2.0, 2)], got


def test_histogram_quantiles_clamps_and_interpolates(spark):
    """r8: fixed-width histogram quantiles — exact interpolation on a known
    distribution, out-of-range values clamp to edge bins, NULLs excluded,
    and the sketch MERGES: quantiles over (shard1 + shard2) equal quantiles
    over the union because bin counts add."""
    from go_iceberg_spark.operators.sketch import histogram_quantiles

    # 100 values 0..99 with bins exactly 1-wide: p50 target=50 -> bin 50
    df = spark.range(100).selectExpr("cast(id as double) as v")
    got = {r.q: r.est for r in histogram_quantiles(
        df, "v", lo=0.0, hi=100.0, bins=100, quantiles=(0.5, 0.99)).collect()}
    assert got[0.5] == 50.0 and got[0.99] == 99.0, got

    # clamping: far-out values land in the edge bins, never out of range
    df2 = spark.createDataFrame([(-1e9,), (1e9,), (None,)], "v double")
    got2 = {r.q: r.est for r in histogram_quantiles(
        df2, "v", lo=0.0, hi=10.0, bins=10, quantiles=(0.5,)).collect()}
    assert 0.0 <= got2[0.5] <= 10.0

    # mergeability: two shards vs their union
    a = spark.range(0, 60).selectExpr("cast(id as double) as v")
    b = spark.range(60, 100).selectExpr("cast(id as double) as v")
    u = {r.q: r.est for r in histogram_quantiles(
        a.unionAll(b), "v", lo=0.0, hi=100.0, bins=50,
        quantiles=(0.9,)).collect()}
    w = {r.q: r.est for r in histogram_quantiles(
        spark.range(100).selectExpr("cast(id as double) as v"),
        "v", lo=0.0, hi=100.0, bins=50, quantiles=(0.9,)).collect()}
    assert u == w


def test_histogram_quantiles_degenerate_guards(spark):
    """r8 degenerate sweep: hi == lo was an ANSI DIVIDE_BY_ZERO job kill,
    hi < lo silently produced negative-width-bin garbage, bins = 0 a raw
    ZeroDivisionError — all rejected with ValidationError driver-side;
    empty/all-NULL inputs return an empty quantile set."""
    import pytest as _pytest

    from go_iceberg_spark.errors import ValidationError
    from go_iceberg_spark.operators.sketch import histogram_quantiles

    one = spark.createDataFrame([(5.0,)], "v double")
    for kw in ({"lo": 5.0, "hi": 5.0}, {"lo": 9.0, "hi": 1.0},
               {"lo": 0.0, "hi": 10.0, "bins": 0},
               {"lo": 0.0, "hi": 10.0, "quantiles": (1.5,)}):
        with _pytest.raises(ValidationError):
            histogram_quantiles(one, "v", **kw)
    empty = spark.createDataFrame([(None,)], "v double")
    assert histogram_quantiles(empty, "v", lo=0.0, hi=1.0).collect() == []


def test_rrf_fuse_ranks_ties_and_missing_ids(spark):
    """r8: reciprocal-rank fusion — ids missing from one list still score
    (n_lists records coverage), score ties rank deterministically by id,
    contributions are integer-nano-quantized (order-free sums), and top_n
    truncates by fused rank."""
    from go_iceberg_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(1, 9.0), (2, 9.0), (3, 5.0)], "id bigint, s double")
    b = spark.createDataFrame([(3, 7.0), (4, 6.0)], "id bigint, s double")
    out = {r.id: (r.rrf_nano, r.n_lists)
           for r in rrf_fuse([a, b], "id", "s", k=60).collect()}
    # tie at s=9.0: id 1 ranks 1, id 2 ranks 2 (id asc tie-break)
    n = lambda rank: round(1e9 / (60 + rank))
    assert out[1] == (n(1), 1) and out[2] == (n(2), 1)
    assert out[3] == (n(3) + n(1), 2)          # in both lists
    assert out[4] == (n(2), 1)
    top = [r.id for r in rrf_fuse([a, b], "id", "s", k=60, top_n=2).collect()]
    assert top == [3, 1]                        # fused order, id tie-break


def test_rrf_fuse_degenerate_guards(spark):
    import pytest as _pytest

    from go_iceberg_spark.errors import ValidationError
    from go_iceberg_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame([(1, 1.0)], "id bigint, s double")
    empty = spark.createDataFrame([], "id bigint, s double")
    with _pytest.raises(ValidationError):
        rrf_fuse([], "id", "s")
    with _pytest.raises(ValidationError):
        rrf_fuse([a], "id", "s", k=-1)
    # an empty input list contributes nothing; single-list fuse degrades
    # to the list's own ranking
    out = rrf_fuse([a, empty], "id", "s", k=60).collect()
    assert [(r.id, r.n_lists) for r in out] == [(1, 1)]


def test_hll_distinct_accuracy_and_mergeability(spark):
    """r9: portable HLL — estimate within the sketch's expected error band
    (1.04/sqrt(512) ~ 4.6%; allow 3 sigma), linear-counting branch
    near-exact at small cardinality, and registers merge by max so shard
    sketches equal the one-pass sketch (the 100 TB combine property)."""
    from pyspark.sql import functions as F

    from go_iceberg_spark.operators.sketch import hll_distinct, hll_registers

    df = spark.range(0, 40000).select(
        (F.col("id") % 13).alias("g"),
        F.concat(F.lit("v"), (F.col("id") % 9973).cast("string")).alias("v"))
    est = {r.g: r.n_estimate for r in hll_distinct(df, ["g"], "v").collect()}
    exact = {r.g: r.n for r in df.groupBy("g")
             .agg(F.countDistinct("v").alias("n")).collect()}
    # n/m ~ 6 sits just above the linear-counting crossover, the classic
    # estimator's known bias region (what HLL++'s empirical tables
    # correct); groups also share one value universe so their errors
    # correlate — band per group 20%, mean must stay inside ~2 sigma
    errs = [abs(e - exact[g]) / exact[g] for g, e in est.items()]
    assert max(errs) < 0.20, sorted(zip(errs, est))[-1]
    assert sum(errs) / len(errs) < 0.10, errs

    small = spark.range(0, 5000).select(
        F.lit(1).alias("g"), (F.col("id") % 50).cast("string").alias("v"))
    (e,) = [r.n_estimate for r in hll_distinct(small, ["g"], "v").collect()]
    assert abs(e - 50) / 50 < 0.05, e  # linear counting: near-exact

    lo = hll_registers(df.filter(F.col("id") < 20000), ["g"], "v")
    hi = hll_registers(df.filter(F.col("id") >= 20000), ["g"], "v")
    merged = (lo.unionByName(hi).groupBy("g", "bucket")
              .agg(F.max("register").alias("register")))
    one = hll_registers(df, ["g"], "v")
    assert not merged.exceptAll(one).count() and not one.exceptAll(merged).count()


def test_bloom_prefilter_join_exact_and_effective(spark):
    """r10: bloom_prefilter_join must equal the plain join exactly (no
    false negatives), across multi-column keys, NULL keys, and left_semi;
    an empty build side drops every probe row; invalid join shapes (where
    a dropped probe row could still appear in output) are refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from go_iceberg_spark.operators.joins import bloom_prefilter_join

    big = spark.range(0, 20000).select(
        (F.col("id") % 500).alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("v"))
    small = spark.createDataFrame(
        [(i, str(i % 3)) for i in range(0, 500, 25)], "k bigint, g string")

    for how in ("inner", "left_semi"):
        got = bloom_prefilter_join(big, small, ["k", "g"], how=how)
        want = big.join(small, ["k", "g"], how)
        assert not got.exceptAll(want).count() and not want.exceptAll(got).count(), how

    # NULL probe keys never match an inner join; NULL build keys are ignored
    bign = big.unionByName(spark.createDataFrame([(None, None, -1)], big.schema))
    smalln = small.unionByName(spark.createDataFrame([(None, None)], small.schema))
    got = bloom_prefilter_join(bign, smalln, ["k", "g"])
    want = bign.join(smalln, ["k", "g"])
    assert not got.exceptAll(want).count() and not want.exceptAll(got).count()

    assert bloom_prefilter_join(big, small.limit(0), ["k", "g"]).count() == 0

    with _pytest.raises(ValueError):
        bloom_prefilter_join(big, small, ["k"], how="left")


def test_cms_heavy_hitters_guarantee_and_mergeability(spark):
    """r10: Count-Min sketch — (a) est >= exact for EVERY value (one-sided
    guarantee: no true heavy hitter is missed), (b) estimates are tight for
    heavy values when w comfortably exceeds the distinct count, (c) shard
    sketches summed elementwise equal the one-pass sketch, (d) weighted
    counts (count_col) ride through, (e) NULL values are not counted."""
    from pyspark.sql import functions as F

    from go_iceberg_spark.operators.sketch import (
        cms_estimate,
        cms_heavy_hitters,
        cms_sketch,
    )

    # skewed frequencies: value v appears (v+1)^2 times, v in 0..29
    df = spark.range(0, 30).select(F.col("id").alias("v")).withColumn(
        "n", ((F.col("v") + 1) ** 2).cast("int"))
    src = df.select(F.explode(F.expr("array_repeat(v, n)")).alias("v"))
    exact = {r.v: r.n for r in df.collect()}

    sk = cms_sketch(src, "v", d=4, w=256)
    assert sk.count() <= 4 * 256
    est = {r.v: r.est_n for r in cms_estimate(sk, src, "v", d=4, w=256).collect()}
    assert set(est) == set(exact)
    for v, e in est.items():
        assert e >= exact[v], (v, e, exact[v])  # one-sided
    # 30 distincts into 256 buckets x 4 rows: collisions are rare — most
    # estimates exact, all within a small additive error
    assert sum(1 for v in exact if est[v] == exact[v]) >= 25
    assert all(est[v] - exact[v] <= sum(exact.values()) * 0.05 for v in exact)

    hh = {r.v for r in cms_heavy_hitters(src, "v", d=4, w=256,
                                         threshold=400).collect()}
    assert {v for v, n in exact.items() if n >= 400} <= hh  # no misses

    # mergeability: elementwise-summed half sketches == one-pass
    lo = cms_sketch(src.filter(F.col("v") < 15), "v", d=4, w=256)
    hi = cms_sketch(src.filter(F.col("v") >= 15), "v", d=4, w=256)
    merged = (lo.unionByName(hi).groupBy("row", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    one = cms_sketch(src, "v", d=4, w=256)
    assert not merged.exceptAll(one).count() and not one.exceptAll(merged).count()

    # weighted path: pre-aggregated (value, weight) rows give the same
    # sketch as the exploded stream
    wsk = cms_sketch(df.withColumn("v", F.col("v")), "v", d=4, w=256,
                     count_col="n")
    assert not wsk.exceptAll(one).count() and not one.exceptAll(wsk).count()

    # NULLs don't count
    withnull = src.unionByName(
        spark.createDataFrame([(None,)], "v bigint"))
    nsk = cms_sketch(withnull, "v", d=4, w=256)
    assert not nsk.exceptAll(one).count() and not one.exceptAll(nsk).count()


def test_mmr_rerank_trades_relevance_for_diversity(spark):
    """r9: MMR must (a) keep the most-relevant candidate at rank 1, (b)
    swap at least one near-clone for a diverse direction that plain top-k
    ignores, and (c) never repeat a candidate."""
    from pyspark.sql import Row

    from go_iceberg_spark.operators.similarity import cosine_topk, mmr_rerank

    rows = [Row(vec_id=0, embedding=[1.0, 0.0, 0.0])]
    for i in range(1, 7):  # near-clones of the query direction
        rows.append(Row(vec_id=i, embedding=[1.0, 0.001 * i, 0.0]))
    rows.append(Row(vec_id=10, embedding=[0.8, 0.6, 0.0]))
    rows.append(Row(vec_id=11, embedding=[0.8, 0.0, 0.6]))
    rows.append(Row(vec_id=12, embedding=[0.7, -0.7, 0.1]))
    df = spark.createDataFrame(rows)
    q = df.filter(F.col("vec_id") == 0)
    topk = [r.neighbor_id for r in cosine_topk(df, q, k=4).orderBy("rank").collect()]
    assert all(i <= 6 for i in topk)  # plain top-k: all clones
    mmr = [r.cand_id for r in mmr_rerank(df, q, n_candidates=8, k=4, lam=0.5)
           .orderBy("mmr_rank").collect()]
    assert mmr[0] == topk[0]
    assert any(i >= 10 for i in mmr), mmr
    assert len(set(mmr)) == 4


def test_parse_image_header_real_containers(spark):
    """r11: header parsing must recover exact dimensions from real PNG/
    JPEG/GIF/BMP header bytes (stdlib struct, no codecs), walk past
    leading JPEG segments to the first SOFn, and degrade to NULLs on
    garbage/truncation instead of raising."""
    import struct

    from go_iceberg_spark.operators.multimodal import (
        decode_image_metadata,
        parse_image_header,
        synth_image_bytes,
    )

    assert parse_image_header(synth_image_bytes("png", 640, 480)) == ("png", 640, 480)
    assert parse_image_header(synth_image_bytes("jpeg", 123, 4567)) == ("jpeg", 123, 4567)
    assert parse_image_header(synth_image_bytes("gif", 65535, 1)) == ("gif", 65535, 1)
    # BMP: handcrafted info header, negative height = top-down rows
    bmp = (b"BM" + b"\x00" * 16 + struct.pack("<ii", 320, -200) + b"\x00" * 10)
    assert parse_image_header(bmp) == ("bmp", 320, 200)
    # a PROGRESSIVE jpeg (SOF2) parses too
    prog = synth_image_bytes("jpeg", 10, 20).replace(b"\xff\xc0", b"\xff\xc2")
    assert parse_image_header(prog) == ("jpeg", 10, 20)
    # garbage / truncation tolerance
    assert parse_image_header(b"") == (None, None, None)
    assert parse_image_header(b"garbage bytes here") == (None, None, None)
    assert parse_image_header(synth_image_bytes("png", 9, 9)[:15]) == (None, None, None)
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x04") == ("jpeg", None, None)

    # the DataFrame path: Arrow batch + struct output, NULL payloads dropped
    df = spark.createDataFrame(
        [(1, synth_image_bytes("png", 64, 32)),
         (2, synth_image_bytes("jpeg", 800, 600)),
         (3, b"junk"), (4, None)],
        "img_id long, media_bytes binary")
    got = {r.img_id: (r.media_meta.format, r.media_meta.width, r.media_meta.height)
           for r in decode_image_metadata(df, "img_id").collect()}
    assert got == {1: ("png", 64, 32), 2: ("jpeg", 800, 600),
                   3: (None, None, None)}


def test_minhash_lsh_max_bucket_caps_candidate_blowup(spark):
    """r12: max_bucket drops oversized band buckets (quadratic candidate
    cost) while pairs co-bucketed in any small band survive; default None
    is exact. A planted 40-doc identical-text cluster (every band bucket
    holds all 40) disappears under max_bucket=10; a planted 2-doc near-dup
    pair is untouched."""
    from pyspark.sql import Row

    from go_iceberg_spark.operators.dedup import minhash_lsh_pairs

    boiler = [Row(doc_id=i, text="the same boilerplate template text repeated " * 4)
              for i in range(40)]
    shared = ("a unique document about rivers and mountains and forests "
              "and valleys and meadows and glaciers near the northern coast ")
    pair = [Row(doc_id=100, text=shared + "side a"),
            Row(doc_id=101, text=shared + "side b")]
    df = spark.createDataFrame(boiler + pair)

    exact = minhash_lsh_pairs(df, "doc_id", "text", n=3, mode="word", threshold=0.6)
    assert exact.count() == 40 * 39 // 2 + 1  # full clique + the pair

    capped = minhash_lsh_pairs(df, "doc_id", "text", n=3, mode="word",
                               threshold=0.6, max_bucket=10)
    rows = sorted((r.id_a, r.id_b) for r in capped.collect())
    assert rows == [(100, 101)], rows  # clique dropped, small pair kept


def test_simhash_wide_banding_is_exact_to_hamming_3(spark):
    """r12: simhash_wide_pairs' four disjoint 30-bit bands are EXACT for
    hamming <= 3 (pigeonhole: <= 3 differing bits across 4 disjoint bands
    leave at least one band identical) — banded output must equal the
    brute-force all-pairs hamming filter over the same wide fingerprints,
    and the reported hamming must equal the two-word XOR popcount."""
    from go_iceberg_spark.operators.dedup import simhash_wide, simhash_wide_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    banded = {(r.id_a, r.id_b): r.hamming
              for r in simhash_wide_pairs(docs, "doc_id", "text", max_hamming=3).collect()}

    fp = {r.doc_id: (r.simhash_hi, r.simhash_lo)
          for r in simhash_wide(docs, "doc_id", "text").collect()}
    ids = sorted(fp)
    brute = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = (bin(fp[a][0] ^ fp[b][0]).count("1")
                 + bin(fp[a][1] ^ fp[b][1]).count("1"))
            if h <= 3:
                brute[(a, b)] = h
    assert brute, "fixture should contain at least one wide near-dup pair"
    assert banded == brute


def test_bmp_pixel_decode_and_real_resize(spark):
    """r12 (VERDICT r11 task #7): uncompressed 24-bit BMP decodes for REAL
    with stdlib struct — exact pixel values out (BGR flip + bottom-up flip
    + stride un-padding), top-down DIBs too; PNG payloads still raise
    NotImplementedError (honest no-codec posture) unless skip_unsupported
    drops them; resize_images does true nearest-neighbor on BMP inputs."""
    import pytest as _pytest

    from go_iceberg_spark.operators.multimodal import (
        attach_synthetic_bmps,
        decode_bmp_pixels,
        decode_image,
        resize_images,
        synth_bmp_bytes,
        synth_image_bytes,
    )

    # round-trip: every decoded pixel equals the closed form
    w, h, seed = 5, 3, 7  # w=5 forces a nonzero row pad (15 -> 16)
    dw, dh, rgb = decode_bmp_pixels(synth_bmp_bytes(w, h, seed))
    assert (dw, dh, len(rgb)) == (w, h, w * h * 3)
    for y in range(h):
        for x in range(w):
            o = (y * w + x) * 3
            assert rgb[o:o + 3] == bytes((
                (7 * x + 13 * y + seed) % 256,
                (3 * x + 5 * y + seed) % 256,
                (x + y + seed) % 256)), (x, y)

    # top-down DIB (negative height) decodes to the same top-down pixels
    import struct as _s
    bu = bytearray(synth_bmp_bytes(4, 4, 11))
    stride = 4 * 3
    rows = [bytes(bu[54 + i * stride:54 + (i + 1) * stride]) for i in range(4)]
    td = bytes(bu[:22]) + _s.pack("<i", -4) + bytes(bu[26:54]) + b"".join(reversed(rows))
    assert decode_bmp_pixels(td) == decode_bmp_pixels(bytes(bu))

    # unsupported formats: raise by default, droppable explicitly
    mixed = spark.createDataFrame(
        [(1, synth_bmp_bytes(6, 4, 3)), (2, synth_image_bytes("png", 8, 8))],
        "img_id long, media_bytes binary")
    with _pytest.raises(Exception, match="codec"):
        decode_image(mixed, "img_id").collect()
    only = decode_image(mixed, "img_id", skip_unsupported=True).collect()
    assert [(r.img_id, r.width, r.height) for r in only] == [(1, 6, 4)]

    # real nearest-neighbor: resized bytes equal the closed form at the
    # integer-scaled source index
    bmps = attach_synthetic_bmps(
        spark.createDataFrame([(9,), (22,)], "doc_id long"), "doc_id")
    out = {r.doc_id: bytes(r.media_bytes)
           for r in resize_images(bmps, "doc_id", width=8, height=8).collect()}
    for d, payload in out.items():
        sw, sh, seed = 4 + d % 13, 4 + d % 11, d % 97
        assert len(payload) == 192
        for yo in range(8):
            for xo in range(8):
                sx, sy = xo * sw // 8, yo * sh // 8
                o = (yo * 8 + xo) * 3
                assert payload[o:o + 3] == bytes((
                    (7 * sx + 13 * sy + seed) % 256,
                    (3 * sx + 5 * sy + seed) % 256,
                    (sx + sy + seed) % 256)), (d, xo, yo)


def test_cms_estimate_rejects_mismatched_d_w(spark):
    """r11 (r10 ADVICE): probing a sketch with d/w different from the
    build's silently turned misses into est=0 (dropping true heavy
    hitters); the plan-level guard must RAISE instead. Matching probes
    and empty sketches stay fine."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from go_iceberg_spark.operators.sketch import cms_estimate, cms_sketch

    src = spark.range(0, 3000).select((F.col("id") % 31).alias("v"))
    sk = cms_sketch(src, "v", d=4, w=256)
    assert cms_estimate(sk, src, "v", d=4, w=256).count() == 31
    for d, w in ((6, 256), (2, 256), (4, 64)):
        with _pytest.raises(Exception, match="inconsistent"):
            cms_estimate(sk, src, "v", d=d, w=w).collect()
    # empty sketch: every estimate is legitimately 0, no raise
    empty = cms_sketch(src.limit(0), "v", d=4, w=256)
    est = cms_estimate(empty, src.limit(5), "v", d=4, w=256)
    assert all(r.est_n == 0 for r in est.collect())


def test_cosine_topk_gemm_matches_fold_and_bounds_queries(spark):
    """r11: the GEMM top-k must reproduce the expression-fold path exactly
    on margin-separated data (same neighbors, same ranks, self-matches
    and zero-norm vectors excluded), and refuse a query set past the
    driver-boundedness cap instead of silently collecting it."""
    import random

    import pytest as _pytest
    from pyspark.sql import Row

    from go_iceberg_spark.errors import ValidationError
    from go_iceberg_spark.operators.similarity import cosine_topk, cosine_topk_gemm

    rng = random.Random(7)
    rows = [Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(16)])
            for i in range(300)]
    rows.append(Row(vec_id=900, embedding=[0.0] * 16))  # zero-norm corpus row
    df = spark.createDataFrame(rows).repartition(8)
    q = df.filter(F.col("vec_id") % 29 == 0)

    a = sorted((r.query_id, r.rank, r.neighbor_id)
               for r in cosine_topk(df, q, k=7).collect())
    b = sorted((r.query_id, r.rank, r.neighbor_id)
               for r in cosine_topk_gemm(df, q, k=7).collect())
    assert a == b and a
    assert all(qid != nid for qid, _, nid in b)      # no self-matches
    assert all(nid != 900 for _, _, nid in b)        # zero-norm never a neighbor
    assert not any(qid == 900 for qid, _, _ in b)    # zero-norm query dropped

    with _pytest.raises(ValidationError, match="max_queries"):
        cosine_topk_gemm(df, df, k=3, max_queries=10)


def test_cosine_topk_gemm_null_vectors_and_id_types(spark):
    """r12 (ADVICE r11): (a) NULL embedding vectors in the CORPUS are
    filtered like the fold path's norm>0 filter, never a crash; (b) the
    empty-query fallback schema and the qids dtype derive from the actual
    id column types — int ids and string ids both work, on both paths,
    empty and non-empty."""
    import random

    from pyspark.sql import Row

    from go_iceberg_spark.operators.similarity import cosine_topk, cosine_topk_gemm

    rng = random.Random(3)
    rows = [Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
            for i in range(60)]
    rows.append(Row(vec_id=500, embedding=None))  # NULL corpus vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter((F.col("vec_id") % 13 == 0) & F.col("embedding").isNotNull())

    a = sorted((r.query_id, r.rank, r.neighbor_id)
               for r in cosine_topk(df, q, k=4).collect())
    b = sorted((r.query_id, r.rank, r.neighbor_id)
               for r in cosine_topk_gemm(df, q, k=4).collect())
    assert a == b and a
    assert all(nid != 500 for _, _, nid in b)  # NULL vector never a neighbor

    # int (not long) ids: empty query set returns the CORPUS id type
    df_int = df.withColumn("vec_id", F.col("vec_id").cast("int"))
    empty = cosine_topk_gemm(df_int, df_int.limit(0), k=3)
    assert [f.dataType.simpleString() for f in empty.schema.fields] == [
        "int", "int", "int"]
    assert empty.count() == 0

    # string ids: both paths agree, populated and empty
    df_s = df.filter(F.col("embedding").isNotNull()).withColumn(
        "vec_id", F.concat(F.lit("d"), F.col("vec_id")))
    q_s = df_s.filter(F.col("vec_id").isin("d0", "d13", "d26"))
    a_s = sorted((r.query_id, r.rank, r.neighbor_id)
                 for r in cosine_topk(df_s, q_s, k=4).collect())
    b_s = sorted((r.query_id, r.rank, r.neighbor_id)
                 for r in cosine_topk_gemm(df_s, q_s, k=4).collect())
    assert a_s == b_s and a_s
    assert all(isinstance(qid, str) and isinstance(nid, str)
               for qid, _, nid in b_s)
    empty_s = cosine_topk_gemm(df_s, df_s.limit(0), k=3)
    assert empty_s.schema.fields[0].dataType.simpleString() == "string"


def test_ivf_trained_recall_not_below_untrained(spark):
    """r12 (VERDICT r11 task #4): Lloyd-trained IVF lists must reach
    recall@5 >= the one-pass hash-seed lists at EQUAL n_probe on the graded
    fixtures (sf0.01 and sf0.1 — sf0.001's 20-vector corpus is degenerate
    for k=8 lists and excluded). Also pins that training drops no rows and
    that the trained path stays a literal (shuffle-free) assignment."""
    from go_iceberg_spark.operators.similarity import cosine_topk, ivf_topk

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        emb = spark.read.parquet(sf_dir + "/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < 5)
        exact = set((r.query_id, r.neighbor_id) for r in
                    cosine_topk(emb, qs, id_col="vec_id", vec_col="embedding",
                                k=5).collect())
        got = {}
        for iters in (0, 2):
            pairs = set((r.query_id, r.neighbor_id) for r in
                        ivf_topk(emb, qs, id_col="vec_id", vec_col="embedding",
                                 k=5, n_lists=8, n_probe=2,
                                 train_iters=iters).collect())
            got[iters] = len(pairs & exact) / len(exact)
        assert got[2] >= got[0], (sf_dir, got)


def test_ivf_near_dup_trained_not_below_untrained(spark):
    """r12: the SemDeDup-shaped trained bucketing must co-locate at least
    as many TRUE near-dup pairs as the hash-seed lists at equal n_probe —
    both outputs are subsets of the exact O(n^2) pair set (IVF never
    invents pairs, it only misses cross-bucket ones), and the trained
    subset must not be smaller."""
    from go_iceberg_spark.operators.dedup import embedding_near_dup_pairs
    from go_iceberg_spark.operators.similarity import ivf_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = set((r.id_a, r.id_b) for r in embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4).collect())
    got = {}
    for iters in (0, 2):
        pairs = set((r.id_a, r.id_b) for r in ivf_near_dup_pairs(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.4,
            n_lists=8, n_probe=2, train_iters=iters).collect())
        assert pairs <= exact, "IVF bucketing must never invent pairs"
        got[iters] = len(pairs)
    assert got[2] >= got[0], got


def test_resample_interpolate_interior_only(spark):
    """r11: linear interpolation must fill INTERIOR gaps with the
    time-weighted value between nearest observed neighbors, leave edge
    cells NULL (no extrapolation), pass observed cells through untouched,
    and keep NULL keys as a legal group (null-safe spine join)."""
    import datetime as dt

    from go_iceberg_spark.operators.timeseries import resample_interpolate

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        ("a", t0, 10.0),                                  # hour 0
        ("a", t0 + dt.timedelta(hours=4), 30.0),          # hour 4 (gap 1-3)
        ("b", t0 + dt.timedelta(hours=2), 5.0),           # single obs
        (None, t0 + dt.timedelta(hours=1), 7.0),          # NULL key group
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {(r.k, r.bucket_ts.hour): (r.avg_v, r.interp_v)
           for r in resample_interpolate(df, "ts", "k", "v").collect()}
    # observed cells pass through
    assert out[("a", 0)] == (10.0, 10.0) and out[("a", 4)] == (30.0, 30.0)
    # interior gap: linear in time (hours 1..3 of a 0->4 ramp 10->30)
    assert out[("a", 1)][1] == 15.0
    assert out[("a", 2)][1] == 20.0
    assert out[("a", 3)][1] == 25.0
    # edges (grid spans the GLOBAL bounds): before b's first obs and after
    # its last -> NULL both sides
    assert out[("b", 0)] == (None, None) and out[("b", 4)] == (None, None)
    assert out[("b", 2)] == (5.0, 5.0)
    # NULL key is a real group, not silently dropped
    assert out[(None, 1)] == (7.0, 7.0)


def test_hll_register_merge_equals_one_pass(spark):
    """r12: the mergeability contract moved here from sketch_hll_distinct's
    timed region (it re-hashed the corpus twice more + ran two exceptAll
    counts on every bench invocation, for a data-independent algebraic
    property). Registers built on two disjoint halves and max-merged must
    equal the one-pass registers — how shard sketches combine at 100 TB
    without a second data pass."""
    from go_iceberg_spark.operators.sketch import hll_registers

    o = (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
         .withColumn("grp", F.lit("ALL")))
    cut = 750
    lo = hll_registers(o.filter(F.col("o_orderkey") < cut), ["grp"], "o_orderkey")
    hi = hll_registers(o.filter(F.col("o_orderkey") >= cut), ["grp"], "o_orderkey")
    merged = (lo.unionByName(hi).groupBy("grp", "bucket")
              .agg(F.max("register").alias("register")))
    one_pass = hll_registers(o, ["grp"], "o_orderkey")
    assert not merged.exceptAll(one_pass).count()
    assert not one_pass.exceptAll(merged).count()


def test_cms_one_sided_guarantee_and_merge(spark):
    """r12: both CMS self-checks moved here from the timed region of
    sketch_cms_heavy_hitters (a full exact groupBy + join + count and
    three extra sketch builds + two exceptAll counts per bench run).
    (a) est(v) >= true count for EVERY candidate (one-sided guarantee);
    (b) half-sketches summed cell-wise equal the one-pass sketch
    (mergeability — also its own graded row, sketch_cms_merge)."""
    from go_iceberg_spark.operators.sketch import cms_estimate, cms_sketch

    d, w = 4, 256
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    src = o.select((F.col("o_custkey") % 97).alias("ck_mod"))
    sk = cms_sketch(src, "ck_mod", d=d, w=w).localCheckpoint(eager=True)
    est = cms_estimate(sk, src, "ck_mod", d=d, w=w)
    exact = src.groupBy("ck_mod").agg(F.count(F.lit(1)).alias("n"))
    viol = est.join(exact, "ck_mod").filter(F.col("est_n") < F.col("n")).count()
    assert viol == 0, f"CMS underestimated {viol} values"

    mk = lambda df: cms_sketch(  # noqa: E731
        df.select((F.col("o_custkey") % 97).alias("ck_mod")), "ck_mod", d=d, w=w)
    lo, hi = mk(o.filter(F.col("o_orderkey") < 750)), mk(o.filter(F.col("o_orderkey") >= 750))
    merged = (lo.unionByName(hi).groupBy("row", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    one_pass = mk(o)
    assert not merged.exceptAll(one_pass).count()
    assert not one_pass.exceptAll(merged).count()


def test_mmr_driver_greedy_matches_distributed(spark):
    """r12: mmr_rerank's default path replays the greedy on the driver over
    the collected candidate pool (one Spark job instead of ~8 per round).
    It must be BIT-IDENTICAL to the distributed unrolled rounds
    (materialize=False) — same sequential-fold cosine, same lam constants,
    same tie-breaks — including on a corpus with score ties and a query
    whose pool is smaller than k."""
    import random

    from pyspark.sql import Row

    from go_iceberg_spark.operators.similarity import mmr_rerank

    rng = random.Random(11)
    rows = [Row(vec_id=i, embedding=[rng.uniform(-1, 1) for _ in range(8)])
            for i in range(40)]
    # planted exact duplicates -> tied relevance AND tied pairwise sims
    rows += [Row(vec_id=100 + i, embedding=list(rows[i].embedding)) for i in range(3)]
    df = spark.createDataFrame(rows)
    q = df.filter(F.col("vec_id") < 4)
    kw = dict(id_col="vec_id", vec_col="embedding", n_candidates=6, k=5, lam=0.7)
    fast = sorted((r.query_id, r.mmr_rank, r.cand_id)
                  for r in mmr_rerank(df, q, **kw).collect())
    slow = sorted((r.query_id, r.mmr_rank, r.cand_id)
                  for r in mmr_rerank(df, q, materialize=False, **kw).collect())
    spark.catalog.clearCache()
    assert fast == slow and fast

    # tiny pool: a 3-vector corpus can fill at most 2 ranks per query
    tiny = spark.createDataFrame(rows[:3])
    got = mmr_rerank(tiny, tiny.limit(1), **kw).collect()
    assert {r.mmr_rank for r in got} == {1, 2}

    # boundedness contract: a pool past the cap raises, never collects
    import pytest as _pytest

    from go_iceberg_spark.errors import ValidationError
    from go_iceberg_spark.operators import similarity as S

    old = S.MMR_MAX_POOL_ROWS
    try:
        with _pytest.raises(ValidationError, match="max_pool_rows"):
            S._mmr_greedy_driver(
                df.select(F.col("vec_id").alias("query_id"),
                          F.col("vec_id").alias("cand_id"),
                          F.lit(1.0).alias("_rel"),
                          F.col("embedding").alias("_cv"),
                          F.lit(1.0).alias("_cn")),
                k=2, lam=0.5, qid_t="long", cid_t="long", max_pool_rows=10)
    finally:
        assert S.MMR_MAX_POOL_ROWS == old


def test_knn_classify_gemm_matches_fold_on_graded_fixture(spark):
    """r12: similarity_knn_classify's graded row now scores with the GEMM
    path; fold and GEMM votes must agree on the graded fixture (they are
    pinned to the SAME oracle SQL, so any divergence is a top-k margin
    crossed by BLAS summation noise — which this test would surface)."""
    from go_iceberg_spark.operators.similarity import knn_classify

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter((F.col("vec_id") % 17 == 0) & (F.col("vec_id") < 3400))
    kw = dict(id_col="vec_id", vec_col="embedding", label_col="label", k=5)
    fold = sorted((r.query_id, r.predicted_label, r.votes)
                  for r in knn_classify(emb, q, method="fold", **kw).collect())
    gemm = sorted((r.query_id, r.predicted_label, r.votes)
                  for r in knn_classify(emb, q, method="gemm", **kw).collect())
    assert fold == gemm and fold


def test_cms_pre_aggregate_identical_counters(spark):
    """r12: cms_sketch(pre_aggregate=True) hashes each DISTINCT value once
    (for caller-known bounded domains) — the counter table must be
    cell-for-cell identical to the per-row build, weighted counts
    included."""
    from go_iceberg_spark.operators.sketch import cms_sketch

    df = spark.range(0, 5000).select(
        (F.col("id") % 37).alias("v"), (F.col("id") % 3 + 1).alias("wgt"))
    for cc in (None, "wgt"):
        a = {(r.row, r.bucket): r.cnt for r in cms_sketch(
            df, "v", d=4, w=64, count_col=cc).collect()}
        b = {(r.row, r.bucket): r.cnt for r in cms_sketch(
            df, "v", d=4, w=64, count_col=cc, pre_aggregate=True).collect()}
        assert a == b and a, cc


def test_minhash_shingle_reuse_matches_two_pass(spark, monkeypatch):
    """r13: under the input-size budget, minhash_lsh_pairs checkpoints the
    pass-1 (_id, _h) shingle rows and reuses them for candidate
    verification instead of re-scanning + re-shingling the input. Results
    must be identical pair-for-pair (ids AND jaccard) to the two-pass
    shape, and the lazy twin must be untouched by the budget."""
    from go_iceberg_spark.operators import dedup as D

    rows = [Row(doc_id=i, text=f"alpha beta gamma delta epsilon zeta {i} "
                               f"eta theta iota kappa") for i in range(60)]
    rows += [Row(doc_id=1000 + i, text=rows[i].text) for i in range(10)]
    rows += [Row(doc_id=2000 + i, text=rows[i].text + " zz qq") for i in range(10)]
    df = spark.createDataFrame(rows)

    def pairs(budget):
        monkeypatch.setattr(D, "MINHASH_SHINGLE_REUSE_MAX_INPUT_BYTES", budget)
        out = D.minhash_lsh_pairs(df, "doc_id", "text", n=3, mode="word",
                                  threshold=0.6)
        return sorted((r.id_a, r.id_b, r.jaccard) for r in out.collect())

    reuse = pairs(1 << 40)   # force the reuse path
    twopass = pairs(0)       # force the recompute path
    assert reuse == twopass and reuse

    # lazy twin ignores the budget: its plan must contain the raw input
    # scan lineage for verification (no checkpoint RDD stub)
    monkeypatch.setattr(D, "MINHASH_SHINGLE_REUSE_MAX_INPUT_BYTES", 1 << 40)
    lazy = D.minhash_lsh_pairs(df, "doc_id", "text", n=3, mode="word",
                               threshold=0.6, materialize=False)
    assert sorted((r.id_a, r.id_b, r.jaccard) for r in lazy.collect()) == reuse
    spark.catalog.clearCache()


def test_mmr_pool_byte_bound(spark):
    """r13: the MMR driver-greedy collect is bounded by BYTES (rows x actual
    vector width), not just rows — a high-dim pool raises before the row
    cap is near."""
    from go_iceberg_spark.errors import ValidationError
    from go_iceberg_spark.operators import similarity as S

    wide = spark.range(0, 64).select(
        F.lit(0).alias("query_id"), F.col("id").alias("cand_id"),
        F.lit(1.0).alias("_rel"),
        F.expr("transform(sequence(1, 4096), i -> CAST(i AS DOUBLE))").alias("_cv"),
        F.lit(1.0).alias("_cn"))
    with pytest.raises(ValidationError, match="max_pool_bytes"):
        S._mmr_greedy_driver(wide, k=2, lam=0.5, qid_t="long", cid_t="long",
                             max_pool_bytes=1 << 20)
    # the same pool passes under a budget that fits it
    out = S._mmr_greedy_driver(wide, k=2, lam=0.5, qid_t="long", cid_t="long",
                               max_pool_bytes=1 << 30)
    assert out.count() == 2


def test_lsh_dim_hint_identical_buckets(spark):
    """r13: lsh_bucket_expr(dim=...) shrinks the plane literals to the
    actual vector width — buckets must be bit-identical to the unhinted
    expression for every vector with size <= dim, and a wider vector must
    fail loudly instead of silently dropping plane components."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from go_iceberg_spark.operators.similarity import lsh_bucket_expr

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[((i * 7 + j * 13) % 19 - 9) / 4.0
                                  for j in range(8)]) for i in range(64)])
    got = df.select(
        "vec_id",
        lsh_bucket_expr(F.col("embedding")).alias("plain"),
        lsh_bucket_expr(F.col("embedding"), dim=8).alias("hinted"),
    ).collect()
    assert got and all(r.plain == r.hinted for r in got)

    wide = spark.createDataFrame([Row(embedding=[1.0] * 16)])
    with pytest.raises(SparkRuntimeException, match="dim <= 8"):
        wide.select(lsh_bucket_expr(F.col("embedding"), dim=8).alias("b")).collect()
    with pytest.raises(ValueError, match="dim must be"):
        lsh_bucket_expr(F.col("embedding"), dim=0)


def test_knn_gemm_topk_margin_exceeds_blas_noise():
    """r13 (ADVICE): the graded kNN rows score through the GEMM path, whose
    summation order differs from the fold by ~1e-15. That is only safe
    while every query's top-k boundary margin (k-th vs (k+1)-th cosine)
    is far wider than BLAS noise — this pins it on the graded fixture so
    a regenerated corpus that brings a margin inside noise width fails
    LOUDLY here instead of silently flipping the graded hash."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t.column("vec_id").to_pylist())
    V = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = np.linalg.norm(V, axis=1)
    keep = n > 0
    ids, V, n = ids[keep], V[keep], n[keep]
    Vn = V / n[:, None]
    qmask = (ids % 17 == 0) & (ids < 3400)
    S = Vn[qmask] @ Vn.T
    S[np.arange(qmask.sum()), np.flatnonzero(qmask)] = -np.inf  # self-match
    k = 5
    top = -np.sort(-S, axis=1)[:, : k + 1]
    margins = top[:, k - 1] - top[:, k]
    assert margins.min() > 1e-9, (
        f"top-{k} margin {margins.min():.3e} is within BLAS noise width; "
        "the graded rows must go back to the fold path")


def test_broadcast_verdict_cache(spark, monkeypatch):
    """r13: _broadcast_if_small memoizes the count-verified broadcast
    verdict per (session, plan) — the second invocation of the same plan
    must not run the probe job."""
    from pyspark.sql import DataFrame

    from go_iceberg_spark.operators import similarity as S

    # a tiny-output frame whose Catalyst estimate is inflated far past the
    # cap: without CBO a Filter inherits its child's size estimate, and a
    # 20M-row range estimates ~160 MB
    q = spark.range(0, 20_000_000).filter(F.col("id") < 3)
    est = int(q._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    assert est > S.MAX_BROADCAST_QUERY_BYTES, "fixture must take the probe path"

    S._BCAST_VERDICTS.clear()
    hinted = S._broadcast_if_small(q)
    assert hinted is not q  # verified small -> hinted
    assert len(S._BCAST_VERDICTS) == 1 and all(S._BCAST_VERDICTS.values())

    def boom(self):  # pragma: no cover - must not be called
        raise AssertionError("probe job ran despite cached verdict")

    monkeypatch.setattr(DataFrame, "count", boom)
    hinted2 = S._broadcast_if_small(q)
    assert hinted2 is not q


def test_minhash_nondeterministic_input_pinned(spark):
    """r13: minhash_lsh_pairs evaluates its input lineage twice (signature
    pass + verification pass); a NONDETERMINISTIC lineage is pinned with an
    eager checkpoint first so both passes see the same rows. The planted
    near-dups must come out exactly despite the rand() in the plan."""
    rows = [Row(doc_id=i, text=f"red green blue cyan {i} magenta yellow black white")
            for i in range(30)]
    rows += [Row(doc_id=500 + i, text=rows[i].text) for i in range(5)]
    df = spark.createDataFrame(rows)
    nd = df.select("doc_id", F.when(F.rand(7) < 2.0, F.col("text")).alias("text"))
    assert not nd._jdf.queryExecution().analyzed().deterministic()

    from go_iceberg_spark.operators.dedup import minhash_lsh_pairs

    got = sorted((r.id_a, r.id_b) for r in
                 minhash_lsh_pairs(nd, "doc_id", "text", n=3, mode="word",
                                   threshold=0.99).collect())
    assert got == [(i, 500 + i) for i in range(5)]
