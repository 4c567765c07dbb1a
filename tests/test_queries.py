"""Driver-contract gate, run locally (SURVEY §5.6): every oracled query
must match DuckDB bit-exactly at sf0.001; rows-only queries must run and
satisfy their structural invariants."""

import numpy as np
import pytest

import __spark_entry__ as entrymod
from tests.oracle_util import compare, duck_con

SF = "/root/testdata/sf0.001"

Q = entrymod.queries()
O = entrymod.oracle_sql()
ORACLED = sorted(n for n in Q if n in O)
ROWS_ONLY = sorted(n for n in Q if n not in O)


@pytest.fixture(scope="module")
def con():
    return duck_con(SF)


# every rows-only query must be HERE and must have a dedicated local
# verification test (an explicit allowlist beats a count: adding an
# unverified query fails loudly with its name)
ROWS_ONLY_ALLOWED = {
    "agg_approx_count_distinct",   # HLL internals; closeness test
    "agg_approx_percentile",       # GK sketch; test_approx_percentile_close
    "ann_lsh_bucketed",            # hyperplane constants; recall test
    "crawl_seen_bloom_probe",      # bloom bit math; test_bloom
    "hash_xxhash64",               # Spark-only hash; pure-py twin test
    "icebergish_time_travel",      # engine-side snapshots; test_storage
    "multimodal_features",         # numpy features; invariant tests
}


def test_inventory_size():
    assert len(ORACLED) >= 50
    assert set(ROWS_ONLY) == ROWS_ONLY_ALLOWED, (
        f"unexpected rows-only queries: "
        f"{set(ROWS_ONLY) ^ ROWS_ONLY_ALLOWED}")


def test_oracle_types_no_hugeint(con):
    """DuckDB promotes SUM over BIGINT to HUGEINT, which its pandas
    bridge renders as float64 — the driver then hashes `N.0` against
    Spark's `N` (the only red CORRECTNESS rows ever produced, r3).
    Lint every oracle's BOUND output schema (DESCRIBE binds without
    executing) so the next such type promotion fails here first."""
    bad = {}
    for name in ORACLED:
        types = [row[1] for row in
                 con.execute(f"DESCRIBE {O[name]}").fetchall()]
        hug = [ty for ty in types if "HUGEINT" in ty.upper()]
        if hug:
            bad[name] = hug
    assert not bad, f"oracles with HUGEINT output columns: {bad}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"url", "text_md5", "n_links"} <= set(df.columns)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, con, name):
    compare(Q[name](spark, SF), con, O[name], name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    assert Q[name](spark, SF).count() >= 0


def test_lsh_recall_vs_bruteforce(spark):
    """ann_lsh_bucketed (6 tables × 4 sign bits, multi-probe at Hamming
    distance 1) must reach a fixed quantitative recall bar vs exact
    brute force — not just 'found something'.  Measured 0.975 at
    sf0.001/0.01/0.1; the bar is 0.9 to stay robust to testdata
    regeneration."""
    bf = {(r["query_id"], r["neighbor_id"])
          for r in Q["ann_bruteforce_topk"](spark, SF).collect()}
    lsh = {(r["query_id"], r["neighbor_id"])
           for r in Q["ann_lsh_bucketed"](spark, SF).collect()}
    assert lsh, "LSH returned nothing"
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.9, f"recall@5 {recall:.3f} below 0.9 bar"


def test_lsh_bucket_cap_bounds_pairs(spark):
    """A degenerate (band,bh) bucket must explode at most cap·(cap−1)/2
    pairs — the cap keeps the LOWEST doc_ids deterministically, and
    normal buckets are untouched."""
    from sparkcrawl.textops import _lsh_pairs_from_bands
    rows = ([(i, 0, "degenerate") for i in range(100)]
            + [(200, 1, "normal"), (201, 1, "normal")])
    bands = spark.createDataFrame(rows, "doc_id long, band int, bh string")
    pairs = {(r.doc_a, r.doc_b)
             for r in _lsh_pairs_from_bands(bands, cap=10).collect()}
    bucket0 = {p for p in pairs if p[0] < 200}
    assert len(bucket0) == 45  # 10·9/2, not 100·99/2
    assert max(b for _, b in bucket0) == 9  # lowest doc_ids survive the cap
    assert (200, 201) in pairs  # sub-cap bucket unaffected


def test_lsh_capped_buckets_signal(spark):
    """The over-cap bucket report: empty at the default cap on testdata,
    non-empty once the cap is tightened below real bucket sizes."""
    from sparkcrawl.textops import lsh_capped_buckets
    assert lsh_capped_buckets(spark, SF).count() == 0
    assert lsh_capped_buckets(spark, SF, cap=1).count() > 0


def test_cosine_bits_refine(spark):
    """Each extra blocking bit refines the bucketing: the pair set at
    bits=8 must be a subset of the pair set at the oracle default 6 —
    widening bits for scale can only shrink blocks, never corrupt."""
    from sparkcrawl.textops import dedup_embedding_cosine
    p6 = {(r.vec_a, r.vec_b)
          for r in dedup_embedding_cosine(spark, SF, bits=6).collect()}
    p8 = {(r.vec_a, r.vec_b)
          for r in dedup_embedding_cosine(spark, SF, bits=8).collect()}
    assert p6, "default blocking found no pairs on testdata"
    assert p8 <= p6


def test_lang_id_text_matches_spark(spark):
    """lang_id_text (the pure twin the HTTP fetch path uses at ingest)
    must stay in lockstep with the text_lang_id query heuristic."""
    from sparkcrawl.textops import lang_id_text
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text").collect()
    want = {r["doc_id"]: lang_id_text(r["text"]) for r in docs}
    got = {r["doc_id"]: r["lang_pred"]
           for r in Q["text_lang_id"](spark, SF).collect()}
    assert got == want
    assert len(set(want.values())) >= 2  # corpus actually spans langs
    assert lang_id_text("the cat and the dog") == "en"
    assert lang_id_text("el perro y los gatos") == "es"
    assert lang_id_text("der Hund und die Katze") == "de"
    assert lang_id_text("中文网页") == "zh"
    assert lang_id_text("") == "und" and lang_id_text(None) == "und"


def test_bloom_probe_no_false_negatives(spark):
    """Exactness contract: every even doc (inserted) must probe maybe_seen."""
    rows = Q["crawl_seen_bloom_probe"](spark, SF).collect()
    seen = {r["doc_id"]: r["maybe_seen"] for r in rows}
    misses = [d for d, s in seen.items() if d % 2 == 0 and not s]
    assert not misses
    # false-positive rate on odd docs stays small
    odd = [s for d, s in seen.items() if d % 2 == 1]
    assert np.mean(odd) < 0.1


def test_approx_count_distinct_close(spark, con):
    got = Q["agg_approx_count_distinct"](spark, SF).collect()[0]
    want = con.execute(
        "SELECT COUNT(DISTINCT l_partkey) p, COUNT(DISTINCT l_orderkey) o "
        "FROM lineitem").fetchone()
    assert abs(got["approx_parts"] - want[0]) / want[0] < 0.1
    assert abs(got["approx_orders"] - want[1]) / want[1] < 0.1


def test_approx_percentile_close(spark, con):
    """GK-sketch estimates must land within 2% of the exact interpolated
    percentiles for every priority group."""
    got = {r["o_orderpriority"]: (r["ap50"], r["ap90"])
           for r in Q["agg_approx_percentile"](spark, SF).collect()}
    want = con.execute(
        "SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) p50, "
        "quantile_cont(o_totalprice, 0.9) p90 FROM orders GROUP BY 1"
    ).fetchall()
    assert len(got) == len(want) > 0
    for prio, p50, p90 in want:
        assert abs(got[prio][0] - p50) / p50 < 0.02, (prio, got[prio], p50)
        assert abs(got[prio][1] - p90) / p90 < 0.02, (prio, got[prio], p90)


def test_bpe_matches_pure_python_reference(spark):
    """Property test: the in-row greedy fold must agree with a direct
    pure-Python greedy longest-match tokenizer on 300 pseudorandom
    words — vocab-piece concatenations (worst case for longest-match
    boundaries) and random letter strings."""
    import random

    from pyspark.sql import functions as F

    from sparkcrawl.textops import BPE_VOCAB, _bpe_vocab_row, _bpe_word_ntok

    def py_ntok(w):
        pos, n = 0, 0
        while pos < len(w):
            best = 1
            for p in BPE_VOCAB:
                if len(p) > best and w.startswith(p, pos):
                    best = len(p)
            pos += best
            n += 1
        return n

    rng = random.Random(42)
    words = [""]
    for _ in range(300):
        if rng.random() < 0.5:
            words.append("".join(rng.choice(BPE_VOCAB)
                                 for _ in range(rng.randint(1, 3))))
        else:
            words.append("".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                                 for _ in range(rng.randint(1, 12))))
    df = spark.createDataFrame(list(enumerate(words)), "i long, w string")
    got = {r["i"]: r["n"] for r in
           df.crossJoin(_bpe_vocab_row(spark))
           .select("i", _bpe_word_ntok(F.col("w")).alias("n")).collect()}
    bad = [(words[i], got[i], py_ntok(words[i]))
           for i in range(len(words)) if got[i] != py_ntok(words[i])]
    assert not bad, bad[:5]


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=2 of 16 cells must reach a fixed recall bar vs
    exact brute force (the probed cells cover the true neighborhood for
    most queries on this corpus)."""
    bf = {(r["query_id"], r["neighbor_id"])
          for r in Q["ann_bruteforce_topk"](spark, SF).collect()}
    ivf = {(r["query_id"], r["neighbor_id"])
           for r in Q["ann_ivf_topk"](spark, SF).collect()}
    assert ivf, "IVF returned nothing"
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.5, f"IVF recall@5 {recall:.3f} below 0.5 bar"


def test_ivf_trained_recall_and_assignment_quality(spark):
    """The k-means-trained quantizer must (a) hold the same recall bar
    as the seed quantizer and (b) actually FIT the data: the mean
    cosine between each vector and its assigned centroid must be
    strictly higher with trained centroids than with the seed vectors."""
    from pyspark.sql import functions as F

    from sparkcrawl.registry import t as _t
    from sparkcrawl.textops import (_assign_cells, _cos_col, _ivf_centroids,
                                    kmeans_centroid_table)

    bf = {(r["query_id"], r["neighbor_id"])
          for r in Q["ann_bruteforce_topk"](spark, SF).collect()}
    tr = {(r["query_id"], r["neighbor_id"])
          for r in Q["ann_ivf_trained"](spark, SF).collect()}
    assert tr, "trained IVF returned nothing"
    recall = len(bf & tr) / len(bf)
    assert recall >= 0.5, f"trained recall@5 {recall:.3f} below 0.5 bar"

    e = _t(spark, SF, "embeddings")

    def mean_assigned_cos(cents):
        asg = _assign_cells(e, cents)
        cdf = cents.select(F.col("cid").alias("cell"),
                           F.col("ce").alias("_ce"))
        return (asg.join(F.broadcast(cdf), "cell")
                .agg(F.avg(_cos_col(F.col("embedding"), F.col("_ce"))))
                .first()[0])

    seed = mean_assigned_cos(_ivf_centroids(e))
    trained = mean_assigned_cos(kmeans_centroid_table(spark, SF))
    assert trained > seed, (trained, seed)


def test_bpe_greedy_segmentation_known_words(spark):
    """Frozen-vocab greedy longest-match must produce the hand-derived
    segmentations: whole-vocab words are 1 token, 'windo'+'w' is 2,
    out-of-vocab letters fall back to singles, and the longest match
    wins at every position."""
    from pyspark.sql import functions as F

    from sparkcrawl.textops import _bpe_vocab_row, _bpe_word_ntok

    df = spark.createDataFrame(
        [("stream",), ("window",), ("xyz",), ("orders",), ("tab",),
         ("",)], "w string")
    got = {r["w"]: r["n"] for r in
           df.crossJoin(_bpe_vocab_row(spark))
           .select("w", _bpe_word_ntok(F.col("w")).alias("n")).collect()}
    assert got == {"stream": 1,   # 'stream' ∈ vocab beats 'st'+'ream'
                   "window": 2,   # 'windo' + fallback 'w'
                   "xyz": 3,      # all single-char fallbacks
                   "orders": 2,   # 'order' + 's'
                   "tab": 2,      # 'ta' + 'b'
                   "": 0}, got


def test_bpe_oracle_position_bound_holds(spark):
    """The BPE oracle's position grid stops at BPE_MAXW: a corpus word
    longer than that would silently VANISH from the oracle's recursive
    walk (no bests rows past position BPE_MAXW) while the Spark fold
    counts it — assert the bound so a corpus change fails loudly here
    instead of as a confusing red driver row."""
    from pyspark.sql import functions as F

    from sparkcrawl.registry import t as _t
    from sparkcrawl.textops import BPE_MAXW

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        longest = (_t(spark, sf, "documents")
                   .select(F.explode(F.split("text", " ")).alias("w"))
                   .agg(F.max(F.length("w"))).first()[0])
        assert longest <= BPE_MAXW, (sf, longest)


def test_bpe_vocab_scale_sublinear(spark):
    """The greedy matcher probes a piece MAP with ≤ max-piece-length
    lookups per position, so per-doc cost must be near-FLAT in vocab
    size (the r5 array scan was linear: a 119× bigger vocab meant ~119×
    the innermost loop).  Run the same corpus fold under the 42-piece
    demo vocab and a 5,000-piece synthetic vocab and bound the
    wall-time ratio; also re-verify greedy correctness against the
    pure-Python reference under the big vocab."""
    import random
    import time

    from pyspark.sql import functions as F

    from sparkcrawl.registry import t as _t
    from sparkcrawl.textops import BPE_VOCAB, _bpe_vocab_row, _bpe_word_ntok

    rng = random.Random(9)
    big = set(BPE_VOCAB)
    while len(big) < 5000:
        big.add("".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                        for _ in range(rng.randint(2, 8))))
    big = sorted(big)
    maxp_big = max(len(p) for p in big)

    def corpus_fold(vocab, maxp):
        d = _t(spark, SF, "documents").select("doc_id", "text")
        words = F.split("text", " ")
        total = F.aggregate(
            words, F.lit(0).cast("bigint"),
            lambda acc, w: acc + _bpe_word_ntok(w, maxp).cast("bigint"))
        (d.crossJoin(_bpe_vocab_row(spark, vocab))
         .select("doc_id", total.alias("n"))
         .write.format("noop").mode("overwrite").save())

    corpus_fold(BPE_VOCAB, max(len(p) for p in BPE_VOCAB))  # warm
    t0 = time.time()
    corpus_fold(BPE_VOCAB, max(len(p) for p in BPE_VOCAB))
    t_small = time.time() - t0
    t0 = time.time()
    corpus_fold(big, maxp_big)
    t_big = time.time() - t0
    # 119× the vocab; allow generous noise+maxp headroom, never ~119×
    assert t_big <= 3.0 * t_small + 1.0, (t_small, t_big)

    # correctness under the big vocab (greedy longest-match reference)
    bigset = set(big)

    def py_ntok(w):
        pos, n = 0, 0
        while pos < len(w):
            best = 1
            for L in range(min(maxp_big, len(w) - pos), 1, -1):
                if w[pos:pos + L] in bigset:
                    best = L
                    break
            pos += best
            n += 1
        return n

    words = ["".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                     for _ in range(rng.randint(1, 14)))
             for _ in range(150)] + [big[7] + big[4242] + "q", ""]
    df = spark.createDataFrame(list(enumerate(words)), "i long, w string")
    got = {r["i"]: r["n"] for r in
           df.crossJoin(_bpe_vocab_row(spark, big))
           .select("i", _bpe_word_ntok(F.col("w"), maxp_big).alias("n"))
           .collect()}
    bad = [(words[i], got[i], py_ntok(words[i]))
           for i in range(len(words)) if got[i] != py_ntok(words[i])]
    assert not bad, bad[:5]


def test_pq_training_reduces_quantization_error(spark):
    """One k-means update over each subspace must cut total quantization
    error well below the seed codebooks (measured 611→421 on sf0.001 —
    pin at ≤0.85×)."""
    from pyspark.sql import functions as F

    from sparkcrawl.registry import t as _t
    from sparkcrawl.textops import (_pq_best, _pq_cb_row, _pq_subvecs,
                                    pq_codebooks)

    e = _t(spark, SF, "embeddings").select("vec_id", "embedding")
    sv = _pq_subvecs(e)

    def total_qerr(n_updates):
        cb = pq_codebooks(spark, SF, n_updates=n_updates)
        return (sv.crossJoin(_pq_cb_row(cb))
                .select(_pq_best(F.col("svec"), F.col("sub"))["d"]
                        .alias("d"))
                .agg(F.sum("d")).first()[0])

    seed, trained = total_qerr(0), total_qerr(1)
    assert trained <= 0.85 * seed, (trained, seed)


def test_ivfpq_adc_returns_near_neighbors(spark):
    """ADC over PQ codes must rank genuinely near candidates first: for
    EVERY query, the mean exact L2 distance of the ADC top-5 is below
    the mean over all probed candidates (random picks would sit at
    1.0×; measured 0.81–0.95× on this corpus — synthetic unstructured
    embeddings are PQ's worst case, so the pin is direction + margin on
    the mean, not a recall bar)."""
    import numpy as np

    from sparkcrawl.registry import t as _t
    from sparkcrawl.textops import (_assign_cells, _ivf_centroids,
                                    _ivf_probes)

    e = _t(spark, SF, "embeddings").select("vec_id", "embedding")
    asg = {r["vec_id"]: r["cell"]
           for r in _assign_cells(e, _ivf_centroids(e))
           .select("vec_id", "cell").collect()}
    probes = {}
    for r in _ivf_probes(e).select("query_id", "cell").collect():
        probes.setdefault(r["query_id"], set()).add(r["cell"])
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in e.collect()}
    top = {}
    for r in Q["ann_ivfpq_topk"](spark, SF).collect():
        top.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ratios = []
    for q, cells in probes.items():
        dists = {v: float(((emb[v] - emb[q]) ** 2).sum())
                 for v, c in asg.items() if c in cells and v != q}
        mean_all = np.mean(list(dists.values()))
        ratios.append(np.mean([dists[v] for v in top[q]]) / mean_all)
    assert all(r < 1.0 for r in ratios), ratios
    assert np.mean(ratios) < 0.92, ratios


def test_residual_pq_wins_when_data_clusters(spark):
    """The residual-PQ mechanism: when vectors cluster around the coarse
    centroids (real-embedding geometry), quantizing residuals with the
    SAME M×K budget must cut total quantization error to a fraction of
    raw-vector PQ's.  The repo corpus is near-uniform (there the
    benefit provably inverts: Var(v−c) ≈ Var(v)+Var(c) for weakly
    correlated v, c — measured 1.34×), so this test constructs
    clustered data: vectors 0..15 are the centers, the rest are
    center + small noise."""
    import numpy as np
    from pyspark.sql import functions as F

    from sparkcrawl.textops import (IVF_N_CELLS, PQ_RESID_SEED_LO,
                                    _ivf_centroids, _pq_best, _pq_cb_row,
                                    _pq_subvecs, _pq_train, _resid_df)

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((IVF_N_CELLS, 64))
    rows = []
    for i in range(400):
        v = (centers[i] if i < IVF_N_CELLS
             else centers[i % IVF_N_CELLS]
             + 0.05 * rng.standard_normal(64))
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def total_qerr(svdf, cb):
        return (svdf.crossJoin(_pq_cb_row(cb))
                .select(_pq_best(F.col("svec"), F.col("sub"))["d"]
                        .alias("d"))
                .agg(F.sum("d")).first()[0])

    sv = _pq_subvecs(df)
    plain = total_qerr(sv, _pq_train(sv, 0, 1))
    rsv = _pq_subvecs(_resid_df(df, _ivf_centroids(df)), "rv")
    resid = total_qerr(rsv, _pq_train(rsv, PQ_RESID_SEED_LO, 1))
    assert resid < 0.5 * plain, (resid, plain)


def test_repetition_filter_splits_corpus(spark):
    """The frozen Gopher-style thresholds must actually split the
    corpus — a gate that keeps (or drops) everything tests nothing."""
    rows = Q["text_repetition_filter"](spark, SF).collect()
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows), f"degenerate gate: {kept}/{len(rows)} kept"


def test_chunk_split_reconstructs_documents(spark):
    """Concatenating a doc's chunks in chunk_id order must reproduce the
    original text exactly — no word lost or duplicated at boundaries."""
    rows = Q["text_chunk_split"](spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk"]))
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF}/documents.parquet").collect()}
    assert set(by_doc) == set(docs)
    for d, chunks in by_doc.items():
        rebuilt = " ".join(c for _, c in sorted(chunks))
        assert rebuilt == docs[d], f"doc {d} chunk reconstruction differs"


def test_span_winnow_non_degenerate(spark):
    """dedup_span_winnow must actually split the corpus: some docs share
    verbatim spans (the corpus contains near-dups), some don't."""
    rows = Q["dedup_span_winnow"](spark, SF).collect()
    shared = sum(1 for r in rows if r["n_shared"] > 0)
    assert 0 < shared < len(rows), f"{shared}/{len(rows)} shared"
    for r in rows:
        assert 0 <= r["n_shared"] <= r["n_fps"]


def test_dataset_mix_targets_smallest_stratum(spark):
    """Every stratum's kept count lands near the smallest stratum's
    size (rate sampling: binomial noise around the ppm target), and the
    smallest stratum keeps everything."""
    rows = Q["text_dataset_mix"](spark, SF).collect()
    m = min(r["n_docs"] for r in rows)
    for r in rows:
        if r["n_docs"] == m:
            assert r["mix_ppm"] == 1000000 and r["n_kept"] == r["n_docs"]
        assert r["n_kept"] <= r["n_docs"]
        # 5-sigma binomial bound around the target
        import math
        sd = math.sqrt(max(r["n_docs"], 1)) / 2
        assert abs(r["n_kept"] - m * 1.0) <= 5 * sd + 3, rows


def test_merge_upsert_actions_partition(spark):
    """Every target row appears exactly once tagged update/keep; every
    shifted source key appears as insert; no other actions exist."""
    rows = Q["merge_upsert"](spark, SF).collect()
    actions = {}
    for r in rows:
        actions.setdefault(r["action"], set()).add(r["k"])
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert set(actions) <= {"update", "keep", "insert"}
    assert len(set(actions.get("update", ()))
               | set(actions.get("keep", ()))) == n_cust
    assert actions.get("insert"), "no insert branch exercised"
    assert all(k >= 1000000 for k in actions["insert"])
