"""Invariant tests for the round-3 training-data operators (repetition
signals, tf-idf top-k, composite quality gate, SemDeDup).  Value-level
correctness is carried by the driver's DuckDB oracle gate
(tools/check_correctness.py); these pin the structural contracts the
oracle's hash compare cannot express."""

from __future__ import annotations

import pytest

from document_processor_spark.operators import curation, dedup, text_analysis

SF_DIR = "/root/testdata/sf0.001"


def test_quality_gate_reasons_consistent(spark):
    rows = curation.q_cur_quality_gate(spark, SF_DIR).collect()
    assert rows
    seen_pass = seen_fail = False
    for r in rows:
        reasons = set(r["reasons"].split(",")) if r["reasons"] else set()
        assert r["passed"] == (not reasons)
        seen_pass |= r["passed"]
        seen_fail |= not r["passed"]
        # every coded reason must match its metric, and vice versa
        assert ("min_words" in reasons) == (
            r["n_words"] < curation.GATE_MIN_WORDS)
        assert ("stopwords" in reasons) == (
            r["stopword_ratio"] < curation.GATE_STOP_MIN)
        assert ("repetition" in reasons) == (
            r["dup_bigram_frac"] > curation.GATE_DUP_BIGRAM_MAX)
    assert seen_pass and seen_fail, "gate must exercise both outcomes"


def test_tfidf_topk_ranks_and_order(spark):
    rows = text_analysis.q_tfidf_topk(spark, SF_DIR).collect()
    assert rows
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= text_analysis.TFIDF_TOP_K
        scores = [r["tfidf"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(r["tf"] >= 1 for r in rs)


def test_repetition_fractions_bounded(spark):
    rows = text_analysis.q_repetition(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["n_words"] > 0:
            assert 0.0 <= r["dup_word_frac"] <= 1.0
            assert 0.0 <= r["top_word_frac"] <= 1.0
            # the mode's share can't be below a uniform distribution's
            assert r["top_word_frac"] >= round(1.0 / r["n_words"], 4) - 1e-9
        if r["dup_bigram_frac"] is not None:
            assert 0.0 <= r["dup_bigram_frac"] <= 1.0


def test_semantic_dedup_prunes_later_in_same_cell(spark):
    rows = dedup.q_dedup_semantic(spark, SF_DIR).collect()
    assert rows
    cell = {r["vec_id"]: r["cent_id"] for r in rows}
    kept = [r for r in rows if r["kept"]]
    pruned = [r for r in rows if not r["kept"]]
    assert kept, "at least the cell-min member survives"
    for r in rows:
        assert r["kept"] == (r["dup_of"] is None)
    for r in pruned:
        assert r["dup_of"] < r["vec_id"], "keeper is always the earlier id"
        assert cell[r["dup_of"]] == r["cent_id"], "prune never crosses cells"


def test_subdoc_dedup_removes_dup_chunks_preserves_order(spark):
    out = {r["doc_id"]: r
           for r in dedup.q_dedup_subdoc(spark, SF_DIR).collect()}
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").collect())
    assert len(out) == len(docs)

    # rebuild the corpus-wide chunk counts independently
    def chunks(text):
        w = text.split(" ")
        return [" ".join(w[i:i + dedup.CHUNK_WORDS])
                for i in range(0, len(w), dedup.CHUNK_WORDS)]

    counts: dict[str, int] = {}
    for d in docs:
        for c in chunks(d["text"]):
            counts[c] = counts.get(c, 0) + 1

    saw_removal = False
    for d in docs:
        cs = chunks(d["text"])
        survivors = [c for c in cs if counts[c] < dedup.CHUNK_DUP_T]
        r = out[d["doc_id"]]
        # surviving chunks reassemble in original order
        assert r["clean_text"] == " ".join(survivors)
        assert r["n_chunks"] == len(cs)
        assert r["n_kept"] == len(survivors)
        saw_removal |= len(survivors) < len(cs)
    assert saw_removal, "fixture corpus must exercise actual removal"


def test_kmeans_objective_monotone(spark):
    """Lloyd's algorithm must not increase the mean squared distance:
    each extra (assign, update) round reweights cells toward their means.
    Also pins that training MOVES assignments vs the raw seed sample."""
    from document_processor_spark.operators import ann
    means = []
    assigns = []
    for iters in (0, 1, 2):
        rows = ann.q_ann_kmeans_train(spark, SF_DIR, iters=iters).collect()
        assert len(rows) > 0
        means.append(sum(r["dist"] for r in rows) / len(rows))
        assigns.append({r["vec_id"]: r["cent_id"] for r in rows})
    assert means[0] >= means[1] >= means[2]
    assert means[2] < means[0], "training must improve the objective"
    assert assigns[0] != assigns[2], "assignments must move"


def test_ivf_variants_recall_floor(spark):
    """ANN quality canary: both IVF variants must recover a meaningful
    share of the exact brute-force top-k.  Measured recall@5 on the
    near-random synthetic embeddings (nprobe=4 of ~17 cells): sampled
    0.40, trained 0.58 at sf0.001 — a probe bug that searched the wrong
    cells lands near zero, which is what the floor guards; it is not a
    quality target on this corpus.  Training must also not do WORSE than
    a coin-flip fraction of the sampled variant."""
    from document_processor_spark.operators import ann
    truth: dict = {}
    for r in ann.q_ann_bruteforce_topk(spark, SF_DIR).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    total = sum(len(v) for v in truth.values())
    recalls = {}
    for fn in (ann.q_ann_ivf_topk, ann.q_ann_ivf_trained_topk):
        got: dict = {}
        for r in fn(spark, SF_DIR).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        recalls[fn.__name__] = hits / total
        assert recalls[fn.__name__] >= 0.3, \
            f"{fn.__name__} recall@{ann.TOP_K} = {recalls[fn.__name__]}"
    assert (recalls["q_ann_ivf_trained_topk"]
            >= 0.5 * recalls["q_ann_ivf_topk"])


def test_lm_xent_contract(spark):
    """Reference docs are excluded, the floor is ln(N+V) - ln(c_max+1),
    the ceiling is ln(N+V) (all-unseen doc), and both flag outcomes
    occur at the committed threshold."""
    rows = text_analysis.q_lm_xent(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % text_analysis.LM_REF_MOD != 0
        assert r["n_bigrams"] >= 1
        assert r["high_xent"] == (r["xent"] >= text_analysis.LM_XENT_T)
    # ceiling: a doc of entirely unseen bigrams scores exactly ln(N+V);
    # nothing can exceed it
    ceil = max(r["xent"] for r in rows)
    assert all(r["xent"] <= ceil for r in rows)
    assert ceil < 25  # sanity: ln(N+V) of the fixture corpus is small
    assert min(r["xent"] for r in rows) > 0
    flags = {r["high_xent"] for r in rows}
    assert flags == {True, False}, (
        f"threshold {text_analysis.LM_XENT_T} must split the fixture; "
        f"xent range [{min(r['xent'] for r in rows)}, {ceil}]")


def test_dsir_log_ratio_contract(spark):
    """Reference docs excluded; a reference-like doc scores above a
    gibberish doc; selection matches the threshold exactly."""
    rows = curation.q_cur_dsir_select(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % 7 != 0  # LM_REF_MOD slice held out
        assert r["n_bigrams"] >= 1
        assert r["selected"] == (r["log_ratio"] >= curation.DSIR_T)
    # the weight must discriminate: the fixture corpus has docs on both
    # sides of the target/raw divide
    assert {r["selected"] for r in rows} == {True, False}


def test_pq_adc_contract(spark):
    """PQ/ADC structure: dense ranks ascending in adc, no self-match,
    non-negative distances, and a recall canary vs EXACT L2 top-k (the
    metric ADC approximates).  Measured recall@5 on the near-uniform
    synthetic embeddings — PQ's worst case, no subspace cluster
    structure — is ~0.18 at sf0.001; the floor guards against a lookup
    bug (wrong code/table indexing lands at the ~0.01 random baseline),
    not a quality target."""
    from document_processor_spark.operators import ann
    rows = ann.q_ann_pq_adc_topk(spark, SF_DIR).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r["vec_id"] != r["query_id"]
        assert r["adc_dist"] >= 0.0
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        dists = [r["adc_dist"] for r in rs]
        assert dists == sorted(dists)
    # exact-L2 truth via the same embeddings
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    e = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
         .select("vec_id", F.transform(
             "embedding", lambda x: x.cast("double")).alias("v")))
    qs = e.filter(F.col("vec_id") % ann.QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    d = F.aggregate(F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, x: acc + x)
    w = W.partitionBy("query_id").orderBy("d", "vec_id")
    truth_rows = (e.crossJoin(F.broadcast(qs))
                  .filter(F.col("vec_id") != F.col("query_id"))
                  .select("query_id", "vec_id", d.alias("d"))
                  .withColumn("r", F.row_number().over(w))
                  .filter(F.col("r") <= ann.TOP_K).collect())
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {q: {r["vec_id"] for r in rs} for q, rs in by_q.items()}
    total = sum(len(v) for v in truth.values())
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    assert hits / total >= 0.1, f"PQ recall collapsed: {hits / total}"


def test_shard_export_contract(spark):
    """Every document lands in exactly one shard; positions are dense
    from 1 within each shard; token offsets telescope (each row's offset
    = previous offset + previous tokens); all shards are populated."""
    rows = curation.q_cur_shard_export(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(rows) == docs.count()
    assert len({r["doc_id"] for r in rows}) == len(rows)
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == set(range(curation.N_SHARDS))
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["pos"])
        assert [r["pos"] for r in rs] == list(range(1, len(rs) + 1))
        off = 0
        for r in rs:
            assert r["token_offset"] == off
            off += r["tokens"]


def test_pq_lambda_sibling_isolation(spark):
    """Regression pin for the workaround in ann._pq_subspaces: sibling
    HOF lambdas differing only in a captured Python constant mis-bind in
    Spark 4.1 (element k of every transform takes sibling k's constant),
    even when first analyzed as separate columns (project-collapse
    recreates the broken shape).  The nested-lambda structure must yield
    cbs[m][k] == seed_k.v[m*SUB : (m+1)*SUB] exactly."""
    from pyspark.sql import functions as F
    from document_processor_spark.operators import ann
    e = ann._emb(spark, SF_DIR).select("vec_id", "v")
    sv = (e.filter(F.col("vec_id") % ann.PQ_SEED_MOD == 0)
          .groupBy().agg(F.array_sort(
              F.collect_list(F.struct("vec_id", "v"))).alias("sv"))
          .collect()[0]["sv"])
    cbs = ann._pq_codebook(e).collect()[0]["cbs"]
    assert len(cbs) == ann.PQ_M and len(cbs[0]) == len(sv)
    for m in range(ann.PQ_M):
        for k, s in enumerate(sv):
            assert cbs[m][k] == list(
                s["v"][m * ann.PQ_SUB:(m + 1) * ann.PQ_SUB]), (m, k)


def test_entropy_contract(spark):
    """0 <= H <= ln(n_types) (uniform bound); H == 0 iff one type;
    n_types <= n_words; TTR in (0, 1]."""
    import math
    rows = text_analysis.q_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_types"] <= r["n_words"]
        assert 0.0 <= r["word_entropy"] <= round(
            math.log(r["n_types"]), 4) + 1e-9
        if r["n_types"] == 1:
            assert abs(r["word_entropy"]) == 0.0
        assert 0.0 < r["type_token_ratio"] <= 1.0
        # Spark ROUND is half-up, Python round() banker's — compare
        # with a half-ulp tolerance at 4 decimals
        assert abs(r["type_token_ratio"]
                   - r["n_types"] / r["n_words"]) <= 5e-5


def test_temperature_mix_contract(spark):
    """The smallest language keeps everything (p=1); larger languages
    keep a sqrt-flattened fraction; selection matches the hash test."""
    rows = curation.q_cur_temperature_mix(spark, SF_DIR).collect()
    assert rows
    n_min = min(r["n_lang"] for r in rows)
    for r in rows:
        expected = int((n_min / r["n_lang"])
                       ** (1.0 - curation.MIX_ALPHA)
                       * curation.SAMPLE_MOD)
        assert abs(r["keep_scaled"] - expected) <= 1
        if r["n_lang"] == n_min:
            assert r["keep_scaled"] == curation.SAMPLE_MOD
            assert r["selected"]
    # the flattening must bite: at least one language below full keep,
    # and its realized rate should be within a loose band of keep_scaled
    partial = [r for r in rows if r["n_lang"] > n_min]
    assert partial
    by_lang: dict = {}
    for r in partial:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rate = sum(r["selected"] for r in rs) / len(rs)
        want = rs[0]["keep_scaled"] / curation.SAMPLE_MOD
        assert abs(rate - want) < 0.2, (lang, rate, want)


def test_ivf_pq_contract(spark):
    """IVF-PQ structure + recall canary vs exact L2 (measured ~0.2 at
    sf0.001 on the worst-case uniform embeddings; the floor guards a
    probe/lookup bug landing at the ~0.01 random baseline).  Also pins
    the candidate-bounding property: every result must come from one of
    the query's probed cells."""
    from pyspark.sql import functions as F
    from document_processor_spark.operators import ann
    rows = ann.q_ann_ivf_pq_topk(spark, SF_DIR).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        assert r["vec_id"] != r["query_id"]
        assert r["adc_dist"] >= 0.0
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        dists = [r["adc_dist"] for r in rs]
        assert dists == sorted(dists)
    # recall floor vs exact L2
    e = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
         .select("vec_id", F.transform(
             "embedding", lambda x: x.cast("double")).alias("v")))
    qs = e.filter(F.col("vec_id") % ann.QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    from pyspark.sql import Window as W
    d = F.aggregate(F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, x: acc + x)
    w = W.partitionBy("query_id").orderBy("d", "vec_id")
    truth_rows = (e.crossJoin(F.broadcast(qs))
                  .filter(F.col("vec_id") != F.col("query_id"))
                  .select("query_id", "vec_id", d.alias("d"))
                  .withColumn("r", F.row_number().over(w))
                  .filter(F.col("r") <= ann.TOP_K).collect())
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {q: {r["vec_id"] for r in rs} for q, rs in by_q.items()}
    total = sum(len(v) for v in truth.values())
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    assert hits / total >= 0.1, f"IVF-PQ recall collapsed: {hits / total}"


def test_funnel_stage_invariants(spark):
    """Stage gating: timestamps exist exactly up to the reached stage and
    are ordered view <= click <= purchase; the duration column only
    exists at stage 3 and telescopes."""
    from document_processor_spark.operators import relational
    rows = relational.q_funnel(spark, SF_DIR).collect()
    assert rows
    stages = set()
    for r in rows:
        s = r["funnel_stage"]
        stages.add(s)
        assert (r["view_us"] is not None) == (s >= 1)
        assert (r["click_us"] is not None) == (s >= 2)
        assert (r["purchase_us"] is not None) == (s >= 3)
        if s >= 2:
            assert r["view_us"] <= r["click_us"]
        if s >= 3:
            assert r["click_us"] <= r["purchase_us"]
            assert r["view_to_purchase_us"] == (
                r["purchase_us"] - r["view_us"])
        else:
            assert r["view_to_purchase_us"] is None
    assert stages, "no users"
    # exact recomputation in pure Python for every user
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .select("user_id", "event_type", "ts").collect())
    by_user: dict = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(
            (e["ts"], e["event_type"]))
    got = {r["user_id"]: r for r in rows}
    assert set(got) == set(by_user)
    for uid, evs in by_user.items():
        evs.sort()
        t0 = evs[0][0]
        def micros(t):
            d = t - t0
            return (d.days * 86_400_000_000 + d.seconds * 1_000_000
                    + d.microseconds)
        us = [(micros(t), et) for t, et in evs]
        tv = min((u for u, et in us if et == "view"), default=None)
        tc = (min((u for u, et in us if et == "click" and u >= tv),
                  default=None) if tv is not None else None)
        tp = (min((u for u, et in us if et == "purchase" and u >= tc),
                  default=None) if tc is not None else None)
        r = got[uid]
        assert (r["view_us"], r["click_us"], r["purchase_us"]) == \
            (tv, tc, tp), (uid, tv, tc, tp, r)


def test_bm25_topk_contract(spark):
    """BM25 invariants the oracle's hash compare can't express: bounded
    dense ranks in strict score order, no self-match, term overlap with
    the query document, and an exact pure-Python recomputation of the
    returned scores (same fold order: word-sorted, left-to-right)."""
    import math

    rows = text_analysis.q_bm25_topk(spark, SF_DIR).collect()
    assert rows
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()}
    words = {d: [w for w in t.split(" ") if w] for d, t in docs.items()}
    tf = {d: {} for d in words}
    for d, ws in words.items():
        for w in ws:
            tf[d][w] = tf[d].get(w, 0) + 1
    nonempty = [d for d in words if words[d]]
    n_docs = len(nonempty)
    avgdl = sum(len(words[d]) for d in nonempty) / n_docs
    df = {}
    for d in nonempty:
        for w in tf[d]:
            df[w] = df.get(w, 0) + 1
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) <= {d for d in nonempty
                         if d % text_analysis.BM25_QUERY_MOD == 0}
    k1, b = text_analysis.BM25_K1, text_analysis.BM25_B
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= text_analysis.BM25_TOP_K
        qwords = set(tf[qid])
        prev = None
        for r in rs:
            assert r["doc_id"] != qid
            shared = qwords & set(tf[r["doc_id"]])
            assert shared, "returned doc shares no query term"
            terms = []
            for w in shared:
                idf = math.log(1.0 + ((n_docs - df[w]) + 0.5) / (df[w] + 0.5))
                dl = len(words[r["doc_id"]])
                t = tf[r["doc_id"]][w]
                terms.append(idf * (t * (k1 + 1.0))
                             / (t + k1 * ((1.0 - b) + b * (dl / avgdl))))
            score = 0.0
            for ts_v in sorted(terms):   # the engine folds value-sorted
                score += ts_v
            assert abs(round(score, 6) - r["bm25"]) < 1e-9, (qid, r)
            if prev is not None:
                assert prev["bm25"] > r["bm25"] or (
                    prev["bm25"] == r["bm25"]
                    and prev["doc_id"] < r["doc_id"]), (prev, r)
            prev = r


def test_zorder_buckets_are_rectangles(spark):
    """The data-skipping contract of the Morton layout: every zbucket
    (file) is a rectangle in (lang, length) space — exactly one language
    and a length-bucket range <= 32 (top-3 b_len bits fixed) — so a
    predicate on either dimension prunes buckets by min/max alone.  Also
    pins the key round-trip: de-interleaving zkey recovers (b_len, b_l8)."""
    rows = curation.q_cur_zorder_layout(spark, SF_DIR).collect()
    assert rows
    by_bucket: dict = {}
    for r in rows:
        # round-trip: even bits -> b_len, odd bits -> b_lang << 6
        b_len = sum(((r["zkey"] >> (2 * i)) & 1) << i for i in range(8))
        b_l8 = sum(((r["zkey"] >> (2 * i + 1)) & 1) << i for i in range(8))
        assert b_len == r["b_len"]
        assert b_l8 == r["b_lang"] << 6
        assert r["zbucket"] == r["zkey"] >> curation.ZORDER_BUCKET_SHIFT
        by_bucket.setdefault(r["zbucket"], []).append(r)
    assert len(by_bucket) > 1, "corpus must spread across buckets"
    for b, rs in by_bucket.items():
        langs = {r["b_lang"] for r in rs}
        lens = [r["b_len"] for r in rs]
        assert len(langs) == 1, f"bucket {b} mixes languages {langs}"
        assert max(lens) - min(lens) <= 32, f"bucket {b} length range"
        assert max(lens) >> 5 == min(lens) >> 5
