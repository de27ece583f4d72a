"""Invariant tests for the data-quality / governance operators
(plans/quality.py) — properties that must hold on ANY fixture,
complementing the DuckDB oracle's value-equality check."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry
from projetbigdatastreaming_spark.catalog import load_table


def _run(spark, sf_dir, name):
    return entry.queries()[name](spark, sf_dir)


def test_constraint_check_emits_every_declared_constraint(spark, sf_dir):
    rows = {r.check_name: r for r in _run(spark, sf_dir, "constraint_check").collect()}
    assert set(rows) == {
        "completeness_o_custkey",
        "uniqueness_o_orderkey",
        "range_o_totalprice_gt_0",
        "membership_o_orderstatus",
        "referential_o_custkey",
    }
    for r in rows.values():
        assert 0.0 <= r.metric <= 1.0
        # passed must agree with the metric being exactly 1
        assert r.passed == (r.metric == 1.0)


def test_k_anonymity_groups_sum_to_table_size(spark, sf_dir):
    rows = _run(spark, sf_dir, "k_anonymity").collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.group_n for r in rows) == n_cust
    for r in rows:
        assert r.at_risk == (r.group_n < 5)
        assert r.group_n >= 1


def test_fuzzy_match_pairs_are_canonical_and_verified(spark, sf_dir):
    rows = _run(spark, sf_dir, "fuzzy_match").collect()
    seen = set()
    for r in rows:
        assert r.name_a < r.name_b  # canonical order, no mirror dups
        assert 0 < r.dist <= 2
        assert (r.name_a, r.name_b) not in seen
        seen.add((r.name_a, r.name_b))


def test_fuzzy_match_blocking_is_exhaustive_at_k2(spark, sf_dir):
    # the pigeonhole blocking must find EVERY pair the brute-force
    # all-pairs levenshtein finds (blocking is candidate pruning, not
    # recall loss)
    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    a = names.select(F.col("name").alias("name_a"))
    b = names.select(F.col("name").alias("name_b"))
    brute = (
        a.crossJoin(b)
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= 2)
    )
    brute_pairs = {(r.name_a, r.name_b) for r in brute.collect()}
    blocked_pairs = {
        (r.name_a, r.name_b)
        for r in _run(spark, sf_dir, "fuzzy_match").collect()
    }
    assert blocked_pairs == brute_pairs


def test_snapshot_diff_change_types_reconcile(spark, sf_dir):
    rows = _run(spark, sf_dir, "snapshot_diff").collect()
    orders = load_table(spark, sf_dir, "orders")
    n_old = orders.where(F.col("o_orderdate") < "1996-01-01").count()
    n_new = orders.where(
        (F.col("o_orderdate") >= "1993-01-01")
        & (F.col("o_orderdate") <= "1996-12-31")
    ).count()
    by_type = {}
    for r in rows:
        by_type[r.change_type] = by_type.get(r.change_type, 0) + 1
        if r.change_type == "delete":
            assert r.status is None and r.price is None
        else:
            assert r.status is not None and r.price is not None
    # |new| = |old| - deletes + inserts (updates cancel out)
    assert n_new == n_old - by_type.get("delete", 0) + by_type.get(
        "insert", 0
    )
    assert set(by_type) <= {"insert", "delete", "update"}


def test_line_dedup_conserves_segments_and_detects_dups(spark, sf_dir):
    import hashlib

    rows = _run(spark, sf_dir, "line_dedup").collect()
    docs = {r.doc_id: r.text for r in load_table(
        spark, sf_dir, "documents").select("doc_id", "text").collect()}
    assert {r.doc_id for r in rows} == set(docs)
    # replay the operator in plain Python and compare exactly
    seen: set[str] = set()
    expected: dict[int, tuple[int, int, str]] = {}
    for doc_id in sorted(docs):
        toks = docs[doc_id].split(" ")
        segs = [
            " ".join(toks[i : i + 5]) for i in range(0, len(toks), 5)
        ]
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        fp = hashlib.md5(" ".join(kept).encode()).hexdigest()
        expected[doc_id] = (len(segs), len(kept), fp)
    for r in rows:
        assert (r.n_seg, r.n_kept, r.clean_fp) == expected[r.doc_id]


def test_semantic_dedup_keeper_is_smaller_and_within_cluster(spark, sf_dir):
    from projetbigdatastreaming_spark.operators import similarity
    from projetbigdatastreaming_spark.plans.llmdata import IVF_N_LISTS

    rows = _run(spark, sf_dir, "emb_semantic_dedup").collect()
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = similarity.ivf_assign(emb, IVF_N_LISTS)
    lists = {r.vec_id: r.list_id for r in assigned.collect()}
    for r in rows:
        assert r.keep_vec_id < r.drop_vec_id
        assert lists[r.drop_vec_id] == r.list_id
        assert lists[r.keep_vec_id] == r.list_id
        assert r.cos >= 0.45


def test_source_overlap_is_canonical_and_bounded(spark, sf_dir):
    rows = _run(spark, sf_dir, "dedup_source_overlap").collect()
    docs = load_table(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) <= n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        assert r.n_shared_docs >= 1


def test_lang_mismatch_rows_really_disagree(spark, sf_dir):
    from projetbigdatastreaming_spark.functions.text import language_id
    from pyspark.sql import functions as F2

    rows = _run(spark, sf_dir, "doc_lang_mismatch").collect()
    # every zh-labeled doc must be flagged (detector has no zh model)
    docs = load_table(spark, sf_dir, "documents")
    zh_ids = {
        r.doc_id for r in docs.where(F2.col("lang") == "zh").collect()
    }
    flagged = {r.doc_id for r in rows}
    assert zh_ids <= flagged
    for r in rows:
        assert r.lang != r.lang_pred


def test_pca_loading_is_unit_and_dominant(spark, sf_dir):
    import numpy as np

    rows = _run(spark, sf_dir, "emb_pca_power").collect()
    v = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-4
    # Rayleigh quotient of the result must beat the start vector's —
    # power iteration cannot decrease it
    emb = load_table(spark, sf_dir, "embeddings")
    X = np.array(
        [r.embedding for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    C = np.cov(X, rowvar=False, bias=True) * len(X)
    ones = np.ones(len(v)) / np.sqrt(len(v))
    assert v @ C @ v >= ones @ C @ ones - 1e-6
    # and should be close to the true top eigenvalue after 3 steps
    top = float(np.linalg.eigvalsh(C)[-1])
    assert v @ C @ v >= 0.9 * top


def test_curation_pipeline_attribution_consistent(spark, sf_dir):
    """Pipeline drop attribution must (a) cover every document exactly
    once, (b) agree with the standalone quality classifier on stage-1
    drops, and (c) never mark a canonical duplicate as 'duplicate'."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    pipe = entry.queries()["curation_pipeline"](spark, sf_dir)
    qc = entry.queries()["quality_classifier"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")

    rows = pipe.collect()
    assert len(rows) == docs.count()  # total coverage, one row each
    statuses = {r.status for r in rows}
    assert statuses <= {"quality", "duplicate", "length", "sampled_out",
                        "kept"}

    # stage-1 agreement with the standalone classifier (docs the
    # classifier scored and rejected + docs it couldn't score)
    qc_drop = {r.doc_id for r in qc.collect() if not r.keep}
    scored_ids = {r.doc_id for r in qc.collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    expected_quality = qc_drop | (all_ids - scored_ids)
    got_quality = {r.doc_id for r in rows if r.status == "quality"}
    assert got_quality == expected_quality

    # each duplicate's fingerprint has a SMALLER kept-side doc sharing it
    dup_ids = {r.doc_id for r in rows if r.status == "duplicate"}
    if dup_ids:
        fp = docs.select(
            "doc_id", F.md5(F.substring("text", 1, 100)).alias("fp")
        )
        fp_of = {r.doc_id: r.fp for r in fp.collect()}
        surviving = all_ids - expected_quality
        for d in dup_ids:
            assert any(
                o < d and fp_of[o] == fp_of[d]
                for o in surviving
            )


def test_gopher_quality_rules_fire_individually(spark):
    """Each Gopher rule must gate the specific pathology it names:
    too-short doc, degenerate mean word length, non-alpha flood,
    missing stop words, one-token domination — and a healthy doc
    passes everything."""
    from projetbigdatastreaming_spark.plans.llmdata import q_gopher_quality
    from unittest import mock

    healthy = "the a " + " ".join(
        f"word{i} plus{i}" for i in range(30)
    )
    rows = [
        (0, healthy, "en", "s"),
        (1, "the a short doc", "en", "s"),  # n_words < 50
        (2, "the a " + "x " * 60, "en", "s"),  # mean word len < 3
        (3, "the a " + "1234 " * 60, "en", "s"),  # non-alpha flood
        (4, " ".join(f"w{i}" for i in range(60)), "en", "s"),  # no stops
        (5, "the a " + "dominant " * 60, "en", "s"),  # one-token domination
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    with mock.patch(
        "projetbigdatastreaming_spark.plans.llmdata.load_table",
        return_value=docs,
    ):
        out = {r.doc_id: r for r in q_gopher_quality(spark, "unused").collect()}
    assert out[0].passes == 1
    assert out[1].ok_n_words == 0 and out[1].passes == 0
    assert out[2].ok_mean_len == 0 and out[2].passes == 0
    assert out[3].ok_alpha == 0 and out[3].passes == 0
    assert out[4].ok_stop == 0 and out[4].passes == 0
    assert out[5].ok_top_unigram == 0 and out[5].passes == 0


def test_pq_codes_properties(spark, sf_dir):
    """PQ invariants: codes live in [0, k^m); error is non-negative;
    the codebook SEED vectors reconstruct exactly (their sub-slices
    ARE centroids, so err_q4 == 0 for at least k vectors); and codes
    are deterministic across runs."""
    from projetbigdatastreaming_spark.operators.similarity import pq_codes

    emb = load_table(spark, sf_dir, "embeddings")
    out1 = {r.vec_id: r for r in pq_codes(emb, m=4, k=8).collect()}
    out2 = {r.vec_id: r for r in pq_codes(emb, m=4, k=8).collect()}
    assert out1.keys() == out2.keys() and len(out1) == emb.count()
    for vid, r in out1.items():
        assert 0 <= r.code < 8**4, (vid, r.code)
        assert r.err_q4 >= 0
        assert out2[vid].code == r.code and out2[vid].err_q4 == r.err_q4
    exact = [vid for vid, r in out1.items() if r.err_q4 == 0]
    assert len(exact) >= 8  # the 8 seed vectors at minimum
    # quantization compresses: plenty of distinct vectors share codes
    assert len({r.code for r in out1.values()}) < len(out1)


def test_pq_adc_recall_bounds_and_table_equivalence(spark, sf_dir):
    """ADC invariants: recall in [0,1] per query; the ADC score of a
    corpus vector equals the sum of its per-subspace table entries
    computed directly (spot-checked); exact L2 top-1 of a query's own
    near-identical twin ranks first when present."""
    from projetbigdatastreaming_spark.operators.similarity import (
        l2_topk,
        pq_adc_topk,
    )
    from projetbigdatastreaming_spark.plans.llmdata import (
        PQ_K,
        PQ_M,
        QUERY_VEC_IDS,
        TOPK,
        q_emb_pq_recall,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rec = {r.qid: r.recall_at_k for r in q_emb_pq_recall(spark, sf_dir).collect()}
    assert set(rec) == set(QUERY_VEC_IDS)
    assert all(0.0 <= v <= 1.0 for v in rec.values())

    ann = pq_adc_topk(emb, QUERY_VEC_IDS, TOPK, m=PQ_M, k=PQ_K).collect()
    exact = l2_topk(emb, QUERY_VEC_IDS, TOPK).collect()
    for rows in (ann, exact):
        per = {}
        for r in rows:
            per.setdefault(r.qid, []).append(r)
        for qid, rs in per.items():
            assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
            assert qid not in {r.vec_id for r in rs}  # self excluded
            key = "adc_q4" if hasattr(rs[0], "adc_q4") else "d_q4"
            vals = [getattr(r, key) for r in rs]
            assert vals == sorted(vals)  # ranked by distance


def test_ivfpq_candidates_confined_to_probed_lists(spark, sf_dir):
    """IVFADC invariants: per-query recall in [0,1]; every returned
    candidate's IVF list is one of that query's nprobe probed lists
    (the inverted-list confinement that makes the scan ~nprobe/
    n_lists of the corpus); ranks contiguous, ADC scores ascending,
    self excluded."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from projetbigdatastreaming_spark.operators.similarity import (
        _dot,
        ivf_assign,
        ivfpq_topk,
    )
    from projetbigdatastreaming_spark.plans.llmdata import (
        IVF_N_LISTS,
        IVF_NPROBE,
        PQ_K,
        PQ_M,
        QUERY_VEC_IDS,
        TOPK,
        q_emb_ivfpq_recall,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rec = {
        r.qid: r.recall_at_k
        for r in q_emb_ivfpq_recall(spark, sf_dir).collect()
    }
    assert set(rec) == set(QUERY_VEC_IDS)
    assert all(0.0 <= v <= 1.0 for v in rec.values())

    ann = ivfpq_topk(
        emb, QUERY_VEC_IDS, TOPK,
        n_lists=IVF_N_LISTS, nprobe=IVF_NPROBE, m=PQ_M, k=PQ_K,
    ).collect()
    per = {}
    for r in ann:
        per.setdefault(r.qid, []).append(r)
    for qid, rs in per.items():
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert qid not in {r.vec_id for r in rs}
        vals = [r.adc_q4 for r in rs]
        assert vals == sorted(vals)

    # recompute each query's probed lists independently and check
    # confinement: every candidate's assigned list was probed
    assigned, cents = ivf_assign(emb, IVF_N_LISTS)
    q = assigned.where(
        F.col("vec_id").isin(QUERY_VEC_IDS)
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    wq = Window.partitionBy("qid").orderBy(
        F.desc("__sim"), F.asc("list_id")
    )
    probes = {
        (r.qid, r.list_id)
        for r in q.crossJoin(F.broadcast(cents))
        .select(
            "qid",
            "list_id",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnrm") * F.col("cnrm")),
                4,
            ).alias("__sim"),
        )
        .withColumn("__rk", F.row_number().over(wq))
        .where(F.col("__rk") <= IVF_NPROBE)
        .collect()
    }
    vec_list = {
        r.vec_id: r.list_id
        for r in assigned.select("vec_id", "list_id").collect()
    }
    for r in ann:
        assert (r.qid, vec_list[r.vec_id]) in probes, (
            r.qid, r.vec_id, vec_list[r.vec_id],
        )


def test_pq_refine_never_increases_total_error(spark, sf_dir):
    """One Lloyd step must not increase total quantization error
    (k-means monotonicity: means minimize within-cell SSE, then
    reassignment only moves vectors to strictly closer cells), and
    every corpus vector stays accounted for."""
    from projetbigdatastreaming_spark.operators.similarity import (
        pq_codes,
        pq_refine,
    )
    from projetbigdatastreaming_spark.plans.llmdata import PQ_K, PQ_M

    emb = load_table(spark, sf_dir, "embeddings")
    before = sum(r.err_q4 for r in pq_codes(emb, m=PQ_M, k=PQ_K).collect())
    cells = pq_refine(emb, m=PQ_M, k=PQ_K).collect()
    after = sum(r.sum_d_q4 for r in cells)
    # 1e-4-quantization of each term can wobble the integer totals by
    # ~#terms/2 either way; beyond that, error must not increase
    assert after <= before + len(cells), (before, after)
    n = emb.count()
    for mi in range(PQ_M):
        assert sum(r.n_vecs for r in cells if r.mi == mi) == n
        assert all(0 <= r.cid < PQ_K for r in cells if r.mi == mi)


def test_ccnet_buckets_balanced_within_lang(spark, sf_dir):
    """Tercile invariants: per language the three buckets differ by at
    most 2 docs (interpolated-cutoff boundary ties), every scored doc
    is bucketed exactly once, and head surprisal <= tail surprisal."""
    rows = _run(spark, sf_dir, "ccnet_ppl_buckets").collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append(r)
    assert sum(len(v) for v in per.values()) == len(rows)
    for lang, rs in per.items():
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r.ppl_bucket] += 1
        assert max(counts.values()) - min(counts.values()) <= 2, (
            lang, counts,
        )
        heads = [r.mean_surprisal for r in rs if r.ppl_bucket == "head"]
        tails = [r.mean_surprisal for r in rs if r.ppl_bucket == "tail"]
        if heads and tails:
            assert max(heads) <= min(tails)


def test_corpus_dup_stats_reconciles_with_doc_grain(spark, sf_dir):
    """The corpus-level dup profile must equal the sum of the per-doc
    substring_dedup profile — same machinery, two grains."""
    import __spark_entry__ as entry

    corp = entry.queries()["corpus_dup_stats"](spark, sf_dir).collect()[0]
    docs = entry.queries()["substring_dedup"](spark, sf_dir).collect()
    assert corp.total_windows == sum(r.n_windows for r in docs)
    assert corp.dup_windows == sum(r.n_dup_windows for r in docs)
    assert corp.docs_with_dup == sum(
        1 for r in docs if r.n_dup_windows > 0
    )
    assert 0.0 <= corp.dup_frac <= 1.0


def test_gopher_report_reconciles_with_flags(spark, sf_dir):
    """Dashboard rows must sum back to the per-doc gate output."""
    import __spark_entry__ as entry

    rep = entry.queries()["gopher_report"](spark, sf_dir).collect()
    flags = entry.queries()["gopher_quality"](spark, sf_dir).collect()
    assert sum(r.n_docs for r in rep) == len(flags)
    assert sum(r.n_pass for r in rep) == sum(r.passes for r in flags)
    for r in rep:
        assert 0.0 <= r.pass_rate <= 1.0
        assert 0.0 <= r.mean_rules_failed <= 5.0


def test_filter_waterfall_cascade_reconciles(spark, sf_dir):
    """The waterfall must be a true cascade: each gate's survivors are
    the next gate's input, gate 0 sees the whole corpus, and the final
    survivors equal the conjunction pass count of gopher_quality."""
    rows = _run(spark, sf_dir, "filter_waterfall").collect()
    flags = _run(spark, sf_dir, "gopher_quality").collect()
    assert [r.gate_no for r in rows] == [0, 1, 2, 3, 4]
    assert rows[0].n_in == len(flags)
    for a, b in zip(rows, rows[1:]):
        assert a.n_out == b.n_in
        assert a.n_drop >= 0 and a.n_out == a.n_in - a.n_drop
    assert rows[-1].n_out == sum(f.passes for f in flags)
    assert sum(r.n_drop for r in rows) + rows[-1].n_out == len(flags)


def test_lang_balance_flattens_shares_and_conserves_budget(spark, sf_dir):
    """Temperature 0.5 must shrink the largest language's share and
    grow the smallest's; integer budgets must sum to within |langs|
    floor-rounding slack of the total budget."""
    from projetbigdatastreaming_spark.plans.llmdata import (
        _LANG_BALANCE_BUDGET,
    )

    rows = _run(spark, sf_dir, "lang_balance_sample").collect()
    assert abs(sum(r.p_raw for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.p_temp for r in rows) - 1.0) < 1e-9
    hi = max(rows, key=lambda r: r.p_raw)
    lo = min(rows, key=lambda r: r.p_raw)
    if hi.p_raw > lo.p_raw:  # degenerate uniform corpus guard
        assert hi.p_temp <= hi.p_raw + 1e-12
        assert lo.p_temp >= lo.p_raw - 1e-12
    got = sum(r.budget_tokens for r in rows)
    assert _LANG_BALANCE_BUDGET - len(rows) < got <= _LANG_BALANCE_BUDGET


def test_tokenizer_fertility_reconciles_with_doc_grain(spark, sf_dir):
    """Per-lang sums must equal the bpe_token_count per-doc counts
    aggregated by language, and fertility >= 1 (the regex never merges
    across whitespace)."""
    per_lang = {r.lang: r for r in _run(spark, sf_dir, "tokenizer_fertility").collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    doc_grain = (
        _run(spark, sf_dir, "bpe_token_count")
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n_bpe_tokens").alias("bpe"),
            F.sum("n_ws_tokens").alias("ws"),
        )
        .collect()
    )
    for r in doc_grain:
        assert per_lang[r.lang].n_bpe_tokens == r.bpe
        assert per_lang[r.lang].n_words == r.ws
    for r in per_lang.values():
        assert r.fertility >= 1.0
        assert r.chars_per_token > 0


def test_ngram_novelty_totals_equal_distinct_grams(spark, sf_dir):
    """Exactly one occurrence of every distinct 8-gram is novel, so
    sum(n_novel) == |distinct grams| and each doc's novelty is in
    (0, 1]; docs shorter than 8 words must be absent."""
    from projetbigdatastreaming_spark.plans.llmdata import _NOVELTY_N

    rows = _run(spark, sf_dir, "doc_ngram_novelty").collect()
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_short = docs.where(F.size(w) < _NOVELTY_N).count()
    assert len(rows) == docs.count() - n_short
    distinct_grams = (
        docs.where(F.size(w) >= _NOVELTY_N)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - _NOVELTY_N),
                    lambda i: F.concat_ws(
                        " ", F.slice(w, i + 1, _NOVELTY_N)
                    ),
                )
            ).alias("g")
        )
        .distinct()
        .count()
    )
    assert sum(r.n_novel for r in rows) == distinct_grams
    for r in rows:
        assert 0 <= r.n_novel <= r.n_ngrams
        assert 0.0 <= r.novelty <= 1.0


def test_soft_weights_sum_to_distinct_texts(spark, sf_dir):
    """sum over docs of 1/cluster_size == number of distinct texts
    (each cluster contributes exactly 1.0), and the weighted token
    mass equals the deduped token count."""
    rows = _run(spark, sf_dir, "dedup_soft_weights").collect()
    docs = load_table(spark, sf_dir, "documents")
    n_distinct = docs.select("text").distinct().count()
    assert abs(sum(r.weight for r in rows) - n_distinct) < 1e-6
    assert len(rows) == docs.count()
    for r in rows:
        assert r.cluster_size >= 1
        assert 0 < r.weight <= 1.0


def test_bq_pack_and_hamming_invariants(spark):
    """Binary quantization invariants: a vector's twin with one sign
    flipped sits at Hamming 1 and ranks first; identical signs rank
    at distance 0; word packing covers every dimension exactly once
    (63 bits per word, tail word partial)."""
    from pyspark.sql import functions as F

    from projetbigdatastreaming_spark.operators.similarity import (
        bq_pack,
        bq_topk,
    )

    d = 70  # forces a 2-word layout with a 7-bit tail
    base = [1.0 if i % 3 else -1.0 for i in range(d)]
    twin = list(base)
    twin[65] = -twin[65]  # flip one sign in the tail word
    far = [-x for x in base]
    emb = spark.createDataFrame(
        [(0, base), (1, twin), (2, far), (3, base)],
        "vec_id long, embedding array<double>",
    )
    packed = {r.vec_id: r.words for r in bq_pack(emb).collect()}
    assert all(len(w) == 2 for w in packed.values())
    # identical vectors pack identically; all words fit in 63 bits
    assert packed[0] == packed[3]
    assert all(0 <= w < (1 << 63) for ws in packed.values() for w in ws)
    # hamming(base, twin) = 1, hamming(base, far) = d
    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert ham(packed[0], packed[1]) == 1
    assert ham(packed[0], packed[2]) == d

    out = {
        (r.qid, r.rk): (r.vec_id, r.hamming)
        for r in bq_topk(emb, [0], k=3).collect()
    }
    assert out[(0, 1)] == (3, 0)  # exact twin first
    assert out[(0, 2)] == (1, 1)  # one-bit flip second
    assert out[(0, 3)] == (2, d)  # antipode last
