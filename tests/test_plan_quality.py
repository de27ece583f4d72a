"""Physical-plan regression tests: the scale-relevant plan shapes must
survive refactors (pushdown reaching the scan, broadcasts on dims,
top-k without global sort, no accidental cartesian products)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry


def _plan(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "proj_filter")
    assert "PushedFilters: [" in plan
    assert "In(event_type" in plan
    assert "GreaterThan(value,50.0)" in plan


def test_column_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q1")
    # only the 7 needed columns are read
    assert "ReadSchema" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "star_join")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sort_limit")
    assert "TakeOrderedAndProject" in plan


def test_window_topk_partial_limit(spark, sf_dir):
    # WindowGroupLimit applies the per-group limit map-side (before the
    # exchange) — rank pushdown, Spark 3.5+
    plan = _plan(spark, sf_dir, "window_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "subq_exists")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name",
    ["agg_groupby", "kpi_quarter_hour", "join_left", "sessionize"],
)
def test_no_cartesian_anywhere(spark, sf_dir, name):
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_no_global_exchange(spark, sf_dir):
    # IVF centroid pick must be TakeOrderedAndProject (per-partition
    # top-n, no full sort) and nothing in the plan may collapse the
    # corpus to one partition (the round-1 unpartitioned-Window bug).
    plan = _plan(spark, sf_dir, "emb_ann_topk_ivf")
    assert "TakeOrderedAndProject" in plan
    assert "SinglePartition" not in plan
    # every Window must be partitioned (no 'Window [...] []' global spec)
    for frag in plan.split("Window [")[1:]:
        head = frag.split("\n", 1)[0]
        assert ", [], [" not in head, f"unpartitioned Window: {head}"


def test_pq_search_topk_is_group_limited(spark, sf_dir):
    """PQ ADC/exact rankings must compile to WindowGroupLimit (partial
    per-partition top-k BEFORE the qid exchange — only ~k·|Q| rows
    shuffle) with the codebook/query sides broadcast; the corpus side
    must never collapse to one partition."""
    plan = _plan(spark, sf_dir, "emb_pq_recall")
    assert "WindowGroupLimit" in plan
    assert plan.count("BroadcastExchange") >= 2  # codebook row + qtab
    assert "SinglePartition" not in plan
    for frag in plan.split("Window [")[1:]:
        head = frag.split("\n", 1)[0]
        assert ", [], [" not in head, f"unpartitioned Window: {head}"


def test_bloom_screened_dedup_probes_hits_not_corpus(spark, sf_dir):
    """The production Bloom composition: the exact anti-join's probe
    input must be the bloom-HIT subset (descend from the bitmap
    probe's bloom_hit=1 filter), its build side must be the broadcast
    matched-fp relation, and the corpus must never cross a join
    shuffle (its only exchanges are the bounded bitmap/matched aggs
    — no SortMergeJoin anywhere)."""
    import re

    plan = _plan(spark, sf_dir, "dedup_incremental_bloom")
    assert plan.count("LeftAnti") == 1
    anti_line = next(ln for ln in plan.splitlines() if "LeftAnti" in ln)
    assert "BroadcastHashJoin" in anti_line  # matched fps broadcast
    # probe side of the anti join is the filtered hit subset: within
    # the anti join's subtree (lines after it, deeper indentation)
    # there must be a bloom_hit = 1 filter
    lines = plan.splitlines()
    i = lines.index(anti_line)
    depth = len(anti_line) - len(anti_line.lstrip(" :+-"))
    subtree = []
    for ln in lines[i + 1:]:
        if len(ln) - len(ln.lstrip(" :+-")) <= depth:
            break
        subtree.append(ln)
    sub = "\n".join(subtree)
    assert re.search(r"bloom_hit#\d+ = 1", sub), sub[:500]
    # the definitely-new path bypasses the corpus entirely
    assert re.search(r"bloom_hit#\d+ = 0", plan)
    # corpus-wide join shuffles: none
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_probe_is_broadcast_equijoin_corpus_stays_put(
    spark, sf_dir
):
    """IVFADC (emb_ivfpq_topk): centroids and codebook are broadcast
    1-row relations, the inverted-list probe is a broadcast
    equi-join on list_id (never a shuffle of the corpus codes), the
    per-query top-k is group-limited map-side, and nothing collapses
    to one partition."""
    plan = _plan(spark, sf_dir, "emb_ivfpq_topk")
    # the list probe: an equi-hash-join keyed on list_id with the
    # query-table side broadcast
    assert any(
        "BroadcastHashJoin [list_id" in ln
        for ln in plan.splitlines()
    ), plan[:800]
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan
    assert "SinglePartition" not in plan
    for frag in plan.split("Window [")[1:]:
        head = frag.split("\n", 1)[0]
        assert ", [], [" not in head, f"unpartitioned Window: {head}"


def test_tpch_q5_broadcasts_dims_no_cartesian(spark, sf_dir):
    # nation⋈region is a broadcast dim build; the three fact-side joins
    # may shuffle but nothing degenerates to a cartesian/BNLJ
    plan = _plan(spark, sf_dir, "tpch_q5")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bernoulli_sample_is_map_only(spark, sf_dir):
    # hash-sample must add no shuffle: filter evaluated in the scan
    # stage (the final orderBy is the query's presentation sort)
    plan = _plan(spark, sf_dir, "sample_bernoulli")
    assert plan.count("Exchange") <= 1  # only the presentation sort

def test_stratified_sample_single_partitioned_window(spark, sf_dir):
    # per-stratum top-n must use WindowGroupLimit (map-side limit
    # before the stratum exchange), and the exchange must be
    # hashpartitioning on the stratum — never a single-partition sort
    plan = _plan(spark, sf_dir, "sample_stratified")
    assert "WindowGroupLimit" in plan
    assert "hashpartitioning(lang" in plan
    assert "SinglePartition" not in plan


def test_tpch_q6_map_only_scan_bound(spark, sf_dir):
    # Q6 is the scan-bound best case: all predicates pushed to the
    # parquet scan, single-row partial+final agg, no join, exactly one
    # exchange (the final single-row merge)
    plan = _plan(spark, sf_dir, "tpch_q6")
    assert "PushedFilters: [IsNotNull" in plan
    assert "< 24.0)" in plan  # quantity band evaluated in the scan stage
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_decontaminate_broadcasts_benchmark_side(spark, sf_dir):
    # the benchmark slice (2% of docs) must be the broadcast build side
    # so the probe scan never shuffles its shingles for the join
    plan = _plan(spark, sf_dir, "decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_window_is_partitioned(spark, sf_dir):
    # the running-token-count window must stay partitioned by source —
    # a global unpartitioned window would serialize the corpus
    plan = _plan(spark, sf_dir, "pack_sequences")
    assert "SinglePartition" not in plan
    for frag in plan.split("Window [")[1:]:
        head = frag.split("\n", 1)[0]
        assert ", [], [" not in head, f"unpartitioned Window: {head}"


def test_text_pii_is_map_only(spark, sf_dir):
    # regex scrub is pure per-row projection: zero exchanges
    plan = _plan(spark, sf_dir, "text_pii")
    assert "Exchange" not in plan


def test_fence_and_vocab_joins_broadcast(spark, sf_dir):
    # learn-then-apply shapes: the tiny learned relation (IQR fences,
    # top-K vocab) must broadcast back over the fact scan
    for name in ("iqr_outliers", "oov_rate"):
        plan = _plan(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_rolling_range_window_is_partitioned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "rolling_avg_range")
    assert "hashpartitioning(user_id" in plan
    for frag in plan.split("Window [")[1:]:
        head = frag.split("\n", 1)[0]
        assert ", [], [" not in head, f"unpartitioned Window: {head}"


#: queries where a BroadcastNestedLoopJoin is the intended plan: the
#: explicit cross join, the documented O(n²) oracle baselines, and the
#: constant-size broadcast sides (query vectors / hyperplane tables)
#: crossed against the corpus scan
_BNLJ_ALLOWED = {
    "join_cross",
    # single-row scalar-aggregate broadcast (Q11's global total, Q22's
    # global avg, the corpus-size scalars in unigram_logprob /
    # tfidf_topk) — the correct plan for an uncorrelated scalar subquery
    "tpch_q11",
    "tpch_q22",
    "unigram_logprob",
    "bigram_logprob",
    # ccnet_ppl_buckets inherits bigram_logprob's 1-row corpus-total
    # broadcast; its own cutoff join is a ≤|langs|-row broadcast
    "ccnet_ppl_buckets",
    "tfidf_topk",
    "graph_pagerank",
    # constraint_check crosses two single-row aggregate relations (the
    # one-scan metric row x the orphan count) before exploding to the
    # per-constraint rows — a 1x1 BNLJ
    "constraint_check",
    # round-10 single-row scalar broadcasts: benford_fit's digit-total,
    # mutual_information's grand total over the joint grid,
    # rfm_segmentation's corpus max-date anchor, bigram_pmi's bigram
    # grand total — each the Q11 uncorrelated-scalar shape
    "benford_fit",
    "mutual_information",
    # chi2_independence inherits mutual_information's 1-row grand
    # total broadcast over the contingency grid
    "chi2_independence",
    "rfm_segmentation",
    "bigram_pmi",
    # kmv_jaccard's pair grid is a <|types|²-row BNLJ over the
    # ≤|types|-row sketch relation (arrays of ≤k hashes per row)
    "kmv_jaccard",
    # kmv_set_diff: the same ≤|types|-row sketch pair grid
    "kmv_set_diff",
    # t_closeness broadcasts the 1-row global sensitive-value
    # distribution into the bounded quasi-identifier group relation;
    # ams_f2 crosses its two single-row relations (estimate × exact) —
    # both the Q11 uncorrelated-scalar shape
    "t_closeness",
    "ams_f2",
    # mixture_temperature_weights broadcasts its 1-row (N, Σn^α)
    # total into the |sources|-row relation — the Q11 shape
    "mixture_temperature_weights",
    # sample_size_power crosses the 1-row global distinct-user count
    # into the |types|-row relation (Q11 shape) before the 4-literal
    # MDE explode
    "sample_size_power",
    # friedman_test crosses the 1-row tie-term scalar into the 1-row
    # folded rank relation (1x1 BNLJ, the Q11 shape); its other join
    # (day count = global k) is an equi-join on the broadcast scalar
    "friedman_test",
    # vocab_coverage_curve crosses the 1-row corpus-token-total scalar
    # into the 1-row collected top-10k head (1x1 BNLJ, the Q11 shape)
    "vocab_coverage_curve",
    # ams_join_size crosses three single-row relations (estimate ×
    # exact inner product × the two F2 scalars) — 1x1 BNLJs
    "ams_join_size",
    # hybrid_search_rrf: the dense arm broadcasts the ≤5 query vectors
    # into the corpus scan (the emb_cosine_topk shape) and the lexical
    # arm replicates its LIMIT-50 head per query id (≤5×50 rows) so
    # its rank window can be qid-partitioned instead of global
    "hybrid_search_rrf",
    # emb_knn_label / emb_hard_negatives broadcast the anchor-vector
    # side into the corpus scan (the emb_cosine_topk shape; the
    # lake-scale swap is the BQ shortlist, documented in-docstring)
    "emb_knn_label",
    "emb_hard_negatives",
    # emb_knn_label_bq's one cross is the bq_topk shape: packed
    # sign-bit corpus × broadcast packed queries (non-equi <>); the
    # float rescore is broadcast EQUI-joined on the shortlist (plan-
    # pinned by test_knn_bq_rescore_never_crosses_corpus).  The
    # recall gauge additionally replays the exact kernel's anchor
    # cross (the documented brute-force ground truth)
    "emb_knn_label_bq",
    "emb_knn_label_recall",
    # timeseries_gapfill crosses the distinct event types against the
    # one-row global min/max bounds to build the hour spine — a
    # |types|x1 BNLJ over aggregated (broadcast-size) inputs
    "timeseries_gapfill",
    # day-spine range join: the spine is |distinct days| rows (tiny at
    # any scale) and the 0-6 day lag bounds matches to 7 per row
    "active_users_rolling",
    "dedup_ngram_jaccard",
    "dedup_char_ngram",
    # estimator-quality audit over the documented-quadratic baseline
    # pair set (the scale path is dedup_minhash_pairs)
    "dedup_minhash_est",
    "emb_cosine_pairs",
    "emb_cosine_topk",
    "emb_ann_topk_lsh",
    "emb_ann_topk_ivf",
    "emb_kmeans_refine",
    "emb_semantic_dedup",
    # emb_pq_codes crosses the corpus against the ONE collected
    # codebook row (≤k centroids) — the ivf_assign broadcast pattern;
    # emb_pq_recall additionally broadcasts the ≤|queries|-row ADC
    # table relation and the query vectors into the code/corpus scans
    "emb_pq_codes",
    "emb_pq_recall",
    "emb_pq_refine",
    # IVFADC composes the ivf_assign centroid-row broadcast with the
    # PQ codebook-row broadcast (both 1-row collected relations
    # crossed into map-side folds); the list probe itself is a
    # broadcast equi-JOIN on list_id, not a BNLJ
    "emb_ivfpq_topk",
    "emb_ivfpq_recall",
    # emb_pca_power normalizes the d-row iterate against a one-row
    # norm scalar each power step — d x 1 BNLJs over KB relations
    "emb_pca_power",
    "emb_ann_recall",
    # binary quantization: query side is a tiny broadcast crossed
    # into the packed-corpus scan with a non-equi (vec_id <> qid)
    # predicate — the cosine_topk shape over 32x fewer bytes
    "emb_bq_topk",
    "emb_bq_recall",
    "emb_bq_rerank",
    # retrieval_eval composes the exact-cosine and bq_topk passes —
    # it inherits exactly their allowlisted query-broadcast crosses
    "retrieval_eval",
    # the graded arm additionally composes ivfpq_topk; all crosses
    # are the same inherited query/model-row broadcast shapes (the
    # RRF fusion itself is a full-outer EQUI-join of two ≤|Q|·k-row
    # relations)
    "retrieval_eval_graded",
    # two-stage BQ+IVFADC: inherits the bq_topk query-side broadcast
    # cross (stage 1) and the IVFADC model-row broadcasts; stage 2's
    # shortlist and table joins are broadcast EQUI-joins; the recall
    # gauge adds the exact-L2 ground-truth broadcast cross
    "emb_bq_ivfpq_rerank",
    "emb_bq_ivfpq_recall",
    # fixed-bin histogram quantiles: the cumulative self-join (bin <=
    # bin range condition) and the 3-row quantile probe both run on
    # the <=50-row counts relation — bounded BNLJs over KB state; the
    # one pass over raw data is the map-side-combined bin hash-agg
    "quantile_histogram",
    # join_skew_profile: the same cumulative self-join + scalar
    # totals broadcast over the multiplicity-domain-bounded FoF
    # relation (KB state at any data scale)
    "join_skew_profile",
    # join_strategy_advice = join_skew_profile + a CASE column; it
    # inherits exactly the profile's bounded FoF broadcast self-join
    "join_strategy_advice",
    # BPE training broadcasts the 1-row winning pair into the merge
    # step each iteration — the same scalar-broadcast shape as
    # emb_pca_power, over a vocabulary-sized (≤200-row) relation
    "bpe_learn_merges",
    # matryoshka / JL-projection recall compose two cosine_topk passes
    # — same constant-size (5 query vectors) broadcast cross join
    "emb_matryoshka_recall",
    "emb_jl_recall",
    # dsir crosses the ≤64-bucket distribution against its 1-row
    # totals — a |buckets|x1 BNLJ over KB relations
    "dsir_importance",
    # bm25 crosses each per-doc row against the 1-row corpus stats
    # (N, Σdl, per-term df) — the dsir scalar-broadcast shape
    "bm25_topk",
    # triangle census crosses its three 1-row aggregates (edges,
    # wedges, triangles) into one summary row — 1x1 BNLJs
    "graph_triangles",
    # basket lift crosses the 1-row basket count into the pruned
    # pair relation — the dsir scalar-broadcast shape
    "basket_lift",
    # the pairwise stage is |event types|² (bounded domain, ~5) over
    # 24-dim vectors — KB relations joined on an inequality
    "type_profile_similarity",
    "emb_near_dup_lsh",
    # emb_cosine_sim_histogram is a bounded-bin rollup OF
    # emb_near_dup_lsh's output — it inherits exactly that plan
    "emb_cosine_sim_histogram",
    # lsh_band_planner's histogram input is the documented-quadratic
    # exact baseline (the dedup_ngram_jaccard contract — the planner
    # needs SUB-threshold pair mass, which banding never
    # materializes); the planner math itself is a ≤51-row × 6-row
    # broadcast cross
    "lsh_band_planner",
    # lang_balance_sample normalizes the |langs|-row aggregate against
    # its 1-row integer-sum total — the dsir scalar-broadcast shape
    "lang_balance_sample",
    # corpus_zipf_fit crosses the 1-row vocab-size aggregate against
    # the 1-row regression fit, and ranks the bounded ZIPF_HEAD head
    # via a broadcast freq-histogram self-join — 1x1 / ≤|head|x|head|
    # BNLJs over KB relations
    "corpus_zipf_fit",
}


def test_tpch_q4_exists_is_semi_join(spark, sf_dir):
    # the EXISTS must plan as one LeftSemi hash join on orderkey, not a
    # per-row subquery or nested loop
    plan = _plan(spark, sf_dir, "tpch_q4")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q16_blacklist_is_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q16")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tpch_q19_disjunction_keeps_equi_join(spark, sf_dir):
    # the OR-of-bands must NOT break the partkey equi-join into a
    # nested loop: one broadcast hash join, bands as post-join filter
    plan = _plan(spark, sf_dir, "tpch_q19")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpch_q21_single_fact_shuffle(spark, sf_dir):
    # the EXISTS/NOT-EXISTS pair is computed from ONE per-order
    # aggregate — the plan must not contain two separate lineitem self
    # joins (i.e. at most one SortMergeJoin on the fact)
    plan = _plan(spark, sf_dir, "tpch_q21")
    assert plan.count("SortMergeJoin") <= 1
    assert "CartesianProduct" not in plan


def test_weighted_sample_is_topk_no_shuffle(spark, sf_dir):
    # the A-ES draw must compile to TakeOrderedAndProject on a map-only
    # draw-key projection — no corpus shuffle, no global sort
    plan = _plan(spark, sf_dir, "sample_weighted")
    assert "TakeOrderedAndProject" in plan


def test_mixture_budget_window_is_source_partitioned(spark, sf_dir):
    plan = _plan(spark, sf_dir, "mixture_budget_sample")
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan


def test_bq_query_side_scan_is_pruned(spark, sf_dir):
    # bq_topk's broadcast side must pack ONLY the |Q| query rows: the
    # scan under the BroadcastExchange carries the pushed In(vec_id)
    # filter (|Q| rows' lineage), the corpus-side scan does not, and
    # the per-query top-k stays group-limited (no global sort of the
    # Hamming scores)
    plan = _plan(spark, sf_dir, "emb_bq_topk")
    assert plan.count("BroadcastExchange") == 1
    corpus_side, bcast_side = plan.split("BroadcastExchange", 1)
    assert "In(vec_id" in bcast_side
    assert "In(vec_id" not in corpus_side
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan


def test_knn_bq_rescore_never_crosses_corpus(spark, sf_dir):
    # the ANN-swapped kNN labeler (VERDICT r10 item 3): the ONLY
    # cross join is stage 1's packed-sign-bit scan against the
    # broadcast packed query set; the float rescore reaches the
    # corpus exclusively through broadcast EQUI-joins on the
    # shortlist (qid, vec_id) — the full-width embedding column is
    # never crossed against the query set
    plan = _plan(spark, sf_dir, "emb_knn_label_bq")
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_bq_rerank_stage2_filters_corpus_no_smj(spark, sf_dir):
    # two-stage retrieval: the exact-cosine rescore joins the tiny
    # shortlist BROADCAST against the corpus scan — the corpus is
    # filtered in place, never exchanged for a sort-merge join
    plan = _plan(spark, sf_dir, "emb_bq_rerank")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "WindowGroupLimit" in plan


def test_tfidf_reuses_persisted_tf(spark, sf_dir):
    # the tf relation must come from the cache on at least one side
    # (without the persist the corpus explode re-ran per consumer)
    df = entry.queries()["tfidf_topk"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert (
        "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    )


#: queries where an UNPARTITIONED window is the intended plan (none
#: today — corpus_zipf_fit's global vocab row_number was the last one,
#: de-choked in round 4 to a TakeOrderedAndProject head + cumulative-
#: count rank; the audit now enforces its absence registry-wide)
_GLOBAL_WINDOW_ALLOWED: set[str] = set()


def test_registry_wide_scale_audit(spark, sf_dir):
    """Every registered query's physical plan is free of scale
    anti-patterns: no CartesianProduct anywhere, no unpartitioned
    window anywhere (except over provably-bounded aggregated
    relations), and BroadcastNestedLoopJoin only where a constant-size
    side makes it the correct plan."""
    offenders = {}
    for name, fn in entry.queries().items():
        plan = _plan(spark, sf_dir, name)
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian")
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in _BNLJ_ALLOWED
        ):
            flags.append("bnlj")
        if name not in _GLOBAL_WINDOW_ALLOWED:
            for frag in plan.split("Window [")[1:]:
                if ", [], [" in frag.split("\n", 1)[0]:
                    flags.append("global-window")
                    break
        if flags:
            offenders[name] = flags
    assert not offenders, f"scale anti-patterns: {offenders}"
