"""Invariant tests for the round-3 operators (TPC-H completion, text /
embedding analytics, PageRank) — properties that must hold on ANY
fixture, complementing the DuckDB oracle's value-equality check."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as entry
from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.plans import graph


def _run(spark, sf_dir, name):
    return entry.queries()[name](spark, sf_dir)


def test_tpch_q12_classes_partition_late_lines(spark, sf_dir):
    rows = _run(spark, sf_dir, "tpch_q12").collect()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late_total = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .count()
    )
    assert sum(r.high_line_count + r.low_line_count for r in rows) == (
        late_total
    )


def test_tpch_q8_share_is_a_fraction(spark, sf_dir):
    for r in _run(spark, sf_dir, "tpch_q8").collect():
        assert 0.0 <= r.mkt_share <= 1.0


def test_tpch_q2_suppliers_quote_the_part_min(spark, sf_dir):
    # every reported (part, cost) must equal the min cost over the
    # reported rows of that part (self-consistency of the min join)
    rows = _run(spark, sf_dir, "tpch_q2").collect()
    by_part: dict[int, list[float]] = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, []).append(r.supply_cost)
    for costs in by_part.values():
        assert all(math.isclose(c, min(costs)) for c in costs)


def test_tpch_q15_all_rows_tie_at_max(spark, sf_dir):
    revs = [r.total_revenue for r in _run(spark, sf_dir, "tpch_q15").collect()]
    assert revs and len(set(revs)) == 1


def test_tpch_q21_numwait_positive_and_bounded(spark, sf_dir):
    rows = _run(spark, sf_dir, "tpch_q21").collect()
    assert len(rows) <= 20
    assert all(r.numwait >= 1 for r in rows)


def test_unigram_surprisal_positive_and_token_exact(spark, sf_dir):
    rows = _run(spark, sf_dir, "unigram_logprob").collect()
    docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == docs
    # a corpus-unigram logprob is always > 0 unless a doc IS the corpus
    assert all(r.mean_surprisal > 0 for r in rows)
    assert all(r.n_toks >= 1 for r in rows)


def test_bpe_splits_at_least_as_fine_as_whitespace(spark, sf_dir):
    rows = _run(spark, sf_dir, "bpe_token_count").collect()
    assert all(r.n_bpe_tokens >= r.n_ws_tokens for r in rows)
    assert all(r.chars_per_token > 0 for r in rows)


def test_emb_centroid_accounts_every_vector(spark, sf_dir):
    rows = _run(spark, sf_dir, "emb_centroid").collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    per_dim: dict[int, int] = {}
    for r in rows:
        per_dim[r.dim] = per_dim.get(r.dim, 0) + r.n_vecs
    assert set(per_dim.values()) == {n_vecs}
    assert set(per_dim) == set(range(1, 65))


def test_tfidf_rank_and_nonnegativity(spark, sf_dir):
    rows = _run(spark, sf_dir, "tfidf_topk").collect()
    assert all(1 <= r.rnk <= 3 for r in rows)
    # df <= N => ln(N/df) >= 0 => tfidf >= 0
    assert all(r.tfidf >= 0 for r in rows)


def test_pagerank_ranks_are_probabilities(spark, sf_dir):
    rows = _run(spark, sf_dir, "graph_pagerank").collect()
    assert rows, "graph must be non-empty"
    assert all(0 < r.rank < 1 for r in rows)
    # descending with deterministic tie-break
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_pagerank_mass_is_conserved(spark, sf_dir):
    # full rank vector (not the top-20 query cut): total mass stays ~1
    # through the damped iterations on an undirected (dangling-free)
    # graph — the invariant that catches a broken transition matrix
    edges = graph._edges(spark, sf_dir)
    outw = edges.groupBy(F.col("src").alias("ow_src")).agg(
        F.round(F.sum("w"), 2).alias("total_w")
    )
    trans = edges.join(outw, F.col("src") == F.col("ow_src")).select(
        "src", "dst", F.round(F.col("w") / F.col("total_w"), 10).alias("p")
    )
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(3):
        ranks = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit((1 - graph._DAMPING) / n)
                    + F.lit(graph._DAMPING) * F.sum(F.col("p") * F.col("rank"))
                ).alias("rank")
            )
        )
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert math.isclose(total, 1.0, rel_tol=1e-6)


def test_weighted_sample_draws_positive_and_sized(spark, sf_dir):
    rows = _run(spark, sf_dir, "sample_weighted").collect()
    assert 0 < len(rows) <= 100
    assert all(r.draw_key > 0 for r in rows)


def test_mixture_budget_never_exceeded(spark, sf_dir):
    rows = _run(spark, sf_dir, "mixture_budget_sample").collect()
    assert rows
    assert all(r.cum_chars <= r.budget for r in rows)
    # each source admits at least its hash-first doc when it fits
    assert len({r.source for r in rows}) >= 1


def test_prefix_dedup_groups_are_real_groups(spark, sf_dir):
    rows = _run(spark, sf_dir, "dedup_prefix").collect()
    assert all(r.n_docs > 1 for r in rows)


def test_event_transition_probabilities_sum_to_one(spark, sf_dir):
    rows = _run(spark, sf_dir, "event_transitions").collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.p
    for total in by_from.values():
        assert math.isclose(total, 1.0, abs_tol=1e-4)


def test_doc_entropy_bounded_by_alphabet(spark, sf_dir):
    rows = _run(spark, sf_dir, "doc_entropy").collect()
    docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == docs
    # 0 <= H <= log2(distinct chars) <= log2(n_chars)
    assert all(
        0.0 <= r.entropy_bits <= math.log2(max(r.n_chars_ctd, 2))
        for r in rows
    )


def test_bpe_merges_are_valid_bpe(spark, sf_dir):
    """Each learned merge must (a) strictly non-increase in count as
    steps proceed over the SAME corpus slice only when pairs are
    disjoint — so assert the weaker invariants that always hold:
    counts positive, pairs well-formed over [a-z@], and no pair is
    learned twice."""
    rows = _run(spark, sf_dir, "bpe_learn_merges").collect()
    assert [r.step for r in rows] == list(range(1, len(rows) + 1))
    seen = set()
    for r in rows:
        left, right = r.pair.split(" ")
        assert left and right
        assert set(left + right) <= set("abcdefghijklmnopqrstuvwxyz@")
        assert r.cnt > 0
        assert r.pair not in seen
        seen.add(r.pair)
