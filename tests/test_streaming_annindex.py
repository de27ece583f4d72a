"""Streaming IVFADC ingest index: frozen-model encode per batch,
batch-vs-corpus ADC probe, replay safety, compaction — and the
headline pin: the stream-folded index answers queries EXACTLY like
the one-pass batch operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from projetbigdatastreaming_spark.catalog import load_table
from projetbigdatastreaming_spark.plans.llmdata import (
    IVF_N_LISTS,
    IVF_NPROBE,
    PQ_K,
    PQ_M,
    QUERY_VEC_IDS,
    TOPK,
)
from projetbigdatastreaming_spark.streaming.annindex import (
    ann_ingest_writer,
    build_ann_model,
    compact_ann_index,
    load_ann_model,
    read_ann_codes,
)

SF = "/root/testdata/sf0.001"


def _ingest_in_batches(spark, tmp_path, n_batches=3):
    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    )
    index_dir = str(tmp_path / "ann_index")
    flags_dir = str(tmp_path / "ann_flags")
    build_ann_model(emb, index_dir, n_lists=IVF_N_LISTS, k=PQ_K)
    write = ann_ingest_writer(
        index_dir, flags_dir, k_top=TOPK, nprobe=IVF_NPROBE, m=PQ_M
    )
    for b in range(n_batches):
        write(emb.where(F.col("vec_id") % n_batches == b), b)
    return emb, index_dir, flags_dir, write


def test_stream_folded_index_equals_batch_ivfpq(spark, tmp_path):
    """After full ingest, searching the folded code index under the
    persisted model must return EXACTLY the batch operator's rows —
    the model round-trips through parquet, the per-batch encodes
    equal the one-pass encode, and the fold loses nothing."""
    from projetbigdatastreaming_spark.operators.similarity import (
        ivfpq_search,
        ivfpq_topk,
    )

    emb, index_dir, _, _ = _ingest_in_batches(spark, tmp_path)
    cents, cb = load_ann_model(spark, index_dir)
    queries = emb.where(F.col("vec_id").isin(QUERY_VEC_IDS))
    got = sorted(
        map(
            tuple,
            ivfpq_search(
                read_ann_codes(spark, index_dir),
                queries,
                cents,
                cb,
                TOPK,
                IVF_NPROBE,
                PQ_M,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            ivfpq_topk(
                emb,
                QUERY_VEC_IDS,
                TOPK,
                n_lists=IVF_N_LISTS,
                nprobe=IVF_NPROBE,
                m=PQ_M,
                k=PQ_K,
            ).collect(),
        )
    )
    assert got == want and len(got) == len(QUERY_VEC_IDS) * TOPK


def test_ann_flags_cross_batch_and_replay(spark, tmp_path):
    """A later batch's vector is flagged against EARLIER vectors only
    (batch-vs-corpus); the first batch flags nothing; replaying a
    batch under the same batch_id restates its partitions without
    duplication."""
    emb, index_dir, flags_dir, write = _ingest_in_batches(
        spark, tmp_path
    )
    flags = spark.read.parquet(flags_dir)
    n_batches = 3
    # first batch probes an empty corpus
    assert flags.where("batch_id = 0").count() == 0
    # every flagged neighbor was ingested in an EARLIER batch, every
    # query vector in the flagging batch itself, never a self-pair
    for r in flags.collect():
        assert r.vec_id % n_batches < r.batch_id
        assert r.qid % n_batches == r.batch_id
        assert r.qid != r.vec_id
    # later batches do flag neighbors (10 per new vector at k=TOPK
    # once the corpus is big enough)
    assert flags.where("batch_id = 2").count() > 0

    before_flags = sorted(map(tuple, flags.collect()))
    before_codes = sorted(
        map(tuple, read_ann_codes(spark, index_dir).collect())
    )
    write(emb.where(F.col("vec_id") % 3 == 2), 2)  # redelivery
    assert (
        sorted(map(tuple, spark.read.parquet(flags_dir).collect()))
        == before_flags
    )
    assert (
        sorted(map(tuple, read_ann_codes(spark, index_dir).collect()))
        == before_codes
    )


def test_ann_index_compaction_preserves_answers(spark, tmp_path):
    """compact_ann_index folds codes to one base partition; searches
    and subsequent ingests are unchanged; the CLI op drives it."""
    import os

    from projetbigdatastreaming_spark.__main__ import main
    from projetbigdatastreaming_spark.operators.similarity import (
        ivfpq_search,
    )
    from projetbigdatastreaming_spark.streaming.sketches import BASE_ID

    emb, index_dir, flags_dir, write = _ingest_in_batches(
        spark, tmp_path
    )
    cents, cb = load_ann_model(spark, index_dir)
    queries = emb.where(F.col("vec_id").isin(QUERY_VEC_IDS))

    def answers():
        return sorted(
            map(
                tuple,
                ivfpq_search(
                    read_ann_codes(spark, index_dir),
                    queries,
                    cents,
                    cb,
                    TOPK,
                    IVF_NPROBE,
                    PQ_M,
                ).collect(),
            )
        )

    before = answers()
    assert compact_ann_index(spark, index_dir) > 0
    parts = [
        n
        for n in os.listdir(f"{index_dir}/codes")
        if n.startswith("batch_id=")
    ]
    assert parts == [f"batch_id={BASE_ID}"], parts
    assert answers() == before

    # a post-compaction ingest still probes and folds correctly
    rc = main(["maintain", "compact-ann", index_dir], spark=spark)
    assert rc == 0
    write(emb.where(F.col("vec_id") % 3 == 1), 7)
    assert spark.read.parquet(flags_dir).where("batch_id = 7").count() > 0
    assert answers() == before  # dedup absorbs the restated vectors


def test_ann_compaction_kill_point_probe_still_exact(spark, tmp_path):
    """Kill the code compaction between promote and source deletes
    (every code row exists BOTH in the base and in its source
    partition): read_ann_codes' dropDuplicates keeps searches exact
    with no recovery step, a post-kill ingest still probes/folds
    correctly, and the next compaction converges."""
    import os as _os
    from unittest import mock

    from pyspark.sql import functions as F

    from projetbigdatastreaming_spark.operators.similarity import (
        ivfpq_search,
    )
    from projetbigdatastreaming_spark.streaming.sketches import STAGING_ID

    emb, index_dir, flags_dir, write = _ingest_in_batches(
        spark, tmp_path
    )
    cents, cb = load_ann_model(spark, index_dir)
    queries = emb.where(F.col("vec_id").isin(QUERY_VEC_IDS))

    def answers():
        return sorted(
            map(
                tuple,
                ivfpq_search(
                    read_ann_codes(spark, index_dir),
                    queries,
                    cents,
                    cb,
                    TOPK,
                    IVF_NPROBE,
                    PQ_M,
                ).collect(),
            )
        )

    want = answers()
    real_rename = _os.rename

    def dying_rename(src, dst):
        real_rename(src, dst)
        if src.endswith(f"batch_id={STAGING_ID}"):
            raise RuntimeError("killed after promote, before deletes")

    with mock.patch("os.rename", side_effect=dying_rename):
        try:
            compact_ann_index(spark, index_dir)
        except RuntimeError:
            pass
    # base AND all source partitions present: reader still exact
    parts = [
        n
        for n in _os.listdir(f"{index_dir}/codes")
        if n.startswith("batch_id=")
    ]
    assert len(parts) == 4, parts  # base + 3 sources
    assert answers() == want
    # a post-kill ingest probes and folds correctly
    write(emb.where(F.col("vec_id") % 3 == 1), 9)
    assert spark.read.parquet(flags_dir).where("batch_id = 9").count() > 0
    assert answers() == want
    # next compaction converges
    assert compact_ann_index(spark, index_dir) > 0
    assert answers() == want


BQ_SHORT = 30


def _bq_ingest_in_batches(spark, tmp_path, n_batches=3):
    from projetbigdatastreaming_spark.streaming.annindex import (
        bq_ann_ingest_writer,
    )

    emb = load_table(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    )
    index_dir = str(tmp_path / "bq_ann_index")
    flags_dir = str(tmp_path / "bq_ann_flags")
    build_ann_model(emb, index_dir, n_lists=IVF_N_LISTS, k=PQ_K)
    write = bq_ann_ingest_writer(
        index_dir, flags_dir, k_top=TOPK, m=PQ_M, shortlist=BQ_SHORT
    )
    for b in range(n_batches):
        write(emb.where(F.col("vec_id") % n_batches == b), b)
    return emb, index_dir, flags_dir, write


def test_bq_stream_folded_index_equals_batch_two_stage(spark, tmp_path):
    """The two-stage (BQ shortlist + ADC rescore) search over the
    stream-folded codes+bqwords state must return EXACTLY the one-pass
    batch operator's rows — the bqwords family folds losslessly next
    to the codes, under the same frozen model."""
    from projetbigdatastreaming_spark.operators.similarity import (
        bq_adc_search,
        bq_ivfpq_rerank_topk,
    )
    from projetbigdatastreaming_spark.streaming.annindex import (
        read_ann_words,
    )

    emb, index_dir, _, _ = _bq_ingest_in_batches(spark, tmp_path)
    cents, cb = load_ann_model(spark, index_dir)
    queries = emb.where(F.col("vec_id").isin(QUERY_VEC_IDS))
    got = sorted(
        map(
            tuple,
            bq_adc_search(
                read_ann_codes(spark, index_dir),
                read_ann_words(spark, index_dir),
                queries,
                cents,
                cb,
                TOPK,
                BQ_SHORT,
                PQ_M,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            bq_ivfpq_rerank_topk(
                emb,
                QUERY_VEC_IDS,
                TOPK,
                n_lists=IVF_N_LISTS,
                m=PQ_M,
                k=PQ_K,
                shortlist=BQ_SHORT,
            ).collect(),
        )
    )
    assert got == want and len(got) == len(QUERY_VEC_IDS) * TOPK


def test_bq_ingest_flags_and_replay(spark, tmp_path):
    """Batch-vs-corpus semantics and replay safety for the two-stage
    writer: first batch flags nothing, neighbors always come from
    earlier batches, and a redelivery restates without duplication."""
    emb, index_dir, flags_dir, write = _bq_ingest_in_batches(
        spark, tmp_path
    )
    from projetbigdatastreaming_spark.streaming.annindex import (
        read_ann_words,
    )

    flags = spark.read.parquet(flags_dir)
    assert flags.where("batch_id = 0").count() == 0
    for r in flags.collect():
        assert r.vec_id % 3 < r.batch_id
        assert r.qid % 3 == r.batch_id
        assert r.qid != r.vec_id
    assert flags.where("batch_id = 2").count() > 0

    before_flags = sorted(map(tuple, flags.collect()))
    before_words = sorted(
        map(tuple, read_ann_words(spark, index_dir).collect())
    )
    write(emb.where(F.col("vec_id") % 3 == 2), 2)  # redelivery
    assert (
        sorted(map(tuple, spark.read.parquet(flags_dir).collect()))
        == before_flags
    )
    assert (
        sorted(map(tuple, read_ann_words(spark, index_dir).collect()))
        == before_words
    )


def test_bq_index_retraction_and_compaction(spark, tmp_path):
    """Retraction flows through BOTH stages: a tombstoned vector
    leaves read_ann_words/read_ann_codes and the next batch's flags
    immediately; compaction drops its rows from codes AND bqwords,
    consumes the tombstones, and the folded search then equals the
    frozen-model batch search over corpus-minus-victim."""
    from projetbigdatastreaming_spark.operators.similarity import (
        bq_adc_search,
        bq_pack,
        ivfpq_encode,
    )
    from projetbigdatastreaming_spark.streaming.annindex import (
        read_ann_words,
        retract_vectors,
    )
    from projetbigdatastreaming_spark.streaming.tombstones import (
        pending_tombstone_files,
    )

    emb, index_dir, flags_dir, write = _bq_ingest_in_batches(
        spark, tmp_path, n_batches=2
    )
    victim = int(
        spark.read.parquet(flags_dir)
        .groupBy("vec_id")
        .count()
        .orderBy(F.desc("count"), "vec_id")
        .first()["vec_id"]
    )
    retract_vectors(spark, index_dir, [victim])
    assert victim not in {
        r.vec_id for r in read_ann_words(spark, index_dir).collect()
    }

    write(emb.where(F.col("vec_id") % 3 == 2), 2)
    b2 = {
        r.vec_id
        for r in spark.read.parquet(flags_dir)
        .where("batch_id = 2")
        .collect()
    }
    assert b2 and victim not in b2

    assert compact_ann_index(spark, index_dir) > 0
    for fam in ("codes", "bqwords"):
        raw = {
            r.vec_id
            for r in spark.read.parquet(f"{index_dir}/{fam}").collect()
        }
        assert victim not in raw
    assert pending_tombstone_files(f"{index_dir}/tombstones") == []

    # folded search == frozen-model batch search over corpus-minus-victim
    cents, cb = load_ann_model(spark, index_dir)
    kept = emb.where(F.col("vec_id") != victim)
    queries = kept.where(F.col("vec_id").isin(QUERY_VEC_IDS))
    got = sorted(
        map(
            tuple,
            bq_adc_search(
                read_ann_codes(spark, index_dir),
                read_ann_words(spark, index_dir),
                queries,
                cents,
                cb,
                TOPK,
                BQ_SHORT,
                PQ_M,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            bq_adc_search(
                ivfpq_encode(kept, cents, cb, PQ_M),
                bq_pack(kept),
                queries,
                cents,
                cb,
                TOPK,
                BQ_SHORT,
                PQ_M,
            ).collect(),
        )
    )
    assert got == want


def test_bq_index_compaction_kill_between_families(
    spark, tmp_path, monkeypatch
):
    """Kill compact_ann_index after the codes table compacted but
    before bqwords: tombstones stay pending, both readers stay
    retraction-true, the rerun converges and consumes."""
    import pytest

    from projetbigdatastreaming_spark.streaming import annindex, curation
    from projetbigdatastreaming_spark.streaming.annindex import (
        read_ann_words,
        retract_vectors,
    )
    from projetbigdatastreaming_spark.streaming.tombstones import (
        pending_tombstone_files,
    )

    emb, index_dir, flags_dir, write = _bq_ingest_in_batches(
        spark, tmp_path, n_batches=2
    )
    victim = int(
        spark.read.parquet(flags_dir).select("vec_id").first()["vec_id"]
    )
    retract_vectors(spark, index_dir, [victim])

    real = curation.compact_state
    calls = {"n": 0}

    def killer(spark_, state_dir, tombs=None, id_col=None):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("killed between codes and bqwords")
        return real(spark_, state_dir, tombs, id_col)

    monkeypatch.setattr(curation, "compact_state", killer)
    with pytest.raises(RuntimeError):
        annindex.compact_ann_index(spark, index_dir)
    monkeypatch.undo()

    assert pending_tombstone_files(f"{index_dir}/tombstones") != []
    assert victim not in {
        r.vec_id for r in read_ann_codes(spark, index_dir).collect()
    }
    assert victim not in {
        r.vec_id for r in read_ann_words(spark, index_dir).collect()
    }

    assert compact_ann_index(spark, index_dir) > 0
    assert pending_tombstone_files(f"{index_dir}/tombstones") == []
    for fam in ("codes", "bqwords"):
        raw = {
            r.vec_id
            for r in spark.read.parquet(f"{index_dir}/{fam}").collect()
        }
        assert victim not in raw
