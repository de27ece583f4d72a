"""Property-based tests (hypothesis): operator semantics vs independent
Python models on randomized inputs.  Few examples, batched per example,
to keep Spark-job overhead bounded."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from projetbigdatastreaming_spark.operators import dedup, joins

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_dt = st.datetimes(
    min_value=datetime.datetime(2000, 1, 1),
    max_value=datetime.datetime(2030, 12, 31),
)


@given(ts_list=st.lists(_dt, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_quarter_hour_window_matches_model(spark, ts_list):
    """window(15 min).start == epoch-floor model for arbitrary datetimes."""
    df = spark.createDataFrame([Row(i=i, ts=t) for i, t in enumerate(ts_list)])
    got = {
        r.i: r.ws
        for r in df.select(
            "i",
            F.window(F.col("ts").cast("timestamp_ntz"), "15 minutes")
            .start.alias("ws"),
        ).collect()
    }
    for i, t in enumerate(ts_list):
        epoch = int(
            (t - datetime.datetime(1970, 1, 1)).total_seconds()
        )
        want = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            seconds=(epoch // 900) * 900
        )
        assert got[i] == want, (t, got[i], want)


_words = st.sampled_from(
    "the a spark query join sort hash table scan merge stream batch".split()
)
_doc = st.lists(_words, min_size=4, max_size=30).map(" ".join)


@given(docs=st.lists(_doc, min_size=2, max_size=12))
@settings(**_SETTINGS)
def test_minhash_pairs_sound_and_complete_at_high_jaccard(spark, docs):
    """The operator's actual contract: (a) soundness — every emitted
    pair really has jaccard >= threshold (the exact verifier
    guarantees this unconditionally); (b) completeness for
    high-similarity pairs — at j >= 0.9 the 16×4 band scheme misses
    with probability ~4e-8, so a miss there is a real bug.  Pairs in
    the mid band (0.5 <= j < 0.9) MAY legitimately be pruned
    (detection probability at j=0.5 is only ~0.64).
    """

    def shingles(text):
        toks = text.split(" ")
        if len(toks) < 3:
            return {" ".join(toks)}
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    def jac(i, j):
        sa, sb = shingles(docs[i]), shingles(docs[j])
        return len(sa & sb) / len(sa | sb)

    all_pairs = [
        (i, j)
        for i in range(len(docs))
        for j in range(i + 1, len(docs))
    ]
    above_threshold = {(i, j) for i, j in all_pairs if jac(i, j) >= 0.5}
    certain = {(i, j) for i, j in all_pairs if jac(i, j) >= 0.9}
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(docs)]
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_near_duplicates(df, threshold=0.5).collect()
    }
    assert got <= above_threshold  # sound: no false positives survive
    assert certain <= got  # complete where the band math guarantees it


@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), _dt), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_asof_join_matches_model(spark, events):
    """Strict as-of self-join == per-row python argmax of earlier ts."""
    rows = [
        Row(user=u, eid=i, ts=t) for i, (u, t) in enumerate(events)
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.eid: r.asof_eid
        for r in joins.asof_join(
            df, df, "user", "ts", "ts", ["eid"], strict=True
        ).collect()
    }
    for r in rows:
        earlier = [
            x for x in rows if x.user == r.user and x.ts < r.ts
        ]
        if not earlier:
            assert got[r.eid] is None
        else:
            best_ts = max(x.ts for x in earlier)
            # deterministic pick: max eid among the max-ts candidates
            # (tertiary sort key is the payload column)
            best = max(
                x.eid for x in earlier if x.ts == best_ts
            )
            assert got[r.eid] == best, (r.eid, got[r.eid], best)


def _winnow_model(text, k=8, w=4):
    """Pure-Python reference for functions.text.winnow_fingerprints."""
    import hashlib
    import re

    s = re.sub(r"\s+", " ", text.lower()).strip()

    def h(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    if len(s) < k:
        return {h(s)}
    hs = [h(s[p : p + k]) for p in range(len(s) - k + 1)]
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}


_text = st.text(
    alphabet="abcdefgh XY.,\t", min_size=0, max_size=60
)


@given(texts=st.lists(_text, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_winnow_fingerprints_match_model(spark, texts):
    """winnow_fingerprints (nested higher-order SQL expressions) equals
    the straightforward Python model on arbitrary text, including
    degenerate short/empty inputs."""
    from projetbigdatastreaming_spark.functions.text import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnow_fingerprints("text").alias("fps")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _winnow_model(t), (i, repr(t))


@given(
    shared=st.text(alphabet="mnopqrst", min_size=11, max_size=20),
    pad_a=_text,
    pad_b=_text,
)
@settings(**_SETTINGS)
def test_winnow_guarantee_shared_run_yields_common_fingerprint(
    spark, shared, pad_a, pad_b
):
    """The winnowing guarantee (SIGMOD'03): any shared substring of
    length >= k + w - 1 (= 11 here) produces at least one common
    fingerprint between the two documents."""
    from projetbigdatastreaming_spark.functions.text import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=0, text=f"{pad_a} {shared}"),
            Row(doc_id=1, text=f"{shared} {pad_b}"),
        ]
    )
    got = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnow_fingerprints("text").alias("fps")
        ).collect()
    }
    assert got[0] & got[1], (repr(shared), repr(pad_a), repr(pad_b))


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["web", "book", "code"]),
            st.integers(min_value=1, max_value=500),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_pack_sequences_invariants(spark, rows):
    """Every pack's token total stays under budget + its largest doc
    (the running-sum bound), packs are contiguous per source, and no
    document is lost or duplicated."""
    from pyspark.sql import Window

    budget = 64
    df = spark.createDataFrame(
        [(i, src, n) for i, (src, n) in enumerate(rows)],
        "doc_id long, source string, n_tok long",
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = df.withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / budget),
    ).collect()

    assert len(packed) == len(rows)  # nothing lost
    by_pack: dict = {}
    for r in packed:
        by_pack.setdefault((r.source, r.pack_id), []).append(r)
    for (_src, _pid), docs in by_pack.items():
        total = sum(d.n_tok for d in docs)
        assert total <= budget + max(d.n_tok for d in docs)
    # contiguity: doc_ids within a source must map to non-decreasing packs
    for src in {r.source for r in packed}:
        seq = sorted(
            (r.doc_id, r.pack_id) for r in packed if r.source == src
        )
        pids = [p for _d, p in seq]
        assert pids == sorted(pids)


@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.text("ab", min_size=1, max_size=3),
        min_size=1,
        max_size=10,
    ),
    updates=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.text("cd", min_size=1, max_size=3),
        min_size=1,
        max_size=10,
    ),
)
@settings(**_SETTINGS)
def test_merge_upsert_matches_dict_update(spark, tmp_path_factory, base, updates):
    """merge_upsert on an unpartitioned table is exactly dict.update():
    updated keys replaced, new keys inserted, others untouched — and a
    second identical merge changes nothing."""
    from projetbigdatastreaming_spark.maintenance import merge_upsert

    path = str(tmp_path_factory.mktemp("mu") / "t")
    spark.createDataFrame(
        list(base.items()), "k long, v string"
    ).write.parquet(path)
    upd = spark.createDataFrame(list(updates.items()), "k long, v string")

    merge_upsert(spark, path, upd, ["k"])
    want = {**base, **updates}
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == want

    merge_upsert(spark, path, upd, ["k"])  # idempotent
    got2 = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got2 == want


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=4,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_iqr_fences_match_discrete_percentile_model(spark, vals):
    """Tukey-fence membership computed with percentile_disc must equal
    the textbook model (sorted[ceil(p*n)-1] selection): discrete
    quantiles are data values, so membership is engine-deterministic."""
    import math

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    fences = df.agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY v)").alias("p25"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY v)").alias("p75"),
    )
    got = {
        r.id
        for r in df.crossJoin(fences)
        .where(
            (F.col("v") > F.col("p75") + 1.5 * (F.col("p75") - F.col("p25")))
            | (F.col("v") < F.col("p25") - 1.5 * (F.col("p75") - F.col("p25")))
        )
        .collect()
    }
    s = sorted(vals)
    n = len(s)
    p25 = float(s[math.ceil(0.25 * n) - 1])
    p75 = float(s[math.ceil(0.75 * n) - 1])
    lo, hi = p25 - 1.5 * (p75 - p25), p75 + 1.5 * (p75 - p25)
    want = {i for i, v in enumerate(vals) if v > hi or v < lo}
    assert got == want


def test_decontaminate_flags_exactly_the_overlapping_doc(spark, tmp_path):
    """Soundness on a hand-built fixture: a probe doc sharing one
    4-gram with the benchmark slice (doc_id % 50 == 0) is flagged with
    overlap 1; a disjoint probe doc is not flagged."""
    import __spark_entry__ as entry

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f", "en", "web", 11),     # benchmark (0 % 50 == 0)
            (1, "x y a b c d z", "en", "web", 13),   # shares 'a b c d'
            (2, "p q r s t u", "en", "web", 11),     # disjoint
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = entry.queries()["decontaminate"](spark, str(tmp_path)).collect()
    assert [(r.doc_id, r.n_overlap) for r in rows] == [(1, 1)]


@given(
    st.integers(8, 40),
    st.integers(8, 40),
    st.integers(55, 95),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=15, deadline=None)
def test_jpeg_roundtrip_error_bounded(w, h, quality, seed):
    """Any RGB image round-trips through the baseline JPEG codec with
    shape preserved and bounded per-pixel error (noise is the worst
    case; the bound is loose but catches structural mis-decodes like
    plane swaps, block shifts, or zigzag errors, which produce errors
    an order of magnitude larger)."""
    import numpy as np

    from projetbigdatastreaming_spark.operators import jpeg

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = jpeg.jpeg_decode_pixels(jpeg.jpeg_encode(px, quality=quality))
    assert out is not None and out.shape == (h, w, 3)
    err = np.abs(out.astype(int) - px.astype(int)).mean()
    assert err < 40.0, f"mean abs error {err} — structural mis-decode"


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=50, deadline=None)
def test_jpeg_decoder_never_crashes_on_garbage(payload):
    """Crawl-garbage contract: arbitrary bytes (including ones opening
    with the JPEG SOI marker) must yield nulls, never raise."""
    from projetbigdatastreaming_spark.operators import jpeg

    for p in (payload, b"\xff\xd8" + payload):
        d = jpeg.jpeg_decode(p)
        assert set(d) == {"width", "height", "feature_hash"}


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=50, deadline=None)
def test_mp4_metadata_never_crashes_on_garbage(payload):
    """Same crawl-garbage contract for the ISO-BMFF box parser —
    including bytes that open with a plausible ftyp box header."""
    from projetbigdatastreaming_spark.operators.codecs import mp4_metadata

    for p in (payload, b"\x00\x00\x00\x14ftyp" + payload):
        d = mp4_metadata(p)
        assert set(d) == {
            "major_brand", "duration_ms", "n_tracks", "width", "height",
        }


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=50, deadline=None)
def test_mp3_metadata_never_crashes_on_garbage(payload):
    from projetbigdatastreaming_spark.operators.codecs import mp3_metadata

    for p in (payload, b"\xff\xfb" + payload, b"ID3" + payload):
        d = mp3_metadata(p)
        assert set(d) == {
            "duration_ms", "n_frames", "sample_rate_hz", "bitrate_kbps",
            "is_vbr",
        }


@given(
    dur=st.integers(min_value=0, max_value=10**7),
    ts=st.sampled_from([600, 1000, 90000]),
    tracks=st.lists(
        st.tuples(st.integers(0, 4096), st.integers(0, 4096)),
        min_size=0,
        max_size=5,
    ),
)
@settings(max_examples=50, deadline=None)
def test_mp4_builder_decoder_roundtrip(dur, ts, tracks):
    """mp4_metadata reads back exactly what mp4_encode_minimal wrote,
    for arbitrary durations, timescales, and track lists."""
    from projetbigdatastreaming_spark.operators.codecs import (
        mp4_encode_minimal,
        mp4_metadata,
    )

    m = mp4_metadata(
        mp4_encode_minimal(dur, timescale=ts, tracks=tuple(tracks))
    )
    # builder stores duration in timescale units (floor), reader
    # converts back with floor — the composed error is < 1ms + 1 unit
    assert m["n_tracks"] == len(tracks)
    assert abs(m["duration_ms"] - dur) <= (1000 // ts) + 1
    first_visual = next(((w, h) for w, h in tracks if w and h), None)
    assert (m["width"], m["height"]) == (first_visual or (None, None))


@given(
    n=st.integers(min_value=1, max_value=40),
    kbps=st.sampled_from([32, 64, 128, 192, 320]),
    rate=st.sampled_from([32000, 44100, 48000]),
)
@settings(max_examples=50, deadline=None)
def test_mp3_builder_decoder_roundtrip(n, kbps, rate):
    from projetbigdatastreaming_spark.operators.codecs import (
        mp3_encode_minimal,
        mp3_metadata,
    )

    m = mp3_metadata(mp3_encode_minimal(n, kbps, rate))
    assert m["n_frames"] == n
    assert m["sample_rate_hz"] == rate
    assert m["bitrate_kbps"] == kbps and m["is_vbr"] is False
    assert m["duration_ms"] == int(n * 1152 * 1000 // rate)


@given(
    hist=st.lists(st.text(min_size=0, max_size=12), min_size=0, max_size=30),
    probe=st.lists(st.text(min_size=0, max_size=12), min_size=1, max_size=10),
)
@settings(**_SETTINGS)
def test_bloom_no_false_negatives_property(spark, hist, probe):
    """For ANY fingerprint sets: every probe whose fingerprint is in
    the history must bloom-hit (the one-sided guarantee), and the
    bitmap never exceeds BLOOM_BITS/32 words."""
    from projetbigdatastreaming_spark.operators.sketches import (
        BLOOM_BITS,
        bloom_cells,
        bloom_probe,
    )

    hdf = spark.createDataFrame(
        [(h,) for h in hist] or [("__never__",)], "fp string"
    )
    pdf = spark.createDataFrame([(p,) for p in probe], "fp string")
    bitmap = bloom_cells(hdf, "fp")
    assert bitmap.count() <= BLOOM_BITS // 32
    got = {r.fp: r.bloom_hit for r in bloom_probe(pdf, bitmap).collect()}
    members = set(hist) if hist else {"__never__"}
    for p in set(probe):
        if p in members:
            assert got[p] == 1, p


@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-10, max_value=10,
                allow_nan=False, allow_infinity=False, width=32,
            ),
            min_size=8, max_size=8,
        ),
        min_size=1, max_size=20,
    )
)
@settings(**_SETTINGS)
def test_pq_codes_property(spark, vecs):
    """For ANY embedding corpus (dims divisible by m): codes stay in
    [0, k^m), errors are non-negative, and every input vector gets
    exactly one code row."""
    from projetbigdatastreaming_spark.operators.similarity import pq_codes

    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = pq_codes(emb, m=2, k=4).collect()
    assert len(out) == len(vecs)
    for r in out:
        assert 0 <= r.code < 4**2
        assert r.err_q4 >= 0


@given(payload=st.binary(min_size=0, max_size=64))
@settings(**_SETTINGS)
def test_sniff_and_auto_decode_never_crash(spark, payload):
    """For ANY byte string: sniff_format returns a known label or
    None, and the auto codecs null out instead of raising (the
    garbage-tolerant contract at the Arrow boundary)."""
    from projetbigdatastreaming_spark.operators import multimodal as mm

    fmt = mm.sniff_format(payload)
    assert fmt in {
        None, "bmp", "png", "jpeg", "wav", "y4m", "mp4", "mpeg_audio",
    }
    img = mm.auto_image_decode(payload)
    assert set(img) == {"width", "height", "feature_hash"}
    aud = mm.auto_audio_features(payload)
    assert set(aud) == {"duration_ms", "rms_q8"}
    assert isinstance(mm.auto_video_frames(payload, 2), list)
    assert mm.auto_image_resize(payload, 4, 4) is None or isinstance(
        mm.auto_image_resize(payload, 4, 4), bytes
    )


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # freq
            st.integers(min_value=0, max_value=50),  # cents
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_pareto_frontier_matches_bruteforce_dominance(spark, rows):
    """The windowed skyline equals the O(n²) dominance definition:
    keep (f, c) iff no other row has f' >= f AND c' >= c with one
    strict."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [Row(k=i, freq=f, cents=c) for i, (f, c) in enumerate(rows)]
    )
    w_gt = Window.orderBy("cents").rangeBetween(1, Window.unboundedFollowing)
    w_eq = Window.partitionBy("cents")
    got = {
        r.k
        for r in df.select(
            "k",
            "freq",
            F.max("freq").over(w_gt).alias("mx_gt"),
            F.max("freq").over(w_eq).alias("mx_eq"),
        )
        .where(
            (F.col("mx_gt").isNull() | (F.col("mx_gt") < F.col("freq")))
            & (F.col("mx_eq") <= F.col("freq"))
        )
        .collect()
    }
    want = set()
    for i, (f, c) in enumerate(rows):
        dominated = any(
            (f2 >= f and c2 >= c and (f2 > f or c2 > c))
            for j, (f2, c2) in enumerate(rows)
            if j != i
        )
        # an identical duplicate of (f, c) does NOT dominate it — but
        # the brute force above treats a twin row (f2==f, c2==c) as
        # non-dominating already since neither strict holds
        if not dominated:
            want.add(i)
    assert got == want, (rows, got, want)


@given(
    iv=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),  # start
            st.integers(min_value=1, max_value=30),  # duration
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_sweepline_concurrency_matches_bruteforce(spark, iv):
    """The +1/−1 running-sum max equals brute-force point-stabbing
    max over half-open intervals [s, s+d)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [Row(i=i, s=s, e=s + d) for i, (s, d) in enumerate(iv)]
    )
    pts = df.selectExpr("s AS t", "1 AS delta", "i").unionAll(
        df.selectExpr("e AS t", "-1 AS delta", "i")
    )
    w = Window.orderBy("t", "delta", "i").rowsBetween(
        Window.unboundedPreceding, 0
    )
    got = (
        pts.withColumn("conc", F.sum("delta").over(w))
        .agg(F.max("conc"))
        .collect()[0][0]
    )
    want = max(
        sum(1 for (s, d) in iv if s <= p < s + d)
        for p in (s for (s, _d) in iv)
    )  # max concurrency is attained at some interval start
    assert got == want, (iv, got, want)


@given(
    devs=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_cusum_prefix_identity_matches_recurrence(spark, devs):
    """S_i = P_i − min(0, min_{j≤i} P_j) (the windowed form
    cusum_changepoints uses) equals the textbook recurrence
    S_i = max(0, S_{i−1} + dev_i)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [Row(i=i, dev=d) for i, d in enumerate(devs)]
    )
    w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    got = [
        r.s
        for r in df.withColumn("pfx", F.sum("dev").over(w))
        .withColumn("pmin", F.min("pfx").over(w))
        .selectExpr("i", "pfx - LEAST(pmin, 0) AS s")
        .orderBy("i")
        .collect()
    ]
    want, s = [], 0
    for d in devs:
        s = max(0, s + d)
        want.append(s)
    assert got == want, (devs, got, want)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 4),            # part
            st.integers(1, 20),           # qty
            st.sampled_from(["F", "O"]),  # supply / demand
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_fifo_interval_clamp_matches_sequential_walk(spark, rows):
    """The interval-clamp FIFO identity == the literal walk-the-stock
    loop on arbitrary demand/supply mixes: per-row fills agree, fills
    are greedy-maximal (earlier demand exhausts stock first), and per
    part Σfill == min(Σdemand, supply)."""
    from pyspark.sql import Window

    data = [
        Row(part=p, seq=i, qty=q, status=s)
        for i, (p, q, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data)
    supply = df.where("status = 'F'").groupBy("part").agg(
        F.sum("qty").alias("s")
    )
    w = (
        Window.partitionBy("part")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        (r.part, r.seq): r.fill
        for r in (
            df.where("status = 'O'")
            .withColumn("dcur", F.sum("qty").over(w))
            .join(supply, "part", "left")
            .withColumn("s", F.coalesce("s", F.lit(0)))
            .select(
                "part",
                "seq",
                F.greatest(
                    F.lit(0),
                    F.least(F.col("dcur"), F.col("s"))
                    - F.least(F.col("dcur") - F.col("qty"), F.col("s")),
                ).alias("fill"),
            )
            .collect()
        )
    }
    stock: dict = {}
    for p, q, s in [(d.part, d.qty, d.status) for d in data]:
        if s == "F":
            stock[p] = stock.get(p, 0) + q
    expect = {}
    for d in data:
        if d.status != "O":
            continue
        have = stock.get(d.part, 0)
        fill = min(d.qty, have)
        stock[d.part] = have - fill
        expect[(d.part, d.seq)] = fill
    assert got == expect


@given(
    counts=st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 9)),
        min_size=2,
        max_size=30,
    )
)
@settings(**_SETTINGS)
def test_t_closeness_emd_properties(spark, counts):
    """Ordinal-EMD cumulative identity on random two-group data: t is
    0 when a group's distribution is exactly proportional to the
    global one, symmetric-bounded in [0,1], and matches a direct
    Python computation."""
    rows = [Row(g="x", r=r) for r, n in counts for _ in range(n)]
    # group "y" mirrors group "x" exactly -> global == each group
    rows += [Row(g="y", r=r.r) for r in rows]
    df = spark.createDataFrame(rows)
    cums = [
        F.sum((F.col("r") <= j).cast("bigint")).alias(f"c{j}")
        for j in range(5)
    ]
    grp = df.groupBy("g").agg(F.count(F.lit(1)).alias("n"), *cums)
    glob = df.agg(
        F.count(F.lit(1)).alias("nt"),
        *[
            F.sum((F.col("r") <= j).cast("bigint")).alias(f"g{j}")
            for j in range(5)
        ],
    )
    num = sum(
        F.abs(F.col(f"c{j}") * F.col("nt") - F.col(f"g{j}") * F.col("n"))
        for j in range(5)
    )
    out = grp.crossJoin(glob).select("g", num.alias("num")).collect()
    # both groups are identical to the global distribution -> EMD 0
    assert all(r.num == 0 for r in out)
