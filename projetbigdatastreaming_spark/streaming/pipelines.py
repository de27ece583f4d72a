"""The reference's three end-to-end pipelines (SURVEY.md §3), rebuilt
as Structured Streaming graphs on the reference's own schemas.

Each pipeline is a pure transformation over a streaming (or batch)
DataFrame of Kafka-style string values, so it runs identically against
the real Kafka source, a file source, or a literal test frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, TimestampType

from ..schemas import TWEET_SCHEMA, ZIPCODE_SCHEMA

#: TWEET_SCHEMA with event_date as timestamp: the reference declares
#: DateType (IndicateursStreaming.scala:15) but its SQL applies
#: minute()/hour() to the column (:161-164), which are constant 0 on a
#: true date — the pipeline's intent requires time-of-day, so the
#: rebuild parses the field as a timestamp (deviation documented in
#: SURVEY.md §7 / FIXTURES.md A1).
TWEET_TS_SCHEMA = StructType(
    [
        StructField("event_date", TimestampType(), True),
        *[f for f in TWEET_SCHEMA.fields if f.name != "event_date"],
    ]
)


def parse_tweets(values: DataFrame, value_col: str = "value") -> DataFrame:
    """§3.1 getParsedData parity (IndicateursStreaming.scala:110-137):
    from_json against the tweet schema, en/fr language filter, full
    15-field nested projection.  The reference's `kakfa_jsons` column
    typo (:116) is not ported."""
    return (
        values.withColumn(
            "tweet", F.from_json(F.col(value_col), TWEET_TS_SCHEMA)
        )
        .where(F.col("tweet.lang").isin("en", "fr"))
        .select("tweet.*")
    )


def _quarter_label(ts: Column) -> Column:
    """The reference's exact quarter-hour CASE labels
    (IndicateursStreaming.scala:160-165), including ":45 - HH:60"."""
    h = F.date_format(ts, "HH")
    m = F.minute(ts)
    return (
        F.when(m < 15, F.concat(h, F.lit(":00 - "), h, F.lit(":15")))
        .when(m < 30, F.concat(h, F.lit(":15 - "), h, F.lit(":30")))
        .when(m < 45, F.concat(h, F.lit(":30 - "), h, F.lit(":45")))
        .otherwise(F.concat(h, F.lit(":45 - "), h, F.lit(":60")))
    )


def tweet_kpis(parsed: DataFrame, default_now: bool = False) -> DataFrame:
    """§3.1 getIndicateursComputed parity
    (IndicateursStreaming.scala:139-184): per-(date, quarter-hour)
    tweet count, retweet count (tweets with ≥1 retweet), retweet
    level %, with the reference's exact French output column names.

    The reference computes the totals with analytic window functions
    whose ORDER BY equals the PARTITION BY (every row is a peer → the
    group total replicated per row); reproduced faithfully here, so
    row multiplicity matches the reference output.

    ``default_now`` reproduces the when(isNull, current_timestamp())
    null-default (:174); off by default because it is nondeterministic.
    """
    from pyspark.sql.window import Window

    pre = parsed.select(
        F.date_format("event_date", "yyyy-MM-dd").alias("date_event"),
        _quarter_label(F.col("event_date")).alias("quart_heure"),
        F.when(F.col("retweetCount") > 0, 1).otherwise(0).alias("bin_retweet"),
        "id",
    )
    w = Window.partitionBy("date_event", "quart_heure").orderBy(
        "date_event", "quart_heure"
    )
    kpis = (
        pre.select(
            "date_event",
            "quart_heure",
            F.count("id").over(w).alias("tweetCount"),
            F.sum("bin_retweet").over(w).alias("retweetCount"),
        )
        .orderBy("quart_heure")
        .withColumn(
            "Niveau_RT",
            F.round(F.col("retweetCount") / F.col("tweetCount") * 100, 2),
        )
    )
    if default_now:
        kpis = kpis.withColumn(
            "date_event",
            F.when(
                F.col("date_event").isNull(), F.current_timestamp()
            ).otherwise(F.col("date_event")),
        )
    return kpis.select(
        F.col("date_event").alias("Date de l'event"),
        F.col("quart_heure").alias("Quart d'heure de l'event"),
        F.col("tweetCount").alias("Nbre de Tweets par QH"),
        F.col("retweetCount").alias("Nbre de Retweets par QH"),
        F.col("Niveau_RT").alias("Niveau de ReTweet (en %)"),
    )


def consommation_pipeline(values: DataFrame) -> DataFrame:
    """§3.2 parity (ConsommationStreaming.scala:49-116): zipcode JSON
    values → from_json(schema_Kafka) → nested projection.  The
    reference registers a temp view and selects *; the structured
    variant (:96-102) is the one kept."""
    return (
        values.withColumn(
            "tweet_message", F.from_json(F.col("value"), ZIPCODE_SCHEMA)
        )
        .select("tweet_message.*")
    )


def hashtag_pipeline(statuses: DataFrame, window: str = "3 minutes") -> DataFrame:
    """§3.3 parity (TwitterKafkaStreaming.scala:176-211): tweet stream →
    lang == 'fr' filter (:183) → hashtag tokenization
    (flatMap split startswith '#', :184-185) → 3-minute window (:186)
    → counts, shaped for a Kafka sink.

    Expects columns (ts timestamp, text string, lang string).
    """
    tokens = (
        statuses.where(F.col("lang") == "fr")
        .select(
            "ts", F.explode(F.split(F.col("text"), " ")).alias("hashtag")
        )
        .where(F.col("hashtag").startswith("#"))
    )
    return (
        tokens.groupBy(F.window("ts", window).alias("w"), "hashtag")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "hashtag",
            "n",
        )
    )


def sentiment_pipeline(
    statuses: DataFrame, window: str = "3 minutes"
) -> DataFrame:
    """The reference's tweet-KPI domain composed with the engine's
    lexicon sentiment scorer (plans/llmdata.SENTIMENT_LEXICON — the
    EDBT'16 sentiment-on-Spark shape): per window and language, tweet
    count, positive/negative lexicon hits, and the mean PER-TOKEN
    valence over the window (sum of token valences / token count).
    Pure built-in expressions over a broadcast-sized literal
    map, so it runs identically on a stream (windowed aggregate with
    watermark upstream) or a batch frame.

    Expects columns (ts timestamp, text string, lang string).
    Scale: the lexicon lookup is a map-side `element_at` against a
    literal MAP (no join, no shuffle beyond the one windowed agg).
    """
    from ..plans.llmdata import SENTIMENT_LEXICON

    lex = F.create_map(
        *[
            F.lit(x)
            for pair in SENTIMENT_LEXICON
            for x in pair
        ]
    )
    val = F.expr(
        "aggregate(toks, 0, (acc, t) -> acc + coalesce(vmap[t], 0))"
    )
    pos = F.expr(
        "size(filter(toks, t -> coalesce(vmap[t], 0) > 0))"
    )
    neg = F.expr(
        "size(filter(toks, t -> coalesce(vmap[t], 0) < 0))"
    )
    # drop empty tokens (split on \s+ yields '' at string edges) so
    # n_toks and the valence denominator match q_text_sentiment's
    # token <> '' filter exactly
    scored = statuses.select(
        "ts",
        "lang",
        F.filter(
            F.split(F.lower("text"), r"\s+"), lambda t: t != ""
        ).alias("toks"),
    ).withColumn("vmap", lex).select(
        "ts",
        "lang",
        pos.alias("pos_hits"),
        neg.alias("neg_hits"),
        val.alias("valence"),
        F.size("toks").alias("n_toks"),
    )
    return (
        scored.groupBy(F.window("ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tweets"),
            F.sum("pos_hits").cast("bigint").alias("pos_hits"),
            F.sum("neg_hits").cast("bigint").alias("neg_hits"),
            (
                F.sum("valence").cast("double")
                / F.sum("n_toks")
            ).alias("mean_valence"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "lang",
            "n_tweets",
            "pos_hits",
            "neg_hits",
            "mean_valence",
        )
    )
