"""Explicit schemas — the engine's schema system is fixed/explicit, like
the reference's (`StructType(Array(StructField(...)))`, no inference).

Reference citations:
- TWEET_SCHEMA     <- schema_indicateurs, IndicateursStreaming.scala:14-30
- ZIPCODE_SCHEMA   <- schema_Kafka, ConsommationStreaming.scala:26-31
- ORDERLINE_SCHEMA <- producer JSON, ProducerKafa_Prod.scala:76-86
- INVOICE_SCHEMA   <- spooldir-kafka-connect-source.properties:17-18
- KAFKA_ENVELOPE   <- record fields consumed at KafkaStreaming.scala:123-127
- EVENT_PROPS_SCHEMA <- driver fixture `events.props` JSON payload
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TWEET_SCHEMA = StructType(
    [
        StructField("event_date", DateType(), True),
        StructField("id", StringType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("userid", StringType(), False),
        StructField("name", StringType(), False),
        StructField("screenName", StringType(), True),
        StructField("location", StringType(), True),
        StructField("followersCount", IntegerType(), False),
        StructField("retweetCount", IntegerType(), False),
        StructField("favoriteCount", IntegerType(), False),
        StructField("Zipcode", StringType(), True),
        StructField("ZipCodeType", StringType(), True),
        StructField("City", StringType(), True),
        StructField("State", StringType(), True),
    ]
)

ZIPCODE_SCHEMA = StructType(
    [
        StructField("Zipcode", IntegerType(), True),
        StructField("ZipCodeType", StringType(), True),
        StructField("City", StringType(), True),
        StructField("State", StringType(), True),
    ]
)

ORDERLINE_SCHEMA = StructType(
    [
        StructField("orderid", StringType(), True),
        StructField("customerid", StringType(), True),
        StructField("campaignid", StringType(), True),
        StructField("orderdate", StringType(), True),  # dd/MM/yyyy
        StructField("city", StringType(), True),
        StructField("state", StringType(), True),
        StructField("zipcode", StringType(), True),
        StructField("paymenttype", StringType(), True),
        StructField("totalprice", IntegerType(), True),
        StructField("numorderlines", IntegerType(), True),
        StructField("numunit", IntegerType(), True),
    ]
)

INVOICE_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("InvoiceNo", StringType(), True),
        StructField("StockCode", StringType(), True),
        StructField("Description", StringType(), True),
        StructField("Quantity", StringType(), True),
        StructField("InvoiceDate", StringType(), True),
        StructField("UnitPrice", StringType(), True),
        StructField("CustomerID", StringType(), True),
        StructField("Country", StringType(), True),
        StructField("InvoiceTimestamp", TimestampType(), True),
    ]
)

KAFKA_ENVELOPE = StructType(
    [
        StructField("key", StringType(), True),
        StructField("value", StringType(), True),
        StructField("topic", StringType(), True),
        StructField("partition", IntegerType(), True),
        StructField("offset", LongType(), True),
        StructField("timestamp", TimestampType(), True),
    ]
)

EVENT_PROPS_SCHEMA = StructType([StructField("k", IntegerType(), True)])
