"""Every explicit schema in one place (SURVEY.md §1.3: fixed schemas
everywhere, no inference).

Bronze/silver/gold schemas reproduce the reference's tables exactly:

- bronze power:  /root/reference/src/ingestion/power_ingestion.py:52-58
  (+ metadata columns :64-69)
- bronze price:  /root/reference/src/ingestion/price_ingestion.py:51-57
- power payload: /root/reference/src/transformations/bronze_to_silver.py:23-32
- silver power:  bronze_to_silver.py:86-96
- silver price:  bronze_to_silver.py:140-148
- gold tables:   silver_to_gold.py:29-33, :61-65, :108-115
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- bronze ---------------------------------------------------------------

BRONZE_POWER = T.StructType(
    [
        T.StructField("country", T.StringType(), nullable=False),
        T.StructField("date", T.StringType(), nullable=False),
        T.StructField("payload_json", T.StringType()),
    ]
)

BRONZE_PRICE = T.StructType(
    [
        T.StructField("market", T.StringType(), nullable=False),
        T.StructField("date", T.StringType(), nullable=False),
        T.StructField("payload_json", T.StringType()),
    ]
)

# Metadata columns appended at ingestion: ingested_at timestamp, source string.

# --- payload (schema-on-read) ---------------------------------------------

# The reference declares unix_seconds as array<double> and casts to
# array<long> at use (bronze_to_silver.py:24, :69) — "type laundering",
# preserved because payloads may carry 1.7e9 as 1.7E9 notation.
POWER_PAYLOAD = T.StructType(
    [
        T.StructField("unix_seconds", T.ArrayType(T.DoubleType())),
        T.StructField(
            "production_types",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("data", T.ArrayType(T.DoubleType())),
                    ]
                )
            ),
        ),
        T.StructField("deprecated", T.BooleanType()),
    ]
)

PRICE_ARRAY = T.ArrayType(T.DoubleType())

# --- silver ---------------------------------------------------------------

SILVER_POWER = T.StructType(
    [
        T.StructField("country", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("production_type", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

SILVER_PRICE = T.StructType(
    [
        T.StructField("market", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("price_eur_mwh", T.DoubleType()),
    ]
)

# --- gold -----------------------------------------------------------------

GOLD_POWER_DAILY = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("production_type", T.StringType()),
        T.StructField("daily_net_production", T.DoubleType()),
    ]
)

GOLD_PRICE_DAILY = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("avg_price_eur_mwh", T.DoubleType()),
    ]
)

GOLD_POWER_PRICE = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("offshore_wind_daily", T.DoubleType()),
        T.StructField("avg_price_eur_mwh", T.DoubleType()),
    ]
)
