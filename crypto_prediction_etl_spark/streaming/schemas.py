"""Wire schemas for the three stream topics (all values as strings,
exactly as the producers reshape them).

reference: modules/spark_operations/streaming/candles.py:55-79,
market_trade.py:55-76, order_book.py:55-74;
producers modules/kafka_producers/*_producer.py:26-49.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _data_schema(fields: list[str], extra: dict[str, T.DataType] | None = None) -> T.StructType:
    fs = [T.StructField(f, T.StringType()) for f in fields]
    for name, dtype in (extra or {}).items():
        fs.append(T.StructField(name, dtype))
    return T.StructType(
        [T.StructField("data", T.ArrayType(T.StructType(fs)))]
    )


CANDLES_SCHEMA = _data_schema(
    [
        "id",
        "low",
        "high",
        "open",
        "close",
        "amount",
        "quantity",
        "tradeCount",
        "ts_send",
        "startTime",
        "closeTime",
    ]
)

MARKET_TRADE_SCHEMA = _data_schema(
    ["id", "trade_id", "takerSide", "amount", "quantity", "price", "createTime", "ts_send"]
)

# asks/bids arrive as array<array<string>> price ladders
ORDER_BOOK_SCHEMA = _data_schema(
    ["id", "seqid", "createTime", "ts_send"],
    extra={
        "asks": T.ArrayType(T.ArrayType(T.StringType())),
        "bids": T.ArrayType(T.ArrayType(T.StringType())),
    },
)
