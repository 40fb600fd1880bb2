"""Streaming-shaped queries in batch form (SURVEY §2.9, §3.1).

The reference's stream pipelines are stateless enrich-and-sink: JSON
decode, nested-field extraction, epoch->timestamp derivation, ladder
explode with positional rank. These transforms are identical for batch
and streaming DataFrames (Structured Streaming's unified model), so the
correctness gate runs them in batch over `events`; the true streaming
execution (file source -> foreachBatch upsert -> checkpoint) is covered
by tests/test_streaming.py.

Window aggregations + sessionization extend the reference (it has no
stream aggregation at all — SURVEY §2.9: "no watermarks, no stream
windows"); they're the Spark-native idioms a scaled deployment needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.portable import o_rnd, prnd
from ..sources.readers import table
from .registry import query


@query(
    "q60_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events WHERE event_id % 7 = 0
    """,
)
def q60_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode + field extraction (P2/P3; reference:
    streaming/candles.py:84-96 from_json + element_at) + timestamp
    formatting (reference: candles.py:97-102 from_unixtime)."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_val"),
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


def tumbling_hourly(ev: DataFrame) -> DataFrame:
    """The q61 transformation as a pure DataFrame->DataFrame function —
    Structured Streaming's unified model means the SAME code runs over
    a batch read and a readStream source; the batch/stream parity test
    (tests/test_streaming.py::test_batch_stream_parity_tumbling)
    executes it both ways and compares results row-for-row."""
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            prnd(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q61_tumbling_window",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           {o_rnd('sum(value)', 2)} AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q61_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregate — the streaming
    extension flagged in SURVEY §2.9 (same code works under
    readStream + withWatermark; see tumbling_hourly)."""
    return tumbling_hourly(table(spark, sf_dir, "events"))


@query(
    "q62_sliding_window",
    oracle=f"""
    WITH contrib AS (
      SELECT unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
             value
      FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n_events,
           {o_rnd('sum(value)', 2)} AS total_value
    FROM contrib GROUP BY ws
    """,
)
def q62_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h width, 1h slide): each event lands in two
    overlapping windows."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            prnd(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q63_sessionization",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             lag(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
      FROM events
    ),
    s AS (
      SELECT user_id, event_id, sec,
             sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM o
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           count(*) AS n_events,
           max(sec) - min(sec) AS duration_sec
    FROM s GROUP BY user_id, session_no
    """,
)
def q63_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + cumulative
    session counter — the batch formulation of streaming
    session_window(ts, gap)."""
    ev = table(spark, sf_dir, "events")
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select("user_id", "event_id", sec.alias("sec")).withColumn(
        "prev_sec", F.lag("sec").over(W.partitionBy("user_id").orderBy("sec", "event_id"))
    )
    is_new = F.when(
        F.col("prev_sec").isNull() | (F.col("sec") - F.col("prev_sec") > 1800), 1
    ).otherwise(0)
    s = o.withColumn(
        "session_no",
        F.sum(is_new).over(
            W.partitionBy("user_id")
            .orderBy("sec", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return s.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        (F.max("sec") - F.min("sec")).alias("duration_sec"),
    )


@query(
    "q64_ladder_explode",
    oracle="""
    WITH g AS (
      SELECT event_type, CAST(ts AS DATE) AS dt,
             list_slice(list_sort(list(value), 'DESC'), 1, 5) AS ladder
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT event_type, dt,
           CAST(u.r AS INTEGER) AS order_rank, u.v AS quote_value
    FROM g, unnest(list_transform(range(1, len(ladder) + 1),
                                  i -> {'r': i, 'v': ladder[i]})) AS x(u)
    """,
)
def q64_ladder_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-book ladder explode with positional rank (reference:
    streaming/order_book.py:88-123 posexplode + order_rank = pos+1):
    top-5 values per (type, day), one row per rung."""
    ev = table(spark, sf_dir, "events")
    g = ev.groupBy("event_type", F.to_date("ts").alias("dt")).agg(
        F.slice(
            F.sort_array(F.collect_list("value"), asc=False), 1, 5
        ).alias("ladder")
    )
    return g.select(
        "event_type",
        "dt",
        F.posexplode("ladder").alias("pos", "quote_value"),
    ).select(
        "event_type",
        "dt",
        (F.col("pos") + 1).alias("order_rank"),
        "quote_value",
    )


@query(
    "q65_order_book_wire",
    oracle="""
    WITH src AS (
      SELECT event_type, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(floor(value * 100) AS BIGINT) AS p1,
             event_id % 10 + 1 AS amt
      FROM events WHERE event_id % 11 = 0
    ),
    legs AS (
      SELECT event_type, event_id, sec, 'ask' AS order_type, 1 AS order_rank,
             p1 AS price, amt FROM src
      UNION ALL
      SELECT event_type, event_id, sec, 'ask', 2, p1 + 5, amt + 1 FROM src
      UNION ALL
      SELECT event_type, event_id, sec, 'bid', 1, p1 - 3, amt + 2 FROM src
    )
    SELECT event_type AS id,
           event_id AS seqid,
           order_type,
           CAST(price AS FLOAT) AS quote_price,
           CAST(amt AS FLOAT) AS base_amount,
           order_rank,
           sec AS createTime,
           sec + 1 AS ts_send,
           strftime(make_timestamp(sec * 1000000), '%Y-%m-%d %H:%M:%S') AS ts_str,
           CAST(make_timestamp(sec * 1000000) AS DATE) AS dt_create_utc
    FROM legs
    """,
)
def q65_order_book_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL order-book stream pipeline inside the hash gate: build
    the producer's exact JSON envelope (nested array<array<string>>
    ladders) from events rows, then run `order_book_pipeline` —
    from_json decode, ask/bid fork, posexplode with positional rank,
    union (reference: streaming/order_book.py:76-123). The oracle
    computes the expected flattened ladder directly — verifying the
    pipeline's output, not replaying its parsing."""
    from ..streaming.pipelines import order_book_pipeline

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    p1 = F.floor(F.col("value") * 100).cast("long")
    amt = F.col("event_id") % 10 + 1
    s = F.lit
    msg = F.concat(
        s('{"data":[{"id":"'), F.col("event_type"),
        s('","seqid":"'), F.col("event_id").cast("string"),
        s('","asks":[["'), p1.cast("string"), s('","'), amt.cast("string"),
        s('"],["'), (p1 + 5).cast("string"), s('","'), (amt + 1).cast("string"),
        s('"]],"bids":[["'), (p1 - 3).cast("string"), s('","'), (amt + 2).cast("string"),
        s('"]],"createTime":"'), sec.cast("string"),
        s('","ts_send":"'), (sec + 1).cast("string"),
        s('"}]}'),
    )
    raw = ev.select(msg.alias("value"))
    out = order_book_pipeline(raw)
    return out.select(
        "id",
        "seqid",
        "order_type",
        "quote_price",
        "base_amount",
        "order_rank",
        "createTime",
        "ts_send",
        F.date_format("ts_create_utc", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "dt_create_utc",
    )


@query(
    "q63b_native_session_window",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             lag(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM o JOIN events USING (user_id, event_id, ts)
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events,
           floor((sum(value)) * 100.0 + 0.5001) / 100.0 AS total_value
    FROM s GROUP BY user_id, session_no
    """,
)
def q63b_native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (30-min gap) — the built-in
    operator whose manual formulation is q63; in streaming the same
    expression runs stateful with watermark eviction. The oracle derives
    identical sessions via the lag+cumsum construction (session start =
    first event's second-truncated epoch in both: Spark session_window
    keys on the event timestamp; we truncate to seconds first so both
    engines bucket identically)."""
    ev = table(spark, sf_dir, "events")
    # truncate to whole seconds so the session assignment (gap compare)
    # matches the oracle's integer-second arithmetic exactly
    sec_ts = F.timestamp_seconds(F.floor(F.col("ts").cast("double")).cast("long"))
    return (
        ev.withColumn("ts_s", sec_ts)
        .groupBy("user_id", F.session_window("ts_s", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            prnd(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "q117_book_imbalance",
    oracle="""
    WITH src AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100) AS BIGINT) AS p1,
             event_id % 10 + 1 AS amt
      FROM events WHERE event_id % 11 = 0
    ),
    legs AS (
      SELECT event_type, event_id, 'ask' AS order_type, p1 AS price, amt FROM src
      UNION ALL
      SELECT event_type, event_id, 'ask', p1 + 5, amt + 1 FROM src
      UNION ALL
      SELECT event_type, event_id, 'bid', p1 - 3, amt + 2 FROM src
    ),
    agg AS (
      SELECT event_type AS id, event_id AS seqid,
             CAST(sum(CASE WHEN order_type = 'bid' THEN amt END) AS DOUBLE) AS bid_depth,
             CAST(sum(CASE WHEN order_type = 'ask' THEN amt END) AS DOUBLE) AS ask_depth,
             CAST(max(CASE WHEN order_type = 'bid' THEN price END) AS DOUBLE) AS best_bid,
             CAST(min(CASE WHEN order_type = 'ask' THEN price END) AS DOUBLE) AS best_ask
      FROM legs GROUP BY event_type, event_id
    )
    SELECT id, seqid, bid_depth, ask_depth, best_bid, best_ask,
           floor(((bid_depth - ask_depth) / (bid_depth + ask_depth)) * 1000000.0 + 0.5001) / 1000000.0 AS imbalance,
           floor(((best_bid + best_ask) / 2.0) * 100.0 + 0.5001) / 100.0 AS mid,
           best_ask - best_bid AS spread
    FROM agg
    """,
)
def q117_book_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-book microstructure analytics ON TOP of the real wire
    pipeline: decode the producer JSON (q65's path), then per book
    snapshot compute bid/ask depth, best quotes, depth imbalance
    (bid-ask)/(bid+ask), mid price and spread — the liquidity signals
    a market-making or feature pipeline derives from every book
    update. One groupBy over the exploded ladder per snapshot; at
    scale the stream stays partitioned by symbol so the aggregation
    is map-side within a snapshot's rows."""
    from ..streaming.pipelines import order_book_pipeline

    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    p1 = F.floor(F.col("value") * 100).cast("long")
    amt = F.col("event_id") % 10 + 1
    s = F.lit
    msg = F.concat(
        s('{"data":[{"id":"'), F.col("event_type"),
        s('","seqid":"'), F.col("event_id").cast("string"),
        s('","asks":[["'), p1.cast("string"), s('","'), amt.cast("string"),
        s('"],["'), (p1 + 5).cast("string"), s('","'), (amt + 1).cast("string"),
        s('"]],"bids":[["'), (p1 - 3).cast("string"), s('","'), (amt + 2).cast("string"),
        s('"]],"createTime":"'), sec.cast("string"),
        s('","ts_send":"'), (sec + 1).cast("string"),
        s('"}]}'),
    )
    book = order_book_pipeline(ev.select(msg.alias("value")))
    agg = book.groupBy("id", "seqid").agg(
        F.sum(
            F.when(F.col("order_type") == "bid", F.col("base_amount"))
        ).cast("double").alias("bid_depth"),
        F.sum(
            F.when(F.col("order_type") == "ask", F.col("base_amount"))
        ).cast("double").alias("ask_depth"),
        F.max(
            F.when(F.col("order_type") == "bid", F.col("quote_price"))
        ).cast("double").alias("best_bid"),
        F.min(
            F.when(F.col("order_type") == "ask", F.col("quote_price"))
        ).cast("double").alias("best_ask"),
    )
    return agg.select(
        "id",
        "seqid",
        "bid_depth",
        "ask_depth",
        "best_bid",
        "best_ask",
        prnd(
            (F.col("bid_depth") - F.col("ask_depth"))
            / (F.col("bid_depth") + F.col("ask_depth")),
            6,
        ).alias("imbalance"),
        prnd((F.col("best_bid") + F.col("best_ask")) / 2.0, 2).alias("mid"),
        (F.col("best_ask") - F.col("best_bid")).alias("spread"),
    )


# ---------------------------------------------------------------------------
# q385 book-walk execution cost curve (slippage vs order size)
# ---------------------------------------------------------------------------

_Q385_OFFSETS = (0, 2, 5, 9, 14)   # ask-level price offsets, cents
_Q385_SIZES = (5, 15, 30)          # target order sizes, units


def _q385_oracle() -> str:
    # per-level integer price/size expressions (same synthetic book
    # family as q65's wire format)
    prices = [f"(p1 + {o})" for o in _Q385_OFFSETS]
    sizes = [
        f"((event_id + {lvl * 13}) % 9 + 1)"
        for lvl in range(1, len(_Q385_OFFSETS) + 1)
    ]
    blocks = []
    for s_tgt in _Q385_SIZES:
        filled, cost, cum = [], [], "0"
        for lvl in range(len(_Q385_OFFSETS)):
            f = f"greatest(0, least({sizes[lvl]}, {s_tgt} - ({cum})))"
            filled.append(f)
            cost.append(f"({f}) * {prices[lvl]}")
            cum = f"{cum} + {sizes[lvl]}"
        tot_f = " + ".join(f"({f})" for f in filled)
        tot_c = " + ".join(cost)
        blocks.append(f"""
      SELECT event_type, {s_tgt} AS s,
             CAST({tot_f} AS DOUBLE) AS filled,
             CAST({tot_c} AS DOUBLE) AS cost,
             CAST(p1 AS DOUBLE) AS best
      FROM src""")
    return f"""
    WITH src AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100) AS BIGINT) AS p1
      FROM events WHERE event_id % 7 = 0
    ),
    walks AS ({" UNION ALL ".join(blocks)})
    SELECT event_type, CAST(s AS INTEGER) AS order_size,
           CAST(count(*) AS BIGINT) AS n_orders,
           {o_rnd('avg((cost / filled - best) / best * 10000.0)', 4)} AS avg_slippage_bps,
           {o_rnd('avg(filled / s)', 6)} AS avg_fill_rate,
           {o_rnd('CAST(count(*) FILTER (WHERE filled >= s) AS DOUBLE) / count(*)', 6)} AS full_fill_share
    FROM walks GROUP BY event_type, s
    """


@query("q385_book_walk", oracle=_q385_oracle())
def q385_book_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execution-cost curve by walking the ask ladder: for target
    sizes 5/15/30 units, fill level by level (partial fill at the
    marginal level), and report average slippage vs best ask in bps,
    fill rate, and the full-fill share per instrument — the
    liquidity/impact curve an execution desk derives from the book
    q65 parses and q117 summarizes (slippage growing superlinearly
    in size = thin book).  Book levels use the q65 synthetic wire
    family: integer cents and unit sizes, so the whole walk is exact
    integer arithmetic in both engines until the final division.

    Scale shape: the 5-level walk unrolls to a CLOSED-FORM chain of
    greatest/least expressions per row — no explode, no per-event
    window, no shuffle at all until the final (type, size) partial
    agg; cost is O(levels * sizes) codegen'd ops per row.  A deeper
    book swaps in F.aggregate over the ladder array, still
    map-side."""
    ev = table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    p1 = F.floor(F.col("value") * 100).cast("long")
    prices = [p1 + o for o in _Q385_OFFSETS]
    sizes = [
        (F.col("event_id") + lvl * 13) % 9 + 1
        for lvl in range(1, len(_Q385_OFFSETS) + 1)
    ]
    structs = []
    for s_tgt in _Q385_SIZES:
        cum = F.lit(0).cast("long")
        filled_terms, cost_terms = [], []
        for lvl in range(len(_Q385_OFFSETS)):
            f = F.greatest(
                F.lit(0).cast("long"),
                F.least(
                    sizes[lvl].cast("long"), (F.lit(s_tgt) - cum).cast("long")
                ),
            )
            filled_terms.append(f)
            cost_terms.append(f * prices[lvl])
            cum = cum + sizes[lvl].cast("long")
        tot_f = filled_terms[0]
        for t in filled_terms[1:]:
            tot_f = tot_f + t
        tot_c = cost_terms[0]
        for t in cost_terms[1:]:
            tot_c = tot_c + t
        structs.append(
            F.struct(
                F.lit(s_tgt).alias("s"),
                tot_f.cast("double").alias("filled"),
                tot_c.cast("double").alias("cost"),
            )
        )
    walks = ev.select(
        "event_type",
        p1.cast("double").alias("best"),
        F.explode(F.array(*structs)).alias("x"),
    ).select("event_type", "best", "x.*")
    return walks.groupBy(
        "event_type", F.col("s").cast("int").alias("order_size")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        prnd(
            F.avg(
                (F.col("cost") / F.col("filled") - F.col("best"))
                / F.col("best")
                * 10000.0
            ),
            4,
        ).alias("avg_slippage_bps"),
        prnd(F.avg(F.col("filled") / F.col("s")), 6).alias("avg_fill_rate"),
        prnd(
            F.count(F.when(F.col("filled") >= F.col("s"), 1)).cast("double")
            / F.count("*"),
            6,
        ).alias("full_fill_share"),
    )


# ---------------------------------------------------------------------------
# q396 dead-letter audit (malformed-envelope taxonomy)
# ---------------------------------------------------------------------------


def _q396_oracle() -> str:
    # same synthetic envelope family as q65, with deterministic
    # corruptions injected by event_id residue
    msg_ok = ("'{\"id\":\"' || event_type || '\",\"seqid\":\"' || event_id"
              " || '\",\"price\":\"' || CAST(floor(value * 100) AS BIGINT)"
              " || '\"}'")
    msg_badtype = ("'{\"id\":\"' || event_type ||"
                   " '\",\"seqid\":\"' || event_id ||"
                   " '\",\"price\":\"abc\"}'")
    msg_missing = ("'{\"id\":\"' || event_type || '\",\"price\":\"' ||"
                   " CAST(floor(value * 100) AS BIGINT) || '\"}'")
    msg_trunc = ("'{\"id\":\"' || event_type || '\",\"seqid\":\"' ||"
                 " event_id")
    return f"""
    WITH raw AS (
      SELECT event_type,
             CASE event_id % 13
               WHEN 0 THEN {msg_trunc}
               WHEN 1 THEN {msg_badtype}
               WHEN 2 THEN {msg_missing}
               ELSE {msg_ok}
             END AS msg
      FROM events
    ),
    parsed AS (
      SELECT event_type, msg,
             json_valid(msg) AS ok,
             CASE WHEN json_valid(msg)
                  THEN json_extract_string(msg, '$.seqid') END AS seqid,
             TRY_CAST(CASE WHEN json_valid(msg)
                  THEN json_extract_string(msg, '$.price') END AS BIGINT) AS price
      FROM raw
    ),
    cat AS (
      SELECT event_type,
             CASE
               WHEN NOT ok THEN 'truncated'
               WHEN seqid IS NULL THEN 'missing_field'
               WHEN price IS NULL THEN 'bad_type'
               ELSE 'ok'
             END AS category
      FROM parsed
    )
    SELECT event_type, category,
           CAST(count(*) AS BIGINT) AS n,
           {o_rnd('CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (PARTITION BY event_type)', 6)} AS share
    FROM cat GROUP BY event_type, category
    """


@query("q396_dead_letter_audit", oracle=_q396_oracle())
def q396_dead_letter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter triage for a streaming ingest: classify every
    envelope as ok / truncated (invalid JSON) / missing_field /
    bad_type and report the per-source taxonomy shares — the FIRST
    dashboard an on-call looks at when the q65 pipeline's DLQ grows
    (is the producer truncating? did a schema field vanish? did a
    type change?).  Corruptions here are injected deterministically
    so both engines audit the identical byte stream; categorization
    uses json validity + string-extract + try_cast (NOT the
    corruption rule), so the query exercises the real parse path.

    Scale shape: parse + classify are per-row expressions
    (get_json_object / try_cast, all JVM-side); one (source,
    category) partial agg; the share window runs over the
    <= 4-rows-per-type category frame (q355 post-aggregate law)."""
    ev = table(spark, sf_dir, "events")
    s = F.lit
    price = F.floor(F.col("value") * 100).cast("long").cast("string")
    eid = F.col("event_id").cast("string")
    msg_ok = F.concat(
        s('{"id":"'), F.col("event_type"), s('","seqid":"'), eid,
        s('","price":"'), price, s('"}'),
    )
    msg_badtype = F.concat(
        s('{"id":"'), F.col("event_type"), s('","seqid":"'), eid,
        s('","price":"abc"}'),
    )
    msg_missing = F.concat(
        s('{"id":"'), F.col("event_type"), s('","price":"'), price, s('"}'),
    )
    msg_trunc = F.concat(
        s('{"id":"'), F.col("event_type"), s('","seqid":"'), eid
    )
    msg = (
        F.when(F.col("event_id") % 13 == 0, msg_trunc)
        .when(F.col("event_id") % 13 == 1, msg_badtype)
        .when(F.col("event_id") % 13 == 2, msg_missing)
        .otherwise(msg_ok)
    )
    raw = ev.select("event_type", msg.alias("msg"))
    parsed = raw.select(
        "event_type",
        F.get_json_object("msg", "$.id").isNotNull().alias("ok"),
        F.get_json_object("msg", "$.seqid").alias("seqid"),
        F.try_to_number(
            F.get_json_object("msg", "$.price"), F.lit("999999999")
        ).alias("price"),
    )
    cat = parsed.select(
        "event_type",
        F.when(~F.col("ok"), "truncated")
        .when(F.col("seqid").isNull(), "missing_field")
        .when(F.col("price").isNull(), "bad_type")
        .otherwise("ok")
        .alias("category"),
    )
    g = cat.groupBy("event_type", "category").agg(
        F.count("*").cast("long").alias("n")
    )
    from pyspark.sql import Window as W

    tot = W.partitionBy("event_type")
    return g.select(
        "event_type", "category", "n",
        prnd(
            F.col("n").cast("double") / F.sum("n").over(tot), 6
        ).alias("share"),
    )
