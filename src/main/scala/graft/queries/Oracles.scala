package graft.queries

/** DuckDB oracle SQL — one ANSI statement per declared query, over views
  * named like the fixture tables (events, lineitem, …). Kept textually
  * adjacent to the Spark implementations' determinism contract: total ORDER
  * BY with unique key, round(x, 6) on doubles, epoch_ms for timestamps,
  * explicit BIGINT casts on integer sums (DuckDB sums integers as HUGEINT).
  */
object Oracles {

  val r1: String =
    """WITH c AS (
      |  SELECT event_id, ts, user_id,
      |         CASE WHEN lower(trim(event_type)) IN ('', 'nan') THEN NULL
      |              ELSE lower(trim(event_type)) END AS event_type,
      |         TRY_CAST(value AS DOUBLE) AS value
      |  FROM events)
      |SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type,
      |       round(value, 6) AS value
      |FROM c
      |WHERE ts IS NOT NULL AND event_type IS NOT NULL
      |  AND value IS NOT NULL AND value >= 0
      |ORDER BY event_id""".stripMargin

  val r2: String =
    """SELECT CAST(count(*) AS BIGINT) AS total_rows,
      |       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_timestamp,
      |       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_transaction_type,
      |       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_amount,
      |       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_receiving_address,
      |       CAST(sum(CASE WHEN TRY_CAST(value AS DOUBLE) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_amount_negative,
      |       CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
      |          + sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
      |          + sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
      |          + sum(CASE WHEN TRY_CAST(value AS DOUBLE) < 0 THEN 1 ELSE 0 END) AS BIGINT) AS failed_rows_estimate,
      |       round(greatest(0.0, 1.0 -
      |         (sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
      |          + sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
      |          + sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
      |          + sum(CASE WHEN TRY_CAST(value AS DOUBLE) < 0 THEN 1 ELSE 0 END))
      |         / (count(*) + 1e-9)), 6) AS conformity_rate
      |FROM events""".stripMargin

  val r3: String =
    """WITH r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |                               ORDER BY event_id) AS rn
      |  FROM events)
      |SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type,
      |       round(value, 6) AS value
      |FROM r WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  val r4: String =
    """SELECT event_type, round(avg(value), 6) AS avg_value
      |FROM events
      |WHERE event_type IS NOT NULL
      |GROUP BY event_type
      |ORDER BY avg_value DESC, event_type""".stripMargin

  val r5: String =
    """WITH r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |                               ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE event_type = 'purchase')
      |SELECT user_id, round(value, 6) AS value, epoch_ms(ts) AS ts_ms, event_id
      |FROM r WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  val r6: String =
    """WITH r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |                               ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE event_type = 'purchase')
      |SELECT user_id, round(value, 6) AS value, epoch_ms(ts) AS ts_ms, event_id
      |FROM r WHERE rn = 1
      |ORDER BY value DESC, user_id
      |LIMIT 3""".stripMargin

  val r7: String =
    """SELECT event_id,
      |       'ns' AS detected_unit,
      |       epoch_ms(ts) AS ts_ms,
      |       epoch_us(epoch_ms(epoch_ms(ts))) AS ts_us_roundtrip
      |FROM events
      |ORDER BY event_id""".stripMargin

  val x1: String =
    """SELECT r_name, n_name,
      |       CAST(count(*) AS BIGINT) AS n_customers,
      |       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  val x2: String =
    """SELECT o_orderpriority,
      |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS revenue,
      |       CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val x3: String =
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  val x4: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  val x5: String =
    """SELECT o_custkey, o_orderkey,
      |       epoch_ms(o_orderdate) AS order_date_ms,
      |       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
      |               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  val x6: String =
    """WITH o AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events)
      |SELECT user_id,
      |       CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM o GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val x7: String =
    """SELECT c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |  UNION
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  EXCEPT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  val x8: String =
    """WITH e AS (
      |  SELECT event_type,
      |         TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
      |  FROM events)
      |SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       round(avg(k), 6) AS avg_k,
      |       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
      |FROM e GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val x9: String =
    """SELECT token, CAST(count(*) AS BIGINT) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token
      |ORDER BY n DESC, token
      |LIMIT 20""".stripMargin

  val x10: String =
    """WITH r AS (
      |  SELECT doc_id, md5(text) AS text_md5, lang, source,
      |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, text_md5, lang, source
      |FROM r WHERE rn = 1
      |ORDER BY doc_id""".stripMargin

  val x11: String =
    """SELECT vec_id, label, cosine FROM (
      |  SELECT e.vec_id, e.label,
      |         round(sum(CAST(e.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE)) /
      |           (sqrt(sum(CAST(e.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE)))
      |            * sqrt(sum(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE)))), 6) AS cosine
      |  FROM embeddings e,
      |       (SELECT embedding FROM embeddings WHERE vec_id = 0) q,
      |       range(1, 65) i(i)
      |  GROUP BY e.vec_id, e.label)
      |ORDER BY cosine DESC, vec_id
      |LIMIT 10""".stripMargin

  val x12: String =
    """SELECT event_type,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val xGroup: Map[String, String] = Map(
    "x1_join_broadcast"   -> x1,
    "x2_join_shuffle_agg" -> x2,
    "x3_join_anti"        -> x3,
    "x4_rollup"           -> x4,
    "x5_window_running"   -> x5,
    "x6_sessionize"       -> x6,
    "x7_set_ops"          -> x7,
    "x8_json_extract"     -> x8,
    "x9_text_tokens"      -> x9,
    "x10_exact_dedup_hash" -> x10,
    "x11_cosine_topk"     -> x11,
    "x12_distinct"        -> x12)

  val rGroup: Map[String, String] = Map(
    "r1_clean_standardize" -> r1,
    "r2_dq_profile"        -> r2,
    "r3_dedup_keep_first"  -> r3,
    "r4_group_avg"         -> r4,
    "r5_latest_per_key"    -> r5,
    "r6_topk"              -> r6,
    "r7_epoch_roundtrip"   -> r7)
}
