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

  val rGroup: Map[String, String] = Map(
    "r1_clean_standardize" -> r1,
    "r2_dq_profile"        -> r2,
    "r3_dedup_keep_first"  -> r3,
    "r4_group_avg"         -> r4,
    "r5_latest_per_key"    -> r5,
    "r6_topk"              -> r6,
    "r7_epoch_roundtrip"   -> r7)
}
