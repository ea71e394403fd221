package graft

import org.apache.spark.sql.functions._

/** The SQL surface: a user porting the reference's SQL runs it as
  * `spark.sql(...)` text against registered views and gets the same result
  * as the DataFrame programs — the two front-ends share Catalyst. */
class SqlInterfaceSpec extends SparkSpec {

  test("the flagship program as spark.sql text matches the DataFrame result") {
    graft.core.Graft.events(spark, sf)
      .createOrReplaceTempView("events_v")
    val sql = spark.sql(
      """WITH ordered AS (
        |  SELECT user_id, event_type, value, ts_us,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts_us,
        |        CASE event_type WHEN 'signup' THEN 1 WHEN 'purchase' THEN 2
        |                        WHEN 'click' THEN 3 ELSE 4 END,
        |        event_id) AS rn
        |  FROM events_v),
        |bal AS (
        |  SELECT *,
        |    CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
        |                       WHEN event_type = 'error' THEN -value
        |                       ELSE 0 END AS DECIMAL(38,6)))
        |      OVER (PARTITION BY user_id ORDER BY rn
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      AS balance,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY rn DESC) AS rn_desc
        |  FROM ordered)
        |SELECT user_id,
        |  COUNT(*) AS n_events,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END
        |       AS DECIMAL(38,6))) AS DOUBLE) AS total_purchase_value,
        |  MIN(ts_us) AS first_ts_us,
        |  MAX(ts_us) AS last_ts_us,
        |  CAST(MAX(balance) AS DOUBLE) AS max_balance,
        |  COALESCE(CAST(MIN(CASE WHEN balance > 0 THEN balance END) AS DOUBLE), 0.0)
        |    AS min_positive_balance,
        |  CAST(MAX(CASE WHEN rn_desc = 1 THEN balance END) AS DOUBLE) AS final_balance
        |FROM bal GROUP BY user_id""".stripMargin)
    val df = SparkEntry.queries("flagship_wallet_features")(spark, sf)
    assert(sql.exceptAll(df).isEmpty && df.exceptAll(sql).isEmpty)
    assert(sql.count() == df.count() && sql.count() > 0)
  }
}
