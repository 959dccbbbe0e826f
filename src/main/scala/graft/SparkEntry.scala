package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Queries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.q01PricingSummary _),
    "q02_latest_event_top1" -> (Queries.q02LatestEventTop1 _),
    "q03_work_queue" -> (Queries.q03WorkQueue _),
    "q04_state_counts" -> (Queries.q04StateCounts _),
    "q05_filtered_counts" -> (Queries.q05FilteredCounts _),
    "q06_anti_join" -> (Queries.q06AntiJoin _),
    "q07_dim_join_revenue" -> (Queries.q07DimJoinRevenue _),
    "q08_epoch_buckets" -> (Queries.q08EpochBuckets _),
    "q09_eligibility" -> (Queries.q09Eligibility _),
    "q10_latest_per_user" -> (Queries.q10LatestPerUser _),
    "q11_tumbling_window" -> (Queries.q11TumblingWindow _),
    "q12_submit_payload" -> (Queries.q12SubmitPayload _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_latest_event_top1" ->
      """SELECT event_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_unix
        |FROM events ORDER BY ts DESC, event_id DESC LIMIT 1""".stripMargin,
    "q03_work_queue" ->
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT * FROM events
        |  WHERE event_type IN ('click','error') AND value > 50
        |  ORDER BY ts ASC, event_id ASC LIMIT 1000)""".stripMargin,
    "q04_state_counts" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "q05_filtered_counts" ->
      """SELECT count(*) AS n_total,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  count(CASE WHEN value > 90 THEN 1 END) AS n_high_value,
        |  count(CASE WHEN event_type = 'error' AND value > 90 THEN 1 END) AS n_error_high
        |FROM events""".stripMargin,
    "q06_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""".stripMargin,
    "q07_dim_join_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q08_epoch_buckets" ->
      """WITH e AS (SELECT CAST(floor((floor(epoch(ts)) - 1598306400) / 30.0) AS INT) AS epoch
        |           FROM events)
        |SELECT CAST(floor(epoch / 2880.0) AS BIGINT) AS epoch_day,
        |  count(*) AS n,
        |  CAST(min(epoch) AS BIGINT) AS first_epoch,
        |  CAST(max(epoch) AS BIGINT) AS last_epoch
        |FROM e GROUP BY 1""".stripMargin,
    "q09_eligibility" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_totalprice > 50000""".stripMargin,
    "q10_latest_per_user" ->
      """SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_unix
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,
    "q11_tumbling_window" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_unix,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "q12_submit_payload" ->
      """SELECT 'f0' || CAST(o_custkey AS VARCHAR) AS miner_id,
        |  CAST(o_orderkey AS VARCHAR) AS order_key_str,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS total_price_str
        |FROM orders WHERE o_orderkey <= 100""".stripMargin
  )
}
