package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Gate, Tables}
import graft.billing.{Aggregates, Insights}

/** Reference-parity gates (SURVEY §2): the four rollups, insight queries,
  * joins, set ops, windows, and the scalar-function surface — each with an
  * exactly-mirrored DuckDB oracle. Conventions for oracle hash-parity:
  * every aggregate is aliased identically on both sides; double sums are
  * rounded at the data's decimal grid (cents → 2, price×discount → 4),
  * which snaps both engines' nondeterministic-partition-order float sums
  * to the same grid point (never a rounding half-point, since the true
  * value lies ON the grid); averages are `rounded_sum / count` so both
  * engines divide identical doubles — bit-equal without further rounding;
  * DuckDB integer sums are cast to BIGINT to match Spark's LongType;
  * timestamps leave as epoch millis (lossless for this data) to sidestep
  * ns/µs precision differences.
  */
object CoreQueries {

  private def r2(c: Column) = round(c, 2)
  private def r4(c: Column) = round(c, 4)

  // A1 — daily rollup through the billing module.
  private def dailyRollup(s: SparkSession, d: String): DataFrame =
    Aggregates.daily(EventsBilling(s, d)).select(
      col("year"), col("month"), col("day"), col("transaction_count"),
      r2(col("total_credit_usage")).as("total_credit_usage"),
      (r2(col("total_credit_usage")) / col("transaction_count"))
        .as("avg_credit_usage"),
      col("unique_users"), col("unique_resources"),
      col("successful_operations"), col("failed_operations"),
    ).orderBy("year", "month", "day")

  private val dailyRollupSql =
    s"""${EventsBilling.cte}
       |SELECT year, month, day,
       |       count(*) AS transaction_count,
       |       round(sum(credit_usage), 2) AS total_credit_usage,
       |       round(sum(credit_usage), 2) / count(*) AS avg_credit_usage,
       |       count(DISTINCT user_id) AS unique_users,
       |       count(DISTINCT resource_id) AS unique_resources,
       |       CAST(sum(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT) AS successful_operations,
       |       CAST(sum(CASE WHEN success THEN 0 ELSE 1 END) AS BIGINT) AS failed_operations
       |FROM billing GROUP BY year, month, day ORDER BY year, month, day""".stripMargin

  // A2 — user rollup; activity span as epoch millis.
  private def userRollup(s: SparkSession, d: String): DataFrame =
    Aggregates.user(EventsBilling(s, d)).select(
      col("user_id"), col("transaction_count"),
      r2(col("total_credit_usage")).as("total_credit_usage"),
      (r2(col("total_credit_usage")) / col("transaction_count"))
        .as("avg_credit_usage"),
      col("resources_used"), col("resource_types_used"),
      col("operation_types"), col("regions_used"),
      unix_millis(col("first_activity")).as("first_activity_ms"),
      unix_millis(col("last_activity")).as("last_activity_ms"),
    ).orderBy("user_id")

  private val userRollupSql =
    s"""${EventsBilling.cte}
       |SELECT user_id,
       |       count(*) AS transaction_count,
       |       round(sum(credit_usage), 2) AS total_credit_usage,
       |       round(sum(credit_usage), 2) / count(*) AS avg_credit_usage,
       |       count(DISTINCT resource_id) AS resources_used,
       |       count(DISTINCT resource_type) AS resource_types_used,
       |       count(DISTINCT operation_type) AS operation_types,
       |       count(DISTINCT region) AS regions_used,
       |       epoch_ms(min("timestamp")) AS first_activity_ms,
       |       epoch_ms(max("timestamp")) AS last_activity_ms
       |FROM billing GROUP BY user_id ORDER BY user_id""".stripMargin

  // A2 at the 100 TB design point: HLL sketches instead of exact
  // distincts — no Expand, one pass, mergeable ([[Aggregates.userApprox]]
  // is that pure shape). The gate runs sketch and exact side by side and
  // hash-checks *accuracy*: each approx count must land within
  // max(2, 10%) of its exact twin — booleans the oracle asserts true.
  // (HLL++ answers exactly from its sparse representation at these
  // cardinalities, so the slack is generous.)
  private def userRollupApprox(s: SparkSession, d: String): DataFrame = {
    def ok(a: Column, e: Column) =
      abs(a - e) <= greatest(lit(2.0), e * 0.1)
    EventsBilling(s, d).groupBy("user_id").agg(
      count(lit(1)).as("transaction_count"),
      sum("credit_usage").as("tcu"),
      approx_count_distinct("resource_id", 0.05).as("a_res"),
      countDistinct("resource_id").as("e_res"),
      approx_count_distinct("resource_type", 0.05).as("a_rt"),
      countDistinct("resource_type").as("e_rt"),
      approx_count_distinct("operation_type", 0.05).as("a_op"),
      countDistinct("operation_type").as("e_op"),
      approx_count_distinct("region", 0.05).as("a_reg"),
      countDistinct("region").as("e_reg"))
      .select(col("user_id"), col("transaction_count"),
        r2(col("tcu")).as("total_credit_usage"),
        ok(col("a_res"), col("e_res")).as("resources_ok"),
        ok(col("a_rt"), col("e_rt")).as("resource_types_ok"),
        ok(col("a_op"), col("e_op")).as("operation_types_ok"),
        ok(col("a_reg"), col("e_reg")).as("regions_ok"))
      .orderBy("user_id")
  }

  private val userRollupApproxSql =
    s"""${EventsBilling.cte}
       |SELECT user_id, count(*) AS transaction_count,
       |       round(sum(credit_usage), 2) AS total_credit_usage,
       |       true AS resources_ok, true AS resource_types_ok,
       |       true AS operation_types_ok, true AS regions_ok
       |FROM billing GROUP BY user_id ORDER BY user_id""".stripMargin

  // A3 — service rollup.
  private def serviceRollup(s: SparkSession, d: String): DataFrame =
    Aggregates.service(EventsBilling(s, d)).select(
      col("service_tier"), col("resource_type"), col("operation_type"),
      col("operation_count"),
      r2(col("total_credit_usage")).as("total_credit_usage"),
      (r2(col("total_credit_usage")) / col("operation_count"))
        .as("avg_credit_usage"),
      col("unique_users"), col("successful_operations"), col("failed_operations"),
    ).orderBy("service_tier", "resource_type", "operation_type")

  private val serviceRollupSql =
    s"""${EventsBilling.cte}
       |SELECT service_tier, resource_type, operation_type,
       |       count(*) AS operation_count,
       |       round(sum(credit_usage), 2) AS total_credit_usage,
       |       round(sum(credit_usage), 2) / count(*) AS avg_credit_usage,
       |       count(DISTINCT user_id) AS unique_users,
       |       CAST(sum(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT) AS successful_operations,
       |       CAST(sum(CASE WHEN success THEN 0 ELSE 1 END) AS BIGINT) AS failed_operations
       |FROM billing GROUP BY service_tier, resource_type, operation_type
       |ORDER BY service_tier, resource_type, operation_type""".stripMargin

  // A4 — region rollup.
  private def regionRollup(s: SparkSession, d: String): DataFrame =
    Aggregates.region(EventsBilling(s, d)).select(
      col("region"), col("operation_count"),
      r2(col("total_credit_usage")).as("total_credit_usage"),
      (r2(col("total_credit_usage")) / col("operation_count"))
        .as("avg_credit_usage"),
      col("unique_users"), col("resource_types"), col("operation_types"),
    ).orderBy("region")

  private val regionRollupSql =
    s"""${EventsBilling.cte}
       |SELECT region,
       |       count(*) AS operation_count,
       |       round(sum(credit_usage), 2) AS total_credit_usage,
       |       round(sum(credit_usage), 2) / count(*) AS avg_credit_usage,
       |       count(DISTINCT user_id) AS unique_users,
       |       count(DISTINCT resource_type) AS resource_types,
       |       count(DISTINCT operation_type) AS operation_types
       |FROM billing GROUP BY region ORDER BY region""".stripMargin

  // A5/A6 — global scalar aggregate.
  private def globalAgg(s: SparkSession, d: String): DataFrame =
    EventsBilling(s, d).agg(
      r2(sum("credit_usage")).as("total_credit_usage"),
      count(lit(1)).as("n_rows"))

  private val globalAggSql =
    s"""${EventsBilling.cte}
       |SELECT round(sum(credit_usage), 2) AS total_credit_usage,
       |       count(*) AS n_rows FROM billing""".stripMargin

  // O1 — top-5 users via TakeOrderedAndProject (no full sort).
  private def topUsers(s: SparkSession, d: String): DataFrame =
    Insights.topUsers(Aggregates.user(EventsBilling(s, d)))

  private val topUsersSql =
    s"""${EventsBilling.cte}
       |SELECT user_id, count(*) AS transaction_count
       |FROM billing GROUP BY user_id
       |ORDER BY transaction_count DESC, user_id LIMIT 5""".stripMargin

  // O1 — top-5 regions by (rounded) spend; rounding before ranking keeps
  // the order stable across engines.
  private def topRegions(s: SparkSession, d: String): DataFrame =
    Insights.topRegions(
      Aggregates.region(EventsBilling(s, d))
        .withColumn("total_credit_usage", r2(col("total_credit_usage"))))

  private val topRegionsSql =
    s"""${EventsBilling.cte}
       |SELECT region, round(sum(credit_usage), 2) AS total_credit_usage
       |FROM billing GROUP BY region
       |ORDER BY total_credit_usage DESC, region LIMIT 5""".stripMargin

  // A7 — operation frequency.
  private def opFrequency(s: SparkSession, d: String): DataFrame =
    Insights.operationFrequency(EventsBilling(s, d))

  private val opFrequencySql =
    s"""${EventsBilling.cte}
       |SELECT operation_type, count(*) AS count
       |FROM billing GROUP BY operation_type
       |ORDER BY count DESC, operation_type""".stripMargin

  // A8 — success-rate ratio of conditional aggregates.
  private def successRates(s: SparkSession, d: String): DataFrame =
    Insights.successRates(EventsBilling(s, d))

  private val successRatesSql =
    s"""${EventsBilling.cte}
       |SELECT service_tier,
       |       CAST(sum(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT) AS success_count,
       |       count(*) AS total_count,
       |       CAST(sum(CASE WHEN success THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS success_rate
       |FROM billing GROUP BY service_tier
       |ORDER BY success_rate DESC, service_tier""".stripMargin

  // A9 — ledger-summary shape (count + sum) over documents-as-ledger.
  private def scalarCounts(s: SparkSession, d: String): DataFrame =
    Insights.ledgerSummary(
      Tables.documents(s, d).withColumnRenamed("n_chars", "record_count"))

  private val scalarCountsSql =
    """SELECT count(*) AS files_processed,
      |       CAST(sum(n_chars) AS BIGINT) AS records_ingested
      |FROM documents""".stripMargin

  // Joins beyond the reference (zero-cost Spark built-ins, SURVEY §2.3).
  private def joinRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
      .orderBy("o_orderpriority")

  private val joinRevenueSql =
    """SELECT o_orderpriority, count(*) AS n_items,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // Star-schema join: explicit broadcast of the small dimensions.
  private def joinDims(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"),
        r2(sum("c_acctbal")).as("total_acctbal"))
      .orderBy("r_name", "n_name")

  private val joinDimsSql =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |       round(sum(c_acctbal), 2) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // LEFT SEMI (EXISTS).
  private def semiJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") > 45),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")

  private val semiJoinSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |ORDER BY o_orderkey""".stripMargin

  // LEFT OUTER + aggregate with empty-group handling (F9-style coalesce).
  private def outerJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("o_custkey") === col("c_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("order_count"),
        r2(coalesce(sum("o_totalprice"), lit(0.0))).as("total_spend"))
      .orderBy("c_custkey")

  private val outerJoinSql =
    """SELECT c_custkey, count(o_orderkey) AS order_count,
      |       round(coalesce(sum(o_totalprice), 0), 2) AS total_spend
      |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // §2.6 — set operations (UNION distinct, EXCEPT).
  private def setOps(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select("event_id")
    e.filter(col("event_id") % 2 === 0)
      .union(e.filter(col("event_id") % 3 === 0)).distinct()
      .except(e.filter(col("event_id") % 5 === 0))
      .orderBy("event_id")
  }

  private val setOpsSql =
    """(SELECT event_id FROM events WHERE event_id % 2 = 0)
      |UNION
      |(SELECT event_id FROM events WHERE event_id % 3 = 0)
      |EXCEPT
      |(SELECT event_id FROM events WHERE event_id % 5 = 0)
      |ORDER BY event_id""".stripMargin

  // §2.8 — ranking window: top-3 users per event_type.
  private def windowTopN(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("n").desc, col("user_id").asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("event_type", "rn")
  }

  private val windowTopNSql =
    """WITH c AS (SELECT event_type, user_id, count(*) AS n
      |           FROM events GROUP BY event_type, user_id)
      |SELECT event_type, user_id, n, CAST(rn AS INTEGER) AS rn FROM
      |  (SELECT *, row_number() OVER
      |     (PARTITION BY event_type ORDER BY n DESC, user_id) AS rn FROM c)
      |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin

  // §2.8 — running total per user (integer-valued so engine-internal
  // summation trees can't perturb the result).
  private def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("running", sum(col("event_id") % 10).over(w))
      .select("event_id", "user_id", "running")
      .orderBy("event_id")
  }

  private val windowRunningSql =
    """SELECT event_id, user_id,
      |       CAST(sum(event_id % 10) OVER
      |         (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS running
      |FROM events ORDER BY event_id""".stripMargin

  // Offset windows (lag/lead): inter-event deltas per user — the
  // session-analysis primitive the running/rank gates don't cover.
  private def windowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("next_id", lead(col("event_id"), 1).over(w))
      .select(col("event_id"), col("user_id"),
        (unix_millis(col("ts")) - coalesce(col("prev_ms"),
          unix_millis(col("ts")))).as("gap_ms"),
        coalesce(col("next_id"), lit(-1L)).as("next_id"))
      .orderBy("event_id")
  }

  private val windowLagSql =
    """SELECT event_id, user_id,
      |       epoch_ms(ts) - coalesce(lag(epoch_ms(ts), 1) OVER
      |         (PARTITION BY user_id ORDER BY ts, event_id), epoch_ms(ts))
      |         AS gap_ms,
      |       coalesce(lead(event_id, 1) OVER
      |         (PARTITION BY user_id ORDER BY ts, event_id), -1) AS next_id
      |FROM events ORDER BY event_id""".stripMargin

  // Time-series gap fill: per-user daily usage on a continuous day
  // scaffold (sequence + explode), missing days forward-filled with
  // last-observation-carried-forward (`last(..., ignoreNulls)` over an
  // unbounded-preceding window) — the resample/interpolate primitive of
  // metric pipelines. The scaffold explode multiplies rows BEFORE the
  // window shuffle, but only for the deterministic user subset.
  private def gapFill(s: SparkSession, d: String): DataFrame = {
    val ev = EventsBilling(s, d)
      .filter(col("user_id").cast("long") % 40 === 0)
      .groupBy(col("user_id"), to_date(col("timestamp")).as("day"))
      .agg(round(sum("credit_usage"), 2).as("daily_usage"))
    val scaffold = ev.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold.join(ev, Seq("user_id", "day"), "left")
      .withColumn("filled_usage",
        last(col("daily_usage"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day").cast("string").as("day"),
        col("daily_usage"), col("filled_usage"))
      .orderBy("user_id", "day")
  }

  private val gapFillSql =
    s"""${EventsBilling.cte},
       |ev AS (SELECT user_id, CAST("timestamp" AS DATE) AS day,
       |              round(sum(credit_usage), 2) AS daily_usage
       |       FROM billing WHERE CAST(user_id AS BIGINT) % 40 = 0
       |       GROUP BY 1, 2),
       |b AS (SELECT user_id, min(day) AS d0, max(day) AS d1
       |      FROM ev GROUP BY 1),
       |sc AS (SELECT user_id,
       |              CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
       |                   AS DATE) AS day
       |       FROM b)
       |SELECT sc.user_id, CAST(sc.day AS VARCHAR) AS day, ev.daily_usage,
       |       last_value(ev.daily_usage IGNORE NULLS) OVER
       |         (PARTITION BY sc.user_id ORDER BY sc.day
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS filled_usage
       |FROM sc LEFT JOIN ev ON sc.user_id = ev.user_id AND sc.day = ev.day
       |ORDER BY sc.user_id, day""".stripMargin

  // T4-style last-wins row per key (row_number dedup).
  private def latestPerUser(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"))
      .orderBy("user_id")
  }

  private val latestPerUserSql =
    """SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM
      |  (SELECT *, row_number() OVER
      |     (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |   FROM events)
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // F1/F2/P5/P6 — CASE/CAST expression surface.
  private def caseCast(s: SparkSession, d: String): DataFrame = {
    val highDisc = when(col("l_discount") > 0.05, 1).otherwise(0)
    Tables.lineitem(s, d).groupBy("l_returnflag").agg(
      sum(highDisc).as("high_disc"),
      count(lit(1)).as("total"),
      (sum(highDisc).cast("double") / count(lit(1))).as("high_disc_rate"),
      r2(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))
        .otherwise(0))).as("high_disc_price"),
    ).orderBy("l_returnflag")
  }

  private val caseCastSql =
    """SELECT l_returnflag,
      |       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS high_disc,
      |       count(*) AS total,
      |       CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS high_disc_rate,
      |       round(sum(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2) AS high_disc_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // F9 — NULLIF/COALESCE display defaults.
  private def nullHandling(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(coalesce(expr("nullif(lang, 'en')"), lit("unknown"))
        .as("lang_disp"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang_disp")

  private val nullHandlingSql =
    """SELECT coalesce(nullif(lang, 'en'), 'unknown') AS lang_disp,
      |       count(*) AS n
      |FROM documents GROUP BY 1 ORDER BY lang_disp""".stripMargin

  // F3 — md5 content hashing.
  private def md5Hash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .orderBy("doc_id")

  private val md5HashSql =
    "SELECT doc_id, md5(text) AS h FROM documents ORDER BY doc_id"

  // F8 — URL parsing (regex route; both engines share the patterns).
  private def urlParse(s: SparkSession, d: String): DataFrame = {
    val url = concat(lit("https://"), col("source"),
      lit(".example.com/doc/"), col("doc_id").cast("string"))
    Tables.documents(s, d)
      .withColumn("url", url)
      .select(col("doc_id"), col("url"),
        regexp_extract(col("url"), "^([a-z]+)://", 1).as("protocol"),
        regexp_extract(col("url"), "://([^/]+)", 1).as("host"),
        regexp_extract(col("url"), "://[^/]+(/.*)$", 1).as("path"))
      .orderBy("doc_id")
  }

  private val urlParseSql =
    """WITH u AS (SELECT doc_id,
      |  concat('https://', source, '.example.com/doc/',
      |         CAST(doc_id AS VARCHAR)) AS url FROM documents)
      |SELECT doc_id, url,
      |       regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
      |       regexp_extract(url, '://([^/]+)', 1) AS host,
      |       regexp_extract(url, '://[^/]+(/.*)$', 1) AS path
      |FROM u ORDER BY doc_id""".stripMargin

  // F5 — date-range enumeration (sequence+explode ≙ generate_series).
  private def dateSeries(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(to_date(min("o_orderdate")).as("d0"))
      .select(explode(sequence(col("d0"), date_add(col("d0"), 30)))
        .as("d"))
      .orderBy("d")

  private val dateSeriesSql =
    """SELECT CAST(unnest(generate_series(d0, d0 + INTERVAL 30 DAY,
      |                                   INTERVAL 1 DAY)) AS DATE) AS d
      |FROM (SELECT CAST(min(o_orderdate) AS DATE) AS d0 FROM orders)
      |ORDER BY d""".stripMargin

  // O3 — preview limit.
  private def preview(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).select("r_regionkey", "r_name")
      .orderBy("r_regionkey").limit(5)

  private val previewSql =
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey LIMIT 5"

  // ---- typed cogroup -------------------------------------------------------
  /** The typed `KeyValueGroupedDataset.cogroup` surface (SURVEY §1.4's
    * "Dataset[T] at the API edge"): per customer, both sides' groups
    * arrive as iterators in one function — arbitrary per-key logic the
    * relational API can't express. This instance IS relationally
    * expressible on purpose, so the oracle (a LEFT JOIN aggregate)
    * value-checks the cogroup machinery itself. Scale shape: one shuffle
    * per side on the key, no skewed window, per-group memory only.
    */
  private def cogroupAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, d)
      .select(col("o_custkey").as("k"), col("o_totalprice").as("v"))
      .as[(Long, Double)].groupByKey(_._1)
    val custs = Tables.customer(s, d).filter(col("c_custkey") % 50 === 0)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("b"))
      .as[(Long, Double)].groupByKey(_._1)
    custs.cogroup(orders) { case (k, cs, os) =>
      cs.toSeq.headOption.iterator.map { c =>
        val totals = os.map(_._2).toSeq
        val total = BigDecimal(totals.sum)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        (k, totals.size.toLong, total, c._2)
      }
    }.toDF("k", "n_orders", "total", "acctbal")
      .orderBy("k")
  }

  private val cogroupAggSql =
    """SELECT c_custkey AS k,
      |       count(o.o_custkey) AS n_orders,
      |       round(coalesce(sum(o.o_totalprice), 0), 2) AS total,
      |       c_acctbal AS acctbal
      |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |WHERE c_custkey % 50 = 0
      |GROUP BY c_custkey, c_acctbal ORDER BY k""".stripMargin

  def gates: Seq[Gate] = Seq(
    Gate("q_cogroup", cogroupAgg, Some(cogroupAggSql)),
    Gate("q_daily_rollup", dailyRollup, Some(dailyRollupSql)),
    Gate("q_user_rollup", userRollup, Some(userRollupSql)),
    Gate("q_user_rollup_approx", userRollupApprox, Some(userRollupApproxSql)),
    Gate("q_service_rollup", serviceRollup, Some(serviceRollupSql)),
    Gate("q_region_rollup", regionRollup, Some(regionRollupSql)),
    Gate("q_global_agg", globalAgg, Some(globalAggSql)),
    Gate("q_top_users", topUsers, Some(topUsersSql)),
    Gate("q_top_regions", topRegions, Some(topRegionsSql)),
    Gate("q_op_frequency", opFrequency, Some(opFrequencySql)),
    Gate("q_success_rates", successRates, Some(successRatesSql)),
    Gate("q_scalar_counts", scalarCounts, Some(scalarCountsSql)),
    Gate("q_join_revenue", joinRevenue, Some(joinRevenueSql)),
    Gate("q_join_dims", joinDims, Some(joinDimsSql)),
    Gate("q_semi_join", semiJoin, Some(semiJoinSql)),
    Gate("q_outer_join", outerJoin, Some(outerJoinSql)),
    Gate("q_set_ops", setOps, Some(setOpsSql)),
    Gate("q_window_topn", windowTopN, Some(windowTopNSql)),
    Gate("q_window_running", windowRunning, Some(windowRunningSql)),
    Gate("q_window_lag", windowLag, Some(windowLagSql)),
    Gate("q_gap_fill", gapFill, Some(gapFillSql)),
    Gate("q_latest_per_user", latestPerUser, Some(latestPerUserSql)),
    Gate("q_case_cast", caseCast, Some(caseCastSql)),
    Gate("q_null_handling", nullHandling, Some(nullHandlingSql)),
    Gate("q_md5", md5Hash, Some(md5HashSql)),
    Gate("q_url_parse", urlParse, Some(urlParseSql)),
    Gate("q_date_series", dateSeries, Some(dateSeriesSql)),
    Gate("q_preview", preview, Some(previewSql)),
  )
}
