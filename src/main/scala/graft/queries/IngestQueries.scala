package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Gate, Tables}
import graft.billing.{HivePaths, Ingest}

/** Ingestion-path gates: the J1 dedup anti-join, T6 backfill pruning,
  * S5/S6 hive-path round-trip, and an S1/S8/S9 CSV write→glob-read cycle
  * (rows-only — the oracle runs over parquet, not our CSV side-products).
  */
object IngestQueries {

  // J1 — dedup anti-join: staged = all events, existing = every third row;
  // new rows are exactly those without a natural-key match.
  private def dedupAnti(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val existing = events.filter(col("event_id") % 3 === 0)
    Ingest.newRows(events, existing, Seq("ts", "user_id", "event_id"))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"))
      .orderBy("event_id")
  }

  private val dedupAntiSql =
    """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events e
      |WHERE NOT EXISTS (SELECT 1 FROM events d
      |  WHERE d.event_id % 3 = 0 AND d.ts = e.ts
      |    AND d.user_id = e.user_id AND d.event_id = e.event_id)
      |ORDER BY event_id""".stripMargin

  // T6 — backfill window: partition-column predicate over the billing shape.
  private def backfillWindow(s: SparkSession, d: String): DataFrame =
    Ingest.backfill(EventsBilling(s, d), "2024-01-10", "2024-01-20")
      .groupBy("year", "month", "day")
      .agg(count(lit(1)).as("n"),
        round(sum("credit_usage"), 2).as("total_credit_usage"))
      .orderBy("year", "month", "day")

  private val backfillWindowSql =
    s"""${EventsBilling.cte}
       |SELECT year, month, day, count(*) AS n,
       |       round(sum(credit_usage), 2) AS total_credit_usage
       |FROM billing
       |WHERE make_date(year, month, day)
       |      BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'
       |GROUP BY year, month, day ORDER BY year, month, day""".stripMargin

  // S5/S6/F7 — hive path build + regex parse round-trip.
  private def hivePaths(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val paths = e.select(
      HivePaths.pathFor(year(col("ts")), month(col("ts")),
        dayofmonth(col("ts"))).as("path")).distinct()
    paths.select(col("path"),
      HivePaths.yearOf(col("path")).as("year"),
      HivePaths.monthOf(col("path")).as("month"),
      HivePaths.dayOf(col("path")).as("day"))
      .orderBy("path")
  }

  private val hivePathsSql =
    """WITH p AS (SELECT DISTINCT concat(
      |    'year=', CAST(year(ts) AS VARCHAR),
      |    '/month=', lpad(CAST(month(ts) AS VARCHAR), 2, '0'),
      |    '/day=', lpad(CAST(day(ts) AS VARCHAR), 2, '0')) AS path
      |  FROM events)
      |SELECT path,
      |       CAST(regexp_extract(path, 'year=(\d+)', 1) AS INTEGER) AS year,
      |       CAST(regexp_extract(path, 'month=(\d+)', 1) AS INTEGER) AS month,
      |       CAST(regexp_extract(path, 'day=(\d+)', 1) AS INTEGER) AS day
      |FROM p ORDER BY path""".stripMargin

  // S1/S8/S9 — CSV sink + glob re-scan with the fixed schema. The oracle
  // aggregates the *source* relation directly: a correct write→read cycle
  // must preserve every row, so the CSV side-trip has to be value-invisible.
  private def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = graft.Gate.tmpDir("graft_csv_")
    val billing = EventsBilling(s, d)
    billing.write.mode("overwrite").option("header", "true").csv(out)
    Ingest.readCsv(s, s"$out/part-*.csv")
      .groupBy("operation_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("operation_type")
  }

  private val csvRoundtripSql =
    s"""${EventsBilling.cte}
       |SELECT operation_type, count(*) AS n
       |FROM billing GROUP BY operation_type ORDER BY operation_type"""
      .stripMargin

  /** S2 — direct-from-object-store scan, exercised for real against a
    * loopback object store. The reference's ingress is anonymous HTTP(S)
    * GETs of explicitly-enumerated partition objects in a public bucket
    * (DuckDB httpfs + `generate_partition_paths`, s3_utils.py:300-410);
    * this gate reproduces that mechanism end to end: a JDK HttpServer
    * plays the bucket, serving `year=/month=/day=/billing.csv` objects,
    * and EXECUTORS read the `http://` URLs directly through
    * [[graft.sources.HttpObjectFileSystem]] — no driver-side staging,
    * the same FileSystem-API path an `s3a://` URL takes on a real
    * cluster (s3a adds seek/range reads; sequential CSV needs neither). The aggregate
    * is materialized while the store is up; the oracle mirrors it over
    * the source rows, so the remote scan must be value-invisible.
    */
  private def s3Scan(s: SparkSession, d: String): DataFrame = {
    val billing = EventsBilling(s, d)
    val days = billing.select("year", "month", "day").distinct()
      .orderBy("year", "month", "day").limit(2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    val stage = graft.Gate.tmpDir("gate_s3_stage_")
    val objects = days.map { case (y, m, dd) =>
      val tmp = s"$stage/y${y}m${m}d$dd"
      billing.filter(col("year") === y && col("month") === m &&
          col("day") === dd)
        .coalesce(1).write.option("header", "true").mode("overwrite").csv(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".csv")).get
      val key = f"/bucket/year=$y/month=$m%02d/day=$dd%02d/billing.csv"
      key -> java.nio.file.Files.readAllBytes(part.toPath)
    }
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    objects.foreach { case (key, bytes) =>
      server.createContext(key,
        new com.sun.net.httpserver.HttpHandler {
          override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit =
            try {
              if (ex.getRequestMethod == "HEAD") {
                ex.getResponseHeaders.set("Content-Length",
                  bytes.length.toString)
                ex.sendResponseHeaders(200, -1L)
              } else {
                ex.sendResponseHeaders(200, bytes.length.toLong)
                ex.getResponseBody.write(bytes)
              }
            } finally ex.close()
        })
    }
    server.start()
    try {
      val port = server.getAddress.getPort
      s.sparkContext.hadoopConfiguration.set("fs.http.impl",
        "graft.sources.HttpObjectFileSystem")
      val urls = objects.map { case (key, _) =>
        s"http://127.0.0.1:$port$key"
      }
      val out = graft.Gate.tmpDir("gate_s3_out_")
      Ingest.readCsv(s, urls: _*)
        .groupBy("year", "month", "day")
        .agg(count(lit(1)).as("n"),
          round(sum("credit_usage"), 2).as("total_usage"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).orderBy("year", "month", "day")
    } finally server.stop(0)
  }

  private val s3ScanSql =
    s"""${EventsBilling.cte},
       |d2 AS (SELECT DISTINCT year, month, day FROM billing
       |       ORDER BY year, month, day LIMIT 2)
       |SELECT b.year, b.month, b.day, count(*) AS n,
       |       round(sum(b.credit_usage), 2) AS total_usage
       |FROM billing b JOIN d2 USING (year, month, day)
       |GROUP BY b.year, b.month, b.day
       |ORDER BY b.year, b.month, b.day""".stripMargin

  /** Data-quality validation ([[graft.billing.Checks]]): the reference's
    * DDL constraints (natural-key UNIQUE, domain/null expectations)
    * re-expressed as a one-scan violation audit — N checks compile to one
    * partial+final aggregate plus one exact composite-key distinct. The
    * oracle mirrors every counter, so both engines must agree on the
    * violation numbers themselves, not just pass/fail.
    */
  private def dataChecks(s: SparkSession, d: String): DataFrame =
    graft.billing.Checks.validateBilling(EventsBilling(s, d))

  private val dataChecksSql =
    s"""${EventsBilling.cte},
       |m AS (SELECT
       |  sum(CASE WHEN "timestamp" IS NULL THEN 1 ELSE 0 END)
       |    AS null_timestamp,
       |  sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS null_user_id,
       |  sum(CASE WHEN credit_usage < 0 THEN 1 ELSE 0 END)
       |    AS negative_usage,
       |  sum(CASE WHEN NOT (month BETWEEN 1 AND 12 AND day BETWEEN 1 AND
       |      day(last_day(make_date(year,
       |        CASE WHEN month BETWEEN 1 AND 12 THEN month ELSE 1 END, 1))))
       |      THEN 1 ELSE 0 END) AS bad_partition_date,
       |  sum(CASE WHEN currency NOT IN ('USD', 'EUR', 'GBP') THEN 1
       |      ELSE 0 END) AS currency_domain,
       |  count(*) - (SELECT count(*) FROM
       |    (SELECT DISTINCT "timestamp", resource_id, user_id, invoice_id
       |     FROM billing)) AS duplicate_natural_key
       |  FROM billing)
       |SELECT "check", CAST(violations AS BIGINT) AS violations,
       |       violations = 0 AS ok FROM (
       |  SELECT 'null_timestamp' AS "check", null_timestamp AS violations
       |  FROM m
       |  UNION ALL SELECT 'null_user_id', null_user_id FROM m
       |  UNION ALL SELECT 'negative_usage', negative_usage FROM m
       |  UNION ALL SELECT 'bad_partition_date', bad_partition_date FROM m
       |  UNION ALL SELECT 'currency_domain', currency_domain FROM m
       |  UNION ALL SELECT 'duplicate_natural_key', duplicate_natural_key
       |  FROM m)
       |ORDER BY "check"""".stripMargin

  // Columnar sink/scan roundtrip (ORC, Spark-built-in): same
  // value-invisibility contract as the CSV roundtrip, but through a
  // format with stripe-level min/max stats — the post-roundtrip date
  // filter is pushed to the ORC scan (PushedFilters), which is the
  // property that matters at 100 TB (CSV can never skip bytes; ORC and
  // parquet skip whole stripes/row-groups).
  private def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = graft.Gate.tmpDir("graft_orc_")
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .filter(col("l_shipdate") >= lit("1996-01-01"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  private val orcRoundtripSql =
    """SELECT l_returnflag, count(*) AS n,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // Row-document sink/scan roundtrip through Spark 4's built-in XML
  // source (one <order> element per row, explicit read schema so no
  // inference drift): the interchange format the reference family's
  // HTTP-fallback feeds actually arrive in when the upstream is an
  // enterprise billing export. XML, like CSV, can never skip bytes —
  // the gate's aggregate-after-roundtrip pins value fidelity
  // (doubles survive text round-trip via shortest-repr printing), and
  // the format's place at 100 TB is ingest-edge-only: land it once,
  // convert to parquet, never scan it twice.
  private def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val out = graft.Gate.tmpDir("graft_xml_")
    Tables.orders(s, d)
      .select(col("o_orderkey").cast("long"),
        col("o_orderstatus").cast("string"),
        col("o_totalprice").cast("double"))
      .write.mode("overwrite").option("rowTag", "order").xml(out)
    s.read
      .schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
      .option("rowTag", "order").xml(out)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  private val xmlRoundtripSql =
    """SELECT o_orderstatus, count(*) AS n,
      |       round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // Ingest resilience: a delivery containing malformed lines must not
  // poison the load — PERMISSIVE mode + columnNameOfCorruptRecord
  // captures each bad line as a row with the raw text in `_corrupt`, the
  // load path filters them out and continues (the reference's
  // read_csv_auto simply throws on the whole file). `corrupt_seen` pins
  // that the malformed delivery really was read and quarantined — without
  // it, silently skipping the bad file would also pass the aggregate.
  private def csvPermissive(s: SparkSession, d: String): DataFrame = {
    val out = graft.Gate.tmpDir("graft_perm_")
    EventsBilling(s, d).write.mode("overwrite")
      .option("header", "true").csv(out)
    // malformed delivery: first line is consumed as the file's header,
    // then one under-arity line (timestamp unparsable) and one over-arity
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "part-corrupt.csv"),
      "garbage header line\n1,2,3\n" + ("x," * 20) + "x\n")
    val withCorrupt = graft.billing.Schemas.billing
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    val rows = s.read.option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(withCorrupt).csv(s"$out/*.csv")
      .persist()
    val nCorrupt = rows.filter(col("_corrupt").isNotNull).count()
    rows.filter(col("_corrupt").isNull)
      .groupBy("operation_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("corrupt_seen", lit(nCorrupt == 2))
      .orderBy("operation_type")
  }

  private val csvPermissiveSql =
    s"""${EventsBilling.cte}
       |SELECT operation_type, count(*) AS n, true AS corrupt_seen
       |FROM billing GROUP BY operation_type ORDER BY operation_type"""
      .stripMargin

  /** JSONL corpus ingest ([[graft.sources.Jsonl]]): the documents table
    * round-trips through newline-delimited JSON with deterministic
    * corrupt lines interleaved (every 50th doc id contributes a
    * truncated object). The permissive schema'd read must (a) parse
    * every good line losslessly — md5(text) pins the round trip byte
    * for byte, JSON escaping included — and (b) capture every corrupt
    * line WHOLE in the quarantine column, pinned by hashing the
    * captured raw line against the oracle's reconstruction of it.
    */
  private def jsonlScan(s: SparkSession, d: String): DataFrame = {
    val out = graft.Gate.tmpDir("graft_jsonl_")
    val docs = Tables.documents(s, d)
    docs.select(to_json(struct(col("doc_id"), col("text"))).as("value"))
      .unionByName(docs.filter(col("doc_id") % 50 === 0)
        .select(concat(lit("{broken json "), col("doc_id")).as("value")))
      .write.mode("overwrite").text(out)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    // cached: Spark disallows projecting ONLY the corrupt-record column
    // straight off a raw scan (the `bad` branch below does exactly that)
    val rows = graft.sources.Jsonl.read(s, schema)(out).persist()
    val good = rows.filter(col("_corrupt").isNull)
      .select(col("doc_id").as("id"), lit("ok").as("kind"),
        md5(col("text")).as("h"))
    val bad = rows.filter(col("_corrupt").isNotNull)
      .select(regexp_extract(col("_corrupt"), "(\\d+)$", 1)
          .cast("long").as("id"),
        lit("corrupt").as("kind"), md5(col("_corrupt")).as("h"))
    good.unionByName(bad).orderBy("kind", "id")
  }

  private val jsonlScanSql =
    """SELECT doc_id AS id, 'ok' AS kind, md5(text) AS h FROM documents
      |UNION ALL
      |SELECT doc_id, 'corrupt', md5('{broken json ' || doc_id)
      |FROM documents WHERE doc_id % 50 = 0
      |ORDER BY kind, id""".stripMargin

  // Schema evolution on read: two parquet batches written with DIFFERENT
  // column sets (a column added mid-stream, another retired) unify under
  // mergeSchema=true into the superset schema with nulls where a batch
  // lacked the column — the "upstream added a field" story the fixed-DDL
  // reference cannot absorb (its read_csv_auto binds by position). The
  // per-column non-null counts pin that values landed in the RIGHT
  // columns, not merely that the read succeeded.
  private def mergeSchema(s: SparkSession, d: String): DataFrame = {
    val out = graft.Gate.tmpDir("graft_ms_")
    val ord = Tables.orders(s, d)
    ord.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$out/b1")
    ord.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$out/b2")
    s.read.option("mergeSchema", "true").parquet(s"$out/b1", s"$out/b2")
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_with_price"),
        count(col("o_orderpriority")).as("n_with_priority"),
        round(sum("o_totalprice"), 2).as("sum_price"))
  }

  private val mergeSchemaSql =
    """SELECT count(*) AS n_rows,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_with_price,
      |       CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_with_priority,
      |       round(sum(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END),
      |             2) AS sum_price
      |FROM orders""".stripMargin

  // Small-file compaction (BillingStore.compactRaw): three fragmented
  // appends leave ~24 files per day partition; compaction rewrites each
  // fragmented partition into one file via dynamic partition overwrite.
  // The aggregate hash proves the rewrite changed no rows; files_ok pins
  // the layout actually collapsed (and that compaction genuinely found
  // fragmented partitions to rewrite).
  private def compactStore(s: SparkSession, d: String): DataFrame = {
    val store = graft.billing.BillingStore(graft.Gate.tmpDir("gate_compact_"))
    // one week of data keeps the partition count (and so the number of
    // deliberately-fragmented files) bounded: the gate is about layout
    // mechanics, and 2 deliveries × 6 tasks × 7 day partitions already
    // exercises them; the full-history spelling wrote ~2000 tiny files
    // and spent 12 s proving the same thing
    // manufacture the small-files state directly: an explicit
    // repartition(6) (user-pinned counts are exempt from AQE coalescing,
    // unlike the shuffle inside appendDedup, which AQE collapses to one
    // task at small SFs) → 6 writer tasks × 7 day partitions = 6 files
    // per partition. Append/dedup semantics are gated separately
    // (q_dedup_anti, BillingStoreSpec); this gate is about layout repair.
    EventsBilling(s, d)
      .filter(col("year") === 2024 && col("month") === 1 && col("day") <= 7)
      .repartition(6)
      .write.mode("append").partitionBy("year", "month", "day")
      .parquet(store.rawPath)
    val (parts, files) = store.compactRaw(s)
    val maxAfter = store.raw(s)
      .select(col("year"), col("month"), col("day"),
        input_file_name().as("f"))
      .groupBy("year", "month", "day")
      .agg(countDistinct(col("f")).as("nf"))
      .agg(max("nf")).head().getLong(0)
    store.raw(s)
      .groupBy("year", "month", "day")
      .agg(count(lit(1)).as("n"),
        round(sum("credit_usage"), 2).as("total_credit_usage"))
      .withColumn("files_ok",
        lit(parts > 0 && files > parts && maxAfter == 1))
      .orderBy("year", "month", "day")
  }

  private val compactStoreSql =
    s"""${EventsBilling.cte}
       |SELECT year, month, day, count(*) AS n,
       |       round(sum(credit_usage), 2) AS total_credit_usage,
       |       true AS files_ok
       |FROM billing WHERE year = 2024 AND month = 1 AND day <= 7
       |GROUP BY year, month, day
       |ORDER BY year, month, day""".stripMargin

  /** Retention gate ([[graft.billing.BillingStore.vacuumBefore]]): a
    * week of day-partitioned store, vacuum everything before day 4 —
    * partition-dir deletes, no rewrite. The surviving per-day aggregate
    * is mirrored by the oracle; `dropped_ok` pins that exactly the
    * expired partitions went away.
    */
  private def vacuumStore(s: SparkSession, d: String): DataFrame = {
    val store = graft.billing.BillingStore(graft.Gate.tmpDir("gate_vacuum_"))
    EventsBilling(s, d)
      .filter(col("year") === 2024 && col("month") === 1 && col("day") <= 7)
      .write.mode("append").partitionBy("year", "month", "day")
      .parquet(store.rawPath)
    val dropped = store.vacuumBefore(s, 2024, 1, 4)
    store.raw(s)
      .groupBy("year", "month", "day")
      .agg(count(lit(1)).as("n"),
        round(sum("credit_usage"), 2).as("total_credit_usage"))
      .withColumn("dropped_ok", lit(dropped == 3L))
      .orderBy("year", "month", "day")
  }

  private val vacuumStoreSql =
    s"""${EventsBilling.cte}
       |SELECT year, month, day, count(*) AS n,
       |       round(sum(credit_usage), 2) AS total_credit_usage,
       |       true AS dropped_ok
       |FROM billing
       |WHERE year = 2024 AND month = 1 AND day BETWEEN 4 AND 7
       |GROUP BY year, month, day
       |ORDER BY year, month, day""".stripMargin

  /** CDC merge gate ([[graft.billing.BillingStore.applyChanges]]): load
    * days 1-5, then one change batch that replaces rows (day-3 usage
    * bump), inserts a new day (6), deletes selected keys (day 2), and
    * wipes day 5 entirely — the last proving emptied partitions are
    * removed, dynamic overwrite's blind spot. The oracle reconstructs
    * the expected end state relationally; `counts_ok` pins the
    * (upserted, deleted) totals the merge reported.
    */
  private def upsertStore(s: SparkSession, d: String): DataFrame = {
    val store = graft.billing.BillingStore(graft.Gate.tmpDir("gate_upsert_"))
    val b = EventsBilling(s, d)
      .filter(col("year") === 2024 && col("month") === 1).persist()
    b.filter(col("day") <= 5).write.mode("append")
      .partitionBy("year", "month", "day").parquet(store.rawPath)
    val uid = col("user_id").cast("long")
    val mods = b.filter(col("day") === 3 && uid % 7 === 0)
      .withColumn("credit_usage", col("credit_usage") + 100.0)
    val inserts = b.filter(col("day") === 6)
    val keyDeletes = b.filter(col("day") === 2 && uid % 5 === 0)
    val wipeDay = b.filter(col("day") === 5)
    val changes = mods.unionByName(inserts).withColumn("op", lit("upsert"))
      .unionByName(
        keyDeletes.unionByName(wipeDay).withColumn("op", lit("delete")))
    val (nUp, nDel) = store.applyChanges(s, changes)
    val countsOk = nUp == mods.count() + inserts.count() &&
      nDel == keyDeletes.count() + wipeDay.count()
    val day5Gone = !new java.io.File(
      s"${store.rawPath}/year=2024/month=1/day=5").exists()
    b.unpersist()
    store.raw(s)
      .groupBy("year", "month", "day")
      .agg(count(lit(1)).as("n"),
        round(sum("credit_usage"), 2).as("total_credit_usage"))
      .withColumn("counts_ok", lit(countsOk && day5Gone))
      .orderBy("year", "month", "day")
  }

  private val upsertStoreSql =
    s"""${EventsBilling.cte}
       |SELECT year, month, day, count(*) AS n,
       |       round(sum(CASE WHEN day = 3
       |                       AND CAST(user_id AS BIGINT) % 7 = 0
       |                      THEN credit_usage + 100.0
       |                      ELSE credit_usage END), 2)
       |         AS total_credit_usage,
       |       true AS counts_ok
       |FROM billing
       |WHERE year = 2024 AND month = 1 AND day <= 6 AND day <> 5
       |  AND NOT (day = 2 AND CAST(user_id AS BIGINT) % 5 = 0)
       |GROUP BY year, month, day
       |ORDER BY year, month, day""".stripMargin

  /** Snapshot reconciliation ([[graft.operators.TableDiff]]): snapshot A
    * is the first 20 days of events; snapshot B applies deterministic
    * deletions (event_id % 97), value modifications (% 53), and five days
    * of additions. The operator classifies every key from 16-byte digests
    * after one full-outer shuffle; the oracle recomputes the same
    * classification relationally from the raw columns — so the digest
    * shortcut is proven equivalent to comparing the rows themselves.
    */
  private def tableDiff(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        dayofmonth(col("ts")).as("day"))
    val snapA = ev.filter(col("day") <= 20)
    val snapB = ev.filter(col("day") <= 25)
      .filter(!(col("event_id") % 97 === 0 && col("day") <= 20))
      .withColumn("value",
        when(col("event_id") % 53 === 0 && col("day") <= 20,
          col("value") + 1.0).otherwise(col("value")))
    graft.operators.TableDiff.diffSummary(snapA, snapB, "event_id",
        Seq("user_id", "value"))
      .orderBy("status")
  }

  private val tableDiffSql =
    """WITH a AS (SELECT event_id, user_id, value FROM events
      |           WHERE day(ts) <= 20),
      |b AS (SELECT event_id, user_id,
      |             CASE WHEN event_id % 53 = 0 AND day(ts) <= 20
      |                  THEN value + 1.0 ELSE value END AS value
      |      FROM events
      |      WHERE day(ts) <= 25
      |        AND NOT (event_id % 97 = 0 AND day(ts) <= 20))
      |SELECT CASE WHEN a.event_id IS NULL THEN 'added'
      |            WHEN b.event_id IS NULL THEN 'removed'
      |            WHEN a.user_id <> b.user_id OR a.value <> b.value
      |              THEN 'changed'
      |            ELSE 'unchanged' END AS status,
      |       count(*) AS n
      |FROM a FULL OUTER JOIN b ON a.event_id = b.event_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** File-skipping range read
    * ([[graft.billing.BillingStore.rawBetween]]): three hour-band
    * appends leave multiple files per day partition, each covering a
    * time slice; a morning window must PRUNE the planned file set via
    * the manifest's timestamp-stats sidecar and still return exactly
    * the plain filter's rows. `skip_ok` pins that skipping dropped
    * files hive partition pruning alone could not (the skipped slices
    * live in the kept day's own partition).
    */
  private def timeSkipStore(s: SparkSession, d: String): DataFrame = {
    val store = graft.billing.BillingStore(graft.Gate.tmpDir("gate_tskip_"))
    val b = EventsBilling(s, d)
      .filter(col("year") === 2024 && col("month") === 1 && col("day") <= 2)
      .persist()
    val h = hour(col("timestamp"))
    store.appendDedup(s, b.filter(h < 8))
    store.appendDedup(s, b.filter(h >= 8))
    b.unpersist()
    val lo = java.time.Instant.parse("2024-01-02T00:00:00Z")
    val hi = java.time.Instant.parse("2024-01-02T08:00:00Z")
    val skipOk = store.filesForRange(s, lo, hi).exists {
      case (kept, total) => kept.nonEmpty && kept.size < total
    }
    store.rawBetween(s, lo, hi)
      .agg(count(lit(1)).as("n"),
        round(sum("credit_usage"), 2).as("total_credit_usage"),
        countDistinct("user_id").as("unique_users"))
      .withColumn("skip_ok", lit(skipOk))
  }

  private val timeSkipStoreSql =
    s"""${EventsBilling.cte}
       |SELECT count(*) AS n,
       |       round(sum(credit_usage), 2) AS total_credit_usage,
       |       count(DISTINCT user_id) AS unique_users,
       |       true AS skip_ok
       |FROM billing
       |WHERE year = 2024 AND month = 1 AND day <= 2
       |  AND "timestamp" >= TIMESTAMP '2024-01-02 00:00:00'
       |  AND "timestamp" < TIMESTAMP '2024-01-02 08:00:00'""".stripMargin

  /** Bloom point-lookup skipping
    * ([[graft.billing.BillingStore.rawForUser]]): two parity-split
    * appends leave each day partition with files holding disjoint user
    * sets; probing one user must prune the planned file set via the
    * manifest's bloom sidecar (the pruned files sit in the SAME
    * partitions as the kept ones, so partition pruning can't help) and
    * still return exactly the plain equality filter's rows.
    */
  private def pointSkipStore(s: SparkSession, d: String): DataFrame = {
    val store = graft.billing.BillingStore(graft.Gate.tmpDir("gate_pskip_"))
    val b = EventsBilling(s, d)
      .filter(col("year") === 2024 && col("month") === 1 && col("day") <= 2)
      .persist()
    val uid = col("user_id").cast("long")
    store.appendDedup(s, b.filter(uid % 2 === 0))
    store.appendDedup(s, b.filter(uid % 2 === 1))
    // probe the smallest EVEN user in the window — data-derived, so it
    // exists at every scale factor (a hardcoded id has no rows at
    // sf0.001 → bloom prunes EVERY file → kept.isEmpty reads as a skip
    // failure when it's actually perfect pruning), and even-parity means
    // the odd append's files are the prunable set
    val probe = b.filter(uid % 2 === 0)
      .agg(min(uid)).head().getLong(0).toString
    b.unpersist()
    val skipOk = store.filesForUser(s, probe).exists {
      case (kept, total) => kept.nonEmpty && kept.size < total
    }
    store.rawForUser(s, probe)
      .agg(count(lit(1)).as("n"),
        round(sum("credit_usage"), 2).as("total_credit_usage"),
        countDistinct("invoice_id").as("invoices"))
      .withColumn("skip_ok", lit(skipOk))
  }

  private val pointSkipStoreSql =
    s"""${EventsBilling.cte}
       |SELECT count(*) AS n,
       |       round(sum(credit_usage), 2) AS total_credit_usage,
       |       count(DISTINCT invoice_id) AS invoices,
       |       true AS skip_ok
       |FROM billing
       |WHERE year = 2024 AND month = 1 AND day <= 2
       |  AND user_id = CAST((SELECT min(CAST(user_id AS BIGINT))
       |                      FROM billing
       |                      WHERE year = 2024 AND month = 1 AND day <= 2
       |                        AND CAST(user_id AS BIGINT) % 2 = 0)
       |                     AS VARCHAR)""".stripMargin

  /** Incremental manifest scan
    * ([[graft.billing.BillingStore.rawChanges]]): append two days,
    * pin the manifest version, append a third day — the incremental
    * read of everything-after-the-pin must return exactly the third
    * day's rows, reading only the files that commit added (O(delta),
    * not O(table)). The oracle recomputes the delta relationally.
    */
  private def incrementalScan(s: SparkSession, d: String): DataFrame = {
    val store = graft.billing.BillingStore(graft.Gate.tmpDir("gate_iscan_"))
    val b = EventsBilling(s, d)
      .filter(col("year") === 2024 && col("month") === 1 && col("day") <= 3)
      .persist()
    store.appendDedup(s, b.filter(col("day") <= 2))
    val v = store.rawVersions(s).last
    store.appendDedup(s, b.filter(col("day") === 3))
    b.unpersist()
    store.rawChanges(s, v)
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        round(sum("credit_usage"), 2).as("total_credit_usage"))
      .orderBy("day")
  }

  private val incrementalScanSql =
    s"""${EventsBilling.cte}
       |SELECT day, count(*) AS n,
       |       round(sum(credit_usage), 2) AS total_credit_usage
       |FROM billing
       |WHERE year = 2024 AND month = 1 AND day = 3
       |GROUP BY day ORDER BY day""".stripMargin

  /** Cross-table snapshot ([[graft.billing.BillingStore.snapshot]]):
    * two incremental appends (raw + partials fold committed in
    * lock-step), then a snapshot — the daily rollup finalized from the
    * PINNED partials must equal the rollup recomputed from the PINNED
    * raw (`consistent_ok`), and the values must match the oracle's
    * relational recompute. The reference gets cross-table consistency
    * from its single DuckDB file; the store commits a version vector.
    */
  private def snapshotStore(s: SparkSession, d: String): DataFrame = {
    val store = graft.billing.BillingStore(graft.Gate.tmpDir("gate_snap_"))
    val b = EventsBilling(s, d)
      .filter(col("year") === 2024 && col("month") === 1 && col("day") <= 3)
      .persist()
    store.appendIncremental(s, b.filter(col("day") <= 2))
    store.appendIncremental(s, b.filter(col("day") === 3))
    b.unpersist()
    val snap = store.snapshot(s)
    val cols = Seq(col("year"), col("month"), col("day"),
      col("transaction_count"),
      round(col("total_credit_usage"), 2).as("total_credit_usage"),
      col("successful_operations"), col("failed_operations"))
    val fromPartials = snap.dailyFromPartials(s).select(cols: _*)
    val fromRaw = graft.billing.Aggregates.daily(snap.raw(s))
      .select(cols: _*)
    val consistent = fromPartials.collect().map(_.toSeq).toSet ==
      fromRaw.collect().map(_.toSeq).toSet
    fromPartials.withColumn("consistent_ok", lit(consistent))
      .orderBy("year", "month", "day")
  }

  private val snapshotStoreSql =
    s"""${EventsBilling.cte}
       |SELECT year, month, day, count(*) AS transaction_count,
       |       round(sum(credit_usage), 2) AS total_credit_usage,
       |       CAST(sum(CASE WHEN success THEN 1 ELSE 0 END) AS BIGINT)
       |         AS successful_operations,
       |       CAST(sum(CASE WHEN success THEN 0 ELSE 1 END) AS BIGINT)
       |         AS failed_operations,
       |       true AS consistent_ok
       |FROM billing
       |WHERE year = 2024 AND month = 1 AND day <= 3
       |GROUP BY year, month, day
       |ORDER BY year, month, day""".stripMargin

  def gates: Seq[Gate] = Seq(
    Gate("q_dedup_anti", dedupAnti, Some(dedupAntiSql)),
    Gate("q_backfill_window", backfillWindow, Some(backfillWindowSql)),
    Gate("q_hive_paths", hivePaths, Some(hivePathsSql)),
    Gate("q_csv_roundtrip", csvRoundtrip, Some(csvRoundtripSql)),
    Gate("q_orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql)),
    Gate("q_xml_roundtrip", xmlRoundtrip, Some(xmlRoundtripSql)),
    Gate("q_s3_scan", s3Scan, Some(s3ScanSql)),
    Gate("q_data_checks", dataChecks, Some(dataChecksSql)),
    Gate("q_csv_permissive", csvPermissive, Some(csvPermissiveSql)),
    Gate("q_jsonl_scan", jsonlScan, Some(jsonlScanSql)),
    Gate("q_merge_schema", mergeSchema, Some(mergeSchemaSql)),
    Gate("q_compact_store", compactStore, Some(compactStoreSql)),
    Gate("q_table_diff", tableDiff, Some(tableDiffSql)),
    Gate("q_vacuum_store", vacuumStore, Some(vacuumStoreSql)),
    Gate("q_upsert_store", upsertStore, Some(upsertStoreSql)),
    Gate("q_time_skip", timeSkipStore, Some(timeSkipStoreSql)),
    Gate("q_point_skip", pointSkipStore, Some(pointSkipStoreSql)),
    Gate("q_incremental_scan", incrementalScan, Some(incrementalScanSql)),
    Gate("q_snapshot_store", snapshotStore, Some(snapshotStoreSql)),
  )
}
