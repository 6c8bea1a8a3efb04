package graft.billing

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed storage for the billing data model — the Spark mapping of
  * the reference's six DuckDB tables (SURVEY §1.4, §2.1 S9-S13):
  * dedup-append for the fact table, overwrite for the rebuilt rollups
  * (DELETE+INSERT ≙ `mode("overwrite")`), schemas fixed by construction.
  *
  * Scale notes: the fact table is partitioned by (year, month, day) so
  * date-window queries prune at the file index, appends only touch the
  * partitions present in the batch, and the dedup anti-join reads only
  * those partitions back (the reference's UNIQUE key can only collide
  * within a day, because `timestamp` is part of the key).
  *
  * Concurrency: every mutator serializes on the store's [[TableLock]] —
  * without it, an append racing `compactRaw`'s dynamic partition
  * overwrite can have its freshly-written file deleted by the partition
  * swap (silently lost rows). Readers take no lock. Proven by
  * BillingStoreConcurrencySpec: interleaved appends and compactions
  * lose zero rows.
  */
final case class BillingStore(root: String) {
  val rawPath = s"$root/raw_billing"
  val ledgerPath = s"$root/processed_files"
  val dailyPartialsPath = s"$root/daily_partials"
  def aggPath(name: String) = s"$root/${name}_aggs"

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def raw(spark: SparkSession): DataFrame =
    if (exists(spark, rawPath))
      spark.read.schema(Schemas.billing).parquet(rawPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.billing)

  def ledger(spark: SparkSession): DataFrame =
    if (exists(spark, ledgerPath))
      spark.read.schema(Schemas.processedFiles).parquet(ledgerPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Schemas.processedFiles)

  /** J1 + S9: idempotent append — only rows whose natural key is absent.
    * The existing side is pruned to the staged batch's (year,month,day)
    * partitions before the anti-join: at 100 TB the join probes days, not
    * the whole history.
    */
  def appendDedup(spark: SparkSession, staged: DataFrame): Long =
      TableLock.withLock(spark, root) {
    val batch = Ingest.dedupWithinBatch(staged)
    val existing =
      if (exists(spark, rawPath)) {
        val days = batch.select("year", "month", "day").distinct()
        raw(spark).join(
          org.apache.spark.sql.functions.broadcast(days),
          Seq("year", "month", "day"))
      } else raw(spark)
    // Observation fuses the returned row count into the write action —
    // one pass over the anti-join instead of a count() materialization
    // followed by a second (cached) pass for the write.
    val obs = org.apache.spark.sql.Observation()
    Ingest.newRows(batch, existing)
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode("append")
      .partitionBy("year", "month", "day").parquet(rawPath)
    obs.get("n").asInstanceOf[Long]
  }

  /** S10: full-recompute rollups, written with overwrite semantics exactly
    * like the reference's DELETE+INSERT. One cached pass over raw feeds
    * all four (the Spark analogue of "4 assets over one shared DB").
    */
  def rebuildAggregates(spark: SparkSession): Unit =
      TableLock.withLock(spark, root) {
    val r = raw(spark).cache()
    try {
      // daily_aggs is day-partitioned so refreshDailyForDays can later
      // overwrite single partitions (and day-window reads prune)
      Aggregates.daily(r).write.mode("overwrite")
        .partitionBy("year", "month", "day").parquet(aggPath("daily"))
      Aggregates.user(r).write.mode("overwrite").parquet(aggPath("user"))
      Aggregates.service(r).write.mode("overwrite").parquet(aggPath("service"))
      Aggregates.region(r).write.mode("overwrite").parquet(aggPath("region"))
    } finally r.unpersist()
  }

  /** Incremental daily-rollup maintenance: recompute ONLY the
    * (year,month,day) partitions the batch touched and overwrite just
    * those output partitions (dynamic partition overwrite = per-partition
    * MERGE). The reference rebuilds every aggregate from all history each
    * run (`aggregates.py:31,96,163,226`) — correct, but a 100 TB
    * non-starter; day-keyed rollups only ever change for appended days,
    * so this reads the touched days (partition-pruned) and writes the
    * touched partitions, leaving history untouched. Exactness is
    * preserved (including COUNT(DISTINCT)) because the day is the full
    * grouping key: each partition's aggregate depends only on that
    * partition's rows.
    */
  def refreshDailyForDays(spark: SparkSession, touchedDays: DataFrame): Unit =
      TableLock.withLock(spark, root) {
    val days = touchedDays.select("year", "month", "day").distinct()
    val affected = raw(spark).join(
      org.apache.spark.sql.functions.broadcast(days),
      Seq("year", "month", "day"))
    val out = Aggregates.daily(affected)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try out.write.mode("overwrite")
      .partitionBy("year", "month", "day").parquet(aggPath("daily"))
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Dedup-append a batch AND fold its per-day [[Aggregates.dailyPartial]]
    * state into the stored partials table — the fully incremental ingest
    * step: cost ∝ batch rows + days touched, never ∝ history. Returns
    * rows appended. [[dailyFromPartials]] serves the rollup at read time.
    */
  def appendIncremental(spark: SparkSession, staged: DataFrame): Long =
      TableLock.withLock(spark, root) {
    val batch = Ingest.dedupWithinBatch(staged)
    val existing =
      if (exists(spark, rawPath)) {
        val days = batch.select("year", "month", "day").distinct()
        raw(spark).join(
          org.apache.spark.sql.functions.broadcast(days),
          Seq("year", "month", "day"))
      } else raw(spark)
    // localCheckpoint, NOT cache: fresh's plan reads rawPath (anti-join
    // probe), and the append below invalidates path-based caches — a
    // cached fresh would lazily RECOMPUTE against its own appended
    // output and come back empty for the partials fold
    val fresh = Ingest.newRows(batch, existing).localCheckpoint(true)
    try {
      val n = fresh.count()
      if (n > 0) {
        fresh.write.mode("append")
          .partitionBy("year", "month", "day").parquet(rawPath)
        mergeIntoDailyPartials(spark, fresh)
      }
      n
    } finally { fresh.unpersist(); () }
  }

  /** Merge a delta's per-day partial state into the partials table:
    * stored partials are read pruned to the delta's days (broadcast
    * semi-shape), merged ([[Aggregates.mergeDailyPartials]] — exact
    * counts/sums, HLL sketch unions), and ONLY those day partitions are
    * overwritten (dynamic partition overwrite). The merged frame is
    * local-checkpointed before the write because it reads the very
    * partitions being replaced. (At production scale the same fold
    * targets an ACID table format; the algebra is identical.)
    */
  def mergeIntoDailyPartials(spark: SparkSession, delta: DataFrame): Unit =
      TableLock.withLock(spark, root) {
    val deltaParts = Aggregates.dailyPartial(delta)
    val merged =
      if (exists(spark, dailyPartialsPath)) {
        val days = deltaParts.select("year", "month", "day").distinct()
        val stored = spark.read.parquet(dailyPartialsPath).join(
          org.apache.spark.sql.functions.broadcast(days),
          Seq("year", "month", "day"))
        Aggregates.mergeDailyPartials(stored, deltaParts)
      } else deltaParts
    val pinned = merged.localCheckpoint(true)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try pinned.write.mode("overwrite")
      .partitionBy("year", "month", "day").parquet(dailyPartialsPath)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** The daily rollup served from the incrementally-maintained partials. */
  def dailyFromPartials(spark: SparkSession): DataFrame =
    Aggregates.finalizeDaily(spark.read.parquet(dailyPartialsPath))

  /** Small-file compaction for the partitioned fact store: every append
    * leaves one-file-per-task fragments in each touched (year,month,day)
    * partition, and at 100 TB a few thousand daily deliveries turn day
    * partitions into thousands of KB-sized files — the classic
    * metadata/open-cost killer for every later scan. This rewrites ONLY
    * the partitions holding more than `maxFilesPerPartition` files
    * (discovered from the file index via `input_file_name`, no listing
    * code), clustering each day's rows into one task → one file, and
    * swaps them in with dynamic partition overwrite — untouched history
    * partitions are never read or rewritten. Row content is unchanged by
    * construction (a pure rewrite); the gate hash-checks that.
    *
    * Returns (partitions compacted, files before). No-op (0, 0) when
    * nothing exceeds the threshold.
    */
  def compactRaw(spark: SparkSession,
      maxFilesPerPartition: Int = 1): (Long, Long) =
      TableLock.withLock(spark, root) {
    import org.apache.spark.sql.functions.{exists => _, _}
    if (!exists(spark, rawPath)) (0L, 0L)
    else {
    // input_file_name is non-deterministic: project it before the
    // aggregate (Spark rejects it as an aggregate-function argument)
    val perPart = raw(spark)
      .select(col("year"), col("month"), col("day"),
        input_file_name().as("f"))
      .groupBy("year", "month", "day")
      .agg(countDistinct(col("f")).as("n_files"))
      .filter(col("n_files") > maxFilesPerPartition)
      .persist()
    val stats = perPart.agg(
      coalesce(count(lit(1)), lit(0L)).as("parts"),
      coalesce(sum("n_files"), lit(0L)).as("files")).head()
    val (parts, files) = (stats.getLong(0), stats.getLong(1))
    if (parts > 0) {
      val fragmented = raw(spark).join(
        broadcast(perPart.select("year", "month", "day")),
        Seq("year", "month", "day"))
      // hash-cluster on the partition key: all rows of a day land in one
      // task, so each rewritten partition holds exactly one file. The
      // read must be materialized before the dynamic overwrite replaces
      // the files it is reading from.
      val compacted = fragmented
        .repartition(col("year"), col("month"), col("day"))
        .select(raw(spark).columns.map(col): _*)
        .localCheckpoint(true)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try compacted.write.mode("overwrite")
        .partitionBy("year", "month", "day").parquet(rawPath)
      finally prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    perPart.unpersist()
    (parts, files)
    }
  }

  /** CDC merge: apply a change batch — `op` = "upsert" (insert new or
    * replace the row with the same natural key) or "delete" (by key) —
    * to the fact store, PARTITION-GRANULAR under the writer lock: only
    * the (year,month,day) partitions the batch names are read, merged,
    * and swapped via dynamic partition overwrite; history partitions
    * are never touched. Completes the store lifecycle the append-only
    * reference lacks (its DuckDB tables are INSERT-only,
    * ingest.py:249-257): append-dedup, compact, vacuum, and now
    * update/delete.
    *
    * Dynamic overwrite only rewrites partitions PRESENT in the merged
    * output, so a day whose every row was deleted would silently keep
    * its old files — those emptied partitions are removed explicitly
    * (the classic dynamic-overwrite pitfall, handled here).
    *
    * Returns (rows upserted, rows deleted-that-matched).
    */
  def applyChanges(spark: SparkSession, changes: DataFrame,
      key: Seq[String] = Schemas.dedupKey): (Long, Long) =
      TableLock.withLock(spark, root) {
    import org.apache.spark.sql.functions.{exists => _, _}
    // EAGER localCheckpoint, not persist: a change batch legitimately
    // derives from the store's own scans (e.g. a correction built from
    // raw()), and a lazily-cached partition would recompute against
    // files this merge is about to replace or delete
    val ch = changes.localCheckpoint(true)
    val upserts = Ingest.dedupWithinBatch(ch.filter(col("op") === "upsert")
      .drop("op"), key)
    val deletes = ch.filter(col("op") === "delete").drop("op")
    val days = ch.select("year", "month", "day").distinct()
    val current =
      if (exists(spark, rawPath))
        raw(spark).join(broadcast(days), Seq("year", "month", "day"))
      else raw(spark)
    val nDeleted = current.join(deletes.select(key.map(col): _*).distinct(),
      key, "left_semi").count()
    // survivors = current minus every changed key, plus the upsert rows
    val changedKeys = upserts.select(key.map(col): _*)
      .unionByName(deletes.select(key.map(col): _*)).distinct()
    val merged = current.join(changedKeys, key, "left_anti")
      .unionByName(upserts)
      .localCheckpoint(true)
    val nUpserted = upserts.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try merged.write.mode("overwrite")
      .partitionBy("year", "month", "day").parquet(rawPath)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // partitions the batch touched but the merge emptied: remove their
    // directories (dynamic overwrite never rewrites an absent partition)
    val surviving = merged.select("year", "month", "day").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val fs = new Path(rawPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    days.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      .filterNot(surviving)
      .foreach { case (y, m, dd) =>
        fs.delete(new Path(s"$rawPath/year=$y/month=$m/day=$dd"), true)
      }
    // fs-level deletes bypass the write path's cache invalidation
    spark.catalog.refreshByPath(rawPath)
    ch.unpersist()
    (nUpserted, nDeleted)
  }

  /** Retention: drop fact-table day partitions STRICTLY older than
    * (year, month, day). Partition-dir deletes under the writer lock —
    * no data file is ever read or rewritten, and untouched days keep
    * their files byte-identical (the same partition-granular contract as
    * [[compactRaw]]). Returns the number of partitions dropped. The
    * reference has no retention story at all (its DuckDB file only
    * grows); at 100 TB dropping expired partitions by directory is the
    * only shape that doesn't scan history to forget it.
    */
  def vacuumBefore(spark: SparkSession, year: Int, month: Int,
      day: Int): Long = TableLock.withLock(spark, root) {
    if (!exists(spark, rawPath)) 0L
    else {
      val cutoff = (year * 100 + month) * 100 + day
      val old = raw(spark).select("year", "month", "day").distinct()
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
        .filter { case (y, m, dd) => (y * 100 + m) * 100 + dd < cutoff }
      val fs = new Path(rawPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      old.foreach { case (y, m, dd) =>
        fs.delete(new Path(s"$rawPath/year=$y/month=$m/day=$dd"), true)
      }
      // fs-level deletes bypass the write path's cache invalidation
      spark.catalog.refreshByPath(rawPath)
      old.length.toLong
    }
  }

  /** T4: last-wins ledger upsert, rewritten in place (the ledger is tiny —
    * one row per ingested file).
    */
  def upsertLedger(spark: SparkSession, updates: DataFrame): Unit =
      TableLock.withLock(spark, root) {
    val merged = Ledger.upsert(ledger(spark), updates).cache()
    merged.count() // materialize before overwriting the input path
    merged.write.mode("overwrite").parquet(s"$ledgerPath.tmp")
    merged.unpersist()
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new Path(ledgerPath), true)
    fs.rename(new Path(s"$ledgerPath.tmp"), new Path(ledgerPath))
  }
}
