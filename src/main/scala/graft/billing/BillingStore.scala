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
  * without it, an append racing `compactRaw`'s partition swap can have
  * its freshly-written file lost. Readers take no lock: each mutator
  * commit publishes a [[RawManifest]] version (atomic rename of the
  * fact table's file list), [[raw]] pins the newest manifest instead of
  * listing directories, and replaced files stay on disk until
  * [[gcRaw]] finds them unreferenced by the latest `retainVersions`
  * manifests — so a scan started just before a compaction or CDC merge
  * still reads a consistent snapshot. Proven by
  * BillingStoreConcurrencySpec: interleaved appends and compactions
  * lose zero rows, and a reader scanning THROUGH the interleaving only
  * ever observes consistent post-commit row counts.
  *
  * Manifest metadata cost is O(touched-partition files + manifest
  * length) per commit — driver-side, never a data scan. A pre-manifest
  * store (or one staged by a direct parquet write) reads via directory
  * listing until its first mutator commit migrates it.
  */
final case class BillingStore(root: String, retainVersions: Int = 2) {
  val rawPath = s"$root/raw_billing"
  val ledgerPath = s"$root/processed_files"
  val dailyPartialsPath = s"$root/daily_partials"
  def aggPath(name: String) = s"$root/${name}_aggs"

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** The fact table, pinned to the newest manifest snapshot (falls back
    * to directory listing for a store no mutator has committed yet).
    * The returned frame keeps reading that snapshot's files even while
    * later commits land — consistent up to `retainVersions` subsequent
    * commits (then GC may reclaim its files).
    */
  def raw(spark: SparkSession): DataFrame = {
    val fs = rawFs(spark)
    RawManifest.latest(fs, rawPath) match {
      case Some((v, files)) if files.nonEmpty =>
        manifestRead(spark, v, files)
      case Some(_) => emptyBilling(spark)
      case None =>
        if (exists(spark, rawPath))
          spark.read.schema(Schemas.billing).parquet(rawPath)
        else emptyBilling(spark)
    }
  }

  /** Relation over one manifest snapshot through [[ManifestFileIndex]]:
    * the file list is the manifest's, and Catalyst's own pushed filters
    * drive partition pruning AND [[FileStats]] skipping at plan time —
    * every reader of [[raw]] gets file skipping from its own
    * predicates, not just the dedicated range/point APIs.
    */
  private def manifestRead(spark: SparkSession, version: Long,
      files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val fs = rawFs(spark)
    val stats = FileStats.read(fs, rawPath, version)
    val partSchema = org.apache.spark.sql.types.StructType(
      Schemas.billing.fields.takeRight(3)) // year, month, day
    val index = new ManifestFileIndex(spark, new Path(rawPath), files,
      stats, partSchema)
    val rel = HadoopFsRelation(index, partSchema,
      Schemas.billingNoPartitionCols, None, new ParquetFileFormat(),
      Map.empty)(spark)
    spark.baseRelationToDataFrame(rel)
  }

  /** Retained manifest versions (oldest first) — the store's queryable
    * history window. Bounded by GC's `retain` and history pruning.
    */
  def rawVersions(spark: SparkSession): Seq[Long] =
    RawManifest.versions(rawFs(spark), rawPath)

  /** Time travel: the fact table AS OF a retained manifest version —
    * the same query-an-old-snapshot contract Delta/Iceberg expose,
    * bounded here by the retention depth instead of a wall-clock
    * window. Throws for a version GC/pruning already dropped; a caller
    * wanting deeper history raises `retainVersions`.
    */
  def rawAt(spark: SparkSession, version: Long): DataFrame = {
    val fs = rawFs(spark)
    val files = RawManifest.filesAt(fs, rawPath, version).getOrElse(
      throw new java.util.NoSuchElementException(
        s"manifest v$version not retained (have: " +
          s"${RawManifest.versions(fs, rawPath).mkString(",")})"))
    if (files.isEmpty) emptyBilling(spark)
    else manifestRead(spark, version, files)
  }

  /** Event-time range read `[lo, hi)` with file-level data skipping:
    * the newest manifest's files are pruned by the [[FileStats]]
    * sidecar BEFORE Spark plans the scan, so a selective time window
    * over a long history schedules tasks only for files whose
    * [min,max] intersects the range — finer than hive partition
    * pruning whenever a day partition holds many append slices.
    * Correctness never depends on the stats: the range filter is
    * applied on top regardless, files without stats are kept, and a
    * pre-manifest store falls back to a plain filtered [[raw]] scan.
    */
  def rawBetween(spark: SparkSession, lo: java.time.Instant,
      hi: java.time.Instant): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    // a plain filter: [[ManifestFileIndex]] receives it as a pushed
    // data filter and skips files at plan time
    raw(spark).filter(
      col("timestamp") >= lit(java.sql.Timestamp.from(lo)) &&
      col("timestamp") < lit(java.sql.Timestamp.from(hi)))
  }

  /** (files kept for `[lo, hi)`, manifest file count) of the newest
    * snapshot — None for a pre-manifest store. Exposed so specs and
    * gates can pin that skipping actually pruned the file set; readers
    * use [[rawBetween]].
    */
  private[graft] def filesForRange(spark: SparkSession,
      lo: java.time.Instant, hi: java.time.Instant):
      Option[(Seq[String], Int)] = {
    val fs = rawFs(spark)
    RawManifest.latest(fs, rawPath).map { case (v, files) =>
      val stats = FileStats.read(fs, rawPath, v)
      val loU = micros(lo)
      val hiU = micros(hi)
      val kept = files.filter { f =>
        stats.get(f) match {
          case Some(st) => st.ts match {
            case Some((mn, mx)) => mx >= loU && mn < hiU
            case None           => false // all-null ts: range-unmatchable
          }
          case None => true // no stats: conservative keep
        }
      }
      (kept, files.size)
    }
  }

  /** Point-lookup read `user_id = userId` with bloom file skipping: the
    * newest manifest's files are pruned by the [[FileStats]] bloom
    * sidecar before Spark plans the scan — an equality probe over a
    * long history touches only the files that may contain the key
    * (~1% false-positive extras). Same correctness contract as
    * [[rawBetween]]: the equality filter applies regardless, files
    * without stats are kept, a pre-manifest store falls back to a
    * plain filtered [[raw]] scan.
    */
  def rawForUser(spark: SparkSession, userId: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    // a plain filter: the index's bloom probe does the skipping
    raw(spark).filter(col("user_id") === lit(userId))
  }

  /** (files kept for a `user_id` probe, manifest file count) — None for
    * a pre-manifest store. Exposed for specs/gates to pin the pruning;
    * readers use [[rawForUser]].
    */
  private[graft] def filesForUser(spark: SparkSession,
      userId: String): Option[(Seq[String], Int)] = {
    val fs = rawFs(spark)
    RawManifest.latest(fs, rawPath).map { case (v, files) =>
      val stats = FileStats.read(fs, rawPath, v)
      val kept = files.filter(f =>
        stats.get(f).forall(_.mayContain(userId)))
      (kept, files.size)
    }
  }

  private def micros(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  /** Incremental scan: the rows in files ADDED to the manifest after
    * `sinceVersion` — the Iceberg incremental-append / Delta CDF read
    * shape. A downstream consumer (rollup maintenance, export, index
    * append) processes each commit's delta instead of rescanning
    * history: cost is O(new files), independent of table size.
    *
    * Exact new-row semantics hold while the window contains only
    * APPEND commits (the store's normal ingest path). A compaction or
    * CDC merge inside the window rewrites surviving rows into new
    * files, so those rows are re-emitted — consumers needing exactly-
    * once either anti-join on [[Schemas.dedupKey]] (what
    * [[appendDedup]] itself does) or consume between every commit.
    * Throws for a version GC already dropped (raise `retainVersions`
    * for deeper consumers, exactly as with [[rawAt]]).
    */
  def rawChanges(spark: SparkSession, sinceVersion: Long): DataFrame = {
    val fs = rawFs(spark)
    val (latest, files) = RawManifest.latest(fs, rawPath).getOrElse(
      throw new java.util.NoSuchElementException(
        "no manifest committed yet"))
    val base = RawManifest.filesAt(fs, rawPath, sinceVersion).getOrElse(
      throw new java.util.NoSuchElementException(
        s"manifest v$sinceVersion not retained (have: " +
          s"${RawManifest.versions(fs, rawPath).mkString(",")})"))
    val added = files.filterNot(base.toSet)
    if (added.isEmpty) emptyBilling(spark)
    else manifestRead(spark, latest, added)
  }

  private def emptyBilling(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.billing)

  // ---- cross-table consistent snapshots --------------------------------

  private def storeMetaRoot = s"$root/_store"

  /** Store-manifest line key → table path, for every table the store
    * serves.
    */
  private def tablePaths: Seq[(String, String)] = Seq(
    "raw_billing" -> rawPath,
    "processed_files" -> ledgerPath,
    "daily_partials" -> dailyPartialsPath) ++
    Seq("daily", "user", "service", "region").map(n =>
      s"${n}_aggs" -> aggPath(n))

  /** Publish the store-level version vector — one `name=version` line
    * per manifested table, committed (as its own [[RawManifest]] under
    * `_store/`) AFTER a mutator's per-table commits, under the writer
    * lock. [[snapshot]] pins every table at one such vector, giving
    * readers cross-TABLE consistency on top of the per-table snapshot
    * isolation: the reference gets this for free from its single
    * embedded DuckDB file; a multi-table parquet store has to commit
    * it. No-op when the vector is unchanged.
    */
  private def commitStoreVersion(spark: SparkSession): Unit = {
    val lines = tablePaths.flatMap { case (name, path) =>
      RawManifest.latest(tableFs(spark, path), path)
        .map { case (v, _) => s"$name=$v" }
    }
    if (lines.nonEmpty) {
      val fs = tableFs(spark, storeMetaRoot)
      val current = RawManifest.latest(fs, storeMetaRoot).map(_._2.toSet)
      if (!current.contains(lines.toSet)) {
        RawManifest.commit(fs, storeMetaRoot, lines)
        RawManifest.pruneHistory(fs, storeMetaRoot, keep = 8)
      }
    }
  }

  /** A cross-table consistent view: every table pinned to the versions
    * one serialized mutator history committed TOGETHER. A plain
    * `raw()`+`dailyFromPartials()` pair can straddle a mutator (raw
    * already appended, partials not yet folded); a snapshot cannot.
    * Readability window matches [[rawAt]]: `retainVersions` subsequent
    * commits (raise it for long-running consumers). A pre-snapshot
    * store (no vector committed yet) falls back to live reads.
    */
  def snapshot(spark: SparkSession): StoreSnapshot = {
    val fs = tableFs(spark, storeMetaRoot)
    val vec = RawManifest.latest(fs, storeMetaRoot)
      .map(_._2).getOrElse(Seq.empty)
      .flatMap { line =>
        line.split("=") match {
          case Array(n, v) => Some(n -> v.toLong)
          case _           => None
        }
      }.toMap
    StoreSnapshot(this, vec)
  }

  /** Pinned read of a non-fact table at one manifest version (the fact
    * table goes through [[rawAt]] for stats-aware reads).
    */
  private[billing] def readManifestedAt(spark: SparkSession,
      table: String, version: Long): DataFrame = {
    val fs = tableFs(spark, table)
    val files = RawManifest.filesAt(fs, table, version).getOrElse(
      throw new java.util.NoSuchElementException(
        s"manifest v$version of $table not retained"))
    if (files.isEmpty) spark.read.parquet(table).limit(0)
    else spark.read.option("basePath", table)
      .parquet(files.map(f => s"$table/$f"): _*)
  }

  private def rawFs(spark: SparkSession) = tableFs(spark, rawPath)

  private def tableFs(spark: SparkSession, table: String) =
    new Path(table).getFileSystem(spark.sessionState.newHadoopConf())

  private def isHidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** Relative data-file paths under `sub` (or the whole table when
    * `sub` is empty), hidden files/dirs excluded.
    */
  private def listRel(fs: org.apache.hadoop.fs.FileSystem,
      sub: String): Seq[String] = listRelIn(fs, rawPath, sub)

  private def listRelIn(fs: org.apache.hadoop.fs.FileSystem,
      table: String, sub: String): Seq[String] = {
    val base = if (sub.isEmpty) new Path(table) else new Path(table, sub)
    if (!fs.exists(base)) Seq.empty
    else {
      val rootUri = new Path(table).toUri.getPath
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = fs.listFiles(base, true)
      while (it.hasNext) {
        val st = it.next()
        val rel = st.getPath.toUri.getPath.stripPrefix(rootUri)
          .stripPrefix("/")
        if (!rel.split("/").exists(isHidden)) out += rel
      }
      out.toSeq
    }
  }

  /** Current file set: newest manifest, else (pre-manifest store) the
    * on-disk listing. Callers hold the writer lock.
    */
  private def currentFiles(
      fs: org.apache.hadoop.fs.FileSystem): Set[String] =
    currentFilesIn(fs, rawPath)

  private def currentFilesIn(fs: org.apache.hadoop.fs.FileSystem,
      table: String): Set[String] =
    RawManifest.latest(fs, table).map(_._2.toSet)
      .getOrElse(listRelIn(fs, table, "").toSet)

  private def dayDir(y: Int, m: Int, d: Int) = s"year=$y/month=$m/day=$d"

  private val dayDirRe = "^year=(\\d+)/month=(\\d+)/day=(\\d+)/".r

  /** (year, month, day) encoded in a manifest-relative data-file path —
    * the partition layout names every file's day, so partition-level
    * bookkeeping (file counts, partition lists) reads zero data.
    */
  private def dayOf(rel: String): Option[(Int, Int, Int)] =
    dayDirRe.findFirstMatchIn(rel).map(m =>
      (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt))

  /** Physically delete data files no manifest in the newest `retain`
    * versions references, then drop emptied partition directories and
    * prune manifest history. Returns the number of files reclaimed.
    * Runs automatically after every file-dropping commit; tests call it
    * with `retain = 1` to assert immediate disk state.
    */
  def gcRaw(spark: SparkSession, retain: Int = retainVersions): Long =
    gcTable(spark, rawPath, retain)

  private def gcTable(spark: SparkSession, table: String,
      retain: Int): Long = TableLock.withLock(spark, root) {
    val fs = tableFs(spark, table)
    if (RawManifest.latest(fs, table).isEmpty) 0L
    else {
      val refs = RawManifest.referenced(fs, table, retain)
      val doomed = listRelIn(fs, table, "").filterNot(refs)
      doomed.foreach(f => fs.delete(new Path(s"$table/$f"), false))
      dropEmptyPartitionDirs(fs, new Path(table))
      RawManifest.pruneHistory(fs, table, keep = math.max(retain, 8))
      if (doomed.nonEmpty) spark.catalog.refreshByPath(table)
      doomed.length.toLong
    }
  }

  /** Remove partition directories left with no visible content (depth-
    * first); the table root and hidden dirs (`_raw_manifest`) survive.
    */
  private def dropEmptyPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Unit = {
    def sweep(p: Path, isRoot: Boolean): Boolean = {
      val kids = fs.listStatus(p)
      val visible = kids.filterNot(k => isHidden(k.getPath.getName))
      val remaining = visible.count { k =>
        if (k.isDirectory) !sweep(k.getPath, isRoot = false)
        else true
      }
      val hasHidden = kids.length > visible.length
      if (!isRoot && remaining == 0 && !hasHidden) fs.delete(p, true)
      else false
    }
    if (fs.exists(root)) { sweep(root, isRoot = true); () }
  }

  def ledger(spark: SparkSession): DataFrame = {
    val fs = tableFs(spark, ledgerPath)
    RawManifest.latest(fs, ledgerPath) match {
      case Some((_, files)) if files.nonEmpty =>
        spark.read.schema(Schemas.processedFiles)
          .option("basePath", ledgerPath)
          .parquet(files.map(f => s"$ledgerPath/$f"): _*)
      case _ =>
        if (exists(spark, ledgerPath))
          spark.read.schema(Schemas.processedFiles).parquet(ledgerPath)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          Schemas.processedFiles)
    }
  }

  /** J1 + S9: idempotent append — only rows whose natural key is absent.
    * The existing side is pruned to the staged batch's (year,month,day)
    * partitions before the anti-join: at 100 TB the join probes days, not
    * the whole history.
    */
  def appendDedup(spark: SparkSession, staged: DataFrame): Long =
      TableLock.withLock(spark, root) {
    val batch = Ingest.dedupWithinBatch(staged)
    // bounded driver-side metadata: the distinct (year,month,day) tuples
    // of ONE batch — reused for the anti-join prune and the manifest
    // commit's touched-partition listing
    val dayTuples = batch.select("year", "month", "day").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    val existing =
      if (exists(spark, rawPath)) {
        import spark.implicits._
        val days = dayTuples.toDF("year", "month", "day")
        raw(spark).join(
          org.apache.spark.sql.functions.broadcast(days),
          Seq("year", "month", "day"))
      } else raw(spark)
    val beforeTouched = snapshotTouched(rawFs(spark), dayTuples)
    // Observation fuses the returned row count into the write action —
    // one pass over the anti-join instead of a count() materialization
    // followed by a second (cached) pass for the write.
    val obs = org.apache.spark.sql.Observation()
    Ingest.newRows(batch, existing)
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .write.mode("append")
      .partitionBy("year", "month", "day").parquet(rawPath)
    val n = obs.get("n").asInstanceOf[Long]
    if (n > 0) commitAppend(spark, dayTuples, beforeTouched)
    commitStoreVersion(spark)
    n
  }

  /** Pre-write snapshot of the touched partitions' on-disk files: the
    * baseline both commit flavors diff against. Disk, not manifest —
    * retention keeps RETIRED files on disk, and a commit that re-listed
    * directories wholesale would resurrect them into the manifest
    * (doubled rows; caught by the concurrency spec).
    */
  private def snapshotTouched(fs: org.apache.hadoop.fs.FileSystem,
      days: Seq[(Int, Int, Int)]): Set[String] =
    snapshotTouchedIn(fs, rawPath, days)

  private def snapshotTouchedIn(fs: org.apache.hadoop.fs.FileSystem,
      table: String, days: Seq[(Int, Int, Int)]): Set[String] =
    days.flatMap { case (y, m, d) =>
      listRelIn(fs, table, dayDir(y, m, d)) }.toSet

  /** Publish an append commit: previous manifest (or pre-manifest disk
    * listing) plus ONLY the files this write created. Appends never
    * drop files, so no GC is needed.
    */
  private def commitAppend(spark: SparkSession, days: Seq[(Int, Int, Int)],
      beforeTouched: Set[String]): Unit = {
    val fs = rawFs(spark)
    val newFiles = snapshotTouched(fs, days) -- beforeTouched
    commitRawVersion(spark, fs, currentFiles(fs) ++ newFiles)
  }

  /** Commit a fact-table manifest version together with its per-file
    * timestamp-stats sidecar: stats for files already in the previous
    * sidecar are carried forward, only genuinely new files are scanned
    * (one column-pruned job over the batch). Caller holds the writer
    * lock.
    */
  private def commitRawVersion(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, files: Set[String]): Unit = {
    val prev = FileStats.readLatest(fs, rawPath)
    val fresh = FileStats.compute(spark, rawPath,
      files.toSeq.filterNot(prev.contains))
    val merged = files.iterator.map(f =>
      f -> prev.get(f).orElse(fresh.get(f))
        .getOrElse(FileStats.FileStat(None, None))).toMap
    val v = RawManifest.commit(fs, rawPath, files.toSeq)
    FileStats.write(fs, rawPath, v,
      FileStats.fillSizes(fs, rawPath, merged))
  }

  /** Publish a replacing commit: `beforeTouched` (the touched
    * partitions' pre-write files) leave the manifest, the write's new
    * files enter it, and files no retained manifest references any more
    * are reclaimed.
    */
  private def commitReplace(spark: SparkSession,
      days: Seq[(Int, Int, Int)], beforeTouched: Set[String]): Unit =
    commitReplaceIn(spark, rawPath, days, beforeTouched)

  private def commitReplaceIn(spark: SparkSession, table: String,
      days: Seq[(Int, Int, Int)], beforeTouched: Set[String]): Unit = {
    val fs = tableFs(spark, table)
    val afterTouched = snapshotTouchedIn(fs, table, days)
    val next = (currentFilesIn(fs, table) -- beforeTouched) ++
      (afterTouched -- beforeTouched)
    if (table == rawPath) commitRawVersion(spark, fs, next)
    else RawManifest.commit(fs, table, next.toSeq)
    gcTable(spark, table, retainVersions)
    spark.catalog.refreshByPath(table)
  }

  /** S10: full-recompute rollups with DELETE+INSERT semantics exactly
    * like the reference — spelled as write-then-publish: each rebuilt
    * rollup lands as new files and one manifest commit swaps the whole
    * table, so a dashboard reader mid-rebuild keeps its pinned snapshot
    * instead of catching the delete half of an overwrite. One cached
    * pass over raw feeds all four (the Spark analogue of "4 assets over
    * one shared DB").
    */
  def rebuildAggregates(spark: SparkSession): Unit =
      TableLock.withLock(spark, root) {
    val r = raw(spark).cache()
    try {
      // daily_aggs is day-partitioned so refreshDailyForDays can later
      // swap single partitions (and day-window reads prune)
      replaceWholeTable(spark, aggPath("daily"), Aggregates.daily(r),
        partitioned = true)
      replaceWholeTable(spark, aggPath("user"), Aggregates.user(r),
        partitioned = false)
      replaceWholeTable(spark, aggPath("service"), Aggregates.service(r),
        partitioned = false)
      replaceWholeTable(spark, aggPath("region"), Aggregates.region(r),
        partitioned = false)
    } finally { r.unpersist(); () }
    commitStoreVersion(spark)
  }

  /** Whole-table swap via manifest: the write's new files become the
    * ENTIRE next manifest (full-refresh semantics), prior files are
    * retired and reclaimed past the retention window.
    */
  private def replaceWholeTable(spark: SparkSession, table: String,
      out: DataFrame, partitioned: Boolean): Unit = {
    val fs = tableFs(spark, table)
    val beforeDisk = listRelIn(fs, table, "").toSet
    val w = out.write.mode("append")
    (if (partitioned) w.partitionBy("year", "month", "day") else w)
      .parquet(table)
    val newFiles = listRelIn(fs, table, "").toSet -- beforeDisk
    RawManifest.commit(fs, table, newFiles.toSeq)
    gcTable(spark, table, retainVersions)
    spark.catalog.refreshByPath(table)
  }

  /** A rollup table, pinned to its newest manifest (direct directory
    * read for pre-manifest stores). `name` ∈ daily/user/service/region.
    */
  def agg(spark: SparkSession, name: String): DataFrame =
    readManifested(spark, aggPath(name))

  private def readManifested(spark: SparkSession, table: String): DataFrame = {
    val fs = tableFs(spark, table)
    RawManifest.latest(fs, table) match {
      case Some((_, files)) if files.nonEmpty =>
        spark.read.option("basePath", table)
          .parquet(files.map(f => s"$table/$f"): _*)
      case _ => spark.read.parquet(table)
    }
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
    val dayTuples = touchedDays.select("year", "month", "day").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    val days = {
      import spark.implicits._
      dayTuples.toDF("year", "month", "day")
    }
    val affected = raw(spark).join(
      org.apache.spark.sql.functions.broadcast(days),
      Seq("year", "month", "day"))
    val table = aggPath("daily")
    val fs = tableFs(spark, table)
    val beforeTouched = snapshotTouchedIn(fs, table, dayTuples)
    Aggregates.daily(affected).write.mode("append")
      .partitionBy("year", "month", "day").parquet(table)
    commitReplaceIn(spark, table, dayTuples, beforeTouched)
    commitStoreVersion(spark)
  }

  /** Dedup-append a batch AND fold its per-day [[Aggregates.dailyPartial]]
    * state into the stored partials table — the fully incremental ingest
    * step: cost ∝ batch rows + days touched, never ∝ history. Returns
    * rows appended. [[dailyFromPartials]] serves the rollup at read time.
    */
  def appendIncremental(spark: SparkSession, staged: DataFrame): Long =
      TableLock.withLock(spark, root) {
    val batch = Ingest.dedupWithinBatch(staged)
    val dayTuples = batch.select("year", "month", "day").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    val existing =
      if (exists(spark, rawPath)) {
        import spark.implicits._
        val days = dayTuples.toDF("year", "month", "day")
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
        val beforeTouched = snapshotTouched(rawFs(spark), dayTuples)
        fresh.write.mode("append")
          .partitionBy("year", "month", "day").parquet(rawPath)
        commitAppend(spark, dayTuples, beforeTouched)
        mergeIntoDailyPartials(spark, fresh)
      }
      n
    } finally { fresh.unpersist(); () }
  }

  /** Merge a delta's per-day partial state into the partials table:
    * stored partials are read pruned to the delta's days (broadcast
    * semi-shape), merged ([[Aggregates.mergeDailyPartials]] — exact
    * counts/sums, HLL sketch unions), and the touched day partitions
    * are swapped with the same write-then-publish manifest commit the
    * fact table uses: merged state lands as NEW files, the manifest
    * swap retires the old partials atomically, and a reader serving
    * [[dailyFromPartials]] mid-merge keeps its pinned snapshot instead
    * of seeing half-swapped partitions. (At production scale the same
    * fold targets an ACID table format; the algebra is identical.)
    */
  def mergeIntoDailyPartials(spark: SparkSession, delta: DataFrame): Unit =
      TableLock.withLock(spark, root) {
    val deltaParts = Aggregates.dailyPartial(delta)
    val dayTuples = deltaParts.select("year", "month", "day").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    val merged =
      if (exists(spark, dailyPartialsPath)) {
        import spark.implicits._
        val days = dayTuples.toDF("year", "month", "day")
        val stored = readPartials(spark).join(
          org.apache.spark.sql.functions.broadcast(days),
          Seq("year", "month", "day"))
        Aggregates.mergeDailyPartials(stored, deltaParts)
      } else deltaParts
    val fs = tableFs(spark, dailyPartialsPath)
    val beforeTouched = snapshotTouchedIn(fs, dailyPartialsPath, dayTuples)
    merged.write.mode("append")
      .partitionBy("year", "month", "day").parquet(dailyPartialsPath)
    commitReplaceIn(spark, dailyPartialsPath, dayTuples, beforeTouched)
    commitStoreVersion(spark)
  }

  private def readPartials(spark: SparkSession): DataFrame = {
    val fs = tableFs(spark, dailyPartialsPath)
    RawManifest.latest(fs, dailyPartialsPath) match {
      case Some((_, files)) if files.nonEmpty =>
        spark.read.option("basePath", dailyPartialsPath)
          .parquet(files.map(f => s"$dailyPartialsPath/$f"): _*)
      case _ => spark.read.parquet(dailyPartialsPath)
    }
  }

  /** The daily rollup served from the incrementally-maintained partials,
    * pinned to the newest partials manifest.
    */
  def dailyFromPartials(spark: SparkSession): DataFrame =
    Aggregates.finalizeDaily(readPartials(spark))

  /** Small-file compaction for the partitioned fact store: every append
    * leaves one-file-per-task fragments in each touched (year,month,day)
    * partition, and at 100 TB a few thousand daily deliveries turn day
    * partitions into thousands of KB-sized files — the classic
    * metadata/open-cost killer for every later scan. This rewrites ONLY
    * the partitions holding more than `maxFilesPerPartition` files
    * (discovered from the file index via `input_file_name`, no listing
    * code), clustering each day's rows into one task → one file, and
    * swaps them in via manifest commit — untouched history partitions
    * are never read or rewritten. Row content is unchanged by
    * construction (a pure rewrite); the gate hash-checks that.
    *
    * `filesPerDay > 1` compacts to TIME-SORTED slices instead of one
    * file per day (global range partitioning on (day, timestamp)): each
    * rewritten file covers a contiguous, within-day-disjoint timestamp
    * range, so [[rawBetween]]'s file-level stats skipping survives
    * compaction instead of collapsing to day granularity. At 100 TB
    * this is how a compactor respects a target file size without
    * sacrificing the time-range index: more slices per day, each still
    * tight.
    *
    * `zorderUsers = true` (with `filesPerDay > 1`) clusters each day's
    * slices along the Morton curve of (second-of-day, user-id hash
    * bucket) instead of time alone — every rewritten file's timestamp
    * span AND distinct-user set shrink together, so the ts stats and
    * the bloom BOTH stay selective (the lakehouse `OPTIMIZE ZORDER BY`,
    * applied at compaction time; pure time sort keeps blooms diffuse
    * because every user appears in every slice).
    *
    * Returns (partitions compacted, files before). No-op (0, 0) when
    * nothing exceeds the threshold.
    */
  def compactRaw(spark: SparkSession,
      maxFilesPerPartition: Int = 1, filesPerDay: Int = 1,
      zorderUsers: Boolean = false): (Long, Long) =
      TableLock.withLock(spark, root) {
    import org.apache.spark.sql.functions.{exists => _, _}
    if (!exists(spark, rawPath)) (0L, 0L)
    else {
    // "should I compact, and which days?" is answered from the manifest
    // alone — the partition layout names every file's day, so the
    // decision reads ZERO data (at 100 TB a compaction check must not
    // scan the table; this used to run an input_file_name groupBy over
    // the whole store)
    val perPart = currentFiles(rawFs(spark)).toSeq
      .flatMap(dayOf).groupBy(identity).view.mapValues(_.size)
      .filter(_._2 > maxFilesPerPartition).toMap
    val parts = perPart.size.toLong
    val files = perPart.values.map(_.toLong).sum
    if (parts > 0) {
      val dayTuples = perPart.keys.toSeq.sorted
      val beforeTouched = snapshotTouched(rawFs(spark), dayTuples)
      val days = {
        import spark.implicits._
        dayTuples.toDF("year", "month", "day")
      }
      val fragmented = raw(spark).join(broadcast(days),
        Seq("year", "month", "day"))
      // The write APPENDS new files next to the fragments (no checkpoint
      // barrier needed — nothing it reads is deleted); the manifest swap
      // then atomically retires the fragments, which stay on disk for
      // pinned readers until GC's retention window passes.
      val clustered =
        if (filesPerDay <= 1)
          // hash-cluster on the partition key: all rows of a day land in
          // one task, so each rewritten partition holds exactly one file
          fragmented.repartition(col("year"), col("month"), col("day"))
        else if (zorderUsers) {
          // Morton-cluster within each day: QUANTILE-bucketed
          // second-of-day (equal-count buckets — raw seconds would
          // waste curve bits on empty hours and let the user hash
          // dominate the high bits) interleaved with a user-hash
          // bucket; files own contiguous curve segments, so both
          // dimensions' per-file spans shrink together. The quantile
          // pass is one approxQuantile over the fragmented days —
          // compactor-priced, not read-priced.
          val secOfDay = pmod(unix_micros(col("timestamp")) /
            lit(1000000L), lit(86400L))
          val secBucket = graft.operators.ZOrder
            .quantileBucketScaled(fragmented, secOfDay, 10)
          val userBucket = pmod(xxhash64(col("user_id")), lit(1L << 10))
          fragmented
            .withColumn("__z", graft.operators.ZOrder
              .interleave(secBucket, userBucket, 10))
            .repartitionByRange(dayTuples.length * filesPerDay,
              col("year"), col("month"), col("day"), col("__z"))
            .sortWithinPartitions(col("year"), col("month"), col("day"),
              col("__z"))
        } else
          // range-partition on (day, timestamp): task ranges are
          // globally ordered, so every output file's timestamp span is
          // contiguous and disjoint from its day's siblings (a task
          // straddling midnight just writes one tight file per side)
          fragmented.repartitionByRange(dayTuples.length * filesPerDay,
            col("year"), col("month"), col("day"), col("timestamp"))
      clustered
        .select(raw(spark).columns.map(col): _*)
        .write.mode("append")
        .partitionBy("year", "month", "day").parquet(rawPath)
      commitReplace(spark, dayTuples, beforeTouched)
      commitStoreVersion(spark)
    }
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
    // files this merge retires
    val ch = changes.localCheckpoint(true)
    val upserts = Ingest.dedupWithinBatch(ch.filter(col("op") === "upsert")
      .drop("op"), key)
    val deletes = ch.filter(col("op") === "delete").drop("op")
    val dayTuples = ch.select("year", "month", "day").distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    val days = {
      import spark.implicits._
      dayTuples.toDF("year", "month", "day")
    }
    val current =
      if (exists(spark, rawPath))
        raw(spark).join(broadcast(days), Seq("year", "month", "day"))
      else raw(spark)
    val nDeleted = current.join(deletes.select(key.map(col): _*).distinct(),
      key, "left_semi").count()
    val beforeTouched = snapshotTouched(rawFs(spark), dayTuples)
    // survivors = current minus every changed key, plus the upsert rows;
    // written as NEW files next to the old ones (a day the merge emptied
    // simply contributes none), then the manifest swap retires every
    // pre-merge file of the touched partitions in one atomic commit —
    // emptied partitions need no special-casing, dynamic overwrite's
    // classic blind spot
    val changedKeys = upserts.select(key.map(col): _*)
      .unionByName(deletes.select(key.map(col): _*)).distinct()
    val merged = current.join(changedKeys, key, "left_anti")
      .unionByName(upserts)
    val nUpserted = upserts.count()
    merged.write.mode("append")
      .partitionBy("year", "month", "day").parquet(rawPath)
    commitReplace(spark, dayTuples, beforeTouched)
    commitStoreVersion(spark)
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
      val fs = rawFs(spark)
      // the expired-partition list comes from manifest paths, not a
      // table scan — forgetting history must not require reading it
      val old = currentFiles(fs).toSeq.flatMap(dayOf).distinct
        .filter { case (y, m, dd) => (y * 100 + m) * 100 + dd < cutoff }
      if (old.nonEmpty) {
        // retire the expired partitions from the manifest; their files
        // stay on disk for pinned readers until GC's retention passes
        val droppedDirs = old.map { case (y, m, dd) => dayDir(y, m, dd) + "/" }
        commitRawVersion(spark, fs,
          currentFiles(fs).filterNot(f => droppedDirs.exists(f.startsWith)))
        gcRaw(spark)
        spark.catalog.refreshByPath(rawPath)
        commitStoreVersion(spark)
      }
      old.length.toLong
    }
  }

  /** T4: last-wins ledger upsert, rewritten in place (the ledger is tiny —
    * one row per ingested file).
    */
  def upsertLedger(spark: SparkSession, updates: DataFrame): Unit =
      TableLock.withLock(spark, root) {
    // write-then-publish like every other table: the delete→rename swap
    // this replaced left a window where the ledger path didn't exist at
    // all, and a reader caught inside it saw an empty ledger — which in
    // T4 semantics means "re-ingest everything"
    replaceWholeTable(spark, ledgerPath, Ledger.upsert(ledger(spark),
      updates), partitioned = false)
    commitStoreVersion(spark)
  }
}
