package graft.billing

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** File-level data skipping from the manifest's timestamp-stats sidecar
  * ([[FileStats]] / [[BillingStore.rawBetween]]): pruning really drops
  * files from the planned scan, results never depend on it, and the
  * sidecar follows the manifest through append, compaction, vacuum, and
  * history pruning.
  */
class FileStatsSpec extends SparkSpec {

  private def rec(ts: String, res: String, user: String,
      usage: Double): Schemas.BillingRecord =
    Schemas.BillingRecord(Timestamp.valueOf(ts), res, user, usage,
      "us", "free", "read", true, "compute", s"i-$res", "USD",
      ts.take(4).toInt, ts.slice(5, 7).toInt, ts.slice(8, 10).toInt)

  private def df(rs: Schemas.BillingRecord*): DataFrame =
    spark.createDataFrame(rs)

  private def inst(ts: String) = Timestamp.valueOf(ts).toInstant

  private def fsFor(root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  test("rawBetween prunes within a day partition and stays exact") {
    val store = BillingStore(tmpDir("tskip"))
    // three appends → three files: two time slices of day 1 in the SAME
    // hive partition (where partition pruning alone can't help), plus
    // day 2
    store.appendDedup(spark, df(
      rec("2025-06-01 01:00:00", "r1", "u1", 1.0),
      rec("2025-06-01 02:00:00", "r2", "u1", 2.0)))
    store.appendDedup(spark, df(
      rec("2025-06-01 20:00:00", "r3", "u2", 3.0)))
    store.appendDedup(spark, df(
      rec("2025-06-02 05:00:00", "r4", "u2", 4.0)))

    val Some((kept, total)) = store.filesForRange(spark,
      inst("2025-06-01 00:00:00"), inst("2025-06-01 12:00:00"))
    assert(total >= 3, "expected one file per append")
    assert(kept.nonEmpty && kept.size < total,
      s"morning window should prune ($kept of $total)")
    val morning = store.rawBetween(spark,
      inst("2025-06-01 00:00:00"), inst("2025-06-01 12:00:00"))
      .select("resource_id").collect().map(_.getString(0)).toSet
    assert(morning == Set("r1", "r2"))

    // a window before all data skips every file and returns nothing
    val Some((none, _)) = store.filesForRange(spark,
      inst("2024-01-01 00:00:00"), inst("2024-01-02 00:00:00"))
    assert(none.isEmpty)
    assert(store.rawBetween(spark, inst("2024-01-01 00:00:00"),
      inst("2024-01-02 00:00:00")).count() == 0L)

    // half-open semantics: lo inclusive, hi exclusive
    val mid = store.rawBetween(spark,
      inst("2025-06-01 02:00:00"), inst("2025-06-01 20:00:00"))
      .select("resource_id").collect().map(_.getString(0)).toSet
    assert(mid == Set("r2"))

    // skipping equals the unpruned filtered scan on a wide window
    val all = store.rawBetween(spark,
      inst("2025-06-01 00:00:00"), inst("2025-06-03 00:00:00")).count()
    assert(all == 4L)
  }

  test("stats follow compaction and vacuum; fallback keeps correctness") {
    val store = BillingStore(tmpDir("tskip_life"))
    store.appendDedup(spark,
      df(rec("2025-06-01 01:00:00", "r1", "u1", 1.0)))
    store.appendDedup(spark,
      df(rec("2025-06-01 23:00:00", "r2", "u1", 2.0)))
    store.appendDedup(spark,
      df(rec("2025-06-02 01:00:00", "r3", "u1", 3.0)))

    // compaction rewrites day 1 into one NEW file whose stats come from
    // the recompute path (the old per-slice files leave the manifest)
    val (parts, _) = store.compactRaw(spark)
    assert(parts == 1L)
    val Some((kd1, totalAfter)) = store.filesForRange(spark,
      inst("2025-06-01 00:00:00"), inst("2025-06-01 12:00:00"))
    assert(kd1.size == 1, s"compacted day should be one file, got $kd1")
    assert(store.rawBetween(spark, inst("2025-06-01 00:00:00"),
      inst("2025-06-01 12:00:00")).count() == 1L)
    // the merged file spans the whole day, so an evening window now
    // keeps it too — stats reflect the REWRITTEN layout
    val Some((ke, _)) = store.filesForRange(spark,
      inst("2025-06-01 22:00:00"), inst("2025-06-02 00:00:00"))
    assert(ke == kd1)

    // vacuum retires day 1: its files (and stats) leave the manifest
    store.vacuumBefore(spark, 2025, 6, 2)
    val Some((k2, t2)) = store.filesForRange(spark,
      inst("2025-06-01 00:00:00"), inst("2025-06-03 00:00:00"))
    assert(t2 == 1 && k2.size == 1)
    assert(store.rawBetween(spark, inst("2025-06-01 00:00:00"),
      inst("2025-06-03 00:00:00"))
      .select("resource_id").collect().map(_.getString(0)).toSet ==
      Set("r3"))
    // every retained manifest version has its sidecar alongside
    val fs = fsFor(store.rawPath)
    RawManifest.versions(fs, store.rawPath).foreach { v =>
      assert(FileStats.read(fs, store.rawPath, v).nonEmpty,
        s"missing stats sidecar for v$v")
    }
    assert(totalAfter >= t2)
  }

  test("time-sorted compaction (filesPerDay > 1) preserves skipping") {
    val store = BillingStore(tmpDir("tskip_slices"))
    val rs = (0 until 24).map(h =>
      rec(f"2025-06-01 $h%02d:30:00", s"r$h", "u1", h.toDouble))
    store.appendDedup(spark, df(rs.take(12): _*))
    store.appendDedup(spark, df(rs.drop(12): _*))
    val (parts, _) = store.compactRaw(spark, filesPerDay = 3)
    assert(parts == 1L)
    val Some((all, total)) = store.filesForRange(spark,
      inst("2025-06-01 00:00:00"), inst("2025-06-02 00:00:00"))
    assert(total >= 2 && all.size == total,
      s"expected multiple time slices, got $all")
    // a morning window keeps a strict subset of the day's OWN files —
    // granularity one-file-per-day compaction would have destroyed
    val Some((morning, _)) = store.filesForRange(spark,
      inst("2025-06-01 00:00:00"), inst("2025-06-01 08:00:00"))
    assert(morning.nonEmpty && morning.size < total)
    assert(store.rawBetween(spark, inst("2025-06-01 00:00:00"),
      inst("2025-06-01 08:00:00")).count() == 8L)
    // slices are time-disjoint: every file's rows fall in one slice
    val fs = fsFor(store.rawPath)
    val stats = FileStats.readLatest(fs, store.rawPath)
      .values.flatMap(_.ts).toSeq
    val sorted = stats.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA < loB, "overlapping slices")
      case _ =>
    }
  }

  test("pre-manifest store falls back to a plain filtered scan") {
    val store = BillingStore(tmpDir("tskip_fallback"))
    // direct write, no mutator commit → no manifest, no stats
    df(rec("2025-06-01 01:00:00", "r1", "u1", 1.0),
      rec("2025-06-02 01:00:00", "r2", "u1", 2.0))
      .write.mode("append").partitionBy("year", "month", "day")
      .parquet(store.rawPath)
    assert(store.filesForRange(spark, inst("2025-06-01 00:00:00"),
      inst("2025-06-02 00:00:00")).isEmpty)
    assert(store.rawBetween(spark, inst("2025-06-01 00:00:00"),
      inst("2025-06-02 00:00:00"))
      .select("resource_id").collect().map(_.getString(0)).toSet ==
      Set("r1"))
  }

  test("rawForUser prunes via the bloom sidecar and stays exact") {
    val store = BillingStore(tmpDir("tskip_bloom"))
    store.appendDedup(spark, df(
      rec("2025-06-01 01:00:00", "r1", "u1", 1.0),
      rec("2025-06-01 02:00:00", "r2", "u2", 2.0)))
    store.appendDedup(spark, df(
      rec("2025-06-01 20:00:00", "r3", "u3", 3.0),
      rec("2025-06-02 05:00:00", "r4", "u4", 4.0)))
    val Some((kept, total)) = store.filesForUser(spark, "u1")
    assert(total >= 2)
    assert(kept.nonEmpty && kept.size < total,
      s"u1 probe should prune ($kept of $total)")
    val got = store.rawForUser(spark, "u1")
      .select("resource_id").collect().map(_.getString(0)).toSet
    assert(got == Set("r1"))
    // a key nobody has: the probe prunes (modulo ~1% FP per file) and
    // the result is exactly empty either way
    val Some((none, _)) = store.filesForUser(spark, "nobody")
    assert(none.size < total)
    assert(store.rawForUser(spark, "nobody").count() == 0L)
  }

  test("z-order compaction keeps time AND user probes selective") {
    val store = BillingStore(tmpDir("tskip_z"))
    // a 16-hour x 8-user grid in ONE day partition: after a pure time
    // sort every file would hold every user (diffuse blooms); after a
    // z-order rewrite each file owns a curve quadrant — part of the
    // day AND part of the user space
    val rs = for { h <- 0 until 16; u <- 0 until 8 } yield
      rec(f"2025-06-01 $h%02d:15:00", s"r${h}_$u", s"user$u", 1.0)
    store.appendDedup(spark, df(rs.take(64): _*))
    store.appendDedup(spark, df(rs.drop(64): _*))
    store.compactRaw(spark, filesPerDay = 8, zorderUsers = true)
    val Some((all, total)) = store.filesForRange(spark,
      inst("2025-06-01 00:00:00"), inst("2025-06-02 00:00:00"))
    assert(total >= 4 && all.size == total)
    val Some((morning, _)) = store.filesForRange(spark,
      inst("2025-06-01 00:00:00"), inst("2025-06-01 08:00:00"))
    assert(morning.nonEmpty && morning.size < total,
      s"time window should prune z-ordered files ($morning of $total)")
    val Some((probe, _)) = store.filesForUser(spark, "user3")
    assert(probe.nonEmpty && probe.size < total,
      s"user probe should prune z-ordered files ($probe of $total)")
    // the rewrite changed no rows
    assert(store.rawBetween(spark, inst("2025-06-01 00:00:00"),
      inst("2025-06-02 00:00:00")).count() == 128L)
    assert(store.rawForUser(spark, "user3").count() == 16L)
  }

  test("catalyst-pushed filters drive skipping through the FileIndex") {
    val store = BillingStore(tmpDir("tskip_plan"))
    store.appendDedup(spark,
      df(rec("2025-06-01 01:00:00", "r1", "u1", 1.0)))
    store.appendDedup(spark,
      df(rec("2025-06-01 20:00:00", "r2", "u2", 2.0)))
    store.appendDedup(spark,
      df(rec("2025-06-02 05:00:00", "r3", "u3", 3.0)))

    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(plan: SparkPlan): Seq[FileSourceScanExec] = plan match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec    => Seq(s)
      case other => other.children.flatMap(scans)
    }
    def scannedFiles(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      scans(q.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }

    // a PLAIN filter on raw() — not the dedicated APIs — skips files:
    // the pushed equality probes the bloom, the pushed range checks the
    // ts stats, both inside the executed plan's own scan
    assert(scannedFiles(store.raw(spark)
      .filter(col("user_id") === "u1")) == 1L)
    assert(scannedFiles(store.raw(spark).filter(
      col("timestamp") >=
        lit(java.sql.Timestamp.valueOf("2025-06-01 00:00:00")) &&
      col("timestamp") <
        lit(java.sql.Timestamp.valueOf("2025-06-01 12:00:00")))) == 1L)
    // IN-list probes every member
    assert(scannedFiles(store.raw(spark)
      .filter(col("user_id").isin("u1", "u3"))) == 2L)
    // an unfiltered scan still reads the whole snapshot
    assert(scannedFiles(store.raw(spark)) == 3L)
    // SQL over a view of raw() gets identical treatment
    store.raw(spark).createOrReplaceTempView("fact_skip_test")
    assert(scannedFiles(spark.sql(
      "SELECT * FROM fact_skip_test WHERE user_id = 'u3'")) == 1L)
    // and partition pruning still composes with stats skipping
    assert(scannedFiles(store.raw(spark)
      .filter(col("day") === 1 && col("user_id") === "u2")) == 1L)
  }

  test("sidecar records file sizes; the index plans from metadata") {
    val store = BillingStore(tmpDir("tskip_sizes"))
    store.appendDedup(spark, df(
      rec("2025-06-01 01:00:00", "r1", "u1", 1.0),
      rec("2025-06-02 01:00:00", "r2", "u2", 2.0)))
    store.appendDedup(spark, df(
      rec("2025-06-01 09:00:00", "r3", "u3", 3.0)))
    val fs = fsFor(store.rawPath)
    val stats = FileStats.readLatest(fs, store.rawPath)
    assert(stats.nonEmpty)
    // every committed file carries its true on-disk length
    stats.foreach { case (rel, st) =>
      val disk = fs.getFileStatus(
        new org.apache.hadoop.fs.Path(store.rawPath, rel)).getLen
      assert(st.size.contains(disk), s"$rel size $st vs disk $disk")
    }
    // the relation's size estimate comes out of the sidecar — the
    // number broadcast decisions see
    val planned = store.raw(spark).queryExecution.optimizedPlan.stats
      .sizeInBytes
    assert(planned > 0)
  }

  test("pruneHistory removes the pruned versions' sidecars") {
    val root = tmpDir("tskip_prune")
    val fs = fsFor(root)
    (1 to 3).foreach { i =>
      val v = RawManifest.commit(fs, root, Seq(s"f$i.parquet"))
      FileStats.write(fs, root, v, Map(s"f$i.parquet" ->
        FileStats.FileStat(Some((i * 100L, i * 100L + 50L)), None)))
    }
    RawManifest.pruneHistory(fs, root, keep = 1)
    assert(FileStats.read(fs, root, 1L).isEmpty)
    assert(FileStats.read(fs, root, 2L).isEmpty)
    assert(FileStats.read(fs, root, 3L) == Map("f3.parquet" ->
      FileStats.FileStat(Some((300L, 350L)), None)))
  }

  test("all-null, absent, and pre-bloom stats classify conservatively") {
    val root = tmpDir("tskip_edge")
    val fs = fsFor(root)
    val v = RawManifest.commit(fs, root,
      Seq("nulls.parquet", "nostats.parquet", "hit.parquet"))
    FileStats.write(fs, root, v, Map(
      // all-null ts: range-unmatchable; no bloom: keep on any probe
      "nulls.parquet" -> FileStats.FileStat(None, None),
      "hit.parquet" -> FileStats.FileStat(Some((1000L, 2000L)), None)))
    val stats = FileStats.read(fs, root, v)
    assert(stats("nulls.parquet").ts.isEmpty)
    assert(stats("nulls.parquet").mayContain("anyone"))
    assert(!stats.contains("nostats.parquet"))

    // a sidecar line written before blooms existed (3 fields) still
    // parses, with keep-on-any-probe semantics
    val legacy = new org.apache.hadoop.fs.Path(root,
      "_raw_manifest/v000000000009")
    val side = new org.apache.hadoop.fs.Path(root,
      "_raw_manifest/v000000000009.stats")
    val o1 = fs.create(legacy, true); o1.write("old.parquet".getBytes); o1.close()
    val o2 = fs.create(side, true)
    o2.write("old.parquet\t5\t9".getBytes); o2.close()
    val compat = FileStats.read(fs, root, 9L)
    assert(compat("old.parquet") ==
      FileStats.FileStat(Some((5L, 9L)), None))
    assert(compat("old.parquet").mayContain("anyone"))
  }
}
