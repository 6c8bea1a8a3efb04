package graft.billing

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** The commit-protocol contract ([[TableLock]]): a dedup-append racing a
  * compaction must never lose rows. Without the writer lock, compactRaw's
  * dynamic partition overwrite can delete a file an append just committed
  * into the same day partition — this spec interleaves both from separate
  * threads and asserts the final store holds exactly the union of every
  * appended batch.
  */
class BillingStoreConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def rec(ts: String, res: String, user: String,
      usage: Double): Schemas.BillingRecord =
    Schemas.BillingRecord(Timestamp.valueOf(ts), res, user, usage,
      "us", "free", "read", true, "compute", s"i-$res", "USD",
      ts.take(4).toInt, ts.slice(5, 7).toInt, ts.slice(8, 10).toInt)

  private def df(rs: Schemas.BillingRecord*): DataFrame =
    spark.createDataFrame(rs)

  test("racing appends and compactions lose zero rows") {
    val store = BillingStore(tmpDir("conc_store"))
    // seed both day partitions fragmented so the compactor has work
    // from the first iteration
    store.appendDedup(spark, df(
      rec("2025-04-23 00:00:00", "seed23", "u0", 1.0),
      rec("2025-04-24 00:00:00", "seed24", "u0", 1.0)).repartition(3))
    val nBatches = 10
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      try (1 to nBatches).foreach { i =>
        // every batch hits the SAME two day partitions the compactor is
        // rewriting, fragmented across 3 tasks — the exact geometry of
        // the lost-append race
        store.appendDedup(spark, df(
          rec(f"2025-04-23 ${i}%02d:00:00", s"a$i", "u1", 1.0),
          rec(f"2025-04-24 ${i}%02d:00:00", s"b$i", "u2", 1.0))
          .repartition(3))
      } catch { case t: Throwable => errs.add(t) }
    })
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactor = new Thread(() => {
      try while (!stop.get()) {
        store.compactRaw(spark)
        Thread.sleep(5)
      } catch { case t: Throwable => errs.add(t) }
    })
    compactor.start()
    appender.start()
    appender.join(300000)
    stop.set(true)
    compactor.join(300000)
    assert(errs.isEmpty, s"worker failed: ${Option(errs.peek())}")
    val ids = store.raw(spark).select("resource_id")
      .as[String].collect().toSet
    val expected = Set("seed23", "seed24") ++
      (1 to nBatches).flatMap(i => Seq(s"a$i", s"b$i"))
    assert(ids == expected,
      s"lost=${expected -- ids} phantom=${ids -- expected}")
    assert(store.raw(spark).count() == 2L + 2L * nBatches) // no dups either
  }

  test("a reader scanning through interleaved append x compaction only " +
      "sees committed row counts") {
    val store = BillingStore(tmpDir("snap_store"), retainVersions = 3)
    store.appendDedup(spark, df(
      rec("2025-04-23 00:00:00", "seed23", "u0", 1.0),
      rec("2025-04-24 00:00:00", "seed24", "u0", 1.0)).repartition(3))
    val nBatches = 8
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val appender = new Thread(() => {
      try (1 to nBatches).foreach { i =>
        store.appendDedup(spark, df(
          rec(f"2025-04-23 ${i}%02d:00:00", s"a$i", "u1", 1.0),
          rec(f"2025-04-24 ${i}%02d:00:00", s"b$i", "u2", 1.0))
          .repartition(3))
      } catch { case t: Throwable => errs.add(t) } finally stop.set(true)
    })
    val compactor = new Thread(() => {
      try while (!stop.get()) {
        store.compactRaw(spark)
        Thread.sleep(5)
      } catch { case t: Throwable => errs.add(t) }
    })
    // every append commits exactly 2 rows and compaction preserves rows,
    // so ANY consistent snapshot has an even count in [2, 2+2n]; a torn
    // read (half a partition swap, doubled or missing files) does not
    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val reader = new Thread(() => {
      try while (!stop.get()) {
        counts += store.raw(spark).count()
      } catch { case t: Throwable => errs.add(t) }
    })
    compactor.start(); reader.start(); appender.start()
    appender.join(300000)
    compactor.join(300000); reader.join(300000)
    assert(errs.isEmpty, s"worker failed: ${Option(errs.peek())}")
    assert(counts.nonEmpty)
    val valid = (1 to nBatches + 1).map(_ * 2L).toSet
    val torn = counts.filterNot(valid)
    assert(torn.isEmpty, s"inconsistent snapshot counts: $torn")
    assert(store.raw(spark).count() == 2L + 2L * nBatches)
  }

  test("a snapshot pins raw and partials at one mutator boundary") {
    val store = BillingStore(tmpDir("xtable_snap"), retainVersions = 8)
    store.appendIncremental(spark, df(
      rec("2025-05-01 00:00:00", "seed1", "u0", 1.0),
      rec("2025-05-02 00:00:00", "seed2", "u0", 2.0)))
    val nBatches = 6
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = new Thread(() => {
      try (1 to nBatches).foreach { i =>
        store.appendIncremental(spark, df(
          rec(f"2025-05-01 ${i}%02d:00:00", s"a$i", s"u$i", 1.0),
          rec(f"2025-05-02 ${i}%02d:00:00", s"b$i", s"u$i", 2.0)))
      } catch { case t: Throwable => errs.add(t) } finally stop.set(true)
    })
    // the invariant a snapshot guarantees and plain reads do not: the
    // daily rollup finalized from the pinned partials ALWAYS equals the
    // rollup recomputed from the pinned raw — raw and partials commit
    // in lock-step inside one mutator, and the vector is only published
    // after both. An unpinned reader pair can straddle the mutator
    // (raw appended, fold not yet landed) between the two commits.
    val observed = new java.util.concurrent.atomic.AtomicInteger(0)
    val reader = new Thread(() => {
      try while (!stop.get()) {
        val snap = store.snapshot(spark)
        if (snap.versions.contains("raw_billing") &&
            snap.versions.contains("daily_partials")) {
          import org.apache.spark.sql.functions.{col, round => rnd}
          val cols = Seq(col("year"), col("month"), col("day"),
            col("transaction_count"),
            rnd(col("total_credit_usage"), 2).as("t"))
          val fromPartials = snap.dailyFromPartials(spark)
            .select(cols: _*).collect().map(_.toSeq).toSet
          val fromRaw = Aggregates.daily(snap.raw(spark))
            .select(cols: _*).collect().map(_.toSeq).toSet
          if (fromPartials != fromRaw)
            errs.add(new AssertionError(
              s"torn cross-table snapshot: $fromPartials vs $fromRaw"))
          observed.incrementAndGet()
        }
      } catch { case t: Throwable => errs.add(t) }
    })
    reader.start(); writer.start()
    writer.join(300000); reader.join(300000)
    assert(errs.isEmpty, s"violation: ${Option(errs.peek())}")
    assert(observed.get() > 0, "reader never observed a snapshot")
  }

  test("a rollup reader racing incremental merges only sees committed " +
      "partials states") {
    val store = BillingStore(tmpDir("partials_snap"), retainVersions = 3)
    store.appendIncremental(spark, df(
      rec("2025-04-23 00:00:00", "seed23", "u0", 1.0),
      rec("2025-04-24 00:00:00", "seed24", "u0", 1.0)))
    val nBatches = 6
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = new Thread(() => {
      try (1 to nBatches).foreach { i =>
        // each batch merges INTO the same two day partitions — the
        // partition-swap geometry a torn reader would observe
        store.appendIncremental(spark, df(
          rec(f"2025-04-23 ${i}%02d:00:00", s"a$i", "u1", 1.0),
          rec(f"2025-04-24 ${i}%02d:00:00", s"b$i", "u2", 1.0)))
      } catch { case t: Throwable => errs.add(t) } finally stop.set(true)
    })
    val totals = scala.collection.mutable.ArrayBuffer.empty[Long]
    val reader = new Thread(() => {
      try while (!stop.get()) {
        totals += store.dailyFromPartials(spark)
          .agg(org.apache.spark.sql.functions.sum("transaction_count"))
          .head().getLong(0)
      } catch { case t: Throwable => errs.add(t) }
    })
    reader.start(); writer.start()
    writer.join(300000); reader.join(300000)
    assert(errs.isEmpty, s"worker failed: ${Option(errs.peek())}")
    // every committed partials state totals an even count; a half-swapped
    // read (one day merged, the other doubled or missing) does not
    val valid = (1 to nBatches + 1).map(_ * 2L).toSet
    val torn = totals.filterNot(valid)
    assert(torn.isEmpty, s"inconsistent rollup totals: $torn")
    assert(store.dailyFromPartials(spark)
      .agg(org.apache.spark.sql.functions.sum("transaction_count"))
      .head().getLong(0) == 2L + 2L * nBatches)
  }

  private def forgeLock(root: String, payload: String): java.nio.file.Path =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_writer.lock"), payload)

  test("a dead holder's lock is broken instead of waited out") {
    val store = BillingStore(tmpDir("stale_lock"))
    // forge a lock from a pid that cannot exist (kernel pid_max < 2^22)
    // on THIS host — the one case pid-liveness is allowed to decide
    forgeLock(store.root,
      s"99999999 ${TableLock.localHost} tok ${System.currentTimeMillis()}")
    assert(store.appendDedup(spark,
      df(rec("2025-04-23 10:00:00", "r1", "u1", 2.0))) == 1L)
    // the broken lock was re-acquired and released
    assert(!new java.io.File(store.root, "_writer.lock").exists())
  }

  test("a live holder's lock is honored until timeout") {
    val root = tmpDir("live_lock")
    new java.io.File(root).mkdirs()
    forgeLock(root, TableLock.payloadFor("other-token"))
    intercept[java.util.concurrent.TimeoutException] {
      TableLock.withLock(spark, root, timeoutMs = 300)(())
    }
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(root, "_writer.lock"))
    // released → acquires immediately and runs the body
    var ran = false
    TableLock.withLock(spark, root, timeoutMs = 300) { ran = true }
    assert(ran)
  }

  test("a remote host's fresh lock is honored even if its pid is dead " +
      "here") {
    val root = tmpDir("remote_lock")
    new java.io.File(root).mkdirs()
    // pid 99999999 does not exist locally, but the payload names another
    // host — liveness must NOT be judged from this machine's process
    // table, so only the staleMs clock may break it
    forgeLock(root,
      s"99999999 some-other-host tok ${System.currentTimeMillis()}")
    intercept[java.util.concurrent.TimeoutException] {
      TableLock.withLock(spark, root, timeoutMs = 300)(())
    }
  }

  test("an unreadable-but-fresh lock is honored, not deleted") {
    val root = tmpDir("empty_lock")
    new java.io.File(root).mkdirs()
    // an empty file is what a contender sees in the create→write window
    // of a non-atomic filesystem — deleting it would unseat a live holder
    forgeLock(root, "")
    intercept[java.util.concurrent.TimeoutException] {
      TableLock.withLock(spark, root, timeoutMs = 300)(())
    }
    assert(new java.io.File(root, "_writer.lock").exists())
  }

  test("an unreadable lock older than staleMs is broken") {
    val root = tmpDir("old_empty_lock")
    new java.io.File(root).mkdirs()
    val p = forgeLock(root, "garbage payload")
    java.nio.file.Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 10000))
    var ran = false
    TableLock.withLock(spark, root, timeoutMs = 2000, staleMs = 1000) {
      ran = true
    }
    assert(ran)
  }

  test("release leaves a thief's lock alone after an overrun steal") {
    val root = tmpDir("thief_lock")
    TableLock.withLock(spark, root) {
      // simulate: we overran staleMs and a thief re-acquired — the lock
      // file now carries the thief's token
      forgeLock(root, s"${ProcessHandle.current().pid()} " +
        s"${TableLock.localHost} thief-token " +
        s"${System.currentTimeMillis()}")
    }
    // our release must NOT have deleted the thief's lock
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(root, "_writer.lock"))
    assert(txt.contains("thief-token"))
  }

  test("the lock is reentrant within a thread") {
    val root = tmpDir("reentrant_lock")
    val got = TableLock.withLock(spark, root) {
      TableLock.withLock(spark, root, timeoutMs = 300) { 42 }
    }
    assert(got == 42)
    assert(!new java.io.File(root, "_writer.lock").exists())
  }
}
