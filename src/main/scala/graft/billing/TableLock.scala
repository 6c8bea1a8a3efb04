package graft.billing

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** File-based writer mutex for a [[BillingStore]] root — the commit
  * protocol that makes concurrent mutators safe.
  *
  * Why it exists: `compactRaw` swaps day partitions via dynamic partition
  * overwrite. Correct single-writer, but an `appendDedup` racing the
  * compaction can land its file in a partition directory AFTER the
  * compactor read the partition and BEFORE it overwrites — the overwrite
  * then deletes the appended file and the rows are silently lost. The
  * reference never faces this because every writer funnels through one
  * shared embedded-DuckDB resource (pipeline/pipeline.py:179); a
  * parquet-directory store needs its own exclusion.
  *
  * Protocol: writers serialize on an atomically-created `_writer.lock`
  * file under the store root (create-if-absent is the atomic primitive;
  * deletion releases). The lock carries `pid ts` so a crashed writer's
  * lock is breakable: a contender steals it when the holder pid is dead
  * on this host, or unconditionally once it exceeds `staleMs` (covers a
  * holder on another host). Readers never take the lock — parquet file
  * sets are immutable once committed, so scans race only with the
  * metadata swap, which Spark's file-listing isolation already handles.
  *
  * Scale honesty: atomic create-if-absent holds on POSIX (java.nio
  * `createFile`) and HDFS (`create(overwrite=false)` is namenode-atomic).
  * S3 has no atomic create — at real object-store scale this lock must be
  * replaced by a transactional table format (Delta/Iceberg commit
  * manifests) or an external lock service; the store API shape stays the
  * same, which is the point of centralizing it here.
  */
object TableLock {

  /** Run `body` holding the store's writer lock. Reentrant per thread
    * (nested store operations — e.g. appendIncremental folding partials —
    * don't self-deadlock). Throws after `timeoutMs` of contention.
    */
  def withLock[A](spark: SparkSession, root: String,
      timeoutMs: Long = 60000L, staleMs: Long = 600000L)(body: => A): A = {
    val key = new Path(root).toUri.toString
    if (held.get.contains(key)) return body
    acquire(spark, root, timeoutMs, staleMs)
    held.set(held.get + key)
    try body
    finally {
      held.set(held.get - key)
      release(spark, root)
    }
  }

  private val held: ThreadLocal[Set[String]] =
    ThreadLocal.withInitial(() => Set.empty[String])

  private def lockPath(root: String) = new Path(root, "_writer.lock")

  private def acquire(spark: SparkSession, root: String,
      timeoutMs: Long, staleMs: Long): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var backoff = 5L
    while (!tryAcquire(spark, root, staleMs)) {
      if (System.currentTimeMillis() > deadline)
        throw new java.util.concurrent.TimeoutException(
          s"writer lock on $root still held after ${timeoutMs} ms")
      Thread.sleep(backoff)
      backoff = math.min(backoff * 2, 100L)
    }
  }

  private def tryAcquire(spark: SparkSession, root: String,
      staleMs: Long): Boolean = {
    val p = lockPath(root)
    val conf = spark.sessionState.newHadoopConf()
    val fs = p.getFileSystem(conf)
    fs.mkdirs(new Path(root))
    val payload =
      s"${ProcessHandle.current().pid()} ${System.currentTimeMillis()}"
    val isLocal = Option(p.toUri.getScheme).forall(s =>
      s == "file" || s.isEmpty)
    try {
      if (isLocal) {
        // java.nio createFile is POSIX-atomic (O_CREAT|O_EXCL); Hadoop's
        // RawLocalFileSystem create(overwrite=false) is check-then-create
        // and can double-grant under same-host contention
        val nio = java.nio.file.Paths.get(p.toUri.getPath)
        java.nio.file.Files.write(nio, payload.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
      } else {
        val out = fs.create(p, false)
        out.write(payload.getBytes("UTF-8"))
        out.close()
      }
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException |
          _: org.apache.hadoop.fs.FileAlreadyExistsException |
          _: java.io.IOException =>
        breakIfStale(fs, p, staleMs)
        false
    }
  }

  /** Steal a lock whose holder is provably gone: pid dead on this host,
    * or older than `staleMs` (cross-host fallback). Best-effort — a
    * failed read means the holder released between our check and read.
    */
  private def breakIfStale(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      staleMs: Long): Unit =
    try {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
      txt.split(" ") match {
        case Array(pid, ts) =>
          val dead = scala.util.Try(
            ProcessHandle.of(pid.trim.toLong).map(_.isAlive).orElse(false)
          ).toOption.exists(alive => !alive.booleanValue())
          val stale = scala.util.Try(ts.trim.toLong).toOption
            .exists(_ < System.currentTimeMillis() - staleMs)
          if (dead || stale) fs.delete(p, false)
        case _ => fs.delete(p, false) // unreadable payload: stale format
      }
    } catch { case _: java.io.IOException => () }

  private def release(spark: SparkSession, root: String): Unit = {
    val p = lockPath(root)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, false)
    ()
  }
}
