package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Segment + manifest storage shared by the persisted index family
  * ([[TextSearch]], [[DedupIndex]]): every mutation writes NEW files
  * into a fresh immutable `seg-*` directory and atomically publishes a
  * manifest version listing the index's current relation directories
  * ([[graft.store.VersionedManifest]] carries the protocol doc). What
  * this buys over the rename-swap these indexes used to run:
  *
  *   - readers pin one manifest version per logical operation
  *     ([[snapshot]]) and can never observe a half-swapped index — a
  *     search racing [[TextSearch.compact]] sees exactly the old or the
  *     new layout;
  *   - compaction is a manifest pointer swap plus deferred GC, not a
  *     directory rename (non-atomic on object stores, and the old
  *     rename left a no-index window between the two renames);
  *   - compacted-away segments survive until [[gc]] finds them
  *     unreferenced by the newest `retainVersions` manifests, so a
  *     pinned reader's files outlive the commit that dropped them.
  *
  * Manifest lines are `segName/relation` paths relative to the index
  * root; a snapshot resolves a relation to the union of its segment
  * directories. Mutators serialize on the index root's writer lock
  * ([[graft.billing.TableLock]] — same discipline as the billing
  * store), so manifest versions never race and append×compact cannot
  * lose a delivery.
  */
object IndexStore {

  private val manifest = new graft.store.VersionedManifest("_manifest")

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** One pinned manifest version: every relation this operation reads
    * resolves against the SAME line set, so a concurrent commit cannot
    * tear the view between two reads.
    */
  final case class Snapshot(spark: SparkSession, root: String,
      version: Long, lines: Seq[String]) {
    def dirs(relation: String): Seq[String] =
      lines.filter(_.endsWith(s"/$relation")).map(l => s"$root/$l")

    /** The relation as one DataFrame over its segment dirs; None when no
      * segment carries it (e.g. `tombstones` before any delete). Each
      * segment dir is read as its own root (partition columns like
      * `bucket=` discover per-dir — one multi-root read would fight
      * partition inference) and the branches union; a partition filter
      * still pushes into every branch's file index, so bucket pruning
      * survives the union.
      *
      * A snapshot pinned LONGER than the GC retention window can lose
      * its segments to a later commit's GC; resolution then fails with
      * a FileNotFoundException NAMING the pinned version (not a bare
      * missing-path error), so the caller can tell "my lease/retention
      * was too shallow" from data corruption. Readers that must outlive
      * the window hold [[IndexStore.withLease]] instead.
      */
    def read(relation: String): Option[DataFrame] =
      try readSegments(segments(relation), relation)
      catch {
        case e: Throwable if isMissingPath(e) =>
          throw new java.io.FileNotFoundException(
            s"index version $version at $root lost segments to GC while " +
              s"pinned (reader outlived the retention window; hold a " +
              s"lease via IndexStore.withLease): ${e.getMessage}")
      }

    private def isMissingPath(e: Throwable): Boolean =
      e != null && (e.isInstanceOf[java.io.FileNotFoundException] ||
        e.getMessage != null && (e.getMessage.contains("PATH_NOT_FOUND") ||
          e.getMessage.contains("Path does not exist")) ||
        isMissingPath(e.getCause))

    /** Distinct segment names carrying `relation` under this snapshot. */
    def segments(relation: String): Seq[String] =
      lines.filter(_.endsWith(s"/$relation")).map(_.split("/").head).distinct

    /** [[read]] restricted to an explicit segment subset — the
      * building block of scope-aware tombstone masking.
      *
      * Segments union by name with missing columns null-filled — the
      * schema-evolution contract: a later delivery may ADD columns
      * (the store of record's reality at 100 TB — crawl metadata
      * accretes) and older segments read as null for them, no rewrite.
      * For the index families, whose relations are written by one code
      * path, the allowance is inert today and is the forward-compat
      * path for a format revision adding a column. Column ORDER
      * follows the first (manifest-sorted) segment with later
      * segments' new columns appended — select explicitly when order
      * matters.
      */
    def readSegments(segs: Seq[String], relation: String): Option[DataFrame] =
      segs match {
        case Seq() => None
        case ss => Some(ss.map(s => spark.read.parquet(s"$root/$s/$relation"))
          .reduce(_.unionByName(_, allowMissingColumns = true)))
      }
  }

  /** Read-through cache of each root's newest (incarnation, version,
    * lines): a streaming maintenance loop calls [[snapshot]] several
    * times per micro-batch (mutator + meta read + compaction policy),
    * and on an object store every uncached call is a LIST + GET
    * against the manifest dir. A cached entry is current iff its
    * ROOT INCARNATION marker still exists, its version file still
    * exists, and the NEXT version does not — three existence probes
    * (HEADs), valid because commits are strictly sequential under the
    * writer lock; same-JVM commits refresh the cache directly so the
    * common single-writer loop never even probes.
    *
    * The incarnation probe closes the root-recreation hazard the
    * version probes alone cannot see: a root deleted and rebuilt
    * OUT-OF-BAND restarts version numbering, so "v exists, v+1
    * doesn't" can hold for a cached entry whose lines name the OLD
    * incarnation's (deleted) segments. Each root is stamped with a
    * UUID marker file at its first commit ([[ensureIncarnation]]);
    * the marker name IS the identity, so validation is a HEAD of the
    * cached marker path — a recreated root carries a fresh marker and
    * the old entry invalidates. Bounded: cleared wholesale past 4096
    * roots (gate tmp dirs churn).
    */
  private val latestCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Long, Seq[String])]()

  private def incarnationDir(root: String) = new Path(root, "_incarnation")

  /** The root's incarnation marker name, "" for a root with no marker
    * (pre-incarnation legacy, or never committed).
    */
  private def incarnationOf(fs: org.apache.hadoop.fs.FileSystem,
      root: String): String = {
    val dir = incarnationDir(root)
    if (!fs.exists(dir)) ""
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("inc-")).sorted.headOption.getOrElse("")
  }

  /** Stamp the root's incarnation on first commit (caller holds the
    * writer lock, so the marker is created exactly once per root
    * lifetime — deleting the root deletes the marker, and a rebuild
    * gets a fresh identity).
    */
  private def ensureIncarnation(fs: org.apache.hadoop.fs.FileSystem,
      root: String): String = {
    val cur = incarnationOf(fs, root)
    if (cur.nonEmpty) cur
    else {
      val name = "inc-" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      fs.mkdirs(incarnationDir(root))
      fs.create(new Path(incarnationDir(root), name), true).close()
      name
    }
  }

  /** The root's current incarnation id ("" for a never-committed or
    * pre-incarnation root) — the identity that distinguishes THIS index
    * from a same-versioned rebuild after an out-of-band wipe. Recorded
    * lineage ([[SelectionLog]]) stores it beside each pinned version so
    * an audit replay can refuse a root whose content history restarted.
    */
  def incarnation(spark: SparkSession, root: String): String =
    incarnationOf(fsOf(spark, root), root)

  private def incarnationValid(fs: org.apache.hadoop.fs.FileSystem,
      root: String, inc: String): Boolean =
    if (inc.isEmpty) !fs.exists(incarnationDir(root))
    else fs.exists(new Path(incarnationDir(root), inc))

  private def cachePut(root: String, inc: String, v: Long,
      lines: Seq[String]): Unit = {
    if (latestCache.size > 4096) latestCache.clear()
    latestCache.put(root, (inc, v, lines))
    ()
  }

  /** Per-(root, version) cache for tiny immutable metadata derived
    * from a snapshot (index geometry rows — gram width, bucket/band
    * counts): without it a streaming maintenance loop pays one Spark
    * job (a parquet `head()`) per micro-batch just to re-learn a
    * constant. Safe because a committed version's content is immutable
    * and versions are monotone per root (the manifest floor survives
    * pruning, so version numbers never restart while a root lives).
    */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Long), Any]()

  private[ext] def cachedMeta[A](snap: Snapshot)(load: => A): A = {
    if (metaCache.size > 4096) metaCache.clear()
    // keyed by the root's cached incarnation too, so a root rebuilt
    // out-of-band to the same version number cannot serve the old
    // incarnation's geometry (the incarnation is free here — snapshot()
    // just resolved it into latestCache)
    val inc = Option(latestCache.get(snap.root)).map(_._1).getOrElse("")
    metaCache.computeIfAbsent((snap.root, inc, snap.version), _ => load)
      .asInstanceOf[A]
  }

  def snapshot(spark: SparkSession, root: String): Snapshot = {
    val fs = fsOf(spark, root)
    val cached = Option(latestCache.get(root)).collect {
      case (inc, v, lines) if incarnationValid(fs, root, inc) &&
        !manifest.exists(fs, root, v + 1) &&
        manifest.exists(fs, root, v) => Snapshot(spark, root, v, lines)
    }
    cached.getOrElse {
      manifest.latest(fs, root) match {
        case Some((v, lines)) =>
          cachePut(root, incarnationOf(fs, root), v, lines)
          Snapshot(spark, root, v, lines)
        case None => throw new java.io.FileNotFoundException(
          s"no index manifest under $root — not an index root, or never built")
      }
    }
  }

  /** All manifest versions still retained under the root, oldest first
    * — the addressable time-travel window.
    */
  def versions(spark: SparkSession, root: String): Seq[Long] =
    manifest.versions(fsOf(spark, root), root)

  /** Pin a SPECIFIC retained version — time travel within the GC
    * retention window (same version-depth contract Delta/Iceberg make):
    * a reader holding version v sees exactly the index as committed at
    * v, because GC keeps every segment the newest `retainVersions`
    * manifests reference. The lineage use case: a data-selection run
    * records the index version it queried, and an audit re-runs the
    * same selection against that version verbatim even after later
    * appends/deletes landed.
    */
  def snapshotAt(spark: SparkSession, root: String, version: Long): Snapshot =
    manifest.filesAt(fsOf(spark, root), root, version) match {
      case Some(lines) => Snapshot(spark, root, version, lines)
      case None => throw new java.io.FileNotFoundException(
        s"index version $version at $root is not retained " +
          s"(have: ${versions(spark, root).mkString(",")})")
    }

  def newSegmentName(): String =
    "seg-" + java.util.UUID.randomUUID().toString.replace("-", "").take(16)

  /** Clone ONE PINNED VERSION of an index to a fresh root — the
    * backup/restore and environment-promotion primitive (Delta CLONE's
    * deep form): the destination is a fully independent index whose
    * version-1 manifest lists exactly the pinned snapshot's lines, with
    * its OWN incarnation, history, and GC lifecycle. Later mutations on
    * either side are invisible to the other — no shared files.
    *
    * Cost is a file-level copy of the segment directories the pinned
    * manifest references (live data only — compacted-away and
    * GC-pending segments do not travel, and no query re-executes).
    * Segment dirs copy WHOLE, so intra-segment sidecars outside the
    * manifest's relation lines (id-Bloom filters, zone-map stats,
    * tombstone scopes) arrive too. On an object store each segment file
    * is a server-side copy; at 100 TB the copy parallelizes per file
    * and is bounded by live bytes, never by history length.
    *
    * The caller pins `version` (and holds a lease when the copy may
    * outlive the retention window — [[Takedown.cloneCorpus]] does);
    * `dstRoot` must not already be an index root. Returns the
    * destination's first committed version.
    */
  def cloneAt(spark: SparkSession, srcRoot: String, dstRoot: String,
      version: Long): Long = {
    val snap = snapshotAt(spark, srcRoot, version)
    val dfs = fsOf(spark, dstRoot)
    require(manifest.latest(dfs, dstRoot).isEmpty,
      s"cloneAt destination $dstRoot is already an index root")
    val sfs = fsOf(spark, srcRoot)
    val conf = spark.sessionState.newHadoopConf()
    snap.lines.map(_.split("/").head).distinct.foreach { seg =>
      val ok = org.apache.hadoop.fs.FileUtil.copy(
        sfs, new Path(srcRoot, seg), dfs, new Path(dstRoot, seg),
        false, true, conf)
      require(ok, s"cloneAt: copying segment $seg to $dstRoot failed")
    }
    withLock(spark, dstRoot) {
      val inc = ensureIncarnation(dfs, dstRoot)
      val v = manifest.commit(dfs, dstRoot, snap.lines, "clone")
      cachePut(dstRoot, inc, v, snap.lines)
      v
    }
  }

  /** Distinct segments the CURRENT manifest references — the number of
    * per-relation unions a reader pays, i.e. the compaction-debt gauge.
    */
  def segmentCount(spark: SparkSession, root: String): Int =
    snapshot(spark, root).lines.map(_.split("/").head).distinct.size

  /** Run `body` holding the index root's writer mutex — every mutator
    * (build/append/delete/compact) goes through here.
    */
  def withLock[A](spark: SparkSession, root: String)(body: => A): A =
    graft.billing.TableLock.withLock(spark, root)(body)

  /** Bounded daemon pool for [[writeAll]] — sized small: commit writes
    * are few and each is itself a parallel Spark job.
    */
  private lazy val writePool = {
    val tf = new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"index-commit-write-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    }
    java.util.concurrent.Executors.newFixedThreadPool(4, tf)
  }

  /** Run a commit's independent relation writes CONCURRENTLY (guide
    * §2.6 — overlap independent jobs: Spark happily runs several jobs
    * in one application, and a segment's relation writes touch disjoint
    * directories over already-materialized frames, so their only
    * ordering was the driver calling them sequentially; overlapping
    * them lets one write's task tail back-fill the next's). Blocks
    * until every write finishes; the first failure rethrows — same
    * failure semantics as the sequential spelling (a partially-written
    * segment is never published because the manifest commit follows
    * this call).
    */
  private[ext] def writeAll(writes: (() => Unit)*): Unit = {
    import scala.jdk.CollectionConverters._
    // REENTRANCY GUARD: a task already running ON the commit-write pool
    // (e.g. a registry sweep overlapping whole-surface maintenance ops
    // that themselves commit via writeAll) must not invokeAll back into
    // the same bounded pool — the inner batch would queue behind the
    // saturated outer one while the outer task blocks waiting for it, a
    // silent driver deadlock. Nested calls run inline instead; the
    // OUTER level still overlaps.
    if (Thread.currentThread().getName.startsWith("index-commit-write-")) {
      writes.foreach(w => w())
    } else {
      val tasks: java.util.List[java.util.concurrent.Callable[Unit]] =
        writes.map { w =>
          new java.util.concurrent.Callable[Unit] { def call(): Unit = w() }
        }.asJava
      // invokeAll waits for all; get() rethrows the task's exception —
      // unwrap the ExecutionException so commit errors surface with the
      // same exception type/message as the sequential spelling did
      writePool.invokeAll(tasks).asScala.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    }
  }

  /** Run independent per-surface tasks on the commit-write pool and
    * return each task's outcome IN ORDER — the [[writeAll]] overlap
    * applied to whole-surface operations (registry sweeps, multi-root
    * retractions) that need per-task fault isolation instead of
    * first-failure rethrow. Tasks touching DIFFERENT index roots are
    * independent (each mutator takes its own root's writer lock); a
    * task that itself commits via [[writeAll]] runs those writes inline
    * (the reentrancy guard above), so nesting cannot starve the pool.
    * Called from a pool thread, the tasks run inline sequentially for
    * the same reason.
    */
  private[graft] def runAll[A](tasks: Seq[() => A]): Seq[scala.util.Try[A]] =
    if (tasks.size <= 1 ||
      Thread.currentThread().getName.startsWith("index-commit-write-"))
      tasks.map(t => scala.util.Try(t()))
    else {
      import scala.jdk.CollectionConverters._
      val cs: java.util.List[java.util.concurrent.Callable[scala.util.Try[A]]] =
        tasks.map { t =>
          new java.util.concurrent.Callable[scala.util.Try[A]] {
            def call(): scala.util.Try[A] = scala.util.Try(t())
          }
        }.asJava
      writePool.invokeAll(cs).asScala.toSeq.map(_.get())
    }

  /** Publish `seg`'s relations ON TOP of the current manifest (append
    * semantics: deliveries, tombstones). Caller must hold the lock and
    * have finished writing the segment's files.
    */
  def publishAppend(spark: SparkSession, root: String, seg: String,
      relations: Seq[String], op: String = "append"): Long = {
    val fs = fsOf(spark, root)
    val inc = ensureIncarnation(fs, root)
    val prev = manifest.latest(fs, root).map(_._2).getOrElse(Seq.empty)
    val lines = (prev ++ relations.map(r => s"$seg/$r")).sorted
    val v = manifest.commit(fs, root, lines, op)
    cachePut(root, inc, v, lines)
    v
  }

  /** Publish `seg`'s relations as the index's ENTIRE content (replace
    * semantics: initial build, compaction), then GC segments no retained
    * manifest references. Caller must hold the lock.
    */
  def publishReplace(spark: SparkSession, root: String, seg: String,
      relations: Seq[String], retainVersions: Int = 2,
      op: String = "replace"): Long = {
    val fs = fsOf(spark, root)
    val inc = ensureIncarnation(fs, root)
    val lines = relations.map(r => s"$seg/$r").sorted
    val v = manifest.commit(fs, root, lines, op)
    cachePut(root, inc, v, lines)
    gc(spark, root, retainVersions)
    v
  }

  /** The op tag `version` committed with ("" pre-tag) — see
    * [[graft.store.VersionedManifest.opAt]].
    */
  def opAt(spark: SparkSession, root: String, version: Long): String =
    manifest.opAt(fsOf(spark, root), root, version)

  /** Shared tombstone-append for the vector-index family (IVF/PQ/SQ/
    * IVF-PQ) and [[LiteralIndex]]: the requested ids that have LIVE
    * rows in `relation` append as one tombstone segment, SCOPED to the
    * data segments present at delete time ([[writeScope]]). Readers
    * anti-join via [[liveRows]]; compaction applies them physically.
    * Judging presence against live rows (not raw rows) makes deletes
    * idempotent (a fully-masked id is a no-op) while still letting a
    * RE-ADDED id be deleted again — the old already-tombstoned
    * anti-join could not tell those cases apart. The presence judge is
    * [[liveRowsAmong]] (Bloom-sidecar segment pruning), so a
    * takedown-sized batch reads only the segments that may hold its
    * ids, never the whole relation; broadcast joins throughout.
    */
  private[ext] def tombstoneIds(spark: SparkSession, root: String,
      ids: DataFrame, idCol: org.apache.spark.sql.Column,
      relation: String, key: String = "vec_id"): Unit =
    withLock(spark, root) {
      val snap = snapshot(spark, root)
      val requested = ids.select(idCol.as(key)).distinct()
      val eff = requested.join(
        liveRowsAmong(snap, relation, key, requested).select(key),
        Seq(key), "left_semi")
      if (!eff.isEmpty) {
        val seg = newSegmentName()
        eff.coalesce(1).write.parquet(s"$root/$seg/tombstones")
        writeScope(spark, root, seg, snap.segments(relation))
        publishAppend(spark, root, seg,
          Seq("tombstones", "tombstone_scope"), op = "delete")
        ()
      }
    }

  /** The scope sidecar of one tombstone segment: rows (tomb_seg, seg)
    * declaring that `seg`'s tombstones mask exactly `dataSegs` — the
    * data segments that existed when the delete committed. Segments
    * appended LATER are not masked, which is what lets a deleted id be
    * re-ingested (delete-then-readd) and become visible again without
    * waiting for a compact — the same sequence-number scoping
    * Delta/Iceberg deletion vectors use. Caller holds the lock and
    * publishes `tombstone_scope` alongside `tombstones`.
    */
  private[ext] def writeScope(spark: SparkSession, root: String,
      seg: String, dataSegs: Seq[String]): Unit = {
    import spark.implicits._
    dataSegs.toDF("seg")
      .withColumn("tomb_seg", org.apache.spark.sql.functions.lit(seg))
      .coalesce(1).write.parquet(s"$root/$seg/tombstone_scope")
  }

  /** `relation` under `snap` with tombstoned keys excluded — the one
    * definition of "live" every reader and compactor of a keyed index
    * relation shares. Each tombstone segment masks only the data
    * segments in its scope sidecar (a pre-scoping tombstone masks
    * everything — the conservative legacy reading), so data segments
    * are grouped by their applicable tombstone set and each group
    * anti-joins only the tombstones that bind it. Typical shapes: no
    * tombstones → plain read; one delete over a settled index → one
    * group, one anti-join (the old plan exactly); delete-then-readd →
    * the re-added delivery lands in the unmasked group and is live.
    */
  private[ext] def liveRows(snap: Snapshot, relation: String,
      key: String = "vec_id", only: Option[Seq[String]] = None): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // `only` restricts the DATA segments read (zone-map pruning —
    // [[CorpusStore.readRange]]); tombstones still apply in full, each
    // masking whatever kept segments its scope binds
    val dataSegs = only.getOrElse(snap.segments(relation))
    val tombSegs = snap.segments("tombstones")
    if (tombSegs.isEmpty)
      return snap.readSegments(dataSegs, relation).get
    val scoped: Map[String, Set[String]] =
      snap.read("tombstone_scope")
        .map(_.select("tomb_seg", "seg").collect()
          .groupBy(_.getString(0))
          .map { case (t, rs) => t -> rs.map(_.getString(1)).toSet })
        .getOrElse(Map.empty)
    val all = dataSegs.toSet
    val groups = dataSegs.groupBy(ds =>
      tombSegs.filter(ts => scoped.getOrElse(ts, all).contains(ds)))
    groups.map { case (ts, dss) =>
      val rows = snap.readSegments(dss, relation).get
      if (ts.isEmpty) rows
      else rows.join(
        broadcast(snap.readSegments(ts, "tombstones").get
          .select(key).distinct()),
        Seq(key), "left_anti")
    }.reduce(_ unionByName _)
  }

  /** [[liveRows]] restricted to the segments that may contain one of
    * `candidates` — the presence probe the ingest-admission and
    * takedown-delete paths share. Each data segment's id Bloom sidecar
    * ([[IdBloom]] — built lazily once per immutable segment) is tested
    * against the candidate batch and only possibly-matching segments
    * are read, so a probe costs O(segment blooms + matching segments)
    * instead of O(live ids) — for the token-linear relations (BM25
    * postings, literal grams) the difference between a takedown batch
    * reading two deliveries and reading the corpus. Value-identical to
    * `liveRows(...).join(candidates, semi)` by construction: bloom
    * false positives only add segments, false negatives are
    * impossible, and tombstone masking applies unreduced to whatever
    * is kept. Candidate batches beyond the broadcast-size cap fall
    * back to the unpruned read (a giant batch amortizes a full scan).
    * Callers still semi-join the result with their candidates — this
    * prunes SEGMENTS, not rows.
    */
  private[ext] def liveRowsAmong(snap: Snapshot, relation: String,
      key: String, candidates: DataFrame): DataFrame = {
    val dataSegs = snap.segments(relation)
    val hit = IdBloom.collectPairs(candidates, key) match {
      case None => dataSegs // over the probe cap: unpruned
      case Some(pairs) => IdBloom.candidateSegments(
        snap.spark, snap.root, dataSegs, relation, key, pairs)
    }
    if (hit.isEmpty && dataSegs.nonEmpty)
      // no segment can match: empty result, schema from one segment
      // (filter(false) folds to an empty scan — no data read)
      liveRows(snap, relation, key, only = Some(Seq(dataSegs.head)))
        .filter(org.apache.spark.sql.functions.lit(false))
    else liveRows(snap, relation, key, only = Some(hit))
  }

  /** Run `body` against `version` pinned under a READER LEASE: a
    * `_leases/` marker (version + expiry) that [[gc]] honors — the
    * leased version's manifest and segments survive any number of
    * later commits until the lease is released (or its TTL lapses:
    * leases expire so a crashed reader cannot block GC forever — the
    * same crash-safety trade Delta's checkpoint retention and
    * Iceberg's snapshot refs make). The lease is written under the
    * writer lock, so it cannot race a concurrent GC's lease listing;
    * a version already GC'd raises the usual not-retained error
    * before `body` runs.
    */
  def withLease[A](spark: SparkSession, root: String, version: Long,
      ttlMs: Long = 6 * 3600 * 1000L)(body: Snapshot => A): A = {
    val fs = fsOf(spark, root)
    val lease = new Path(new Path(root, "_leases"),
      "lease-" + java.util.UUID.randomUUID().toString.replace("-", ""))
    val snap = withLock(spark, root) {
      fs.mkdirs(lease.getParent)
      val out = fs.create(lease, true)
      try out.write(
        s"$version ${System.currentTimeMillis() + ttlMs}".getBytes("UTF-8"))
      finally out.close()
      try snapshotAt(spark, root, version)
      catch { case e: Throwable => fs.delete(lease, false); throw e }
    }
    try body(snap) finally fs.delete(lease, false)
  }

  /** Versions protected by unexpired leases; expired lease files are
    * swept here (the only place that reads them).
    */
  private def leasedVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Set[Long] = {
    val dir = new Path(root, "_leases")
    if (!fs.exists(dir)) return Set.empty
    val now = System.currentTimeMillis()
    fs.listStatus(dir).toSeq.flatMap { st =>
      val in = fs.open(st.getPath)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.trim.split("\\s+") match {
        case Array(v, exp) if exp.toLong > now => Some(v.toLong)
        case _ => fs.delete(st.getPath, false); None
      }
    }.toSet
  }

  /** Delete `seg-*` directories unreferenced by any KEPT manifest and
    * prune manifest history to exactly the kept set — the newest
    * `retainVersions` commits plus every version under an active
    * reader lease ([[withLease]]). Every manifest [[versions]]
    * advertises stays fully readable (its segments survive), so the
    * addressable time-travel window and the readable one are one
    * number. (The old behavior kept up to 8 manifests while GC'ing
    * all but the newest 2's segments: [[snapshotAt]] on versions 3–8
    * succeeded and then failed mid-scan on a deleted `seg-*` path.)
    * Only segment dirs are touched — never the manifest dir, the
    * lease dir, or any caller-owned sibling (e.g. a dedup index's
    * root-level `meta`).
    */
  def gc(spark: SparkSession, root: String, retainVersions: Int): Unit = {
    val fs = fsOf(spark, root)
    val vs = manifest.versions(fs, root)
    val keepVs = vs.takeRight(math.max(retainVersions, 1)).toSet ++
      leasedVersions(fs, root).filter(vs.contains)
    val keep = keepVs.flatMap(v =>
      manifest.filesAt(fs, root, v).getOrElse(Seq.empty))
      .map(_.split("/").head)
    val rootPath = new Path(root)
    if (fs.exists(rootPath)) {
      fs.listStatus(rootPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("seg-"))
        .filterNot(st => keep.contains(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
    }
    manifest.pruneExcept(fs, root, keepVs)
  }
}
