package graft.billing

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-file `timestamp` min/max sidecars for [[RawManifest]] versions —
  * file-level data skipping on the fact store's event-time axis, the
  * same role Delta/Iceberg column stats play in their commit logs.
  *
  * Hive partition pruning already skips whole (year,month,day)
  * directories; these stats prune WITHIN a partition — a day that
  * accumulated many append files (each covering a slice of the day) is
  * narrowed to the files whose [min,max] intersects the query range
  * before Spark ever plans a task. At 100 TB that is the difference
  * between "plan tasks for every file of the day and let parquet
  * row-group stats reject rows at execution time" and "never schedule
  * the task at all" — footer reads cost a round trip per file on an
  * object store, and task startup is the dominant cost of a selective
  * scan.
  *
  * Layout: `_raw_manifest/v%012d.stats`, one `relpath\tmin\tmax` line
  * per data file (event-time micros; `-` for a file with no non-null
  * timestamps). Written by the same lock-holding mutator that commits
  * the manifest version; stats for files carried over from the prior
  * version are copied forward, so each commit pays one column-pruned
  * Spark job over ONLY its new files. Readers treat a missing sidecar
  * or a missing line as "keep the file" — skipping is an optimization,
  * never a correctness dependency (the residual filter still applies).
  */
private[billing] object FileStats {

  /** relpath -> Some((minMicros, maxMicros)), or None when the file has
    * no non-null timestamps (a null-rejecting range predicate can never
    * select its rows, so such files are skippable for ANY range).
    */
  type Stats = Map[String, Option[(Long, Long)]]

  private def statsPath(root: String, version: Long) =
    new Path(new Path(root, "_raw_manifest"), f"v$version%012d.stats")

  def read(fs: FileSystem, root: String, version: Long): Stats = {
    val p = statsPath(root, version)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.split("\n").iterator.map(_.trim).filter(_.nonEmpty).flatMap {
        line =>
          line.split("\t") match {
            case Array(f, "-", "-") => Some(f -> None)
            case Array(f, lo, hi)   => Some(f -> Some((lo.toLong, hi.toLong)))
            case _                  => None // tolerate a torn/foreign line
          }
      }.toMap
    }
  }

  /** Atomic write (temp + rename), mirroring the manifest commit. */
  def write(fs: FileSystem, root: String, version: Long,
      stats: Stats): Unit = {
    val p = statsPath(root, version)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val body = stats.toSeq.sortBy(_._1).map {
      case (f, Some((lo, hi))) => s"$f\t$lo\t$hi"
      case (f, None)           => s"$f\t-\t-"
    }.mkString("\n")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, p)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"stats commit lost a race: $p")
    }
  }

  /** Sidecar of one retained version (empty map for pre-stats commits —
    * readers then keep every file).
    */
  def readLatest(fs: FileSystem, root: String): Stats =
    RawManifest.latest(fs, root) match {
      case Some((v, _)) => read(fs, root, v)
      case None         => Map.empty
    }

  /** Per-file timestamp min/max for `relFiles`, via ONE column-pruned
    * Spark job over just those files. Footer-only stats would avoid the
    * job but are unreliable across parquet physical timestamp types
    * (INT96 has no usable min/max); a one-column scan of the new batch
    * is robust and O(batch), not O(table). A zero-row file produces no
    * group and is recorded as statless-skippable (None).
    */
  def compute(spark: SparkSession, table: String,
      relFiles: Seq[String]): Stats =
    if (relFiles.isEmpty) Map.empty
    else {
      val rootUri = new Path(table).toUri.getPath
      val rows = spark.read.schema(Schemas.billing)
        .option("basePath", table)
        .parquet(relFiles.map(f => s"$table/$f"): _*)
        .select(input_file_name().as("f"),
          unix_micros(col("timestamp")).as("ts"))
        .groupBy("f")
        .agg(min("ts").as("lo"), max("ts").as("hi"))
        .collect()
      val byRel = rows.map { r =>
        val rel = new Path(r.getString(0)).toUri.getPath
          .stripPrefix(rootUri).stripPrefix("/")
        rel -> (if (r.isNullAt(1)) None
                else Some((r.getLong(1), r.getLong(2))))
      }.toMap
      relFiles.map(f => f -> byRel.getOrElse(f, None)).toMap
    }

  /** Remove the sidecar of a pruned manifest version (called by
    * [[RawManifest.pruneHistory]] so history and stats stay in step).
    */
  def drop(fs: FileSystem, manifest: Path): Unit = {
    val side = new Path(manifest.getParent, manifest.getName + ".stats")
    if (fs.exists(side)) { fs.delete(side, false); () }
  }
}
