package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // typed aggregates (MinHash/SimHash) run via ObjectHashAggregate,
      // whose default sort-fallback kicks in at 128 groups/partition —
      // far below our per-doc signature groupBys
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4000000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // shuffle/spill scratch on tmpfs when available: this host's
      // buffered-write path throttles to ~40 MB/s (direct I/O does 330),
      // which both slows shuffles and makes timings swing run-to-run
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_local"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb JVM/codegen/parquet-reader init outside the timed queries
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    // name-sorted so timings are position-stable as gates get added
    // (Map iteration order reshuffles whenever the key set changes);
    // SPARK_GRAFT_ONLY=substr[,substr...] narrows the run for iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      // operators persist() reusable subtrees; drop them between queries
      // so ~60 gates don't accumulate cached partitions in one session,
      // and collect the garbage OUTSIDE the next gate's timed window —
      // GC debt from a heavy neighbor otherwise lands on whoever runs next
      spark.catalog.clearCache()
      System.gc()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
