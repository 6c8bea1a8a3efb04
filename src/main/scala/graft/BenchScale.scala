package graft

import org.apache.spark.sql.SparkSession

/** CORE-SCALING probe at a scan-bound scale point — the measurement the
  * sf0.1 bench cannot give: at sf0.1 every 8-core/32-core gate ratio is
  * ≈1 because the suite is task-scheduling/commit/JVM-overhead-bound,
  * so no bench number demonstrates that any operator parallelizes. This
  * probe replicates sf0.1 `factor`× (the [[ScaleProbe]] replicator —
  * keys offset, vocabulary rotated) and times a fixed set of the
  * HEAVIEST gates under local[32] and local[8] in one warm child JVM
  * per core count (a master cannot change inside a JVM). Each child
  * runs every probe gate once UNTIMED first — shared fixtures/memos
  * build there, exactly the Bench prewarm contract — then timed, so
  * the ratio compares warm operator work, not fixture construction.
  *
  * Rows land in BASELINE.md's core-scaling table. A gate whose
  * t8/t32 ratio stays ≈1 at this scale has a serialized stage worth a
  * named cause. NOT a driver-contract main; the driver's own bench
  * still honors $SPARK_GRAFT_CPUS unchanged.
  *
  * Usage: `sbt "runMain graft.BenchScale"`; env knobs:
  * SPARK_GRAFT_SF_DIR (base, default /root/testdata/sf0.1),
  * SPARK_GRAFT_SCALE_FACTOR (default 10), SPARK_GRAFT_ONLY
  * (substring narrowing).
  */
object BenchScale {

  /** The heavy probe set: graph serving + delta-bounded insert tick,
    * multi-surface ingest/stream mirrors, store CDC composition, the
    * takedown flow, federated search, a quantizer refresh, and the
    * dedup-index stream. Two exclusion classes, both deliberate:
    * q_nn_descent / q_stream_knn read the memoized all-pairs EXACT
    * graph (quadratic by construction at the replica scale — the
    * prewarm would pay minutes for the oracle, not the operator); and
    * the bulk graph-maintenance gates (q_graph_insert,
    * q_cdc_maintain_graph, q_stream_graph_index, q_graph_rewire)
    * deliver corpus-proportional batches that trip insertEdges'
    * maxDelivery delta-contract guard at 10× — correctly: bulk loads
    * are build-from-scratch by contract, so those gates have no
    * defined 10× behavior (the same reason ScaleProbe never probed
    * them; their delta-bounded twins q_graph_serve /
    * q_graph_insert_tick are probed instead).
    */
  private val probe = Seq(
    "q_graph_serve", "q_graph_insert_tick", "q_stream_dedup_index",
    "q_literal_persist", "q_ingest_all", "q_stream_ingest_all",
    "q_cdc_maintain", "q_takedown", "q_search_federate",
    "q_ivfpq_retrain")

  def main(args: Array[String]): Unit = {
    sys.env.get("SPARK_GRAFT_BSCALE_CHILD") match {
      case Some(_) => child()
      case None => parent()
    }
  }

  private def session(cpus: Int): SparkSession = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "4000000")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_local"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def parent(): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val big = Gate.tmpDir("benchscale_sf_")
    locally {
      val spark = session(8)
      println(s"BSCALE replicating $base x$factor -> $big")
      ScaleProbe.replicate(spark, base, big, factor)
      spark.stop()
    }
    val rows = Seq(32, 8).map(c => c -> runChild(c, big))
    val byGate = probe.filter(g =>
      rows.forall(_._2.contains(g)))
    println("BSCALE_TABLE gate t32 t8 ratio(t8/t32)")
    val entries = byGate.map { g =>
      val t32 = rows.head._2(g)
      val t8 = rows(1)._2(g)
      println(s"BSCALE_ROW $g ${num(t32)} ${num(t8)} ${num(t8 / t32)}")
      s""""$g":{"t32":${num(t32)},"t8":${num(t8)},"ratio":${
        num(t8 / t32)}}"""
    }
    println(s"""{"metric":"core_scaling","factor":$factor,""" +
      s""""queries":${entries.mkString("{", ",", "}")}}""")
  }

  /** Spawn one child JVM pinned to `cpus` cores over the shared replica
    * dir; collect its BSCALE_TIMING rows.
    */
  private def runChild(cpus: Int, dir: String): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cmd = Seq(javaBin) ++ jvmArgs ++
      Seq("-cp", System.getProperty("java.class.path"), "graft.BenchScale")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_BSCALE_CHILD", cpus.toString)
    pb.environment().put("SPARK_GRAFT_BSCALE_DIR", dir)
    sys.env.get("SPARK_GRAFT_ONLY").foreach(
      pb.environment().put("SPARK_GRAFT_ONLY", _))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val acc = scala.collection.mutable.Map[String, Double]()
    val out = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    var line = out.readLine()
    while (line != null) {
      if (line.startsWith("BSCALE_TIMING ")) {
        val parts = line.trim.split("\\s+")
        scala.util.Try(acc.put(parts(1), parts(2).toDouble))
        println(s"[c$cpus] $line")
      } else if (line.contains("BSCALE") && line.contains("FAILED"))
        println(s"[c$cpus] $line")
      line = out.readLine()
    }
    p.waitFor()
    acc.toMap
  }

  private def child(): Unit = {
    val cpus = sys.env("SPARK_GRAFT_BSCALE_CHILD").toInt
    val dir = sys.env("SPARK_GRAFT_BSCALE_DIR")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val spark = session(cpus)
    spark.read.parquet(s"$dir/region.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()
    val gates = Gate.all.filter(g => probe.contains(g.name))
      .filter(g => only.forall(_.exists(g.name.contains)))
      .sortBy(g => probe.indexOf(g.name))
    gates.foreach { g =>
      // untimed first run: fixture memos (shared seeds, copied indexes)
      // build here, the Bench prewarm discipline
      val staged = Gate.currentStaging()
      try { g.fn(spark, dir).count(); () }
      catch { case e: Throwable =>
        System.err.println(s"BSCALE WARM FAILED ${g.name}: $e") }
      spark.catalog.clearCache()
      Gate.sweepNewStaging(staged)
      System.gc()
      val t0 = System.nanoTime()
      val ok = try { g.fn(spark, dir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"BSCALE GATE FAILED ${g.name}: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Gate.sweepNewStaging(staged)
      System.gc()
      if (ok) println(s"BSCALE_TIMING ${g.name} ${num(dt)}")
    }
    spark.stop()
  }
}
