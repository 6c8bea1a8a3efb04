package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gate query: a Spark implementation plus (when SQL-expressible)
  * a DuckDB oracle statement over the same parquet tables. Keeping the pair
  * side by side is what keeps column names / rounding / ordering in sync —
  * the driver hash-compares values after sorting columns by name.
  */
final case class Gate(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
)

object Gate {
  /** Scratch dir for gate staging I/O (stream inputs, checkpoints, csv
    * round-trips), on tmpfs when available: this host's buffered-write
    * path throttles to ~40 MB/s (direct I/O does 330), and staging
    * through /tmp puts that throttle inside the timed window.
    */
  def tmpDir(prefix: String): String = {
    val shm = new java.io.File("/dev/shm/graft_gates")
    if (new java.io.File("/dev/shm").isDirectory) {
      shm.mkdirs()
      // staging dirs from finished runs would otherwise accumulate on the
      // (size-capped) tmpfs across many verify/bench invocations — sweep
      // anything older than an hour, best-effort
      val cutoff = System.currentTimeMillis() - 3600L * 1000
      Option(shm.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.lastModified() < cutoff)
        .foreach(f => scala.util.Try {
          import scala.reflect.io.Directory
          new Directory(f).deleteRecursively()
        })
      java.nio.file.Files.createTempDirectory(shm.toPath, prefix).toString
    } else java.nio.file.Files.createTempDirectory(prefix).toString
  }

  /** Registry assembled from the per-module gate lists. */
  def all: Seq[Gate] =
    queries.CoreQueries.gates ++
      queries.IngestQueries.gates ++
      queries.ExtQueries.gates ++
      queries.DataOpsQueries.gates ++
      queries.AnalyticsQueries.gates ++
      queries.ScaleQueries.gates
}
