package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: a plain session (deliberately WITHOUT
  * the nanosAsLong builder config — Tables.events must set it at runtime)
  * running SparkEntry.entry, expecting rows > 0.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5)
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
