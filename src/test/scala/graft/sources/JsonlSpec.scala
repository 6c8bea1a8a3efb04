package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.SparkSpec

/** The two JSONL read postures: permissive quarantines malformed lines
  * as rows (null data columns, raw line captured whole); strict fails
  * the read on the first one.
  */
class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema =
    new StructType().add("id", LongType).add("text", StringType)

  private def stage(lines: Seq[String]): String = {
    val dir = tmpDir("jsonl_src")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n") + "\n")
    dir
  }

  test("permissive read parses good lines and quarantines bad ones whole") {
    val dir = stage(Seq(
      """{"id":1,"text":"alpha \"quoted\" bravo"}""",
      """{"id":2,"text":"charlie"}""",
      """{broken""",
      """{"id":"not-a-long","text":"delta"}""",
    ))
    val rows = Jsonl.read(spark, schema)(dir).collect()
    assert(rows.length == 4)
    val good = rows.filter(_.getAs[String]("_corrupt") == null)
    assert(good.map(_.getAs[Long]("id")).toSet == Set(1L, 2L))
    // escaping round-trips: the parsed text is the UNESCAPED original
    assert(good.find(_.getAs[Long]("id") == 1L).get
      .getAs[String]("text") == "alpha \"quoted\" bravo")
    val bad = rows.filter(_.getAs[String]("_corrupt") != null)
    assert(bad.map(_.getAs[String]("_corrupt")).toSet ==
      Set("{broken", """{"id":"not-a-long","text":"delta"}"""))
    assert(bad.forall(r => r.isNullAt(r.fieldIndex("id"))),
      "corrupt rows must not leak partial values into data columns")
  }

  test("strict read fails the delivery on the first malformed line") {
    val dir = stage(Seq("""{"id":1,"text":"ok"}""", "{nope"))
    assertThrows[org.apache.spark.SparkException] {
      Jsonl.strict(spark, schema)(dir).collect()
    }
    // and a clean delivery passes strict
    val clean = stage(Seq("""{"id":1,"text":"ok"}"""))
    assert(Jsonl.strict(spark, schema)(clean).count() == 1)
  }
}
