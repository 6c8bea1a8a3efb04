package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Gate, Tables}
import graft.ext.IvfIndex
import graft.operators.SkewJoin

/** Scale-technique gates: the ad-hoc SQL surface (reference entry point 3,
  * SURVEY §3.3) including the registered `graft_dot` extension function,
  * skew-salted joins (result must equal the plain join — which is exactly
  * what the oracle checks), and the IVF ANN variant.
  */
object ScaleQueries {

  // §3.3 — spark.sql over registered views (TPC-H Q1 shape).
  private def sqlSurface(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM lineitem_v
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  private val sqlSurfaceSql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // Custom expression through plain SQL (GraftExtensions registration).
  private def sqlDot(s: SparkSession, d: String): DataFrame = {
    Tables.embeddings(s, d).createOrReplaceTempView("embeddings_v")
    s.sql(
      """SELECT vec_id,
        |       graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                 CAST(embedding AS ARRAY<DOUBLE>)) AS nrm
        |FROM embeddings_v ORDER BY vec_id""".stripMargin)
  }

  private val sqlDotSql =
    """SELECT vec_id,
      |       list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nrm
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // Salted join: must produce exactly the plain-join aggregate.
  private def saltedJoin(s: SparkSession, d: String): DataFrame =
    SkewJoin.saltedJoin(
      Tables.lineitem(s, d),
      Tables.orders(s, d).withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), salts = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("total_qty"))
      .orderBy("o_orderpriority")

  private val saltedJoinSql =
    """SELECT o_orderpriority, count(*) AS n_items,
      |       round(sum(l_quantity), 2) AS total_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // IVF ANN (rows-only: KMeans cells have no SQL twin).
  private def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val model = IvfIndex.build(Tables.embeddings(s, d), k = 16)
    IvfIndex.search(model, col("vec_id") < 10, k = 5, nProbe = 4)
      .orderBy("query_id", "rank")
  }

  def gates: Seq[Gate] = Seq(
    Gate("q_sql_surface", sqlSurface, Some(sqlSurfaceSql)),
    Gate("q_sql_dot", sqlDot, Some(sqlDotSql)),
    Gate("q_salted_join", saltedJoin, Some(saltedJoinSql)),
    Gate("q_ivf_topk", ivfTopK, None),
  )
}
