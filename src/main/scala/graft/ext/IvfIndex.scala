package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
  * quantizer partitions the corpus into cells; a query scores only the
  * `nProbe` cells whose centroids are nearest, instead of the full corpus.
  *
  * Scale shape: the assignment is one ML pass (trainable on a sample);
  * the assigned corpus is written partitioned/clustered by cell so a
  * search is `nProbe` co-located partition reads plus a per-query top-k —
  * corpus/cells × nProbe rows scored per query. Complements the
  * hyperplane-LSH variant in [[EmbeddingSearch]] (IVF adapts to the data
  * distribution; LSH is oblivious and build-free).
  */
object IvfIndex {

  final case class Model(centroids: DataFrame, assigned: DataFrame)

  /** Fit the coarse quantizer and assign every vector to a cell.
    * `assigned`: (vec_id, v: array<double>, nrm, cell); `centroids`:
    * (cell, cv: array<double>).
    */
  def build(embs: DataFrame, k: Int, seed: Long = 42L,
      sampleFraction: Double = 1.0, maxIter: Int = 10): Model = {
    val prepared = EmbeddingSearch.prepared(embs)
      .withColumn("features", array_to_vector(col("v")))
    val trainSet =
      if (sampleFraction < 1.0) prepared.sample(sampleFraction, seed)
      else prepared
    // a coarse quantizer only has to be roughly balanced — capping the
    // iterations halves index-build time with no recall change worth the
    // name (re-measured per change; the gate pins the recall floor)
    val kmeans = new KMeans().setK(k).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = kmeans.fit(trainSet)
    val spark = embs.sparkSession
    val centroids = spark.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) })
      .toDF("cell", "cv")
    Model(centroids, model.transform(prepared).drop("features"))
  }

  /** Top-k per query, probing the `nProbe` nearest cells. */
  def search(model: Model, queryPred: Column, k: Int, nProbe: Int): DataFrame = {
    val q = model.assigned.filter(queryPred).select(
      col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    // rank cells per query by centroid distance (centroids are tiny)
    val d2 = EmbeddingSearch.dot(col("qv"), col("qv")) -
      lit(2.0) * EmbeddingSearch.dot(col("qv"), col("cv")) +
      EmbeddingSearch.dot(col("cv"), col("cv"))
    val cellRank = Window.partitionBy("query_id").orderBy(col("d2").asc)
    val probes = q.crossJoin(broadcast(model.centroids))
      .withColumn("d2", d2)
      .withColumn("cell_rank", row_number().over(cellRank))
      .filter(col("cell_rank") <= nProbe)
      .select("query_id", "qv", "qnrm", "cell")
    val scored = model.assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos",
        EmbeddingSearch.dot(col("qv"), col("v")) /
          sqrt(col("qnrm") * col("nrm")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rank"))
  }
}
