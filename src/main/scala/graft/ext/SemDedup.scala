package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication in embedding space — the SemDeDup recipe
  * (Abbas, Tirumala, Simig, Ganguli, Morcos, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication", 2023,
  * arXiv:2303.09540): cluster the corpus with a coarse quantizer, then
  * look for near-duplicate pairs ONLY within each cluster — all-pairs
  * cosine over N documents becomes k independent all-pairs problems of
  * size N/k, which is what makes semantic dedup tractable at web scale.
  *
  * Scale shape: assignment is a map-side expression against broadcast
  * seed literals (one corpus scan, no shuffle); the pair search shuffles
  * once on the cluster id and each cluster's pairs are computed locally.
  * At 100 TB you raise k with the corpus (SemDeDup uses ~100k clusters
  * for LAION-scale data) so per-cluster membership stays bounded — the
  * per-cluster work is quadratic, so k is the knob that caps it; a
  * pathologically hot cluster is handled like any skewed join key
  * (salt the cluster id into sub-blocks, or cap membership by sampling).
  *
  * The keeper rule here is deterministic lowest-id-wins: a vector is a
  * duplicate iff some lower-id vector in its cluster is within `tau`
  * cosine. (The paper keeps the member with the LOWEST centroid
  * similarity to bias kept data away from cluster centers; pass that
  * ordering as `rank` if wanted — the keeper rule is an ORDER BY, not a
  * different algorithm.)
  */
object SemDedup {

  /** Driver-collected seed vectors `(seed_id, unit-direction)` taken from
    * designated corpus rows — the deterministic quantizer used by the
    * oracle-checked gate. A production build swaps in k-means centroids
    * (e.g. [[IvfIndex]]'s) without touching [[assign]]/[[mark]]; seeds
    * are a few k×d doubles either way, broadcast as literals.
    */
  def seedsFromCorpus(embs: DataFrame, seedPred: Column): Seq[(Long, Seq[Double])] =
    EmbeddingSearch.prepared(embs).filter(seedPred)
      .select(col("vec_id"), col("v"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq

  /** Max-cosine seed assignment (first-max on ties → lowest seed id,
    * deterministic): adds `cluster` to the prepared corpus. One scan,
    * no shuffle — the seed matrix rides inside the expression.
    */
  def assign(embs: DataFrame, seeds: Seq[(Long, Seq[Double])]): DataFrame = {
    require(seeds.nonEmpty, "no seed vectors")
    val e = EmbeddingSearch.prepared(embs)
    val cosArr = array(seeds.map { case (_, sv) =>
      val svLit = array(sv.map(lit): _*)
      val snrm = sv.map(x => x * x).sum
      EmbeddingSearch.dot(col("v"), svLit) / sqrt(col("nrm") * lit(snrm))
    }: _*)
    val seedIds = typedLit(seeds.map(_._1))
    e.withColumn("cluster",
      element_at(seedIds,
        array_position(cosArr, array_max(cosArr)).cast("int")))
  }

  /** Within-cluster near-duplicate marking over an [[assign]]ed corpus:
    * `is_dup(b) ⇔ ∃ a in b's cluster with vec_id < b.vec_id and
    * cos(a,b) ≥ tau`. One shuffle on `cluster`; pairs never leave their
    * partition.
    *
    * `maxClusterSize` is the operator-enforced skew guard: when a
    * cluster exceeds it, only its `maxClusterSize` LOWEST-id members
    * serve as probe targets (the deterministic representative prefix),
    * bounding per-task pair counts at |cluster| × cap instead of
    * |cluster|² — a hot cluster degrades to linear instead of stalling
    * the stage. Exact whenever every cluster fits the cap (the prefix
    * is then the whole cluster); past the cap it under-marks pairs both
    * of whose members sit outside the prefix — raise k (more, smaller
    * clusters) to shrink clusters back under the cap rather than
    * leaning on the guard.
    */
  def mark(assigned: DataFrame, tau: Double,
      maxClusterSize: Int = Int.MaxValue): DataFrame = {
    val slim = assigned.select("vec_id", "cluster", "v", "nrm")
    val probes =
      if (maxClusterSize == Int.MaxValue) slim
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cluster").orderBy("vec_id")
        slim.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= maxClusterSize).drop("rnk")
      }
    val dups = probes.as("a").join(slim.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(EmbeddingSearch.dot(col("a.v"), col("b.v")) /
        sqrt(col("a.nrm") * col("b.nrm")) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    slim.select("vec_id", "cluster")
      .join(dups, Seq("vec_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
  }

  /** The full pipeline: seed, assign, mark. Output is one row per
    * corpus vector: (vec_id, cluster, is_dup) — downstream keeps
    * `!is_dup`.
    */
  def dedup(embs: DataFrame, seedPred: Column, tau: Double): DataFrame =
    mark(assign(embs, seedsFromCorpus(embs, seedPred)), tau)
}
