package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The kNN GRAPH as a persisted, maintainable, searchable index — the
  * DiskANN-shape vector-search surface completing the graph family:
  * [[EmbeddingSearch.nnDescent]] builds it, warm-start descent
  * maintains it, [[EmbeddingSearch.graphSearch]] serves queries from
  * it, and the whole lifecycle rides the shared [[IndexStore]]
  * manifest protocol (immutable segments, atomic publish, scoped
  * tombstones, compaction, GC leases, time travel) like every other
  * index family here.
  *
  * Layout: `vectors` (vec_id, embedding) and `edges` (vec_id,
  * neighbor_id, cos, rank, gen — node vec_id's top-k as of commit
  * generation `gen`), plus a one-row `meta` (k). A node DELETE is one
  * scoped tombstone masking the id's rows in both relations — the
  * family-standard path. A maintenance REWIRE never tombstones:
  * rewired nodes' new edge sets land with a HIGHER `gen` (commit
  * versions are strictly monotone under the writer lock) and reads
  * resolve each node to its max-gen edge set — last-writer-wins
  * carried IN the rows, because tombstone scopes mask whole segments
  * and a segment holds both relations: masking a rewired node's old
  * edges would have masked its still-live vector too. Superseded edge
  * rows cost storage, not correctness, until [[compact]] drops them —
  * so maintenance publishes exactly the delta (the delivery's vectors
  * + the changed nodes' new edge sets), never a graph rewrite.
  *
  * 100 TB shape: the steady-state maintenance tick is [[insert]] —
  * insert-by-search, compute ∝ |delivery| × walk + |delivery|² +
  * |delivery| × k scorings, CORPUS-INDEPENDENT given the graph — with
  * [[rewire]]/[[append]]'s warm NN-Descent (n·k² per round,
  * corpus-linear) demoted to the periodic background quality pass that
  * restores the neighborhoods insertion never revisits. Published
  * bytes are delta-bounded on both paths: deliveries plus changed
  * neighborhoods. Deletes are metadata-bounded tombstones; edges
  * POINTING AT deleted nodes stay until [[compact]] scrubs them
  * (searches drop them naturally — a candidate with no live vector
  * scores nothing — at a bounded recall cost, the standard graph-index
  * posture).
  */
object KnnGraphIndex {

  private def asGraph(edges: DataFrame): DataFrame =
    edges.select(col("vec_id").as("query_id"), col("neighbor_id"),
      col("cos"), col("rank"))

  private def asStored(graph: DataFrame, gen: Long): DataFrame =
    graph.select(col("query_id").as("vec_id"), col("neighbor_id"),
      col("cos"), col("rank"), lit(gen).as("gen"))

  /** Commit `seg` and ENFORCE the invariant the max-gen edge read
    * depends on: rows were stamped `gen = snap.version + 1`, so the
    * publish must actually land as that version — commits are strictly
    * sequential under the writer lock, but if the manifest's versioning
    * discipline ever changed, two commits stamping one gen would make
    * the (vec_id, gen) read return duplicate merged edge sets. Assumed
    * silently before; asserted now.
    */
  private def publishStamped(spark: SparkSession, path: String,
      seg: String, relations: Seq[String],
      snap: IndexStore.Snapshot): Long = {
    val v = IndexStore.publishAppend(spark, path, seg, relations)
    require(v == snap.version + 1,
      s"graph commit landed as version $v but its edge rows are " +
        s"stamped gen ${snap.version + 1} — manifest versioning broke " +
        s"the monotone-gen invariant under $path")
    v
  }

  private def readK(snap: IndexStore.Snapshot): Int =
    IndexStore.cachedMeta(snap) {
      snap.read("meta").getOrElse(
        sys.error(s"no meta relation under ${snap.root}"))
        .head().getAs[Int]("k")
    }

  def liveVectors(snap: IndexStore.Snapshot): DataFrame =
    IndexStore.liveRows(snap, "vectors", key = "vec_id")

  /** The current graph: delete tombstones apply (scoped, via the
    * shared [[IndexStore.liveRows]]), then each node resolves to its
    * MAX-GEN edge set — one aggregate + equi-join, so the
    * last-writer-wins read costs one extra shuffle over the edges,
    * never a window.
    */
  def liveEdges(snap: IndexStore.Snapshot): DataFrame = {
    val rows = IndexStore.liveRows(snap, "edges", key = "vec_id")
    val latest = rows.groupBy("vec_id").agg(max("gen").as("gen"))
    rows.join(latest, Seq("vec_id", "gen"))
      .select("vec_id", "neighbor_id", "cos", "rank")
  }

  /** Cold build: full NN-Descent from the id-ring seed, published as
    * version 1. `k` is the stored INTERNAL degree — search quality
    * rises with it; rank-truncate at read time if a consumer wants a
    * thinner graph.
    */
  def build(embs: DataFrame, path: String, k: Int = 32,
      iters: Int = 5): Long = {
    val spark = embs.sparkSession
    import spark.implicits._
    val graph = EmbeddingSearch.nnDescent(embs, k, iters)
    IndexStore.withLock(spark, path) {
      val seg = IndexStore.newSegmentName()
      Seq(k).toDF("k").coalesce(1).write.parquet(s"$path/$seg/meta")
      embs.select(col("vec_id"), col("embedding"))
        .write.parquet(s"$path/$seg/vectors")
      asStored(graph, gen = 1L).write.parquet(s"$path/$seg/edges")
      IndexStore.publishReplace(spark, path, seg,
        Seq("meta", "vectors", "edges"), op = "build")
    }
  }

  /** Admit a delivery by WARM-START descent seeded with the current
    * live edges — the DESCENT-QUALITY admission: every node's
    * neighborhood re-converges, at n·k²·warmIters corpus-linear cost
    * per call. The steady-state feed path is [[insert]] (delta-bounded
    * insert-by-search); use this when a delivery should double as a
    * full quality pass. Live-presence idempotent: already-admitted ids
    * drop out, an empty delta publishes nothing. The commit carries
    * the delivery's vectors plus the full new edge sets of every node
    * whose neighborhood CHANGED, stamped `gen = version + 1` so reads
    * supersede those nodes' older rows. Live edges after the commit ≡
    * the descent's output graph, row for row.
    */
  def append(spark: SparkSession, path: String, newEmbs: DataFrame,
      warmIters: Int = 2): Long =
    IndexStore.withLock(spark, path) {
      val snap = IndexStore.snapshot(spark, path)
      val k = readK(snap)
      val oldVec = liveVectors(snap)
      val delivery = newEmbs.select(col("vec_id"), col("embedding"))
        .join(oldVec.select("vec_id"), Seq("vec_id"), "left_anti")
        .persist()
      try {
        if (delivery.isEmpty) snap.version
        else {
          val oldEdges = liveEdges(snap).localCheckpoint(true)
          val corpus = oldVec.select("vec_id", "embedding")
            .unionByName(delivery)
          val stored = asStored(EmbeddingSearch.nnDescentFrom(corpus,
              Some(asGraph(oldEdges)), k, warmIters),
              gen = snap.version + 1)
            .localCheckpoint(true)
          // a node is rewired iff its (neighbor, rank) set changed in
          // either direction — deterministic recompute makes unchanged
          // neighborhoods byte-identical, so the symmetric difference
          // is exactly the delta
          val changed = changedNodes(stored, oldEdges)
          val seg = IndexStore.newSegmentName()
          delivery.write.parquet(s"$path/$seg/vectors")
          stored.join(changed, Seq("vec_id"), "left_semi")
            .write.parquet(s"$path/$seg/edges")
          publishStamped(spark, path, seg, Seq("vectors", "edges"), snap)
        }
      } finally { delivery.unpersist(); () }
    }

  /** The DELTA-BOUNDED maintenance tick — insert-by-search (the
    * HNSW/DiskANN insertion shape, [[EmbeddingSearch.insertEdges]]):
    * each delivered vector beam-searches the LIVE graph for its
    * neighborhood, wires its top-k edges from the walk's visited state
    * plus exact intra-delivery pairs, and merges back-links into only
    * the touched old nodes' edge lists. Compute is
    * |delivery| × walk + |delivery|² + |delivery| × k scorings —
    * CORPUS-INDEPENDENT given the graph, where [[append]]'s warm
    * NN-Descent re-scores every node's neighbor-of-neighbor candidates
    * (n·k² per round) even for a one-vector delivery. This is the
    * steady-state feed path; [[rewire]] remains the periodic
    * full-quality descent pass (insertion never revisits an old node
    * nobody linked to). Publish discipline matches [[append]]: the
    * delivery's vectors plus the CHANGED nodes' new edge sets under a
    * fresh gen; live-presence idempotent, empty delta publishes
    * nothing.
    */
  def insert(spark: SparkSession, path: String, newEmbs: DataFrame,
      beamWidth: Int = 16, hops: Int = 4, entryPoints: Int = 16): Long =
    IndexStore.withLock(spark, path) {
      val snap = IndexStore.snapshot(spark, path)
      val k = readK(snap)
      val oldVec = liveVectors(snap)
      val delivery = newEmbs.select(col("vec_id"), col("embedding"))
        .join(oldVec.select("vec_id"), Seq("vec_id"), "left_anti")
        .persist()
      try {
        if (delivery.isEmpty) snap.version
        else {
          val oldEdges = liveEdges(snap).localCheckpoint(true)
          val (newEdges, mergedTouched) = EmbeddingSearch.insertEdges(
            oldVec, asGraph(oldEdges), delivery, k, beamWidth, hops,
            entryPoints)
          // diff within the touched set only (delta × k rows a side) —
          // never a corpus-wide symmetric difference
          val touched = mergedTouched.select(col("query_id").as("vec_id"))
            .distinct()
          val oldTouched = oldEdges.join(broadcast(touched),
            Seq("vec_id"), "left_semi")
          val gen = snap.version + 1
          val changed = changedNodes(asStored(mergedTouched, gen),
            oldTouched)
          val seg = IndexStore.newSegmentName()
          delivery.write.parquet(s"$path/$seg/vectors")
          asStored(newEdges, gen)
            .unionByName(asStored(mergedTouched, gen)
              .join(changed, Seq("vec_id"), "left_semi"))
            .write.parquet(s"$path/$seg/edges")
          publishStamped(spark, path, seg, Seq("vectors", "edges"), snap)
        }
      } finally { delivery.unpersist(); () }
    }

  /** Nodes whose (neighbor, rank) set differs between the new and old
    * graphs, in either direction — deterministic recompute makes
    * unchanged neighborhoods byte-identical, so the symmetric
    * difference is exactly the publish delta.
    */
  private def changedNodes(stored: DataFrame,
      oldEdges: DataFrame): DataFrame = {
    val keyCols = Seq("vec_id", "neighbor_id", "rank")
    stored.select(keyCols.map(col): _*)
      .join(oldEdges.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(oldEdges.select(keyCols.map(col): _*)
        .join(stored.select(keyCols.map(col): _*), keyCols, "left_anti"))
      .select("vec_id").distinct()
  }

  /** RE-WIRE maintenance: warm descent rounds over the live corpus
    * with no delivery — restores node degrees after deletes and
    * compaction scrubbed dangling references ([[compact]] is
    * layout-only by contract, so degrees stay < k until someone
    * re-wires) and generally tightens neighborhoods. Publishes only
    * the changed nodes' new edge sets under a fresh gen (the
    * [[append]] delta discipline); an unchanged graph publishes
    * nothing.
    */
  def rewire(spark: SparkSession, path: String, iters: Int = 1): Long =
    IndexStore.withLock(spark, path) {
      val snap = IndexStore.snapshot(spark, path)
      val k = readK(snap)
      val corpus = liveVectors(snap).select("vec_id", "embedding")
      val oldEdges = liveEdges(snap).localCheckpoint(true)
      val stored = asStored(EmbeddingSearch.nnDescentFrom(corpus,
          Some(asGraph(oldEdges)), k, iters), gen = snap.version + 1)
        .localCheckpoint(true)
      val changed = changedNodes(stored, oldEdges)
      if (changed.isEmpty) snap.version
      else {
        val seg = IndexStore.newSegmentName()
        stored.join(changed, Seq("vec_id"), "left_semi")
          .write.parquet(s"$path/$seg/edges")
        publishStamped(spark, path, seg, Seq("edges"), snap)
      }
    }

  /** Retract nodes: one scoped tombstone masks the ids' rows in BOTH
    * relations (vector gone, own edge list gone). Idempotent — only
    * currently-live ids tombstone. Edges of OTHER nodes pointing at
    * the deleted ids stay until [[compact]]; searches drop them via
    * the live-vector score join.
    */
  def deleteVecs(spark: SparkSession, path: String, ids: DataFrame,
      idCol: Column): Unit = IndexStore.withLock(spark, path) {
    val snap = IndexStore.snapshot(spark, path)
    val requested = ids.select(idCol.as("vec_id")).distinct()
    val eff = IndexStore.liveRowsAmong(snap, "vectors", "vec_id",
        requested)
      .select("vec_id")
      .join(broadcast(requested), Seq("vec_id"), "left_semi")
      .distinct()
    if (!eff.isEmpty) {
      val seg = IndexStore.newSegmentName()
      eff.coalesce(1).write.parquet(s"$path/$seg/tombstones")
      IndexStore.writeScope(spark, path, seg,
        (snap.segments("vectors") ++ snap.segments("edges")).distinct)
      IndexStore.publishAppend(spark, path, seg,
        Seq("tombstones", "tombstone_scope"), op = "delete")
      ()
    }
  }

  /** Apply tombstones physically and scrub dangling references: live
    * vectors and live edges rewrite into one segment, edges keep only
    * rows whose NEIGHBOR is still a live vector (the dead references
    * deletes leave behind). Node degrees may drop below k until the
    * next [[append]] re-wires them — compaction is a layout + scrub
    * pass, never a re-train (the family contract).
    */
  def compact(spark: SparkSession, path: String,
      retainVersions: Int = 2): Long =
    IndexStore.withLock(spark, path) {
      val spark0 = spark
      import spark0.implicits._
      val snap = IndexStore.snapshot(spark, path)
      val k = readK(snap)
      val vecs = liveVectors(snap).persist()
      try {
        val edges = liveEdges(snap)
          .join(vecs.select(col("vec_id").as("neighbor_id")),
            Seq("neighbor_id"), "left_semi")
          .select(col("vec_id"), col("neighbor_id"), col("cos"),
            col("rank"), lit(snap.version + 1).as("gen"))
        val seg = IndexStore.newSegmentName()
        Seq(k).toDF("k").coalesce(1).write.parquet(s"$path/$seg/meta")
        vecs.write.parquet(s"$path/$seg/vectors")
        edges.write.parquet(s"$path/$seg/edges")
        val v = IndexStore.publishReplace(spark, path, seg,
          Seq("meta", "vectors", "edges"), retainVersions, op = "compact")
        require(v == snap.version + 1,
          s"graph compact landed as version $v, rows stamped gen " +
            s"${snap.version + 1} under $path")
        v
      } finally { vecs.unpersist(); () }
    }

  def maybeCompact(spark: SparkSession, path: String,
      maxSegments: Int): Boolean = {
    val due = IndexStore.segmentCount(spark, path) > maxSegments
    if (due) compact(spark, path)
    due
  }

  /** Serve external queries by beam descent over the live graph —
    * [[EmbeddingSearch.graphSearch]] with this index's live vectors
    * and edges. Lookup semantics (nothing self-excluded).
    */
  def search(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, beamWidth: Int = 16, hops: Int = 4,
      entryPoints: Int = 16): DataFrame =
    searchSnap(IndexStore.snapshot(spark, path), queries, k,
      beamWidth, hops, entryPoints)

  /** [[search]] against a RETAINED version — the time-travel/lineage
    * reader every family exposes (hold [[IndexStore.withLease]] to
    * pin against GC).
    */
  def searchAt(spark: SparkSession, path: String, version: Long,
      queries: DataFrame, k: Int, beamWidth: Int = 16, hops: Int = 4,
      entryPoints: Int = 16): DataFrame =
    searchSnap(IndexStore.snapshotAt(spark, path, version), queries, k,
      beamWidth, hops, entryPoints)

  private def searchSnap(snap: IndexStore.Snapshot, queries: DataFrame,
      k: Int, beamWidth: Int, hops: Int, entryPoints: Int): DataFrame =
    EmbeddingSearch.graphSearch(liveVectors(snap), asGraph(liveEdges(snap)),
      queries, k, beamWidth, hops, entryPoints)
}
