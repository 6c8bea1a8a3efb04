package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-level invariants (no SparkSession needed): the driver's
  * correctness gate hash-compares every query against DuckDB, so a gate
  * without an oracle silently downgrades to a rows-only check — this spec
  * makes that a test failure instead.
  */
class GateRegistrySpec extends AnyFunSuite {

  test("gate names are unique") {
    val names = Gate.all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicates: ${names.diff(names.distinct).distinct}")
  }

  test("every gate carries a DuckDB oracle") {
    val missing = Gate.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"gates without oracle: $missing")
  }

  test("oracle SQL never references the staging views only Spark sees") {
    // oracles run in DuckDB over the raw parquet tables; a Spark-side
    // temp-view name leaking into one would fail only at driver time
    val views = Seq("lineitem_v", "lineitem_gs", "embeddings_v", "gate_bkt_")
    val bad = Gate.all
      .filter(g => g.oracle.exists(o => views.exists(o.contains)))
      .map(_.name)
    assert(bad.isEmpty, s"oracles referencing Spark temp views: $bad")
  }

  test("every bench headline name is a live gate") {
    val names = Gate.all.map(_.name).toSet
    val dead = Bench.headline.filterNot(names)
    assert(dead.isEmpty, s"headline entries with no gate: $dead")
  }

  test("every headline-trimmed tracked name is a live gate, disjoint " +
    "from the headline") {
    val names = Gate.all.map(_.name).toSet
    val dead = Bench.trimmedTracked.filterNot(names)
    assert(dead.isEmpty, s"trimmedTracked entries with no gate: $dead")
    // a name back in the headline must leave the trimmed list — two
    // overlapping pins would let a later trim silently drop one
    val both = Bench.trimmedTracked.intersect(Bench.headline)
    assert(both.isEmpty, s"pinned in both headline and trimmedTracked: $both")
  }

  test("every bench heavy name is a live gate") {
    val names = Gate.all.map(_.name).toSet
    val dead = Bench.heavy.filterNot(names)
    assert(dead.isEmpty, s"heavy entries with no gate: $dead")
  }

  test("every isolated-mode name is a live gate that SPARK_GRAFT_ONLY " +
    "resolves to exactly one gate") {
    val names = Gate.all.map(_.name)
    Bench.isolatedSet.foreach { n =>
      // the child is launched with ONLY=<n>; an exact gate name matches
      // only itself (exact-match-wins filter semantics), so the only
      // requirement is that the name IS a live gate
      val matched =
        if (names.contains(n)) Seq(n) else names.filter(_.contains(n))
      assert(matched == Seq(n), s"$n matches $matched")
    }
  }

  test("SparkEntry exposes exactly the gate registry") {
    assert(SparkEntry.queries.keySet == Gate.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet ==
      Gate.all.filter(_.oracle.isDefined).map(_.name).toSet)
  }
}
