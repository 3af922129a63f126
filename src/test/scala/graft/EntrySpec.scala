package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  import SparkTestBase._

  test("driver entry: flagship round trip returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSeq === Seq("yr", "n_orders", "total"))
  }

  test("driver contract: every oracle key has a query; headliners exist") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    assert(Bench.headline.forall(qs.contains))
    // count only ratchets up — a drop means gates silently vanished (r9)
    assert(qs.size >= 231, s"gate count shrank: ${qs.size}")
    // every catalog query is oracled — no rows-only checks left
    assert(SparkEntry.oracleSql.keySet === qs.keySet)
  }
}
