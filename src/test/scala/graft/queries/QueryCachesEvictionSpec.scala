package graft.queries

import graft.SparkSpec

/** Bounded memo lifetime (r11 verdict #2): evictStale releases exactly the
  * memos no query touched within the age bound, touched memos survive, and
  * an evicted memo transparently rebuilds (accumulating shared-build time)
  * on next use. */
class QueryCachesEvictionSpec extends SparkSpec {

  test("evictStale releases stale memos, keeps touched ones, rebuilds on demand") {
    QueryCaches.clear()
    import spark.implicits._
    var builds = 0
    def memoA() = QueryCaches.memo(spark, "/tmp/evict_sf", "evict_a") {
      builds += 1; Seq(1, 2, 3).toDF("x")
    }
    def memoB() = QueryCaches.memo(spark, "/tmp/evict_sf", "evict_b") {
      Seq(4).toDF("y")
    }
    val a0 = memoA()
    memoB()
    assert(builds == 1)
    // age both past the bound, but keep touching B
    for (_ <- 1 to 6) { QueryCaches.tick(); memoB() }
    val released = QueryCaches.evictStale(maxAge = 5)
    assert(released == Seq("evict_a"), s"expected only evict_a, got $released")
    // A rebuilds (new instance, same values); B survived (same instance)
    val a1 = memoA()
    assert(builds == 2 && !(a1 eq a0))
    assert(a1.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(memoB() eq memoB())
    // the rebuild landed in the shared-build ledger alongside the first
    assert(QueryCaches.sharedBuilds.keys.exists(_.startsWith("evict_a@")))
    QueryCaches.clear()
  }
}
