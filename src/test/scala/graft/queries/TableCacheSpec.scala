package graft.queries

import graft.SparkSpec

/** The per-session table memo: memoization, session isolation, and
  * dead-session eviction (via the injectable seam — a single local JVM
  * cannot host a stopped SparkContext beside the suite's live one, so
  * the `isStopped` predicate itself is exercised by the Bench/Verify
  * mains, which stop whole sessions between runs). */
class TableCacheSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("table() memoizes per (session, path) and isolates sessions") {
    val a1 = Queries.table(spark, dir, "nation")
    val a2 = Queries.table(spark, dir, "nation")
    assert(a1 eq a2, "same session + path must return the cached plan instance")

    val s2 = spark.newSession()
    val b = Queries.table(s2, dir, "nation")
    assert(!(b eq a1), "a different session must not share cached plans")
  }

  test("entries of a dead session are evicted; live entries survive") {
    val s2 = spark.newSession()
    Queries.table(spark, dir, "region")
    Queries.table(s2, dir, "region")
    val before = Queries.cachedTableCount

    // simulate s2 stopping (reference identity, same rule as the cache key)
    Queries.evictDead(isDead = _ eq s2)
    assert(Queries.cachedTableCount < before, "dead session's entries must drop")

    val a1 = Queries.table(spark, dir, "region")
    Queries.evictDead(isDead = _ eq s2)
    val a2 = Queries.table(spark, dir, "region")
    assert(a1 eq a2, "live session's entries must survive eviction")
  }
}
