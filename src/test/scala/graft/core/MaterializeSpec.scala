package graft.core

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Block-level evidence for the scoped-release machinery: `releasing`
  * materializes via checkpoint and frees internal caches; `release`
  * actually unpersists a checkpoint-backed frame's blocks (the case
  * `Dataset.unpersist` cannot reach — checkpoint blocks never enter the
  * CacheManager), which is what keeps iterative builders (connected
  * components) from pooling O(rounds) block sets.
  */
class MaterializeSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  private def persistentRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("releasing materializes the result and unpersists internals") {
    import spark.implicits._
    val internal = (1L to 1000L).toDF("x").cache()
    internal.count()
    assert(!spark.sharedState.cacheManager.isEmpty)
    val out = Materialize.releasing(
      internal.groupBy(($"x" % 10).as("k")).count(), Seq(internal))
    assert(out.count() == 10L)
    assert(spark.sharedState.cacheManager.isEmpty,
      "internal cache must be gone after releasing")
  }

  test("release frees a checkpoint-backed frame's storage blocks") {
    import spark.implicits._
    val before = persistentRddIds
    val mat = Materialize.releasing((1L to 5000L).toDF("x"), Nil)
    mat.count()
    val added = persistentRddIds -- before
    assert(added.nonEmpty, "localCheckpoint should register a persisted RDD")
    // Dataset.unpersist is the WRONG tool here — checkpoint blocks are
    // not CacheManager entries, so it must leave them registered
    mat.unpersist(blocking = true)
    assert((persistentRddIds -- before) == added,
      "Dataset.unpersist must not reach checkpoint blocks (the bug class)")
    Materialize.release(mat)
    // unpersist(blocking=false) is async on the block manager; the
    // registry update itself is synchronous
    assert((persistentRddIds -- before).isEmpty,
      "release must unpersist the LogicalRDD's own RDD")
  }

  test("release is a no-op on non-checkpoint frames") {
    import spark.implicits._
    val before = persistentRddIds
    val plain = (1L to 100L).toDF("x").filter($"x" > 10)
    Materialize.release(plain) // must not throw, must not unpersist anything
    assert(persistentRddIds == before)
    assert(plain.count() == 90L)
  }
}
