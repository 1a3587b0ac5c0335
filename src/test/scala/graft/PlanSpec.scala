package graft

import graft.pipeline.SynthGeo
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the declarative paths must keep Catalyst's
  * optimizations — predicate pushdown into the parquet scan, broadcast
  * joins for dimensions, whole-stage codegen spans.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark
  val dir = "/root/testdata/sf0.001"

  test("filters and column pruning reach the parquet scan") {
    val df = SynthGeo.table(spark, dir, "lineitem")
      .filter(col("l_quantity") > 30.0)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      plan)
  }

  test("dimension join broadcasts the small side") {
    val o = SynthGeo.table(spark, dir, "orders")
    val n = SynthGeo.table(spark, dir, "nation")
    val joined = o.join(broadcast(n), o("o_custkey") % 25 === n("n_nationkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("point derivation stays in one codegen stage over the scan") {
    val pts = SynthGeo.customerPoints(spark, dir)
      .withColumn("cell", graft.core.Tiling.cellIdCol(col("x"), col("y"), 4.0))
    val plan = pts.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // single WSCG stage incl. project
    assert(!plan.contains("Exchange"), plan) // no shuffle for a projection
  }
}
