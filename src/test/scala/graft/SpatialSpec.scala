package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SpatialSpec extends AnyFunSuite {
  import SparkTestSession._

  for ((name, fn) <- queries.Spatial.defs) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0)
    }
  }

  test("q_cone_search distances are within the radius") {
    val df = queries.Spatial.qConeSearch(spark, sf)
    assert(df.filter("dist_r6 >= 25.0 OR dist_r6 < 0").count() == 0)
  }

  test("q_zone_xmatch plan has no cartesian or nested-loop join") {
    val plan = queries.Spatial.qZoneXmatch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian product in plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in plan")
  }

  test("q_zone_xmatch pairs are canonical (k1 < k2) and unique") {
    val df = queries.Spatial.qZoneXmatch(spark, sf)
    assert(df.filter("k1 >= k2").count() == 0)
    assert(df.count() == df.select("k1", "k2").distinct().count())
  }

  test("q_spatial_density counts sum to the full catalog") {
    val df = queries.Spatial.qSpatialDensity(spark, sf)
    val total = df.agg(sum("n")).head.getLong(0)
    assert(total == Tables.customer(spark, sf).count())
  }
}
