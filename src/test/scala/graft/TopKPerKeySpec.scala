package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerKey

class TopKPerKeySpec extends AnyFunSuite {
  import SparkTestSession._

  private def windowReference(k: Int) = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  test("matches the window-based top-k exactly, including ranks") {
    val k = 3
    val custom = TopKPerKey(
      Tables.orders(spark, sf)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
      keys = Seq("o_orderpriority"),
      orderBy = Seq(("o_totalprice", false), ("o_orderkey", true)),
      k = k)
    val got = custom.collect().map(_.toString).sorted.toSeq
    val want = windowReference(k).collect().map(_.toString).sorted.toSeq
    assert(got == want)
  }

  test("shuffles only the partial winners (plan shape)") {
    val df = TopKPerKey(
      Tables.orders(spark, sf).select(col("o_orderpriority"), col("o_orderkey")),
      keys = Seq("o_orderpriority"), orderBy = Seq(("o_orderkey", true)), k = 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopK"), s"no partial stage in:\n$plan")
    assert(plan.contains("FinalTopK"), s"no final stage in:\n$plan")
    // exactly one exchange, between partial and final
    assert("Exchange".r.findAllIn(plan).size >= 1)
  }

  test("k larger than group size returns whole groups ranked") {
    val df = TopKPerKey(
      Tables.region(spark, sf).select(col("r_regionkey"), col("r_name")),
      keys = Seq("r_regionkey"), orderBy = Seq(("r_name", true)), k = 10)
    assert(df.count() == Tables.region(spark, sf).count())
    assert(df.filter("rnk != 1").count() == 0)
  }

  test("high-cardinality keys run in bounded memory via partial flushes") {
    import spark.implicits._
    // > FlushKeys (2^17) distinct keys forced into ONE input partition,
    // so the partial phase must flush mid-stream; final streams sorted
    // groups — no per-key map anywhere
    val n = 300000L
    val df = spark.range(2 * n).select(
      (col("id") % n).as("k"), col("id").as("v")).repartition(1)
    val top = TopKPerKey(df, keys = Seq("k"), orderBy = Seq(("v", true)), k = 1)
    assert(top.count() == n)
    // min per key is the id < n copy itself
    val sample = top.filter(col("k") === 12345L).collect()
    assert(sample.length == 1 && sample.head.getAs[Long]("v") == 12345L
      && sample.head.getAs[Int]("rnk") == 1)
    assert(top.filter("v != k").count() == 0, "flush-path results wrong")
  }

  test("duplicate rows across flush windows still rank correctly") {
    import spark.implicits._
    // every key's rows straddle flush boundaries (interleaved layout)
    val df = spark.range(400000).select(
      (col("id") % 200000).as("k"), (col("id") / 200000).as("v")).repartition(1)
    val top = TopKPerKey(df, keys = Seq("k"), orderBy = Seq(("v", false)), k = 2)
    assert(top.count() == 400000)
    assert(top.filter("rnk > 2").count() == 0)
  }

  test("float keys group 0.0 with -0.0 (normalized like Spark aggregates)") {
    import spark.implicits._
    val df = Seq((0.0, 1L), (-0.0, 2L), (1.5, 3L)).toDF("k", "v")
    val top = TopKPerKey(df, keys = Seq("k"), orderBy = Seq(("v", true)), k = 10)
    // 0.0 and -0.0 are ONE group: ranks 1..2 in it, plus one for 1.5
    assert(top.count() == 3)
    val zeroGroup = top.filter(col("k") === 0.0).collect()
    assert(zeroGroup.map(_.getAs[Int]("rnk")).sorted.toSeq == Seq(1, 2),
      s"0.0/-0.0 split into separate groups: ${zeroGroup.toSeq}")
  }

  test("composes with downstream operators (filter + sort + agg)") {
    val df = TopKPerKey(
      Tables.orders(spark, sf)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
      keys = Seq("o_orderpriority"),
      orderBy = Seq(("o_totalprice", false), ("o_orderkey", true)), k = 5)
      .filter(col("rnk") <= 2)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(df.collect().forall(_.getLong(1) == 2))
  }
}
