package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RankSplit

class RankSplitSpec extends AnyFunSuite {
  import SparkTestSession._

  private def base = Tables.orders(spark, sf).select(
    col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
    round(col("o_totalprice") * 100).cast("long").as("pc"))

  test("histogram-split rank equals row_number over the same total order") {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    val want = base
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"o_orderpriority")))
      .select($"o_orderkey", $"rn", $"n")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSet
    val got = RankSplit.rank(base, Seq("o_orderpriority"), "pc",
      Seq("o_totalprice", "o_orderkey"))
      .select($"o_orderkey", $"__rank", $"__grp_n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"rank mismatch: ${(want diff got).take(3)}")
  }

  test("weighted form: running weight equals the window cumulative sum") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf).select($"l_returnflag",
      $"l_orderkey", $"l_linenumber",
      round($"l_extendedprice" * 100).cast("long").as("pc"),
      $"l_quantity".cast("long").as("qty"))
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"pc", $"l_orderkey", $"l_linenumber")
    val want = li
      .withColumn("cw", sum($"qty").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum($"qty").over(Window.partitionBy($"l_returnflag")))
      .select($"l_orderkey", $"l_linenumber".cast("long").as("ln"), $"cw", $"tw")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val got = RankSplit.rank(li, Seq("l_returnflag"), "pc",
      Seq("pc", "l_orderkey", "l_linenumber"), weightCol = Some("qty"))
      .select($"l_orderkey", $"l_linenumber".cast("long").as("ln"), $"__cumw", $"__grp_w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"cumw mismatch: ${(want diff got).take(3)}")
  }

  test("empty group list ranks globally; splits=2 still exact") {
    import spark.implicits._
    val got = RankSplit.rank(base, Seq.empty, "pc",
      Seq("o_totalprice", "o_orderkey"), splits = 2)
      .agg(min($"__rank"), max($"__rank"), max($"__grp_n"), count(lit(1)))
      .head()
    val n = base.count()
    assert(got.getLong(0) == 1L && got.getLong(1) == n &&
      got.getLong(2) == n && got.getLong(3) == n,
      s"global rank must be a 1..$n permutation: $got")
  }

  test("a NULL cell value fails loudly instead of silently dropping its row") {
    val withNull = base.withColumn("pc",
      when(col("o_orderkey") === 7, lit(null)).otherwise(col("pc")))
    val e = intercept[Exception] {
      RankSplit.rank(withNull, Seq("o_orderpriority"), "pc",
        Seq("o_totalprice", "o_orderkey")).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("RankSplit: NULL")),
      s"expected the loud NULL-cell error, got $e")
  }

  test("the full-width sort is cell-partitioned, never per-group") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = RankSplit.rank(base, Seq("o_orderpriority"), "pc",
        Seq("o_totalprice", "o_orderkey"))
      val sorts = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.SortExec
          if s.sortOrder.exists(_.child.toString.contains("o_totalprice")) =>
          s.child.outputPartitioning.toString
      }
      assert(sorts.nonEmpty && sorts.forall(_.contains("__cell")),
        s"row sort not partitioned by __cell: $sorts")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
