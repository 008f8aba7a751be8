package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SaltedJoin

class SaltedJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("salted join returns exactly the plain join's rows on a skewed key") {
    // 10_000 rows of one hot key + a uniform tail, joined to a dim
    val skewed = ((1 to 10000).map(i => (42L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7, 100000L + i)))
      .toDF("k", "payload")
    val dim = (0L to 50L).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = skewed.join(dim, "k")
    val salted = SaltedJoin(skewed, dim, "k", salts = 8, saltBy = $"payload")
    assert(salted.count() == plain.count())
    val a = salted.select("k", "payload", "name").collect().map(_.toString).sorted
    val b = plain.select("k", "payload", "name").collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("salted join spreads the hot key across salt sub-keys") {
    val skewed = (1 to 8000).map(i => (7L, i.toLong)).toDF("k", "payload")
    val dim = Seq((7L, "hot")).toDF("k", "name")
    // distribution check on the salted left side: every salt bucket
    // gets a meaningful share of the hot key's rows
    val perSalt = skewed
      .withColumn("__salt", pmod(xxhash64($"payload"), lit(8L)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(perSalt.length == 8, s"expected 8 salt buckets, got ${perSalt.length}")
    assert(perSalt.min > 500, s"salt skew: ${perSalt.toSeq}")
    // and correctness still holds
    assert(SaltedJoin(skewed, dim, "k", 8, $"payload").count() == 8000)
  }
}
