package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.BloomJoin

/** Core OLAP surface: the catalog selection/aggregation workload of
  * the reference (Pserv issues projections, predicates, aggregates
  * and joins over its Object/ForcedSource/CcdVisit tables; Qserv adds
  * the same shapes at scale). Expressed as declarative DataFrame
  * plans so Catalyst handles pushdown/pruning/join selection.
  *
  * Determinism discipline (for the DuckDB hash-oracle): every SUM of
  * a double is computed over `CAST(ROUND(x*10^k) AS BIGINT)` — exact,
  * order-independent integer addition — then divided back to double.
  * IEEE double ops on identical inputs are identical across engines;
  * only the *reduction order* of floating sums is not, so the
  * reduction is always integral.
  */
object CoreOlap {

  /** sum(round(c*scale)::long)/scale — order-independent double sum. */
  private def sumScaled(c: Column, scale: Long): Column =
    sum(round(c * scale).cast("long")) / lit(scale.toDouble)

  private def ts(s: String): Column = lit(s).cast("timestamp")

  // ---------------------------------------------------------------
  def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= ts("1998-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumScaled($"l_quantity", 100L).as("sum_qty"),
        sumScaled($"l_extendedprice", 100L).as("sum_base_price"),
        sumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000L).as("sum_disc_price"),
        sumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 1000000L).as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_base_price,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS BIGINT)/10000.0 AS sum_disc_price,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*1000000) AS BIGINT)) AS BIGINT)/1000000.0 AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = Tables.orders(s, dir).filter($"o_orderdate" < ts("1998-01-01"))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(s, dir).filter($"l_shipdate" > ts("1998-01-01"))
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    // customer is fact-scale at the 100 TB target — no broadcast hint;
    // AQE picks broadcast at small SFs and shuffle-hash/sort-merge at scale.
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate_s"),
        $"o_orderpriority")
      .agg(sumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000L).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_s, o_orderpriority,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS BIGINT)/10000.0 AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------
  /** Quantity floor of the large-order report — binds on the test
    * corpora (99/1473 orders at sf0.001, 874/14743 at sf0.01). */
  private[graft] val LargeOrderQtyMin = 200L

  /** Large-volume orders (the TPC-H Q18 shape): customers whose
    * orders aggregate more than [[LargeOrderQtyMin]] units across
    * their line items — the HAVING-subquery + three-way join report.
    * Quantity sums are exact integers; the price rides as exact
    * cents.
    *
    * Scale shape: ONE combinable lineitem aggregate on the order key
    * shrinks the fact table to the qualifying tail BEFORE any join;
    * the two joins then carry that sliver against orders and customer
    * (AQE broadcasts the filtered side at runtime — no hint, the
    * q03 discipline, since all three inputs are fact-scale at the
    * 100 TB target). */
  def qLargeOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity".cast("long")).as("sum_qty"))
      .filter($"sum_qty" > LargeOrderQtyMin)
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey",
        round($"o_totalprice" * 100).cast("long").as("price_c100"))
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(s, dir).select($"c_custkey"),
        $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"o_orderkey", $"price_c100", $"sum_qty")
      .orderBy($"sum_qty".desc, $"o_orderkey")
  }

  val qLargeOrdersSql: String =
    s"""WITH big AS (SELECT l_orderkey,
       |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       |  FROM lineitem GROUP BY 1
       |  HAVING SUM(CAST(l_quantity AS BIGINT)) > $LargeOrderQtyMin)
       |SELECT c.c_custkey, o.o_orderkey,
       |  CAST(ROUND(o.o_totalprice*100) AS BIGINT) AS price_c100, sum_qty
       |FROM big
       |JOIN orders o ON o.o_orderkey = big.l_orderkey
       |JOIN customer c ON c.c_custkey = o.o_custkey
       |ORDER BY sum_qty DESC, o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  /** Suppliers who kept orders waiting (the TPC-H Q21 shape: the
    * EXISTS + NOT EXISTS correlated self-joins on the fact table):
    * per supplier, the count of finalized multi-supplier orders on
    * which THEY were the only supplier with a failed delivery. The
    * corpus carries no receipt/commit dates, so `l_returnflag = 'R'`
    * (returned — the failed-delivery stream [[q01]] already reports
    * on) is the late marker and `o_orderstatus = 'F'` the finalized
    * gate; both thresholds bind (158 of 493 F-orders qualify at
    * sf0.001, 1651 of 4933 at sf0.01).
    *
    * Scale shape: both correlated subqueries collapse into ONE
    * combinable self-aggregate on the order key (the [[qLargeOrders]]
    * aggregate-then-join discipline) — EXISTS(other supplier) is
    * `ns >= 2`, NOT EXISTS(other late supplier) is `nl = 1` with the
    * waiting supplier as the aggregate's own argmax witness, so the
    * fact table is scanned ONCE and never self-joined row-to-row.
    * The qualifying sliver then joins orders on the order key (AQE
    * broadcasts the sliver at runtime), the per-supplier count is a
    * ~|supplier|-key aggregate, and only supplier/nation (true dims)
    * join after. */
  def qWaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r20: the two exact distincts + max planned as Expand ×3 — every
    // lineitem row tripled through two aggregate layers. The same
    // counts fall out of a plain (order, supplier) pre-aggregation
    // (ns = group count, nl = suppliers with ≥1 late row, late_supp =
    // max such supplier): two hash aggregates, zero Expand, and the
    // first one combines map-side (guide §2.3). Values identical.
    val perSupp = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max(when($"l_returnflag" === "R", 1L).otherwise(0L)).as("late"))
    val perOrder = perSupp
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("ns"),
        sum($"late").as("nl"),
        max(when($"late" === 1L, $"l_suppkey")).as("late_supp"))
      .filter($"ns" >= 2 && $"nl" === 1)
    val waiting = perOrder
      .join(Tables.orders(s, dir).filter($"o_orderstatus" === "F")
        .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"late_supp").agg(count(lit(1)).as("numwait"))
    waiting
      .join(Tables.supplier(s, dir)
        .select($"s_suppkey", $"s_name", $"s_nationkey"),
        $"late_supp" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, dir)
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"n_name", $"s_name", $"numwait")
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  /** Oracle twin: the identical one-aggregate collapse of both
    * correlated subqueries (numwait DESC, s_name is a total order —
    * s_name is unique — so the LIMIT is deterministic). */
  val qWaitingSuppliersSql: String =
    """WITH pero AS (SELECT l_orderkey,
      |    COUNT(DISTINCT l_suppkey) AS ns,
      |    COUNT(DISTINCT CASE WHEN l_returnflag='R' THEN l_suppkey END) AS nl,
      |    MAX(CASE WHEN l_returnflag='R' THEN l_suppkey END) AS late_supp
      |  FROM lineitem GROUP BY 1),
      |w AS (SELECT late_supp, COUNT(*) AS numwait
      |  FROM pero JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderstatus = 'F' AND ns >= 2 AND nl = 1
      |  GROUP BY 1)
      |SELECT n_name, s_name, numwait
      |FROM w
      |JOIN supplier ON s_suppkey = late_supp
      |JOIN nation ON n_nationkey = s_nationkey
      |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // ---------------------------------------------------------------
  /** The two trading nations of the Q7 report — both directions
    * populated at both test SFs (18→19: 61/138 lineitems at
    * sf0.001/sf0.01; 19→18: 25/146). */
  private[graft] val TradeNationA = "NATION_18"
  private[graft] val TradeNationB = "NATION_19"

  /** Bilateral trade-volume report (the TPC-H Q7 shape): revenue
    * shipped between two nations, BOTH directions, by ship year over
    * a two-year window. The classic disjunctive pair predicate
    * `(n1=A AND n2=B) OR (n1=B AND n2=A)` is factored into its
    * conjunctive closure — each dim side restricted to {A, B} plus
    * `supp_nation ≠ cust_nation` — which is equivalent on the
    * restricted dims and lets EACH leg push into ITS dimension scan
    * independently (the OR form straddles two tables and can push
    * into neither).
    *
    * Scale shape: the 2-row nation slivers broadcast onto supplier
    * and customer FIRST, shrinking both to the two nations' members
    * before any fact join; lineitem prunes on the ship-date window at
    * the scan; the fact joins then carry only the doubly-restricted
    * sliver, and the report is a ≤|2×2×years|-key combinable
    * aggregate. Revenue follows the house exact-cents discipline
    * ([[sumScaled]]). */
  def qNationTrade(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nat = Tables.nation(s, dir)
      .filter($"n_name".isin(TradeNationA, TradeNationB))
      .select($"n_nationkey", $"n_name")
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1996-01-01") &&
        $"l_shipdate" < ts("1998-01-01"))
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice",
        $"l_discount", year($"l_shipdate").cast("long").as("l_year"))
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation", $"l_year")
      .agg(count(lit(1)).as("n_items"),
        sumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000L)
          .as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** Oracle twin: the textbook disjunctive pair form — proving the
    * conjunctive factorization equivalent is the point. */
  val qNationTradeSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
       |  COUNT(*) AS n_items,
       |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT))
       |    AS BIGINT)/10000.0 AS revenue
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |WHERE ((n1.n_name = '$TradeNationA' AND n2.n_name = '$TradeNationB')
       |    OR (n1.n_name = '$TradeNationB' AND n2.n_name = '$TradeNationA'))
       |  AND l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------
  /** Returned-item reporting (the TPC-H Q10 shape): the top-20
    * customers by revenue lost to returned items in a half-year
    * order window — the churn-triage report. The return marker is
    * `l_returnflag = 'R'` (the [[qWaitingSuppliers]] failed-delivery
    * stream) and the window binds (141 returned lineitems at
    * sf0.001, 1 512 at sf0.01).
    *
    * Scale shape: lineitem prunes on the return flag and orders on
    * the date window AT THE SCANS, both before their join; the
    * customer join carries only qualifying orders; nation (a true
    * dim) broadcasts; the top-20 is (revenue DESC, c_custkey) — a
    * total order, so the LIMIT is deterministic — resolved by
    * TakeOrdered on the |customers|-bounded aggregate, never a global
    * sort of the fact table. */
  def qReturnedCustomers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= ts("1996-01-01") &&
        $"o_orderdate" < ts("1996-07-01"))
      .select($"o_orderkey", $"o_custkey")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir)
        .select($"c_custkey", $"c_name", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)
        .select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(count(lit(1)).as("n_returned"),
        sumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000L)
          .as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  val qReturnedCustomersSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  COUNT(*) AS n_returned,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT))
      |    AS BIGINT)/10000.0 AS revenue
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON n_nationkey = c_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  /** The three (brand, max size, quantity band) legs of the
    * discounted-revenue report — every leg binds at both test SFs
    * (14/88/85 lineitems at sf0.001, 258/450/864 at sf0.01). */
  private[graft] val PromoLegs: Seq[(String, Int, Long, Long)] = Seq(
    ("Brand#3", 15, 1L, 15L),
    ("Brand#13", 25, 10L, 30L),
    ("Brand#23", 35, 25L, 50L))

  /** Discounted-revenue report under a DISJUNCTIVE composite
    * predicate (the TPC-H Q19 shape): revenue from lineitems matching
    * any of three (brand AND size-range AND quantity-band) legs — the
    * OR-of-ANDs straddling the fact/dim join that exercises
    * predicate decomposition. Reported per LEG (the leg id is which
    * conjunct fired; the classic single-row total is their sum) so
    * each leg's contribution is separately pinned.
    *
    * Scale shape: Catalyst derives the part-side IMPLICATE of the
    * disjunction — `p_brand IN (legs)` plus the size OR — and pushes
    * it into the part scan (spec-pinned: the scan's filters mention
    * the brands), so the join's build side is the qualifying part
    * sliver, not the part table; the residual OR evaluates on the
    * joined row inside codegen; one ≤3-key combinable aggregate
    * after. */
  def qPromoParts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def legConds = PromoLegs.map { case (brand, szMax, qLo, qHi) =>
      $"p_brand" === brand && $"p_size".between(1, szMax) &&
        $"l_quantity".between(qLo.toDouble, qHi.toDouble)
    }
    // the gate is the PLAIN disjunction — a CASE-ladder here would
    // hide the OR from Catalyst's CNF conversion and the part scan
    // would read the whole table (spec-pinned regression); the leg
    // attribution runs AFTER, on the surviving sliver only
    val legCol = legConds.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (cond, i)) => when(cond, i.toLong).otherwise(acc)
    }
    Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_quantity", $"l_extendedprice", $"l_discount")
      .join(Tables.part(s, dir).select($"p_partkey", $"p_brand", $"p_size"),
        $"l_partkey" === $"p_partkey")
      .filter(legConds.reduce(_ || _))
      .withColumn("leg", legCol)
      .groupBy($"leg")
      .agg(count(lit(1)).as("n_items"),
        sumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000L)
          .as("revenue"))
      .orderBy($"leg")
  }

  /** Oracle twin: the same leg attribution via a CASE ladder — later
    * legs win ties exactly as the fold's otherwise-chain does (legs
    * are brand-disjoint, so no tie exists; the order is pinned anyway
    * for safety). */
  /** Brand of the small-quantity audit — 13/142 brand lineitems
    * qualify at sf0.001, 217/2378 at sf0.01 (binding both ways). */
  private[graft] val SmallQtyBrand = "Brand#7"

  /** Small-quantity-order revenue audit (the TPC-H Q17 shape): for
    * one brand's parts, the revenue locked in lineitems whose
    * quantity sits under 20% of THAT PART's average quantity — the
    * correlated aggregate ON THE FACT TABLE keyed back to the fact
    * row (vs [[qCorrSubquery]]'s dim-side decorrelation: there the
    * comparison set is a 25-row brand dim; here it is a per-part
    * aggregate of the fact sliver itself). The 0.2·avg comparison is
    * held in EXACT integer space — `5·qty_c100·n_q < Σqty_c100`
    * (0.2 = 1/5 exactly) — so no division or rounding exists in the
    * predicate on either engine.
    *
    * Scale shape: the brand prunes the part dim to a ~|parts|/25
    * sliver that joins the fact ONCE (AQE broadcasts it); the
    * correlated subquery decorrelates to a combinable per-part
    * aggregate OF THAT SAME SLIVER (never a second fact scan — the
    * sliver is localCheckpoint-pinned so the self-join's two readers
    * share one materialization), joined back on the part key; the
    * report is a single global row. */
  def qSmallQuantity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pb = Tables.part(s, dir).filter($"p_brand" === SmallQtyBrand)
      .select($"p_partkey")
    val li = Tables.lineitem(s, dir)
      .select($"l_partkey",
        round($"l_quantity" * 100).cast("long").as("qc100"),
        $"l_extendedprice")
      .join(pb, $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"qc100", $"l_extendedprice")
      .localCheckpoint()
    val av = li.groupBy($"l_partkey")
      .agg(sum($"qc100").as("sq"), count(lit(1)).as("nq"))
    li.join(av, Seq("l_partkey"))
      .filter($"qc100" * $"nq" * 5 < $"sq")
      .agg(count(lit(1)).as("n_small"),
        sumScaled($"l_extendedprice", 100L).as("total_price"))
      .withColumn("avg_yearly", $"total_price" / 7.0)
  }

  /** Oracle twin: the identical exact-integer fifth-of-average
    * predicate over the brand sliver. */
  val qSmallQuantitySql: String =
    s"""WITH pb AS (SELECT p_partkey FROM part
       |  WHERE p_brand = '$SmallQtyBrand'),
       |li AS (SELECT l_partkey,
       |    CAST(ROUND(l_quantity*100) AS BIGINT) AS qc100,
       |    l_extendedprice
       |  FROM lineitem JOIN pb ON p_partkey = l_partkey),
       |av AS (SELECT l_partkey, CAST(SUM(qc100) AS BIGINT) AS sq,
       |    COUNT(*) AS nq
       |  FROM li GROUP BY 1)
       |SELECT COUNT(*) AS n_small,
       |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
       |    /100.0 AS total_price,
       |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
       |    /100.0 / 7.0 AS avg_yearly
       |FROM li JOIN av USING (l_partkey)
       |WHERE qc100 * nq * 5 < sq""".stripMargin

  val qPromoPartsSql: String = {
    val cases = PromoLegs.zipWithIndex.reverse.map {
      case ((brand, szMax, qLo, qHi), i) =>
        s"WHEN p_brand = '$brand' AND p_size BETWEEN 1 AND $szMax " +
          s"AND l_quantity BETWEEN $qLo AND $qHi THEN $i"
    }.mkString(" ")
    s"""SELECT leg, COUNT(*) AS n_items,
       |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT))
       |    AS BIGINT)/10000.0 AS revenue
       |FROM (SELECT CASE $cases END AS leg,
       |    l_extendedprice, l_discount
       |  FROM lineitem JOIN part ON p_partkey = l_partkey)
       |WHERE leg IS NOT NULL
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------
  /** The Q2 sliver: STANDARD small parts, suppliers of one region —
    * 7 link rows at sf0.001, 336 at sf0.01, both reduced further by
    * the correlated MIN. */
  private[graft] val MinAcctPartType = "STANDARD"
  private[graft] val MinAcctSizeMax = 10
  private[graft] val MinAcctRegion = "ASIA"

  /** Minimum-balance regional supplier per part (the TPC-H Q2 shape:
    * the correlated scalar-MIN subquery over a region's suppliers).
    * The corpus carries no partsupp/supplycost, so the part↔supplier
    * relation is the DISTINCT (l_partkey, l_suppkey) shipping link
    * and the minimized cost is the supplier account balance in exact
    * cents — the report keeps Q2's structure (part sliver × regional
    * suppliers × correlated MIN with every tied witness returned)
    * with the link aggregate standing in for partsupp.
    *
    * Scale shape: the correlated subquery decorrelates into ONE
    * combinable (part → min acct) aggregate over the doubly-
    * restricted link sliver (aggregate-then-join, the
    * [[qLargeOrders]] discipline), and the witness join back on
    * (part, acct_c100) equality returns ties exactly as the textbook
    * form does. Nation/region are broadcast dims; the link DISTINCT
    * is the only fact-table shuffle, and it runs AFTER the part-
    * sliver semi-restriction so only the sliver's lineitems move. */
  def qMinAcctSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val regSup = Tables.supplier(s, dir)
      .select($"s_suppkey", $"s_name", $"s_nationkey",
        round($"s_acctbal" * 100).cast("long").as("acct_c100"))
      .join(broadcast(Tables.nation(s, dir)
        .select($"n_nationkey", $"n_name", $"n_regionkey")),
        $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)
        .filter($"r_name" === MinAcctRegion).select($"r_regionkey")),
        $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"n_name", $"acct_c100")
    val parts = Tables.part(s, dir)
      .filter($"p_type" === MinAcctPartType && $"p_size" <= MinAcctSizeMax)
      .select($"p_partkey", $"p_name")
    val link = Tables.lineitem(s, dir)
      .select($"l_partkey", $"l_suppkey").distinct()
      .join(parts, $"l_partkey" === $"p_partkey")
      .join(regSup, $"l_suppkey" === $"s_suppkey")
      .select($"p_partkey", $"p_name", $"s_name", $"n_name", $"acct_c100")
      .localCheckpoint()
    val minAcct = link.groupBy($"p_partkey".as("mk"))
      .agg(min($"acct_c100").as("min_acct"))
    link.join(minAcct,
        $"p_partkey" === $"mk" && $"acct_c100" === $"min_acct")
      .select($"acct_c100", $"s_name", $"n_name", $"p_partkey", $"p_name")
      .orderBy($"acct_c100".desc, $"s_name", $"p_partkey")
  }

  /** Oracle twin: the LITERAL correlated scalar-MIN form — proving
    * the decorrelation equivalent is the point. */
  val qMinAcctSupplierSql: String =
    s"""WITH link AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       |rs AS (SELECT s_suppkey, s_name, n_name,
       |    CAST(ROUND(s_acctbal*100) AS BIGINT) AS acct_c100
       |  FROM supplier
       |  JOIN nation ON n_nationkey = s_nationkey
       |  JOIN region ON r_regionkey = n_regionkey
       |  WHERE r_name = '$MinAcctRegion')
       |SELECT acct_c100, s_name, n_name, p_partkey, p_name
       |FROM part
       |JOIN link ON l_partkey = p_partkey
       |JOIN rs ON s_suppkey = l_suppkey
       |WHERE p_type = '$MinAcctPartType' AND p_size <= $MinAcctSizeMax
       |  AND acct_c100 = (SELECT MIN(r2.acct_c100)
       |    FROM link l2 JOIN rs r2 ON r2.s_suppkey = l2.l_suppkey
       |    WHERE l2.l_partkey = p_partkey)
       |ORDER BY acct_c100 DESC, s_name, p_partkey""".stripMargin

  // ---------------------------------------------------------------
  /** Order-priority checking (the TPC-H Q4 shape: the EXISTS
    * correlated semi-join counted by priority class). No receipt/
    * commit dates in the corpus, so the problem-delivery marker is
    * `l_returnflag = 'R'` (the [[qWaitingSuppliers]] convention): per
    * priority class, orders of a half-year window with at least one
    * returned line.
    *
    * Scale shape: the EXISTS is a LeftSemi join on the order key —
    * orders are never duplicated by their multi-line matches, so no
    * DISTINCT is needed downstream — and the date window prunes the
    * orders scan BEFORE the join. The report is a 5-key combinable
    * aggregate. */
  def qOrderPriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ret = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
      .select($"l_orderkey")
    Tables.orders(s, dir)
      .filter($"o_orderdate" >= ts("1996-01-01") &&
        $"o_orderdate" < ts("1996-07-01"))
      .select($"o_orderkey", $"o_orderpriority")
      .join(ret, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** Oracle twin: the textbook correlated EXISTS. */
  val qOrderPrioritySql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Revenue-change forecast (the TPC-H Q6 shape: the pure scan-local
    * report — one filtered scan, ONE combinable aggregate, no join
    * anywhere). The discount band is anchored to exact c100 integers
    * (`round(l_discount*100) BETWEEN 5 AND 7`) rather than comparing
    * raw doubles against 0.05/0.07 literals — neither bound is
    * representable in binary and the stored values sit exactly ON the
    * bounds, so the integer anchor is the only formulation both
    * engines can't disagree on.
    *
    * Scale shape: at 100 TB this is THE predicate-pushdown showcase —
    * the date window reaches the parquet scan as a pushed filter,
    * the two value predicates run in the scan stage, and the single
    * aggregate is map-side partial + one 1-row exchange. */
  def qRevenueForecast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1996-01-01") &&
        $"l_shipdate" < ts("1997-01-01"))
      .filter(round($"l_discount" * 100).cast("long").between(5, 7) &&
        $"l_quantity" < 24)
      .agg(count(lit(1)).as("n_items"),
        sumScaled($"l_extendedprice" * $"l_discount", 10000L)
          .as("lost_revenue"))
  }

  val qRevenueForecastSql: String =
    """SELECT COUNT(*) AS n_items,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*10000) AS BIGINT))
      |    AS BIGINT)/10000.0 AS lost_revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------
  /** The Q8 market: one supplier nation's share of one region's
    * customers — numerator populated every order-year at both SFs
    * (1–6 lineitems/year at sf0.001, 10–18 at sf0.01). */
  private[graft] val MktShareNation = "NATION_18"
  private[graft] val MktShareRegion = "EUROPE"

  /** National market share (the TPC-H Q8 shape: share-of-market by
    * year as a conditional aggregate over the full market volume):
    * per order-year, the permille of PROMO-part revenue delivered to
    * [[MktShareRegion]] customers that [[MktShareNation]]'s suppliers
    * captured. Revenue in exact ×10⁴ integers end-to-end, so the
    * share is an exact integer permille (`1000·nat DIV tot`) and the
    * two revenue readouts are single exact-integer-sum divisions.
    *
    * Scale shape: the market gate (customer region) and the share
    * attribution (supplier nation) each ride a broadcast dim sliver
    * onto their fact side BEFORE the fact joins; the part sliver
    * prunes lineitem early; the report is one |years|-key combinable
    * conditional aggregate — the share never needs a second pass or a
    * self-join of the market against itself. */
  def qMarketShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val mktNat = Tables.nation(s, dir)
      .select($"n_nationkey", $"n_regionkey")
      .join(broadcast(Tables.region(s, dir)
        .filter($"r_name" === MktShareRegion).select($"r_regionkey")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
      .join(broadcast(mktNat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val promo = Tables.part(s, dir).filter($"p_type" === "PROMO")
      .select($"p_partkey")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000)
          .cast("long").as("rev_c"))
      .join(promo, $"l_partkey" === $"p_partkey")
      .join(Tables.orders(s, dir)
        .select($"o_orderkey", $"o_custkey",
          year($"o_orderdate").cast("long").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .groupBy($"o_year")
      .agg(sum($"rev_c").as("tot_c"),
        sum(when($"supp_nation" === MktShareNation, $"rev_c")
          .otherwise(0L)).as("nat_c"))
      .select($"o_year", ($"tot_c" / 10000.0).as("total_revenue"),
        ($"nat_c" / 10000.0).as("nation_revenue"),
        expr("1000 * nat_c DIV tot_c").as("share_permille"))
      .orderBy($"o_year")
  }

  val qMarketShareSql: String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  CAST(SUM(rc) AS BIGINT)/10000.0 AS total_revenue,
       |  CAST(SUM(CASE WHEN n1.n_name = '$MktShareNation' THEN rc
       |    ELSE 0 END) AS BIGINT)/10000.0 AS nation_revenue,
       |  1000 * CAST(SUM(CASE WHEN n1.n_name = '$MktShareNation' THEN rc
       |    ELSE 0 END) AS BIGINT) // CAST(SUM(rc) AS BIGINT)
       |    AS share_permille
       |FROM (SELECT l_orderkey, l_partkey, l_suppkey,
       |    CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)
       |      AS rc
       |  FROM lineitem) l
       |JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |JOIN region ON r_regionkey = n2.n_regionkey
       |  AND r_name = '$MktShareRegion'
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** The Q9 product line: parts named `blue …` — 20 parts at
    * sf0.001, 255 at sf0.01. */
  private[graft] val ProfitPartPrefix = "blue"

  /** Product-line profit by nation and year (the TPC-H Q9 shape: the
    * part-name sliver through every join dimension into a
    * nation × year matrix). The corpus has no partsupp/supplycost, so
    * the profit measure is gross discounted revenue — the report
    * keeps Q9's structure (name-LIKE part sliver, supplier nation
    * attribution, order-year axis, nation × year output).
    *
    * Scale shape: the name sliver prunes lineitem FIRST (the join
    * with the filtered part table is the most selective edge, and AQE
    * broadcasts the sliver at runtime); orders contributes only the
    * year column; nation broadcasts onto supplier. One
    * |nations × years|-key combinable aggregate. */
  def qNationProfit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pl = Tables.part(s, dir)
      .filter($"p_name".startsWith(ProfitPartPrefix))
      .select($"p_partkey")
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
      .join(broadcast(Tables.nation(s, dir)
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name")
    Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_extendedprice", $"l_discount")
      .join(pl, $"l_partkey" === $"p_partkey")
      .join(Tables.orders(s, dir)
        .select($"o_orderkey",
          year($"o_orderdate").cast("long").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .groupBy($"n_name", $"o_year")
      .agg(count(lit(1)).as("n_items"),
        sumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000L)
          .as("amount"))
      .orderBy($"n_name", $"o_year".desc)
  }

  val qNationProfitSql: String =
    s"""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  COUNT(*) AS n_items,
       |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000)
       |    AS BIGINT)) AS BIGINT)/10000.0 AS amount
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |WHERE p_name LIKE '$ProfitPartPrefix%'
       |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin

  // ---------------------------------------------------------------
  /** Shipping-class priority report (the TPC-H Q12 shape: the
    * two-way conditional count split by shipping class over a
    * one-year window). The corpus carries no l_shipmode, so the
    * 2-value `l_linestatus` is the class axis — the shape (fact join
    * + CASE-summed priority split, both branches populated) is what
    * the report exercises.
    *
    * Scale shape: the date window prunes the lineitem scan; the join
    * carries only (order key, priority); the report is a 2-key
    * combinable CASE aggregate — the canonical "join then conditional
    * count" plan with zero extra exchanges. */
  def qShipmodePriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1997-01-01") &&
        $"l_shipdate" < ts("1998-01-01"))
      .select($"l_orderkey", $"l_linestatus")
      .join(Tables.orders(s, dir)
        .select($"o_orderkey", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_linestatus")
      .agg(sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy($"l_linestatus")
  }

  val qShipmodePrioritySql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Promotion-revenue share by ship month (the TPC-H Q14 shape: the
    * CASE-numerator / full-denominator share over one join). Revenue
    * in exact ×10⁴ integers, so the share is an exact integer
    * permille beside the two one-division double readouts — Q14's
    * `100*promo/total` percentage re-expressed in the house integer
    * discipline. A month axis (12 rows over the 1996 window) instead
    * of Q14's single month, so the report has a real group-by.
    *
    * Scale shape: the date window prunes the lineitem scan; part
    * contributes one flag column through an equi-join AQE resolves
    * (both sides fact-scale at 100 TB — no hint); ONE combinable
    * conditional aggregate on the 12-key month axis. */
  def qPromoRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1996-01-01") &&
        $"l_shipdate" < ts("1997-01-01"))
      .select($"l_partkey",
        date_format($"l_shipdate", "yyyy-MM").as("ship_month"),
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000)
          .cast("long").as("rev_c"))
      .join(Tables.part(s, dir).select($"p_partkey", $"p_type"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"ship_month")
      .agg(sum($"rev_c").as("tot_c"),
        sum(when($"p_type" === "PROMO", $"rev_c").otherwise(0L))
          .as("promo_c"))
      .select($"ship_month", ($"tot_c" / 10000.0).as("total_revenue"),
        ($"promo_c" / 10000.0).as("promo_revenue"),
        expr("1000 * promo_c DIV tot_c").as("promo_permille"))
      .orderBy($"ship_month")
  }

  val qPromoRevenueSql: String =
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      |  CAST(SUM(rc) AS BIGINT)/10000.0 AS total_revenue,
      |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END)
      |    AS BIGINT)/10000.0 AS promo_revenue,
      |  1000 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END)
      |    AS BIGINT) // CAST(SUM(rc) AS BIGINT) AS promo_permille
      |FROM (SELECT l_partkey, l_shipdate,
      |    CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)
      |      AS rc
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01') l
      |JOIN part ON p_partkey = l_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Top supplier of the quarter (the TPC-H Q15 shape: the
    * aggregate view + scalar-MAX self-reference, ties kept). Revenue
    * per supplier over Q1-1996 in exact ×10⁴ integers, so the MAX
    * equality join is exact — no epsilon, no float ties.
    *
    * Scale shape: ONE combinable supplier-key aggregate shrinks the
    * fact window to |suppliers| rows; the scalar max is a 1-row
    * broadcast back onto that reduced frame (the [[qGlobalShare]]
    * global-scalar discipline — never a window over a single
    * partition); the supplier dim joins after the equality filter,
    * touching only the winner(s). */
  def qTopSupplier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1996-01-01") &&
        $"l_shipdate" < ts("1996-04-01"))
      .groupBy($"l_suppkey")
      .agg(sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount")
        * 10000).cast("long")).as("rev_c"))
    val mx = rev.agg(max($"rev_c").as("max_c"))
    rev.crossJoin(broadcast(mx)).filter($"rev_c" === $"max_c")
      .join(Tables.supplier(s, dir).select($"s_suppkey", $"s_name"),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name",
        ($"rev_c" / 10000.0).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  /** Oracle twin: the textbook revenue view + scalar-MAX subquery. */
  val qTopSupplierSql: String =
    """WITH rev AS (SELECT l_suppkey,
      |    CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000)
      |      AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, rev_c/10000.0 AS total_revenue
      |FROM supplier JOIN rev ON l_suppkey = s_suppkey
      |WHERE rev_c = (SELECT MAX(rev_c) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------
  /** The Q16 sliver axes and the excluded-supplier threshold (the
    * "customer complaints" stand-in): balances below 1000.00 — 1
    * supplier at sf0.001, 15 at sf0.01. */
  private[graft] val CensusSizes: Seq[Int] = Seq(1, 3, 9, 14, 19, 23, 36, 45)
  private[graft] val CensusAcctMaxC100 = 100000L

  /** Part-supplier census (the TPC-H Q16 shape: supplier-count
    * distinct per part attribute triple, with a NOT-IN excluded
    * supplier set). The DISTINCT shipping link stands in for
    * partsupp (the [[qMinAcctSupplier]] convention) and the excluded
    * set is the low-balance sliver.
    *
    * Scale shape: the NOT IN is a LeftAnti join against the tiny
    * excluded sliver (broadcast at runtime); the part sliver prunes
    * its scan on all three predicates; the census is one combinable
    * count-distinct aggregate on the |brand × type × size| frame. */
  def qPartSupplierCensus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val excl = Tables.supplier(s, dir)
      .filter(round($"s_acctbal" * 100).cast("long") < CensusAcctMaxC100)
      .select($"s_suppkey")
    val parts = Tables.part(s, dir)
      .filter($"p_brand" =!= "Brand#1" && $"p_type" =!= "PROMO" &&
        $"p_size".isin(CensusSizes: _*))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey").distinct()
      .join(parts, $"l_partkey" === $"p_partkey")
      .join(excl, $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  /** Oracle twin: the textbook NOT IN form. */
  val qPartSupplierCensusSql: String = {
    val sizes = CensusSizes.mkString(", ")
    s"""SELECT p_brand, p_type, p_size,
       |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) link
       |JOIN part ON p_partkey = l_partkey
       |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
       |  AND p_size IN ($sizes)
       |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
       |    WHERE CAST(ROUND(s_acctbal*100) AS BIGINT)
       |      < $CensusAcctMaxC100)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin
  }

  // ---------------------------------------------------------------
  /** Dominant suppliers of the year (the TPC-H Q20 shape: the
    * nested qty aggregate gating a supplier report). No partsupp
    * availability column, so the "excess share" predicate is
    * `2·supplier_qty > part_total_qty` over the 1996 ship year,
    * restricted to parts several suppliers actually shipped
    * (`n_supp ≥ 2` — sole-supplier dominance is vacuous); both gates
    * bind (75 dominated pairs at sf0.001, 464 at sf0.01).
    *
    * Scale shape: ONE (part, supplier) fact aggregate, pinned
    * ([[org.apache.spark.sql.Dataset.localCheckpoint]]) because both
    * the per-part total and the share filter read it — the
    * [[qSmallQuantity]] discipline, so the fact table is scanned
    * once; everything above runs on the |part × supplier| reduced
    * frame, and the dims join a ≤|supplier|-row result. */
  def qDominantSuppliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pq = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("1996-01-01") &&
        $"l_shipdate" < ts("1997-01-01"))
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"l_quantity".cast("long")).as("sq"))
      .localCheckpoint()
    val tot = pq.groupBy($"l_partkey")
      .agg(sum($"sq").as("tq"), count(lit(1)).as("n_supp"))
    pq.join(tot, Seq("l_partkey"))
      .filter($"sq" * 2 > $"tq" && $"n_supp" >= 2)
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_parts_dominated"))
      .join(Tables.supplier(s, dir)
        .select($"s_suppkey", $"s_name", $"s_nationkey"),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, dir)
        .select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_name", $"n_name", $"n_parts_dominated")
      .orderBy($"n_parts_dominated".desc, $"s_name")
  }

  val qDominantSuppliersSql: String =
    """WITH pq AS (SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1, 2),
      |tot AS (SELECT l_partkey, CAST(SUM(sq) AS BIGINT) AS tq,
      |    COUNT(*) AS n_supp
      |  FROM pq GROUP BY 1),
      |dom AS (SELECT l_suppkey, COUNT(*) AS n_parts_dominated
      |  FROM pq JOIN tot USING (l_partkey)
      |  WHERE 2*sq > tq AND n_supp >= 2
      |  GROUP BY 1)
      |SELECT s_name, n_name, n_parts_dominated
      |FROM dom
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |ORDER BY n_parts_dominated DESC, s_name""".stripMargin

  // ---------------------------------------------------------------
  def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val reg = Tables.region(s, dir).filter($"r_name" === "ASIA").select($"r_regionkey")
    val nat = Tables.nation(s, dir).select($"n_nationkey", $"n_name", $"n_regionkey")
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
    val sup = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
    val ord = Tables.orders(s, dir)
      .filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1998-01-01"))
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
    // Only true dims (nation: 25 rows, region: 5) get broadcast hints;
    // customer/supplier are fact-scale at 100 TB — AQE decides for them.
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(sup,
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000L).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q05Sql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS BIGINT)/10000.0 AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------
  def qHaving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sumScaled($"o_totalprice", 100L).as("total_spent"))
      .filter($"n_orders" >= 14)
      .orderBy($"o_custkey")
  }

  val qHavingSql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total_spent
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 14 ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------
  /** Rank-per-group top-N via the custom TopKPerKey operator
    * (graft.plans): o_orderpriority has ~5 distinct values, so a
    * window would sort the whole table in 5 tasks no matter how large
    * the cluster. TopKPerKey keeps a bounded heap per key per input
    * partition and shuffles only k·partitions survivors — the
    * partial/final HashAggregate shape applied to top-k. Result is
    * identical to row_number() ≤ 3 (spec-verified), so the window
    * oracle still applies. */
  def qWindowTopn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.TopKPerKey(
      Tables.orders(s, dir)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice"),
      keys = Seq("o_orderpriority"),
      orderBy = Seq(("o_totalprice", false), ("o_orderkey", true)),
      k = 3, rankName = "rn")
      .orderBy($"o_orderpriority", $"rn")
  }

  val qWindowTopnSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin

  // ---------------------------------------------------------------
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
    Tables.lineitem(s, dir)
      .filter($"l_suppkey" <= 3)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"l_shipdate",
        round($"l_quantity" * 100).cast("long").as("qty_c100"))
      .withColumn("run_qty_c100",
        sum($"qty_c100").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("prev_qty_c100", lag($"qty_c100", 1, 0L).over(w))
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        date_format($"l_shipdate", "yyyy-MM-dd").as("ship_s"),
        $"run_qty_c100", $"prev_qty_c100")
      .orderBy($"l_suppkey", $"ship_s", $"l_orderkey", $"l_linenumber")
  }

  val qWindowRunningSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_s,
      |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) OVER w AS BIGINT) AS run_qty_c100,
      |  CAST(COALESCE(LAG(CAST(ROUND(l_quantity*100) AS BIGINT), 1) OVER w, 0) AS BIGINT) AS prev_qty_c100
      |FROM lineitem WHERE l_suppkey <= 3
      |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_suppkey, ship_s, l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------
  def qDistinctCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r20 (the q_profile Expand-removal discipline, driver-verified
    // 5.19× there): three exact distincts in ONE aggregate plan as
    // Expand ×4 — every lineitem row quadrupled through two
    // aggregates. Split into single-distinct branches (each plans as
    // a two-level aggregate over just its own column, no Expand) and
    // join on the 3-row flag key (broadcast). Result identical: same
    // exact distinct counts, same rows.
    val li = Tables.lineitem(s, dir)
    val orders = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n_orders"))
    val parts = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"))
    val suppPart = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_suppkey", $"l_partkey").as("n_supp_part"))
    val totals = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"))
    orders.join(parts, Seq("l_returnflag"))
      .join(suppPart, Seq("l_returnflag"))
      .join(totals, Seq("l_returnflag"))
      .select($"l_returnflag", $"n_orders", $"n_parts", $"n_supp_part", $"n")
      .orderBy($"l_returnflag")
  }

  val qDistinctCountSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
      |  COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  /** Exact interpolated percentiles computed over integer-scaled
    * values: both engines use type-7 interpolation lo + (hi−lo)·frac
    * with frac a multiple of 1/4, so over c100 integers every result
    * is an exact multiple of 0.0025 and the ×100 → bigint projection
    * is lossless — no float-boundary fragility in the hash compare. */
  def qPercentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_type", round($"value" * 100).cast("long").as("vc"))
      .groupBy($"event_type")
      .agg(
        expr("CAST(percentile(vc, 0.25) * 100 AS BIGINT)").as("p25_c10000"),
        expr("CAST(percentile(vc, 0.5) * 100 AS BIGINT)").as("p50_c10000"),
        expr("CAST(percentile(vc, 0.75) * 100 AS BIGINT)").as("p75_c10000"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  val qPercentilesSql: String =
    """SELECT event_type,
      |  CAST(QUANTILE_CONT(vc, 0.25) * 100 AS BIGINT) AS p25_c10000,
      |  CAST(QUANTILE_CONT(vc, 0.5) * 100 AS BIGINT) AS p50_c10000,
      |  CAST(QUANTILE_CONT(vc, 0.75) * 100 AS BIGINT) AS p75_c10000,
      |  COUNT(*) AS n
      |FROM (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urgent = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 40000.0)
      .select($"o_custkey")
    Tables.customer(s, dir)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  val qSemiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |              AND o_orderpriority = '1-URGENT' AND o_totalprice > 40000.0)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val recent = Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= ts("2000-01-01"))
      .select($"l_partkey")
    Tables.part(s, dir)
      .join(recent, $"p_partkey" === $"l_partkey", "left_anti")
      .select($"p_partkey", $"p_brand")
      .orderBy($"p_partkey")
  }

  val qAntiJoinSql: String =
    """SELECT p_partkey, p_brand FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
      |                  AND l_shipdate >= TIMESTAMP '2000-01-01')
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nat = Tables.nation(s, dir).select($"n_nationkey", $"n_name")
    Tables.customer(s, dir)
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .rollup($"n_name", $"c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sumScaled($"c_acctbal", 100L).as("acctbal_sum"))
      .select(coalesce($"n_name", lit("(all)")).as("nation"),
        coalesce($"c_mktsegment", lit("(all)")).as("segment"),
        $"n", $"acctbal_sum")
      .orderBy($"nation", $"segment")
  }

  val qRollupSql: String =
    """SELECT COALESCE(n_name, '(all)') AS nation, COALESCE(c_mktsegment, '(all)') AS segment,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT)/100.0 AS acctbal_sum
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY ROLLUP(n_name, c_mktsegment)
      |ORDER BY nation, segment""".stripMargin

  // ---------------------------------------------------------------
  /** IRREGULAR GROUPING SETS — the report shape neither ROLLUP nor
    * CUBE can express: one pass producing the (returnflag, linestatus)
    * detail grid, an independent per-ship-month rollup, and the grand
    * total, with `grouping_id()` as the authoritative level bitmask
    * (bit order = the declared column order, matching DuckDB's
    * GROUPING(...)). Spark expands the sets map-side (one Expand ×3)
    * into ONE combinable aggregate — three reports for one scan and
    * one shuffle, where three separate queries would scan thrice. */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .withColumn("shipmonth", month($"l_shipdate").cast("int"))
      .groupingSets(
        Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"shipmonth"), Seq()),
        $"l_returnflag", $"l_linestatus", $"shipmonth")
      .agg(count(lit(1)).as("n"),
        sum(round($"l_quantity" * 100).cast("long")).as("qty_c100"),
        grouping_id().cast("int").as("gid"))
      .select(coalesce($"l_returnflag", lit("(all)")).as("returnflag"),
        coalesce($"l_linestatus", lit("(all)")).as("linestatus"),
        coalesce($"shipmonth", lit(-1)).as("shipmonth"),
        $"n", $"qty_c100", $"gid")
      .orderBy($"gid", $"returnflag", $"linestatus", $"shipmonth")
  }

  val qGroupingSetsSql: String =
    """WITH l AS (SELECT l_returnflag, l_linestatus,
      |    CAST(MONTH(l_shipdate) AS INT) AS shipmonth, l_quantity
      |  FROM lineitem)
      |SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
      |  COALESCE(l_linestatus, '(all)') AS linestatus,
      |  COALESCE(shipmonth, -1) AS shipmonth,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c100,
      |  CAST(GROUPING(l_returnflag, l_linestatus, shipmonth) AS INT) AS gid
      |FROM l
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (shipmonth), ())
      |ORDER BY gid, returnflag, linestatus, shipmonth""".stripMargin

  // ---------------------------------------------------------------
  /** Full CUBE over (returnflag, linestatus) with the grouping-id
    * bitmask — the GROUPING SETS shape (ROLLUP's superset). The
    * "(all)" coalescing keeps the NULL subtotal markers printable and
    * makes the bitmask the authoritative level indicator. */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(round($"l_quantity" * 100).cast("long")).as("qty_c100"),
        grouping_id().cast("int").as("gid"))
      .select(coalesce($"l_returnflag", lit("(all)")).as("returnflag"),
        coalesce($"l_linestatus", lit("(all)")).as("linestatus"),
        $"n", $"qty_c100", $"gid")
      .orderBy($"gid", $"returnflag", $"linestatus")
  }

  val qCubeSql: String =
    """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
      |  COALESCE(l_linestatus, '(all)') AS linestatus,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c100,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid, returnflag, linestatus""".stripMargin

  // ---------------------------------------------------------------
  /** The plain window top-n idiom, written exactly as a user would
    * (`row_number() OVER (...) <= 5`) — NOT via the TopKPerKey API.
    * In the shipped configuration (GraftExtensions active, as in
    * Verify/Bench) TopKRewrite plans this onto the bounded-heap
    * operator, so the DuckDB hash compare verifies the optimizer
    * rewrite end-to-end: same rows, same ranks, different plan. */
  def qTopnIdiom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    Tables.orders(s, dir)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .orderBy($"o_orderpriority", $"rn")
  }

  val qTopnIdiomSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders) t
      |WHERE rn <= 5 ORDER BY o_orderpriority, rn""".stripMargin

  // ---------------------------------------------------------------
  /** Shared scan: THREE unrelated reports over the fact table — by
    * return flag, by line status, by ship month — computed in ONE
    * scan + one shuffle via GROUPING SETS, with `grouping_id`
    * labeling which report a row belongs to. This is Qserv's
    * signature shared-scan workload (many concurrent full-table
    * queries riding one physical pass; Wang et al.) re-expressed
    * declaratively: instead of scheduling N scans against the same
    * 100 TB table, the sets expand each row to its N report keys
    * BEFORE the map-side partial aggregate, so the scan cost is paid
    * once and the shuffle carries only per-report partial aggregates. */
  def qSharedScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .withColumn("ship_month", month($"l_shipdate"))
      .groupingSets(
        Seq(Seq($"l_returnflag"), Seq($"l_linestatus"), Seq($"ship_month")),
        $"l_returnflag", $"l_linestatus", $"ship_month")
      .agg(count(lit(1)).as("n"),
        sum(round($"l_quantity" * 100).cast("long")).as("qty_c100"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce($"l_returnflag", lit("(all)")).as("returnflag"),
        coalesce($"l_linestatus", lit("(all)")).as("linestatus"),
        coalesce($"ship_month".cast("string"), lit("(all)")).as("ship_month"),
        $"n", $"qty_c100", $"gid")
      .orderBy($"gid", $"returnflag", $"linestatus", $"ship_month")
  }

  val qSharedScanSql: String =
    """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
      |  COALESCE(l_linestatus, '(all)') AS linestatus,
      |  COALESCE(CAST(ship_month AS VARCHAR), '(all)') AS ship_month,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_c100,
      |  CAST(GROUPING(l_returnflag, l_linestatus, ship_month) AS INT) AS gid
      |FROM (SELECT *, CAST(MONTH(l_shipdate) AS INT) AS ship_month FROM lineitem)
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (ship_month))
      |ORDER BY gid, returnflag, linestatus, ship_month""".stripMargin

  // ---------------------------------------------------------------
  /** Skew-salted fact⋈dim join, aggregated per supplier nation — the
    * query form of [[graft.operators.SaltedJoin]]: the fact side's
    * key is split into 8 deterministic salt sub-keys (spreading any
    * hot supplier over 8 tasks) and the dim side is replicated ×8.
    * The oracle is the PLAIN join — salting must be semantically
    * invisible, and the hash compare proves it. */
  def qSkewJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select(
      $"l_suppkey".as("suppkey"), $"l_orderkey",
      round($"l_extendedprice" * 100).cast("long").as("price_c100"))
    val sup = Tables.supplier(s, dir)
      .select($"s_suppkey".as("suppkey"), $"s_nationkey")
    graft.operators.SaltedJoin(li, sup, "suppkey", salts = 8, saltBy = $"l_orderkey")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"), sum($"price_c100").as("rev_c100"))
      .orderBy($"s_nationkey")
  }

  val qSkewJoinSql: String =
    """SELECT s_nationkey, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_c100
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // ---------------------------------------------------------------
  /** True pivot via `RelationalGroupedDataset.pivot` (q_case_pivot is
    * the manual CASE formulation): order counts per priority, statuses
    * as columns. The pivot VALUES are declared explicitly — at scale
    * an implicit pivot runs a blocking distinct scan to discover them,
    * and a declared list keeps the output schema stable as data
    * arrives. Pivot aggregation is map-side combinable (one shuffle
    * of priority×3 counters); absent cells surface as 0, matching the
    * oracle's FILTER counts. */
  def qPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("n_f"),
        coalesce($"O", lit(0L)).as("n_o"),
        coalesce($"P", lit(0L)).as("n_p"))
      .orderBy($"o_orderpriority")
  }

  val qPivotSql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  def qCasePivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ts is Long nanos (nanosAsLong); integer DIV keeps full precision
    val day = expr("ts DIV 86400000000000").as("day_idx")
    Tables.events(s, dir)
      .groupBy(day)
      .agg(
        sum(when($"event_type" === "click", 1L).otherwise(0L)).as("clicks"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("views"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("purchases"),
        sum(when($"event_type" === "purchase", round($"value" * 100).cast("long"))
          .otherwise(0L)).as("purchase_value_c100"))
      .orderBy($"day_idx")
  }

  val qCasePivotSql: String =
    """SELECT CAST(FLOOR(epoch_ms(ts)/86400000) AS BIGINT) AS day_idx,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(ROUND(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_value_c100
      |FROM events GROUP BY 1 ORDER BY day_idx""".stripMargin

  // ---------------------------------------------------------------
  /** Correlated subquery (price above brand average) decorrelated to a
    * window — the comparison is done in exact integer space
    * (price*100*count > brand_sum*1) so both engines agree bit-for-bit. */
  def qCorrSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Decorrelated as aggregate + broadcast join-back, NOT a window over
    // p_brand: a window would sort the whole table in ~25 tasks (one per
    // brand) at any cluster size. The per-brand aggregate is map-side
    // combinable and its result (~25 rows) is a genuine broadcast dim.
    val parts = Tables.part(s, dir)
      .select($"p_partkey", $"p_brand", $"p_retailprice",
        round($"p_retailprice" * 100).cast("long").as("price_c100"))
    val brandAgg = parts.groupBy($"p_brand".as("b_brand"))
      .agg(sum($"price_c100").as("brand_sum"), count(lit(1)).as("brand_n"))
    parts.join(broadcast(brandAgg), $"p_brand" === $"b_brand")
      .filter($"price_c100" * $"brand_n" > $"brand_sum")
      .select($"p_partkey", $"p_brand", $"p_retailprice")
      .orderBy($"p_partkey")
  }

  val qCorrSubquerySql: String =
    """SELECT p_partkey, p_brand, p_retailprice FROM (
      |  SELECT p_partkey, p_brand, p_retailprice,
      |    CAST(ROUND(p_retailprice*100) AS BIGINT) AS price_c100,
      |    SUM(CAST(ROUND(p_retailprice*100) AS BIGINT)) OVER (PARTITION BY p_brand) AS brand_sum,
      |    COUNT(*) OVER (PARTITION BY p_brand) AS brand_n
      |  FROM part) t
      |WHERE price_c100 * brand_n > brand_sum
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  /** As-of join: for each purchase event, the most recent prior (or
    * simultaneous) click by the same user. Composed Spark-first as
    * union + one per-key window pass (single shuffle on user_id) —
    * never a per-row subquery. Timestamps compared at microsecond
    * granularity (Spark's native resolution). */
  def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", $"event_type",
        expr("ts DIV 1000").as("tus"))
    val tagged = ev.withColumn("is_click", ($"event_type" === "click").cast("int"))
    val w = Window.partitionBy($"user_id")
      // clicks sort before purchases at equal tus so >= semantics hold;
      // event_id last = deterministic winner among same-microsecond clicks
      .orderBy($"tus", $"is_click".desc, $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("click_id",
        last(when($"is_click" === 1, $"event_id"), ignoreNulls = true).over(w))
      .withColumn("click_tus",
        last(when($"is_click" === 1, $"tus"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase" && $"click_id".isNotNull)
      .select($"event_id", $"user_id", $"tus", $"click_id", $"click_tus")
      .orderBy($"event_id")
  }

  // Window-based oracle (not DuckDB ASOF): ASOF breaks same-timestamp
  // ties arbitrarily; this mirrors the engine's deterministic
  // max-event_id-among-tied-clicks choice exactly.
  val qAsofJoinSql: String =
    """SELECT event_id, user_id, tus, click_id, click_tus FROM (
      |  SELECT event_id, user_id, tus, is_click,
      |    LAST_VALUE(CASE WHEN is_click = 1 THEN event_id END IGNORE NULLS)
      |      OVER w AS click_id,
      |    LAST_VALUE(CASE WHEN is_click = 1 THEN tus END IGNORE NULLS)
      |      OVER w AS click_tus
      |  FROM (SELECT event_id, user_id, epoch_us(ts) AS tus,
      |          CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      |        FROM events WHERE event_type IN ('click','purchase'))
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, is_click DESC, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) t
      |WHERE is_click = 0 AND click_id IS NOT NULL
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------
  // ---------------------------------------------------------------
  /** Bag/set algebra over keyed extracts — the INTERSECT / EXCEPT /
    * EXCEPT ALL surface of the SQL dialect (a user migrating from the
    * reference runs these directly). Four audits over the customer
    * key space: high-balance customers who did / did not order, buyers
    * below the balance bar, and the multiset surplus of repeat orders
    * (EXCEPT ALL keeps multiplicity: total orders − distinct buyers).
    *
    * Scale shape: every set op is a single hash shuffle on the key —
    * Spark plans INTERSECT/EXCEPT as left-semi/left-anti over
    * aggregated keys and EXCEPT ALL as a count-diff generate, so
    * nothing here is worse than the equivalent join. */
  val SetOpsBalanceBar = 5000.0

  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val high = Tables.customer(s, dir)
      .filter($"c_acctbal" > SetOpsBalanceBar).select($"c_custkey".as("k"))
    val buyers = Tables.orders(s, dir).select($"o_custkey".as("k")).distinct()
    val allOrders = Tables.orders(s, dir).select($"o_custkey".as("k"))
    def tagged(name: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("grp"), $"n")
    tagged("high_buyer", high.intersect(buyers))
      .unionByName(tagged("high_dormant", high.except(buyers)))
      .unionByName(tagged("buyer_low_bal", buyers.except(high)))
      .unionByName(tagged("repeat_surplus", allOrders.exceptAll(buyers)))
      .orderBy($"grp")
  }

  val qSetOpsSql: String =
    s"""WITH high AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > $SetOpsBalanceBar),
       |buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
       |allo AS (SELECT o_custkey AS k FROM orders)
       |SELECT 'high_buyer' AS grp, COUNT(*) AS n FROM (SELECT k FROM high INTERSECT SELECT k FROM buyers)
       |UNION ALL
       |SELECT 'high_dormant', COUNT(*) FROM (SELECT k FROM high EXCEPT SELECT k FROM buyers)
       |UNION ALL
       |SELECT 'buyer_low_bal', COUNT(*) FROM (SELECT k FROM buyers EXCEPT SELECT k FROM high)
       |UNION ALL
       |SELECT 'repeat_surplus', COUNT(*) FROM (SELECT k FROM allo EXCEPT ALL SELECT k FROM buyers)
       |ORDER BY grp""".stripMargin

  // ---------------------------------------------------------------
  /** Exact mode (most frequent value) per group with a deterministic
    * tie-break — the argmax/statistical-mode aggregate, written as the
    * `row_number() = 1` idiom so [[graft.plans.TopKRewrite]] plans it
    * on the bounded-heap TopKPerKey operator: per-user keys are
    * high-cardinality, and only one (count, type) survivor per user
    * crosses the final exchange instead of the whole per-user
    * frequency table.
    *
    * Scale shape: map-side-combinable (user, type) count, then the
    * top-1 heap — two shuffles, both on keys that grow with the data. */
  def qMode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.events(s, dir)
      .filter($"user_id".isNotNull)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"cnt".desc, $"event_type")))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("mode_type"), $"cnt")
      .orderBy($"user_id")
  }

  val qModeSql: String =
    """SELECT user_id, event_type AS mode_type, cnt
      |FROM (SELECT user_id, event_type, COUNT(*) AS cnt
      |      FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2)
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
      |  ORDER BY cnt DESC, event_type) = 1
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  /** Bloom-prefiltered semi join: lineitems of urgent high-value
    * orders. The urgent+high-value order-key SET is small, but at the
    * 100 TB target the orders slice is too large to broadcast as a
    * hash relation — [[graft.operators.BloomJoin]] builds a few-MB
    * Bloom filter over the keys distributed, prefilters lineitem
    * inside whole-stage codegen BEFORE its shuffle, and closes with
    * the exact semi join so false positives never reach the result.
    * The dominant exchange carries only the ~matching fraction of the
    * fact table instead of all of it. */
  val BloomOrderPrice = 250000.0

  def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT" &&
        $"o_totalprice" > BloomOrderPrice)
      .select($"o_orderkey")
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_returnflag", $"l_extendedprice", $"l_discount")
    BloomJoin.semi(li, dim, "l_orderkey", "o_orderkey",
      expectedKeys = 1L << 20)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sumScaled($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000L)
          .as("revenue"))
      .orderBy($"l_returnflag")
  }

  val qBloomJoinSql: String =
    s"""SELECT l_returnflag, COUNT(*) AS n_items,
       |  CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)) AS BIGINT)/10000.0 AS revenue
       |FROM lineitem
       |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
       |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > $BloomOrderPrice)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** NTILE quantile bucketing: quartile of each order's price within
    * its priority class, summarized per (priority, quartile). Ordering
    * includes the unique o_orderkey so tie rows land deterministically
    * — NTILE over a non-unique order is engine-dependent row
    * placement, which would break oracle parity.
    *
    * Scale shape — EXACT ntile without a total order per group
    * (the histogram-split plan). A naive `ntile(4) OVER (PARTITION BY
    * priority ORDER BY price)` sorts each priority class in ONE task;
    * here the per-task sort is bounded by a histogram cell instead:
    *
    *  1. ~[[NtileSplits]] approximate split points per priority (one
    *     combinable `approx_percentile` — accuracy only affects load
    *     balance, never the answer);
    *  2. each row's CELL = number of split points below it (broadcast
    *     join + one codegen'd array fold; monotone in the sort key,
    *     and tie values always share a cell);
    *  3. `row_number` within (priority, cell) — parallelism is
    *     groups × cells and each sort task holds ~1/cells of a group;
    *  4. cell row-counts (tiny: groups × cells) → cumulative offsets,
    *     broadcast back; global rank = offset + local rank;
    *  5. NTILE's exact bucket-of-rank formula in integer arithmetic
    *     (first n%4 buckets get one extra row), matching the window
    *     function bit-for-bit.
    *
    * At 100 TB, raise NtileSplits with the data; every stage stays
    * combinable, broadcast-sized, or cell-bounded. The rank machinery
    * is the shared [[graft.operators.RankSplit]]. */
  val NtileSplits = 32

  def qNtile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).select($"o_orderpriority",
      $"o_orderkey", $"o_totalprice",
      round($"o_totalprice" * 100).cast("long").as("pc"))
    val ranked = graft.operators.RankSplit.rank(o,
      Seq("o_orderpriority"), "pc", Seq("o_totalprice", "o_orderkey"),
      splits = NtileSplits)
    // NTILE(4) bucket of global rank r in a group of n_grp rows: the
    // first n%4 buckets take DIV(n,4)+1 rows, the rest DIV(n,4). The
    // ELSE branch never runs when DIV(n,4)=0 (then r <= n = the WHEN
    // bound), so the DIV-by-zero is unreachable.
    ranked
      .withColumn("quartile", expr(
        """CAST(CASE
          |  WHEN __rank <= (__grp_n % 4) * (__grp_n DIV 4 + 1)
          |  THEN (__rank - 1) DIV (__grp_n DIV 4 + 1) + 1
          |  ELSE __grp_n % 4
          |    + (__rank - (__grp_n % 4) * (__grp_n DIV 4 + 1) - 1) DIV (__grp_n DIV 4)
          |    + 1
          |END AS INT)""".stripMargin))
      .groupBy($"o_orderpriority", $"quartile")
      .agg(count(lit(1)).as("n"),
        sumScaled($"o_totalprice", 100L).as("sum_price"))
      .orderBy($"o_orderpriority", $"quartile")
  }

  val qNtileSql: String =
    """SELECT o_orderpriority, quartile, COUNT(*) AS n,
      |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_price
      |FROM (SELECT o_orderpriority, o_totalprice,
      |        CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
      |          ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
      |      FROM orders)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  /** Ordered string aggregation: per nation, the 5 alphabetically
    * first customer names joined into one field (the report/export
    * shape). Collect → sort → slice keeps the per-group payload
    * bounded: only 5 names per nation survive into the result no
    * matter the corpus, and collect_list is a single map-side
    * combinable shuffle on the (bounded-cardinality) nation key. */
  def qStringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.nation(s, dir), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_cust"),
        array_join(slice(sort_array(collect_list($"c_name")), 1, 5), ",")
          .as("first5"))
      .orderBy($"n_name")
  }

  val qStringAggSql: String =
    """SELECT n_name, COUNT(*) AS n_cust,
      |  array_to_string(list_sort(list(c_name))[1:5], ',') AS first5
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Scalable quantile bucketing — the 100 TB counterpart of
    * [[qNtile]]: instead of a total order per group, compute the
    * three quartile BOUNDARIES with one combinable aggregate, join
    * the (groups × 1 row) boundary table back, and assign each row's
    * quartile with three integer comparisons. No window, no sort; two
    * linear scans and a broadcast-sized join. Boundary comparison is
    * exact: values are integer cents, boundaries are interpolated
    * quartiles scaled ×100 to bigint (the q_percentiles idiom), and
    * `vc·100 > p` is integer-vs-integer on both engines. Ties AT a
    * boundary all land in the lower bucket, so bucket populations can
    * differ from NTILE's forced-equal split — that is the documented
    * semantic trade for scale-correctness. */
  def qQuartileBucket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val v = Tables.events(s, dir)
      .select($"event_type", round($"value" * 100).cast("long").as("vc"))
    val bounds = v.groupBy($"event_type").agg(
      expr("CAST(percentile(vc, 0.25) * 100 AS BIGINT)").as("p25"),
      expr("CAST(percentile(vc, 0.5) * 100 AS BIGINT)").as("p50"),
      expr("CAST(percentile(vc, 0.75) * 100 AS BIGINT)").as("p75"))
    v.join(broadcast(bounds), "event_type")
      .withColumn("quartile",
        lit(1) + ($"vc" * 100 > $"p25").cast("int")
          + ($"vc" * 100 > $"p50").cast("int")
          + ($"vc" * 100 > $"p75").cast("int"))
      .groupBy($"event_type", $"quartile")
      .agg(count(lit(1)).as("n"), sum($"vc").as("sum_vc"))
      .orderBy($"event_type", $"quartile")
  }

  val qQuartileBucketSql: String =
    """WITH v AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events),
      |b AS (SELECT event_type,
      |        CAST(QUANTILE_CONT(vc, 0.25) * 100 AS BIGINT) AS p25,
      |        CAST(QUANTILE_CONT(vc, 0.5) * 100 AS BIGINT) AS p50,
      |        CAST(QUANTILE_CONT(vc, 0.75) * 100 AS BIGINT) AS p75
      |      FROM v GROUP BY 1)
      |SELECT event_type,
      |  1 + CAST(vc*100 > p25 AS INT) + CAST(vc*100 > p50 AS INT)
      |    + CAST(vc*100 > p75 AS INT) AS quartile,
      |  COUNT(*) AS n, CAST(SUM(vc) AS BIGINT) AS sum_vc
      |FROM v JOIN b USING (event_type)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  /** Fixed-width price histogram per priority class (the profiling /
    * distribution-report shape). Bin id is integer cents DIV a
    * constant width, so binning is one codegen'd expression and the
    * whole query is a single map-side-combinable aggregate over
    * ~groups × bins keys — no sort, no window, scale-free. */
  def qHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderpriority",
        round($"o_totalprice" * 100).cast("long").as("pc"))
      .groupBy($"o_orderpriority", expr("pc DIV 2500000").as("bin"))
      .agg(count(lit(1)).as("n"), sum($"pc").as("sum_pc"))
      .orderBy($"o_orderpriority", $"bin")
  }

  val qHistogramSql: String =
    """SELECT o_orderpriority, pc // 2500000 AS bin, COUNT(*) AS n,
      |  CAST(SUM(pc) AS BIGINT) AS sum_pc
      |FROM (SELECT o_orderpriority,
      |        CAST(ROUND(o_totalprice*100) AS BIGINT) AS pc FROM orders)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  /** UNPIVOT / melt: the wide per-flag report re-shaped long — one
    * (key, measure, value) row per measure, the form every
    * ML-feature or export pipeline wants. `stack` is a codegen'd
    * row-expansion (×3 here), not a join or shuffle; the only
    * exchange is the report aggregate's own. */
  def qUnpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(sum($"l_quantity".cast("long")).as("sum_qty"),
        count(lit(1)).as("n_items"),
        sum(round($"l_discount" * 100).cast("long")).as("sum_disc_c"))
      .select($"l_returnflag", expr(
        """stack(3, 'sum_qty', sum_qty, 'n_items', n_items,
          |         'sum_disc_c', sum_disc_c) AS (measure, val)""".stripMargin))
      .orderBy($"l_returnflag", $"measure")
  }

  val qUnpivotSql: String =
    """WITH w AS (SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |    COUNT(*) AS n_items,
      |    CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_disc_c
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, measure, val FROM (
      |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM w
      |  UNION ALL
      |  SELECT l_returnflag, 'n_items', n_items FROM w
      |  UNION ALL
      |  SELECT l_returnflag, 'sum_disc_c', sum_disc_c FROM w)
      |ORDER BY l_returnflag, measure""".stripMargin

  // ---------------------------------------------------------------
  /** Skyline (Pareto frontier): orders not dominated on
    * (price low, date early) — no other order is ≤ on both axes and
    * < on at least one. The naive formulation is the O(n²)
    * NOT EXISTS self-join the oracle runs; this plan is the
    * distributed sort-based skyline, reusing [[qNtile]]'s
    * histogram-split machinery:
    *
    *  1. rows land in price-range CELLS via broadcast approximate
    *     split points (accuracy → balance only);
    *  2. within a cell, a RANGE-frame running `min(od)` over strictly
    *     cheaper rows plus a same-price group min decide local
    *     dominance — sorts are cell-bounded;
    *  3. across cells, each cell's min date cumulated over PRECEDING
    *     cells (a ≤cells-row control-plane window) decides dominance
    *     by any cheaper cell.
    *
    * Ties surviving on both axes are kept, matching NOT EXISTS
    * semantics exactly. */
  def qSkyline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).select($"o_orderkey",
      round($"o_totalprice" * 100).cast("long").as("pc"),
      // o_orderdate surfaces as TIMESTAMP_NTZ; the session runs UTC so
      // the cast to TIMESTAMP is lossless and unix_micros applies
      unix_micros($"o_orderdate".cast("timestamp")).as("od"))
    // the shared histogram-cell assignment (RankSplit steps 1-2),
    // including its loud NULL-cell guard
    val withCell = graft.operators.RankSplit
      .assignCells(o, Seq.empty, "pc", NtileSplits)
      .withColumnRenamed("__cell", "cell")
    val wCheaper = Window.partitionBy($"cell").orderBy($"pc")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSamePc = Window.partitionBy($"cell", $"pc")
    val wPrevCells = Window.orderBy($"cell")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prevMin = withCell.groupBy($"cell").agg(min($"od").as("mo"))
      .withColumn("prev_mo", min($"mo").over(wPrevCells))
      .select($"cell", $"prev_mo")
    withCell.join(broadcast(prevMin), "cell")
      .withColumn("m_in", min($"od").over(wCheaper))
      .withColumn("m_pc", min($"od").over(wSamePc))
      .filter(($"m_in".isNull || $"m_in" > $"od") &&
        ($"prev_mo".isNull || $"prev_mo" > $"od") &&
        $"od" === $"m_pc")
      .select($"o_orderkey", $"pc", $"od")
      .orderBy($"pc", $"od", $"o_orderkey")
  }

  val qSkylineSql: String =
    """WITH o AS (SELECT o_orderkey,
      |    CAST(ROUND(o_totalprice*100) AS BIGINT) AS pc,
      |    epoch_us(o_orderdate) AS od FROM orders)
      |SELECT o_orderkey, pc, od FROM o a
      |WHERE NOT EXISTS (SELECT 1 FROM o b
      |  WHERE b.pc <= a.pc AND b.od <= a.od
      |    AND (b.pc < a.pc OR b.od < a.od))
      |ORDER BY pc, od, o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  /** Exact per-row PERCENT_RANK within each priority class — the
    * normalized-score shape feature pipelines feed to models. Rank
    * comes from the shared [[graft.operators.RankSplit]] histogram-
    * split plan (no per-group total sort); the unique o_orderkey
    * tie-break makes RANK ≡ ROW_NUMBER so the (r−1)/(n−1) division
    * matches the window function bit-for-bit on both engines. */
  def qPercentRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).select($"o_orderpriority",
      $"o_orderkey", $"o_totalprice",
      round($"o_totalprice" * 100).cast("long").as("pc"))
    graft.operators.RankSplit.rank(o,
      Seq("o_orderpriority"), "pc", Seq("o_totalprice", "o_orderkey"))
      .withColumn("pr",
        ($"__rank" - 1).cast("double") / ($"__grp_n" - 1))
      .select($"o_orderkey", $"o_orderpriority", $"pc", $"pr")
      .orderBy($"o_orderpriority", $"pc", $"o_orderkey")
  }

  val qPercentRankSql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS pc,
      |  PERCENT_RANK() OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice, o_orderkey) AS pr
      |FROM orders
      |ORDER BY o_orderpriority, pc, o_orderkey""".stripMargin

  // ---------------------------------------------------------------
  /** Exact weighted median: per return flag, the price (in cents) at
    * which the running quantity-weighted mass crosses half the total
    * — the first row, in (price, key) order, with inclusive running
    * weight ≥ ⌈W/2⌉. Uses [[graft.operators.RankSplit.assignCells]]'
    * histogram cells but NOT the full rank: a median needs only the
    * ONE crossing row per group, so the plan finds the crossing CELL
    * from the per-(group, cell) weight totals (a groups × cells
    * control-plane frame) and runs the ordered cumulative sum over
    * THAT CELL ALONE — ~1/splits of the group sorts, where the
    * previous full-rank shape window-sorted every row it was about to
    * throw away (measured isolated sf0.1: 6.5 → ~5.3 s — the sort was
    * only ~20% of the query; the split-digest construction dominates
    * and was separately retuned to accuracy 1000 in RankSplit). The
    * crossing row is a
    * one-predicate filter (running ≥ T, running − own weight < T),
    * unique per group by construction; cell boundaries can't split it
    * (equal prices always share a cell). All arithmetic integer. */
  def qWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, dir).select($"l_returnflag",
      $"l_orderkey", $"l_linenumber",
      round($"l_extendedprice" * 100).cast("long").as("pc"),
      $"l_quantity".cast("long").as("qty"))
    val withCell = graft.operators.RankSplit
      .assignCells(li, Seq("l_returnflag"), "pc")
    val wPrev = Window.partitionBy($"l_returnflag").orderBy($"__cell")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGrp = Window.partitionBy($"l_returnflag")
    val target = withCell.groupBy($"l_returnflag", $"__cell")
      .agg(sum($"qty").as("cw"))
      .withColumn("offw", coalesce(sum($"cw").over(wPrev), lit(0L)))
      .withColumn("total_qty", sum($"cw").over(wGrp))
      .withColumn("t", expr("(total_qty + 1) DIV 2"))
      .filter($"offw" < $"t" && $"offw" + $"cw" >= $"t")
      .select($"l_returnflag", $"__cell", $"offw", $"total_qty", $"t")
    val wCell = Window
      .partitionBy($"l_returnflag", $"__cell")
      .orderBy($"pc", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withCell.join(broadcast(target), Seq("l_returnflag", "__cell"))
      .withColumn("cum_qty", $"offw" + sum($"qty").over(wCell))
      .filter($"cum_qty" >= $"t" && $"cum_qty" - $"qty" < $"t")
      .select($"l_returnflag", $"pc".as("wmedian_pc"),
        $"cum_qty", $"total_qty")
      .orderBy($"l_returnflag")
  }

  val qWeightedMedianSql: String =
    """WITH li AS (SELECT l_returnflag, l_orderkey, l_linenumber,
      |    CAST(ROUND(l_extendedprice*100) AS BIGINT) AS pc,
      |    CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
      |w AS (SELECT *,
      |    SUM(qty) OVER (PARTITION BY l_returnflag
      |      ORDER BY pc, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
      |    SUM(qty) OVER (PARTITION BY l_returnflag) AS tot FROM li)
      |SELECT l_returnflag, pc AS wmedian_pc,
      |  CAST(cumw AS BIGINT) AS cum_qty, CAST(tot AS BIGINT) AS total_qty
      |FROM w
      |WHERE cumw >= (tot + 1) // 2 AND cumw - qty < (tot + 1) // 2
      |ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------
  /** Full-outer reconciliation: per calendar day, order count vs
    * event count, keeping days present on EITHER side — the
    * two-source audit join every warehouse runs between an
    * operational table and its telemetry. One aggregate per side
    * (map-side combinable, day-keyed) then a full-outer join on the
    * tiny day domain; the `side` flag makes one-sided days explicit
    * rather than silently zero-filled. */
  def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val od = Tables.orders(s, dir)
      .groupBy(expr("CAST(to_date(o_orderdate) AS STRING)").as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val ed = Tables.events(s, dir)
      .groupBy(graft.operators.Rollup.dayOfTs.as("day"))
      .agg(count(lit(1)).as("n_events"))
    od.join(ed, Seq("day"), "full_outer")
      .select($"day",
        coalesce($"n_orders", lit(0L)).as("n_orders"),
        coalesce($"n_events", lit(0L)).as("n_events"),
        when($"n_orders".isNull, "events_only")
          .when($"n_events".isNull, "orders_only")
          .otherwise("both").as("side"))
      .orderBy($"day")
  }

  val qFullOuterSql: String =
    """WITH od AS (SELECT STRFTIME(o_orderdate, '%Y-%m-%d') AS day,
      |    COUNT(*) AS n_orders FROM orders GROUP BY 1),
      |ed AS (SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
      |    COUNT(*) AS n_events FROM events GROUP BY 1)
      |SELECT COALESCE(od.day, ed.day) AS day,
      |  COALESCE(n_orders, 0) AS n_orders,
      |  COALESCE(n_events, 0) AS n_events,
      |  CASE WHEN n_orders IS NULL THEN 'events_only'
      |       WHEN n_events IS NULL THEN 'orders_only'
      |       ELSE 'both' END AS side
      |FROM od FULL OUTER JOIN ed ON od.day = ed.day
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  /** Null-safe join semantics (`<=>` / IS NOT DISTINCT FROM): the
    * anonymous (NULL-user) traffic bucket must MATCH its aggregate
    * row instead of silently dropping — the semantic corner plain
    * equi-joins get wrong. Both sides keyed on the nullable user_id;
    * one combinable aggregate each, then the null-safe join keeps
    * the NULL row paired. */
  def qNullsafeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val counts = ev.groupBy($"user_id").agg(count(lit(1)).as("n_events"))
    val vals = ev.groupBy($"user_id".as("uid"))
      .agg(sum(round($"value" * 100).cast("long")).as("sum_c100"))
    counts.join(vals, $"user_id" <=> $"uid")
      .select($"user_id", $"n_events", $"sum_c100",
        $"user_id".isNull.cast("int").as("is_anon"))
      .orderBy($"user_id".asc_nulls_first)
  }

  val qNullsafeJoinSql: String =
    """SELECT c.user_id, n_events, sum_c100,
      |  CAST(c.user_id IS NULL AS INT) AS is_anon
      |FROM (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1) c
      |JOIN (SELECT user_id AS uid,
      |        CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_c100
      |      FROM events GROUP BY 1) v
      |  ON c.user_id IS NOT DISTINCT FROM v.uid
      |ORDER BY c.user_id NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------
  /** Benford first-significant-digit distribution of order totals —
    * the classic fraud/profiling screen. Digit extraction is pure
    * string/integer ops on the cent value; one combinable aggregate
    * over 9 keys. Permille in integer DIV space. */
  def qBenford(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the total rides a window over the 9-row digit aggregate — no
    // second scan, no driver-side count
    Tables.orders(s, dir)
      .select(substring(round($"o_totalprice" * 100).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy($"digit")
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum($"n").over(Window.partitionBy()))
      .withColumn("pm", expr("(1000 * n) DIV total"))
      .drop("total")
      .orderBy($"digit")
  }

  val qBenfordSql: String =
    """SELECT digit, COUNT(*) AS n,
      |  (1000 * COUNT(*)) // (SELECT COUNT(*) FROM orders) AS pm
      |FROM (SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT)
      |        AS VARCHAR), 1, 1) AS INT) AS digit FROM orders)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Exact DISCRETE percentiles (p50/p90 as actually-occurring
    * values, not interpolations) per priority class — the
    * SLA-reporting shape. percentile_disc(p) = the value at rank
    * ⌈p·n⌉ in the total order, so [[graft.operators.RankSplit]]
    * provides it without a per-group sort: filter the two crossing
    * ranks, pivot to columns. Complements q_percentiles (continuous/
    * interpolated). */
  def qPercentileDisc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).select($"o_orderpriority",
      $"o_orderkey", $"o_totalprice",
      round($"o_totalprice" * 100).cast("long").as("pc"))
    graft.operators.RankSplit.rank(o,
      Seq("o_orderpriority"), "pc", Seq("pc", "o_orderkey"))
      .filter($"__rank" === expr("CAST(CEIL(0.5 * __grp_n) AS BIGINT)") ||
        $"__rank" === expr("CAST(CEIL(0.9 * __grp_n) AS BIGINT)"))
      .groupBy($"o_orderpriority")
      .agg(min(when($"__rank" === expr("CAST(CEIL(0.5 * __grp_n) AS BIGINT)"), $"pc"))
        .as("p50_pc"),
        min(when($"__rank" === expr("CAST(CEIL(0.9 * __grp_n) AS BIGINT)"), $"pc"))
          .as("p90_pc"))
      .orderBy($"o_orderpriority")
  }

  // ties in rounded cents: the pc VALUE at a rank is tie-invariant,
  // so the single-column ORDER BY matches the (pc, key) rank exactly
  val qPercentileDiscSql: String =
    """SELECT o_orderpriority,
      |  CAST(ROUND(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_totalprice)*100)
      |    AS BIGINT) AS p50_pc,
      |  CAST(ROUND(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY o_totalprice)*100)
      |    AS BIGINT) AS p90_pc
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  /** Customer order-count distribution (the TPC-H Q13 shape — the one
    * report pattern §2-A still lacked): LEFT outer join so ZERO-order
    * customers are first-class (an inner join silently drops the most
    * interesting bucket), a join-side predicate (non-urgent orders
    * only) that must stay in the JOIN CONDITION (in a WHERE it would
    * turn the outer join back into an inner one), then the two-level
    * aggregate — per customer count, then the count-of-counts.
    *
    * Scale shape: the outer join shuffles both sides on the customer
    * key; the first aggregate groups by that SAME key, so Catalyst
    * reuses the join's partitioning (one exchange each side, none
    * between join and aggregate — spec-pinned); the second aggregate
    * runs on the |distinct counts|-row reduced frame. */
  def qOrderCountDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).select($"c_custkey")
    val ord = Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderpriority")
    cust.join(ord,
        $"c_custkey" === $"o_custkey" &&
          $"o_orderpriority" =!= "1-URGENT", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  val qOrderCountDistSql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY 1)
      |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------
  /** Above-average parts by revenue share (the TPC-H Q11 shape — a
    * per-group aggregate HAVING-compared against a GLOBAL scalar
    * aggregate): parts whose discounted revenue exceeds the corpus
    * mean, with the share in exact integer ppm. Revenue reduces to
    * exact cents·10⁴ per part first; the global total and part count
    * are then a second aggregate OF that reduced frame, re-attached
    * as a broadcast 1-row cross join (never a constant-key window —
    * the house discipline), and both the above-mean predicate
    * (rev·n_parts > total) and the ppm share run in decimal(38,0)/
    * HUGEINT so no revenue scale can overflow them; only exact
    * integers are emitted.
    *
    * Scale shape: ONE part-key combinable shuffle over lineitem;
    * everything after lives on the |parts| frame with a broadcast
    * scalar — the filter can't be pushed below the aggregate (it
    * depends on the total), but it prunes before the presentation
    * sort. */
  def qGlobalShare(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // pin the reduced per-part frame: the global scalar and the final
    // join are two independent subplans — unpinned, each re-runs the
    // corpus scan + part-key shuffle (Explain showed lineitem scanned
    // twice); pinned, the corpus is touched ONCE and both consumers
    // read the |parts|-row frame (the RankSplit cost-contract
    // discipline)
    val rev = Tables.lineitem(s, dir)
      .groupBy($"l_partkey")
      .agg(sum(round($"l_extendedprice" * (lit(1.0) - $"l_discount")
        * 10000).cast("long")).as("rev_c"))
      .localCheckpoint()
    val glob = rev.agg(sum($"rev_c").as("tot_c"),
      count(lit(1)).as("n_parts"))
    rev.crossJoin(broadcast(glob))
      .filter(expr("CAST(rev_c AS DECIMAL(38,0)) * n_parts") >
        expr("CAST(tot_c AS DECIMAL(38,0))"))
      .select($"l_partkey", $"rev_c",
        expr("CAST(CAST(rev_c AS DECIMAL(38,0)) * 1000000" +
          " DIV tot_c AS BIGINT)").as("share_ppm"))
      .orderBy($"rev_c".desc, $"l_partkey")
  }

  val qGlobalShareSql: String =
    """WITH rev AS (SELECT l_partkey,
      |    CAST(SUM(CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000)
      |      AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |tots AS (SELECT CAST(SUM(rev_c) AS BIGINT) AS tot_c,
      |    COUNT(*) AS n_parts FROM rev)
      |SELECT l_partkey, rev_c,
      |  CAST(CAST(rev_c AS HUGEINT) * 1000000 // tot_c AS BIGINT)
      |    AS share_ppm
      |FROM rev CROSS JOIN tots
      |WHERE CAST(rev_c AS HUGEINT) * n_parts > CAST(tot_c AS HUGEINT)
      |ORDER BY rev_c DESC, l_partkey""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_order_count_dist" -> (qOrderCountDist _),
    "q_global_share" -> (qGlobalShare _),
    "q_nullsafe_join" -> (qNullsafeJoin _),
    "q_benford" -> (qBenford _),
    "q_percentile_disc" -> (qPercentileDisc _),
    "q_full_outer" -> (qFullOuter _),
    "q_percent_rank" -> (qPercentRank _),
    "q_weighted_median" -> (qWeightedMedian _),
    "q_histogram" -> (qHistogram _),
    "q_unpivot" -> (qUnpivot _),
    "q_skyline" -> (qSkyline _),
    "q_quartile_bucket" -> (qQuartileBucket _),
    "q_ntile" -> (qNtile _),
    "q_string_agg" -> (qStringAgg _),
    "q_bloom_join" -> (qBloomJoin _),
    "q_set_ops" -> (qSetOps _),
    "q_mode" -> (qMode _),
    "q01_pricing_summary" -> (q01 _),
    "q03_topk_revenue" -> (q03 _),
    "q05_regional_join" -> (q05 _),
    "q_having" -> (qHaving _),
    "q_large_orders" -> (qLargeOrders _),
    "q_waiting_suppliers" -> (qWaitingSuppliers _),
    "q_nation_trade" -> (qNationTrade _),
    "q_returned_customers" -> (qReturnedCustomers _),
    "q_promo_parts" -> (qPromoParts _),
    "q_small_quantity" -> (qSmallQuantity _),
    "q_min_acct_supplier" -> (qMinAcctSupplier _),
    "q_order_priority" -> (qOrderPriority _),
    "q_revenue_forecast" -> (qRevenueForecast _),
    "q_market_share" -> (qMarketShare _),
    "q_nation_profit" -> (qNationProfit _),
    "q_shipmode_priority" -> (qShipmodePriority _),
    "q_promo_revenue" -> (qPromoRevenue _),
    "q_top_supplier" -> (qTopSupplier _),
    "q_part_supplier_census" -> (qPartSupplierCensus _),
    "q_dominant_suppliers" -> (qDominantSuppliers _),
    "q_window_topn" -> (qWindowTopn _),
    "q_window_running" -> (qWindowRunning _),
    "q_distinct_count" -> (qDistinctCount _),
    "q_percentiles" -> (qPercentiles _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_skew_join" -> (qSkewJoin _),
    "q_topn_idiom" -> (qTopnIdiom _),
    "q_shared_scan" -> (qSharedScan _),
    "q_pivot" -> (qPivot _),
    "q_case_pivot" -> (qCasePivot _),
    "q_corr_subquery" -> (qCorrSubquery _),
    "q_asof_join" -> (qAsofJoin _))

  val oracles: Map[String, String] = Map(
    "q_order_count_dist" -> qOrderCountDistSql,
    "q_global_share" -> qGlobalShareSql,
    "q_nullsafe_join" -> qNullsafeJoinSql,
    "q_benford" -> qBenfordSql,
    "q_percentile_disc" -> qPercentileDiscSql,
    "q_full_outer" -> qFullOuterSql,
    "q_percent_rank" -> qPercentRankSql,
    "q_weighted_median" -> qWeightedMedianSql,
    "q_histogram" -> qHistogramSql,
    "q_unpivot" -> qUnpivotSql,
    "q_skyline" -> qSkylineSql,
    "q_quartile_bucket" -> qQuartileBucketSql,
    "q_ntile" -> qNtileSql,
    "q_string_agg" -> qStringAggSql,
    "q_bloom_join" -> qBloomJoinSql,
    "q_set_ops" -> qSetOpsSql,
    "q_mode" -> qModeSql,
    "q01_pricing_summary" -> q01Sql,
    "q03_topk_revenue" -> q03Sql,
    "q05_regional_join" -> q05Sql,
    "q_having" -> qHavingSql,
    "q_large_orders" -> qLargeOrdersSql,
    "q_waiting_suppliers" -> qWaitingSuppliersSql,
    "q_nation_trade" -> qNationTradeSql,
    "q_returned_customers" -> qReturnedCustomersSql,
    "q_promo_parts" -> qPromoPartsSql,
    "q_small_quantity" -> qSmallQuantitySql,
    "q_min_acct_supplier" -> qMinAcctSupplierSql,
    "q_order_priority" -> qOrderPrioritySql,
    "q_revenue_forecast" -> qRevenueForecastSql,
    "q_market_share" -> qMarketShareSql,
    "q_nation_profit" -> qNationProfitSql,
    "q_shipmode_priority" -> qShipmodePrioritySql,
    "q_promo_revenue" -> qPromoRevenueSql,
    "q_top_supplier" -> qTopSupplierSql,
    "q_part_supplier_census" -> qPartSupplierCensusSql,
    "q_dominant_suppliers" -> qDominantSuppliersSql,
    "q_window_topn" -> qWindowTopnSql,
    "q_distinct_count" -> qDistinctCountSql,
    "q_percentiles" -> qPercentilesSql,
    "q_semi_join" -> qSemiJoinSql,
    "q_anti_join" -> qAntiJoinSql,
    "q_rollup" -> qRollupSql,
    "q_cube" -> qCubeSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_skew_join" -> qSkewJoinSql,
    "q_topn_idiom" -> qTopnIdiomSql,
    "q_shared_scan" -> qSharedScanSql,
    "q_pivot" -> qPivotSql,
    "q_case_pivot" -> qCasePivotSql,
    "q_corr_subquery" -> qCorrSubquerySql,
    "q_asof_join" -> qAsofJoinSql,
    "q_window_running" -> qWindowRunningSql)
}
