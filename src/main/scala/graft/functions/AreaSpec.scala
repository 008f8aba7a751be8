package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftx.ColumnBridge

/** The Qserv `qserv_areaspec_{circle,box,poly,ellipse}` region
  * predicates — the SQL surface the reference's users write their
  * selection queries in (published Qserv docs; Wang et al.).
  * Registered as SQL functions by [[graft.GraftExtensions]], so with
  * the extension active a catalog user writes
  *
  * {{{ SELECT * FROM object WHERE areaspec_circle(ra, decl, 180, 20, 25) }}}
  *
  * Each builder returns a tree of BUILT-IN Catalyst expressions
  * (trig, arithmetic, comparisons) — no UDF: the predicate stays
  * inside whole-stage codegen, constant folding collapses the
  * center/axis subtrees when the parameters are literals (the Qserv
  * contract: areaspec arguments are always literal), and the
  * conjuncts remain visible to filter pushdown and partition pruning
  * on a zoned layout. The trees are built at the Catalyst level
  * (not via the Column DSL) because the SQL function registry path
  * receives and must return real `Expression`s — Spark 4's lazy
  * Column nodes never resolve there.
  *
  * The circle is the same wrap-safe haversine (operation order
  * included) as `Spatial.distDeg`, so SQL and DataFrame spatial
  * predicates agree bit-for-bit.
  */
object AreaSpec {

  private val Rad = Literal(0.017453292519943295) // pi/180
  private val Deg = Literal(57.29577951308232)    // 180/pi
  private val Two = Literal(2.0)

  /** Haversine angular distance in degrees — THE haversine tree:
    * `Spatial.distDeg` (the Column face every spatial query uses) and
    * the SQL `areaspec_circle` both delegate here, so DataFrame, SQL
    * function, and (by transcription, parity-checked) DuckDB oracle
    * share one association order: sd·sd + ((cos·cos)·sr)·sr
    * left-associated exactly as the oracles' infix `COS*COS*SIN*SIN`
    * parses — IEEE multiplication is commutative but NOT associative,
    * so the association IS the contract. */
  def distDegExpr(ra1: Expression, dec1: Expression,
    ra2: Expression, dec2: Expression): Expression = {
    val sd = Sin(Divide(Multiply(Subtract(dec1, dec2), Rad), Two))
    val sr = Sin(Divide(Multiply(Subtract(ra1, ra2), Rad), Two))
    val h = Add(Multiply(sd, sd),
      Multiply(Multiply(Multiply(Cos(Multiply(dec1, Rad)),
        Cos(Multiply(dec2, Rad))), sr), sr))
    Multiply(Multiply(Asin(Sqrt(h)), Two), Deg)
  }

  /** Inside the cone: angular distance from (raC, decC) < radius. */
  def circleExpr(ra: Expression, decl: Expression, raC: Expression,
    decC: Expression, radius: Expression): Expression =
    LessThan(distDegExpr(ra, decl, raC, decC), radius)

  /** Inside the half-open ra/dec box [ra1, ra2) × [dec1, dec2). */
  def boxExpr(ra: Expression, decl: Expression, ra1: Expression,
    dec1: Expression, ra2: Expression, dec2: Expression): Expression =
    Seq(GreaterThanOrEqual(ra, ra1), LessThan(ra, ra2),
      GreaterThanOrEqual(decl, dec1), LessThan(decl, dec2))
      .reduce[Expression](And(_, _))

  /** On-or-left of every directed edge of a CCW convex polygon — the
    * half-plane conjunction `qPolySearch` uses, over caller
    * vertices.
    *
    * When every vertex is a literal (the Qserv contract — areaspec
    * arguments always are), the ring is VALIDATED at plan time: a
    * clockwise or non-convex ring would make the conjunction silently
    * empty (or wrong), the kind of no-rows bug a user debugs for an
    * afternoon; failing analysis with the reason beats that. Column
    * vertices skip the check — their values aren't known until run
    * time. */
  def polyExpr(ra: Expression, decl: Expression,
    verts: Seq[(Expression, Expression)]): Expression = {
    require(verts.size >= 3, "areaspec_poly needs at least 3 vertices")
    // SQL numeric literals arrive as Int/Decimal (exact-decimal
    // parsing) and negatives as UnaryMinus before folding
    def const(e: Expression): Option[Double] = e match {
      case Literal(x: Double, _) => Some(x)
      case Literal(x: Int, _) => Some(x.toDouble)
      case Literal(x: Long, _) => Some(x.toDouble)
      case Literal(x: org.apache.spark.sql.types.Decimal, _) =>
        Some(x.toDouble)
      case UnaryMinus(inner, _) => const(inner).map(-_)
      case _ => None
    }
    val lits = verts.map { case (x, y) =>
      (const(x), const(y)) match {
        case (Some(a), Some(b)) => Some((a, b))
        case _ => None
      }
    }
    if (lits.forall(_.isDefined)) {
      val vs = lits.flatten
      val crosses = vs.indices.map { i =>
        val (x1, y1) = vs(i)
        val (x2, y2) = vs((i + 1) % vs.size)
        val (x3, y3) = vs((i + 2) % vs.size)
        (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
      }
      if (crosses.exists(_ < 0))
        throw new IllegalArgumentException(
          if (crosses.forall(_ <= 0))
            "areaspec_poly vertices wind CLOCKWISE — list them counter-clockwise"
          else
            "areaspec_poly vertices are not a convex ring")
    }
    verts.indices.map { i =>
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % verts.size)
      GreaterThanOrEqual(
        Subtract(Multiply(Subtract(x2, x1), Subtract(decl, y1)),
          Multiply(Subtract(y2, y1), Subtract(ra, x1))),
        Literal(0.0))
    }.reduce[Expression](And(_, _))
  }

  /** Inside the ellipse: flat-sky offsets around the center, rotated
    * by position angle `paDeg`, normalized quadratic form < 1.
    * `a`, `b` are semi-axes in degrees. */
  def ellipseExpr(ra: Expression, decl: Expression, raC: Expression,
    decC: Expression, a: Expression, b: Expression,
    paDeg: Expression): Expression = {
    val u = Multiply(Subtract(ra, raC), Cos(Multiply(decC, Rad)))
    val v = Subtract(decl, decC)
    val x = Add(Multiply(u, Cos(Multiply(paDeg, Rad))),
      Multiply(v, Sin(Multiply(paDeg, Rad))))
    val y = Subtract(Multiply(v, Cos(Multiply(paDeg, Rad))),
      Multiply(u, Sin(Multiply(paDeg, Rad))))
    LessThan(Add(Multiply(Divide(x, a), Divide(x, a)),
      Multiply(Divide(y, b), Divide(y, b))), Literal(1.0))
  }

  // --- Column-API faces of the same trees --------------------------
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def circle(ra: Column, decl: Column, raC: Column, decC: Column,
    radius: Column): Column =
    c(circleExpr(e(ra), e(decl), e(raC), e(decC), e(radius)))

  def box(ra: Column, decl: Column, ra1: Column, dec1: Column,
    ra2: Column, dec2: Column): Column =
    c(boxExpr(e(ra), e(decl), e(ra1), e(dec1), e(ra2), e(dec2)))

  def poly(ra: Column, decl: Column, verts: Seq[(Column, Column)]): Column =
    c(polyExpr(e(ra), e(decl), verts.map { case (x, y) => (e(x), e(y)) }))

  def ellipse(ra: Column, decl: Column, raC: Column, decC: Column,
    a: Column, b: Column, paDeg: Column): Column =
    c(ellipseExpr(e(ra), e(decl), e(raC), e(decC), e(a), e(b), e(paDeg)))
}
