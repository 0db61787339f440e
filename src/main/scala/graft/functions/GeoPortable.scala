package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Engine-portable UTM -> WGS84 inverse transverse Mercator.
  *
  * The round-1 inventory only range-checked its geodetic output because
  * DuckDB has no map projections, so the oracle could not see the actual
  * lat/lon values (VERDICT "What's wrong" #3). This object closes that gap:
  * the whole transform — including sine/cosine — is declared once as a tiny
  * expression DAG over IEEE-754 double ops (+ - * / floor sqrt, and a 4-way
  * quadrant CASE), then
  *
  *   - evaluated numerically on the JVM (the Spark UDF path), and
  *   - rendered to DuckDB SQL (the oracle path)
  *
  * from the SAME DAG. IEEE arithmetic is exactly specified, both engines
  * execute the identical operation tree, and every constant is emitted via
  * `Double.toString` (shortest round-tripping form), so the two engines
  * produce BIT-IDENTICAL doubles — the lat/lon columns become ordinary
  * hash-checkable values instead of boolean invariants.
  *
  * Trigonometry cannot use `math.sin` (JVM libm and DuckDB libm may differ
  * by an ulp), so the DAG carries its own kernel: exact-shape range
  * reduction k = floor(x/(pi/2) + 1/2), y = x - k*(pi/2), |y| <= pi/4, then
  * fixed Horner polynomials (Taylor, 8/9 terms — truncation < 1e-16 on the
  * reduced interval) with the quadrant selecting sign/kernel.
  *
  * Formulas: Snyder, Map Projections — A Working Manual (USGS PP 1395),
  * eq. 8-17..8-25 (footpoint latitude method), matching
  * [[GeoUtm.toWgs84]]; re-expresses the reference's pyproj transform
  * (`src/form_calcs.py:288-307`). Accuracy vs GeoUtm is pinned < 1e-9 deg
  * in GeoPortableSpec; absolute truth is anchored in GeoUtmSpec (quarter
  * meridian, central-meridian fixpoints, independent Krueger-series
  * cross-implementation).
  */
object GeoPortable {

  // ------------------------------------------------------------------ DAG
  sealed trait E {
    def +(o: E): E = Add(this, o)
    def -(o: E): E = Sub(this, o)
    def *(o: E): E = Mul(this, o)
    def /(o: E): E = Div(this, o)
  }
  final case class Lit(v: Double) extends E
  final case class Ref(name: String) extends E
  final case class Add(a: E, b: E) extends E
  final case class Sub(a: E, b: E) extends E
  final case class Mul(a: E, b: E) extends E
  final case class Div(a: E, b: E) extends E
  final case class Floor(a: E) extends E
  final case class Sqrt(a: E) extends E
  /** Selects s0..s3 by quadrant m (a double holding an exact 0/1/2/3). */
  final case class Case4(m: E, s0: E, s1: E, s2: E, s3: E) extends E

  private implicit def litOf(v: Double): E = Lit(v)

  /** A named computation stage; later stages reference earlier by name. */
  final case class Stage(name: String, expr: E)

  // ------------------------------------------------------------------ eval
  private def eval(e: E, env: collection.Map[String, Double]): Double = e match {
    case Lit(v)    => v
    case Ref(n)    => env(n)
    case Add(a, b) => eval(a, env) + eval(b, env)
    case Sub(a, b) => eval(a, env) - eval(b, env)
    case Mul(a, b) => eval(a, env) * eval(b, env)
    case Div(a, b) => eval(a, env) / eval(b, env)
    case Floor(a)  => math.floor(eval(a, env))
    case Sqrt(a)   => math.sqrt(eval(a, env))
    case Case4(m, s0, s1, s2, s3) =>
      eval(m, env).toInt match {
        case 0 => eval(s0, env)
        case 1 => eval(s1, env)
        case 2 => eval(s2, env)
        case _ => eval(s3, env)
      }
  }

  // ------------------------------------------------------------------ SQL
  private def sql(e: E): String = e match {
    case Lit(v) =>
      // Double.toString round-trips exactly. The CAST is load-bearing: DuckDB
      // parses bare decimal literals as DECIMAL and would evaluate
      // constant-adjacent subtrees in exact decimal arithmetic (observed as
      // 1-ulp drift on the central meridian product); CAST pins the literal
      // to a binary double before any arithmetic touches it.
      s"CAST(${java.lang.Double.toString(v)} AS DOUBLE)"
    case Ref(n)    => n
    case Add(a, b) => s"(${sql(a)} + ${sql(b)})"
    case Sub(a, b) => s"(${sql(a)} - ${sql(b)})"
    case Mul(a, b) => s"(${sql(a)} * ${sql(b)})"
    case Div(a, b) => s"(${sql(a)} / ${sql(b)})"
    case Floor(a)  => s"floor(${sql(a)})"
    case Sqrt(a)   => s"sqrt(${sql(a)})"
    case Case4(m, s0, s1, s2, s3) =>
      s"(CASE CAST(${sql(m)} AS INTEGER) WHEN 0 THEN ${sql(s0)} WHEN 1 THEN ${sql(s1)} " +
        s"WHEN 2 THEN ${sql(s2)} ELSE ${sql(s3)} END)"
  }

  // ------------------------------------------------------------------ trig kernel
  private val HalfPi = 1.5707963267948966 // Double.toString(math.Pi / 2)

  // Taylor coefficients on |y| <= pi/4 (exact rational -> nearest double)
  private val SinC = Seq(
    -1.0 / 6, 1.0 / 120, -1.0 / 5040, 1.0 / 362880,
    -1.0 / 39916800, 1.0 / 6227020800L.toDouble, -1.0 / 1307674368000L.toDouble)
  private val CosC = Seq(
    -0.5, 1.0 / 24, -1.0 / 720, 1.0 / 40320, -1.0 / 3628800,
    1.0 / 479001600, -1.0 / 87178291200L.toDouble, 1.0 / 20922789888000L.toDouble)

  /** Horner chain c_n..c_1 over y2, then scaled: head + y2*(c1 + y2*(...)). */
  private def horner(y2: E, coeffs: Seq[Double]): E =
    coeffs.reverse.foldLeft(None: Option[E]) { (acc, c) =>
      Some(acc.fold(Lit(c): E)(inner => Lit(c) + y2 * inner))
    }.get

  /** sin(y)/cos(y) kernels on the reduced interval. */
  private def sinKernel(y: E, y2: E): E = y + y * (y2 * horner(y2, SinC))
  private def cosKernel(y2: E): E = Lit(1.0) + y2 * horner(y2, CosC)

  /** Emits stages computing sin(<arg>) as `<out>`, using <out>_k/_y/_y2/_m
    * scratch names. Quadrant m = k mod 4 (k = nearest multiple of pi/2). */
  private def sinStages(out: String, arg: E): Seq[Stage] = {
    val k = s"${out}_k"; val y = s"${out}_y"; val y2 = s"${out}_y2"; val m = s"${out}_m"
    Seq(
      Stage(k, Floor(arg / HalfPi + Lit(0.5))),
      Stage(y, arg - Ref(k) * HalfPi),
      Stage(y2, Ref(y) * Ref(y)),
      Stage(m, Ref(k) - Lit(4.0) * Floor(Ref(k) * Lit(0.25))),
      Stage(out, Case4(Ref(m),
        sinKernel(Ref(y), Ref(y2)),
        cosKernel(Ref(y2)),
        Lit(0.0) - sinKernel(Ref(y), Ref(y2)),
        Lit(0.0) - cosKernel(Ref(y2)))))
  }

  /** cos(x) = sin-kernel machinery with the quadrant rotated by one. */
  private def cosStages(out: String, arg: E): Seq[Stage] = {
    val k = s"${out}_k"; val y = s"${out}_y"; val y2 = s"${out}_y2"; val m = s"${out}_m"
    Seq(
      Stage(k, Floor(arg / HalfPi + Lit(0.5))),
      Stage(y, arg - Ref(k) * HalfPi),
      Stage(y2, Ref(y) * Ref(y)),
      Stage(m, Ref(k) - Lit(4.0) * Floor(Ref(k) * Lit(0.25))),
      Stage(out, Case4(Ref(m),
        cosKernel(Ref(y2)),
        Lit(0.0) - sinKernel(Ref(y), Ref(y2)),
        Lit(0.0) - cosKernel(Ref(y2)),
        sinKernel(Ref(y), Ref(y2)))))
  }

  // ------------------------------------------------------------------ ellipsoid constants
  // Computed once in doubles; the SQL render re-emits the exact same bits.
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F)
  private val E4 = E2 * E2
  private val E6 = E4 * E2
  private val Ep2 = E2 / (1 - E2)
  private val K0 = 0.9996
  private val MuDen = A * (1 - E2 / 4 - 3 * E4 / 64 - 5 * E6 / 256)
  private val E1c = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
  private val P1 = 3 * E1c / 2 - 27 * E1c * E1c * E1c / 32
  private val P2 = 21 * E1c * E1c / 16 - 55 * E1c * E1c * E1c * E1c / 32
  private val P3 = 151 * E1c * E1c * E1c / 96
  private val P4 = 1097 * E1c * E1c * E1c * E1c / 512
  private val A1mE2 = A * (1 - E2)
  private val Rad = 0.017453292519943295  // Double.toString(math.Pi / 180)
  private val Deg = 57.29577951308232     // Double.toString(180 / math.Pi)

  /** The full inverse program over inputs Ref(e), Ref(n), Ref(zcm)
    * (zcm = central meridian in radians, precomputed from the zone). */
  private val program: Seq[Stage] = {
    val pre = Seq(
      Stage("g_x", Ref("g_e") - Lit(500000.0)),
      Stage("g_mu", Ref("g_n") / Lit(K0) / Lit(MuDen)))
    val phi1 =
      sinStages("g_s2", Ref("g_mu") * Lit(2.0)) ++
        sinStages("g_s4", Ref("g_mu") * Lit(4.0)) ++
        sinStages("g_s6", Ref("g_mu") * Lit(6.0)) ++
        sinStages("g_s8", Ref("g_mu") * Lit(8.0)) :+
        Stage("g_phi1", Ref("g_mu") + Lit(P1) * Ref("g_s2") + Lit(P2) * Ref("g_s4")
          + Lit(P3) * Ref("g_s6") + Lit(P4) * Ref("g_s8"))
    val foot =
      sinStages("g_sin1", Ref("g_phi1")) ++ cosStages("g_cos1", Ref("g_phi1")) ++ Seq(
        Stage("g_tan1", Ref("g_sin1") / Ref("g_cos1")),
        Stage("g_c1", Lit(Ep2) * Ref("g_cos1") * Ref("g_cos1")),
        Stage("g_t1", Ref("g_tan1") * Ref("g_tan1")),
        Stage("g_w", Sqrt(Lit(1.0) - Lit(E2) * Ref("g_sin1") * Ref("g_sin1"))),
        Stage("g_n1", Lit(A) / Ref("g_w")),
        Stage("g_r1", Lit(A1mE2) / (Ref("g_w") * Ref("g_w") * Ref("g_w"))),
        Stage("g_d", Ref("g_x") / (Ref("g_n1") * Lit(K0))),
        Stage("g_d2", Ref("g_d") * Ref("g_d")))
    val out = Seq(
      Stage("g_phi", Ref("g_phi1") - (Ref("g_n1") * Ref("g_tan1") / Ref("g_r1")) * (
        Ref("g_d2") / Lit(2.0)
          - (Lit(5.0) + Lit(3.0) * Ref("g_t1") + Lit(10.0) * Ref("g_c1")
             - Lit(4.0) * Ref("g_c1") * Ref("g_c1") - Lit(9.0) * Lit(Ep2))
            * Ref("g_d2") * Ref("g_d2") / Lit(24.0)
          + (Lit(61.0) + Lit(90.0) * Ref("g_t1") + Lit(298.0) * Ref("g_c1")
             + Lit(45.0) * Ref("g_t1") * Ref("g_t1") - Lit(252.0) * Lit(Ep2)
             - Lit(3.0) * Ref("g_c1") * Ref("g_c1"))
            * Ref("g_d2") * Ref("g_d2") * Ref("g_d2") / Lit(720.0))),
      Stage("g_lam", Ref("g_zcm") + (Ref("g_d")
        - (Lit(1.0) + Lit(2.0) * Ref("g_t1") + Ref("g_c1"))
          * Ref("g_d2") * Ref("g_d") / Lit(6.0)
        + (Lit(5.0) - Lit(2.0) * Ref("g_c1") + Lit(28.0) * Ref("g_t1")
           - Lit(3.0) * Ref("g_c1") * Ref("g_c1") + Lit(8.0) * Lit(Ep2)
           + Lit(24.0) * Ref("g_t1") * Ref("g_t1"))
          * Ref("g_d2") * Ref("g_d2") * Ref("g_d") / Lit(120.0)) / Ref("g_cos1")),
      Stage("g_lat", Ref("g_phi") * Lit(Deg)),
      Stage("g_lon", Ref("g_lam") * Lit(Deg)))
    pre ++ phi1 ++ foot ++ out
  }

  /** Central meridian in radians for a zone — mirrored exactly in SQL. */
  private def cmRad(zone: Double): Double = (-183.0 + 6.0 * zone) * Rad

  // ------------------------------------------------------------------ public: JVM path
  /** (easting, northing, zone) -> (latDeg, lonDeg); bit-identical to the
    * SQL emitted by [[inverseSqlStages]]. */
  def inverse(easting: Double, northing: Double, zone: Int): (Double, Double) = {
    val env = collection.mutable.HashMap[String, Double](
      "g_e" -> easting, "g_n" -> northing, "g_zcm" -> cmRad(zone.toDouble))
    program.foreach(s => env(s.name) = eval(s.expr, env))
    (env("g_lat"), env("g_lon"))
  }

  /** struct(lat, lon) column from easting/northing/zone columns. */
  val wgs84FromUtm: (Column, Column, Column) => Column = {
    val f = udf((e: Double, n: Double, z: Int) => inverse(e, n, z))
    (e, n, z) => f(e, n, z)
  }

  // ------------------------------------------------------------------ public: Java codegen path
  /** Renders the transform as a block of Java statements over declared
    * inputs — the third backend of the same DAG (whole-stage codegen).
    * Java `double` arithmetic and `Math.floor`/`Math.sqrt` are the same
    * IEEE operations the interpreter and the SQL render use, so all three
    * backends produce identical bits.
    *
    * @param p      unique variable prefix (codegen term names)
    * @param eVar   Java expression for the easting (double)
    * @param nVar   Java expression for the northing (double)
    * @param zVar   Java expression for the zone (int)
    * @return (statements, latVar, lonVar)
    */
  def javaBody(p: String, eVar: String, nVar: String, zVar: String): (String, String, String) = {
    def jl(v: Double): String = {
      val s = java.lang.Double.toString(v)
      if (s.contains("E") || s.contains(".")) s else s + ".0"
    }
    def j(e: E): String = e match {
      case Lit(v)    => jl(v)
      case Ref(n)    => s"${p}_$n"
      case Add(a, b) => s"(${j(a)} + ${j(b)})"
      case Sub(a, b) => s"(${j(a)} - ${j(b)})"
      case Mul(a, b) => s"(${j(a)} * ${j(b)})"
      case Div(a, b) => s"(${j(a)} / ${j(b)})"
      case Floor(a)  => s"java.lang.Math.floor(${j(a)})"
      case Sqrt(a)   => s"java.lang.Math.sqrt(${j(a)})"
      case Case4(m, s0, s1, s2, s3) =>
        val mv = s"((int) ${j(m)})"
        s"($mv == 0 ? ${j(s0)} : $mv == 1 ? ${j(s1)} : $mv == 2 ? ${j(s2)} : ${j(s3)})"
    }
    val header =
      s"""double ${p}_g_e = $eVar;
         |double ${p}_g_n = $nVar;
         |double ${p}_g_zcm = (-183.0 + (6.0 * ((double) $zVar))) * ${jl(Rad)};
         |""".stripMargin
    val body = program.map(s => s"double ${p}_${s.name} = ${j(s.expr)};").mkString("\n")
    (header + body, s"${p}_g_lat", s"${p}_g_lon")
  }

  /** Dev/spec hook: every named stage value for one input. */
  private[graft] def debugStages(easting: Double, northing: Double, zone: Int): Seq[(String, Double)] = {
    val env = collection.mutable.HashMap[String, Double](
      "g_e" -> easting, "g_n" -> northing, "g_zcm" -> cmRad(zone.toDouble))
    program.map { s => env(s.name) = eval(s.expr, env); s.name -> env(s.name) }
  }

  // ------------------------------------------------------------------ public: SQL path
  /** Wraps a relation SQL in the transform, adding `g_lat` / `g_lon`
    * columns computed from the given easting/northing/zone expressions
    * (evaluated against the inner relation's columns).
    *
    * Rendering note: DuckDB textually inlines same-SELECT lateral aliases,
    * so emitting all stages in one SELECT re-expands every reference and
    * the expression tree blows up exponentially (a sin() kernel referenced
    * through phi -> t1 -> tan1 -> sin1 multiplies out to millions of
    * nodes — observed hanging the binder). Instead stages are grouped by
    * dependency depth and each depth becomes its own nested subquery, so a
    * stage is computed once as a projection column and later depths hold
    * real column references. Scratch columns keep their g_ prefix to dodge
    * the alias-shadowing trap. */
  def inverseSql(inner: String, eSql: String, nSql: String, zoneSql: String): String =
    inverseSql(inner, eSql, nSql, zoneSql, "g")

  /** As above with a rename prefix for the emitted columns (`<p>_lat`,
    * `<p>_lon`, scratch `<p>_*`), so two transform points can be stacked in
    * one oracle (e.g. NW + SE corners). The input expressions must not
    * contain the substring `g_`, and the prefix must not turn a scratch
    * name into an inner-relation column (e.g. prefix "nw" over a base
    * table with an `nw_x` column collides with the renamed `g_x` stage —
    * pick an unused prefix like "nwp" — and the prefix itself must not
    * contain "g_", or stacking a second transform would corrupt the first
    * one's renamed columns). */
  def inverseSql(inner: String, eSql: String, nSql: String, zoneSql: String,
                 prefix: String): String = {
    require(!eSql.contains("g_") && !nSql.contains("g_") && !inner.contains("g_") &&
        !zoneSql.contains("g_"),
      "inner relation and input expressions may not contain the substring g_")
    require(!prefix.contains("g_"), "prefix may not contain the substring g_")
    val rendered = inverseSqlRaw(inner, eSql, nSql, zoneSql)
    if (prefix == "g") rendered else rendered.replace("g_", s"${prefix}_")
  }

  private def inverseSqlRaw(inner: String, eSql: String, nSql: String, zoneSql: String): String = {
    val base = s"SELECT *, ($eSql) AS g_e, ($nSql) AS g_n, " +
      s"((CAST(-183.0 AS DOUBLE) + (CAST(6.0 AS DOUBLE) * ($zoneSql))) * " +
      s"CAST(${java.lang.Double.toString(Rad)} AS DOUBLE)) AS g_zcm " +
      s"FROM ($inner)"
    // depth(stage) = 1 + max depth of referenced stages (inputs = depth 0)
    def refs(e: E): Set[String] = e match {
      case Ref(n)            => Set(n)
      case Add(a, b)         => refs(a) ++ refs(b)
      case Sub(a, b)         => refs(a) ++ refs(b)
      case Mul(a, b)         => refs(a) ++ refs(b)
      case Div(a, b)         => refs(a) ++ refs(b)
      case Floor(a)          => refs(a)
      case Sqrt(a)           => refs(a)
      case Case4(m, a, b, c, d) => refs(m) ++ refs(a) ++ refs(b) ++ refs(c) ++ refs(d)
      case _                 => Set.empty
    }
    val depth = collection.mutable.HashMap("g_e" -> 0, "g_n" -> 0, "g_zcm" -> 0)
    program.foreach { s =>
      depth(s.name) = 1 + refs(s.expr).map(depth).foldLeft(0)(math.max)
    }
    val byDepth = program.groupBy(s => depth(s.name)).toSeq.sortBy(_._1)
    byDepth.foldLeft(base) { case (innerSql, (_, stages)) =>
      val cols = stages.map(s => s"${sql(s.expr)} AS ${s.name}").mkString(", ")
      s"SELECT *, $cols FROM ($innerSql)"
    }
  }
}
