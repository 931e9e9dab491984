package graft.functions

/** The ONE definition of the cross-engine polynomial spherical metric —
  * Maclaurin sin/cos tails evaluated with a fixed IEEE operation order,
  * so the SQL strings `SphereSql` renders for DuckDB, the compiled
  * `HaversineMilli` expression, and the specs' brute-force referees all
  * produce bit-identical doubles (no libm is consulted anywhere).
  *
  * Domain: integer milli-degrees — |Δ| ≤ 180000 for the half-angle sine
  * (⇒ |x| ≤ π/2), |dec| ≤ 90000 for the cosine.
  */
object SphereMath {

  /** (-1)^k / (2k+1)! for k = 1..7 — sin tail coefficients. */
  val SinCoeffs: Seq[Double] = Seq(-1.0 / 6, 1.0 / 120, -1.0 / 5040,
    1.0 / 362880, -1.0 / 39916800, 1.0 / 6227020800.0,
    -1.0 / 1307674368000.0)

  /** (-1)^k / (2k)! for k = 1..7 — cos tail coefficients. */
  val CosCoeffs: Seq[Double] = Seq(-1.0 / 2, 1.0 / 24, -1.0 / 720,
    1.0 / 40320, -1.0 / 3628800, 1.0 / 479001600, -1.0 / 87178291200.0)

  // The Horner chains below are hand-unrolled straight-line doubles —
  // this runs inside the per-candidate refine (4 calls per candidate via
  // HaversineMilli), where a foldRight over the boxed Seq would allocate
  // a List + box every coefficient per call (~29M transient Lists at the
  // 7.3M-candidate ladder rung). The scalars are initialized FROM the
  // coefficient Seqs (one source of truth) and the association is the
  // identical c1 + x2·(c2 + x2·(… + x2·c7)) nest foldRight produced, so
  // the IEEE result is bit-unchanged (spec-pinned against the SQL).
  private val s1 = SinCoeffs(0); private val s2 = SinCoeffs(1)
  private val s3 = SinCoeffs(2); private val s4 = SinCoeffs(3)
  private val s5 = SinCoeffs(4); private val s6 = SinCoeffs(5)
  private val s7 = SinCoeffs(6)
  private val c1 = CosCoeffs(0); private val c2 = CosCoeffs(1)
  private val c3 = CosCoeffs(2); private val c4 = CosCoeffs(3)
  private val c5 = CosCoeffs(4); private val c6 = CosCoeffs(5)
  private val c7 = CosCoeffs(6)
  private val SinScale = math.Pi / 360000
  private val CosScale = math.Pi / 180000

  /** sin(m · π/360000): half-angle sine of a milli-degree difference. */
  def sinHalf(m: Double): Double = {
    val x = m * SinScale
    val x2 = x * x
    val t = s1 + x2 * (s2 + x2 * (s3 + x2 * (s4 + x2 * (s5 + x2 * (s6 + x2 * s7)))))
    x * (1.0 + x2 * t)
  }

  /** cos(m · π/180000) clamped at 0 (the poly at ±π/2 is ±7e-11). */
  def cosClamped(m: Double): Double = {
    val x = m * CosScale
    val x2 = x * x
    val t = c1 + x2 * (c2 + x2 * (c3 + x2 * (c4 + x2 * (c5 + x2 * (c6 + x2 * c7)))))
    math.max(1.0 + x2 * t, 0.0)
  }

  /** Haversine h = sin²(Δδ/2) + cos δa · cos δb · sin²(Δλ/2) with the RA
    * wrap folded in. Association matches the rendered SQL exactly:
    * (sd·sd) + (((ca·cb)·sl)·sl). Called from `HaversineMilli`'s
    * generated code — keep it a plain static-forwarded method.
    */
  def haversine(raA: Long, decA: Long, raB: Long, decB: Long): Double = {
    val dl = math.min(math.abs(raA - raB), 360000L - math.abs(raA - raB))
    val sd = sinHalf((decA - decB).toDouble)
    val sl = sinHalf(dl.toDouble)
    val ca = cosClamped(decA.toDouble)
    val cb = cosClamped(decB.toDouble)
    sd * sd + ca * cb * sl * sl
  }
}
