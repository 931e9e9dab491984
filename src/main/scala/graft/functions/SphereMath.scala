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

  /** sin(m · π/360000): half-angle sine of a milli-degree difference. */
  def sinHalf(m: Double): Double = {
    val x = m * (math.Pi / 360000)
    val x2 = x * x
    val t = SinCoeffs.init.foldRight(SinCoeffs.last)((c, acc) => c + x2 * acc)
    x * (1.0 + x2 * t)
  }

  /** cos(m · π/180000) clamped at 0 (the poly at ±π/2 is ±7e-11). */
  def cosClamped(m: Double): Double = {
    val x = m * (math.Pi / 180000)
    val x2 = x * x
    val t = CosCoeffs.init.foldRight(CosCoeffs.last)((c, acc) => c + x2 * acc)
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
