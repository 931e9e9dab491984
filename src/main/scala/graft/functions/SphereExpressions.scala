package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Polynomial haversine over integer milli-degree coordinates as ONE
  * compact codegen'd call: h = sin²(Δδ/2) + cos δa·cos δb·sin²(Δλ/2),
  * arithmetic delegated to `SphereMath` so the value is bit-identical to
  * the SQL polynomial the oracle runs.
  *
  * Why an expression and not the rendered SQL tree (the r6→r7 d18
  * lesson): the refine predicate `h ≤ sin²(r/2)` is — correctly — pushed
  * into the candidate join as its residual condition, and with h spelled
  * as raw SQL the optimizer inlines the two ~30-op Maclaurin trees
  * several times over into one enormous condition; past the codegen
  * method-size limit the whole stage falls back to interpreted eval and
  * the refine runs ~µs/candidate instead of ~ns (measured 41 s at a
  * 7.3M-candidate ladder rung). As a single Expression node the pushed
  * residual stays one static call — pushdown keeps being a win instead
  * of a codegen bomb.
  */
case class HaversineMilli(raA: Expression, decA: Expression,
    raB: Expression, decB: Expression) extends QuaternaryExpression {

  override def prettyName: String = "sphere_haversine"

  override def first: Expression = raA
  override def second: Expression = decA
  override def third: Expression = raB
  override def fourth: Expression = decB

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sphere_haversine expects 4 bigint milli-degree inputs, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(ra: Any, da: Any, rb: Any, db: Any): Any =
    SphereMath.haversine(ra.asInstanceOf[Long], da.asInstanceOf[Long],
      rb.asInstanceOf[Long], db.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ra, da, rb, db) =>
      s"${ev.value} = graft.functions.SphereMath.haversine($ra, $da, $rb, $db);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): HaversineMilli =
    copy(raA = f, decA = s, raB = t, decB = q)
}

object SphereFunctions {
  /** Column-level entry point (the VectorFunctions convention). */
  def haversine(raA: Column, decA: Column, raB: Column, decB: Column): Column =
    Bridge.column(HaversineMilli(Bridge.expression(raA),
      Bridge.expression(decA), Bridge.expression(raB), Bridge.expression(decB)))
}
