package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `vec_dot(a, b)` — dot product of two double arrays as a native Catalyst
  * expression with whole-stage codegen.
  *
  * This replaces a Scala UDF on the engine's hottest inner loop (the n²
  * candidate-pair prefilter in embedding dedup): a UDF costs a
  * serialize/boxing round trip per row and blocks codegen, while this
  * expression compiles to a primitive `for` loop over the columnar
  * `ArrayData` — the "custom Expression beats UDF" rung of the extension
  * ladder (SURVEY §4.2). Null propagation follows standard binary-expression
  * semantics (null in → null out, §2.C parity).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def elementsNullable(dt: DataType): Boolean = dt match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true // unresolved/invalid — be conservative
  }

  /** Nullable whenever a null can come OUT: a null input array (child
    * nullability) or a null element (ArrayType.containsNull) — a non-nullable
    * child can still hold null elements (e.g. `array(nullableCol)`), so the
    * default `left.nullable || right.nullable` alone would declare
    * non-nullable while nullSafeEval returns null. */
  override def nullable: Boolean =
    left.nullable || right.nullable ||
      elementsNullable(left.dataType) || elementsNullable(right.dataType)

  // A null ELEMENT in either array nulls the whole result, matching the
  // zip_with/aggregate formulation (null product → null fold) — not 0.0.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0.0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // Emit the element null-check only when elements CAN be null. When
      // `nullable` is false, nullSafeCodeGen declares ev.isNull as the
      // FalseLiteral constant — assigning to it would not compile — and
      // containsNull=false on both sides guarantees isNullAt is never true,
      // so the check is dead anyway.
      val elemNullCheck =
        if (elementsNullable(left.dataType) || elementsNullable(right.dataType))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $elemNullCheck
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  val name = "graft_vec_dot"

  private val info = new ExpressionInfo(classOf[VecDot].getName, name)

  private[expressions] val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => VecDot(a, b)
    case other => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${other.size}")
  }

  /** Imperative registration — works on any already-built session (the
    * driver owns session construction in the harness). Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
}

/** SparkSessionExtensions hook — the library-proper wiring for deployments
  * that own the session builder:
  * `SparkSession.builder.withExtensions(new GraftExtensions)`, or config
  * `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (FunctionIdentifier(VecDot.name),
        new ExpressionInfo(classOf[VecDot].getName, VecDot.name),
        VecDot.builder)) // same arity-checked builder as the imperative path
}
