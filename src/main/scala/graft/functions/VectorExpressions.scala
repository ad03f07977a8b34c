package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Native codegen'd vector kernels.
 *
 * The embedding ops (similarity search / near-dup, SURVEY.md §7.2 step 9)
 * reduce to one primitive: a sequential multiply-add fold over two
 * arrays. The `zip_with`+`aggregate` HOF encoding is semantically right
 * but interpreted — ~1 µs/element of lambda dispatch — while flattening
 * to `dims × planes` scalar terms explodes whole-stage codegen (~1 MB
 * compilation units, JIT time >> scan time). `VecDot` is the third way:
 * one compact expression that whole-stage codegen turns into a tight
 * primitive loop, and that stays a single plan node at any `dims`.
 *
 * Fold order is `0.0 + x₀·y₀ + x₁·y₁ + …` — bit-identical to the HOF
 * form and to the DuckDB oracle's `list_reduce(list_prepend(0, …))`,
 * so scores hash-match across engines.
 *
 * Null discipline: element-level nulls are not expected (embedding
 * fixtures are dense); a null *array* yields null.
 */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | LongType | IntegerType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs numeric arrays, got ${left.dataType} / ${right.dataType}")
  }

  @inline private def get(a: ArrayData, dt: DataType, i: Int): Double = dt match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case LongType    => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case other       => throw new IllegalStateException(s"vec_dot: $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val lt = elemType(left)
    val rt = elemType(right)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(x, lt, i) * get(y, rt, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def getter(arr: String, dt: DataType, i: String) = dt match {
        case FloatType   => s"(double) $arr.getFloat($i)"
        case DoubleType  => s"$arr.getDouble($i)"
        case LongType    => s"(double) $arr.getLong($i)"
        case IntegerType => s"(double) $arr.getInt($i)"
        case other       => throw new IllegalStateException(s"vec_dot: $other")
      }
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(a, elemType(left), i)} * ${getter(b, elemType(right), i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Sequential-fold dot product as a `Column`. */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
