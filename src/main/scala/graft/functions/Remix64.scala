package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** `x * a + b` over longs with two's-complement WRAPPING semantics —
  * the universal multiply-add remix family used to derive the i-th
  * min-hash ordering from one uniform 64-bit shingle hash.
  *
  * Exists because ANSI mode (Spark 4's default) makes the SQL `*`/`+`
  * operators THROW on long overflow, while a hash remix wants the
  * wrap: here the modular arithmetic is the semantics, not an error.
  * Codegen is a single Java multiply-add inside whole-stage codegen
  * (Java longs wrap natively) — a fraction of a fresh xxhash64 per
  * (i, row), which is what the 128-wide min-agg stage of the LSH
  * paths spends its time on.
  */
case class Remix64(child: Expression, a: Long, b: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_remix64"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a bigint input, got ${t.catalogString}")
    }

  override def nullSafeEval(x: Any): Any =
    x.asInstanceOf[Long] * a + b

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"($c * ${a}L + ${b}L)")

  override protected def withNewChildInternal(newChild: Expression)
      : Remix64 = copy(child = newChild)
}

object Remix64 {
  def apply(x: Column, a: Long, b: Long): Column =
    ColumnBridge.column(Remix64(ColumnBridge.expression(x), a, b))
}
