package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native NFKC Unicode normalization (Unicode UAX #15 compatibility
  * composition) — the normalization SentencePiece applies before
  * training/encoding, and the missing piece for multilingual DEDUP
  * KEYS: full-width forms (`Ａ` → `A`), ligatures (`ﬁ` → `fi`),
  * compatibility digits/spaces, and composed-vs-decomposed accents
  * (`e`+U+0301 → `é`) all fold to one canonical byte sequence, so two
  * renderings of the same text hash together.
  *
  * `java.text.Normalizer` is in the JVM — no dependency — but Spark
  * exposes no builtin for it, so this is a native `UnaryExpression`
  * with `doGenCode` (the [[DotProduct]] pattern): the call stays
  * inside whole-stage codegen instead of dropping the scan out of
  * codegen the way a Scala UDF would. Null in, null out; the ASCII
  * fast path (`Normalizer.isNormalized` is O(n) without allocation
  * for already-normalized text) keeps the common case cheap. */
case class NfkcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nfkc"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"$prettyName needs a string, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NfkcNormalize.nfkc(
      input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.NfkcNormalize" +
        s".nfkc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression)
      : NfkcNormalize = copy(child = newChild)
}

object NfkcNormalize {
  /** The JVM call, shared by eval and generated code. */
  def nfkc(s: String): String =
    if (java.text.Normalizer.isNormalized(s,
        java.text.Normalizer.Form.NFKC)) s
    else java.text.Normalizer.normalize(s,
      java.text.Normalizer.Form.NFKC)

  /** Column-API entry point. */
  def nfkc(c: Column): Column =
    ColumnBridge.column(NfkcNormalize(ColumnBridge.expression(c)))
}
