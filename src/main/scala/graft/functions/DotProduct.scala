package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two `array<float|double>` columns.
  *
  * The composed form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is
  * evaluated by the interpreter (higher-order functions don't codegen)
  * and allocates an intermediate products array per row. This expression
  * generates a tight primitive loop inside whole-stage codegen: no
  * allocation, no virtual calls per element — the difference between an
  * embedding scan being compute-bound or interpreter-bound at 100 TB.
  *
  * Semantics match the composed form exactly (same multiply-accumulate
  * order on doubles, so bit-identical results): null input, length
  * mismatch, or a null element yields null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    // every element type the composed zip_with form accepted (it cast
    // elements to double) — narrowing here would break callers that
    // pass array<int>/array<long> columns
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType | IntegerType | LongType |
          ShortType | ByteType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs arrays of numeric elements, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def read(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (av, bv) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = av.numElements()
    if (n != bv.numElements()) null
    else {
      val (lt, rt) = (elemType(left), elemType(right))
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (av.isNullAt(i) || bv.isNullAt(i)) return null
        acc += read(av, lt, i) * read(bv, rt, i)
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(v: String, t: DataType, i: String): String = t match {
      case FloatType => s"(double) $v.getFloat($i)"
      case IntegerType => s"(double) $v.getInt($i)"
      case LongType => s"(double) $v.getLong($i)"
      case ShortType => s"(double) $v.getShort($i)"
      case ByteType => s"(double) $v.getByte($i)"
      case _ => s"$v.getDouble($i)"
    }
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $acc += ${getter(a, lt, i)} * ${getter(b, rt, i)};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the native expressions. */
object GraftFunctions {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** `Σ round(a_i·b_i·1e12)` as a long — see [[MicroDotLong]]. */
  def microDotLong(a: Column, b: Column): Column =
    ColumnBridge.column(MicroDotLong(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}

/** `SparkSessionExtensions` hook: `spark.sql.extensions=
  * graft.functions.GraftExtensions` (or `.withExtensions(new
  * GraftExtensions)`) registers the native functions for SQL use —
  * `SELECT graft_dot(a, b)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def fromColumns(name: String, arity: Int,
      build: Seq[Column] => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(GraftExtensions.getClass.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == arity,
          s"$name expects $arity arguments, got ${children.length}")
        ColumnBridge.expression(build(children.map(ColumnBridge.column)))
      })

  /** The SQL-callable surface: the native codegen'd dot product plus the
    * Column-API scalar functions, re-exposed through the same Catalyst
    * trees the DataFrame API builds — SQL and DataFrame users get
    * identical plans (and identical whole-stage codegen). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) =>
        DotProduct(children.head, children(1))),
    (new FunctionIdentifier("graft_nfkc"),
      new ExpressionInfo(classOf[NfkcNormalize].getName, "graft_nfkc"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_nfkc expects 1 argument, got ${children.length}")
        NfkcNormalize(children.head)
      }),
    fromColumns("graft_cosine", 2, c =>
      graft.similarity.Similarity.cosine(c(0), c(1))),
    fromColumns("graft_vapor_pressure", 2, c =>
      graft.meteo.Meteo.vaporPressure(c(0), c(1))),
    fromColumns("graft_dewpoint", 2, c =>
      graft.meteo.Meteo.dewpointTemperature(c(0), c(1))),
    fromColumns("graft_sat_vapor_pressure", 1, c =>
      graft.meteo.Meteo.saturationVaporPressure(c(0))),
    fromColumns("graft_token_count", 1, c =>
      graft.text.TextAnalysis.tokenCount(c(0))),
    fromColumns("graft_quality_score", 1, c =>
      graft.text.TextAnalysis.qualityScore(c(0))),
    fromColumns("graft_language_id", 1, c =>
      graft.text.TextAnalysis.languageId(c(0))),
    fromColumns("graft_fingerprint", 1, c =>
      graft.text.TextAnalysis.fingerprint(c(0))),
    fromColumns("graft_simhash", 1, c =>
      graft.text.Dedup.simhash(c(0))),
    fromColumns("graft_hamming", 2, c =>
      graft.text.Dedup.hammingDistance(c(0), c(1))))

  /** Register into an already-running session (REPL, tests) — same
    * builders the extensions inject at session construction. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info,
        builder)
    }
}
