package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.Extract

/** Native Catalyst expression for the extraction kernel:
  *
  *   extract_text(binary) -> struct<text string, status string, error string,
  *                                  n_spans int>
  *
  * A scalar Expression (not a Scala UDF): it evaluates directly on the
  * internal binary value with no Row encoding round-trip, is null-safe, and
  * composes with any SQL/DataFrame plan. Evaluation is CodegenFallback —
  * the kernel itself is a black-box JVM call, so splitting the surrounding
  * expressions into codegen and calling through is the standard pattern
  * (the whole-stage pipeline around it stays codegen'd).
  */
case class ExtractTextExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ExtractTextExpr.schema

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"extract_text requires binary input, got ${child.dataType.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val r = Extract(input.asInstanceOf[Array[Byte]])
    InternalRow(
      UTF8String.fromString(r.text),
      UTF8String.fromString(r.status),
      UTF8String.fromString(r.error),
      r.spans.length)
  }

  override def prettyName: String = "extract_text"
  override protected def withNewChildInternal(newChild: Expression): ExtractTextExpr =
    copy(child = newChild)
}

object ExtractTextExpr {
  val schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("error", StringType, nullable = false),
    StructField("n_spans", IntegerType, nullable = false)))
}

/** SparkSessionExtensions hook: enable with
  * `spark.sql.extensions=graft.spark.GraftExtensions` (or call
  * `GraftFunctions.register(spark)` on a live session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.extractTextDescriptor)
  }
}

object GraftFunctions {
  val extractTextDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("extract_text"),
    new ExpressionInfo(classOf[ExtractTextExpr].getName, "extract_text"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "extract_text takes exactly one argument")
      ExtractTextExpr(children.head)
    })

  /** Register on an existing session (tests / driver-created sessions). */
  def register(spark: SparkSession): Unit = {
    val (ident, info, builder) = extractTextDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
