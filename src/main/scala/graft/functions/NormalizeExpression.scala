package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.unsafe.types.UTF8String
import graft.text.Normalizer

/** `normalize(string, entityClass)` as a native Catalyst expression.
  *
  * The normalizer is the single hottest scalar kernel of the ontology build
  * (every synonym row passes through it, SURVEY.md §1.2); as an Expression
  * with `doGenCode` it stays inside whole-stage codegen — no UDF
  * serialization boundary, no codegen fallback — while `nullSafeEval`
  * provides the interpreted path.
  */
case class NormalizeExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_normalize"

  override protected def nullSafeEval(str: Any, cls: Any): Any =
    UTF8String.fromString(
      NormalizeExpression.eval(str.asInstanceOf[UTF8String],
        cls.asInstanceOf[UTF8String]))

  // Generated Java must NOT reference `graft.functions.NormalizeExpression
  // .eval` as a static: scalac suppresses the companion's static forwarder
  // because the class inherits `Expression.eval`, so Janino fails to compile
  // and Spark silently falls back to interpreted execution. The standalone
  // `Normalizer` object has real static forwarders (verified via javap), so
  // the generated code calls the kernel there directly. CodegenSpec pins
  // this: it compiles the generated source with fallback disabled.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, c) =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.text.Normalizer.normalize($s.toString(), $c.toString()));""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NormalizeExpression =
    copy(left = newLeft, right = newRight)
}

object NormalizeExpression {
  /** Static entry shared by the interpreted and generated paths. */
  def eval(s: UTF8String, cls: UTF8String): String =
    Normalizer.normalize(s.toString, cls.toString)
}

/** Same shape for the symbolic classifier. */
case class ClassifySymbolicExpression(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_classify_symbolic"
  override protected def nullSafeEval(str: Any, cls: Any): Any =
    Normalizer.classifySymbolic(str.toString, cls.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, c) =>
      s"${ev.value} = graft.text.Normalizer.classifySymbolic($s.toString(), $c.toString());")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClassifySymbolicExpression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column => toColumn, expression => toExpr}

  /** Column-API entry points (the `org.apache.spark.sql.functions` idiom). */
  def normalize(str: Column, entityClass: Column): Column =
    toColumn(NormalizeExpression(toExpr(str), toExpr(entityClass)))

  def classifySymbolic(str: Column, entityClass: Column): Column =
    toColumn(ClassifySymbolicExpression(toExpr(str), toExpr(entityClass)))

  /** Register for SQL use: `SELECT graft_normalize(syn, 'gene') ...`. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize", exprs => NormalizeExpression(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_classify_symbolic",
      exprs => ClassifySymbolicExpression(exprs(0), exprs(1)), "built-in")
  }
}

/** `SparkSessionExtensions` installer — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_normalize"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NormalizeExpression].getName, "graft_normalize"),
      (exprs: Seq[Expression]) => NormalizeExpression(exprs(0), exprs(1))))
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_classify_symbolic"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ClassifySymbolicExpression].getName, "graft_classify_symbolic"),
      (exprs: Seq[Expression]) => ClassifySymbolicExpression(exprs(0), exprs(1))))
  }
}
