package graft.functions

import graft.core.RoutingKeyHash
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `hash_to_range(key)` as a native Catalyst expression with codegen — the
  * engine's routing primitive (reference semantics:
  * common/.../hash/HashHelper.java:117). Generated code calls the static
  * hasher directly, so the expression stays inside whole-stage codegen
  * rather than falling back to a Scala UDF.
  */
case class HashToRange(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hash_to_range expects STRING, got ${child.dataType.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    RoutingKeyHash.hashToRange(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.core.RoutingKeyHash.hashToRange($c.toString())")

  override protected def withNewChildInternal(c: Expression): HashToRange = copy(c)
}

/** `range_bucket(key, n)`: fixed N-way segment index for the key — the
  * write-path partitioner for streams with evenly tiled epochs.
  */
case class RangeBucket(child: Expression, numBuckets: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(v: Any): Any =
    RoutingKeyHash.bucketForKey(v.asInstanceOf[UTF8String].toString, numBuckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.core.RoutingKeyHash.bucketForKey($c.toString(), $numBuckets)")
  override protected def withNewChildInternal(c: Expression): RangeBucket = copy(child = c)
}

object GraftFunctions {
  def hash_to_range(c: Column): Column =
    ColumnShim.column(HashToRange(ColumnShim.expression(c)))

  def range_bucket(c: Column, n: Int): Column =
    ColumnShim.column(RangeBucket(ColumnShim.expression(c), n))
}
