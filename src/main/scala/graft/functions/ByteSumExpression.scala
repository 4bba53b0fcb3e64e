package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: sum of the unsigned byte values of a
  * binary column — the decode-stub kernel of the multimodal operators
  * ([[Multimodal.decodeFeatures]] / [[Multimodal.sampleFrames]]).
  *
  * Replaces the previous `rdd.mapPartitions` formulation: as an
  * expression the byte loop runs INSIDE WholeStageCodegen, so the
  * multimodal "decode" stays in Tungsten rows end-to-end (no
  * DataFrame→RDD→DataFrame encoder round-trip), composes with
  * `substring` for per-frame windows, and keeps predicate pushdown /
  * column pruning on the scan. A real codec would swap this kernel for
  * an `mapInArrow` stage; the surrounding plumbing is unchanged.
  *
  * Registered as SQL function `graft_byte_sum` via [[ByteSum.register]].
  */
case class ByteSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_byte_sum needs a binary input, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_byte_sum"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc += (bytes(i) & 0xff); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $c.length; $i++) {
         |  $acc += ($c[$i] & 0xff);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteSum =
    copy(child = newChild)
}

object ByteSum {
  /** Register `graft_byte_sum(binary)` in the session's function
    * registry for use from `expr(...)` and `spark.sql(...)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_byte_sum"),
      new ExpressionInfo(classOf[ByteSum].getName, "graft_byte_sum"),
      (exprs: Seq[Expression]) => ByteSum(exprs.head))
}
