package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit polynomial rolling hash of a string's Unicode code points:
  * h = fold(cp => (h * 31 + cp) mod 2^32), h0 = 0.
  *
  * The document-fingerprinting primitive (cheap, incremental, order
  * sensitive — unlike md5 it can be windowed/rolled at 100 TB scan speed).
  * Exactly reproducible in DuckDB as
  * `list_reduce(list(ord(char) ORDER BY pos), (a,x) -> (a*31+x) % 4294967296)`,
  * which is how the t5 oracle checks it bit-for-bit.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  /** Shared by interpreted and generated paths. */
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) & 0xFFFFFFFFL
      i += Character.charCount(cp)
    }
    h
  }
}
