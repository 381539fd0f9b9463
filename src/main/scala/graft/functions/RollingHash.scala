package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (north-star text-analysis
  * operator; the reference has no equivalent — SURVEY.md §2D).
  *
  * h = Σ bytes[i]·B^(n-1-i) mod M with B=131, M=1_000_000_007, computed over
  * the UTF-8 bytes. Implemented as a native Catalyst Expression with
  * `doGenCode` so fingerprinting stays inside whole-stage codegen (a Scala
  * UDF here would break the codegen span and add ser/de per row on what is
  * by definition a full-corpus scan at 100 TB).
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)
}

object RollingHash {
  final val Base = 131L
  final val Mod = 1000000007L

  /** Static helper shared by eval and generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * Base + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    h
  }

  def rolling_hash(c: Column): Column =
    GraftShims.column(RollingHashExpr(GraftShims.expression(c)))
}
