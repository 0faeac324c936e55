package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native 64-bit SimHash over an array of token strings — a custom Catalyst
 * `Expression` with whole-stage codegen (the preferred extension point for
 * scalar functions the built-ins can't express efficiently; SURVEY.md §7.4).
 *
 * Semantics: per token, xxHash64(utf8 bytes, seed 42) votes ±1 on each of
 * 64 bit positions; the fingerprint sets bit i iff the vote sum is positive.
 * Near-duplicate documents land within small Hamming distance.
 *
 * The pure-Column formulation (aggregate over a 64-int vote vector with a
 * 64-way `when` array per token) produces a huge codegen body and allocates
 * two arrays per token; this expression is a tight loop over a stack vote
 * array — ~100× less code and no per-token allocation. Used by the
 * `d8_simhash` operator; the expression-tree version remains in tests as a
 * semantic cross-check.
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hashTokens(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.hashTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

object SimHash64 {

  /** static helper shared by interpreted eval and generated code */
  def hashTokens(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = hashUtf8(s)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** xxHash64(seed=42) over the UTF8 bytes — matches Spark's xxhash64()
    * builtin on a string column, so results agree with the Column-tree
    * formulation `transform(toks, t => xxhash64(t))`. */
  def hashUtf8(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, org.apache.spark.sql.types.StringType, 42L)

  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SimHash64(org.apache.spark.sql.GraftSqlBridge.expression(tokens)))
}
