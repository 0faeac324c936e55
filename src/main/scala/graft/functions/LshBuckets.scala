package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/**
 * Native random-hyperplane LSH bucketing: all `nTables` sign-bucket values
 * of a quantized vector in ONE pass over its elements — a custom codegen
 * Expression replacing `nTables × bitsPerTable` separate
 * `aggregate(zip_with(...))` Column trees (which codegen as one full
 * element loop PER PLANE and dominate plan/compile time).
 *
 * Arithmetic is BIT-IDENTICAL to the Column formulation (and to the DuckDB
 * oracle SQL): plane p component i = ((p*73 + i*37) % 19) - 9, bucket bit j
 * of table t set iff dot(q, plane(t*bitsPerTable+j)) > 0. Cross-checked in
 * OperatorsSpec against the expression-tree formulation.
 */
case class LshBuckets(child: Expression, nTables: Int, bitsPerTable: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], nTables, bitsPerTable)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBuckets.compute($c, $nTables, $bitsPerTable)")

  override protected def withNewChildInternal(n: Expression): LshBuckets =
    copy(child = n)

  override def prettyName: String = "graft_lsh_buckets"
}

object LshBuckets {

  /** plane coefficient (shared with the Column/SQL formulations) */
  @inline private def coef(p: Int, i: Int): Long = ((p * 73 + i * 37) % 19) - 9

  /** static helper shared by interpreted eval and generated code */
  def compute(q: ArrayData, nTables: Int, bitsPerTable: Int): ArrayData = {
    val n = q.numElements()
    val nPlanes = nTables * bitsPerTable
    val proj = new Array[Long](nPlanes)
    var i = 0
    while (i < n) {
      val x = q.getLong(i)
      var p = 0
      while (p < nPlanes) {
        proj(p) += x * coef(p, i)
        p += 1
      }
      i += 1
    }
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0
      var j = 0
      while (j < bitsPerTable) {
        if (proj(t * bitsPerTable + j) > 0) b |= (1 << j)
        j += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  /** array<int> of per-table sign buckets for quantized vector `q` */
  def lshBuckets(q: Column, nTables: Int, bitsPerTable: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      LshBuckets(org.apache.spark.sql.GraftSqlBridge.expression(q),
        nTables, bitsPerTable))
}
