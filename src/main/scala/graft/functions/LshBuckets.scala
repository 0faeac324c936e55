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

/**
 * Native multi-probe set: for each LSH table, the vector's sign bucket AND
 * its query-directed probe (Lv et al., VLDB'07 — the bucket with the
 * LOWEST-|margin| sign bit flipped, ties to the smallest bit index),
 * flattened as array<int> of length 2·nTables: [bkt₀, alt₀, bkt₁, alt₁, …].
 *
 * The expression reuses the projections [[LshBuckets.compute]] already
 * evaluates — ONE pass over the vector yields buckets and probe targets
 * together, replacing the per-(table, bit) `aggregate(zip_with(...))`
 * Column folds the r4 query built (nTables × bitsPerTable extra element
 * loops per query row, re-deriving values the bucketing pass had already
 * computed). Query-side only: the corpus index stays plain [[LshBuckets]].
 * Bit-identical to the Column/SQL margin formulation (argmin by
 * (|proj|, j) — cross-checked in OperatorsSpec).
 */
case class LshBucketProbes(child: Expression, nTables: Int, bitsPerTable: Int)
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
    LshBuckets.computeProbes(input.asInstanceOf[ArrayData], nTables,
      bitsPerTable)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBuckets.computeProbes($c, $nTables, $bitsPerTable)")

  override protected def withNewChildInternal(n: Expression): LshBucketProbes =
    copy(child = n)

  override def prettyName: String = "graft_lsh_bucket_probes"
}

object LshBuckets {

  /** plane coefficient (shared with the Column/SQL formulations) */
  @inline private def coef(p: Int, i: Int): Long = ((p * 73 + i * 37) % 19) - 9

  /** all plane projections of `q` in one element pass */
  private def projections(q: ArrayData, nPlanes: Int): Array[Long] = {
    val n = q.numElements()
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
    proj
  }

  /** static helper shared by interpreted eval and generated code */
  def compute(q: ArrayData, nTables: Int, bitsPerTable: Int): ArrayData = {
    val proj = projections(q, nTables * bitsPerTable)
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

  /** static helper for [[LshBucketProbes]]: [bkt_t, bkt_t ^ (1 << jmin_t)]
    * per table, jmin = argmin_j |proj(t·B + j)| with ties to the smallest j
    * (identical to the struct-min/`least` rules of the Column and SQL
    * formulations) */
  def computeProbes(q: ArrayData, nTables: Int, bitsPerTable: Int): ArrayData = {
    val proj = projections(q, nTables * bitsPerTable)
    val out = new Array[Any](2 * nTables)
    var t = 0
    while (t < nTables) {
      var b = 0
      var jmin = 0
      var mmin = Long.MaxValue
      var j = 0
      while (j < bitsPerTable) {
        val p = proj(t * bitsPerTable + j)
        if (p > 0) b |= (1 << j)
        val m = math.abs(p)
        if (m < mmin) { mmin = m; jmin = j } // strict: ties keep smallest j
        j += 1
      }
      out(2 * t) = b
      out(2 * t + 1) = b ^ (1 << jmin)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** array<int> of per-table sign buckets for quantized vector `q` */
  def lshBuckets(q: Column, nTables: Int, bitsPerTable: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      LshBuckets(org.apache.spark.sql.GraftSqlBridge.expression(q),
        nTables, bitsPerTable))

  /** flat array<int> [bkt₀, alt₀, …] of per-table (bucket, multi-probe)
    * pairs for quantized vector `q` — query-side input of v4's ANN join */
  def lshBucketProbes(q: Column, nTables: Int, bitsPerTable: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      LshBucketProbes(org.apache.spark.sql.GraftSqlBridge.expression(q),
        nTables, bitsPerTable))
}
