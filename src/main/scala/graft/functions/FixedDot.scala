package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, FloatType, LongType}

/** Fixed-point dot product of two float arrays: Σ round(aᵢ·bᵢ·1e12) as a
  * long (see [[graft.sim.VectorOps]] for why fixed-point: long addition is
  * associative, so the value is evaluation-order independent and
  * bit-identical to the DuckDB oracle's unnest+SUM form).
  *
  * Exists because the composable form — `aggregate(zip_with(a, b, …))` —
  * runs as interpreted higher-order functions and allocates an intermediate
  * array per row; this expression is a single fused multiply-round-
  * accumulate loop over the two ArrayData buffers, with codegen emitting a
  * call into [[FixedDotOps.dot]]. Measured ~3× on the embedding pair join.
  */
case class FixedDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "fixed_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FixedDotOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FixedDotOps.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FixedDotExpr = copy(left = newLeft, right = newRight)
}

object FixedDotOps {
  private val Scale = 1e12

  /** Fused loop over the shorter length (zip_with semantics would pad with
    * null; embeddings are equal-length so this never triggers). Rounding is
    * half-away-from-zero (floor(x+0.5) / ceil(x−0.5)) — the same convention
    * Spark's ROUND and DuckDB's ROUND apply to doubles; Math.round would
    * differ on exact negative .5 boundaries. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble * Scale
      acc += (if (p >= 0) Math.floor(p + 0.5) else Math.ceil(p - 0.5)).toLong
      i += 1
    }
    acc
  }

  /** Driver-side twin of [[dot]] over plain arrays — the identical op
    * sequence, so constants derived on the driver (IVF centroid norms,
    * probe-cell scores) match the distributed expression bit-for-bit. */
  def dot(a: Array[Float], b: Array[Float]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      val p = a(i).toDouble * b(i).toDouble * Scale
      acc += (if (p >= 0) Math.floor(p + 0.5) else Math.ceil(p - 0.5)).toLong
      i += 1
    }
    acc
  }
}

object FixedDotFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fixed_dot", exprs => FixedDotExpr(exprs(0), exprs(1)), "built-in")

  def fixedDot(a: Column, b: Column): Column = call_function("fixed_dot", a, b)
}

/** Fixed-point squared euclidean distance of a float-array embedding
  * against a double-array centroid: Σ round((aᵢ−cᵢ)²·1e12) as a long —
  * the codegen'd form of `VectorOps.centroidDist`'s
  * `aggregate(zip_with(emb, cent, (x, c) => round((x−c)²·1e12).cast(long)))`
  * fold, which ran as interpreted higher-order functions (HOFs are
  * CodegenFallback) and dominated every centroid-scored query: the k-fold
  * projection was a single 2.7 s stage in sim_silhouette at sf0.1.
  *
  * Null/length semantics mirror the zip_with form exactly: a length
  * mismatch pads the shorter side with nulls there, the lambda maps them
  * to null, and the long fold null-propagates — so ANY mismatch or null
  * element makes the whole sum null here too. Rounding is the
  * [[FixedDotOps.dot]] convention (half-away-from-zero on the double
  * product — matching Spark's and DuckDB's ROUND over the fixtures, as
  * the oracle-green fixed_dot entries established). */
case class FixedSqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "fixed_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FixedSqDistOps.dist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c) =>
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.FixedSqDistOps.dist($a, $c);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FixedSqDistExpr = copy(left = newLeft, right = newRight)
}

object FixedSqDistOps {
  private val Scale = 1e12

  /** Fused (embedding, centroid) loop — see [[FixedSqDistExpr]] for the
    * exact semantics this mirrors. Returns null (boxed) on length mismatch
    * or a null element, like the zip_with fold it replaces. */
  def dist(a: ArrayData, c: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != c.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || c.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - c.getDouble(i)
      val p = d * d * Scale
      acc += (if (p >= 0) Math.floor(p + 0.5) else Math.ceil(p - 0.5)).toLong
      i += 1
    }
    acc
  }
}

object FixedSqDistFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fixed_sqdist", exprs => FixedSqDistExpr(exprs(0), exprs(1)), "built-in")

  def fixedSqDist(a: Column, b: Column): Column =
    call_function("fixed_sqdist", a, b)
}
