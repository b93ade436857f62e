package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Kernel for [[QDistArgmin]]: nearest centroid by exact integer
  * quantized squared L2 — the k-means assignment inner loop as one
  * flat pass instead of k CodegenFallback HOF chains.
  *
  * Math is identical to the zip_with/aggregate composition it
  * replaces ([[graft.operators.KMeans.qdist]]'s original form): the
  * input quantizes once per row (floor(x·10⁶) via double, exact for
  * float inputs), each centroid is pre-quantized ON THE DRIVER with
  * the same floor, distances accumulate in int64 (≤ 64·(2·10⁶)² ≈
  * 2.6e14, far under 2⁶³), and ties take the LOWEST cell id (strict
  * `<` over ascending cells — the array_min struct ordering the
  * composition used). The speedup is structural: Spark's higher-order
  * functions (ZipWith, ArrayAggregate) are CodegenFallback, so the
  * composition pays interpreted lambda dispatch per element per
  * centroid; this kernel is one codegen'd call per row.
  */
object QDistKernel {
  def argmin(arr: ArrayData, cents: Array[Array[Long]], isFloat: Boolean): InternalRow = {
    val n = arr.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      q(i) = math.floor(x * 1000000d).toLong
      i += 1
    }
    var best = Long.MaxValue
    var bc = -1
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      require(cv.length == n, s"dim mismatch: vector $n vs centroid ${cv.length}")
      var s = 0L
      var j = 0
      while (j < n) {
        val d = q(j) - cv(j)
        s += d * d
        j += 1
      }
      if (s < best) { best = s; bc = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bc))
  }

  /** Broadcast-dereferencing entry for [[QDistArgminGrouped]]: the
    * matrices arrive as a torrent broadcast (fetched once per
    * executor, cached by the block manager), so the generated code
    * embeds only the tiny broadcast HANDLE — never the matrices
    * themselves in every task closure. `bc.value` after first access
    * is a lazy-val field read; the √k×dim argmin loop dominates it.
    */
  def argminBc(arr: ArrayData,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Long]]]],
      g: Int, isFloat: Boolean): InternalRow =
    argmin(arr, bc.value(g), isFloat)
}

/** `qdist_argmin(vec)` over a driver-supplied quantized centroid
  * matrix: struct(d = min integer squared distance, cid = argmin cell,
  * lowest id on ties). See [[QDistKernel]].
  */
case class QDistArgmin(child: Expression, cents: Array[Array[Long]])
    extends UnaryExpression {

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = StructType(
    Seq(StructField("d", LongType, nullable = false),
      StructField("cid", IntegerType, nullable = false)))
  override def prettyName: String = "qdist_argmin"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qdist_argmin requires ARRAY<FLOAT|DOUBLE> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    QDistKernel.argmin(input.asInstanceOf[ArrayData], cents, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QDistKernel.argmin($c, $centsRef, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): QDistArgmin =
    copy(child = newChild)
}

/** `qdist_argmin_grouped(vec, group)` — the per-GROUP form of
  * [[QDistArgmin]] for two-level (coarse/fine) quantizers: the row's
  * `group` value (its coarse cell) selects which centroid matrix the
  * argmin runs over, so the per-row cost is |that group's centroids|
  * (≈ √k for a √k×√k hierarchy), never the total centroid count — the
  * structural fix for k-proportional-to-n flat assignment being
  * O(n·k) = O(n²). Same integer math and lowest-id tie rule as
  * [[QDistArgmin]]; groups may be ragged (a sparsely populated coarse
  * cell trains fewer fine centroids).
  *
  * The matrices travel as a TORRENT BROADCAST, not a reference object:
  * `addReferenceObj` serializes its value into every task's closure,
  * and the grouped matrices grow with the corpus (k_total ∝ n/2048 —
  * ~250 MB per closure at the 10⁹-doc regime). The broadcast handle
  * is a few bytes per task; the value ships once per executor.
  */
case class QDistArgminGrouped(vec: Expression, group: Expression,
    bcGroups: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Long]]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = group

  private lazy val isFloat = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = StructType(
    Seq(StructField("d", LongType, nullable = false),
      StructField("cid", IntegerType, nullable = false)))
  override def prettyName: String = "qdist_argmin_grouped"

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, group.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (v, g) => TypeCheckResult.TypeCheckFailure(
      s"qdist_argmin_grouped requires (ARRAY<FLOAT|DOUBLE>, INT), got (${v.simpleString}, ${g.simpleString})")
  }

  @transient private lazy val mats = bcGroups.value

  override def nullSafeEval(v: Any, g: Any): Any =
    QDistKernel.argmin(v.asInstanceOf[ArrayData],
      mats(g.asInstanceOf[Int]), isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bcGroups", bcGroups,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, (v, g) =>
      s"${ev.value} = graft.functions.QDistKernel.argminBc($v, $bcRef, $g, $isFloat);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): QDistArgminGrouped =
    copy(vec = newLeft, group = newRight)
}

object QDistArgmin {
  /** Column wrapper: struct(d, cid) of the nearest centroid; `cents`
    * in original (unquantized) double space — quantized here once,
    * with the exact floor the per-row path applies to the vector.
    */
  def qdistArgmin(vec: Column, cents: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.shims
    val q = cents.map(_.map(x => math.floor(x * 1000000d).toLong))
    shims.column(QDistArgmin(shims.expression(vec), q))
  }

  /** Grouped wrapper: struct(d, cid) of the nearest centroid within
    * the row's group's matrix ([[QDistArgminGrouped]]); `groups` in
    * unquantized double space, quantized once on the driver, then
    * torrent-broadcast (the handle rides the plan; the Spark
    * ContextCleaner reclaims the blocks when the query's plan is
    * garbage-collected).
    */
  def qdistArgminGrouped(vec: Column, group: Column,
      groups: Array[Array[Array[Double]]]): Column = {
    import org.apache.spark.sql.graft.shims
    val q = groups.map(_.map(_.map(x => math.floor(x * 1000000d).toLong)))
    val bc = org.apache.spark.sql.SparkSession.active.sparkContext.broadcast(q)
    shims.column(QDistArgminGrouped(shims.expression(vec),
      shims.expression(group.cast("int")), bc))
  }
}
