package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  FloatType}

/** Native cosine similarity over two `array<float>` embedding columns,
  * accumulated in double precision.
  *
  * Why a custom Catalyst `Expression` (SURVEY.md §7.3 preference order
  * (b)): the built-in way to express this — `aggregate(zip_with(...))` —
  * is a higher-order function, and higher-order functions are
  * `CodegenFallback`: every row pays interpreted lambda dispatch plus an
  * intermediate array allocation for the zipped products. This kernel is
  * the hot loop of pairwise similarity over O(candidate-pairs) rows, so
  * it earns `doGenCode`: one fused scalar loop, no allocation, inside
  * whole-stage codegen.
  *
  * Semantics (bit-for-bit vs the DuckDB oracle): sequential left-to-
  * right accumulation of dot and both squared norms, then
  * `dot / (sqrt(na) * sqrt(nb))` — the exact association order the
  * oracle SQL mirrors. Null array → null; null *elements* are not
  * expected (embedding vectors are dense) and read as 0. Zero-norm
  * input yields NaN, as in the fold-based formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi;
         |  $na += $xi * $xi;
         |  $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Exact milli-domain integer inner product of two `array<float>`
  * columns: Σ ⌊x·1000⌋·⌊y·1000⌋ as LONG — the MIPS scoring kernel
  * ([[graft.operators.SimilarityOps.mipsTopK]]).
  *
  * Same custom-Expression rationale as [[CosineSimilarity]]: the
  * built-in `aggregate(zip_with(...))` fold is CodegenFallback —
  * interpreted lambda dispatch plus an intermediate array per row,
  * paid on every scanned vector of a retrieval pass. Here it is one
  * fused long loop in whole-stage codegen, and it also skips
  * materializing milli-vector array columns entirely (the floor is
  * inside the loop).
  *
  * Exactness: each term |⌊x·1000⌋·⌊y·1000⌋| ≤ 10⁶ for the milli
  * component range, and the LONG accumulator is exact at any
  * dimensionality — no doubles anywhere past the floor.
  */
case class MilliDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"milli_dot requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "milli_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      val xi = math.floor(x.getFloat(i).toDouble * 1000.0).toLong
      val yi = math.floor(y.getFloat(i).toDouble * 1000.0).toLong
      dot += xi * yi
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = (long) java.lang.Math.floor(
         |    (double) $a.getFloat($i) * 1000.0);
         |  long $yi = (long) java.lang.Math.floor(
         |    (double) $b.getFloat($i) * 1000.0);
         |  $dot += $xi * $yi;
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MilliDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the vector expressions. */
object vector {
  /** Cosine similarity of two `array<float>` columns, in double. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Exact milli-domain integer inner product, in long. */
  def milliDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(MilliDotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
