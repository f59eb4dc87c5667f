package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer, Wilkerson, Aiken, SIGMOD'03) as a
  * native expression: polynomial rolling hash over every k-char gram,
  * minimum of each w-window of gram hashes, first-seen-deduplicated.
  *
  * Why a custom Catalyst `Expression` (SURVEY.md §7.3 preference order
  * (b)): the expression-only formulation — nested
  * `transform(sequence(...), aggregate(sequence(...), ...))` — is a
  * higher-order function tower, i.e. CodegenFallback with interpreted
  * lambda dispatch *per character per gram*; measured 37 s for the
  * sf0.01 corpus. This compiled loop does the identical integer math in
  * milliseconds and stays inside whole-stage codegen via a static call.
  *
  * Semantics are mirrored literally by the DuckDB oracle
  * (`list_reduce`-based rolling hash): base 31, modulus 2²⁵ (products
  * stay in int32 range for the oracle), char codes are UTF-16 units =
  * codepoints on the BMP (the corpus contract is ASCII).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, mod: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprints requires a string column, got $t")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprints"

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w, mod)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFingerprints$$.MODULE$$" +
        s".compute($c, $k, $w, ${mod}L);")
}

object WinnowFingerprints {

  /** O(n·k) gram hashing + O(n·w) sliding min, all compiled integer
    * arithmetic. Returns distinct window minima in first-seen order
    * (consumers sort or set-compare; the oracle's `list_distinct` has
    * its own order, so equality is on the SET, which explode + ORDER BY
    * restores).
    */
  def compute(text: UTF8String, k: Int, w: Int, mod: Long): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var a = 0L
      var j = 0
      while (j < k) {
        a = (a * 31L + s.charAt(i + j).toLong) % mod
        j += 1
      }
      hs(i) = a
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (m < w) {
      var mn = hs(0)
      i = 1
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      out.add(mn)
    } else {
      var p = 0
      while (p + w <= m) {
        var mn = hs(p)
        var q = p + 1
        while (q < p + w) { if (hs(q) < mn) mn = hs(q); q += 1 }
        out.add(mn)
        p += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next(); idx += 1 }
    new GenericArrayData(arr)
  }
}
