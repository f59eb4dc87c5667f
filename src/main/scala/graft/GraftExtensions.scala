package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression,
  ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineSimilarity, Md5Long60, WinnowFingerprints}

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions as SQL functions so `spark.sql("SELECT cosine_sim(a, b)")`
  * works next to the Column API
  * ([[graft.functions.vector.cosineSim]]).
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (or the `--conf` equivalent on spark-submit).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Wrong arity must surface as an AnalysisException with the expected
    * signature (like every built-in function), not as an
    * IndexOutOfBoundsException from the builder reaching for a missing
    * child.
    */
  private def requireArity(name: String, expected: Int,
                           children: Seq[Expression]): Unit =
    if (children.length != expected)
      throw new AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"),
        None)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        requireArity("cosine_sim", 2, children)
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("md5long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5long60"),
      (children: Seq[Expression]) => {
        requireArity("md5long60", 1, children)
        Md5Long60(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName,
        "winnow_fingerprints"),
      (children: Seq[Expression]) => {
        requireArity("winnow_fingerprints", 4, children)
        def intLit(i: Int, name: String): Int = children(i) match {
          case Literal(v: Int, IntegerType) => v
          case _ => throw new AnalysisException(
            "NON_FOLDABLE_ARGUMENT",
            Map("funcName" -> "`winnow_fingerprints`",
              "paramName" -> s"`$name`", "paramType" -> "\"INT\""),
            None)
        }
        WinnowFingerprints(children.head, intLit(1, "k"), intLit(2, "w"),
          intLit(3, "mod").toLong)
      }))
  }
}
