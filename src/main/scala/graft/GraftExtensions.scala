package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, Md5Long60}

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions as SQL functions so `spark.sql("SELECT cosine_sim(a, b)")`
  * works next to the Column API
  * ([[graft.functions.vector.cosineSim]]).
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (or the `--conf` equivalent on spark-submit).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) =>
        CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("md5long60"),
      new ExpressionInfo(classOf[Md5Long60].getName, "md5long60"),
      (children: Seq[Expression]) => Md5Long60(children.head)))
  }
}
