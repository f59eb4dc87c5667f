package graft

/** Dev scratch main: queries/oracles map set-diff audit. */
object DevScratch {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size}")
    println(s"queries-without-oracle=${(q -- o).toSeq.sorted}")
    println(s"oracles-without-query=${(o -- q).toSeq.sorted}")
  }
}
