package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded grouped top-k: keep the k best (score, id) pairs per group
  * in one aggregation pass.
  *
  * The window-function formulation (`row_number over (partition by g
  * order by score desc) <= k`) must SORT every group in full; this
  * `Aggregator` carries a k-element buffer through Spark's standard
  * partial/merge aggregation, so each map-side partition contributes at
  * most k rows to the shuffle regardless of group size — the right
  * shape for "top-k neighbors per query over 100 TB of candidates"
  * (SURVEY.md §7.5). The buffer is a sorted Seq (insertion is O(k),
  * fine for ANN-sized k; swap in a binary heap for k in the thousands).
  *
  * Ordering: score descending, ties to the smaller id — deterministic
  * across retries and partitionings.
  *
  * Usage (typed API):
  * {{{
  *   ds.groupByKey(_.group).agg(TopKAggregator.topK(10).toColumn)
  * }}}
  */
object TopKAggregator {

  /** (score, id); `better(a, b)` = strictly preferable. */
  type Scored = (Double, Long)

  private def better(a: Scored, b: Scored): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def topK(k: Int): Aggregator[Scored, Seq[Scored], Seq[Scored]] =
    new Aggregator[Scored, Seq[Scored], Seq[Scored]] {

      override def zero: Seq[Scored] = Seq.empty

      private def insert(buf: Seq[Scored], v: Scored): Seq[Scored] = {
        if (buf.size >= k && better(buf.last, v)) buf
        else {
          val (front, back) = buf.span(better(_, v))
          (front ++ (v +: back)).take(k)
        }
      }

      override def reduce(buf: Seq[Scored], v: Scored): Seq[Scored] =
        insert(buf, v)

      override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
        b.foldLeft(a)(insert)

      override def finish(buf: Seq[Scored]): Seq[Scored] = buf

      override def bufferEncoder: Encoder[Seq[Scored]] =
        ExpressionEncoder[Seq[Scored]]()

      override def outputEncoder: Encoder[Seq[Scored]] =
        ExpressionEncoder[Seq[Scored]]()
    }
}
