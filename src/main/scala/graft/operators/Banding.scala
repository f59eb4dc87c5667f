package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The banded-LSH candidate-pair join — the ONE shape every near-dup
  * family in this engine generates candidates with (MinHash bands,
  * SimHash pigeonhole bands, sign-LSH bit bands): each row's signature
  * is split into per-band bucket keys, rows sharing any (band, bucket)
  * become a candidate pair, and the pair list is deduplicated. Factored
  * here so the three families share a single definition of the only
  * Exchanges their candidate generation pays.
  *
  * Scale shape: the explode inflates each row ×nBands (bounded, tiny);
  * the self-join shuffles on (band, bucket) — bucket sizes are the
  * quadratic dial the callers' band-width parameters control; dedup is
  * a hash aggregate on (d1, d2). Payload columns (signatures, set
  * sizes) ride THROUGH the join so verification needs no joins back to
  * per-row tables. The dedup formulation is payload-type-dispatched,
  * A/B-measured both ways: scalar payloads go through plain
  * distinct() — group-by-keys-only hash aggregation, no agg buffers
  * (group+first cost SimHash 2.5× warm: two first() buffers per group
  * beat re-hashing two longs); container payloads (MinHash's
  * 16-element signature arrays) go through group+first on (d1, d2) —
  * there, hashing both arrays per pre-dedup row is the expensive side.
  * The payloads are functionally dependent on the pair, so both
  * formulations return identical rows.
  */
object Banding {

  /** Candidate pairs from banded signatures.
    *
    * @param sig      one row per entity, carrying `idCol`, whatever the
    *                 band expressions read, and `payload`
    * @param idCol    entity id column name (pairs come out ordered
    *                 d1 < d2 on it)
    * @param bandVals one Column per band: the band's bucket value
    * @param payload  column names carried through to the output as
    *                 `<name>1` / `<name>2`
    */
  def bandedCandidates(sig: DataFrame, idCol: String,
                       bandVals: Seq[Column],
                       payload: Seq[String] = Nil): DataFrame = {
    val bandRows = bandVals.zipWithIndex.map { case (v, k) =>
      struct(lit(k).as("k"), v.as("band"))
    }
    val carried = col(idCol) +: payload.map(col)
    val bands = sig
      .select(carried :+ explode(array(bandRows: _*)).as("s"): _*)
      .select(carried :+ col("s.k").as("__k") :+
        col("s.band").as("__band"): _*)
    def side(tag: String) = bands.select(
      (col(idCol).as(s"d$tag") +:
        payload.map(p => col(p).as(s"$p$tag"))) :+
        col("__k") :+ col("__band"): _*)
    val joined = side("1").join(side("2"), Seq("__k", "__band"))
      .filter(col("d1") < col("d2"))
    val outCols = "d1" +: "d2" +:
      payload.flatMap(p => Seq(s"${p}1", s"${p}2"))
    val scalarPayload = payload.forall(p =>
      sig.schema(p).dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType => false
        case _ => true
      })
    if (scalarPayload)
      joined.select(outCols.map(col): _*).distinct()
    else {
      val firsts = outCols.drop(2).map(c => first(col(c)).as(c))
      joined.groupBy("d1", "d2").agg(firsts.head, firsts.tail: _*)
    }
  }
}
