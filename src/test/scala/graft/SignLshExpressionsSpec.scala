package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.SignLsh
import graft.operators.SimilarityOps
import graft.sources.Tables

class SignLshExpressionsSpec extends SparkSpec {
  import sqlImplicits._

  private val dir = "/root/testdata/sf0.001"
  private val nPlanes = 16

  /** Reference signature computed with plain Scala over the same plane
    * weights — the spec's independent mirror of the expression's integer
    * math (micro components × milli weights, long sums, sign bits).
    */
  private def refSig(emb: Seq[Float]): Long = {
    var sig = 0L
    for (j <- 0 until nPlanes) {
      var d = 0L
      for (i <- emb.indices if i < SimilarityOps.LshDims)
        d += math.floor(emb(i).toDouble * 1000000.0).toLong *
          SignLsh.planeWInt(j, i + 1)
      if (d >= 0L) sig |= 1L << j
    }
    sig
  }

  test("sign_lsh_sig matches the plain-Scala reference on real embeddings") {
    val rows = Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding",
        SignLsh.signLshSig($"embedding", nPlanes, SimilarityOps.LshDims)
          .as("sig"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) === refSig(r.getSeq[Float](1)),
        s"vec ${r.getLong(0)}")
    }
  }

  test("sign_lsh_sig: codegen and interpreted paths agree") {
    val df = Tables.embeddings(spark, dir).limit(50)
      .select(SignLsh.signLshSig($"embedding", nPlanes, 64))
    val withCodegen = df.collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.collect()
      assert(withCodegen.map(_.getLong(0)).toSeq ===
        interpreted.map(_.getLong(0)).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("sign_lsh_sig handles null, empty, and over-length arrays") {
    val df = Seq(
      (0L, Some(Seq.empty[Float])),
      (1L, None: Option[Seq[Float]]),
      (2L, Some(Seq.fill(80)(1f)))) // 16 beyond LshDims: ignored
      .toDF("id", "e")
      .select($"id", SignLsh.signLshSig($"e", nPlanes, 64).as("sig"))
      .collect().sortBy(_.getLong(0))
    // empty array: all dots are 0 -> every sign bit set
    assert(df(0).getLong(1) === (1L << nPlanes) - 1)
    assert(df(1).isNullAt(1))
    val expected = {
      var sig = 0L
      for (j <- 0 until nPlanes) {
        val d = (1 to 64).map(i => 1000000L * SignLsh.planeWInt(j, i)).sum
        if (d >= 0L) sig |= 1L << j
      }
      sig
    }
    assert(df(2).getLong(1) === expected)
  }

  test("sign_lsh_sig is registered as a SQL function with validation") {
    val out = spark.sql(
      "SELECT sign_lsh_sig(array(CAST(1.0 AS FLOAT)), 4, 64)")
      .collect().head.getLong(0)
    assert(out === refSig(Seq(1f)) % 16) // low 4 bits of the same planes
    val tooMany = intercept[AnalysisException](
      spark.sql("SELECT sign_lsh_sig(array(CAST(1.0 AS FLOAT)), 65, 64)"))
    assert(tooMany.getMessage.contains("nPlanes"))
    val badDims = intercept[AnalysisException](
      spark.sql("SELECT sign_lsh_sig(array(CAST(1.0 AS FLOAT)), 16, 0)"))
    assert(badDims.getMessage.contains("dims"))
    val arity = intercept[AnalysisException](
      spark.sql("SELECT sign_lsh_sig(array(CAST(1.0 AS FLOAT)))"))
    assert(arity.getMessage.contains("sign_lsh_sig"))
  }
}
