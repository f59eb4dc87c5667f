package graft

import org.apache.spark.sql.functions._

import graft.functions.vector.cosineSim

class VectorExpressionsSpec extends SparkSpec {
  import sqlImplicits._

  private val df = Seq(
    (0L, Seq(1f, 0f), Seq(1f, 0f)),     // identical -> 1.0
    (1L, Seq(1f, 0f), Seq(0f, 1f)),     // orthogonal -> 0.0
    (2L, Seq(1f, 0f), Seq(-1f, 0f)),    // opposite -> -1.0
    (3L, Seq(3f, 4f), Seq(4f, 3f)))     // 24/25 = 0.96
    .toDF("id", "a", "b")

  test("cosine_sim: known values, exact in double") {
    val out = df.select($"id", cosineSim($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(0L) === 1.0)
    assert(out(1L) === 0.0)
    assert(out(2L) === -1.0)
    assert(out(3L) === 0.96)
  }

  test("cosine_sim: codegen and interpreted paths agree") {
    val withCodegen = df.select(cosineSim($"a", $"b")).collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = df.select(cosineSim($"a", $"b")).collect()
      assert(withCodegen.map(_.getDouble(0)).toSeq ===
        interpreted.map(_.getDouble(0)).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("milli_dot: floor semantics (negatives down), exact integers, " +
    "equals the HOF fold") {
    import graft.functions.vector.milliDot
    val d = Seq(
      (0L, Seq(1f, 0f), Seq(1f, 0f)),        // 1000*1000
      (1L, Seq(0.5f, -0.25f), Seq(2f, 4f)),  // 500*2000 + (-250)*4000
      (2L, Seq(-1.5f, 0f), Seq(1f, 0f)),     // floor(-1500) = -1500
      (3L, Seq(0.1f, 0.2f), Seq(0.3f, 0.7f)))// float-fuzzed components
      .toDF("id", "a", "b")
    val out = d.select($"id", milliDot($"a", $"b").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) === 1000000L)
    assert(out(1L) === 0L)
    assert(out(2L) === -1500000L)
    // the built-in fold with the same floor tree must agree bit-for-bit
    val fold = d.select($"id",
      aggregate(
        zip_with(
          transform($"a", v => floor(v.cast("double") * lit(1000.0))),
          transform($"b", v => floor(v.cast("double") * lit(1000.0))),
          (x, y) => x * y),
        lit(0L), (acc, t) => acc + t.cast("long")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === fold)
  }

  test("milli_dot: codegen and interpreted paths agree; SQL-registered") {
    import graft.functions.vector.milliDot
    val d = Seq((0L, Seq(0.123f, -0.456f, 0.789f),
      Seq(-0.321f, 0.654f, -0.987f))).toDF("id", "a", "b")
    val withCodegen = d.select(milliDot($"a", $"b")).collect()
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = d.select(milliDot($"a", $"b")).collect()
      assert(withCodegen.map(_.getLong(0)).toSeq ===
        interpreted.map(_.getLong(0)).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    d.createOrReplaceTempView("md_v")
    val viaSql = spark.sql("SELECT milli_dot(a, b) FROM md_v")
      .collect().head.getLong(0)
    assert(viaSql === withCodegen.head.getLong(0))
  }

  test("r15 quantization kernels: known values, codegen ≡ interpreted, " +
      "SQL registration parity") {
    import graft.functions.vector._
    val d = Seq((0L, Seq(0.5f, -0.25f)), (1L, Seq(0f, 0f)))
      .toDF("id", "e")
    def all(frame: org.apache.spark.sql.DataFrame) = frame.select(
      $"id", milliVec($"e").as("mv"), milliUnitVec($"e").as("mu"),
      absMaxComp($"e").as("am"), int8Codes($"e").as("c8"),
      int8FidParts($"e").as("fp")).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1),
        Option(r.getSeq[Long](2)), r.getDouble(3), r.getSeq[Long](4),
        r.getSeq[Long](5))).toSeq
    val cg = all(d)
    // hand values: milli [500, -250]; ssq=312500 → unit
    //   [floor(500000/559.017..)=894, floor(-250000/559.017)=-448];
    //   amax 0.5; codes [127, floor(-63.5)=-64];
    //   parts: dot=500·127+(-250)(-64)=79500, sm=312500, sq=20225
    assert(cg(0) === ((0L, Seq(500L, -250L), Some(Seq(894L, -448L)),
      0.5, Seq(127L, -64L), Seq(79500L, 312500L, 20225L))))
    // zero vector: unit is NULL, codes zero, parts zero
    assert(cg(1) === ((1L, Seq(0L, 0L), None, 0.0, Seq(0L, 0L),
      Seq(0L, 0L, 0L))))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(all(d) === cg)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    d.createOrReplaceTempView("qk_v")
    val viaSql = spark.sql(
      "SELECT milli_vec(e), milli_unit_vec(e), abs_max(e), " +
        "int8_codes(e), int8_fid_parts(e) FROM qk_v WHERE id = 0")
      .collect().head
    assert(viaSql.getSeq[Long](0) === Seq(500L, -250L))
    assert(viaSql.getSeq[Long](1) === Seq(894L, -448L))
    assert(viaSql.getDouble(2) === 0.5)
    assert(viaSql.getSeq[Long](3) === Seq(127L, -64L))
    assert(viaSql.getSeq[Long](4) === Seq(79500L, 312500L, 20225L))
  }

  test("cosine_sim: null array yields null; length mismatch truncates") {
    val out = Seq((Some(Seq(1f, 0f)), None: Option[Seq[Float]]))
      .toDF("a", "b")
      .select(cosineSim($"a", $"b")).collect().head
    assert(out.isNullAt(0))
    val trunc = Seq((Seq(1f, 0f, 9f), Seq(1f, 0f)))
      .toDF("a", "b").select(cosineSim($"a", $"b")).collect().head
    assert(trunc.getDouble(0) === 1.0)
  }

  test("cosine_sim is registered as a SQL function via GraftExtensions") {
    df.createOrReplaceTempView("vex")
    val out = spark.sql(
      "SELECT id, cosine_sim(a, b) AS c FROM vex WHERE id = 3")
      .collect().head
    assert(out.getDouble(1) === 0.96)
  }

  test("winnow_fingerprints is registered as a SQL function") {
    val out = spark.sql(
      "SELECT winnow_fingerprints('hello world abc', 8, 4, 33554432)")
      .collect().head.getSeq[Long](0).toSet
    assert(out === Set(2615151L, 3067573L))
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql(
        "SELECT winnow_fingerprints('x', length('abcdefgh'), 4, 33554432)")
        .collect())
    assert(e.getMessage.contains("winnow_fingerprints"))
  }

  test("winnow_fingerprints rejects out-of-range k/w/mod at analysis") {
    import org.apache.spark.sql.AnalysisException
    for (q <- Seq(
      "SELECT winnow_fingerprints('abc', 0, 4, 33554432)",
      "SELECT winnow_fingerprints('abc', 8, 0, 33554432)",
      "SELECT winnow_fingerprints('abc', 8, 4, 0)",
      "SELECT winnow_fingerprints('abc', 8, -1, 33554432)")) {
      val e = intercept[AnalysisException](spark.sql(q).collect())
      assert(e.getCondition === "DATATYPE_MISMATCH.VALUE_OUT_OF_RANGE", q)
    }
  }

  test("SQL function arity errors are AnalysisExceptions with signature") {
    import org.apache.spark.sql.AnalysisException
    val e1 = intercept[AnalysisException](
      spark.sql("SELECT cosine_sim(array(1.0D))").collect())
    assert(e1.getMessage.contains("cosine_sim"))
    val e2 = intercept[AnalysisException](
      spark.sql("SELECT md5long60()").collect())
    assert(e2.getMessage.contains("md5long60"))
  }

  test("Md5Long60 equals the composable md5 formulation on random strings") {
    import graft.functions.Hashing
    val df = (1 to 500).map(i => s"probe-$i-\u00e9\u4e2d")
      .toDF("s")
    val out = df.select(
      Hashing.md5Long($"s").as("fused"),
      Hashing.md5LongComposable($"s").as("composed")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(out.forall(_.getLong(0) >= 0L))
  }
}
