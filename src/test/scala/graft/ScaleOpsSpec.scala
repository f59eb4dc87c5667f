package graft

import org.apache.spark.sql.functions._

import graft.operators.{RelationalQueries, SkewJoin, TopKAggregator}

class ScaleOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("salted join equals plain join, including skewed keys") {
    // key 1 is hot: 500 left rows; key 2 has 3
    val left = ((1 to 500).map(i => (1L, s"l$i")) ++
      (1 to 3).map(i => (2L, s"m$i"))).toDF("k", "lv")
    val right = Seq((1L, "r1"), (1L, "r2"), (2L, "r3"), (3L, "r4"))
      .toDF("k", "rv")
    val plain = left.join(right, "k")
      .select("k", "lv", "rv").collect().toSet
    val salted = SkewJoin.salted(left, right, "k", salts = 8)
      .select("k", "lv", "rv").collect().toSet
    assert(salted === plain)
    assert(salted.size === 1003) // 500*2 + 3*1
  }

  test("censusQuantiles equals Spark percentile bit-for-bit") {
    // even group (interpolated h), odd group (exact h), a group with
    // heavy value ties (the census's whole point), negative values
    val rows =
      (1 to 4).map(i => ("even", i.toDouble)) ++
      (1 to 5).map(i => ("odd", i * 3.0)) ++
      (1 to 300).map(i => ("ties", (i % 3).toDouble)) ++
      Seq(("neg", -2.5), ("neg", -1.0), ("neg", 4.0))
    val ev = rows.toDF("event_type", "value")
    val viaCensus = RelationalQueries
      .censusQuantiles(ev, Seq(0.25, 0.5, 0.9))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val viaPercentile = ev
      .withColumn("v_int", floor(col("value")))
      .groupBy("event_type")
      .agg(
        graft.functions.Hashing.micro(expr("percentile(v_int, 0.25)"))
          .as("p25_micro"),
        graft.functions.Hashing.micro(expr("percentile(v_int, 0.5)"))
          .as("p50_micro"),
        graft.functions.Hashing.micro(expr("percentile(v_int, 0.9)"))
          .as("p90_micro"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(viaCensus.toSeq === viaPercentile.toSeq)
    // hand-check the interpolated case: even = [1,2,3,4],
    // p90 -> h = 2.7, 3*(3-2.7) + 4*(2.7-2) = 3.7
    assert(viaCensus.head === (("even", 1750000L, 2500000L,
      3700000L, 4L)))
  }

  test("transitionCensus: hand-computed Markov arcs and probabilities") {
    // user 1: A->B->A->C, user 2: A->B
    // arcs: (A,B)=2, (B,A)=1, (A,C)=1; totals A=3, B=1
    val ev = Seq(
      (1L, 1L, "A", "2024-01-01 00:00:01"),
      (2L, 1L, "B", "2024-01-01 00:00:02"),
      (3L, 1L, "A", "2024-01-01 00:00:03"),
      (4L, 1L, "C", "2024-01-01 00:00:04"),
      (5L, 2L, "A", "2024-01-01 00:00:01"),
      (6L, 2L, "B", "2024-01-01 00:00:02"))
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.transitionCensus(ev)
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n"), r.getAs[Long]("total_from"),
        r.getAs[Long]("p_micro")))
    assert(out.toSeq === Seq(
      ("A", "B", 2L, 3L, 666666L),
      ("A", "C", 1L, 3L, 333333L),
      ("B", "A", 1L, 1L, 1000000L)))
  }

  test("kanonCurve: duplicate events collapse to one exposure, " +
    "hand-computed risk curve") {
    // classes: (A,d1)={u1,u2,u3} size 3; (B,d1)={u1} size 1 (u1's two
    // B events that day are ONE record); (A,d2)={u1,u2} size 2
    // records total 6 -> curve 1/6, 3/6, 6/6
    val ev = Seq(
      (1L, 1L, "A", "2024-01-01 00:00:01"),
      (2L, 2L, "A", "2024-01-01 00:00:02"),
      (3L, 3L, "A", "2024-01-01 00:00:03"),
      (4L, 1L, "B", "2024-01-01 00:00:04"),
      (5L, 1L, "B", "2024-01-01 00:00:05"),
      (6L, 1L, "A", "2024-01-02 00:00:01"),
      (7L, 2L, "A", "2024-01-02 00:00:02"))
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.kanonCurve(ev).collect()
      .map(r => (r.getAs[Long]("size"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_recs"), r.getAs[Long]("risk_micro")))
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, 166666L),
      (2L, 1L, 2L, 500000L),
      (3L, 1L, 3L, 1000000L)))
  }

  test("ldivCurve: class diversity counts distinct sensitive values, " +
    "hand-computed risk curve") {
    // dim: u1,u2 -> nat 10; u3 -> nat 20
    // class (A,d1) = {u1,u2,u3}: 3 recs, l = 2; (B,d1) = {u1}: 1 rec,
    // l = 1 -> census l=1 (1 rec), l=2 (3 recs); curve 1/4, 4/4
    val ev = Seq(
      (1L, 1L, "A", "2024-01-01 00:00:01"),
      (2L, 2L, "A", "2024-01-01 00:00:02"),
      (3L, 3L, "A", "2024-01-01 00:00:03"),
      (4L, 1L, "B", "2024-01-01 00:00:04"))
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val dim = Seq((1L, 10L), (2L, 10L), (3L, 20L))
      .toDF("c_custkey", "c_nationkey")
    val out = RelationalQueries.ldivCurve(ev, dim).collect()
      .map(r => (r.getAs[Long]("l"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("n_recs"), r.getAs[Long]("risk_micro")))
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, 250000L),
      (2L, 1L, 3L, 1000000L)))
  }

  test("interarrivalCensus: zero-delta bucket, power-of-two bins, " +
    "event_id tiebreak at equal timestamps") {
    // type A at 0us, 1us, 1us, 9us -> deltas 1 (bucket 0),
    // 0 (bucket -1, the same-microsecond pair), 8 (bucket 3)
    val ev = Seq(
      (1L, 1L, "A", "2024-01-01 00:00:00.000000"),
      (2L, 1L, "A", "2024-01-01 00:00:00.000001"),
      (3L, 1L, "A", "2024-01-01 00:00:00.000001"),
      (4L, 1L, "A", "2024-01-01 00:00:00.000009"))
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.interarrivalCensus(ev).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("lo"),
        r.getAs[Long]("n"), r.getAs[Long]("frac_micro")))
    assert(out.toSeq === Seq(
      (-1L, 0L, 1L, 333333L),
      (0L, 1L, 1L, 333333L),
      (3L, 8L, 1L, 333333L)))
  }

  test("ewmaAnomaly: exact power-of-two decay, integer spike verdict, " +
    "first day and out-of-window days absent") {
    // A: d1 cnt 2, d2 cnt 2 (ewma 2.0, quiet), d3 cnt 10 (ewma 2.0,
    // spike: 10 > 3*2); B: d1 then d40 -> no day in the 30-day window
    val rows =
      Seq.fill(2)(("A", "2024-01-01 12:00:00")) ++
      Seq.fill(2)(("A", "2024-01-02 12:00:00")) ++
      Seq.fill(10)(("A", "2024-01-03 12:00:00")) ++
      Seq(("B", "2024-01-01 12:00:00"), ("B", "2024-02-10 12:00:00"))
    val ev = rows.zipWithIndex
      .map { case ((t, s), i) => (i.toLong, 1L, t, s) }
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.ewmaAnomaly(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Long]("cnt"), r.getAs[Long]("ewma_micro"),
        r.getAs[Boolean]("is_spike")))
    assert(out.toSeq === Seq(
      ("A", "2024-01-02", 2L, 2000000L, false),
      ("A", "2024-01-03", 10L, 2000000L, true)))
  }

  test("forecastCensus: exact integer one-step-ahead errors on the " +
    "EWMA fixture, no-baseline days absent") {
    // same fixture as the ewmaAnomaly spec:
    // A d2: forecast 2.0, actual 2 -> ae 0, se 0, smape 0
    // A d3: priors d1 (w 2^28) + d2 (w 2^29), forecast 2.0, actual 10
    //   resid = 10*den - num = 8*den -> ae_milli = 8000, se +8000,
    //   smape = 2000*8*den div (10*den + 2*den) = 16000 div 12 = 1333
    // census A: mae = 8000 div 2 = 4000, bias 4000,
    //   smape = (0 + 1333) div 2 = 666; B: no day in window -> absent
    val rows =
      Seq.fill(2)(("A", "2024-01-01 12:00:00")) ++
      Seq.fill(2)(("A", "2024-01-02 12:00:00")) ++
      Seq.fill(10)(("A", "2024-01-03 12:00:00")) ++
      Seq(("B", "2024-01-01 12:00:00"), ("B", "2024-02-10 12:00:00"))
    val ev = rows.zipWithIndex
      .map { case ((t, s), i) => (i.toLong, 1L, t, s) }
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.forecastCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_days"),
        r.getAs[Long]("mae_milli"), r.getAs[Long]("bias_milli"),
        r.getAs[Long]("smape_milli")))
    assert(out.toSeq === Seq(("A", 2L, 4000L, 4000L, 666L)))
  }

  test("abTestCensus: hand-computed 2x2 cells, integer lift, " +
    "chi-square fixed tree, zero-association reads 0") {
    // users 1,3 = arm B (odd), 2,4 = arm A (even)
    // click: A converts {2,4}, B converts {1}
    //   lift = (1*2*1e6) div (2*2) = 500000
    //   chi2: a=2 b=0 c=1 d=1, N=4 -> 4*(2*1-0*1)^2/(2*2*3*1)
    //       = 16/12 -> 1333333 micro
    // view: A {4}, B {3} -> lift (1*2*1e6) div (2*1) = 1e6;
    //   ad - bc = 1*1 - 1*1 = 0 -> chi2 exactly 0
    val rows = Seq(
      (1L, "click"), (2L, "click"), (3L, "view"),
      (4L, "click"), (4L, "view"))
    val ev = rows.zipWithIndex
      .map { case ((u, t), i) => (i.toLong, u, t, "2024-01-01 12:00:00") }
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0))
    val out = RelationalQueries.abTestCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("conv_a"),
        r.getAs[Long]("conv_b"), r.getAs[Long]("rate_a_micro"),
        r.getAs[Long]("rate_b_micro"), r.getAs[Long]("lift_micro"),
        r.getAs[Long]("chi2_micro")))
    assert(out.toSeq === Seq(
      ("click", 2L, 2L, 2L, 1L, 1000000L, 500000L, 500000L, 1333333L),
      ("view", 2L, 2L, 1L, 1L, 500000L, 500000L, 1000000L, 0L)))
  }

  test("mannWhitneyCensus: doubled midranks stay integer, " +
    "hand-computed U and z, all-tied type reads NULL z") {
    // type t: arm A (even users) cents {100, 200, 200},
    //         arm B (odd users) cents {200, 300}
    // census ranks (doubled): 100 -> 2, 200 (m=3, C=1) -> 6, 300 -> 10
    // R1_x2 = 1*2 + 2*6 = 14; U1_x2 = 14 - 3*4 = 2 (U1 = 1)
    // tie_cubes = 24; var = 0.5*(6 - 24/20) = 2.4
    // z = (2 - 6) / (2*sqrt(2.4)) = -1.2909944... -> floor -1290995
    // type u: every value 5.00 -> one tied census row, doubled
    //   midrank 3, U1_x2 = 3 - 1*2 = 1 (U1 = 0.5); var = 0 -> NULL z
    val rows = Seq(
      (2L, "t", 1.00), (2L, "t", 2.00), (4L, "t", 2.00),
      (1L, "t", 2.00), (1L, "t", 3.00),
      (2L, "u", 5.00), (1L, "u", 5.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.mannWhitneyCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("u1_x2"),
        r.getAs[Long]("tie_cubes"),
        Option(r.getAs[java.lang.Long]("z_micro")).map(_.toLong)))
    assert(out.toSeq === Seq(
      ("t", 3L, 2L, 2L, 24L, Some(-1290995L)),
      ("u", 1L, 1L, 1L, 6L, None)))
  }

  test("bootstrapMean: weights reproduce an independent JVM md5 " +
    "reimplementation, census sums and rank are exact") {
    val orders = (1 to 8).map(k =>
        (k.toLong, k.toLong, "2024-01-01 00:00:00", k * 100.0))
      .toDF("o_orderkey", "o_custkey", "od", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("od"))).drop("od")
    val b = 4
    // independent reimplementation: MessageDigest md5, first 15 hex
    // chars as a long, weight = thresholds <= h
    def h(key: Long, rep: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"bs:$key:$rep".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def wt(key: Long, rep: Long): Long =
      RelationalQueries.PoissonThresholds.count(_ <= h(key, rep)).toLong
    val expect = (0L until b.toLong).map { rep =>
      val ws = (1 to 8).map(k => (wt(k.toLong, rep), k * 10000L))
      val nEff = ws.map(_._1).sum
      val sum = ws.map { case (w, p) => w * p }.sum
      (rep, nEff, sum,
        math.floor(1e6 * (sum.toDouble / nEff.toDouble)).toLong)
    }
    val out = RelationalQueries.bootstrapMean(orders, b).collect()
      .map(r => (r.getAs[Long]("b"), r.getAs[Long]("n_eff"),
        r.getAs[Long]("sum_cents"), r.getAs[Long]("mean_micro")))
    assert(out.toSeq === expect)
    // the rank column is a permutation of 1..B ordered by mean
    val rks = RelationalQueries.bootstrapMean(orders, b).collect()
      .map(r => (r.getAs[Long]("mean_micro"), r.getAs[Long]("rk")))
    assert(rks.map(_._2).sorted.toSeq === (1L to b.toLong))
    assert(rks.sortBy(_._2).map(_._1).toSeq ===
      rks.map(_._1).sorted.toSeq)
  }

  test("attributionCensus: first/last touch picks, same-instant id " +
    "tiebreaks, strictly-earlier window, no-touch purchases drop") {
    // u1: view d1, click d2, purchase d3 -> first view, last click
    // u2: click d1, purchase d20 -> outside the 7-day window, drops
    // u3: view+click at the SAME instant, purchase later -> first is
    //     the smaller id (view), last the larger (click)
    // u4: only touch is AT the purchase instant -> strictly-earlier
    //     excludes it, purchase drops
    val rows = Seq(
      (0L, 1L, "view", "2024-01-01 10:00:00"),
      (1L, 1L, "click", "2024-01-02 10:00:00"),
      (2L, 1L, "purchase", "2024-01-03 10:00:00"),
      (3L, 2L, "click", "2024-01-01 10:00:00"),
      (4L, 2L, "purchase", "2024-01-20 10:00:00"),
      (5L, 3L, "view", "2024-01-05 10:00:00"),
      (6L, 3L, "click", "2024-01-05 10:00:00"),
      (7L, 3L, "purchase", "2024-01-05 11:00:00"),
      (8L, 4L, "signup", "2024-01-06 09:00:00"),
      (9L, 4L, "purchase", "2024-01-06 09:00:00"))
    val ev = rows
      .map { case (i, u, t, s) => (i, u, t, s, 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.attributionCensus(ev).collect()
      .map(r => (r.getAs[String]("model"),
        r.getAs[String]("event_type"), r.getAs[Long]("n_attr")))
    assert(out.toSeq === Seq(
      ("first", "view", 2L),
      ("last", "click", 2L)))
  }

  test("survivalCensus: risk sets, censoring horizon, integer hazards, " +
    "cumulative Nelson-Aalen sum") {
    // horizon = max last-day = 2024-02-01 (u4), censorDays = 14:
    // u1 lives 01-01..01-05 -> duration 4, churn (27 days before end)
    // u2 single event 01-03 -> duration 0, churn
    // u3 01-02..01-04 -> duration 2, churn
    // u4 01-01..02-01 -> duration 31, CENSORED (0 days before end)
    // risk sets (desc cumsum): d31:1, d4:2, d2:3, d0:4
    // hazards: 10^6*1 div 4 = 250000; div 3 = 333333; div 2 = 500000; 0
    val rows = Seq(
      (0L, 1L, "2024-01-01 08:00:00"), (1L, 1L, "2024-01-05 20:00:00"),
      (2L, 2L, "2024-01-03 12:00:00"),
      (3L, 3L, "2024-01-02 00:30:00"), (4L, 3L, "2024-01-04 23:00:00"),
      (5L, 4L, "2024-01-01 10:00:00"), (6L, 4L, "2024-02-01 09:00:00"))
    val ev = rows.toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.survivalCensus(ev, censorDays = 14)
      .collect()
      .map(r => (r.getAs[Long]("duration_days"),
        r.getAs[Long]("n_deaths"), r.getAs[Long]("n_censored"),
        r.getAs[Long]("at_risk"), r.getAs[Long]("hazard_micro"),
        r.getAs[Long]("cumhaz_micro")))
    assert(out.toSeq === Seq(
      (0L, 1L, 0L, 4L, 250000L, 250000L),
      (2L, 1L, 0L, 3L, 333333L, 583333L),
      (4L, 1L, 0L, 2L, 500000L, 1083333L),
      (31L, 0L, 1L, 1L, 0L, 1083333L)))
  }

  test("cusumCensus: days-scaled integer CUSUM, peak picks the level " +
    "shift, earliest-day tiebreak, last row zero") {
    // volumes 2,2,8,8 over 4 days: D=4, T=20; S' = 4*cum - t*20 =
    // -12, -24, -12, 0 -> peak |S'| = 24 at day 2, exactly the level
    // shift; scores (10^6*|S'|) div 80 = 150000, 300000, 150000, 0
    val rows =
      (1 to 2).map(i => s"2024-01-01 0$i:00:00") ++
      (1 to 2).map(i => s"2024-01-02 0$i:00:00") ++
      (1 to 8).map(i => s"2024-01-03 0$i:00:00") ++
      (1 to 8).map(i => s"2024-01-04 0$i:00:00")
    val ev = rows.toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.cusumCensus(ev).collect()
      .map(r => (r.getAs[String]("day"),
        r.getAs[Long]("n"), r.getAs[Long]("cum_n"),
        r.getAs[Long]("cusum_scaled"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("is_changepoint")))
    assert(out.toSeq === Seq(
      ("2024-01-01", 2L, 2L, -12L, 150000L, 0L),
      ("2024-01-02", 2L, 4L, -24L, 300000L, 1L),
      ("2024-01-03", 8L, 12L, -12L, 150000L, 0L),
      ("2024-01-04", 8L, 20L, 0L, 0L, 0L)))
  }

  test("anovaDowCensus: volume that is a pure weekday function reads " +
    "eta2 = 1 exactly; constant volume hits the degenerate guard") {
    // two full weeks from Mon 2024-01-01: Mondays 5 events, others 2.
    // between = 98 = ssq, grand = 1156/14 -> eta2 = 1.0 exactly.
    def ev(monVol: Int, otherVol: Int) = {
      val rows = (0 until 14).flatMap { d =>
        val vol = if (d % 7 == 0) monVol else otherVol
        (1 to vol).map(i => f"2024-01-${d + 1}%02d 0$i%d:00:00")
      }
      rows.toDF("ts_s")
        .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    }
    val r = RelationalQueries.anovaDowCensus(ev(5, 2)).collect().head
    assert((r.getAs[Long]("d_days"), r.getAs[Long]("t_events"),
      r.getAs[Long]("ssq"), r.getAs[Long]("eta2_micro")) ===
      (14L, 34L, 98L, 1000000L))
    // every weekday has m=2 days
    (1 to 7).foreach(g => assert(r.getAs[Long](s"m$g") === 2L))
    val c = RelationalQueries.anovaDowCensus(ev(2, 2)).collect().head
    assert(c.getAs[Long]("eta2_micro") === 0L)
  }

  test("runsTestCensus: hand-computed runs, median-tie drop, exact " +
    "z for a clustered sequence") {
    // volumes 5,5,1,1,6,6 on consecutive days: lower median = 5
    // (rank 3 of sorted 1,1,5,5,6,6); the two median days DROP;
    // retained signs in calendar order 0,0,1,1 -> runs 2, n1=n2=2,
    // E[R]=3 -> 3000000; z = (2-3)/sqrt(2/3) -> floor -1224745
    val vols = Seq(5, 5, 1, 1, 6, 6)
    val rows = vols.zipWithIndex.flatMap { case (v, d) =>
      (1 to v).map(i => f"2024-01-0${d + 1}%d 0$i%d:00:00")
    }
    val ev = rows.toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = RelationalQueries.runsTestCensus(ev).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("med"),
      r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("runs"),
      r.getAs[Long]("e_micro"), r.getAs[Long]("z_micro")) ===
      (6L, 5L, 2L, 2L, 2L, 3000000L, -1224745L))
  }

  test("mannKendallCensus: hand-computed S, tie correction, exact z") {
    // volumes 1,3,2,2,5 on consecutive days: S over the 10 pairs =
    // +4 (from day1) -1 (day2: two inversions, one rise) +1 +1 = 5;
    // one tie group (value 2, t=2) -> corr = 2*1*9 = 18;
    // var_num = 5*4*15 - 18 = 282; z = (5-1)/sqrt(282/18) ->
    // floor(1.0105815...e6) = 1010582
    val vols = Seq(1, 3, 2, 2, 5)
    val rows = vols.zipWithIndex.flatMap { case (v, d) =>
      (1 to v).map(i => f"2024-01-0${d + 1}%d 0$i%d:00:00")
    }
    val ev = rows.toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = RelationalQueries.mannKendallCensus(ev).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("s_stat"),
      r.getAs[Long]("n_tie_groups"), r.getAs[Long]("tie_corr"),
      r.getAs[Long]("var_num"), r.getAs[Long]("z_micro")) ===
      (5L, 5L, 1L, 18L, 282L, 1010582L))
  }

  test("mannKendallCensus: strictly increasing volumes hit the " +
    "no-tie maximum S = n(n-1)/2") {
    val vols = Seq(1, 2, 3, 4)
    val rows = vols.zipWithIndex.flatMap { case (v, d) =>
      (1 to v).map(i => f"2024-01-0${d + 1}%d 0$i%d:00:00")
    }
    val ev = rows.toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = RelationalQueries.mannKendallCensus(ev).collect().head
    assert(r.getAs[Long]("s_stat") === 6L)
    assert(r.getAs[Long]("tie_corr") === 0L)
    assert(r.getAs[Long]("z_micro") > 0L)
  }

  test("cusumChangepoint: hand-computed level shift — argmax at the " +
    "last pre-shift day, floor means, exact normalized magnitude") {
    // volumes 10,10,10,40,40: N=5, T=110, cums 10,20,30,70,110;
    // S' = 5*cum - k*110: -60,-120,-180,-90,0 -> argmax |S'|=180 at
    // k=3 (day 3); mean_pre = 30 div 3 = 10, mean_post =
    // 80 div 2 = 40, shift = 30; norm = floor(1e6*180/(5.0*110))
    // = 327272
    val vols = Seq(10, 10, 10, 40, 40)
    val rows = vols.zipWithIndex.flatMap { case (v, d) =>
      (1 to v).map(i => f"2024-01-0${d + 1}%d ${i / 60}%02d:${i % 60}%02d:00")
    }
    val ev = rows.toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = RelationalQueries.cusumChangepoint(ev).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("total"),
      r.getAs[String]("cp_day"), r.getAs[Long]("k_cp"),
      r.getAs[Long]("s_abs_max"), r.getAs[Long]("mean_pre"),
      r.getAs[Long]("mean_post"), r.getAs[Long]("shift_per_day"),
      r.getAs[Long]("cusum_norm_micro")) ===
      (5L, 110L, "2024-01-03", 3L, 180L, 10L, 40L, 30L, 327272L))
  }

  test("cusumChangepoint: constant series reads S'=0 everywhere, " +
    "argmax ties break to the earliest day, zero shift") {
    val rows = (1 to 3).flatMap(d =>
      (1 to 5).map(i => f"2024-02-0$d%d 0$i%d:00:00"))
    val ev = rows.toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = RelationalQueries.cusumChangepoint(ev).collect().head
    assert((r.getAs[String]("cp_day"), r.getAs[Long]("s_abs_max"),
      r.getAs[Long]("shift_per_day"),
      r.getAs[Long]("cusum_norm_micro")) ===
      ("2024-02-01", 0L, 0L, 0L))
    assert(r.getAs[Long]("mean_pre") === 5L)
    assert(r.getAs[Long]("mean_post") === 5L)
  }

  test("acfCensus: alternating series reads r1 = -1 and r2 = +1 " +
    "exactly; constant series guards to 0") {
    // volumes 1,2,1,2: lag-1 pairs (1,2),(2,1),(1,2) -> m=3 sx=4 sy=5
    // sxx=6 syy=9 sxy=6: num=18-20=-2, vx=18-16=2, vy=27-25=2 ->
    // r = -2/2 = -1 exactly; lag-2 pairs (1,1),(2,2) -> r = +1;
    // lag-3 single pair -> both variances 0 -> guard 0
    val vols = Seq(1, 2, 1, 2)
    val rows = vols.zipWithIndex.flatMap { case (v, d) =>
      (1 to v).map(i => f"2024-03-0${d + 1}%d 0$i%d:00:00")
    }
    val ev = rows.toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.acfCensus(ev, 3).collect()
      .map(r => (r.getAs[Long]("lag"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("r_micro")))
    assert(out.toSeq === Seq((1L, 3L, -1000000L), (2L, 2L, 1000000L),
      (3L, 1L, 0L)))
    // constant series: every lag zero-variance -> all guards fire
    val cev = (1 to 3).flatMap(d => (1 to 4).map(i =>
        f"2024-04-0$d%d 0$i%d:00:00")).toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    assert(RelationalQueries.acfCensus(cev, 2).collect()
      .forall(_.getAs[Long]("r_micro") === 0L))
  }

  test("cramersV: perfect association reads exactly 1, independence 0," +
    " degenerate single level guards to 0") {
    import spark.implicits._
    // 2x2 diagonal: every observed cell 10, zero cells contribute
    // their expected mass e=5 -> chi2 = 4*5 = 20, V = sqrt(20/20/1)=1
    val perfect = (Seq.fill(10)(("a1", "b1")) ++
      Seq.fill(10)(("a2", "b2"))).toDF("a", "b")
    val p = RelationalQueries.cramersV(perfect).collect().head
    assert((p.getAs[Long]("r_levels"), p.getAs[Long]("c_levels"),
      p.getAs[Long]("n_total"), p.getAs[Long]("chi2_micro"),
      p.getAs[Long]("v_micro")) === (2L, 2L, 20L, 20000000L, 1000000L))
    val indep = (for { a <- Seq("a1", "a2"); b <- Seq("b1", "b2");
      _ <- 1 to 5 } yield (a, b)).toDF("a", "b")
    assert(RelationalQueries.cramersV(indep).collect().head
      .getAs[Long]("v_micro") === 0L)
    val degen = Seq(("a1", "b1"), ("a2", "b1")).toDF("a", "b")
    assert(RelationalQueries.cramersV(degen).collect().head
      .getAs[Long]("v_micro") === 0L)
  }

  test("kendallTauCensus: hand-computed concordant/tie split, " +
    "exact tau-b") {
    // daily (x=volume, y=distinct users): (1,1),(2,2),(2,1),(3,3)
    // -> C=4, D=0, tx=1 (x=2 twice), ty=1 (y=1 twice), n0=6,
    // tau-b = 4/sqrt(5*5) = 0.8
    val rows = Seq(
      ("2024-01-01 01:00:00", 1L),
      ("2024-01-02 01:00:00", 1L), ("2024-01-02 02:00:00", 2L),
      ("2024-01-03 01:00:00", 1L), ("2024-01-03 02:00:00", 1L),
      ("2024-01-04 01:00:00", 1L), ("2024-01-04 02:00:00", 2L),
      ("2024-01-04 03:00:00", 3L))
    val ev = rows.toDF("ts_s", "user_id")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = RelationalQueries.kendallTauCensus(ev).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("n0"),
      r.getAs[Long]("concordant"), r.getAs[Long]("discordant"),
      r.getAs[Long]("tx"), r.getAs[Long]("ty"),
      r.getAs[Long]("taub_micro")) ===
      (4L, 6L, 4L, 0L, 1L, 1L, 800000L))
  }

  test("spearmanCensus: tie-aware average ranks, exact rho, " +
    "rank-sum invariant, all-tied guard") {
    // daily (x=volume, y=distinct users): (1,1),(2,2),(2,1),(3,3).
    // 2*avgranks a=[2,5,5,8], b=[3,6,3,8]; both sum to n(n+1)=20;
    // moments saa=sbb=118, sab=115 -> rho = 60/72 = 0.8333..
    val rows = Seq(
      ("2024-01-01 01:00:00", 1L),
      ("2024-01-02 01:00:00", 1L), ("2024-01-02 02:00:00", 2L),
      ("2024-01-03 01:00:00", 1L), ("2024-01-03 02:00:00", 1L),
      ("2024-01-04 01:00:00", 1L), ("2024-01-04 02:00:00", 2L),
      ("2024-01-04 03:00:00", 3L))
    val ev = rows.toDF("ts_s", "user_id")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = RelationalQueries.spearmanCensus(ev).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("sa"),
      r.getAs[Long]("sb"), r.getAs[Long]("saa"), r.getAs[Long]("sbb"),
      r.getAs[Long]("sab"), r.getAs[Long]("rho_micro")) ===
      (4L, 20L, 20L, 118L, 118L, 115L, 833333L))
    // constant volume: x all-tied -> variance 0 -> guard fires even
    // though y varies
    val cev = Seq(("2024-02-01 01:00:00", 1L), ("2024-02-02 01:00:00", 2L),
      ("2024-02-03 01:00:00", 2L)).toDF("ts_s", "user_id")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    assert(RelationalQueries.spearmanCensus(cev).collect().head
      .getAs[Long]("rho_micro") === 0L)
  }

  test("fanoCensus: metronomic user reads exactly 0, bursty user's " +
    "integer floor division, summary carried on every row") {
    // user 1: one event on each of 3 consecutive days -> T=3, sq=3,
    // span=3 -> F = (9-9)/9 = 0 -> bucket 0
    // user 2: 4 events day 1 + 1 event day 3 -> T=5, sq=17, span=3 ->
    // F = (3*17-25)/(3*5) = 26/15 -> 26000000 div 15 = 1733333 ->
    // bucket 1500000
    val rows = Seq(
      (1L, "2024-01-01 01:00:00"), (1L, "2024-01-02 01:00:00"),
      (1L, "2024-01-03 01:00:00"),
      (2L, "2024-01-01 01:00:00"), (2L, "2024-01-01 02:00:00"),
      (2L, "2024-01-01 03:00:00"), (2L, "2024-01-01 04:00:00"),
      (2L, "2024-01-03 01:00:00"))
    val ev = rows.toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.fanoCensus(ev).collect()
      .map(r => (r.getAs[Long]("bucket_lo_micro"),
        r.getAs[Long]("n_users"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_users_total"), r.getAs[Long]("fano_max_micro")))
    assert(out.toSeq === Seq(
      (0L, 1L, 3L, 2L, 1733333L),
      (1500000L, 1L, 5L, 2L, 1733333L)))
  }

  test("hillCensus: hand-computed tail index over top-k exceedances, " +
    "flat-tail sentinel") {
    // per-user counts 8,4,2,1 with kMax=2: k=2, threshold x_(3)=2,
    // sum = micro(ln 4) + micro(ln 2) = 1386294 + 693147 = 2079441,
    // alpha = 2e12 div 2079441
    val rows = Seq(8, 4, 2, 1).zipWithIndex.flatMap { case (c, u) =>
      (1 to c).map(i => ((u + 1).toLong, f"2024-01-01 ${i}%02d:00:00"))
    }
    val ev = rows.toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = RelationalQueries.hillCensus(ev, 2L).collect().head
    val expSum = math.floor(1e6 * math.log(8.0 / 2)).toLong +
      math.floor(1e6 * math.log(4.0 / 2)).toLong
    assert((r.getAs[Long]("n_users"), r.getAs[Long]("k_used"),
      r.getAs[Long]("xk1"), r.getAs[Long]("sum_ln"),
      r.getAs[Long]("alpha_micro")) ===
      (4L, 2L, 2L, expSum, 2L * 1000000L * 1000000L / expSum))
    // flat tail: every user at the same count -> all terms 0 -> the
    // infinite-alpha sentinel
    val flat = (1 to 4).flatMap(u => (1 to 3).map(i =>
        (u.toLong, f"2024-02-01 ${i}%02d:00:00")))
      .toDF("user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val f = RelationalQueries.hillCensus(flat, 2L).collect().head
    assert((f.getAs[Long]("xk1"), f.getAs[Long]("alpha_micro")) ===
      (3L, 0L))
  }

  test("funnelWilson: hand-computed Wilson bounds at p = 1/2, bounds " +
    "bracket the point estimate and stay inside [0, 1e6]") {
    // 4 viewers -> 2 clickers -> 1 purchaser, all inside the window
    val rows =
      (1 to 4).map(u => (u.toLong, "view", "2024-01-01 01:00:00")) ++
      (1 to 2).map(u => (u.toLong, "click", "2024-01-01 02:00:00")) ++
      Seq((1L, "purchase", "2024-01-01 03:00:00"))
    val ev = rows.toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    def wilson(x: Long, n: Long): (Long, Long, Long) = {
      val z = 1.96; val nD = n.toDouble; val p = x.toDouble / n
      val denom = 1.0 + (z * z) / nD
      val center = p + (z * z) / (2.0 * nD)
      val half = z * math.sqrt(p * (1.0 - p) / nD +
        (z * z) / ((4.0 * nD) * nD))
      (math.floor(1e6 * p).toLong,
        math.floor(1e6 * ((center - half) / denom)).toLong,
        math.floor(1e6 * ((center + half) / denom)).toLong)
    }
    val (p2, lo2, hi2) = wilson(2, 4)
    val (p3, lo3, hi3) = wilson(1, 2)
    val out = RelationalQueries.funnelWilson(ev).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_users"), r.getAs[Long]("prev_n"),
        r.getAs[Long]("p_micro"), r.getAs[Long]("lo_micro"),
        r.getAs[Long]("hi_micro")))
    assert(out.toSeq === Seq(
      (2L, "click", 2L, 4L, p2, lo2, hi2),
      (3L, "purchase", 1L, 2L, p3, lo3, hi3)))
    out.foreach { case (_, _, _, _, p, lo, hi) =>
      assert(0L <= lo && lo <= p && p <= hi && hi <= 1000000L)
    }
  }

  test("retentionSlope: censoring-honest at-risk denominators, exact " +
    "single-pair slope and half-life") {
    // cohort d1: u1-u4; u1,u2 return at offset 1; u1 at offset 2.
    // cohort d2: u5 (never returns). cohort d3: u6. max day = d3.
    // pooled: act(1)=2 over risk(1)=5 (cohorts d1+d2 old enough),
    //         act(2)=1 over risk(2)=4 (cohort d1 only).
    val rows = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-01"),
      (4L, "2024-01-01"),
      (1L, "2024-01-02"), (2L, "2024-01-02"), (5L, "2024-01-02"),
      (1L, "2024-01-03"), (6L, "2024-01-03"))
    val ev = rows.toDF("user_id", "day_s")
      .withColumn("ts", to_timestamp(concat(col("day_s"),
        lit(" 01:00:00")))).drop("day_s")
    val l1 = math.floor(1e6 * math.log(2.0 / 5)).toLong
    val l2 = math.floor(1e6 * math.log(1.0 / 4)).toLong
    val slope = l2 - l1 // one pair at gap 1: the shift cancels exactly
    assert(slope < 0L)
    val hl = 693147L * 1000000L / (-slope)
    val r = RelationalQueries.retentionSlope(ev).collect().head
    assert((r.getAs[Long]("n_points"), r.getAs[Long]("n_pairs"),
      r.getAs[Long]("slope_micro"),
      r.getAs[Long]("half_life_days_micro")) === (2L, 1L, slope, hl))
  }

  test("gapCensus: hand-computed gap histogram with summary carried " +
    "on every row") {
    // active days 1,2,5,6,10 -> gaps of 2 (days 3-4) and 3 (7-9);
    // 5 active days over a 10-day span -> coverage 500000 ppm
    val days = Seq(1, 2, 5, 6, 10)
    val ev = days.map(d => f"2024-01-$d%02d 01:00:00").toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.gapCensus(ev).collect()
      .map(r => (r.getAs[Long]("gap_len"), r.getAs[Long]("n_gaps"),
        r.getAs[Long]("n_days"), r.getAs[Long]("span_days"),
        r.getAs[Long]("coverage_ppm")))
    assert(out.toSeq === Seq(
      (2L, 1L, 5L, 10L, 500000L),
      (3L, 1L, 5L, 10L, 500000L)))
  }

  test("gapCensus: a complete feed reads one (0, 0, ..., 1e6) row") {
    val ev = Seq(1, 2, 3).map(d => f"2024-01-0$d%d 01:00:00")
      .toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.gapCensus(ev).collect()
      .map(r => (r.getAs[Long]("gap_len"), r.getAs[Long]("n_gaps"),
        r.getAs[Long]("n_days"), r.getAs[Long]("span_days"),
        r.getAs[Long]("coverage_ppm")))
    assert(out.toSeq === Seq((0L, 0L, 3L, 3L, 1000000L)))
  }

  test("benfordCensus: hand-computed digit census, zero-obs digits " +
    "kept, integer MAD verdict") {
    // cents 123, 1000, 200, 98700 -> digits 1,1,2,9: obs_ppm
    // 500000/250000/250000, devs vs the literals sum to 954241
    // -> MAD 954241 div 9 = 106026 -> nonconforming
    val amounts = Seq(1.23, 10.00, 2.00, 987.00).toDF("amount")
    val out = RelationalQueries.benfordCensus(amounts).collect()
    assert(out.length === 9)
    val byDigit = out.map(r => r.getAs[Long]("digit") ->
      (r.getAs[Long]("obs"), r.getAs[Long]("obs_ppm"),
        r.getAs[Long]("dev_ppm"), r.getAs[Long]("mad_ppm"),
        r.getAs[String]("conformity"))).toMap
    assert(byDigit(1L) === (2L, 500000L, 198971L, 106026L,
      "nonconforming"))
    assert(byDigit(2L) === (1L, 250000L, 73909L, 106026L,
      "nonconforming"))
    assert(byDigit(9L) === (1L, 250000L, 204243L, 106026L,
      "nonconforming"))
    assert(byDigit(5L) === (0L, 0L, -79181L, 106026L, "nonconforming"))
  }

  test("benfordCensus: a near-Benford mixture reads acceptable") {
    // 100 rows split 30/18/12/10/8/7/6/5/4 across digits 1..9 (within
    // ~1% of the Benford proportions): Sum|dev| = 25757 -> MAD 2861
    val counts = Seq(30, 18, 12, 10, 8, 7, 6, 5, 4)
    val amounts = counts.zipWithIndex.flatMap { case (c, i) =>
      (1 to c).map(_ => (i + 1) * 1.0)
    }.toDF("amount")
    val r = RelationalQueries.benfordCensus(amounts).collect().head
    assert(r.getAs[Long]("mad_ppm") === 2861L)
    assert(r.getAs[String]("conformity") === "acceptable")
  }

  test("theilsenCensus: hand-computed pair slopes, lower medians, " +
    "OLS comparison column") {
    // days 0..3, volumes 1,5,2,4: six pair slopes (micro)
    // 4000000, 500000, 1000000, -3000000, -500000, 2000000;
    // sorted rank (6+1) div 2 = 3 -> slope 500000.
    // intercepts 10^6*y - slope*d = 1000000, 4500000, 1000000,
    // 2500000; sorted (b, d) rank (4+1) div 2 = 2 -> 1000000.
    // OLS: (4*21 - 6*12) / (4*14 - 36) = 12/20 -> 600000.
    val vols = Seq(1, 5, 2, 4)
    val rows = vols.zipWithIndex.flatMap { case (v, d) =>
      (1 to v).map(i => f"2024-01-0${d + 1}%d 0$i%d:00:00")
    }
    val ev = rows.toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.theilsenCensus(ev).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs"),
      r.getAs[Long]("slope_micro"), r.getAs[Long]("intercept_micro"),
      r.getAs[Long]("ols_slope_micro"), r.getAs[Long]("pred_last_micro"))
      === (4L, 6L, 500000L, 1000000L, 600000L, 2500000L))
  }

  test("theilsenCensus: negative fractional slope floors identically " +
    "to the oracle's // (the offset trick)") {
    // days 0..3, volumes 2,1,1,1: slopes (micro) -1000000, -500000,
    // -333334, 0, 0, 0 -> sorted rank 3 = floor(-1/3 * 1e6) = -333334
    // (true floor, NOT truncation toward zero, which would read
    // -333333). Intercepts 10^6*y + 333334*d = 2000000, 1333334,
    // 1666668, 2000002 -> rank 2 = 1666668; pred_last = -333334*3 +
    // 1666668 = 666666; OLS (4*6 - 6*5)/(4*14 - 36) = -0.3.
    val vols = Seq(2, 1, 1, 1)
    val rows = vols.zipWithIndex.flatMap { case (v, d) =>
      (1 to v).map(i => f"2024-01-0${d + 1}%d 0$i%d:00:00")
    }
    val ev = rows.toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = RelationalQueries.theilsenCensus(ev).collect().head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("slope_micro"),
      r.getAs[Long]("intercept_micro"),
      r.getAs[Long]("ols_slope_micro"),
      r.getAs[Long]("pred_last_micro"))
      === (4L, -333334L, 1666668L, -300000L, 666666L))
  }

  test("autocorrCensus: calendar-joined lag pairs, exact power sums, " +
    "micro-floored Pearson, empty lag drops") {
    // daily volumes 1,3,2,5,4 on consecutive days; lag 7 has no pairs
    // lag 1: m=4 sums -> cov 2, var 35/20 -> r = 2/sqrt(700) -> 75592
    // lag 2: m=3 sums -> cov 9, var 6/14 -> r = 9/sqrt(84) -> 981980
    val vols = Seq(1, 3, 2, 5, 4)
    val rows = vols.zipWithIndex.flatMap { case (v, d) =>
      (1 to v).map(i => f"2024-01-0${d + 1}%d 0$i%d:00:00")
    }
    val ev = rows.toDF("ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.autocorrCensus(ev, Seq(1, 2, 7))
      .collect()
      .map(r => (r.getAs[Long]("lag"), r.getAs[Long]("m"),
        r.getAs[Long]("cov_num"), r.getAs[Long]("var_x"),
        r.getAs[Long]("var_y"), r.getAs[Long]("r_micro")))
    assert(out.toSeq === Seq(
      (1L, 4L, 2L, 35L, 20L, 75592L),
      (2L, 3L, 9L, 6L, 14L, 981980L)))
  }

  test("zorderAudit: morton interleave, radix buckets per layout, " +
    "zone-map hit counts, scan shares") {
    // 4 rows: (p,s,orderkey) = (0,0,0),(3,0,1),(0,3,2),(255,255,3)
    // morton z = 0, 10, 5, 65535
    // arrival buckets: 0..3 (one row each)
    // part_sorted: p div 4 -> bucket 0 {rows 1-3}, bucket 63 {row 4}
    // zorder: z div 1024 -> bucket 0 {rows 1-3}, bucket 63 {row 4}
    val li = Seq(
      (0L, 0L, 0L), (3L, 0L, 1L), (0L, 3L, 2L), (255L, 255L, 3L))
      .toDF("l_partkey", "l_suppkey", "l_orderkey")
    val out = RelationalQueries.zorderAudit(li, Seq(0, 255)).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("dim"),
        r.getAs[Long]("probe"), r.getAs[Long]("buckets_hit"),
        r.getAs[Long]("buckets_total"), r.getAs[Long]("rows_scanned"),
        r.getAs[Long]("rows_total"), r.getAs[Long]("scan_ppm")))
    assert(out.toSeq === Seq(
      ("arrival", "part", 0L, 2L, 4L, 2L, 4L, 500000L),
      ("arrival", "part", 255L, 1L, 4L, 1L, 4L, 250000L),
      ("arrival", "supp", 0L, 2L, 4L, 2L, 4L, 500000L),
      ("arrival", "supp", 255L, 1L, 4L, 1L, 4L, 250000L),
      ("part_sorted", "part", 0L, 1L, 2L, 3L, 4L, 750000L),
      ("part_sorted", "part", 255L, 1L, 2L, 1L, 4L, 250000L),
      ("part_sorted", "supp", 0L, 1L, 2L, 3L, 4L, 750000L),
      ("part_sorted", "supp", 255L, 1L, 2L, 1L, 4L, 250000L),
      ("zorder", "part", 0L, 1L, 2L, 3L, 4L, 750000L),
      ("zorder", "part", 255L, 1L, 2L, 1L, 4L, 250000L),
      ("zorder", "supp", 0L, 1L, 2L, 3L, 4L, 750000L),
      ("zorder", "supp", 255L, 1L, 2L, 1L, 4L, 250000L)))
  }

  test("fkAudit: orphan children, childless parents, duplicate child " +
    "keys, ppm") {
    // child rows [1,1,2,3,9] vs parents [1..5]: key 9 is an orphan
    // (1 key, 1 row), parents 4 and 5 are childless
    val child = Seq(1L, 1L, 2L, 3L, 9L).toDF("k")
    val parent = (1L to 5L).toDF("k")
    val out = RelationalQueries
      .fkAudit(Seq(("t", child, parent))).collect()
      .map(r => (r.getAs[String]("rel"), r.getAs[Long]("n_child"),
        r.getAs[Long]("n_child_keys"), r.getAs[Long]("n_parent"),
        r.getAs[Long]("orphan_keys"), r.getAs[Long]("orphan_rows"),
        r.getAs[Long]("childless_parents"),
        r.getAs[Long]("orphan_ppm")))
    assert(out.toSeq === Seq(("t", 5L, 4L, 5L, 1L, 1L, 2L, 200000L)))
    // a clean relationship reads all-zero violations
    val clean = RelationalQueries
      .fkAudit(Seq(("c", Seq(1L, 2L).toDF("k"), Seq(1L, 2L).toDF("k"))))
      .collect().head
    assert(clean.getAs[Long]("orphan_rows") === 0L)
    assert(clean.getAs[Long]("childless_parents") === 0L)
  }

  test("compactionPlan: next-fit over decreasing sizes, bin cuts at " +
    "the target offset, fill ppm") {
    // sizes 7,7,4,2 at target 10: cum 7,14,18,20 -> bins (cum-n) div 10
    // = 0,0,1,1 -> bin0 {7,7}=14 rows 140%, bin1 {4,2}=6 rows 60%
    val rows = Seq.fill(7)(1L) ++ Seq.fill(7)(2L) ++
      Seq.fill(4)(3L) ++ Seq.fill(2)(4L)
    val out = RelationalQueries
      .compactionPlan(rows.toDF("file_id"), target = 10L).collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_files"),
        r.getAs[Long]("rows_total"), r.getAs[Long]("fill_ppm")))
    assert(out.toSeq === Seq(
      (0L, 2L, 14L, 1400000L),
      (1L, 2L, 6L, 600000L)))
  }

  test("bucketSkew: totals conserve, degenerate single bucket is " +
    "perfectly balanced, skew never below ideal, deterministic") {
    val keys = (1L to 100L).toDF("k")
    val out = RelationalQueries.bucketSkew(keys, Seq(1, 4)).collect()
      .map(r => (r.getAs[Long]("nb"), r.getAs[Long]("buckets_used"),
        r.getAs[Long]("max_n"), r.getAs[Long]("total"),
        r.getAs[Long]("skew_ppm")))
    val one = out.find(_._1 == 1L).get
    assert(one === (1L, 1L, 100L, 100L, 1000000L))
    val four = out.find(_._1 == 4L).get
    assert(four._4 === 100L)
    assert(four._2 <= 4L && four._3 >= 25L)
    assert(four._5 >= 1000000L)
    val rerun = RelationalQueries.bucketSkew(keys, Seq(1, 4)).collect()
      .map(_.toSeq)
    assert(rerun.toSeq === RelationalQueries.bucketSkew(keys, Seq(1, 4))
      .collect().map(_.toSeq).toSeq)
  }

  test("rfmSegments: rank-picked quintile edges, tied customers merge " +
    "into one cell, census-threshold scores") {
    // c_k (k = 1..5): k orders on day 2024-01-(11-k), each k*100.00
    // -> recency 0..4, frequency 1..5, monetary k^2*10000 cents;
    // c6 duplicates c5 exactly. n = 6 -> edge ranks (5i) div 5 =
    // 1,2,3,4. recency census {0,1,2,3,4(x2)} -> edges 1,2,3,4 ->
    // scores 1,1,2,3,4,4; frequency/monetary same shape. Cells:
    // (1,1,1) = {c1,c2}, (2,2,2) = c3, (3,3,3) = c4, (4,4,4) = {c5,c6}
    val rows = (1 to 5).flatMap { k =>
      (1 to k).map(j =>
        (k.toLong * 100 + j, k.toLong,
          f"2024-01-${11 - k}%02d 00:00:00", k * 100.0))
    } ++ (1 to 5).map(j => (600L + j, 6L, "2024-01-06 00:00:00", 500.0))
    val orders = rows
      .toDF("o_orderkey", "o_custkey", "od", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("od"))).drop("od")
    val out = RelationalQueries.rfmSegments(orders).collect()
      .map(r => (r.getAs[Long]("r_q"), r.getAs[Long]("f_q"),
        r.getAs[Long]("m_q"), r.getAs[Long]("n_cust"),
        r.getAs[Long]("segment_cents")))
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, 2L, 50000L),
      (2L, 2L, 2L, 1L, 90000L),
      (3L, 3L, 3L, 1L, 160000L),
      (4L, 4L, 4L, 2L, 500000L)))
  }

  test("shipPriority: segment filter, date band, cents revenue, " +
    "top-k order") {
    val cust = Seq(
      (1L, "BUILDING"), (2L, "MACHINERY"), (3L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      // in: before cutoff, BUILDING customer
      (10L, 1L, "2024-01-01 00:00:00", "1-URGENT"),
      // out: after cutoff
      (11L, 1L, "2024-03-01 00:00:00", "2-HIGH"),
      // out: wrong segment
      (12L, 2L, "2024-01-01 00:00:00", "3-MEDIUM"),
      // in: second qualifying order
      (13L, 3L, "2024-01-10 00:00:00", "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "od", "o_orderpriority")
      .withColumn("o_orderdate", to_timestamp(col("od"))).drop("od")
    val li = Seq(
      // ships after cutoff: 10.00 * (1 - 0.1) = 9.00 -> 900 cents
      (10L, "2024-02-20 00:00:00", 10.0, 0.1),
      // second line, same order: 5.00 -> 500 cents
      (10L, "2024-02-21 00:00:00", 5.0, 0.0),
      // ships BEFORE cutoff: excluded
      (10L, "2024-01-15 00:00:00", 99.0, 0.0),
      (13L, "2024-02-22 00:00:00", 7.0, 0.5))
      .toDF("l_orderkey", "sd", "l_extendedprice", "l_discount")
      .withColumn("l_shipdate", to_timestamp(col("sd"))).drop("sd")
    val out = RelationalQueries
      .shipPriority(cust, orders, li, "BUILDING", "2024-02-01", 10)
      .collect()
      .map(r => (r.getAs[Long]("l_orderkey"),
        r.getAs[Long]("revenue_cents"), r.getAs[String]("o_orderdate"),
        r.getAs[String]("o_orderpriority")))
    assert(out.toSeq === Seq(
      (10L, 1400L, "2024-01-01", "1-URGENT"),
      (13L, 350L, "2024-01-10", "2-HIGH")))
  }

  test("returns: R-flag filter, aggregate-then-decorate, top-20 order") {
    val out = RelationalQueries.qReturns(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("n_items"),
        r.getAs[Long]("lost_cents")))
    assert(out.length === 20)
    assert(out.forall(t => t._2 > 0 && t._3 > 0))
    // sorted by (lost_cents desc, c_custkey)
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._1 < b._1) })
  }

  test("lorenz: ascending-rank shares are monotone and the 99% cut " +
    "stays below full mass") {
    val out = RelationalQueries.qLorenz(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("permille"), r.getAs[Long]("n"),
        r.getAs[Long]("k"), r.getAs[Long]("share_micro")))
    assert(out.map(_._1).toSeq === Seq(500L, 900L, 990L))
    val n = out.head._2
    out.foreach { case (p, _, k, _) =>
      assert(k === math.max(1L, n * p / 1000L)) }
    val shares = out.map(_._4)
    assert(shares(0) < shares(1) && shares(1) < shares(2))
    // bottom-p of an ascending rank always carries LESS than p of
    // the mass when revenue is skewed
    assert(shares(0) < 500000L && shares(2) < 1000000L)
  }

  test("basketLift: within-order pairs only, min-support floor, " +
    "hand-computed lift") {
    // order 1: {1,2,3}; order 2: {1,2}; order 3: {4} ->
    // pair (1,2) support 2, lift = 2*3/(2*2) = 1.5; (1,3)/(2,3)
    // support 1 are floored out; part 4 never pairs
    val memb = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 4L)).toDF("o", "p")
    val out = RelationalQueries.basketLift(memb).collect()
      .map(r => (r.getAs[Long]("p"), r.getAs[Long]("p2"),
        r.getAs[Long]("n_ab"), r.getAs[Long]("n_p"),
        r.getAs[Long]("n_p2"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("lift_micro")))
    assert(out.toSeq === Seq((1L, 2L, 2L, 2L, 2L, 3L, 1500000L)))
  }

  test("dow: cross-engine weekday numbering, independence " +
    "expectations, hand-computed chi contributions") {
    // A: Sunday x1 + Monday x2; B: Monday x1 -> T = 4,
    // rt(A)=3 rt(B)=1, ct(sun)=1 ct(mon)=3
    val ev = Seq(
      (1L, 1L, "A", "2024-01-07 10:00:00"), // Sunday -> dow 0
      (2L, 1L, "A", "2024-01-08 10:00:00"), // Monday -> dow 1
      (3L, 2L, "A", "2024-01-08 11:00:00"),
      (4L, 3L, "B", "2024-01-08 12:00:00"))
      .toDF("event_id", "user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .withColumn("value", lit(1.0))
    val out = RelationalQueries.dowCensus(ev)
      .orderBy("event_type", "dow").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow"),
        r.getAs[Long]("n"), r.getAs[Long]("expected_micro"),
        r.getAs[Long]("chi_micro")))
    def cell(n: Double, rt: Double, ct: Double): (Long, Long) = {
      val e = rt * ct / 4.0
      (math.floor(1000000.0 * e).toLong,
        math.floor(1000000.0 * ((n - e) * (n - e) / e)).toLong)
    }
    val (ea0, ca0) = cell(1, 3, 1)
    val (ea1, ca1) = cell(2, 3, 3)
    val (eb1, cb1) = cell(1, 1, 3)
    assert(out.toSeq === Seq(
      ("A", 0L, 1L, ea0, ca0),
      ("A", 1L, 2L, ea1, ca1),
      ("B", 1L, 1L, eb1, cb1)))
  }

  test("marketShare: per-year shares partition the year's revenue") {
    val out = RelationalQueries
      .qMarketShare(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getAs[Long]("o_year"), r.getAs[Long]("revenue_cents"),
        r.getAs[Long]("share_micro")))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (y, rows) =>
      val shares = rows.map(_._3).sum
      // each share is floor'd once, so the sum sits within n rows of 1
      assert(shares <= 1000000L && shares >= 1000000L - rows.length,
        s"year $y shares sum $shares over ${rows.length} rows")
    }
  }

  test("fuzzy join resolves every discriminative probe to its source") {
    val out = RelationalQueries.qFuzzyJoin(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("matched_key"),
        r.getAs[Long]("distance"), r.getAs[Long]("n_cand")))
    // probes 0/50/100 — at sf0.001's 150 customers even the zero-run
    // grams sit under the df cap, so all three probes resolve (the
    // documented all-template recall edge only appears at sf0.01+,
    // where q_fuzzy_join's oracle run shows 29/30)
    assert(out.map(_._1).toSet === Set(0L, 50L, 100L))
    out.foreach { case (p, m, d, n) =>
      assert(m === p, s"probe $p must resolve to itself")
      assert(d === 1L, s"probe $p is one substitution from its source")
      assert(n >= 1L)
    }
  }

  test("resample: LOCF grid is dense from first touch with exact gaps") {
    val rows = RelationalQueries.qResample(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("grid_day"),
        r.getAs[String]("obs_day"), r.getAs[Long]("gap_days")))
    assert(rows.nonEmpty)
    val spanEnd = rows.map(_._2).max
    rows.groupBy(_._1).foreach { case (u, g) =>
      val days = g.map(_._2).sorted
      // dense: one row per day from the user's first observation to
      // the span end
      assert(days.last === spanEnd, s"user $u grid must reach span end")
      assert(days.length ===
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(days.head),
          java.time.LocalDate.parse(days.last)).toInt + 1,
        s"user $u grid must be gapless")
      g.foreach { case (_, gd, od, gap) =>
        assert(od <= gd, "carried observation never from the future")
        assert(gap === java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(od),
          java.time.LocalDate.parse(gd)), "gap_days exact")
      }
      // the first grid day IS an observation day
      assert(g.minBy(_._2)._4 === 0L)
    }
  }

  test("topK aggregator: per-group k best with deterministic ties") {
    val data = Seq(
      ("a", 0.9, 1L), ("a", 0.5, 2L), ("a", 0.9, 3L), ("a", 0.1, 4L),
      ("b", 0.2, 5L)).toDF("g", "score", "id")
      .as[(String, Double, Long)]
    val out = data.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(TopKAggregator.topK(2).toColumn.name("top"))
      .collect().toMap
    // score desc, tie -> smaller id
    assert(out("a") === Seq((0.9, 1L), (0.9, 3L)))
    assert(out("b") === Seq((0.2, 5L)))
  }

  test("topK merge keeps global best across partial buffers") {
    val n = 10000
    val data = (1 to n).map(i => ("g", (i % 997).toDouble, i.toLong))
      .toDF("g", "score", "id").repartition(16)
      .as[(String, Double, Long)]
    val out = data.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(TopKAggregator.topK(3).toColumn.name("top"))
      .collect().toMap
    // best score 996.0 at ids 996, 1993, 2990 -> smallest ids win
    assert(out("g") === Seq((996.0, 996L), (996.0, 1993L), (996.0, 2990L)))
  }

  test("latestSnapshot: latest ts wins, event_id breaks the ts tie") {
    val ev = Seq(
      (1L, 10L, "a", "2024-01-01 10:00:00", 1.5),
      (2L, 10L, "a", "2024-01-01 11:00:00", 2.5),
      (3L, 10L, "a", "2024-01-01 11:00:00", 3.5), // ts tie, higher id
      (4L, 20L, "b", "2024-01-01 10:00:00", -0.25))
      .toDF("event_id", "user_id", "event_type", "s", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val out = RelationalQueries.latestSnapshot(ev)
      .orderBy("user_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("last_event_id"),
        r.getAs[Long]("last_value_micro"), r.getAs[Long]("n_versions")))
    assert(out.toSeq === Seq(
      (10L, "a", 3L, 3500000L, 3L),
      (20L, "b", 4L, -250000L, 1L)))
  }

  test("scd2: validity intervals chain per key, current row open-ended") {
    val ev = Seq(
      (1L, 10L, "a", "2024-01-01 10:00:00", 1.0),
      (2L, 10L, "a", "2024-01-02 09:00:00", 2.0),
      (3L, 10L, "a", "2024-01-03 08:00:00", 3.0),
      (4L, 20L, "b", "2024-01-01 10:00:00", 9.0))
      .toDF("event_id", "user_id", "event_type", "s", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val out = RelationalQueries.scd2(ev)
      .orderBy("user_id", "version").collect()
    val u10 = out.filter(_.getAs[Long]("user_id") == 10L)
    assert(u10.map(_.getAs[Long]("version")).toSeq === Seq(1L, 2L, 3L))
    // each interval's end is the successor's start; only v3 is current
    assert(u10(0).getAs[java.sql.Timestamp]("valid_to") ===
      u10(1).getAs[java.sql.Timestamp]("valid_from"))
    assert(u10(1).getAs[java.sql.Timestamp]("valid_to") ===
      u10(2).getAs[java.sql.Timestamp]("valid_from"))
    assert(u10.map(_.getAs[Boolean]("is_current")).toSeq ===
      Seq(false, false, true))
    assert(u10(2).getAs[java.sql.Timestamp]("valid_to") === null)
    val u20 = out.filter(_.getAs[Long]("user_id") == 20L)
    assert(u20.length === 1 && u20.head.getAs[Boolean]("is_current"))
  }

  test("welchCensus: hand-computed t and Satterthwaite df, " +
    "single-user arms and zero-variance arms read NULL") {
    // type t: arm A (even users): user 2 -> 100+200=300 cents,
    //   user 4 -> 200; arm B (odd): user 1 -> 300, user 3 -> 100.
    //   n=2/2, sums 500/400, ss 130000/100000 -> va=5000, vb=20000,
    //   se2=12500, t = 50/sqrt(12500) = 0.447213..., df = 12500^2 /
    //   (2500^2 + 10000^2) = 1.470588...
    // type u: one user per arm -> n < 2 -> NULL t/df
    // type w: both arms constant (s=100 each user) -> se2 = 0 -> NULL
    val rows = Seq(
      (2L, "t", 1.00), (2L, "t", 2.00), (4L, "t", 2.00),
      (1L, "t", 3.00), (3L, "t", 1.00),
      (2L, "u", 5.00), (1L, "u", 5.00),
      (2L, "w", 1.00), (4L, "w", 1.00), (1L, "w", 1.00),
      (3L, "w", 1.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.welchCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("sum_a"),
        r.getAs[Long]("sum_b"), r.getAs[Long]("ss_a"),
        r.getAs[Long]("ss_b"), r.getAs[Long]("mean_a_micro"),
        r.getAs[Long]("mean_b_micro"),
        Option(r.getAs[java.lang.Long]("t_micro")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("df_micro")).map(_.toLong)))
    assert(out.toSeq === Seq(
      ("t", 2L, 2L, 500L, 400L, 130000L, 100000L,
        250000000L, 200000000L, Some(447213L), Some(1470588L)),
      ("u", 1L, 1L, 500L, 500L, 250000L, 250000L,
        500000000L, 500000000L, None, None),
      ("w", 2L, 2L, 200L, 200L, 20000L, 20000L,
        100000000L, 100000000L, None, None)))
  }

  test("mdeCensus: hand-computed absolute and relative MDE off the " +
    "shared welch census, degenerate arms read NULL") {
    // the welch 't' fixture: se2 = 12500, mde = 2.8016*sqrt(12500)
    //   = 313.228402... cents -> 313228402 micro;
    //   rel vs mean_a = 250 cents -> 1252913 micro
    val rows = Seq(
      (2L, "t", 1.00), (2L, "t", 2.00), (4L, "t", 2.00),
      (1L, "t", 3.00), (3L, "t", 1.00),
      (2L, "u", 5.00), (1L, "u", 5.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.mdeCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"),
        Option(r.getAs[java.lang.Long]("mde_abs_micro")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("mde_rel_micro")).map(_.toLong)))
    assert(out.toSeq === Seq(
      ("t", 2L, 2L, Some(313228402L), Some(1252913L)),
      ("u", 1L, 1L, None, None)))
  }

  test("cupedCensus: event-weighted median day splits pre/post, " +
    "missing pre reads 0, hand-computed theta and rho2") {
    // 2 events on day1, 3 on day2 -> target (5+1) div 2 = 3 ->
    // med_day = day2; pre = day1
    // type t: u1 x=100 y=200; u2 x=300 y=100; u3 x=0 y=400
    // cov = 3*50000 - 400*700 = -130000; var_x = var_y = 140000
    // theta = -0.92857.. -> -928572; rho2 = 16900/19600 -> 862244
    val rows = Seq(
      (1L, "t", "2024-01-01 10:00:00", 1.00),
      (2L, "t", "2024-01-01 11:00:00", 3.00),
      (1L, "t", "2024-01-02 10:00:00", 2.00),
      (2L, "t", "2024-01-02 11:00:00", 1.00),
      (3L, "t", "2024-01-02 12:00:00", 4.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, ts, v), i) => (i.toLong, u, t, ts, v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.cupedCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[String]("med_day"), r.getAs[Long]("n"),
        r.getAs[Long]("cov_num"), r.getAs[Long]("var_x"),
        r.getAs[Long]("var_y"),
        Option(r.getAs[java.lang.Long]("theta_micro")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("rho2_micro")).map(_.toLong)))
    assert(out.toSeq === Seq(
      ("t", "2024-01-02", 3L, -130000L, 140000L, 140000L,
        Some(-928572L), Some(862244L))))
  }

  test("didCensus: four cells off the shared median boundary, " +
    "hand-computed DID, empty cell reads NULL") {
    // med_day = day2 (2 events day1, 3 day2)
    // type t: a_pre {u2:100}, a_post {u2:200, u4:400},
    //         b_pre {u1:300}, b_post {u1:100}
    // DID = (100-300) - (300-100) = -400 cents -> -400000000 micro
    // type u: post-only odd user -> n_b_pre = 0 -> NULL
    val rows = Seq(
      (2L, "t", "2024-01-01 10:00:00", 1.00),
      (1L, "t", "2024-01-01 11:00:00", 3.00),
      (2L, "t", "2024-01-02 10:00:00", 2.00),
      (4L, "t", "2024-01-02 11:00:00", 4.00),
      (1L, "t", "2024-01-02 12:00:00", 1.00),
      (1L, "u", "2024-01-02 13:00:00", 9.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, ts, v), i) => (i.toLong, u, t, ts, v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.didCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("n_a_pre"), r.getAs[Long]("n_a_post"),
        r.getAs[Long]("n_b_pre"), r.getAs[Long]("n_b_post"),
        r.getAs[Long]("s_a_pre"), r.getAs[Long]("s_a_post"),
        r.getAs[Long]("s_b_pre"), r.getAs[Long]("s_b_post"),
        Option(r.getAs[java.lang.Long]("did_micro")).map(_.toLong)))
    assert(out.toSeq === Seq(
      ("t", 1L, 2L, 1L, 1L, 100L, 600L, 300L, 100L,
        Some(-400000000L)),
      ("u", 0L, 0L, 0L, 1L, 0L, 0L, 0L, 900L, None)))
  }

  test("funnelLatency: rank-picked step latencies, window and " +
    "ordering exclusions, absent zero-conversion steps") {
    // u1: view->click 600 s, click->purchase 1800 s
    // u2: view->click 300 s, click->purchase 3600 s
    // u3: view->click 1200 s, no purchase
    // u4: view only; u5: click BEFORE its view (never qualifies);
    // u6: click 25 h after view (outside the 24 h window)
    // step 2 dts {300,600,1200}: p50 = pick at ((3-1)*1) div 2 + 1 =
    //   pos 2 -> 600; p90 at ((2)*9) div 10 + 1 = pos 2 -> 600;
    //   mean = 2100/3 = 700 s
    // step 3 dts {1800,3600}: p50 = pos 1 -> 1800; p90 = pos 1 ->
    //   1800; mean = 2700 s
    val rows = Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:10:00"),
      (1L, "purchase", "2024-01-01 10:40:00"),
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:05:00"),
      (2L, "purchase", "2024-01-01 11:05:00"),
      (3L, "view", "2024-01-01 10:00:00"),
      (3L, "click", "2024-01-01 10:20:00"),
      (4L, "view", "2024-01-01 10:00:00"),
      (5L, "click", "2024-01-01 09:00:00"),
      (5L, "view", "2024-01-01 10:00:00"),
      (6L, "view", "2024-01-01 10:00:00"),
      (6L, "click", "2024-01-02 11:00:00"))
    val ev = rows
      .toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.funnelLatency(ev).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_users"), r.getAs[Long]("mean_s_micro"),
        r.getAs[Long]("p50_s"), r.getAs[Long]("p90_s")))
    assert(out.toSeq === Seq(
      (2L, "click", 3L, 700000000L, 600L, 600L),
      (3L, "purchase", 2L, 2700000000L, 1800L, 1800L)))
    // zero-conversion steps are ABSENT, not zero-filled: drop the
    // purchases and only step 2 remains
    val noPurch = ev.filter(col("event_type") =!= "purchase")
    val out2 = RelationalQueries.funnelLatency(noPurch).collect()
    assert(out2.map(_.getAs[Long]("step")).toSeq === Seq(2L))
  }

  test("shrinkageCensus: hand-computed MoM fit, small segments " +
    "shrink harder, zero-variance corpus and single type read NULL") {
    // type a: users {100, 300} cents -> n=2 mean 200
    // type b: users {500, 700}      -> n=2 mean 600
    // type c: user  {400}           -> n=1 mean 400 (= grand mean)
    // grand m = 400; SSW = 40000 -> sig2w = 20000; SSB = 160000;
    // c = 5 - 9/5 = 3.2 -> tau2 = 120000/3.2 = 37500
    // w_a = w_b = 37500/47500 = 15/19 -> 789473 micro
    //   shrunk_a = 400 - (15/19)*200 = 4600/19 -> 242105263
    //   shrunk_b = 10600/19           -> 557894736
    // w_c = 37500/57500 = 15/23 -> 652173; shrunk_c = 400 exactly
    val rows = Seq(
      (2L, "a", 1.00), (4L, "a", 3.00),
      (1L, "b", 5.00), (3L, "b", 7.00),
      (5L, "c", 4.00))
    def mk(rs: Seq[(Long, String, Double)]) = rs.zipWithIndex
      .map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.shrinkageCensus(mk(rows)).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("mean_micro"),
        Option(r.getAs[java.lang.Long]("w_micro")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("shrunk_micro")).map(_.toLong)))
    assert(out.toSeq === Seq(
      ("a", 2L, 200000000L, Some(789473L), Some(242105263L)),
      ("b", 2L, 600000000L, Some(789473L), Some(557894736L)),
      ("c", 1L, 400000000L, Some(652173L), Some(400000000L))))
    // the single-user segment shrinks HARDER (w_c < w_a) and no
    // segment overshoots the grand mean
    assert(out(2)._4.get < out(0)._4.get)
    out.foreach { case (_, _, mean, _, shrunk) =>
      shrunk.foreach(s => assert(
        math.abs(s - 400000000L) <= math.abs(mean - 400000000L)))
    }
    // zero total variance (every user identical) -> NULL fit
    val flat = mk(Seq((2L, "a", 5.00), (4L, "a", 5.00),
      (1L, "b", 5.00), (3L, "b", 5.00), (5L, "c", 5.00)))
    RelationalQueries.shrinkageCensus(flat).collect().foreach { r =>
      assert(r.isNullAt(r.fieldIndex("w_micro")))
      assert(r.isNullAt(r.fieldIndex("shrunk_micro")))
    }
    // single type (k = 1): nothing to pool across -> NULL fit
    val one = mk(Seq((2L, "a", 1.00), (4L, "a", 3.00),
      (6L, "a", 5.00)))
    RelationalQueries.shrinkageCensus(one).collect().foreach { r =>
      assert(r.isNullAt(r.fieldIndex("w_micro")))
    }
  }

  test("aaCensus: arm derivation equals an explicit md5-parity " +
    "relabel through the shared welch machinery; degenerate null " +
    "reads calibrated") {
    val rows = Seq(
      (1L, "t", 1.00), (2L, "t", 2.00), (3L, "t", 3.00),
      (4L, "t", 4.00), (5L, "t", 2.50), (6L, "t", 1.50),
      (1L, "u", 5.00), (2L, "u", 5.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    // independent relabel: derive the md5 arms in the TEST, remap
    // user parity to them, run the plain welch census — must equal
    // the operator row for row (plus its calibrated column)
    import graft.functions.Hashing
    val relabeled = ev.withColumn("user_id",
      col("user_id") * 2L + Hashing.md5Long(
        concat(lit("aa:"), col("user_id").cast("string"))) % 2L)
    val expected = RelationalQueries.welchCensus(relabeled).collect()
      .map(_.toSeq)
    val out = RelationalQueries.aaCensus(ev).collect()
    assert(out.map(_.toSeq.dropRight(1)).toSeq === expected.toSeq)
    // type u: every user holds the same constant value -> zero
    // variance in any split -> NULL t -> calibrated (an empty cell is
    // not a broken pipeline)
    val u = out.find(_.getAs[String]("event_type") == "u").get
    assert(u.isNullAt(u.fieldIndex("t_micro")))
    assert(u.getAs[Boolean]("calibrated"))
    // fixture sanity: `calibrated` is exactly the |t| < 1.96 compare
    // (NULL -> true). NOTE deliberately NOT "all types calibrated":
    // a true A/A flags each type with probability alpha = 5 %, so a
    // 5-type corpus reads a false positive ~23 % of the time — on
    // this deterministic fixture one type does, which is the test
    // WORKING (the per-type rate is what the platform monitors)
    val fixture = RelationalQueries
      .qAaTest(spark, "/root/testdata/sf0.001").collect()
    assert(fixture.nonEmpty)
    fixture.foreach { r =>
      val t = Option(r.getAs[java.lang.Long]("t_micro")).map(_.toLong)
      assert(r.getAs[Boolean]("calibrated") ===
        t.forall(v => math.abs(v) < 1960000L))
    }
  }

  test("powerCensus: hand-computed users-per-arm over the delta " +
    "grid, degenerate arms read NULL and never sufficient") {
    // the welch 't' fixture: s2_a = 5000, s2_b = 20000 (sum 25000),
    // mean_a = 250 cents; n_req = 2.8016^2 * 25000 / (pct/100 * 250)^2
    //   1% (2.5c):  196224.064/6.25    = 31395.85.. -> 31396
    //   5% (12.5c): /156.25            = 1255.83..  -> 1256
    //   10% (25c):  /625               = 313.95..   -> 314
    //   25% (62.5c):/3906.25           = 50.23..    -> 51
    // type u: single-user arms -> guard fails -> NULL, false
    val rows = Seq(
      (2L, "t", 1.00), (2L, "t", 2.00), (4L, "t", 2.00),
      (1L, "t", 3.00), (3L, "t", 1.00),
      (2L, "u", 5.00), (1L, "u", 5.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.powerCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("delta_pct"),
        Option(r.getAs[java.lang.Long]("n_req")).map(_.toLong),
        r.getAs[Boolean]("sufficient")))
    assert(out.toSeq === Seq(
      ("t", 1L, Some(31396L), false),
      ("t", 5L, Some(1256L), false),
      ("t", 10L, Some(314L), false),
      ("t", 25L, Some(51L), false),
      ("u", 1L, None, false),
      ("u", 5L, None, false),
      ("u", 10L, None, false),
      ("u", 25L, None, false)))
  }

  test("msprtCensus: hand-computed log-Lambda per day, always-valid " +
    "-ln p monotone, null arms never cross, degenerate days NULL") {
    // type t (real effect): day1 arm a (u2) = {0.00, 2.00}, arm b
    //   (u1) = {10.00, 10.00} -> V = s2a/2 + 0 = 10000 = tau^2,
    //   delta = 100 - 1000 = -900 cents ->
    //   llr = 0.5*ln(1/2) + 1e4*810000/(2*1e4*2e4)
    //       = -0.34657359.. + 20.25 = 19.90342640.. -> 19903426,
    //   crossed (>= ln 20 = 2995732)
    //   day2 adds a:{1.00} b:{10.00} -> V = 10000/3, delta = -900 ->
    //   llr = 91.125 - ln 2 = 90.43185281.. -> 90431852; lp ratchets
    // type n (null): identical arm values each day -> delta = 0 ->
    //   llr = 0.5*ln(V/(V+tau^2)) < 0 -> lp_day = 0 -> lp stays 0,
    //   NEVER crosses (the always-valid no-crossing null)
    //   day1: 0.5*ln(2/3) -> -202733; day2: 0.5*ln(2/5) -> -458146
    // type u (degenerate): day1 single event per arm (n < 2) -> NULL;
    //   day2 both arms constant -> V = 0 -> still NULL, never crosses
    val rows = Seq(
      (2L, "t", "2024-01-01 10:00:00", 0.00),
      (2L, "t", "2024-01-01 11:00:00", 2.00),
      (1L, "t", "2024-01-01 12:00:00", 10.00),
      (1L, "t", "2024-01-01 13:00:00", 10.00),
      (2L, "t", "2024-01-02 10:00:00", 1.00),
      (1L, "t", "2024-01-02 11:00:00", 10.00),
      (2L, "n", "2024-01-01 10:00:00", 1.00),
      (2L, "n", "2024-01-01 11:00:00", 3.00),
      (1L, "n", "2024-01-01 12:00:00", 1.00),
      (1L, "n", "2024-01-01 13:00:00", 3.00),
      (2L, "n", "2024-01-02 10:00:00", 2.00),
      (1L, "n", "2024-01-02 11:00:00", 2.00),
      (2L, "u", "2024-01-01 10:00:00", 5.00),
      (1L, "u", "2024-01-01 11:00:00", 5.00),
      (2L, "u", "2024-01-02 10:00:00", 5.00),
      (1L, "u", "2024-01-02 11:00:00", 5.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, ts, v), i) => (i.toLong, u, t, ts, v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.msprtCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Long]("cn_a"), r.getAs[Long]("cn_b"),
        r.getAs[Long]("csum_a"), r.getAs[Long]("csum_b"),
        Option(r.getAs[java.lang.Long]("llr_micro")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("lp_micro")).map(_.toLong),
        r.getAs[Boolean]("crossed")))
    assert(out.toSeq === Seq(
      ("n", "2024-01-01", 2L, 2L, 400L, 400L,
        Some(-202733L), Some(0L), false),
      ("n", "2024-01-02", 3L, 3L, 600L, 600L,
        Some(-458146L), Some(0L), false),
      ("t", "2024-01-01", 2L, 2L, 200L, 2000L,
        Some(19903426L), Some(19903426L), true),
      ("t", "2024-01-02", 3L, 3L, 300L, 3000L,
        Some(90431852L), Some(90431852L), true),
      ("u", "2024-01-01", 1L, 1L, 500L, 500L, None, None, false),
      ("u", "2024-01-02", 2L, 2L, 1000L, 1000L, None, None, false)))
    // the always-valid statistic is monotone non-decreasing within
    // every type (running max of a non-negative day statistic)
    out.groupBy(_._1).foreach { case (_, days) =>
      val lps = days.sortBy(_._2).flatMap(_._8)
      assert(lps === lps.sorted, s"lp must be monotone: ${lps.toSeq}")
    }
  }

  test("srmCensus: two-cell chi2 collapses to (na-nb)^2/n, alarm at " +
    "the 0.001 bar") {
    // type t: 3 even vs 1 odd user -> chi2 = 4/4 = 1.0, no alarm
    // type w: 12 even, 0 odd -> chi2 = 144/12 = 12 >= 10.827566 ->
    //   alarm
    val rows =
      Seq((2L, "t"), (4L, "t"), (6L, "t"), (1L, "t")) ++
        (1 to 12).map(i => (2L * i, "w"))
    val ev = rows.zipWithIndex
      .map { case ((u, t), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.srmCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("chi2_micro"),
        r.getAs[Boolean]("srm_alarm")))
    assert(out.toSeq === Seq(
      ("t", 3L, 1L, 1000000L, false),
      ("w", 12L, 0L, 12000000L, true)))
  }

  test("clusterSeCensus: hand-computed CR0 cluster residuals, z, and " +
    "design effects (deff 2.0 when all variation is between-user)") {
    // type "t" — arm a (even users): user 2 events {1.00, 3.00}
    //   (T=400, n=2), user 4 {5.00} (T=500): na=3, sa=900, m=300;
    //   devs ±200 -> crna = 2·40000 = 80000
    //   arm b (odd): user 1 {1.00}, user 3 {7.00}: nb=2, sb=800,
    //   m=400; devs ±300 -> crnb = 2·90000 = 180000
    //   z = (400-300)/√(80000/9 + 180000/4) -> 430774 micro
    // type "corr" — arm a: user 2 {1.00, 1.00}, user 4 {3.00, 3.00}
    //   (ALL variation between users): cluster var of the mean =
    //   2× the iid one -> deff_a exactly 2.0; arm b: user 1
    //   {1.00, 3.00}, user 3 {1.00, 3.00} (all variation WITHIN
    //   users): crnb = 0 -> deff_b = 0, z = 0 exactly
    val rows = Seq(
      (2L, "t", 1.00), (2L, "t", 3.00), (4L, "t", 5.00),
      (1L, "t", 1.00), (3L, "t", 7.00),
      (2L, "corr", 1.00), (2L, "corr", 1.00),
      (4L, "corr", 3.00), (4L, "corr", 3.00),
      (1L, "corr", 1.00), (1L, "corr", 3.00),
      (3L, "corr", 1.00), (3L, "corr", 3.00))
    val ev = rows.zipWithIndex.map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.clusterSeCensus(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("users_a"), r.getAs[Long]("users_b"),
          r.getAs[Long]("cr_mass_a"), r.getAs[Long]("cr_mass_b"),
          Option(r.getAs[java.lang.Long]("z_micro")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("deff_a_micro"))
            .map(_.toLong),
          Option(r.getAs[java.lang.Long]("deff_b_micro"))
            .map(_.toLong))).toMap
    assert(out("t") === ((3L, 2L, 2L, 2L, 80000L, 180000L,
      Some(430774L), Some(999999L), Some(1000000L))))
    assert(out("corr") === ((4L, 4L, 2L, 2L, 80000L, 0L,
      Some(0L), Some(2000000L), Some(0L))))
  }

  test("multTestThrMicro: shared literal quantile table matches " +
    "reference normal quantiles") {
    val thr = RelationalQueries.multTestThrMicro.toMap
    // z_{0.975}, z_{0.9875}, z_{0.995}, z_{1-0.025/64} — textbook /
    // NormalDist reference values in micro
    assert(thr(1L) === 1959963L)
    assert(thr(2L) === 2241402L)
    assert(thr(5L) === 2575829L)
    assert(thr(64L) === 3359353L)
    assert(thr.size === RelationalQueries.MultTestMaxFamily)
    // monotone: wider families demand larger |z|
    (2 to RelationalQueries.MultTestMaxFamily).foreach(d =>
      assert(thr(d.toLong) > thr(d.toLong - 1)))
  }

  test("multTestCensus: Holm step-down stops at the first failure — " +
    "a later rank can pass its own bar yet stay non-significant") {
    // |t| engineered: big ≈ 14142 (passes everything), mid ≈ 2.10
    //   (fails its Holm bar z_{α/4} = 2.2414), small ≈ 1.98 (passes
    //   the naive 1.96 bar but sits AFTER the stop)
    val rows = Seq(
      (2L, "big", 100.00), (4L, "big", 100.01),
      (1L, "big", 0.00), (3L, "big", 0.01),
      (2L, "mid", 0.00), (4L, "mid", 2.00),
      (1L, "mid", 2.97), (3L, "mid", 4.97),
      (2L, "small", 0.00), (4L, "small", 2.00),
      (1L, "small", 2.80), (3L, "small", 4.80))
    val ev = rows.zipWithIndex.map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.multTestCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Long]("family"), r.getAs[Long]("rank"),
        r.getAs[Long]("divisor"), r.getAs[Long]("holm_thr_micro"),
        r.getAs[Boolean]("naive_sig"), r.getAs[Boolean]("bonferroni_sig"),
        r.getAs[Boolean]("holm_sig"))).toSeq
    assert(out === Seq(
      ("big", 3L, 1L, 3L, 2393979L, true, true, true),
      ("mid", 3L, 2L, 2L, 2241402L, true, false, false),
      ("small", 3L, 3L, 1L, 1959963L, true, false, false)))
  }

  test("multTestCensus: a family past MultTestMaxFamily fails LOUDLY " +
    "(raise_error), never silently truncates the readout") {
    // 65 testable types (needs n>=2 per arm + nonzero pooled variance):
    // 4 users per type, arm-a values differ -> welch guard passes
    val n = RelationalQueries.MultTestMaxFamily + 1
    val rows = for {
      t <- 0 until n
      u <- Seq(1L, 2L, 3L, 4L)
    } yield (u, f"t$t%03d", if (u == 2L) 1.00 + t * 0.01 else 3.00)
    val ev = rows.zipWithIndex.map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val e = intercept[Exception] {
      RelationalQueries.multTestCensus(ev).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("exceeds MultTestMaxFamily")),
      s"expected the family-cap raise_error, got: $e")
    // one under the cap still works end-to-end
    val okRows = rows.filter(_._2 < f"t${n - 1}%03d")
    val okEv = okRows.zipWithIndex.map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val ok = RelationalQueries.multTestCensus(okEv).collect()
    assert(ok.length === RelationalQueries.MultTestMaxFamily)
    assert(ok.forall(_.getAs[Long]("family") ===
      RelationalQueries.MultTestMaxFamily.toLong))
  }

  test("clusterSeCensus: int64 overflow of the n*T_c cluster residual " +
    "errors loudly under the session's ANSI mode (never wraps)") {
    assert(spark.conf.get("spark.sql.ansi.enabled").toBoolean,
      "suite session must run ANSI (the Spark 4 default) — the " +
        "clusterSe exactness contract depends on it")
    // arm a (even users): 10 users, one event each of 1e16 -> t_c =
    // 1e18 cents, nn = 10 -> nn*t_c = 1e19 > Long.MaxValue; arm b
    // (odd users) benign so neither join side is empty
    val rows = (1L to 10L).map(u => (u * 2, "t", 1.0e16)) ++
      (1L to 10L).map(u => (u * 2 + 1, "t", 1.0))
    val ev = rows.zipWithIndex.map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val e = intercept[Exception] {
      RelationalQueries.clusterSeCensus(ev).collect()
    }
    def all(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: all(x.getCause))
    assert(all(e).exists(t => t.isInstanceOf[ArithmeticException] ||
        Option(t.getMessage).exists(m =>
          m.toLowerCase.contains("overflow"))),
      s"expected a loud arithmetic overflow, got: $e")
  }

  test("leveneCensus: rank-picked lower medians, integer deviation " +
    "sums, hand-computed Brown-Forsythe F") {
    // S1: cents {100, 200, 300, 1000} -> med = rank (4+1) div 2 = 2
    //   -> 200; z = {100, 0, 100, 800}: z_sum 1000, z_ss 660000,
    //   u = floor(1000^2/4) = 250000
    // S2: cents {100, 100, 500} -> target 2, cum at 100 is 2 -> med
    //   100; z = {0, 0, 400}: z_sum 400, z_ss 160000,
    //   u = floor(400^2/3) = 53333
    // global: nn=7 kk=2 zz=1400 sstot=820000 uu=303333
    //   F = 5 * ((303333 - 1400^2/7) / (820000 - 303333))
    //     = 5 * 23333/516667 = 0.225803... -> 225803
    val cust = Seq(
      (1L, "S1", 1.00), (2L, "S1", 2.00), (3L, "S1", 3.00),
      (4L, "S1", 10.00),
      (5L, "S2", 1.00), (6L, "S2", 1.00), (7L, "S2", 5.00))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val out = RelationalQueries.leveneCensus(cust).collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[Long]("n"),
        r.getAs[Long]("med_cents"), r.getAs[Long]("z_sum"),
        r.getAs[Long]("z_ss"), r.getAs[Long]("u"),
        Option(r.getAs[java.lang.Long]("f_micro")).map(_.toLong),
        r.getAs[Long]("df1"), r.getAs[Long]("df2")))
    assert(out.toSeq === Seq(
      ("S1", 4L, 200L, 1000L, 660000L, 250000L, Some(225803L), 1L, 5L),
      ("S2", 3L, 100L, 400L, 160000L, 53333L, Some(225803L), 1L, 5L)))
    // single-segment corpus: k < 2 -> NULL F on its one row
    val one = RelationalQueries.leveneCensus(
      cust.filter(col("c_mktsegment") === "S1")).collect()
    assert(one.length === 2 - 1)
    assert(one.head.getAs[java.lang.Long]("f_micro") === null)
  }

  test("wilcoxonCensus: first/last by event_id, zero diffs drop, " +
    "doubled midranks, hand-computed z") {
    // type t: user 1 d=+200, user 2 d=-100, user 3 single event
    //   (d=0, drops), user 4 d=+200
    // census: a=100 (0 pos, 1 neg) rank2=2; a=200 (2 pos) rank2=5
    // n=3, W+*2 = 10, tie_cubes = 6, var = 3.375,
    // z = (5-3)/sqrt(3.375) = 1.088662... -> 1088662
    // type u: every user single-event -> no rows at all
    val rows = Seq(
      (1L, "t", 1.00), (1L, "t", 3.00),
      (2L, "t", 2.00), (2L, "t", 1.00),
      (3L, "t", 5.00),
      (4L, "t", 1.00), (4L, "t", 3.00),
      (1L, "u", 9.00), (2L, "u", 4.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.wilcoxonCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
        r.getAs[Long]("w_x2"), r.getAs[Long]("tie_cubes"),
        Option(r.getAs[java.lang.Long]("z_micro")).map(_.toLong)))
    assert(out.toSeq === Seq(
      ("t", 3L, 2L, 1L, 10L, 6L, Some(1088662L))))
  }

  test("ksArmsCensus: integer sup over the pooled census, exact D, " +
    "single-arm type reads NULL") {
    // type t: arm A (even users) cents {100, 300}, arm B (odd)
    //   {300, 300}; sup at v=100: |1*2 - 0*2| = 2 -> D = 0.5,
    //   KS = sqrt(4/4)*0.5 = 0.5
    // type u: only an odd user -> n_a = 0 -> NULLs
    val rows = Seq(
      (2L, "t", 1.00), (4L, "t", 3.00),
      (1L, "t", 3.00), (3L, "t", 3.00),
      (1L, "u", 2.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.ksArmsCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("d_num"),
        Option(r.getAs[java.lang.Long]("d_micro")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("ks_micro")).map(_.toLong)))
    assert(out.toSeq === Seq(
      ("t", 2L, 2L, 2L, Some(500000L), Some(500000L)),
      ("u", 0L, 1L, 0L, None, None)))
  }

  test("qteCensus: rank-picked per-arm quantiles, exact integer " +
    "differences, single-arm types emit nothing") {
    // type t: arm A values {100,200,300,400}, arm B {200,400,600,800}
    // positions on n=4: p25->1, p50->2, p75->3, p90->3
    // type u: only odd users -> inner join drops it
    val rows = Seq(
      (2L, "t", 1.00), (4L, "t", 2.00), (6L, "t", 3.00),
      (8L, "t", 4.00),
      (1L, "t", 2.00), (3L, "t", 4.00), (5L, "t", 6.00),
      (7L, "t", 8.00),
      (1L, "u", 5.00))
    val ev = rows.zipWithIndex
      .map { case ((u, t, v), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", v) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.qteCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[String]("q_label"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("q_a"),
        r.getAs[Long]("q_b"), r.getAs[Long]("qte")))
    assert(out.toSeq === Seq(
      ("t", "p25", 4L, 4L, 100L, 200L, 100L),
      ("t", "p50", 4L, 4L, 200L, 400L, 200L),
      ("t", "p75", 4L, 4L, 300L, 600L, 300L),
      ("t", "p90", 4L, 4L, 300L, 600L, 300L)))
  }

  test("momentsCensus: exact power sums, IEEE-pinned skew/kurtosis, " +
    "zero-variance type reads NULL") {
    // type t: per-user counts {3, 1, 2} -> n=3 s1=6 s2=14 s3=36 s4=98
    //   mean 2; m2 = 2/3; m3 = 0 exactly under the pinned tree ->
    //   skew 0; m4/m2^2 - 3 = -1.50000...06 -> kurt floor -1500001
    //   (the tree's last bit differs from the algebraic -1.5 — the
    //   pinned constant is the IEEE value both engines compute)
    // type c: both users 1 event -> m2 = 0 -> NULL skew/kurt
    val rows = Seq(
      (1L, "t"), (1L, "t"), (1L, "t"), (2L, "t"), (3L, "t"), (3L, "t"),
      (1L, "c"), (2L, "c"))
    val ev = rows.zipWithIndex
      .map { case ((u, t), i) =>
        (i.toLong, u, t, "2024-01-01 12:00:00", 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val out = RelationalQueries.momentsCensus(ev).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Long]("s1"), r.getAs[Long]("s2"), r.getAs[Long]("s3"),
        r.getAs[Long]("s4"), r.getAs[Long]("mean_micro"),
        Option(r.getAs[java.lang.Long]("skew_micro")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("kurt_micro")).map(_.toLong)))
    assert(out.toSeq === Seq(
      ("c", 2L, 2L, 2L, 2L, 2L, 1000000L, None, None),
      ("t", 3L, 6L, 14L, 36L, 98L, 2000000L,
        Some(0L), Some(-1500001L))))
  }
}
