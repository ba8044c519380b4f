package graft

import graft.functions.TextFunctions._
import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("upsample: integer weights copy exactly, fracs draw, zero drops, (id, epoch) unique") {
    val df = (0L until 4000L).map(i => (i, s"src${i % 4}")).toDF("id", "stratum")
    val w = Map("src0" -> 2.0, "src1" -> 0.0, "src2" -> 1.5)
    val out = Sampling.upsample(df, "id", "stratum", w).cache()
    val byStratum = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("src0") == 2000L, "integer weight 2.0 is exactly 2 copies each")
    assert(!byStratum.contains("src1"), "weight 0 drops the stratum")
    assert(byStratum("src3") == 1000L, "unmapped stratum takes defaultWeight 1.0")
    // 1.5: one guaranteed copy + ~half draw the second
    assert(byStratum("src2") >= 1000L && byStratum("src2") <= 2000L)
    assert(math.abs(byStratum("src2") - 1500L) < 150, byStratum.toString)
    assert(out.select("id", "epoch").distinct().count() == out.count(),
      "(id, epoch) is the output key")
    val epochs = out.where($"stratum" === "src0").groupBy($"id")
      .agg(sort_array(collect_list($"epoch")).as("es"))
      .select($"es").distinct().collect().map(_.getSeq[Long](0))
    assert(epochs.length == 1 && epochs.head == Seq(1L, 2L),
      s"epoch indices are 1..copies: ${epochs.toSeq}")
    // pure function of the id: repartitioning changes nothing
    val again = Sampling.upsample(df.repartition(13), "id", "stratum", w)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    out.unpersist()
    // null strata take defaultWeight (the === comparison is null-safe-false)
    val withNull = Seq((1L, Option.empty[String]), (2L, Some("src0")))
      .toDF("id", "stratum")
    val nulled = Sampling.upsample(withNull, "id", "stratum",
      Map("src0" -> 2.0), defaultWeight = 3.0)
      .groupBy($"id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nulled(1L) == 3L && nulled(2L) == 2L, nulled.toString)
    intercept[IllegalArgumentException] {
      Sampling.upsample(df.withColumn("epoch", lit(1L)), "id", "stratum", w)
    }
  }

  test("stratified: deterministic, rate-faithful, and a scan-local filter") {
    val df = (0L until 10000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "stratum")
    val rates = Map("en" -> 0.5, "de" -> 0.1)
    val once = Sampling.stratified(df, "id", "stratum", rates).collect().map(_.getLong(0)).toSet
    val twice = Sampling.stratified(df, "id", "stratum", rates).collect().map(_.getLong(0)).toSet
    assert(once == twice, "the sample must be a pure function of the ids")

    val byStratum = Sampling.stratified(df, "id", "stratum", rates)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5000 candidates per stratum; md5 uniformity keeps the draw within a
    // loose band of the target rate
    assert(math.abs(byStratum("en") - 2500L) < 300, byStratum.toString)
    assert(math.abs(byStratum("de") - 500L) < 150, byStratum.toString)

    // edge rates: 1.0 keeps everything, unlisted strata use defaultRate 0
    assert(Sampling.stratified(df, "id", "stratum", Map("en" -> 1.0)).count() == 5000)
    val plan = Sampling.stratified(df, "id", "stratum", rates)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("fixedKPerStratum: exactly k per stratum, short strata whole, null its own group") {
    val df = ((0L until 300L).map(i => (i, s"g${i % 3}")) ++
      Seq((300L, null: String), (301L, null: String), (302L, "tiny")))
      .toDF("id", "stratum")
    val out = Sampling.fixedKPerStratum(df, "id", "stratum", 7).cache()
    val byStratum = out.groupBy("stratum").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(byStratum == Map(Some("g0") -> 7L, Some("g1") -> 7L,
      Some("g2") -> 7L, None -> 2L, Some("tiny") -> 1L))
    // deterministic: the kept set is a pure function of (id, stratum, k) —
    // identical under a different physical partitioning
    val again = Sampling.fixedKPerStratum(df.repartition(13), "id", "stratum", 7)
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      out.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // kept rows are each stratum's k smallest by the md5 draw
    def hex8(i: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    val g0Kept = out.where($"stratum" === "g0")
      .select("id").collect().map(_.getLong(0)).toSet
    val g0Want = (0L until 300L).filter(_ % 3 == 0)
      .sortBy(i => (hex8(i), i)).take(7).toSet
    assert(g0Kept == g0Want)
    out.unpersist()
    intercept[IllegalArgumentException](
      Sampling.fixedKPerStratum(df, "id", "stratum", 0))
    intercept[IllegalArgumentException](Sampling.fixedKPerStratum(
      df.withColumn("__rk", lit(1)), "id", "stratum", 1))
  }

  test("tokenBudget: greedy draw-order prefix per stratum, budget respected exactly") {
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "en" else "de", 10L + i % 7))
      .toDF("id", "stratum", "n_tok")
    val picked = Sampling.tokenBudget(df, "id", "stratum", "n_tok",
      Map("en" -> 300L, "de" -> 120L))
    val byStratum = picked.groupBy("stratum")
      .agg(sum("n_tok").as("tok"), count("*").as("n")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byStratum("en")._1 <= 300L && byStratum("en")._1 > 300L - 17L, byStratum.toString)
    assert(byStratum("de")._1 <= 120L && byStratum("de")._1 > 120L - 17L, byStratum.toString)

    // prefix property: the admitted set is closed under "earlier in draw
    // order" — no admitted row draws later than a rejected row of the
    // same stratum
    val admitted = picked.select("id").collect().map(_.getLong(0)).toSet
    val draws = df.select(col("id"), col("stratum"),
        Sampling.drawHex(col("id")).as("draw")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    for (st <- Seq("en", "de")) {
      val inStratum = draws.filter(_._2 == st).sortBy(d => (d._3, d._1))
      val flags = inStratum.map(d => admitted.contains(d._1))
      assert(!flags.dropWhile(identity).contains(true),
        s"$st: admitted set is not a draw-order prefix")
    }

    // unlisted stratum with defaultBudget 0 admits nothing
    val other = (0L until 10L).map(i => (i, "fr", 5L)).toDF("id", "stratum", "n_tok")
    assert(Sampling.tokenBudget(other, "id", "stratum", "n_tok", Map("en" -> 10L)).count() == 0)
  }

  test("tokenBudget: null strata ride defaultBudget; string tokens coerce; temp names don't clobber") {
    // null stratum is its own stratum budgeted at defaultBudget — the old
    // window form admitted them (null === k falls to otherwise); the
    // two-pass form must too
    val withNull = Seq((1L, "en", 10L), (2L, null, 10L), (3L, null, 10L), (4L, null, 10L))
      .toDF("id", "stratum", "n_tok")
    val kept = Sampling.tokenBudget(withNull, "id", "stratum", "n_tok",
        Map("en" -> 100L), defaultBudget = 20L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L), "en row within budget must stay")
    assert((kept - 1L).size == 2, s"exactly 2 of 3 null-stratum rows fit the 20-token default budget: $kept")
    // defaultBudget 0 (the default) excludes null strata entirely
    assert(Sampling.tokenBudget(withNull, "id", "stratum", "n_tok",
      Map("en" -> 100L)).select("id").collect().map(_.getLong(0)).toSet == Set(1L))

    // string-typed token column coerces with SQL cast semantics; a null
    // token counts 0 and the row is admitted
    val strTok = Seq((1L, "en", "10"), (2L, "en", null), (3L, "en", "15"))
      .toDF("id", "stratum", "n_tok")
    val keptStr = Sampling.tokenBudget(strTok, "id", "stratum", "n_tok", Map("en" -> 25L))
      .select("id").collect().map(_.getLong(0)).toSet
    // draw order decides which rows fill the 25 budget; the null-token row
    // is free so it always survives if reached before the budget closes
    assert(keptStr.contains(2L), s"null-token row must not be dropped: $keptStr")

    // a user column literally named __tb_draw survives untouched
    val clash = Seq((1L, "en", 10L, "mine")).toDF("id", "stratum", "n_tok", "__tb_draw")
    val out = Sampling.tokenBudget(clash, "id", "stratum", "n_tok", Map("en" -> 100L))
    assert(out.columns.contains("__tb_draw") && out.head().getString(3) == "mine")
  }

  test("mixtureBudget: binding stratum admitted whole, proportions held, whitelist semantics") {
    // zh has far fewer tokens than its share asks for -> it binds
    val docs = ((0L until 300L).map(i => (i, "en", 10L)) ++
      (300L until 330L).map(i => (i, "zh", 10L)) ++
      (330L until 360L).map(i => (i, "xx", 10L))) // not in shares -> dropped
      .toDF("doc_id", "lang", "n_tok")
    val shares = Map("en" -> 0.5, "zh" -> 0.5)
    val kept = Sampling.mixtureBudget(docs, "doc_id", "lang", "n_tok", shares, 100000L)
      .groupBy($"lang").agg(sum($"n_tok").as("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // achievable = min(100000, en 6000/.5=12000, zh 300/.5=600) = 600
    assert(kept == Map("en" -> 300L, "zh" -> 300L),
      s"binding zh must be whole and en scaled to match: $kept")

    // total binds when every stratum has headroom: achievable = 400,
    // budgets 200/200, and the 10-token docs tile the budgets exactly
    val kept2 = Sampling.mixtureBudget(docs, "doc_id", "lang", "n_tok", shares, 400L)
      .groupBy($"lang").agg(sum($"n_tok").as("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept2 == Map("en" -> 200L, "zh" -> 200L), s"total-bound case: $kept2")

    // a configured stratum ABSENT from the corpus must not bind achievable
    // to 0 and silently empty the result (it matches the oracle's inner
    // join: ignored)
    val keptAbsent = Sampling.mixtureBudget(docs, "doc_id", "lang", "n_tok",
        Map("en" -> 0.5, "zh" -> 0.3, "missing" -> 0.2), 400L)
      .groupBy($"lang").agg(sum($"n_tok").as("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptAbsent == Map("en" -> 200L, "zh" -> 120L),
      s"absent stratum must be ignored, not binding: $keptAbsent")

    intercept[IllegalArgumentException] {
      Sampling.mixtureBudget(docs, "doc_id", "lang", "n_tok", Map("en" -> 0.7), 100L)
    }
    intercept[IllegalArgumentException] {
      Sampling.mixtureBudget(docs, "doc_id", "lang", "n_tok",
        Map("en" -> 0.5, "zh" -> 0.5, "de" -> 0.0), 100L)
    }
  }

  test("tokenBudgetByRate: scan-local twin lands near the budget in expectation") {
    val df = (0L until 4000L).map(i => (i, "en", 10L)).toDF("id", "stratum", "n_tok")
    // total 40000 tokens, budget 10000 -> rate 0.25
    val picked = Sampling.tokenBudgetByRate(df, "id", "stratum", "n_tok", Map("en" -> 10000L))
    val tok = picked.agg(sum("n_tok")).head().getLong(0)
    assert(math.abs(tok - 10000L) < 1500L, s"admitted $tok tokens for a 10000 budget")
    // over-budget stratum keeps everything
    val all = Sampling.tokenBudgetByRate(df, "id", "stratum", "n_tok", Map("en" -> 100000L))
    assert(all.count() == 4000L)
  }

  test("temperatureMix: alpha flattens toward uniform; alpha=1 is proportional thinning") {
    // 8000 en vs 800 de — a 10:1 natural imbalance
    val df = ((0L until 8000L).map(i => (i, "en")) ++
      (8000L until 8800L).map(i => (i, "de"))).toDF("id", "stratum")
    def mixCounts(alpha: Double, total: Long): Map[String, Long] =
      Sampling.temperatureMix(df, "id", "stratum", alpha, total)
        .groupBy("stratum").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha = 1: q = p, every stratum thinned at the SAME rate
    val a1 = mixCounts(1.0, 4400L)
    assert(math.abs(a1("en").toDouble / a1("de") - 10.0) < 2.0,
      s"proportional mix should keep the 10:1 ratio: $a1")
    // alpha = 0: q uniform — de saturates (only 800 docs for a 2200 ask),
    // so the target scales to de's capacity ~1600 and both land near 800
    val a0 = mixCounts(0.0, 4400L)
    assert(math.abs(a0("en").toDouble / a0("de") - 1.0) < 0.2,
      s"alpha=0 should equalize strata: $a0")
    assert(a0("de") > 700L, "binding stratum admitted (nearly) whole")
    // alpha = 0.5 sits between
    val ah = mixCounts(0.5, 4400L)
    val ratio = ah("en").toDouble / ah("de")
    assert(ratio > 1.5 && ratio < 9.0, s"sqrt temperature between the extremes: $ratio")
    // deterministic: same recipe, same rows
    val once = Sampling.temperatureMix(df, "id", "stratum", 0.5, 4400L)
      .agg(sum("id")).head().getLong(0)
    val twice = Sampling.temperatureMix(df, "id", "stratum", 0.5, 4400L)
      .agg(sum("id")).head().getLong(0)
    assert(once == twice)
    // no rate ever exceeds 1 (would throw in thresholdHex) even when the
    // ask dwarfs the corpus
    assert(mixCounts(0.0, 1000000L).values.sum <= 8800L)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(df, "id", "stratum", 1.5, 10L)
    }
  }

  test("repetition signals: hand-computed goldens (Gopher Table A1 semantics)") {
    val df = Seq(
      (1L, "a a b"),       // dup 1/3; 2-grams [a a, a b] → top 1/2
      (2L, "a a a"),       // dup 2/3; 2-grams [a a, a a] → top 2/2
      (3L, "x y z w"),     // no repetition
      (4L, "q"))           // shorter than any n-gram
      .toDF("id", "text")
    val rows = df.select($"id",
        round(dupTokenFrac(tokens($"text")), 6),
        round(topNgramFrac(tokens($"text"), 2), 6),
        round(topNgramFrac(tokens($"text"), 3), 6))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows(1L) == ((0.333333, 0.5, 1.0)), rows(1L).toString)
    assert(rows(2L) == ((0.666667, 1.0, 1.0)), rows(2L).toString)
    assert(rows(3L) == ((0.0, 0.333333, 0.5)), rows(3L).toString)
    assert(rows(4L) == ((0.0, 0.0, 0.0)), rows(4L).toString)
  }
}
