package graft

import org.apache.spark.sql.functions._

/** Contracts of the Misra–Gries `freq_items` aggregate (FreqItems.scala):
  * exact-regime equality (what the t10a gate row relies on), merge-order
  * invariance, and the approx-regime guarantees on a planted Zipf stream
  * the gate corpus's 31-token vocabulary cannot exercise — reported counts
  * are lower bounds, per-token error is within n/cap, and every token with
  * true frequency above n/cap survives the cuts.
  */
class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(expr(s"freq_items(token, $cap)").as("sk"))
      .select(explode($"sk").as("e"))
      .select($"e.token", $"e.n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def exact(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.groupBy($"token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  // deterministic Zipf-ish stream: token t_r has frequency ~ N/r
  private def zipf(n: Int, ranks: Int) = {
    val rows = for {
      r <- 1 to ranks
      c <- 1 to math.max(1, n / r)
    } yield s"t$r"
    rows.toDF("token").repartition(7)
  }

  test("exact regime: distinct <= cap reproduces the exact groupBy counts") {
    val df = zipf(2000, 40) // 40 distinct tokens
    assert(sketch(df, 64) == exact(df))
  }

  test("exact regime is partitioning/merge-order invariant") {
    val rows = (1 to 5000).map(i => s"t${i % 50}")
    val a = sketch(rows.toDF("token").repartition(1), 64)
    val b = sketch(rows.toDF("token").repartition(13), 64)
    assert(a == b)
    assert(a == exact(rows.toDF("token")))
  }

  test("approx regime: lower bounds, n/cap error, heavy hitters survive") {
    val ranks = 400
    val df = zipf(4000, ranks) // ~400 distinct >> cap
    val cap = 48
    val truth = exact(df)
    val n = truth.values.sum
    val sk = sketch(df, cap)
    assert(sk.nonEmpty && sk.size <= 2 * cap)
    sk.foreach { case (t, c) =>
      val tc = truth(t)
      assert(c <= tc, s"$t overestimated: $c > $tc")
      assert(tc - c <= n / cap, s"$t error ${tc - c} exceeds n/cap=${n / cap}")
    }
    // MG guarantee: any token with true count > n/cap is present
    truth.filter(_._2 > n / cap).keys.foreach { t =>
      assert(sk.contains(t), s"guaranteed survivor $t evicted")
    }
  }

  test("grouped usage: one sketch per group, exact within each group") {
    val df = Seq.tabulate(600)(i => (s"g${i % 3}", s"t${i % (10 + i % 3)}"))
      .toDF("g", "token").repartition(5)
    val got = df.groupBy($"g").agg(expr("freq_items(token, 32)").as("sk"))
      .select($"g", explode($"sk").as("e"))
      .collect().map(r => (r.getString(0), r.getStruct(1).getString(0)) ->
        r.getStruct(1).getLong(1)).toMap
    val truth = df.groupBy($"g", $"token").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == truth)
  }

  test("null tokens are skipped; non-literal or invalid cap fails analysis") {
    val withNulls = Seq(Some("a"), None, Some("a"), Some("b"))
      .toDF("token")
    assert(sketch(withNulls, 8) == Map("a" -> 2L, "b" -> 1L))
    val err = intercept[Exception] {
      Seq("a").toDF("token").agg(expr("freq_items(token, 0)")).collect()
    }
    assert(err.getMessage.contains("cap"))
  }

  test("non-integral cap and wrong arity fail analysis cleanly (ADVICE r10)") {
    // a string cap must be a type-check failure, not a ClassCastException
    // thrown from eval() inside checkInputDataTypes
    val typeErr = intercept[Exception] {
      Seq("a").toDF("token").agg(expr("freq_items(token, 'x')")).collect()
    }
    assert(typeErr.getMessage.contains("integral")
      || typeErr.getMessage.toLowerCase.contains("type"),
      s"expected a type-check failure, got: ${typeErr.getMessage}")
    assert(!typeErr.isInstanceOf[ClassCastException])
    // a 1-arg call must be an arity error, not IndexOutOfBounds in the builder
    val arityErr = intercept[Exception] {
      Seq("a").toDF("token").agg(expr("freq_items(token)")).collect()
    }
    assert(arityErr.getMessage.contains("argument")
      || arityErr.getMessage.toLowerCase.contains("arity"),
      s"expected an arity error, got: ${arityErr.getMessage}")
  }
}
