package graft

import graft.operators.QualityClassifier
import graft.sources.ModelStore
import org.apache.spark.sql.functions._

/** Learned quality filter: train/serve hash identity, scoring parity with a
  * driver-side reference fold, artifact round-trip, and an end-to-end fit →
  * gate separation on a planted clean-vs-junk fixture.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) = graft.sources.TempDirs.register(
    s"/tmp/graft_quality_${ProcessHandle.current().pid()}_$tag")

  // deterministic weights mirroring the t11 gate row's SQL-replayable model
  private def detModel(dim: Int): QualityClassifier.Model =
    QualityClassifier.Model(-0.05,
      Array.tabulate(dim)(b => ((b.toLong * 2654435761L) % 1000003L).toDouble / 1000003.0 - 0.5))

  test("bucketJvm == bucketCol: the fit path hashes exactly like the scoring SQL") {
    val toks = Seq("the", "quick", "brown", "fox", "café", "日本語", "x", "")
    val dim = 512
    val sqlSide = toks.toDF("t")
      .select(QualityClassifier.bucketCol($"t", dim).as("b"))
      .collect().map(_.getLong(0).toInt)
    val jvmSide = toks.map(QualityClassifier.bucketJvm(_, dim))
    assert(sqlSide.toSeq == jvmSide)
  }

  test("logitCol matches a driver-side sequential fold; empty text scores bias + w[bucket(\"\")]") {
    val m = detModel(256)
    val docs = Seq("alpha beta gamma delta", "alpha alpha alpha", "", "solo")
    val got = docs.toDF("text")
      .select(QualityClassifier.logitCol($"text", m).as("l"))
      .collect().map(_.getDouble(0))
    val want = docs.map { text =>
      val toks = text.split(" ", -1) // Spark split keeps the empty token of ""
      var s = 0.0
      toks.foreach(t => s += m.weights(QualityClassifier.bucketJvm(t, m.dim)))
      m.bias + s / math.max(toks.length, 1).toDouble
    }
    assert(got.toSeq == want, "exact double parity, same fold order")
    // null text → null logit (no crash, no default score)
    val nul = Seq[Option[String]](None).toDF("text")
      .select(QualityClassifier.logitCol($"text", m).as("l")).head()
    assert(nul.isNullAt(0))
  }

  test("fit drops null-text/null-label rows instead of crashing the job") {
    val df = Seq(
      (Option("clean words about science and history"), Option(1.0)),
      (Option("spam spam spam buy now click"), Option(0.0)),
      (Option.empty[String], Option(1.0)),
      (Option("unlabeled row"), Option.empty[Double]))
      .toDF("text", "label")
    val m = QualityClassifier.fit(df, "text", "label", dim = 64)
    assert(m.dim == 64) // the fit completed on the 2 usable rows
  }

  test("fit separates planted junk from clean docs and the artifact round-trips") {
    // clean: varied vocabulary; junk: the spam phrases a learned gate should
    // catch that heuristics keyed on length/punctuation would pass
    val clean = (0 until 60).map(i =>
      (s"document $i discusses the history of science and careful methods " +
        s"with measured language and topic ${i % 7}", 1.0))
    val junk = (0 until 60).map(i =>
      (s"buy cheap pills now click here winner casino bonus free offer " +
        s"deal ${i % 5} click here buy now", 0.0))
    val df = (clean ++ junk).toDF("text", "label")
    val m = QualityClassifier.fit(df, "text", "label", dim = 1024)

    val scored = df.select($"label",
      QualityClassifier.logitCol($"text", m).as("l")).collect()
    val cleanMin = scored.filter(_.getDouble(0) == 1.0).map(_.getDouble(1)).min
    val junkMax = scored.filter(_.getDouble(0) == 0.0).map(_.getDouble(1)).max
    assert(cleanMin > junkMax,
      s"fitted gate must separate the fixture (clean min $cleanMin vs junk max $junkMax)")
    assert(df.where(QualityClassifier.keepCol($"text", m)).count() == 60)

    val path = tmp("model")
    ModelStore.saveQuality(spark, m, path)
    val loaded = ModelStore.loadQuality(spark, path)
    assert(loaded.bias == m.bias)
    assert(loaded.weights.toSeq == m.weights.toSeq, "weights bit-exact through parquet")
    val a = df.select(QualityClassifier.logitCol($"text", m)).collect().map(_.getDouble(0))
    val b = df.select(QualityClassifier.logitCol($"text", loaded)).collect().map(_.getDouble(0))
    assert(a.toSeq == b.toSeq, "loaded model scores identically")
  }

  test("scoring a real table is row-local: survives any partitioning unchanged") {
    val m = detModel(128)
    val docs = Tables.documents(spark, Sf0001)
    val one = docs.coalesce(1)
      .select($"doc_id", QualityClassifier.logitCol($"text", m).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val many = docs.repartition(7, $"doc_id")
      .select($"doc_id", QualityClassifier.logitCol($"text", m).as("l"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one == many, "logit is a pure row function — partitioning-invariant")
    assert(one.nonEmpty)
  }
}
