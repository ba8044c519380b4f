package graft

import graft.operators.TextDedup
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** VERDICT r5 #4: prove the Jaccard skew machinery on realistically skewed
  * data, not only in adversarial unit fixtures. The Zipf corpus (see
  * [[Queries]] `zipfCorpus`) has token DFs spanning 2 → 4N/5; the gate's
  * e4c row runs the prefix variant with live caps. Here we assert the part
  * a hash match can't show: the caps actually FIRED (observe metrics) while
  * the result stayed identical to both uncapped variants.
  */
class ZipfSkewSpec extends SparkSpec {
  private val Sf001 = "/root/testdata/sf0.01"

  /** Collect observed metrics for queries run inside `body`. */
  private def withObservedMetrics[A](body: => A): (A, Map[String, Map[String, Any]]) = {
    val seen = new scala.collection.concurrent.TrieMap[String, Map[String, Any]]()
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          seen.put(name, row.schema.fieldNames.zip(row.toSeq).toMap)
        }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = body
      // listener events are delivered async; poll for arrival
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      (out, seen.toMap)
    } finally spark.listenerManager.unregister(listener)
  }

  test("capped prefix join on the Zipf corpus: caps fire AND the result is unchanged") {
    val q = SparkEntry.queries("e4c_jaccard_zipf")
    val (capped, metrics) = withObservedMetrics {
      q(spark, Sf001).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    }
    // 1. the DF cap fired: cA/cB prefix postings (df = N/5 = 100 > 64)
    //    were dropped — 2 tokens × 100 B docs
    val m = metrics.getOrElse("graft.jaccard.prefix.tokendf",
      fail(s"no prefix tokendf metric observed; saw: ${metrics.keySet}"))
    assert(m("dropped_postings").asInstanceOf[Long] == 200L, m.toString)
    assert(m("max_token_df").asInstanceOf[Long] == 100L, m.toString)

    // 2. identical to the UNCAPPED prefix variant and the UNCAPPED exact
    //    variant on the same corpus — the caps lost nothing
    def run(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val corpus = {
      // same derivation as the gate query
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val k = expr("doc_id div 2")
      val mm = expr("doc_id div 100")
      val gpart = concat_ws(" ",
        ('a' to 'j').map(ch => concat(lit("g"), k, lit(s"_$ch"))): _*)
      Tables.documents(spark, Sf001).select($"doc_id",
        when($"doc_id" % 5 === 4,
          concat(lit("bg"), mm, lit("_x cA cB f1 f2 f3 f4 f5 f6 f7 f8 f9")))
          .otherwise(concat(gpart, lit(" zthe"))).as("text"),
        lit("all").as("blk"))
    }
    val uncappedPrefix = run(TextDedup.jaccardPairsPrefix(
      corpus, "text", "doc_id", "blk", 0.9))
    val uncappedExact = run(TextDedup.jaccardPairs(
      corpus, "text", "doc_id", "blk", 0.9))
    assert(capped == uncappedPrefix,
      s"capped ${capped.size} vs uncapped prefix ${uncappedPrefix.size}")
    assert(capped == uncappedExact,
      s"capped ${capped.size} vs uncapped exact ${uncappedExact.size}")
    // expected shape: 150 class-A pairs + 5 blocks × C(20,2) B pairs
    assert(capped.size == 150 + 5 * 190, capped.size.toString)
    assert(capped.forall(_._3 == 1.0))
  }

  test("salting fired too: bg postings (df 20 > smallCap 8) spread across cells, result exact") {
    // direct variant-level check at a cap that salts bg but drops nothing
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = expr("doc_id div 2")
    val mm = expr("doc_id div 100")
    val gpart = concat_ws(" ",
      ('a' to 'j').map(ch => concat(lit("g"), k, lit(s"_$ch"))): _*)
    val corpus = Tables.documents(spark, Sf001).select($"doc_id",
      when($"doc_id" % 5 === 4,
        concat(lit("bg"), mm, lit("_x cA cB f1 f2 f3 f4 f5 f6 f7 f8 f9")))
        .otherwise(concat(gpart, lit(" zthe"))).as("text"),
      lit("all").as("blk"))
    val salted = TextDedup.jaccardPairsPrefix(
        corpus, "text", "doc_id", "blk", 0.9, maxTokenDf = 1L << 16, smallCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = TextDedup.jaccardPairsPrefix(
        corpus, "text", "doc_id", "blk", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain, s"salting changed the result: ${salted.size} vs ${plain.size}")
  }
}
