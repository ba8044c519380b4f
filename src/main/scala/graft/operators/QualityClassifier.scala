package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the learned step of a pre-training data
  * pipeline (CCNet/fastText-style linear classifier over hashed
  * bag-of-tokens; Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification"). The heuristic signals (t2's length/punctuation/
  * stopword bands, t5's Gopher repetition filters) are complemented here by
  * a model TRAINED on labeled keep/drop examples, which is how production
  * corpora actually gate quality at scale.
  *
  * Spark-first split of the work:
  *   - FIT is a small periodic job (like the IVF/PQ/SQ8 codec fits): hashed
  *     tf features per labeled doc → MLlib [[org.apache.spark.ml
  *     .classification.LogisticRegression]]. The model is driver-sized by
  *     construction (dim doubles + a bias), so it persists through
  *     [[graft.sources.ModelStore]] like every other nightly artifact.
  *   - SCORE is a ROW-LOCAL codegen'd expression: the weight vector folds
  *     into the plan as ONE array literal and each row pays a sequential
  *     HOF fold over its own tokens — no join against a weight table, no
  *     shuffle, no per-row model lookup. At 100 TB the scoring pass is a
  *     scan-local filter exactly like the heuristic gates it composes with.
  *
  * The feature hash is the repo's engine-portable draw (first 8 hex chars
  * of md5, mod dim) rather than murmur3, so a scored row can be REPLAYED by
  * any engine from the persisted weights — the t11 gate row proves it
  * value-for-value against DuckDB.
  *
  * The logit is `bias + (Σ_tokens w[bucket(token)]) / n_tokens` — mean
  * token weight, so the score is length-invariant (a doc repeated twice
  * scores the same) and the fold is the same sequential double sum the
  * oracle's ordered `list_sum` performs.
  */
object QualityClassifier {

  /** dim buckets; weights.length == dim. */
  final case class Model(bias: Double, weights: Array[Double]) {
    def dim: Int = weights.length
    require(weights.nonEmpty, "quality model needs at least one bucket")
  }

  /** Portable feature bucket, SQL side: conv(md5[0,8), 16) % dim.
    * 8 hex chars < 2^32 so the long is nonnegative; `% dim` stays in
    * [0, dim). Identical text → identical bucket in any engine with md5.
    */
  def bucketCol(tok: Column, dim: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % dim

  /** The same bucket computed on the driver/executor JVM — used by the fit
    * path so TRAIN and SERVE hash identically (a classifier fit on one
    * hash and served on another is silently random).
    */
  def bucketJvm(tok: String, dim: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(tok.getBytes(StandardCharsets.UTF_8))
    // first 8 hex chars == first 4 bytes, big-endian, as an unsigned int
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % dim).toInt
  }

  /** Row-local quality logit for `text` under `model`. Null text scores
    * null. An EMPTY string scores `bias + w[bucket("")]`: Spark's
    * `split("", " ")` yields `[""]` (one empty token, size 1 — so the
    * denominator is always ≥ 1 and needs no guard), and the oracle's
    * `string_split` agrees, which is exactly why the gate row hashes —
    * calibrate the empty-doc decision with the empty-token bucket's
    * weight, not the bias alone.
    */
  def logitCol(text: Column, model: Model): Column = {
    val w = typedLit(model.weights.toIndexedSeq)
    val toks = split(text, " ")
    val contrib = transform(toks,
      t => element_at(w, (bucketCol(t, model.dim) + 1L).cast("int")))
    val s = aggregate(contrib, lit(0.0d), (acc, x) => acc + x)
    lit(model.bias) + s / size(toks).cast("double")
  }

  /** Keep-gate: logit >= threshold (fastText's decision rule with an
    * adjustable operating point).
    */
  def keepCol(text: Column, model: Model, threshold: Double = 0.0): Column =
    logitCol(text, model) >= threshold

  /** Fit on labeled rows (`labelCol` ∈ {0.0 = drop, 1.0 = keep}).
    *
    * Features are hashed MEAN-token indicators (count/n per bucket), so the
    * fitted `coefficients · x + intercept` is literally [[logitCol]]'s
    * arithmetic — no train/serve skew. The per-row feature build is a typed
    * map (the one genuinely imperative step: bucket counting into a sparse
    * vector); everything after is stock MLlib, which treeAggregates — the
    * fit never collects the corpus to the driver.
    */
  def fit(df: DataFrame, textCol: String, labelCol: String, dim: Int,
          maxIter: Int = 100, regParam: Double = 1e-4): Model = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    val spark = df.sparkSession
    import spark.implicits._
    val data = df
      // null text would NPE inside the typed map; the serve path scores it
      // null (ungated), so the consistent fit-side treatment is to drop it
      // from the training set rather than crash the job
      .where(col(textCol).isNotNull && col(labelCol).isNotNull)
      .select(col(labelCol).cast("double"), split(col(textCol), " "))
      .as[(Double, Seq[String])]
      .map { case (y, toks) =>
        val counts = new java.util.TreeMap[Integer, java.lang.Double]()
        toks.foreach { t =>
          val b = bucketJvm(t, dim)
          counts.merge(b, 1.0, (a, x) => a + x)
        }
        val n = math.max(toks.size, 1).toDouble
        val idx = new Array[Int](counts.size)
        val vs = new Array[Double](counts.size)
        var i = 0
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next(); idx(i) = e.getKey; vs(i) = e.getValue / n; i += 1
        }
        (y, Vectors.sparse(dim, idx, vs))
      }
      .toDF("label", "features")
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setFitIntercept(true)
    val m = lr.fit(data)
    Model(m.intercept, m.coefficients.toArray)
  }
}
