package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate detection suite for the training-data pipeline (SURVEY
  * §2.E): MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup join.
  *
  * All hashing is md5→60-bit (TextFunctions.hash60) so the DuckDB oracle
  * reproduces every sketch bit-for-bit. All joins are equi-joins on
  * hash/bucket keys (shuffle-hash-joinable at 100 TB; never a cartesian
  * product except the intentionally label-blocked cosine pair join).
  */
object TextDedup {

  /** MinHash signatures: k independent hash families over `shingleK`-word
    * shingles, one (doc, j, minh) row per family. Single shuffle
    * (explode → groupBy doc → k min-aggregates → unpivot).
    */
  def minhashSignatures(
      df: DataFrame, textCol: String, idCol: String,
      k: Int, shingleK: Int): DataFrame = {
    val sh = df.select(col(idCol),
      explode(shingles(tokens(col(textCol)), shingleK)).as("s"))
    val aggs = (0 until k).map(j => min(hash60Seeded(col("s"), j)).as(s"m$j"))
    val wide = sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = (0 until k).map(j => s"$j, m$j").mkString(", ")
    wide.selectExpr(idCol, s"stack($k, $stackArgs) AS (j, minh)")
      .select(col(idCol), col("j").cast("int").as("j"), col("minh"))
  }

  /** Wide (one row per doc) signature matrix m0..m{k-1}. */
  def minhashWide(
      df: DataFrame, textCol: String, idCol: String,
      k: Int, shingleK: Int): DataFrame = {
    val sh = df.select(col(idCol),
      explode(shingles(tokens(col(textCol)), shingleK)).as("s"))
    val aggs = (0 until k).map(j => min(hash60Seeded(col("s"), j)).as(s"m$j"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: docs whose signatures agree on ALL rows of some band are
    * candidate near-dups. `bands` bands of `k/bands` rows; the pair join is
    * an equi-join on (band, band-signature) — the scale path that replaces
    * the O(n²) pair scan.
    */
  def minhashBandPairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int, shingleK: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rowsPer = k / bands
    val wide = minhashWide(df, textCol, idCol, k, shingleK)
    val bandDfs = (0 until bands).map { b =>
      val cols = (b * rowsPer until (b + 1) * rowsPer).map(j => col(s"m$j"))
      wide.select(col(idCol), lit(b).as("band"),
        md5(concat_ws(",", cols: _*)).as("bsig"))
    }
    val all = bandDfs.reduce(_ unionAll _)
    all.as("a").join(all.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .distinct()
  }

  /** 60-bit SimHash over whitespace tokens (md5-hash bit voting).
    * explode → per-(doc,bit) vote sum → fingerprint assembly; narrow rows,
    * two partial-aggregated shuffles.
    */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("t"))
    val h = tok.select(col(idCol), hash60(col("t")).as("hv"))
    val bits = h.selectExpr(idCol,
      "posexplode(transform(sequence(0, 59), b -> CASE WHEN (shiftright(hv, b) & 1) = 1 THEN 1 ELSE -1 END)) AS (pos, sgn)")
    bits.groupBy(col(idCol), col("pos")).agg(sum(col("sgn")).as("c"))
      .groupBy(col(idCol))
      .agg(expr("CAST(sum(CASE WHEN c > 0 THEN shiftleft(CAST(1 AS BIGINT), pos) ELSE CAST(0 AS BIGINT) END) AS BIGINT)").as("simhash"))
  }

  /** Exact n-gram (token-set) Jaccard similarity join above `tau`,
    * blocked by `blockCol` (cross-block near-dups are sacrificed for a
    * bounded candidate set — the standard trade at corpus scale). The join
    * is an inverted-index equi-join on token, never a cartesian.
    */
  def jaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      blockCol: String, tau: Double): DataFrame = {
    val tok = df.select(col(idCol), col(blockCol),
      explode(array_distinct(tokens(col(textCol)))).as("t"))
    val sz = tok.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.t") === col("b.t") &&
          col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sz.select(col(idCol).as("d1"), col("n").as("n1")), "d1")
      .join(sz.select(col(idCol).as("d2"), col("n").as("n2")), "d2")
      .withColumn("jac", col("i") * lit(1.0) / (col("n1") + col("n2") - col("i")))
      .where(col("jac") >= tau)
      .select(col("d1"), col("d2"), round(col("jac"), 6).as("jaccard"))
  }

  /** Embedding cosine near-dup pairs above `tau`, blocked by `blockCol`.
    * Brute-force within block (the correctness anchor); the LSH/IVF path
    * in [[IvfIndex]] is the approximate scale alternative.
    */
  def cosinePairs(
      df: DataFrame, vecCol: String, idCol: String,
      blockCol: String, tau: Double): DataFrame = {
    val n = df.select(col(idCol), col(blockCol), col(vecCol),
      l2Norm(col(vecCol)).as("nn"))
    n.as("a").join(n.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("v1"), col(s"b.$idCol").as("v2"),
        (dot(col(s"a.$vecCol"), col(s"b.$vecCol")) /
          (col("a.nn") * col("b.nn"))).as("c"))
      .where(col("c") > tau)
      .select(col("v1"), col("v2"), round(col("c"), 6).as("cos"))
  }

  /** Min-k document fingerprint: the `kMin` smallest shingle hashes —
    * a winnowing-style sketch with cross-engine-exact values.
    */
  def fingerprintMinK(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int, kMin: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = df.select(col(idCol),
      explode(shingles(tokens(col(textCol)), shingleK)).as("s"))
      .select(col(idCol), hash60(col("s")).as("hv"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("hv"))
    val ranked = sh.withColumn("rn", row_number().over(w)).where(col("rn") <= kMin)
    val aggs = (1 to kMin).map(r => max(when(col("rn") === r, col("hv"))).as(s"f$r"))
    ranked.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }
}
