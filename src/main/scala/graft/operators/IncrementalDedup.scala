package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental near-dup detection: dedup a NEW batch against an existing
  * corpus WITHOUT re-sketching (or re-pairing) the corpus.
  *
  * The 100 TB operating model: the corpus's LSH band signatures are a
  * persisted artifact — the "signature lake", (id, band, bsig), ~tens of
  * bytes per document regardless of document size, written once per batch
  * by [[bandSignatures]] and appended forever. A daily delta then:
  *
  *   1. sketches ONLY its own documents (delta-sized compute),
  *   2. probes the signature lake with an equi-join on (band, bsig),
  *   3. emits exactly the candidate pairs that involve a delta document.
  *
  * Cost is delta-sized, not corpus-sized: the corpus contributes a join
  * side that never re-shuffles when the lake is stored bucketed by
  * (band, bsig) — `LakeLayout`-style `bucketBy` gives the join its
  * clustering for free, so the only full shuffle is the delta's own
  * sketch. Without bucketing it is still ONE corpus shuffle instead of a
  * corpus re-sketch + re-pair (the shingle/minhash pipeline is the
  * dominant cost — text never moves at all here, only 3-column
  * signature rows).
  *
  * Equivalence contract (the gate row's oracle pins it): the emitted set
  * equals a FULL batch recompute's candidate pairs restricted to pairs
  * with at least one delta member — incremental processing loses nothing
  * vs the batch gold standard. (Reference analog: the hasher/loader
  * pipeline appends new videos' hashes to Milvus and searches them
  * against the existing collection — `loader.js:389-405` — rather than
  * rebuilding the corpus.)
  *
  * Skew control mirrors [[TextDedup.bucketPairs]]'s discipline: a
  * boilerplate band signature shared by millions of corpus documents
  * would fan every matching delta doc out by the bucket size, so buckets
  * over `maxBucket` members are dropped and accounted via an `observe`
  * metric (`dropped_members`/`max_bucket` on `metricName`) — at web
  * scale such a bucket is boilerplate and its pairs are noise.
  */
object IncrementalDedup {

  /** The signature-lake rows for a batch: (idCol, band, bsig) — band
    * signatures of [[TextDedup.minhashWide]]'s k-family sketch, md5 over
    * each band's `k/bands` minhash rows. Values are identical to the
    * banding [[TextDedup.minhashBandPairs]] buckets on, so a lake written
    * by this function is probe-compatible with the batch dedup's pairs.
    */
  def bandSignatures(
      df: DataFrame, textCol: String, idCol: String,
      k: Int, shingleK: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rowsPer = k / bands
    val wide = TextDedup.minhashWide(df, textCol, idCol, k, shingleK)
    val bandStructs = array((0 until bands).map { b =>
      val cols = (b * rowsPer until (b + 1) * rowsPer).map(j => col(s"m$j"))
      struct(lit(b).as("band"), md5(concat_ws(",", cols: _*)).as("bsig"))
    }: _*)
    wide.select(col(idCol), explode(bandStructs).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.bsig").as("bsig"))
  }

  /** Candidate pairs involving the delta: every (d1 < d2) pair sharing a
    * band signature where at least one side is a delta document. Both
    * inputs are (idCol, band, bsig) — `corpusSigs` read from the lake,
    * `deltaSigs` from [[bandSignatures]] over the new batch. Delta-delta
    * pairs are included (both directions of the join collapse under the
    * least/greatest normalization + distinct), so appending the delta's
    * signatures to the lake afterwards completes the induction: pairs
    * within all data so far = union of every batch's deltaPairs.
    *
    * Shape: the delta rows ride INSIDE the unioned, bucket-sized frame
    * (flagged `__dl`), and the probe side filters that same frame — both
    * join inputs share the window exchange, so the delta's sketch is
    * computed ONCE (a separate deltaSigs probe would re-evaluate the
    * shingle+minhash pipeline, the dominant cost, a second time). Within
    * a kept bucket the [[TextDedup.bucketPairs]] salting discipline
    * applies: each member owns one of `⌈size/smallCap⌉` salt cells, the
    * probe replicates to every cell, and each pair meets in exactly one —
    * so a near-boilerplate bucket's fan-out spreads over cells instead of
    * landing on the single task that owns its join key.
    */
  def deltaPairs(
      corpusSigs: DataFrame,
      deltaSigs: DataFrame,
      idCol: String,
      maxBucket: Long = 1L << 16,
      smallCap: Int = 1024,
      metricName: String = "graft.lsh.incremental"): DataFrame = {
    require(smallCap >= 2, "smallCap must be >= 2")
    val all = corpusSigs.select(col(idCol), col("band"), col("bsig"))
      .withColumn("__dl", lit(false))
      .unionByName(deltaSigs.select(col(idCol), col("band"), col("bsig"))
        .withColumn("__dl", lit(true)))
    // size every (band, bsig) bucket; oversized buckets are boilerplate —
    // drop + account, never fan out
    val base = all
      .withColumn("__bsz",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bsig"))))
      .observe(metricName,
        max(col("__bsz")).as("max_bucket"),
        sum(when(col("__bsz") > maxBucket, 1L).otherwise(0L)).as("dropped_members"))
      .where(col("__bsz") <= maxBucket)
      .withColumn("__ns",
        greatest(lit(1), ceil(col("__bsz") / lit(smallCap.toDouble))).cast("int"))
      .withColumn("__g", pmod(xxhash64(col(idCol)), col("__ns")).cast("int"))
    val probe = base.where(col("__dl"))
      .select(col(idCol).as("__pid"), col("band").as("__pband"),
        col("bsig").as("__pbsig"),
        explode(sequence(lit(0), col("__ns") - 1)).as("__pg"))
    base.join(probe,
        col("band") === col("__pband") && col("bsig") === col("__pbsig") &&
          col("__g") === col("__pg") && col(idCol) =!= col("__pid"))
      .select(
        least(col(idCol), col("__pid")).as("d1"),
        greatest(col(idCol), col("__pid")).as("d2"))
      .distinct()
  }
}
