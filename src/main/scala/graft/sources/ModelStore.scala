package graft.sources

import graft.operators.{IvfIndex, Pq, Sq8}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Durable index-model artifacts (SURVEY §3.2: index construction is a
  * PERIODIC JOB; serving is a different process on a different day). The
  * in-session registries ([[IvfIndex.buildCached]], [[Pq.fitEncodeCached]],
  * [[Sq8.fitEncodeCached]]) die with the JVM — a real deployment fits the
  * IVF centroids / PQ codebooks / SQ8 affine stats in the nightly build
  * job, writes them NEXT TO the encoded table, and every serving JVM loads
  * them at collection-load time (C9). Models are driver-sized by
  * construction (nlist·dim, m·ksub·dsub, 2·dim doubles), so one-row-per-
  * centroid parquet is the right shape: atomic with the same overwrite
  * semantics as the table itself, engine-portable, and human-inspectable.
  *
  * Round-trips are exact: doubles survive parquet bit-for-bit, and load
  * ordering is pinned by an explicit `orderBy` of the stored indices (a
  * parquet read has NO inherent row order — the bug this layout avoids is
  * centroid ids silently permuting between build and serve).
  */
object ModelStore {

  def saveIvf(spark: SparkSession, model: IvfIndex.Model, path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex.toIndexedSeq
      .map { case (c, i) => (i, c.toIndexedSeq) }
      .toDF("cluster_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadIvf(spark: SparkSession, path: String): IvfIndex.Model = {
    val rows = spark.read.parquet(path)
      .orderBy(col("cluster_id")).collect()
    require(rows.nonEmpty, s"empty IVF model at $path")
    require(rows.map(_.getInt(0)).toSeq == rows.indices,
      s"IVF model at $path has non-contiguous cluster ids")
    val cents = rows.map(_.getSeq[Double](1).toArray)
    require(cents.forall(_.length == cents.head.length),
      s"IVF model at $path has ragged centroid lengths")
    IvfIndex.Model(cents)
  }

  def savePq(spark: SparkSession, model: Pq.Model, path: String): Unit = {
    import spark.implicits._
    (for {
      j <- model.codebooks.indices
      c <- model.codebooks(j).indices
    } yield (j, c, model.codebooks(j)(c).toIndexedSeq))
      .toDF("subspace", "code", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPq(spark: SparkSession, path: String): Pq.Model = {
    val rows = spark.read.parquet(path)
      .orderBy(col("subspace"), col("code")).collect()
    require(rows.nonEmpty, s"empty PQ model at $path")
    val bySub = rows.groupBy(_.getInt(0))
    val m = bySub.keySet.max + 1
    require(bySub.keySet == (0 until m).toSet,
      s"PQ model at $path has non-contiguous subspaces")
    val dsub = rows.head.getSeq[Double](2).length
    require(rows.forall(_.getSeq[Double](2).length == dsub),
      s"PQ model at $path has ragged centroid lengths (a truncated or " +
        "hand-edited artifact would silently mis-slice every encode)")
    Pq.Model(Array.tabulate(m) { j =>
      val sub = bySub(j).sortBy(_.getInt(1))
      require(sub.map(_.getInt(1)).toSeq == sub.indices,
        s"PQ model at $path: subspace $j has non-contiguous codes")
      sub.map(_.getSeq[Double](2).toArray)
    })
  }

  def saveSq8(spark: SparkSession, model: Sq8.Model, path: String): Unit = {
    import spark.implicits._
    model.mins.indices.map(i => (i, model.mins(i), model.scales(i)))
      .toDF("pos", "min", "scale")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadSq8(spark: SparkSession, path: String): Sq8.Model = {
    val rows = spark.read.parquet(path).orderBy(col("pos")).collect()
    require(rows.nonEmpty, s"empty SQ8 model at $path")
    require(rows.map(_.getInt(0)).toSeq == rows.indices,
      s"SQ8 model at $path has non-contiguous dimensions")
    Sq8.Model(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** The decontamination bench-set artifact ([[graft.operators.TextDedup
    * .benchShingleBloom]]): a bench release's shingle Bloom filter is
    * built once per release and probed by every subsequent corpus job —
    * the same nightly-build/serve-day split the codec models get. The
    * serialized spark-sketch bytes are a few MB at fpp 10⁻⁶ per 10⁶
    * items, so a one-row parquet is the right shape; a null filter (bench
    * had no shingles) persists as an explicit null row rather than an
    * absent file, so "built against an empty bench" and "never built" stay
    * distinguishable.
    */
  def saveBloom(spark: SparkSession, bf: Array[Byte], path: String): Unit = {
    import spark.implicits._
    Seq(Tuple1(Option(bf))).toDF("filter")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadBloom(spark: SparkSession, path: String): Array[Byte] = {
    val rows = spark.read.parquet(path).collect()
    require(rows.length == 1, s"bloom artifact at $path must be one row, " +
      s"got ${rows.length}")
    rows.head.getAs[Array[Byte]](0)
  }

  /** The trained-tokenizer artifact ([[graft.operators.BpeTrain]]): the
    * ordered merge list plus the pre-tokenization discipline it was
    * trained under, plus a format version — the one model a training
    * pipeline re-uses most, so a merge list that dies with the JVM is
    * not a model. Layout mirrors the other artifacts: `merges/` one row
    * per merge (rank, left_sym, right_sym — load ordering pinned by an
    * explicit orderBy, a parquet read has no inherent row order) and
    * `meta/` one row (format_version, pre_tok). Strings survive parquet
    * byte-for-byte, so a save → load round-trip is bit-identical
    * (spec-pinned incl. astral symbols); the version gate means a future
    * layout change fails loudly instead of mis-reading old artifacts.
    */
  def saveBpe(spark: SparkSession, model: graft.operators.BpeTrain.BpeModel,
              path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }.toDF("rank", "left_sym", "right_sym")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    Seq((BpeFormatVersion, model.preTok.tag, model.byteLevel))
      .toDF("format_version", "pre_tok", "byte_level")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  // v1: (format_version, pre_tok); v2 added byte_level. The version
  // BUMPED with the layout change (self-review r16 pass 2 #2 — the gate
  // exists precisely so a layout change cannot mis-read old artifacts),
  // and v1 artifacts stay loadable: every v1 model is code-point by
  // construction, so byte_level = false is the CORRECT read, not a guess.
  private val BpeFormatVersion = 2

  def loadBpe(spark: SparkSession,
              path: String): graft.operators.BpeTrain.BpeModel = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1,
      s"bpe model at $path: meta must be exactly 1 row, got ${meta.length}")
    val ver = meta.head.getInt(0)
    require(ver == 1 || ver == BpeFormatVersion,
      s"bpe model at $path has format_version $ver; this " +
        s"engine reads versions 1-$BpeFormatVersion — refit or migrate the artifact")
    val rows = spark.read.parquet(s"$path/merges")
      .orderBy(col("rank")).collect()
    require(rows.map(_.getInt(0)).toSeq == rows.indices,
      s"bpe model at $path has non-contiguous merge ranks (a truncated " +
        "artifact would silently skip merges)")
    graft.operators.BpeTrain.BpeModel(
      graft.operators.PreTokenizer.fromTag(meta.head.getString(1)),
      rows.map(r => (r.getString(1), r.getString(2))).toIndexedSeq,
      ver >= 2 && meta.head.getBoolean(meta.head.fieldIndex("byte_level")))
  }

  /** The WordPiece serving artifact ([[graft.operators.WordPiece]]): the
    * ordered piece vocabulary plus the unk token — the ONE file a
    * BERT-style tokenizer serves from (order is identity/provenance; the
    * greedy longest-match itself is order-free). Pieces keep their `##`
    * continuation forms verbatim.
    */
  def saveWordPiece(spark: SparkSession, pieces: Seq[String], unk: String,
                    path: String): Unit = {
    import spark.implicits._
    pieces.zipWithIndex.map { case (p, i) => (i, p) }.toDF("rank", "piece")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pieces")
    Seq((WordPieceFormatVersion, unk)).toDF("format_version", "unk")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  private val WordPieceFormatVersion = 1

  /** Load a [[saveWordPiece]] artifact: (pieces in rank order, unk). */
  def loadWordPiece(spark: SparkSession, path: String): (Seq[String], String) = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1,
      s"wordpiece model at $path: meta must be exactly 1 row, got ${meta.length}")
    require(meta.head.getInt(0) == WordPieceFormatVersion,
      s"wordpiece model at $path has format_version ${meta.head.getInt(0)}; " +
        s"this engine reads version $WordPieceFormatVersion — refit or migrate")
    val rows = spark.read.parquet(s"$path/pieces").orderBy(col("rank")).collect()
    require(rows.map(_.getInt(0)).toSeq == rows.indices,
      s"wordpiece model at $path has non-contiguous piece ranks (a truncated " +
        "artifact would silently shrink the vocabulary)")
    (rows.map(_.getString(1)).toIndexedSeq, meta.head.getString(1))
  }

  /** The learned quality-filter artifact ([[graft.operators
    * .QualityClassifier]]): dim doubles + a bias, fit in the periodic
    * labeling job and folded into every scoring scan as one array literal.
    * One row (bias, weights) — doubles survive parquet bit-for-bit, and
    * the array column keeps bucket order by construction (no row-order
    * dependence to pin).
    */
  def saveQuality(spark: SparkSession,
                  model: graft.operators.QualityClassifier.Model,
                  path: String): Unit = {
    import spark.implicits._
    Seq((model.bias, model.weights.toIndexedSeq)).toDF("bias", "weights")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadQuality(spark: SparkSession,
                  path: String): graft.operators.QualityClassifier.Model = {
    val rows = spark.read.parquet(path).collect()
    require(rows.length == 1,
      s"quality model at $path must be one row, got ${rows.length}")
    graft.operators.QualityClassifier.Model(
      rows.head.getDouble(0), rows.head.getSeq[Double](1).toArray)
  }
}
