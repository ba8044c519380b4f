package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDC changelog apply — MERGE INTO for a plain-parquet lake: fold an
  * ordered stream of row-level changes (insert / update / delete, each
  * stamped with a sequence number) into a snapshot, producing the next
  * snapshot. The inverse of [[SnapshotDiff]]: `diff` tells you what changed
  * between two lake versions; `CdcMerge.apply` REPLAYS a changelog onto the
  * older version to rebuild the newer one (CdcMergeSpec pins the roundtrip).
  *
  * Semantics: per key, the changelog row with the HIGHEST sequence wins
  * (last-writer-wins). A winning delete drops the key; any other winning op
  * upserts its payload (insert vs update need no distinction at apply time —
  * both mean "the row now looks like this"). Keys the changelog never
  * touches pass through from the snapshot untouched.
  *
  * Scale shape — the asymmetry is the whole design: a daily changelog is
  * orders of magnitude smaller than a 100 TB snapshot, so the snapshot must
  * NEVER shuffle. The changelog reduces to one row per key with a map-side-
  * combinable `max_by` (the only shuffle, changelog-sized), then the
  * touched-key set broadcasts as a LEFT ANTI hash join against the snapshot
  * scan — a full-outer join would be the natural phrasing but cannot
  * broadcast in Spark, so the merge is anti-join + union instead. With
  * `broadcastDelta = false` (a delta too big for one executor's memory) the
  * same plan runs as a sort-merge anti join; on a snapshot and delta
  * bucketed on the key, that form shuffles neither side.
  */
object CdcMerge {

  /** Last-writer-wins reduce: one row per key carrying the winning op and
    * payload. Equal sequence numbers (a malformed feed) break ties
    * deterministically by the (op, payload) struct order, so the reduce is
    * stable under partitioning rather than arbitrary.
    */
  def latest(changelog: DataFrame, keyCol: String, seqCol: String,
             opCol: String, payloadCols: Seq[String]): DataFrame = {
    val carried = opCol +: payloadCols
    changelog
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(carried.map(col): _*),
        struct((seqCol +: carried).map(col): _*)).as("__last"))
      .select(col(keyCol) +: carried.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** Apply `changelog` to `snapshot`; returns the next snapshot with columns
    * `keyCol +: payloadCols`. Rows whose winning op equals `deleteOp` are
    * dropped; all other winning ops upsert their payload.
    */
  def apply(snapshot: DataFrame, changelog: DataFrame, keyCol: String,
            seqCol: String, opCol: String, payloadCols: Seq[String],
            deleteOp: String = "D", broadcastDelta: Boolean = true): DataFrame = {
    require(payloadCols.nonEmpty, "merge needs at least one payload column")
    require(!payloadCols.contains(keyCol), s"payloadCols must not repeat key $keyCol")
    val lat = latest(changelog, keyCol, seqCol, opCol, payloadCols)
    // hint only the join input: the upsert branch feeds a union, where a
    // broadcast hint is meaningless noise
    val touched0 = lat.select(col(keyCol))
    val touched = if (broadcastDelta) broadcast(touched0) else touched0
    val upserts = lat.where(col(opCol) =!= deleteOp)
      .select(col(keyCol) +: payloadCols.map(col): _*)
    snapshot.select(col(keyCol) +: payloadCols.map(col): _*)
      .join(touched, Seq(keyCol), "left_anti")
      .unionByName(upserts)
  }

  private def hasParquet(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext) {
        val f = it.next()
        found = f.isFile && f.getPath.getName.endsWith(".parquet")
      }
      found
    }
  }

  /** Merge-on-read: the live view of a base snapshot plus an append-only
    * changelog lake — the Hudi/Iceberg MOR idea on plain parquet. Writers
    * (a stream's exactly-once parquet sink, a daily batch append) only
    * ever APPEND to `logDir`; readers fold the whole log into the base at
    * query time with [[apply]]. No row-level rewrites anywhere, so there
    * is nothing to coordinate: the log is the single source of change
    * truth and seq ordering resolves races. An empty or absent log reads
    * as the base unchanged.
    *
    * Read cost grows with the log, which is the MOR trade — [[compact]]
    * is the periodic rewrite that resets it.
    */
  def readMerged(spark: SparkSession, baseDir: String, logDir: String,
                 keyCol: String, seqCol: String, opCol: String,
                 payloadCols: Seq[String], deleteOp: String = "D",
                 broadcastDelta: Boolean = true,
                 asOfSeq: Option[Long] = None): DataFrame = {
    val base = spark.read.parquet(baseDir)
    if (!hasParquet(spark, logDir))
      base.select(col(keyCol) +: payloadCols.map(col): _*)
    else {
      // time travel: the lake "as of" a sequence number is the base plus
      // the log PREFIX — drop later changes before the merge. The filter
      // sits on the changelog scan (the small side); the snapshot plan is
      // unchanged. asOfSeq below every logged seq reads as the bare base.
      val log = asOfSeq.foldLeft(spark.read.parquet(logDir))(
        (l, v) => l.where(col(seqCol) <= v))
      apply(base, log, keyCol, seqCol, opCol,
        payloadCols, deleteOp, broadcastDelta)
    }
  }

  /** Merge-on-write compaction: fold the accumulated log into a NEW base
    * version at `outDir` (never in place — readers of the old version are
    * unaffected, the version flip is the caller's pointer swap). After the
    * flip the old log is dead; a fresh log dir starts empty.
    */
  def compact(spark: SparkSession, baseDir: String, logDir: String,
              outDir: String, keyCol: String, seqCol: String, opCol: String,
              payloadCols: Seq[String], deleteOp: String = "D"): Unit =
    readMerged(spark, baseDir, logDir, keyCol, seqCol, opCol, payloadCols,
        deleteOp)
      .write.mode("overwrite").parquet(outDir)
}
