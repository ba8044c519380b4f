package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the audit step between two lake versions ("what
  * did last night's recipe change?"): one row per id whose membership or
  * content differs, `status ∈ {added, removed, changed}` (unchanged rows
  * are NOT emitted — at lake scale the diff is the small output, the
  * corpus is the big input).
  *
  * Scale shape: each side is projected to (id, md5(content columns))
  * AT THE SCAN — the single full-outer shuffle carries a 32-char digest
  * per row, never document bodies, and co-partitioned/bucketed snapshots
  * join without a shuffle at all. Content equality is digest equality
  * (md5 collision odds are negligible and the digest is engine-portable,
  * so the oracle can replay the same decision).
  */
object SnapshotDiff {

  /** Diff `before` → `after` on `idCol`, content = `contentCols` joined
    * with the unit separator (U+001F) (unambiguous for text not containing
    * it — a plain concat would alias ("ab","c") with ("a","bc")). Null
    * content columns hash as absent via concat_ws's null-dropping, which is
    * deterministic on both engines.
    */
  def diff(before: DataFrame, after: DataFrame, idCol: String,
           contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "diff needs at least one content column")
    def digestOf(df: DataFrame) =
      df.select(col(idCol),
        md5(concat_ws("\u001f", contentCols.map(col): _*)).as("__h"))
    val a = digestOf(before).withColumnRenamed("__h", "__ha")
    val b = digestOf(after).withColumnRenamed("__h", "__hb")
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__hb").isNull, lit("removed"))
          .when(col("__ha").isNull, lit("added"))
          .when(col("__ha") =!= col("__hb"), lit("changed"))
          .otherwise(lit(null)).as("status"))
      .where(col("status").isNotNull)
  }

  /** [[diff]] with payloads: a [[CdcMerge]]-consumable changelog
    * `(idCol, seq, op, contentCols…)` — op `I`/`U`/`D` for added / changed /
    * removed, payload taken from `after` (null on deletes), every row
    * stamped `seq`. `CdcMerge.apply(before, changelog(before, after))`
    * rebuilds `after` exactly (CdcMergeSpec) — which makes a diff shippable:
    * compute it where the snapshots live, replay it where they don't.
    *
    * Same scale shape as [[diff]]: digests at the scan decide membership,
    * but here the after-side payload rides the full-outer shuffle too
    * (the changelog must carry it); at lake scale emit against a pruned
    * column subset, not the full document row.
    */
  def changelog(before: DataFrame, after: DataFrame, idCol: String,
                contentCols: Seq[String], seq: Long = 0L): DataFrame = {
    require(contentCols.nonEmpty, "changelog needs at least one content column")
    val a = before.select(col(idCol),
      md5(concat_ws("\u001f", contentCols.map(col): _*)).as("__ha"))
    val b = after.select(col(idCol) +: contentCols.map(col) :+
      md5(concat_ws("\u001f", contentCols.map(col): _*)).as("__hb"): _*)
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol) +: lit(seq).as("seq") +:
        when(col("__hb").isNull, lit("D"))
          .when(col("__ha").isNull, lit("I"))
          .when(col("__ha") =!= col("__hb"), lit("U"))
          .otherwise(lit(null)).as("op") +: contentCols.map(col): _*)
      .where(col("op").isNotNull)
  }
}
