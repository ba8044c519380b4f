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

  /** Per-column null-distinct encoding for the content digest: null → "0",
    * value v → "1" + v, columns joined with the unit separator (U+001F).
    * The presence prefix keeps null a value of its own — concat_ws's
    * null-DROPPING would alias (x='a', y=NULL) with (x=NULL, y='a'), so a
    * value MOVING between content columns would diff as unchanged (ADVICE
    * r13); the separator keeps ("ab","c") distinct from ("a","bc"). Both
    * rules are plain CASE/|| arithmetic an external engine replays.
    */
  private def digest(contentCols: Seq[String]) =
    md5(concat_ws("\u001f", contentCols.map(c =>
      when(col(c).isNull, lit("0"))
        .otherwise(concat(lit("1"), col(c).cast("string")))): _*))

  /** Diff `before` → `after` on `idCol`, content compared via the
    * null-distinct [[digest]] of `contentCols`.
    */
  def diff(before: DataFrame, after: DataFrame, idCol: String,
           contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "diff needs at least one content column")
    def digestOf(df: DataFrame) =
      df.select(col(idCol), digest(contentCols).as("__h"))
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
    val a = before.select(col(idCol), digest(contentCols).as("__ha"))
    val b = after.select(col(idCol) +: contentCols.map(col) :+
      digest(contentCols).as("__hb"): _*)
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol) +: lit(seq).as("seq") +:
        when(col("__hb").isNull, lit("D"))
          .when(col("__ha").isNull, lit("I"))
          .when(col("__ha") =!= col("__hb"), lit("U"))
          .otherwise(lit(null)).as("op") +: contentCols.map(col): _*)
      .where(col("op").isNotNull)
  }
}
