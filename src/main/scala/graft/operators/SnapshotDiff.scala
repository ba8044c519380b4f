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
}
