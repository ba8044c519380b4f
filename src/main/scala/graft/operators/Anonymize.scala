package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-anonymity for training corpora (Sweeney, IJUFKS 2002): a row is safe
  * to keep only if at least k−1 OTHER rows share its quasi-identifier
  * combination — rare (lang, source, length-bucket, …) combinations are
  * exactly the rows that re-identify a person or leak a one-off document
  * into a released dataset. The complement of t6's PII scrub: t6 redacts
  * what a regex can see inside the text; this suppresses what only the
  * JOINT DISTRIBUTION reveals.
  *
  * Scale shape: one hash shuffle on the QI key (a window count with a
  * non-empty partition spec — never the empty-spec single-partition trap),
  * then a scan-local filter or mask. Group cardinality is irrelevant to
  * memory: the window carries a single running count, no buffering of
  * group rows beyond the sort WindowExec already does.
  */
object Anonymize {

  private def groupSize(qi: Seq[Column]): Column = {
    require(qi.nonEmpty, "need at least one quasi-identifier column")
    count(lit(1)).over(Window.partitionBy(qi: _*))
  }

  private def requireFree(df: DataFrame): Unit =
    require(!df.columns.contains("__qi_n"),
      "input already has a __qi_n column — rename it before kSuppress/kMask")

  /** Suppression: drop every row whose QI group has fewer than k members.
    * Nulls in QI columns group together (SQL GROUP BY semantics) — an
    * all-null combination is itself a quasi-identifier.
    */
  def kSuppress(df: DataFrame, qi: Seq[Column], k: Long): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    requireFree(df)
    df.withColumn("__qi_n", groupSize(qi))
      .where(col("__qi_n") >= k)
      .drop("__qi_n")
  }

  /** Masking: keep every row, but null out the `maskCols` values of rows
    * in under-k groups — the utility-preserving alternative when the
    * non-QI payload (the text) is what training needs and the rare QI
    * combination is what leaks.
    */
  def kMask(df: DataFrame, qi: Seq[Column], k: Long,
            maskCols: Seq[String]): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(maskCols.nonEmpty, "kMask needs at least one column to mask")
    requireFree(df)
    val masked = df.columns.map { c =>
      if (maskCols.contains(c))
        when(col("__qi_n") >= k, col(c)).otherwise(lit(null)).as(c)
      else col(c)
    }
    df.withColumn("__qi_n", groupSize(qi))
      .select(masked.toIndexedSeq: _*)
  }
}
