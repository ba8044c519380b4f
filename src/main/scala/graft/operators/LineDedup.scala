package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal — the C4/RefinedWeb cleaning step that
  * document-level dedup cannot express: headers, footers, cookie banners and
  * navigation chrome repeat across thousands of pages while every page stays
  * globally unique, so they survive document dedup and leak into training
  * data. The filter drops any LINE whose distinct-document frequency reaches
  * `minDocs`, then reassembles each document from its surviving lines in
  * original order (C4 §2.1 drops lines by a curated blocklist; RefinedWeb
  * derives the blocklist from the corpus itself, as here).
  *
  * Scale shape (100 TB): the corpus-wide line-frequency aggregation is two
  * map-side-combinable shuffles over fixed-width 60-bit line-hash keys —
  * `distinct` then `count` — and produces the boilerplate set, which is TINY
  * by construction (only lines repeated across ≥ minDocs documents survive
  * the HAVING). That set collapses to ONE broadcast array row, so the
  * cleaning pass itself is a row-local higher-order `filter` fused into the
  * scan projection: document text never shuffles, never explodes, and line
  * order is preserved by construction rather than re-sorted.
  */
object LineDedup {

  private def lineKey(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Remove lines appearing in ≥ `minDocs` distinct documents.
    *
    * Output: (idCol, clean_text, n_kept, n_removed) — one row per input
    * document; a document whose every line was boilerplate survives with
    * `clean_text = ""` and `n_kept = 0` (callers gate on `n_kept` if they
    * want C4's drop-empty behavior).
    *
    * @param sep line separator, treated as a regex by `split` and literally
    *            by the rejoin (the default "\n" is both).
    */
  def removeBoilerplate(
      df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minDocs: Int = 2): DataFrame = {
    val lineArr = split(col(textCol), sep)

    // Corpus-wide distinct-document frequency per line; lines at/over the
    // threshold are the boilerplate set, aggregated into one array row.
    val badList = df
      .select(col(idCol), explode(lineArr).as("line"))
      .select(lineKey(col("line")).as("__lk"), col(idCol))
      .distinct()
      .groupBy("__lk")
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .agg(collect_list(col("__lk")).as("__bad"))

    // Row-local cleaning against the broadcast boilerplate array.
    val kept = filter(lineArr, x => !array_contains(col("__bad"), lineKey(x)))
    df.crossJoin(broadcast(badList))
      .select(
        col(idCol),
        concat_ws(sep, kept).as("clean_text"),
        size(kept).cast("long").as("n_kept"),
        (size(lineArr) - size(kept)).cast("long").as("n_removed"))
  }
}
