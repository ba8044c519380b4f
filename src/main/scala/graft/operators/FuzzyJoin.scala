package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — entity resolution for the string keys a
  * training corpus dedups on (titles, source names, URLs that differ by a
  * typo): all pairs with `levenshtein(l, r) <= maxDist`, WITHOUT a
  * cartesian product.
  *
  * Candidate generation is positional q-gram blocking (Gravano et al.,
  * VLDB 2001): an edit touches at most q of a string's overlapping
  * q-grams, so strings with more than `maxDist·q` grams (length ≥
  * q·(maxDist+1)) that are within distance d still share at least one
  * UNTOUCHED gram, at positions differing by at most d. Those pairs fall
  * out of an equi-join on the gram with |Δpos| ≤ d and |Δlen| ≤ d
  * residuals — a hash join keyed on gram text, never a cross product.
  * Strings too short for the guarantee (< q·(maxDist+1) chars — at the
  * default q=2, d=1 that is ≤ 3 chars) join through a length-band path
  * instead: at most 2d+1 length buckets each, and the short class is a
  * bounded dictionary in practice. Every candidate is then VERIFIED with
  * Spark's codegen'd `levenshtein` — blocking only ever adds candidates,
  * so the result is exactly the brute-force join (the f1 oracle is that
  * brute force in DuckDB).
  *
  * Scale shape: gram DF drives the candidate volume exactly like e4's
  * token inverted index. Gravano's count filter IS applied — long-class
  * candidates must match ≥ max(len)−q+1−d·q join rows before any
  * levenshtein runs, which collapses the frequent-gram blowup at the
  * verify stage. The remaining published refinement, rarest-prefix
  * indexing (index only each string's lowest-DF grams), stays documented
  * rather than applied: unlike e4's sound prefix caps it needs a DF
  * side-table to stay lossless, and the count filter already bounds the
  * verify input.
  *
  * SKEW (`saltGramDf`): the count filter bounds the verify INPUT, but the
  * gram equi-join itself hash-partitions every occurrence of one gram
  * into ONE task — a gram shared by the whole corpus ("th" in English
  * titles) serializes the join however many executors exist. With
  * `saltGramDf > 0`, right-side grams whose OCCURRENCE count exceeds it
  * (one count per position per string — a gram repeated inside one string
  * counts every occurrence, so this is a finer threshold than document
  * frequency) are salted across ceil(count/saltCap) cells (right rows hash into one
  * cell, left rows replicate to every cell — each (left,right) row pair
  * still meets exactly ONCE, so the count filter's arithmetic is
  * untouched and results are bit-identical; FuzzyJoinSpec pins parity on
  * a one-gram-shared-by-all corpus). The hot-gram table is broadcast-
  * sized by construction: at most (total gram occurrences)/saltGramDf
  * entries. Off by default — at gate SF the skew doesn't bite, and the
  * unsalted plan is the one the f1 oracle hashes.
  */
object FuzzyJoin {

  /** All (idL, strL, idR, strR, dist) with dist ≤ maxDist. Null strings
    * never match. Output column names: (idL, strL, idR, strR, "dist") —
    * callers project/rename; the operator requires the four names to be
    * pairwise distinct.
    */
  def byEditDistance(left: DataFrame, right: DataFrame,
                     idL: String, strL: String, idR: String, strR: String,
                     maxDist: Int, q: Int = 2,
                     saltGramDf: Long = 0L, saltCap: Int = 4096): DataFrame = {
    require(maxDist >= 0, s"maxDist $maxDist must be >= 0")
    require(q >= 1, s"q $q must be >= 1")
    require(saltCap >= 1, s"saltCap $saltCap must be >= 1")
    require(Seq(idL, strL, idR, strR).distinct.size == 4,
      s"output columns must be distinct names: $idL, $strL, $idR, $strR")
    val minLong = q * (maxDist + 1)
    val l = left.select(col(idL), col(strL)).where(col(strL).isNotNull)
    val r = right.select(col(idR), col(strR)).where(col(strR).isNotNull)

    // positional q-grams: (id, s, pos, gram) for the guaranteed class
    def grams(df: DataFrame, s: String, pos: String, g: String): DataFrame =
      df.where(length(col(s)) >= minLong)
        .select(df.columns.toIndexedSeq.map(col) :+
          explode(expr(
            s"transform(sequence(1, length(`$s`) - ${q - 1}), " +
              s"i -> struct(i AS p, substring(`$s`, i, $q) AS g))")).as("__pg"): _*)
        .select(df.columns.toIndexedSeq.map(col) :+ col("__pg.p").as(pos) :+
          col("__pg.g").as(g): _*)

    val lg0 = grams(l, strL, "__lp", "__lg")
    val rg0 = grams(r, strR, "__rp", "__rg")
    // hot-gram salting (scaladoc SKEW): right rows of a hot gram hash into
    // one of its __ns cells, left rows replicate to all of them, and the
    // salt joins as an extra equi-key — the hot gram's work spreads over
    // __ns tasks while every (left,right) row pair still meets exactly once
    val (lg, rg, saltKey) =
      if (saltGramDf <= 0) (lg0, rg0, lit(true))
      else {
        val hot = rg0.groupBy(col("__rg")).agg(count(lit(1)).as("__df"))
          .where(col("__df") > saltGramDf)
          .select(col("__rg").as("__hg"),
            ceil(col("__df") / lit(saltCap.toDouble)).cast("int").as("__ns"))
        val rgS = rg0.join(broadcast(hot), rg0("__rg") === col("__hg"), "left")
          .withColumn("__rsalt", when(col("__ns").isNull, lit(0)).otherwise(
            pmod(xxhash64(col(idR), col("__rp")), col("__ns")).cast("int")))
          .drop("__hg", "__ns")
        val lgS = lg0.join(broadcast(hot), lg0("__lg") === col("__hg"), "left")
          .withColumn("__lsalt", explode(when(col("__ns").isNull, array(lit(0)))
            .otherwise(expr("transform(sequence(0, __ns - 1), x -> cast(x as int))"))))
          .drop("__hg", "__ns")
        (lgS, rgS, col("__lsalt") === col("__rsalt"))
      }
    // count filtering (Gravano et al. §4.2): a pair within distance d
    // shares at least max(len)−q+1−d·q untouched gram occurrences, so
    // candidates matching fewer join rows can be dropped BEFORE the
    // levenshtein verify. The join-row count only over-counts the 1-1
    // occurrence matching (one left gram can match several right
    // positions inside ±d), so the filter is sound — it can only keep
    // extra candidates, never lose a true pair; the brute-force parity
    // spec and the f1 gate row pin that. The groupBy also dedups the
    // long class, shrinking the verify input on skewed gram frequencies
    // where a shared frequent gram would otherwise emit one candidate
    // row per co-occurrence.
    val longPairs = lg.join(rg,
        lg("__lg") === rg("__rg") && saltKey &&
          abs(lg("__lp") - rg("__rp")) <= maxDist &&
          abs(length(col(strL)) - length(col(strR))) <= maxDist)
      .groupBy(col(idL), col(strL), col(idR), col(strR))
      .agg(count(lit(1)).as("__m"))
      .where(col("__m") >=
        greatest(length(col(strL)), length(col(strR))) - lit(q - 1) - lit(maxDist * q))
      .select(col(idL), col(strL), col(idR), col(strR))

    // short-string fallback: length-band blocking (2d+1 buckets per row)
    def shortSide(df: DataFrame, s: String) = df.where(length(col(s)) < minLong)
    val shortL = shortSide(l, strL)
      .withColumn("__k", explode(sequence(
        length(col(strL)) - maxDist, length(col(strL)) + maxDist)))
      .join(r.withColumn("__k", length(col(strR))), "__k")
      .select(col(idL), col(strL), col(idR), col(strR))
    // probe long lefts only: every short-left pair is already produced by
    // shortL, so restricting here generates each short-short pair once
    // instead of relying on the distinct() to discard the double.
    val shortR = shortSide(r, strR)
      .withColumn("__k", explode(sequence(
        length(col(strR)) - maxDist, length(col(strR)) + maxDist)))
      .join(l.where(length(col(strL)) >= minLong)
        .withColumn("__k", length(col(strL))), "__k")
      .select(col(idL), col(strL), col(idR), col(strR))

    longPairs.unionByName(shortL).unionByName(shortR)
      .distinct()
      .withColumn("dist", levenshtein(col(strL), col(strR)))
      .where(col("dist") <= maxDist)
  }
}
