package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 sparse retrieval (Robertson & Zaragoza, FnTIR 2009) — the keyword
  * half of a retrieval corpus: score = Σ_t idf(t) · tf·(k1+1) /
  * (tf + k1·(1 − b + b·dl/avgdl)) over the query's terms, with Lucene's
  * always-positive idf = ln(1 + (N − df + 0.5)/(df + 0.5)). Complements
  * the r1/r2 dense (hashed-embedding) path: BM25 wins on exact keywords
  * and rare entities, embeddings on paraphrase — production retrieval
  * serves BOTH and fuses ranks ([[rrf]]).
  *
  * Scale shape: the index build is ONE groupBy per grain — postings
  * (id, term, tf) with the doc length carried alongside, df per term —
  * the periodic job a 100 TB corpus pays once per refresh (persist the
  * postings lake bucketed by term and the probe below pushes an
  * `In(term)` scan filter, e2i-style). Search is the INVERTED-INDEX
  * shape: the query batch explodes to distinct terms and broadcast-
  * equi-joins the postings on term, so candidate volume is Σ_t df(t)
  * over the query's terms — never |docs|·|queries|. The per-candidate
  * score folds in TERM order over a sorted array (double addition is not
  * associative; a partitioning-dependent sum would rank differently on
  * different clusters), rounds to 1e-6 (the t7 ln-parity grain), and
  * ranks per query with a (score DESC, id) window — deterministic ties,
  * O(k) rows out per query.
  */
object Bm25 {

  /** Column names the index/search plumbing claims internally. */
  private val Reserved = Set("term", "tf", "dl", "df", "n", "avgdl", "score")

  /** Postings with document length: one row per (id, term) — (id, term,
    * tf, dl). The one docs-grain shuffle of the index build.
    */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Spread.byCols(docs, Seq(col(idCol)))
      .select(col(idCol), size(tokens(col(textCol))).cast("long").as("dl"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))

  /** A built index: the three artifacts a persisted BM25 corpus keeps —
    * postings (id, term, tf, dl), per-term document frequencies
    * (term, df), and the 1-row corpus stats (n_docs, sum_dl). All three
    * are integer-exact, so [[append]]'s merged index is BIT-identical to
    * a full [[fit]] over the union (the r5 gate row proves it against
    * r3's oracle). Persist `postings` bucketed by term and the search
    * probe pushes an `In(term)` scan filter, e2i-style.
    */
  final case class Index(idCol: String, postings: DataFrame,
                         dfs: DataFrame, docStats: DataFrame)

  /** Build the index artifacts from a corpus — the periodic job. */
  def fit(docs: DataFrame, idCol: String, textCol: String): Index = {
    require(!Reserved(idCol) && idCol != "rank",
      s"idCol must avoid 'rank' and the internal names ${Reserved.mkString(", ")}")
    val post = postings(docs, idCol, textCol)
    Index(idCol, post,
      post.groupBy(col("term")).agg(count(lit(1)).as("df")),
      docs.agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol))).cast("long")).as("sum_dl")))
  }

  /** Incremental maintenance — the daily-append shape: new documents'
    * postings UNION in (delta-sized work, the lake is untouched), the
    * term dictionary merges with a full-outer long-sum (dictionary-sized,
    * never postings-sized), and the corpus stats add as two longs. New
    * ids must be genuinely new — an id present in both sides would
    * double-count df and dl exactly like appending the same file to any
    * lake twice; dedup upstream (e1/e2) owns that.
    */
  def append(ix: Index, docs: DataFrame, textCol: String): Index = {
    val delta = fit(docs, ix.idCol, textCol)
    val dfs = ix.dfs.as("a").join(delta.dfs.as("b"), Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("a.df"), lit(0L)) + coalesce(col("b.df"), lit(0L))).as("df"))
    val stats = ix.docStats.unionByName(delta.docStats)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    Index(ix.idCol, ix.postings.unionByName(delta.postings), dfs, stats)
  }

  /** Top-k per query over a built [[Index]] — [[topK]]'s search half,
    * identical arithmetic (the two are fit ∘ search by construction).
    */
  def searchIndex(ix: Index, queries: DataFrame, qidCol: String,
                  qtextCol: String, k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(qidCol != ix.idCol && qidCol != "rank" && ix.idCol != "rank",
      s"qidCol/${ix.idCol} must differ from each other and from 'rank'")
    require(!Reserved(qidCol) && !Reserved(ix.idCol),
      s"id columns must avoid the internal names ${Reserved.mkString(", ")}")
    val idCol = ix.idCol
    // the same double the inline stats aggregate produces: long sums cast
    // at the point of division
    val stats = ix.docStats.select(
      col("n_docs").cast("double").as("n"),
      (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val qterms = queries.select(
      col(qidCol), explode(array_distinct(tokens(col(qtextCol)))).as("term"))
    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    ix.postings.join(ix.dfs, "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .select(col(qidCol), col(idCol), col("term"), (idf * tfn).as("c"))
      .groupBy(col(qidCol), col(idCol))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("term"), col("c")))),
          x => x.getField("c")),
        lit(0.0), (acc, x) => acc + x).as("__s"))
      .select(col(qidCol), col(idCol), round(col("__s"), 6).as("score"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qidCol))
          .orderBy(col("score").desc, col(idCol))).cast("long") - 1)
      .where(col("rank") < k)
      .select(col(qidCol), col("rank"), col(idCol), col("score"))
  }

  /** Top-k docs per query under BM25. `queries` is the serving batch
    * (small by contract — it broadcasts); docs is the corpus. Output:
    * (qidCol, rank, idCol, score) with rank 0-based, score rounded to 6.
    * Documents sharing no term with a query are never candidates (their
    * BM25 score is 0); a query whose terms miss the corpus entirely
    * returns no rows.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qidCol: String, qtextCol: String,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    searchIndex(fit(docs, idCol, textCol), queries, qidCol, qtextCol, k, k1, b)

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009): fused score =
    * Σ_rankers 1/(c + rank + 1) over each ranker's 0-based rank of the
    * doc, missing ranks contributing nothing. Each input is a
    * (qidCol, idCol, rankCol) frame — typically the top-K of one ranker
    * ([[topK]], `AnnSearch.batchTopK`). The fold runs in ranker order
    * over a sorted array, so the fused score is bit-identical regardless
    * of partitioning, and needs NO rounding grain: every term is one
    * IEEE division every engine computes identically. Output: (qidCol,
    * rank, idCol, rrf) — rank 0-based by (rrf DESC, id).
    *
    * Scale shape: a union + one groupBy on (qid, id) of the rankers'
    * ALREADY-TRUNCATED top-K lists — rows in ≤ Σ_r |q|·k_r, nothing
    * corpus-sized touches the fusion.
    */
  def rrf(rankings: Seq[DataFrame], qidCol: String, idCol: String,
          rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(k >= 1, s"k $k must be >= 1")
    require(qidCol != idCol, s"qidCol and idCol must differ (both '$idCol')")
    Seq(qidCol, idCol).foreach(n =>
      require(n != "rank" && n != "rrf",
        s"'$n' collides with rrf's output columns (rank, rrf) — rename it"))
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(qidCol), col(idCol), lit(i).as("__r"),
        (lit(1.0) / (lit(c) + col(rankCol) + lit(1.0))).as("__c"))
    }.reduce(_.unionByName(_))
    tagged.groupBy(col(qidCol), col(idCol))
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("__r"), col("__c")))),
          x => x.getField("__c")),
        lit(0.0), (acc, x) => acc + x).as("rrf"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(qidCol))
          .orderBy(col("rrf").desc, col(idCol))).cast("long") - 1)
      .where(col("rank") < k)
      .select(col(qidCol), col("rank"), col(idCol), col("rrf"))
  }
}
