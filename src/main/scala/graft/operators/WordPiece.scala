package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenization — the second tokenizer family beside
  * [[BpeTrain]]'s BPE, re-derived from the published descriptions
  * (Schuster & Nakajima, ICASSP 2012 "Japanese and Korean Voice Search";
  * Wu et al. 2016 GNMT §4.1; Devlin et al. 2019 BERT's released
  * `tokenization.py` fixes the inference semantics):
  *
  *   - TRAINING is BPE's merge loop with a LIKELIHOOD objective: merge the
  *     adjacent pair maximizing c(ab) / (c(a)·c(b)) — the pair whose merge
  *     most increases a unigram LM's corpus likelihood — instead of raw
  *     pair count. Non-initial subwords carry the `##` continuation mark,
  *     so "s" at word start and "##s" inside a word are distinct symbols
  *     with distinct counts, exactly the BERT vocabulary convention.
  *   - INFERENCE is greedy longest-match-first over the final piece
  *     vocabulary: at each position take the LONGEST matching piece
  *     (initial form at position 0, `##` form after); if any position has
  *     no match the ENTIRE word becomes the single `[UNK]` token — BERT's
  *     `WordpieceTokenizer` contract, not a partial fallback.
  *
  * Why both families: BPE applies its learned MERGE LIST (order matters;
  * out-of-vocabulary impossible at byte level), WordPiece serves from the
  * final PIECE SET alone (order-free, trivially servable from a static
  * vocab file, `[UNK]` as the escape hatch) — a user migrating a
  * BERT-style pipeline needs these semantics, not BPE's.
  *
  * Scale shape, same as the BPE family: training runs over the
  * vocabulary-collapsed (word, freq) table ([[BpeTrain.wordFreq]]), each
  * iteration one explode+groupBy of vocabulary-sized data plus ONE
  * driver-fetched argmax row; inference segments DISTINCT words in one
  * `mapPartitions` pass against the broadcast piece set and joins back
  * ([[tokenCounts]]) — apply cost ∝ vocabulary + one corpus join, never
  * corpus × vocab. The t24/t25 gate rows hash-check segmentation and
  * per-document counts against a DuckDB oracle that replays greedy
  * longest-match as a precomputed jump table + recursive walk.
  */
object WordPiece {

  /** The continuation mark (BERT convention). */
  val Cont = "##"

  /** BERT's unknown-word token. */
  val Unk = "[UNK]"

  // ---------------------------------------------------------------------
  // Inference: greedy longest-match-first
  // ---------------------------------------------------------------------

  /** Broadcast-side lookup tables for [[segmentSyms]]: matchable text →
    * present, per form, plus the max piece length (in CODE POINTS — the
    * suite's segmentation unit, [[BpeTrain.codePointSyms]]) bounding the
    * longest-match scan.
    */
  private[graft] final case class PieceTables(
      init: Set[String], cont: Set[String], maxInit: Int, maxCont: Int)

  private[graft] def pieceTables(pieces: Seq[String]): PieceTables = {
    require(pieces.nonEmpty, "WordPiece needs a non-empty piece vocabulary")
    pieces.foreach { p =>
      require(p.nonEmpty && p != Cont,
        s"piece '$p' is empty or a bare continuation mark")
      require(!p.startsWith(Cont) || p.length > Cont.length,
        s"piece '$p' has no text after the continuation mark")
    }
    val (contRaw, initRaw) = pieces.partition(_.startsWith(Cont))
    val init = initRaw.toSet
    val cont = contRaw.map(_.stripPrefix(Cont)).toSet
    def maxCp(s: Set[String]) =
      if (s.isEmpty) 0 else s.map(p => p.codePointCount(0, p.length)).max
    PieceTables(init, cont, maxCp(init), maxCp(cont))
  }

  /** The greedy longest-match core over a code-point symbol array — the
    * unit the distributed plan, the spec twins, and the oracle's jump
    * table all agree on. Empty input → empty output (an empty word
    * occupies no pieces); any unmatched position → the single `unk`
    * token for the WHOLE word.
    */
  private[graft] def segmentSyms(syms: Array[String], t: PieceTables,
                                     unk: String): Array[String] = {
    if (syms.length == 1 && syms(0).isEmpty) return Array.empty[String]
    val out = Array.newBuilder[String]
    val n = syms.length
    var i = 0
    while (i < n) {
      val isInit = i == 0
      val set = if (isInit) t.init else t.cont
      var k = math.min(if (isInit) t.maxInit else t.maxCont, n - i)
      var hit = -1
      while (k >= 1 && hit < 0) {
        val cand = syms.slice(i, i + k).mkString
        if (set.contains(cand)) hit = k
        else k -= 1
      }
      if (hit < 0) return Array(unk)
      val text = syms.slice(i, i + hit).mkString
      out += (if (isInit) text else Cont + text)
      i += hit
    }
    out.result()
  }

  /** Segment a words table under a piece vocabulary: (word, tokens),
    * tokens carrying the `##` continuation forms. Run on DISTINCT words
    * and join back to the corpus ([[tokenCounts]]) — one narrow
    * `mapPartitions` pass against the broadcast piece set, cost ∝
    * vocabulary × word length, independent of corpus size.
    */
  def segmentWords(words: DataFrame, pieces: Seq[String],
                   unk: String = Unk): DataFrame = {
    val session = words.sparkSession
    import session.implicits._
    val bc = session.sparkContext.broadcast(pieceTables(pieces))
    // NO spread before the greedy-match pass (r19 regression, VERDICT r19
    // what's-wrong #1): greedy longest-match is a few map lookups per
    // word — it does NOT amplify past the input bytes the way the
    // Viterbi/FFBS lattices do, so the REPARTITION_BY_NUM exchange costs
    // more than the parallelism buys (t26 0.86×, t26b 0.89× measured).
    // When the distinct-words table is genuinely large, its map-side
    // bytes are large too and AQE's byte proxy sizes the downstream
    // correctly on its own.
    words.select(col("word").cast("string"))
      .as[String]
      .mapPartitions { it =>
        val t = bc.value
        // null word -> null tokens, the BpeTrain applier contract
        it.map(w => (w,
          if (w == null) null
          else segmentSyms(BpeTrain.codePointSyms(w), t, unk)))
      }
      .toDF("word", "tokens")
  }

  /** Per-document WordPiece token count — [[BpeTrain.tokenCounts]]'
    * shape under greedy longest-match: distinct words segment once
    * (vocabulary-sized), one equi-join back to the corpus's exploded
    * words, a per-doc sum. An UNK word counts as its single `[UNK]`
    * token — the budget a BERT-style pipeline actually pays.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String,
                  pieces: Seq[String], unk: String = Unk): DataFrame = {
    require(!Set("word", "tokens", "n", "wp_tokens")(idCol),
      s"idCol '$idCol' collides with tokenCounts' internal/output columns")
    val corpusWords = df
      .select(col(idCol),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .where(length(col("word")) > 0)
    val perWord = segmentWords(corpusWords.select("word").distinct(), pieces, unk)
      .select(col("word"), size(col("tokens")).cast("long").as("n"))
    corpusWords.join(perWord, "word")
      .groupBy(idCol)
      .agg(sum("n").as("wp_tokens"))
  }

  /** The id table of a piece vocabulary: piece → its RANK in the list
    * (the BERT `vocab.txt` convention — line number is the id), with the
    * unk token taking the one-past-the-end id. Pieces must be distinct
    * and must not contain the unk string — a duplicate would make two
    * ids claim one token and the export silently ambiguous.
    */
  def vocabIds(pieces: Seq[String], unk: String = Unk): Seq[(String, Long)] = {
    require(pieces.distinct.size == pieces.size,
      "piece list contains duplicates — ids would be ambiguous")
    require(!pieces.contains(unk),
      s"unk token '$unk' collides with a vocabulary piece")
    pieces.zipWithIndex.map { case (p, i) => (p, i.toLong) } :+
      ((unk, pieces.length.toLong))
  }

  /** The TRAINING EXPORT grain under greedy longest-match — the BERT
    * analog of [[BpeTrain.tokenIds]]: one row per (doc, position) with
    * the piece's [[vocabIds]] id, `pos` 0-based over the doc's word
    * order then within-word piece order; an UNK word contributes its
    * single unk id. The id join is TOTAL by construction: every emitted
    * token is a vocabulary piece (in its served `##` form) or the unk
    * token. Scale shape: distinct words segment once
    * (vocabulary-sized), one equi-join back to the positioned corpus
    * words, the (pieces + 1)-row id table broadcasts, and the only
    * doc-grain shuffle is the per-doc position window — the grain the
    * export needs anyway. Feeds [[SequencePack.packTokenIds]] directly.
    */
  def tokenIds(df: DataFrame, idCol: String, textCol: String,
               pieces: Seq[String], unk: String = Unk): DataFrame =
    TokenExport.tokenIds(df, idCol, textCol,
      words => segmentWords(words, pieces, unk), vocabIds(pieces, unk))

  /** [[tokenIds]] under an EXPLICIT id assignment — the foreign-vocab
    * export path (ADVICE r17): a real BERT `vocab.txt` carries `[UNK]` at
    * an interior line, so [[vocabIds]]' synthesized unk-last ids would
    * shift every later id off the PUBLISHED assignment a migrating
    * pipeline must keep. Here `vocab` maps every token — including the
    * unk at its own file line — to its published id
    * ([[graft.sources.ModelStore.loadBertVocabIds]] produces exactly
    * this); segmentation serves the non-unk pieces in vocab order.
    */
  def tokenIdsWith(df: DataFrame, idCol: String, textCol: String,
                   vocab: Seq[(String, Long)], unk: String = Unk): DataFrame = {
    require(vocab.map(_._1).distinct.size == vocab.size,
      "vocab contains duplicate tokens — ids would be ambiguous")
    require(vocab.map(_._2).distinct.size == vocab.size,
      "vocab contains duplicate ids — two tokens claim one id")
    require(vocab.exists(_._1 == unk),
      s"vocab lacks the unk token '$unk' — uncoverable words need its id")
    val pieces = vocab.map(_._1).filterNot(_ == unk)
    TokenExport.tokenIds(df, idCol, textCol,
      words => segmentWords(words, pieces, unk), vocab)
  }

  // ---------------------------------------------------------------------
  // Training: BPE's loop under the likelihood objective
  // ---------------------------------------------------------------------

  /** Initial segmentation for training: code-point symbols with the
    * continuation mark on every non-initial position — so position-0 "s"
    * and interior "##s" count separately, the WordPiece alphabet.
    */
  def initialSeg(words: DataFrame): DataFrame =
    words.select(col("word"), col("freq").cast("long").as("freq"),
      transform(split(col("word"), ""),
        (s, i) => when(i === 0, s).otherwise(concat(lit(Cont), s))).as("syms"))

  // one greedy left-to-right merge of (l, r) with an EXPLICIT composite
  // string — WordPiece composites strip the right side's continuation
  // mark (l="##a", r="##b" -> "##ab"), so BpeTrain.mergeCol's l+r is
  // wrong here; same fold shape otherwise
  private def mergeColAs(syms: Column, l: String, r: String,
                         merged: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(x))))

  /** The composite a WordPiece merge produces. */
  private[graft] def composite(l: String, r: String): String =
    l + r.stripPrefix(Cont)

  // BpeTrain.greedyOnce with an EXPLICIT fused string — a rename of the
  // l+r concatenation after the fact would be ambiguous exactly when the
  // word text itself contains '#' characters (a pre-existing symbol can
  // equal the concatenation without being this merge's product); fusing
  // to `m` directly has no such corner, matching mergeColAs
  private def greedyOnceAs(syms: Array[String], l: String, r: String,
                           m: String): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
        out += m; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Learn `numMerges` merges from a (word, freq) table under the
    * likelihood objective — returns the ordered merge list; the served
    * vocabulary is [[vocab]] (alphabet + composites). Each iteration:
    * adjacent-pair counts ([[BpeTrain.pairCounts]]) join the current
    * per-symbol counts, score = (pair / c(left)) / c(right) — two double
    * divisions, NEVER a long product (c(a)·c(b) overflows long at web
    * scale; the division order is part of the spec-pinned arithmetic) —
    * and ONE driver-fetched argmax row picks the merge, ties broken by
    * (score DESC, left, right) under Spark's UTF-8 string order so
    * training is deterministic. Stops early when no pair remains.
    */
  def fit(words: DataFrame, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges $numMerges must be >= 0")
    var seg = initialSeg(words).localCheckpoint()
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val symCounts = seg
        .select(col("freq"), explode(col("syms")).as("sym"))
        .groupBy("sym").agg(sum("freq").as("c"))
      val top = BpeTrain.pairCounts(seg)
        .join(symCounts.select(col("sym").as("left_sym"), col("c").as("cl")),
          "left_sym")
        .join(symCounts.select(col("sym").as("right_sym"), col("c").as("cr")),
          "right_sym")
        .select(col("left_sym"), col("right_sym"),
          (col("pair_count").cast("double") / col("cl") / col("cr")).as("score"))
        .orderBy(col("score").desc, col("left_sym"), col("right_sym"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        out += ((l, r))
        seg = seg.withColumn("syms",
          mergeColAs(col("syms"), l, r, composite(l, r))).localCheckpoint()
        i += 1
      }
    }
    out.result()
  }

  /** [[fit]] at production merge counts — the WordPiece analog of
    * [[BpeTrain.fitLocal]]: the vocabulary-collapsed (word, freq) table
    * collects once (guarded by `maxVocab`, loud fallback to the
    * distributed [[fit]] above it) and the K-merge loop runs at memory
    * speed. Same greedy semantics, same (score DESC, left, right)
    * argmax tie-break under UTF-8 order, same double arithmetic
    * (pair/c(left)/c(right), two divisions in that order) — the learned
    * list is spec-pinned merge-for-merge equal to [[fit]]'s.
    *
    * The incremental bookkeeping is heavier than BPE's because the
    * likelihood score depends on SYMBOL counts, not just pair counts —
    * but a merge of (l, r) → m changes only THREE symbol counts (l and r
    * fall by the merged occurrences, m rises; every other symbol in a
    * rebuilt word is removed and re-added, net zero), so the pairs whose
    * score moves are exactly: pairs whose PAIR count changed (they live
    * in the rebuilt words) plus every surviving pair containing l, r, or
    * m (tracked by a symbol → pairs index). Each such pair gets a fresh
    * heap entry; an entry is live only if it states the pair's CURRENT
    * score, so stale ones fall out at pop time — the [[BpeTrain
    * .fitLocal]] stale-entry discipline with score-level (not
    * count-level) liveness.
    */
  def fitLocal(words: DataFrame, numMerges: Int,
               maxVocab: Long = 8000000L): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges $numMerges must be >= 0")
    val proj = words
      .select(col("word").cast("string"), col("freq").cast("long")).persist()
    val rows = try {
      val n = proj.count()
      require(n <= maxVocab,
        s"vocabulary $n exceeds maxVocab $maxVocab — use the distributed fit")
      proj.collect()
    } finally proj.unpersist()
    val syms: Array[Array[String]] = rows.map { r =>
      BpeTrain.codePointSyms(r.getString(0)).zipWithIndex.map {
        case (s, 0) => s
        case (s, _) => Cont + s
      }
    }
    val freq: Array[Long] = rows.map(_.getLong(1))

    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val sc = scala.collection.mutable.HashMap.empty[String, Long]
    val where = scala.collection.mutable
      .HashMap.empty[(String, String), scala.collection.mutable.Set[Int]]
    val bySym = scala.collection.mutable
      .HashMap.empty[String, scala.collection.mutable.Set[(String, String)]]
    val touched = scala.collection.mutable.HashSet.empty[(String, String)]

    def score(p: (String, String)): Double =
      pc(p).toDouble / sc(p._1) / sc(p._2)

    def addPairIndex(p: (String, String)): Unit = {
      bySym.getOrElseUpdate(p._1,
        scala.collection.mutable.HashSet.empty) += p
      bySym.getOrElseUpdate(p._2,
        scala.collection.mutable.HashSet.empty) += p
    }
    def dropPairIndex(p: (String, String)): Unit =
      Seq(p._1, p._2).foreach { s =>
        bySym.get(s).foreach { ps => ps -= p; if (ps.isEmpty) bySym.remove(s) }
      }

    // add (+1) or remove (-1) one word's full contribution: every symbol
    // occurrence and every adjacent pair, pair membership maintained once
    def wordContrib(w: Int, sign: Long): Unit = {
      val s = syms(w)
      var i = 0
      while (i < s.length) {
        val nv = sc.getOrElse(s(i), 0L) + sign * freq(w)
        if (nv == 0L) sc.remove(s(i)) else sc(s(i)) = nv
        i += 1
      }
      i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val was = pc.getOrElse(p, 0L)
        val nv = was + sign * freq(w)
        if (nv == 0L) { pc.remove(p); dropPairIndex(p) }
        else {
          pc(p) = nv
          if (was == 0L) addPairIndex(p)
        }
        if (sign > 0) where.getOrElseUpdate(
          p, scala.collection.mutable.HashSet.empty[Int]) += w
        touched += p
        i += 1
      }
      if (sign < 0) {
        var j = 0
        while (j < s.length - 1) {
          where.get((s(j), s(j + 1))).foreach { ws =>
            ws -= w; if (ws.isEmpty) where.remove((s(j), s(j + 1)))
          }
          j += 1
        }
      }
    }

    var w = 0
    while (w < syms.length) { wordContrib(w, 1L); w += 1 }

    // max score first; among ties the SMALLEST (left, right) in UTF-8
    // order — exactly the distributed fit's orderBy
    val ord: Ordering[(Double, String, String)] =
      (a: (Double, String, String), b: (Double, String, String)) => {
        if (a._1 != b._1) java.lang.Double.compare(a._1, b._1)
        else {
          val dl = BpeTrain.u8cmp(a._2, b._2)
          val d = if (dl != 0) dl else BpeTrain.u8cmp(a._3, b._3)
          -d
        }
      }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Double, String, String)](ord)
    pc.keys.foreach(p => heap.enqueue((score(p), p._1, p._2)))

    val out = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      var top: (Double, String, String) = null
      while (top == null && heap.nonEmpty) {
        val t = heap.dequeue()
        val p = (t._2, t._3)
        // live iff the entry states the pair's CURRENT score — every
        // score change pushed a fresh entry, so stale ones drop here
        if (pc.contains(p) && score(p) == t._1) top = t
      }
      if (top == null) exhausted = true
      else {
        val (l, r) = (top._2, top._3)
        out += ((l, r))
        val m = composite(l, r)
        val affected = where.getOrElse((l, r), Set.empty[Int]).toArray
        touched.clear()
        var a = 0
        while (a < affected.length) {
          val wi = affected(a)
          wordContrib(wi, -1L)
          syms(wi) = greedyOnceAs(syms(wi), l, r, m)
          wordContrib(wi, 1L)
          a += 1
        }
        // rescore: pair-count-changed pairs plus every survivor touching
        // the three symbols whose counts moved
        Seq(l, r, m).foreach(s => bySym.get(s).foreach(touched ++= _))
        touched.foreach { p =>
          if (pc.contains(p)) heap.enqueue((score(p), p._1, p._2))
        }
        k += 1
      }
    }
    out.result()
  }

  /** The served vocabulary of a trained model: the corpus alphabet (every
    * initial and `##` continuation symbol of the training words, UTF-8
    * sort order) followed by the merge composites in merge order —
    * duplicates keep their first occurrence. This is the piece list
    * [[segmentWords]] serves from and the artifact worth persisting; the
    * merge list itself is training provenance.
    */
  def vocab(words: DataFrame, merges: Seq[(String, String)]): Seq[String] = {
    val alphabet = initialSeg(words)
      .select(explode(col("syms")).as("sym"))
      .distinct().orderBy(col("sym"))
      .collect().map(_.getString(0)).toSeq
    val seen = scala.collection.mutable.LinkedHashSet[String](alphabet: _*)
    // IN-BAND '##' AMBIGUITY GUARD (ADVICE r16): the served piece list
    // encodes initial-vs-continuation IN the text ('##' prefix), which is
    // unambiguous for every corpus word not starting with '#' — in the
    // alphabet, initial symbols are single chars and can never begin with
    // the mark. But a word like '##' seeds as ['#','###'], and merging
    // that pair yields the INITIAL-form composite '##' — the bare
    // continuation mark — while ('#','####') yields initial '###', which
    // pieceTables would silently re-parse as the continuation piece '#',
    // diverging serving from training. Track initial-form provenance
    // through the merge fold and refuse loudly at export time, before the
    // ambiguity can reach segmentWords.
    val initialForm = scala.collection.mutable.HashSet[String](
      alphabet.filterNot(_.startsWith(Cont)): _*)
    merges.foreach { case (l, r) =>
      val c = composite(l, r)
      if (initialForm(l)) {
        require(!c.startsWith(Cont),
          s"merge ('$l', '$r') produces the INITIAL-form piece '$c', which " +
            "begins with the continuation mark — a corpus word starting " +
            "with '#' makes the served piece list ambiguous (the text " +
            "encoding cannot distinguish it from a continuation piece); " +
            "escape or drop '#'-initial words before fitting")
        initialForm += c
      }
      seen += c
    }
    seen.toSeq
  }
}
