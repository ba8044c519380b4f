package graft

import graft.operators.{IvfIndex, Pq, Sq8}
import graft.sources.ModelStore

/** Durable model artifacts: bit-exact round-trips and cross-"JVM" serving
  * parity — a model fitted by the build job and a model loaded from its
  * parquet artifact must produce IDENTICAL search results (doubles survive
  * parquet bit-for-bit; load order pinned by stored indices).
  */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) = graft.sources.TempDirs.register(
    s"/tmp/graft_modelstore_${ProcessHandle.current().pid()}_$tag")

  test("IVF model: round-trip exact; loaded model searches identically") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)
    val (assigned, model) = IvfIndex.build(base, "embedding", nlist = 8)
    val path = tmp("ivf")
    ModelStore.saveIvf(spark, model, path)
    val loaded = ModelStore.loadIvf(spark, path)
    assert(loaded.centroids.length == model.centroids.length)
    loaded.centroids.zip(model.centroids).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq, "centroids must round-trip bit-exactly")
    }
    val got = IvfIndex.search(assigned, loaded, "embedding", "vec_id", q, 15, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = IvfIndex.search(assigned, model, "embedding", "vec_id", q, 15, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
  }

  test("PQ model: round-trip exact incl. converged-short subspaces; ADC parity") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)
    val model = Pq.fit(base, "embedding", m = 8, ksub = 16)
    val path = tmp("pq")
    ModelStore.savePq(spark, model, path)
    val loaded = ModelStore.loadPq(spark, path)
    assert(loaded.m == model.m && loaded.dsub == model.dsub)
    (0 until model.m).foreach { j =>
      assert(loaded.codebooks(j).length == model.codebooks(j).length,
        s"subspace $j centroid count must survive (KMeans may converge short)")
      loaded.codebooks(j).zip(model.codebooks(j)).foreach { case (a, b) =>
        assert(a.toSeq == b.toSeq)
      }
    }
    val enc = Pq.encode(base, "embedding", model)
    val got = Pq.searchTopK(enc, "pq_codes", "vec_id", loaded, q, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Pq.searchTopK(enc, "pq_codes", "vec_id", model, q, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
  }

  test("SQ8 model: round-trip exact; encode+score parity") {
    val e = Tables.embeddings(spark, Sf0001)
    val q = e.where($"vec_id" === 0).select($"embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val base = e.where($"vec_id" =!= 0)
    val model = Sq8.fit(base, "embedding")
    val path = tmp("sq8")
    ModelStore.saveSq8(spark, model, path)
    val loaded = ModelStore.loadSq8(spark, path)
    assert(loaded.mins.toSeq == model.mins.toSeq)
    assert(loaded.scales.toSeq == model.scales.toSeq)
    val enc = Sq8.encode(base, "embedding", model)
    val got = Sq8.searchTopK(enc, "codes", "vec_id", loaded, q, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Sq8.searchTopK(enc, "codes", "vec_id", model, q, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
  }

  test("corrupt artifacts fail loudly: empty and permuted ids rejected") {
    import org.apache.spark.sql.functions._
    val empty = tmp("ivf_empty")
    spark.emptyDataFrame.select(lit(0).as("cluster_id"),
        array(lit(0.0)).as("centroid"))
      .write.mode("overwrite").parquet(empty)
    intercept[IllegalArgumentException] { ModelStore.loadIvf(spark, empty) }
    val gapped = tmp("ivf_gap")
    Seq((0, Seq(1.0)), (2, Seq(2.0))).toDF("cluster_id", "centroid")
      .write.mode("overwrite").parquet(gapped)
    intercept[IllegalArgumentException] { ModelStore.loadIvf(spark, gapped) }
  }

  test("bloom artifact: round-trip bytes exact; loaded filter probes identically; null persists") {
    import graft.operators.TextDedup
    val docs = (0L until 40L).map(i =>
      (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} " +
        s"tok${(i * 3) % 11} tok${(i * 5) % 11} tok${(i * 7) % 11}"))
      .toDF("doc_id", "text")
    val bench = docs.where($"doc_id" % 4 === 0)
    val corpus = docs.where($"doc_id" % 4 =!= 0)
    val bf = TextDedup.benchShingleBloom(bench, "text", "doc_id",
      shingleK = 3, expectedItems = 1L << 12, fpp = 1e-6)
    val dir = tmp("bloom")
    ModelStore.saveBloom(spark, bf, dir)
    val loaded = ModelStore.loadBloom(spark, dir)
    assert(java.util.Arrays.equals(bf, loaded), "filter bytes must survive bit-for-bit")
    // the build-day filter and the artifact-loaded filter flag the SAME docs
    def flagged(f: Array[Byte]) = TextDedup
      .contaminationBloomWith(corpus, "text", "doc_id", 3, f)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(flagged(loaded) == flagged(bf) && flagged(bf).nonEmpty)

    // an empty bench yields a null filter; the artifact keeps it explicit
    val none = TextDedup.benchShingleBloom(
      bench.limit(0), "text", "doc_id", shingleK = 3)
    assert(none == null)
    val dirN = tmp("bloom_null")
    ModelStore.saveBloom(spark, none, dirN)
    assert(ModelStore.loadBloom(spark, dirN) == null)
    assert(TextDedup.contaminationBloomWith(corpus, "text", "doc_id", 3,
      ModelStore.loadBloom(spark, dirN)).count() == 0)
  }

  test("BPE model: round-trip bit-exact incl. astral symbols and discipline tag") {
    import graft.operators.{BpeTrain, PreTokenizer, RegexPreTok, SpacePreTok}
    // astral + combining + space-prefixed symbols: the strings a GPT-2-
    // style vocabulary actually contains, round-tripped byte-for-byte
    val merges = Seq(("t", "h"), ("th", "e"), (" ", "😀"),
      ("é", "s"), (" th", "e"))
    val m = BpeTrain.BpeModel(RegexPreTok(RegexPreTok.Gpt2ish), merges)
    val dir = tmp("bpe")
    ModelStore.saveBpe(spark, m, dir)
    val loaded = ModelStore.loadBpe(spark, dir)
    assert(loaded.merges == merges, "merge list must survive in order, bit-exact")
    assert(loaded.preTok == m.preTok, "discipline must round-trip")
    // the loaded model SEGMENTS identically (the serving contract)
    val words = Seq("the", " the", "és", " 😀x").toDF("word")
    def seg(mm: BpeTrain.BpeModel) =
      BpeTrain.segmentWords(words, mm.merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(seg(loaded) == seg(m) && seg(m)("the") == List("the"))

    // space-discipline tag + empty merge list (char-level tokenizer) load too
    val dir2 = tmp("bpe_empty")
    ModelStore.saveBpe(spark, BpeTrain.BpeModel(SpacePreTok, Nil), dir2)
    val l2 = ModelStore.loadBpe(spark, dir2)
    assert(l2.preTok == SpacePreTok && l2.merges.isEmpty && !l2.byteLevel)

    // the byte-level flag round-trips — a byte-alphabet merge list applied
    // at code-point level would silently never fire
    val dirB = tmp("bpe_byte")
    ModelStore.saveBpe(spark,
      BpeTrain.BpeModel(RegexPreTok(RegexPreTok.Gpt2ish),
        Seq(("Ġ", "t")), byteLevel = true), dirB)
    assert(ModelStore.loadBpe(spark, dirB).byteLevel)

    // a v1 artifact (meta without byte_level) loads as code-point — the
    // CORRECT read, every v1 model was code-point by construction — and
    // versions past the gate refuse loudly
    val dirV = tmp("bpe_v1")
    ModelStore.saveBpe(spark, m, dirV)
    def rewriteMeta(sel: String*): Unit = {
      spark.read.parquet(s"$dirV/meta").selectExpr(sel: _*)
        .write.mode("overwrite").parquet(s"$dirV/meta2")
      val f = new java.io.File(s"$dirV/meta")
      f.listFiles().foreach(_.delete()); f.delete()
      new java.io.File(s"$dirV/meta2").renameTo(f)
    }
    rewriteMeta("CAST(1 AS INT) AS format_version", "pre_tok")
    val v1 = ModelStore.loadBpe(spark, dirV)
    assert(!v1.byteLevel && v1.merges == merges && v1.preTok == m.preTok)
    rewriteMeta("CAST(99 AS INT) AS format_version", "pre_tok")
    assert(intercept[IllegalArgumentException](
      ModelStore.loadBpe(spark, dirV)).getMessage.contains("format_version"))

    // unknown tags and truncated rank sequences fail loudly, not quietly
    assert(intercept[IllegalArgumentException](
      PreTokenizer.fromTag("bytes")).getMessage.contains("unknown"))
    val dir3 = tmp("bpe_trunc")
    ModelStore.saveBpe(spark, m, dir3)
    spark.read.parquet(s"$dir3/merges").where($"rank" =!= 2)
      .write.mode("overwrite").parquet(s"$dir3/merges2")
    val fs = new java.io.File(s"$dir3/merges")
    fs.listFiles().foreach(_.delete()); fs.delete()
    new java.io.File(s"$dir3/merges2").renameTo(fs)
    assert(intercept[IllegalArgumentException](
      ModelStore.loadBpe(spark, dir3)).getMessage.contains("non-contiguous"))
  }

  // -------------------------------------------------------------------
  // Foreign tokenizer artifact interchange (the published text formats)
  // -------------------------------------------------------------------

  private def writeRaw(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, content)
  }

  test("vocab.txt: round-trip incl. unicode, line-number id convention, guards") {
    val pieces = Seq("[UNK]", "the", "##e", "排序", "😀", "a")
    val path = tmp("bert_vocab") + "/vocab.txt"
    ModelStore.saveBertVocab(spark, pieces, path)
    val (got, unk) = ModelStore.loadBertVocab(spark, path)
    assert(got == pieces && unk == "[UNK]")
    // ids = line numbers: agreement with WordPiece.vocabIds' convention
    assert(got.indexOf("##e") == 2)
    // missing [UNK] refuses
    val noUnk = tmp("bert_nounk") + "/vocab.txt"
    ModelStore.saveBertVocab(spark, Seq("a", "b"), noUnk)
    assert(intercept[IllegalArgumentException](
      ModelStore.loadBertVocab(spark, noUnk)).getMessage.contains("unk"))
    // an empty line mid-file shifts every later id -> refuse; trailing ok
    val gap = tmp("bert_gap") + "/vocab.txt"
    writeRaw(gap, "[UNK]\n\nb\n")
    assert(intercept[IllegalArgumentException](
      ModelStore.loadBertVocab(spark, gap)).getMessage.contains("empty line"))
    val trail = tmp("bert_trail") + "/vocab.txt"
    writeRaw(trail, "[UNK]\nb\n")
    assert(ModelStore.loadBertVocab(spark, trail)._1 == Seq("[UNK]", "b"))
    // duplicate pieces refuse
    val dup = tmp("bert_dup") + "/vocab.txt"
    ModelStore.saveBertVocab(spark, Seq("[UNK]", "a", "a"), dup)
    assert(intercept[IllegalArgumentException](
      ModelStore.loadBertVocab(spark, dup)).getMessage.contains("duplicate"))
  }

  test("merges.txt: round-trip, header skip, discipline refusals") {
    val m = graft.operators.BpeTrain.BpeModel(
      graft.operators.RegexPreTok(graft.operators.RegexPreTok.Gpt2ish),
      Seq(("t", "h"), ("th", "e"), ("Ġ", "a")), byteLevel = true)
    val path = tmp("gpt2_merges") + "/merges.txt"
    ModelStore.saveGpt2Merges(spark, m, path)
    val got = ModelStore.loadGpt2Merges(spark, path)
    assert(got == m, s"$got vs $m")
    // the header is really in the file (published format)
    val fs = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    assert(fs.startsWith("#version:"), fs.take(30))
    // a code-point model refuses to masquerade as a merges.txt
    assert(intercept[IllegalArgumentException](
      ModelStore.saveGpt2Merges(spark,
        m.copy(byteLevel = false), tmp("gpt2_cp") + "/m.txt"))
      .getMessage.contains("byte-level"))
    // a malformed line refuses
    val bad = tmp("gpt2_bad") + "/merges.txt"
    writeRaw(bad, "#version: 0.2\nt h e\n")
    assert(intercept[IllegalArgumentException](
      ModelStore.loadGpt2Merges(spark, bad)).getMessage.contains("left right"))
  }

  test("vocab.json: escapes, published-id parity, guards") {
    def jsonEsc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    // parity with the engine's own published-id table: vocab(gpt2b model)
    // written as a vocab.json must load back identically
    val model = graft.operators.BpeTrain.BpeModel(
      graft.operators.RegexPreTok(graft.operators.RegexPreTok.Gpt2ish),
      Seq(("t", "h"), ("th", "e")), byteLevel = true)
    val v = graft.operators.BpeTrain.vocab(model)
    val path = tmp("gpt2_vjson") + "/vocab.json"
    writeRaw(path, v.map { case (t, i) => s""""${jsonEsc(t)}": $i""" }
      .mkString("{", ", ", "}"))
    val got = ModelStore.loadGpt2VocabJson(spark, path)
    assert(got == v, s"${got.take(5)}... vs ${v.take(5)}...")
    // unicode escapes incl. a surrogate pair decode
    val esc = tmp("gpt2_esc") + "/vocab.json"
    writeRaw(esc, """{"é": 0, "😀x": 1, "a\tb": 2}""")
    assert(ModelStore.loadGpt2VocabJson(spark, esc) ==
      Seq(("é", 0L), ("😀x", 1L), ("a\tb", 2L)))
    // duplicate token and duplicate id refuse
    val dupT = tmp("gpt2_dupt") + "/vocab.json"
    writeRaw(dupT, """{"a": 0, "a": 1}""")
    assert(intercept[IllegalArgumentException](
      ModelStore.loadGpt2VocabJson(spark, dupT))
      .getMessage.contains("duplicate"))
    val dupI = tmp("gpt2_dupi") + "/vocab.json"
    writeRaw(dupI, """{"a": 0, "b": 0}""")
    assert(intercept[IllegalArgumentException](
      ModelStore.loadGpt2VocabJson(spark, dupI))
      .getMessage.contains("one id"))
    val trailing = tmp("gpt2_trail") + "/vocab.json"
    writeRaw(trailing, """{"a": 0} x""")
    assert(intercept[IllegalArgumentException](
      ModelStore.loadGpt2VocabJson(spark, trailing))
      .getMessage.contains("trailing"))
  }

  test(".vocab: bit-exact logp round-trip, control dropping, guards") {
    val pieces = Seq(("▁the", -2.5), ("scan", -10.0), ("a", -1.0 / 3.0),
      ("排", -7.25))
    val path = tmp("sp_vocab") + "/sp.vocab"
    ModelStore.saveSentencePieceVocab(spark, pieces, path)
    assert(ModelStore.loadSentencePieceVocab(spark, path) == pieces)
    // control pieces drop by default, load verbatim when asked
    val ctrl = tmp("sp_ctrl") + "/sp.vocab"
    writeRaw(ctrl, "<unk>\t0\n<s>\t0\n</s>\t0\na\t-1.5\n")
    assert(ModelStore.loadSentencePieceVocab(spark, ctrl) ==
      Seq(("a", -1.5)))
    assert(ModelStore.loadSentencePieceVocab(spark, ctrl,
      dropControl = false).size == 4)
    // a piece with a tab is unrepresentable
    assert(intercept[IllegalArgumentException](
      ModelStore.saveSentencePieceVocab(spark,
        Seq(("a\tb", -1.0)), tmp("sp_tab") + "/x.vocab"))
      .getMessage.contains("tab"))
    // a line without a tab refuses
    val bad = tmp("sp_bad") + "/sp.vocab"
    writeRaw(bad, "abc\n")
    assert(intercept[IllegalArgumentException](
      ModelStore.loadSentencePieceVocab(spark, bad))
      .getMessage.contains("TAB"))
  }
}
