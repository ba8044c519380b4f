package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Concat-then-chunk sequence packing — the step between a curated corpus
  * and a token-level training run: documents are laid end to end in a
  * deterministic pseudo-random order (the [[Sampling.drawHex]] md5 draw,
  * the "global shuffle" training prep wants) and the concatenation is cut
  * into fixed `ctxLen`-token context windows. The manifest records, per
  * document, its global token offset and the chunk range it lands in —
  * the audit trail that says exactly which context window(s) any document
  * trained in, bit-reproducible on any engine (the x1 gate row's DuckDB
  * oracle recomputes it).
  *
  * Scale shape: the global token offset is the [[GlobalRank]] two-pass
  * prefix-sum pattern extended from counting to summing (the
  * [[Sampling.tokenBudget]] machinery without strata): range-partition by
  * (draw, id) — a total order, uniformly spread because the draw is
  * uniform — sort within partitions, collect ONE long per partition
  * (the partition's token subtotal), broadcast the prefix offsets, and
  * emit offsets in a second pass over the SAME shuffle files. No
  * single-partition window anywhere; a
  * `sum().over(Window.orderBy(draw))` here would serialize the corpus
  * through one task — Spark's own WindowExec warning, the 100 TB trap
  * PlanAuditSpec rejects across the whole gate surface.
  *
  * EAGERNESS AND LINEAGE: like [[Sampling.tokenBudget]], pass 1 runs at
  * call time and the result is rebuilt via `createDataFrame` — an
  * analysis barrier; filter/project BEFORE calling.
  */
object SequencePack {

  /** Per-document packing manifest: `(idCol, tokens, tok_offset,
    * first_chunk, last_chunk, n_chunks)`, where `tok_offset` is the sum of
    * tokens over all documents strictly earlier in (draw, id) order and
    * chunks are `ctxLen`-sized cuts of the concatenation. Documents with
    * `tokenCol <= 0` are dropped (they occupy no window).
    */
  def packManifest(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      ctxLen: Long): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    val spark = df.sparkSession
    val drawName = "__sp_draw"
    val base = df
      .select(col(idCol), col(tokenCol).cast("long").as("tokens"))
      .where(col("tokens") > 0)
      .withColumn(drawName, Sampling.drawHex(col(idCol)))
    val n = scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    val sorted = base
      .repartitionByRange(n, col(drawName), col(idCol))
      .sortWithinPartitions(col(drawName), col(idCol))
    val ti = sorted.schema.fieldIndex("tokens")
    val rdd = sorted.rdd // ONE conversion — both jobs share the shuffle
    // pass 1: one token subtotal per partition (#partitions longs)
    val subtotals: Array[(Int, Long)] = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(ti))
      Iterator.single((pid, s))
    }.collect()
    val offsets: Array[Long] = subtotals.sortBy(_._1).map(_._2)
      .scanLeft(0L)(_ + _).dropRight(1)
    val bOff = spark.sparkContext.broadcast(offsets)
    // pass 2: running offset within each partition, seeded from the prefix
    val ii = sorted.schema.fieldIndex(idCol)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = bOff.value(pid)
      it.map { r =>
        val tokens = r.getLong(ti)
        val off = cum
        cum += tokens
        val first = off / ctxLen
        val last = (off + tokens - 1) / ctxLen
        Row(r.get(ii), tokens, off, first, last, last - first + 1)
      }
    }
    val schema = new StructType()
      .add(df.schema(idCol))
      .add("tokens", LongType, nullable = false)
      .add("tok_offset", LongType, nullable = false)
      .add("first_chunk", LongType, nullable = false)
      .add("last_chunk", LongType, nullable = false)
      .add("n_chunks", LongType, nullable = false)
    spark.createDataFrame(out, schema)
  }

  /** Document-INTACT greedy packing — the other standard packing policy
    * beside [[packManifest]]'s concat-then-chunk: no document is ever split
    * across context windows; a doc that doesn't fit the current window's
    * remainder opens a new one (the remainder is padding). A doc longer
    * than `ctxLen` gets a window of its own (truncation is a separate,
    * explicit step — silent truncation here would corrupt the audit trail).
    *
    * Greedy packing is a sequential recurrence (each doc's bin depends on
    * every earlier remainder), so a corpus-wide chain cannot parallelize.
    * The production answer is SHARDED packing: documents are laid out in
    * the deterministic [[Sampling.drawHex]] md5-draw order (same global
    * shuffle as [[packManifest]]), cut into fixed `shardDocs`-sized shards
    * by the [[GlobalRank]] two-pass rank, and each shard packs its own bins
    * independently — embarrassingly parallel, bins never span shards, and
    * the waste is bounded by one open window per shard. Within a shard the
    * fold runs as an `aggregate` higher-order function over the shard's
    * sorted doc array, so the whole operator is one rank pass + one
    * shuffle, no driver loop, no window-without-partition.
    *
    * Sizing `shardDocs`: group state is `shardDocs` structs, but the HOF
    * fold rebuilds its accumulator array per element — O(shardDocs²)
    * struct copies per shard — so keep shards at ~10^3 docs (the waste,
    * ≤ one open window per shard, is already ≈0.1% there; quadrupling the
    * shard buys ~nothing and pays 16× the fold).
    *
    * Returns `(idCol, tokens, shard, bin, off)`: bin is the within-shard
    * window ordinal, off the doc's token offset inside its window.
    * Deterministic for a given (corpus, ctxLen, shardDocs) — the x2 gate
    * row's DuckDB oracle replays the same recurrence as a recursive CTE.
    */
  def packNoSplit(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      ctxLen: Long,
      shardDocs: Int): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive, got $ctxLen")
    require(shardDocs > 0, s"shardDocs must be positive, got $shardDocs")
    val base = df
      .select(col(idCol), col(tokenCol).cast("long").as("tokens"))
      .where(col("tokens") > 0)
      .withColumn("__draw", Sampling.drawHex(col(idCol)))
    val ranked = GlobalRank
      .withGlobalIndex(base, Seq(col("__draw"), col(idCol)), "__idx")
      .withColumn("shard", (col("__idx") / shardDocs).cast("long"))
    // the struct carries the id column's ORIGINAL type (ADVICE r10 #1):
    // the old cast-to-bigint silently nulled string/UUID doc ids (or threw
    // under ANSI mode), diverging from packManifest's type preservation
    val idSql = df.schema(idCol).dataType.sql
    val rowsT = s"array<struct<id:$idSql,tokens:bigint,bin:bigint,off:bigint>>"
    // fill starts at ctxLen so the first doc always "overflows" into bin 0
    // at off 0 — the same sentinel the oracle's rn=1 anchor encodes
    val init = struct(
      lit(ctxLen).as("fill"), lit(-1L).as("bin"),
      expr(s"CAST(array() AS $rowsT)").as("rows"))
    def step(acc: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) = {
      val over = acc("fill") + x("tokens") > lit(ctxLen)
      val bin = when(over, acc("bin") + 1L).otherwise(acc("bin"))
      val off = when(over, lit(0L)).otherwise(acc("fill"))
      val fill = when(over, x("tokens")).otherwise(acc("fill") + x("tokens"))
      struct(fill.as("fill"), bin.as("bin"),
        concat(acc("rows"), array(struct(
          x("id").as("id"), x("tokens").as("tokens"),
          bin.as("bin"), off.as("off")))).as("rows"))
    }
    ranked
      .groupBy(col("shard"))
      .agg(sort_array(collect_list(struct(
        col("__idx"), col(idCol).as("id"), col("tokens")))).as("docs"))
      .select(col("shard"),
        aggregate(col("docs"), init, step, acc => acc("rows")).as("rows"))
      .select(col("shard"), explode(col("rows")).as("r"))
      .select(col("r.id").as(idCol), col("r.tokens").as("tokens"),
        col("shard"), col("r.bin").as("bin"), col("r.off").as("off"))
  }
}
