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
}
