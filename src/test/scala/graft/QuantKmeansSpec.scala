package graft

import graft.operators.{QuantKmeans, UnigramTok}

/** [[QuantKmeans]] — the deterministic quantized Lloyd build (c7b). The
  * contracts: partitioning-independence (the point of the exact-decimal
  * means), bit-equality with an independent driver-side replica of the
  * same algorithm, empty-cluster keep-previous, and that the planted
  * cluster structure is actually recovered (it is a CLUSTERING, not just
  * deterministic arithmetic).
  */
class QuantKmeansSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica: same init rule, same distance expression
    * (‖c‖² − 2·v·c, first-min tie-break), same exact-decimal grid means
    * — only the execution is single-threaded.
    */
  private def localLloyd(rows: Seq[(String, Array[Double])], nlist: Int,
                         iters: Int, scale: Int,
                         margin: (Double, String) => Unit = (_, _) => ())
      : Array[Array[Double]] = {
    val init = rows
      .sortBy { case (id, _) =>
        (graft.functions.TextFunctions.hash60Local(id), id) }
      .take(nlist)
    init.foreach(_._2.foreach(x => margin(x, "init component")))
    var cents = init
      .map(_._2.map(x => UnigramTok.quantize(x, scale))).toArray
    (1 to iters).foreach { _ =>
      val sums = Array.fill(cents.length)(
        scala.collection.mutable.ArrayBuffer.empty[Array[Double]])
      rows.foreach { case (_, v) =>
        var best = Double.PositiveInfinity
        var bi = -1
        cents.zipWithIndex.foreach { case (c, i) =>
          val cn = c.map(x => x * x).sum
          var dot = 0.0; var j = 0
          while (j < v.length) { dot += v(j) * c(j); j += 1 }
          val dist = cn - 2.0 * dot
          if (dist < best) { best = dist; bi = i }
        }
        sums(bi) += v
      }
      cents = cents.zipWithIndex.map { case (c, i) =>
        if (sums(i).isEmpty) c
        else c.indices.toArray.map { d =>
          sums(i).foreach(v => margin(v(d), "member component"))
          // exact integer half-away mean, the engine's gridMeanExact —
          // no margin call: there is no double division to audit
          val dec = sums(i).map(v => UnigramTok.quantize(v(d), scale))
            .foldLeft(java.math.BigDecimal.ZERO) { (a, x) =>
              a.add(new java.math.BigDecimal(java.lang.Double.toString(x))
                .setScale(scale, java.math.RoundingMode.HALF_UP))
            }
          QuantKmeans.gridMeanExact(dec, sums(i).length.toLong, scale)
        }
      }
    }
    cents
  }

  test("partitioning-independent AND bit-equal to the driver replica") {
    val df = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val a = QuantKmeans.fit(df, "vec_id", "embedding", nlist = 8, iters = 3)
    val b = QuantKmeans.fit(df.repartition(7), "vec_id", "embedding",
      nlist = 8, iters = 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "repartitioning must not move a single bit")
    val rows = df.selectExpr("cast(vec_id as string)",
        "cast(embedding as array<double>)")
      .collect().map(r => (r.getString(0), r.getSeq[Double](1).toArray)).toSeq
    val want = localLloyd(rows, 8, 3, 6)
    assert(a.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq,
      "distributed fit must equal the driver replica bit-for-bit")
    // every component is a grid point
    a.foreach(_.foreach(x => assert(UnigramTok.quantize(x, 6) == x)))
  }

  test("c7b rounding-boundary audit: conventions agree on every remaining double round (ADVICE r18)") {
    // MEANS are integer-exact since r19 (gridMeanExact — this audit is
    // what CAUGHT the double-division mean landing on half-grid points:
    // s=-4.49475/n=60 is exactly -74912.5 at scale 6, where Spark's
    // toString-HALF_UP and DuckDB's float-scaled half-away genuinely
    // diverge, and the r18 gate survived only because Lloyd's update
    // forgets unflipped intermediates). What remains double-rounded is
    // the component quantize round(x, 6); its operands are identical on
    // both engines (no pre-round noise), so the audit asserts CONVENTION
    // agreement on each shared double — Spark's BigDecimal-over-
    // Double.toString HALF_UP vs DuckDB's float-scaled std::round —
    // rather than a boundary distance.
    var checked = 0L
    def gridMargin(v: Double, what: String): Unit = {
      val sc = v * 1e6
      assert(!sc.isNaN && !sc.isInfinite, s"$what: non-finite $v")
      val spark6 = UnigramTok.quantize(v, 6)
      // DuckDB's DOUBLE round: std::round(v * 10^6) / 10^6 — float
      // multiply, half AWAY from zero (the r18 memory-note convention)
      val duck6 = (if (sc >= 0) math.floor(sc + 0.5)
                   else math.ceil(sc - 0.5)) / 1e6
      assert(spark6 == duck6,
        s"$what: $v rounds differently by convention ($spark6 vs $duck6)")
      checked += 1
    }
    val df = spark.read.parquet(s"$Sf0001/embeddings.parquet")
    val rows = df.selectExpr("cast(vec_id as string)",
        "cast(embedding as array<double>)")
      .collect().map(r => (r.getString(0), r.getSeq[Double](1).toArray)).toSeq
    localLloyd(rows, 8, 3, 6, gridMargin)
    info(s"checked $checked pre-quantize values")
    assert(checked > 1000, s"audit too small: $checked")
  }

  test("memberless clusters keep their previous centroid") {
    // identical vectors: every point assigns to the FIRST centroid
    // (first-min tie-break), the second never gets a member
    val df = (1L to 5L).map(i => (i, Array(1.5f, -2.25f)))
      .toDF("vec_id", "embedding")
    val cents = QuantKmeans.fit(df, "vec_id", "embedding",
      nlist = 2, iters = 2)
    assert(cents.length == 2)
    assert(cents(0).toSeq == Seq(1.5, -2.25) && cents(1).toSeq == Seq(1.5, -2.25))
  }

  test("planted structure recovered; buildDeterministic assigns through IvfIndex.assign") {
    val df = Tables.clusteredEmbeddings(spark, Sf0001, clusters = 8)
    val (assigned, model) = QuantKmeans.buildDeterministic(
      df, "vec_id", "embedding", nlist = 8, iters = 5)
    assert(model.centroids.length == 8)
    // majority-label purity over the planted labels (vec_id % 8): the
    // 2.0-offset block structure dwarfs the ±0.5 noise, so a correct
    // clustering maps most planted groups onto single cells
    val rows = assigned.selectExpr("cast(vec_id % 8 as int)", "cluster_id")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val purity = rows.groupBy(_._1).values.map { g =>
      g.groupBy(_._2).values.map(_.size).max.toDouble / g.size
    }.sum / 8.0
    assert(purity >= 0.6, s"planted-cluster purity $purity too low")
  }

  test("guards refuse loudly") {
    val df = Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      QuantKmeans.fit(df, "vec_id", "embedding", 0, 1) }
    intercept[IllegalArgumentException] {
      QuantKmeans.fit(df, "vec_id", "embedding", 1, 0) }
    intercept[IllegalArgumentException] {
      QuantKmeans.fit(df, "vec_id", "embedding", 1, 1, quantScale = 0) }
    intercept[IllegalArgumentException] {
      QuantKmeans.fit(df.where("vec_id < 0"), "vec_id", "embedding", 1, 1) }
  }
}
