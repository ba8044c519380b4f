package graft

import graft.functions.BloomBroadcasts
import org.apache.spark.sql.functions._

/** [[graft.functions.BloomBroadcasts]] / `bloom_probe` — the broadcast
  * shipping vehicle for bloom filters (the r18 fix for the e9b per-task
  * literal-allocation storm). Probe parity with Spark's own literal-form
  * `bloom_might_contain` is the contract: identical bits, different
  * transport.
  */
class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  private def buildBloom(hs: Seq[Long]): Array[Byte] =
    hs.toDF("h").agg(
      call_function("bloom_agg", col("h"), lit(hs.size.toLong), lit(8192L)))
      .head().getAs[Array[Byte]](0)

  test("bloom_probe == bloom_might_contain bit-for-bit; registry idempotent") {
    val bf = buildBloom((1L to 200L).map(_ * 7919))
    val k1 = BloomBroadcasts.register(spark, bf)
    val k2 = BloomBroadcasts.register(spark, bf)
    assert(k1 == k2, "same content must reuse one broadcast")
    val probes = (1L to 2000L).toDF("h")
    val got = probes
      .select(col("h"), call_function("bloom_probe", lit(k1), col("h") * 7919).as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val want = probes
      .select(col("h"),
        call_function("bloom_might_contain", lit(bf), col("h") * 7919).as("p"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == want)
    assert((1L to 200L).forall(got(_)), "no false negatives")
  }

  test("unknown key and non-literal key refuse loudly; unregister drops") {
    val ex = intercept[Exception] {
      Seq(1L).toDF("h")
        .select(call_function("bloom_probe", lit("nope"), col("h"))).collect()
    }
    assert(ex.getMessage.contains("no filter registered"), ex.getMessage)
    val ex2 = intercept[Exception] {
      Seq(("k", 1L)).toDF("k", "h")
        .select(call_function("bloom_probe", col("k"), col("h"))).collect()
    }
    assert(ex2.getMessage.contains("string literal"), ex2.getMessage)
    val bf = buildBloom(Seq(42L))
    val k = BloomBroadcasts.register(spark, bf)
    BloomBroadcasts.unregister(k)
    intercept[Exception] {
      Seq(1L).toDF("h")
        .select(call_function("bloom_probe", lit(k), col("h"))).collect()
    }
    // re-register after retirement works (a fresh broadcast)
    assert(BloomBroadcasts.register(spark, bf) == k)
    BloomBroadcasts.unregister(k)
  }

  test("registry is LRU-bounded: eviction destroys, recent use survives") {
    val base = BloomBroadcasts.registeredCount
    // distinct contents: one broadcast each. 20 items per filter — a
    // SINGLE-item 8192-bit filter sets so few bits that different items
    // routinely produce identical bytes (measured: 64 one-item filters
    // collapsed to 43 distinct contents), which would keep the registry
    // under the bound and void the test
    def bloom(i: Int): Array[Byte] =
      buildBloom((0L until 20L).map(j => i * 1000003L + j * 7919L))
    val first = BloomBroadcasts.register(spark, bloom(0))
    val keys = (1 until BloomBroadcasts.MaxEntries)
      .map(i => BloomBroadcasts.register(spark, bloom(i)))
    assert((keys :+ first).distinct.size == BloomBroadcasts.MaxEntries,
      "fixture filters must have pairwise-distinct contents")
    // touch `first` so it is the most recently used, then overflow by one:
    // the eviction must pick the LRU entry (keys.head), not `first`
    Seq(1L).toDF("h")
      .select(call_function("bloom_probe", lit(first), col("h"))).collect()
    val overflow = BloomBroadcasts.register(spark, bloom(BloomBroadcasts.MaxEntries))
    assert(BloomBroadcasts.registeredCount <= BloomBroadcasts.MaxEntries,
      s"registry grew past the bound: ${BloomBroadcasts.registeredCount}")
    // the recently-used entry still serves...
    Seq(1L).toDF("h")
      .select(call_function("bloom_probe", lit(first), col("h"))).collect()
    // ...while the evicted LRU entry refuses loudly (same as unregister)
    val ex = intercept[Exception] {
      Seq(1L).toDF("h")
        .select(call_function("bloom_probe", lit(keys.head), col("h"))).collect()
    }
    assert(ex.getMessage.contains("no filter registered"), ex.getMessage)
    // clean up this test's entries so later suites see the prior state
    (Seq(first, overflow) ++ keys).foreach(BloomBroadcasts.unregister)
    assert(BloomBroadcasts.registeredCount <= math.max(base, 0))
  }

  test("null hash yields null, not a probe of garbage") {
    val bf = buildBloom(Seq(42L))
    val k = BloomBroadcasts.register(spark, bf)
    val r = Seq(Some(42L), None).toDF("h")
      .select(call_function("bloom_probe", lit(k), col("h")).as("p"))
      .collect().map(x => if (x.isNullAt(0)) null else x.getBoolean(0))
    assert(r(0) == true && r(1) == null)
    BloomBroadcasts.unregister(k)
  }
}
