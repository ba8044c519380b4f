package graft
class BpeApplySmokeSpec extends SparkSpec {
  test("bpe_apply sidecar smoke: valid JSON, 100k-word vocab, nonzero wall") {
    val out = Bench.bpeApply(spark)
    info(out)
    assert(out.startsWith("""{"merges":10000,"vocab_rows":100000,"""), out)
    assert(!out.contains("wall_s\":0.000"), out)
  }
}
