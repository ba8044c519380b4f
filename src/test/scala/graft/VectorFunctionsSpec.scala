package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  // First codes of the docstring example at loader.js:99-105.
  private val exampleHash =
    "3ef d3c 2cc 7b6 9dd 2b6 549 852 582 dfd c5e c01 6af ccf 46f"

  test("parseHexVector parses hex codes and zero-pads to dim (loader.js:110-117)") {
    val out = Seq(exampleHash).toDF("ha")
      .select(parseHexVector($"ha", 100).as("v"))
      .head().getSeq[Double](0)
    assert(out.length == 100)
    assert(out.take(4) == Seq(0x3ef.toDouble, 0xd3c.toDouble, 0x2cc.toDouble, 0x7b6.toDouble))
    assert(out.drop(15).forall(_ == 0.0)) // zero-padded tail
  }

  test("l2 normalization yields unit norm (loader.js:120-128)") {
    val df = Seq(exampleHash).toDF("ha")
      .select(parseHexVector($"ha", 100).as("v"))
      .select(l2Norm($"v").as("n"), $"v")
      .select(l2Norm(l2NormalizeWith($"v", $"n")).as("unitNorm"))
    val n = df.head().getDouble(0)
    assert(math.abs(n - 1.0) < 1e-9)
  }

  test("dot(v, v) == sumSquares(v), sequential double semantics") {
    val row = Seq((Seq(1.5f, -2.25f, 3.0f), Seq(1.5f, -2.25f, 3.0f))).toDF("a", "b")
      .select(dot($"a", $"b").as("d"), sumSquares($"a").as("s"))
      .head()
    assert(row.getDouble(0) == row.getDouble(1))
    assert(row.getDouble(0) == (1.5 * 1.5 + 2.25 * 2.25 + 3.0 * 3.0))
  }

  test("charCodeSum matches JS charCodeAt sum (loader.js:131-143)") {
    val out = Seq("abc", "cba", "Q8yza$", "").toDF("s")
      .select(charCodeSum($"s").as("k")).collect().map(_.getLong(0))
    assert(out(0) == 'a'.toInt + 'b'.toInt + 'c'.toInt) // 294
    assert(out(1) == out(0)) // permutation collision, the documented PK flaw
    assert(out(2) == "Q8yza$".map(_.toInt).sum)
    assert(out(3) == 0L)
  }

  test("pts_time regex (hasher.js:93-99) parses ffmpeg showinfo stderr") {
    // representative showinfo lines (ffmpeg -vf showinfo stderr shape)
    val stderr =
      """[Parsed_showinfo_1 @ 0x5600] n:   0 pts:   1001 pts_time:0.0417 pos:     5674 fmt:yuv420p
        |[Parsed_showinfo_1 @ 0x5600] n:   1 pts:   2002 pts_time:0.08342 pos:    11230 fmt:yuv420p
        |[Parsed_showinfo_1 @ 0x5600] n:   2 pts:   3003 pts_time:0.125125 pos:   18101 fmt:yuv420p""".stripMargin
    val out = Seq(stderr).toDF("log")
      .select(transform(
        regexp_extract_all($"log", lit("pts_time:\\s*([0-9.]+)\\s*pos"), lit(1)),
        t => round(t.cast("double"), 4)).as("times"))
      .head().getSeq[Double](0)
    // hasher.js:97 does parseFloat(...).toFixed(4)
    assert(out == Seq(0.0417, 0.0834, 0.1251))
  }

  test("hashId builds the composite key with 2-dp time (loader.js:241)") {
    val out = Seq(("tt1", "ep1.mp4", 12.3456)).toDF("i", "f", "t")
      .select(hashId($"i", $"f", $"t")).head().getString(0)
    assert(out == "tt1/ep1.mp4/12.35")
  }
}
