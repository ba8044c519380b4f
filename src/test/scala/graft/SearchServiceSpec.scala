package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.multimodal.ImageOps
import graft.serving.SearchService

class SearchServiceSpec extends SparkSpec {
  import spark.implicits._

  /** Render a small PNG whose left portion is gray level `a`, right `b`. */
  private def png(a: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 16; y <- 0 until 16) {
      val g = if (x < 8) a else b
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("end-to-end visual search: POST /search returns nearest images (§3.3)") {
    // index 3 images with distinct patterns
    val corpus = Seq(
      (1L, png(0, 255)),   // dark-left / bright-right
      (2L, png(255, 0)),   // inverse
      (3L, png(128, 128))) // flat gray
      .toDF("id", "content")
    val indexed = ImageOps.describeImages(corpus, "id", "content")
      .where($"ok").select($"id", $"descriptor")

    val svc = new SearchService(indexed, "descriptor", "id", grid = 8, topK = 2)
    val port = svc.start(0)
    try {
      val client = HttpClient.newHttpClient()
      // query: nearly identical to image 1 (tiny perturbation)
      val resp = client.send(
        HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/search"))
          .POST(HttpRequest.BodyPublishers.ofByteArray(png(5, 250))).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)
      assert(resp.body().contains(""""RawDocsCount":"2""""))
      // top doc must be image 1
      val firstId = """"id":(\d+)""".r.findFirstMatchIn(resp.body()).get.group(1)
      assert(firstId == "1", s"body: ${resp.body()}")

      // garbage bytes → 500, service stays up
      val bad = client.send(
        HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/search"))
          .POST(HttpRequest.BodyPublishers.ofByteArray("nope".getBytes)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() == 500)
      // GET → 405
      val get = client.send(
        HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/search")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 405)
    } finally svc.stop()
  }
}
