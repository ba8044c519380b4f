package graft.multimodal

import java.io.ByteArrayInputStream
import java.util.concurrent.ConcurrentHashMap

/** Routes the one descriptor this engine does not reimplement — ad=ACCID
  * (reference whitelist `hasher.js:28-49`; class
  * `net/semanticmetadata/lire/imageanalysis/features/global/ACCID` inside
  * the reference's `jar/lire.jar`) — through a USER-SUPPLIED LIRE jar at
  * runtime: the same external-tool routing posture as the ffmpeg frame
  * extractor (A15, [[graft.streaming.FfmpegFrameExtractor]]).
  *
  * Rationale: ACCID's publication is not reproducible from public sources
  * (SURVEY §7.4 risk), so shipping a from-scratch "ACCID" would silently
  * disagree with every existing ACCID index. Instead the engine invokes
  * the user's own jar reflectively per row — features are bit-identical
  * to the reference's by construction, and NO LIRE code ships with the
  * engine. Without a configured jar the loud `ad` rejection stands
  * ([[ImageOps.requireAlgo]]).
  *
  * Configuration: the `graft.lire.jar` system property, else the
  * `SPARK_GRAFT_LIRE_JAR` environment variable. On a cluster the path
  * must resolve on every executor (ship the jar with `--files` or a
  * shared mount); [[ImageOps.resolve]] captures the DRIVER's resolved
  * path into the task closure so all executors load the same artifact.
  *
  * Scale posture: the classloader and reflective handles are cached per
  * (jar, class) per JVM, so a 100 TB scan pays class-loading once per
  * executor; per row the cost is one ImageIO decode + one virtual call,
  * identical in shape to the in-engine descriptors.
  */
object LireBridge {

  private val Pkg = "net.semanticmetadata.lire.imageanalysis.features.global."

  /** FQCN of ACCID in a standard LIRE build (and in the reference's jar). */
  val AccidClass: String = Pkg + "ACCID"

  /** The reference hasher's full 12-code whitelist (`hasher.js:28-49`)
    * mapped to each code's class in a standard LIRE build — probed
    * empirically against the snapshot's own jar (JointHistogram lives in
    * the `joint` subpackage; every class constructs, extracts and answers
    * `getFeatureVector` as a `double[]`). With [[routedAlgos]] this lets
    * a migrating deployment serve ANY code bit-identically to its
    * existing LIRE-built index: the engine's own implementations are
    * honest paper-derived reimplementations whose features (and for some
    * codes DIMENSIONS — the engine's compact cl is 12 values, LIRE's
    * ColorLayout getFeatureVector is 33) differ from the jar's, so
    * cross-system index migration without a refit requires the jar route.
    */
  val ClassFor: Map[String, String] = Map(
    "cl" -> (Pkg + "ColorLayout"),
    "eh" -> (Pkg + "EdgeHistogram"),
    "jc" -> (Pkg + "JCD"),
    "oh" -> (Pkg + "OpponentHistogram"),
    "ph" -> (Pkg + "PHOG"),
    "ac" -> (Pkg + "AutoColorCorrelogram"),
    "ad" -> (Pkg + "ACCID"),
    "ce" -> (Pkg + "CEDD"),
    "fc" -> (Pkg + "FuzzyColorHistogram"),
    "fo" -> (Pkg + "FuzzyOpponentHistogram"),
    "jh" -> (Pkg + "joint.JointHistogram"),
    "sc" -> (Pkg + "ScalableColor"))

  /** The configured jar path, if any. System property wins (tests, spark
    * conf spill-through); env var is the operational route.
    */
  def configuredJar: Option[String] =
    sys.props.get("graft.lire.jar").filter(_.nonEmpty)
      .orElse(sys.env.get("SPARK_GRAFT_LIRE_JAR").filter(_.nonEmpty))

  /** Codes [[ImageOps.resolve]] routes through the configured jar INSTEAD
    * of the in-engine registry: the `graft.lire.route` system property,
    * else the `SPARK_GRAFT_LIRE_ROUTE` env var — a comma list of codes,
    * or `*` for the whole whitelist. Empty/unset routes nothing (`ad`
    * still goes through the jar by necessity — there is no in-engine
    * ACCID). Unknown codes fail loudly at resolve time, not as a silent
    * fall-through to a DIFFERENT descriptor implementation.
    */
  def routedAlgos: Set[String] = {
    val raw = sys.props.get("graft.lire.route").filter(_.nonEmpty)
      .orElse(sys.env.get("SPARK_GRAFT_LIRE_ROUTE").filter(_.nonEmpty))
    raw match {
      case None      => Set.empty
      case Some("*") => ClassFor.keySet
      case Some(s) =>
        val codes = s.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = codes -- ClassFor.keySet
        require(unknown.isEmpty,
          s"lire route: unknown codes ${unknown.toSeq.sorted.mkString(", ")} " +
            s"(the whitelist is ${ClassFor.keys.toSeq.sorted.mkString(", ")})")
        codes
    }
  }

  // Per-JVM caches: one classloader per jar path, one reflective handle
  // set per (jar, class). ConcurrentHashMap.computeIfAbsent gives the
  // once-per-executor guarantee without locks on the row path.
  private val loaders = new ConcurrentHashMap[String, ClassLoader]()
  private final case class Api(ctor: java.lang.reflect.Constructor[_],
                               extract: java.lang.reflect.Method,
                               featureVector: java.lang.reflect.Method)
  private val apis = new ConcurrentHashMap[(String, String), Api]()

  private def loaderFor(jar: String): ClassLoader =
    loaders.computeIfAbsent(jar, { p =>
      val f = new java.io.File(p)
      require(f.isFile,
        s"LireBridge: configured LIRE jar not found at '$p' — on a cluster " +
          "the path must resolve on every executor (--files or shared mount)")
      new java.net.URLClassLoader(Array(f.toURI.toURL), getClass.getClassLoader)
    })

  private def apiFor(jar: String, fqcn: String): Api =
    apis.computeIfAbsent((jar, fqcn), { case (j, c) =>
      val cls = Class.forName(c, true, loaderFor(j))
      Api(cls.getDeclaredConstructor(),
        cls.getMethod("extract", classOf[java.awt.image.BufferedImage]),
        cls.getMethod("getFeatureVector"))
    })

  /** A row function (bytes → feature, null on undecodable/failed rows —
    * the [[ImageOps.descriptors]] contract) that extracts `fqcn` from the
    * jar at `jar`. Captures only the two strings, so it serializes into
    * any task closure; all heavy state lives in the per-JVM caches.
    *
    * Failure posture: a BAD ROW (undecodable bytes, per-image extract
    * blow-up) nulls that row; a BAD CONFIG (jar path missing on this
    * executor, class absent from the jar) propagates and fails the job
    * loudly — a whole scan silently nulling out because the jar wasn't
    * shipped to executors is exactly the corruption mode to refuse.
    */
  def extractor(jar: String, fqcn: String = AccidClass): Array[Byte] => Array[Float] =
    (bytes: Array[Byte]) => {
      val api = apiFor(jar, fqcn) // jar/class config errors escape the row path
      val img =
        try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case _: Exception => null } // bad row: undecodable bytes
      if (img == null) null
      else
        try {
          val inst = api.ctor.newInstance().asInstanceOf[AnyRef]
          api.extract.invoke(inst, img)
          val d = api.featureVector.invoke(inst).asInstanceOf[Array[Double]]
          val out = new Array[Float](d.length)
          var i = 0
          while (i < d.length) { out(i) = d(i).toFloat; i += 1 }
          out
        } catch {
          // Method.invoke wraps everything the jar throws in
          // InvocationTargetException — an Exception — so a blanket catch
          // here would also swallow LinkageErrors from a slim/partial jar
          // (class resolved, its dependencies absent) and null out EVERY
          // row of the scan. Unwrap: linkage failures are config, rethrow
          // loudly; anything else the jar threw is a per-image blow-up and
          // nulls just that row.
          case e: java.lang.reflect.InvocationTargetException =>
            e.getCause match {
              case le: LinkageError => throw new IllegalStateException(
                s"LireBridge: '$fqcn' from jar '$jar' failed to link ($le) — " +
                  "the jar is missing classes it needs; refusing to null the scan", le)
              case _ => null
            }
        }
    }
}
