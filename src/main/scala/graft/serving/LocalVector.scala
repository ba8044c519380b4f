package graft.serving

import graft.operators.{IvfIndex, Pq, Sq8, VectorMetric}

/** Driver-resident serving arithmetic for the VECTOR endpoints — the
  * [[LocalHybrid]] posture applied to [[SearchService]] (VERDICT r17 #4:
  * the hybrid endpoint's driver-resident tier outran the single-leg exact
  * vector endpoint it composes, because per-request Catalyst planning and
  * job scheduling dominate single-query latency; the reference's own
  * serving cap is 100 req/s, searcher.js:125-129).
  *
  * Every scorer here is a BIT-EXACT replica of the Catalyst expression it
  * shadows: the same sequential fold orders as
  * [[graft.functions.DotProduct]] / [[graft.functions.L2SqDistance]] /
  * [[graft.functions.ByteDot]] / [[graft.functions.ByteLutSum]], the same
  * zero-norm guards as [[graft.operators.AnnSearch.exactScore]] /
  * [[Sq8.score]] / [[Pq.score]], and the QUERY-SIDE parameters (SQ8
  * weights/bias, PQ LUTs) taken from the SAME builders the expressions
  * use ([[Sq8.ipParams]], [[Pq.ipLut]], …), so the two paths cannot
  * silently diverge. Ranking replicates `ORDER BY score [DESC|ASC], id`:
  * Spark sorts doubles with NaN largest and −0.0 = 0.0
  * (NormalizeFloatingNumbers), ties break on id ascending in the id
  * column's own order (numeric, or UTF-8 binary for strings —
  * [[LocalHybrid.utf8Lt]]).
  *
  * What stays distributed: anything over the caller's row budget — the
  * service keeps the full Catalyst plan as the fallback and the spec pins
  * local ≡ distributed row-for-row.
  */
private[graft] object LocalVector {

  /** Replica of `fast_dot`/`dot` on (array<float>, array<double>):
    * per-element float→double widening, sequential left-to-right fold.
    */
  def dotF(v: Array[Float], q: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(v.length, q.length)
    while (i < n) { acc += v(i).toDouble * q(i); i += 1 }
    acc
  }

  /** Replica of `fast_l2sq`/`l2Sq`: Σ (x − y)², same widening and fold. */
  def l2sqF(v: Array[Float], q: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(v.length, q.length)
    while (i < n) { val d = v(i).toDouble - q(i); acc += d * d; i += 1 }
    acc
  }

  /** Replica of `l2Norm` = sqrt(sumSquares): sequential Σ x·x, one sqrt. */
  def normF(v: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    while (i < v.length) {
      val x = v(i).toDouble; acc += x * x; i += 1
    }
    math.sqrt(acc)
  }

  /** Replica of [[graft.operators.AnnSearch.exactScore]]. `qn` is the
    * caller-computed query norm (exactScore's own `math.sqrt(query.map(x
    * => x*x).sum)` — compute it ONCE per request, like the expression
    * does per plan).
    */
  def exactScore(v: Array[Float], q: Array[Double], metric: VectorMetric,
                 qn: Double): Double = metric match {
    case VectorMetric.Ip => dotF(v, q)
    case VectorMetric.L2 => l2sqF(v, q)
    case VectorMetric.Cosine =>
      if (qn == 0.0) 0.0
      else {
        val n = normF(v)
        if (n > 0) dotF(v, q) / (n * qn) else 0.0
      }
  }

  /** Replica of [[graft.functions.ByteDot]]: Σ (code & 0xff) · w. */
  def byteDot(codes: Array[Byte], w: IndexedSeq[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < codes.length) { acc += (codes(i) & 0xff) * w(i); i += 1 }
    acc
  }

  /** Replica of [[graft.functions.ByteLutSum]]: Σ lut[j·256 + code_j]. */
  def byteLutSum(codes: Array[Byte], lut: IndexedSeq[Double]): Double = {
    var acc = 0.0; var j = 0
    while (j < codes.length) { acc += lut(j * 256 + (codes(j) & 0xff)); j += 1 }
    acc
  }

  /** Per-request SQ8 scorer under `metric` — [[Sq8.score]]'s branches with
    * the identical query-side parameters and operand order.
    */
  def sq8Scorer(model: Sq8.Model, query: Seq[Double],
                metric: VectorMetric): Array[Byte] => Double = {
    require(query.length == model.dim)
    lazy val (w, bias) = Sq8.ipParams(model, query)
    metric match {
      case VectorMetric.Ip => codes => byteDot(codes, w) + bias
      case VectorMetric.L2 =>
        val l2 = Sq8.l2LutFor(model, query)
        codes => byteLutSum(codes, l2)
      case VectorMetric.Cosine =>
        val qn = math.sqrt(query.map(x => x * x).sum)
        if (qn == 0.0) _ => 0.0
        else {
          val nl = Sq8.normLutFor(model)
          codes => {
            val nrm = math.sqrt(byteLutSum(codes, nl))
            if (nrm > 0) (byteDot(codes, w) + bias) / (nrm * qn) else 0.0
          }
        }
    }
  }

  /** Per-request PQ/ADC scorer under `metric` — [[Pq.score]]'s branches
    * over the same LUT builders.
    */
  def pqScorer(model: Pq.Model, query: Seq[Double],
               metric: VectorMetric): Array[Byte] => Double = metric match {
    case VectorMetric.Ip =>
      val ip = Pq.ipLut(model, query).toIndexedSeq
      codes => byteLutSum(codes, ip)
    case VectorMetric.L2 =>
      val l2 = Pq.l2Lut(model, query).toIndexedSeq
      codes => byteLutSum(codes, l2)
    case VectorMetric.Cosine =>
      val qn = math.sqrt(query.map(x => x * x).sum)
      if (qn == 0.0) _ => 0.0
      else {
        val ip = Pq.ipLut(model, query).toIndexedSeq
        val norms = Pq.cnormLut(model, query).toIndexedSeq
        codes => {
          val nrm = math.sqrt(byteLutSum(codes, norms))
          if (nrm > 0) byteLutSum(codes, ip) / (nrm * qn) else 0.0
        }
      }
  }

  /** Spark's sort key for a double: NaN largest, −0.0 = 0.0. */
  private def normKey(d: Double): Double = if (d == 0.0) 0.0 else d

  /** id ordering replica per Spark type; None = unsupported id type (the
    * service then serves distributed-only).
    */
  def idOrdering(dt: org.apache.spark.sql.types.DataType): Option[(Any, Any) => Boolean] =
    dt match {
      case org.apache.spark.sql.types.LongType =>
        Some((a, b) => a.asInstanceOf[Long] < b.asInstanceOf[Long])
      case org.apache.spark.sql.types.IntegerType =>
        Some((a, b) => a.asInstanceOf[Int] < b.asInstanceOf[Int])
      case org.apache.spark.sql.types.StringType =>
        Some((a, b) =>
          LocalHybrid.utf8Lt(a.asInstanceOf[String], b.asInstanceOf[String]))
      case _ => None
    }

  /** `ORDER BY score [DESC|ASC], id ASC LIMIT k` over scored row indices.
    * Returns the kept indices in served order, paired with their scores.
    *
    * O(n log k) bounded-heap selection (VERDICT r18 #5 — the full
    * per-request sort was O(n log n) over up to `maxLocalIndex` rows).
    * Order semantics are IDENTICAL to the former stable full sort: the
    * (score, id) comparator with the row INDEX as the final tie-break is
    * a total order, and under a total order "k smallest, emitted
    * ascending" equals "stable sort, take k" — compare-equal rows (same
    * score AND same id, i.e. duplicates) keep first-encountered-first,
    * exactly what TimSort's stability gave.
    */
  def rank(scores: Array[Double], ids: Array[Any], descending: Boolean,
           idLt: (Any, Any) => Boolean, k: Int): Array[Int] = {
    val n = scores.length
    def cmp(a: Int, b: Int): Int = {
      val sa = normKey(scores(a)); val sb = normKey(scores(b))
      // java.lang.Double.compare: NaN largest — Spark's double order
      val c = java.lang.Double.compare(sa, sb)
      val d =
        if (c != 0) { if (descending) -c else c }
        else if (idLt(ids(a), ids(b))) -1
        else if (idLt(ids(b), ids(a))) 1
        else 0
      if (d != 0) d else Integer.compare(a, b)
    }
    if (k <= 0 || n == 0) return Array.empty[Int]
    if (k >= n) return Array.range(0, n).sortWith((a, b) => cmp(a, b) < 0)
    // binary max-heap of the k best so far; a candidate enters only when
    // strictly smaller than the current worst, so the selection is exact
    val heap = Array.range(0, k)
    def siftDown(i0: Int): Unit = {
      var i = i0
      var moved = true
      while (moved) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < k && cmp(heap(l), heap(m)) > 0) m = l
        if (r < k && cmp(heap(r), heap(m)) > 0) m = r
        if (m == i) moved = false
        else { val t = heap(i); heap(i) = heap(m); heap(m) = t; i = m }
      }
    }
    var i = k / 2 - 1
    while (i >= 0) { siftDown(i); i -= 1 }
    var j = k
    while (j < n) {
      if (cmp(j, heap(0)) < 0) { heap(0) = j; siftDown(0) }
      j += 1
    }
    heap.sortWith((a, b) => cmp(a, b) < 0)
  }
}
