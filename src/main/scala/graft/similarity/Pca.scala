package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FloatDotExpr

/** Principal component analysis for embedding columns — the data-aware
  * companion to [[RandomProjection]] (JL is data-agnostic; PCA spends
  * the same k dimensions where THIS corpus's variance actually lives).
  * The standard pre-ANN compaction: project to the top-k subspace, run
  * the bucketed search there, verify in full dimension.
  *
  * Scale shape: fitting is ONE pass — each partition accumulates a
  * dense (d, Σx, upper-tri ΣxxT) moment block in primitive arrays (a
  * tight FMA loop per row, the mapPartitions-is-right case: a d²/2
  * dense accumulator has no columnar decomposition worth shuffling),
  * and only p partition blocks of ~d²/2 doubles reach the driver —
  * never rows. The eigensolve is driver-side cyclic Jacobi on the d×d
  * covariance (d = embedding width, tiny by construction; 64² here).
  * Projection is per-row, zero-shuffle: one codegen'd
  * [[FloatDotExpr]] per component against a literal vector, with the
  * mean folded into a precomputed scalar (x·v - mu·v), so no
  * per-row centering pass materializes.
  *
  * Numerics: partials sum in doubles (fit tolerances, not oracle
  * exactness — PCA's contract is geometric, spec-pinned: orthonormal
  * components, descending eigenvalues, variance accounting, rotation
  * invariance of projected distances). Components are sign-normalized
  * (largest-|coordinate| positive) so fits are reproducible.
  */
object Pca {

  /** Fitted model: `mean` (d), `components` (k rows, each a d-vector,
    * descending eigenvalue), `eigenvalues` (k, covariance variances
    * along each component), `totalVariance` (trace of the covariance —
    * explained ratio j = eigenvalues(j) / totalVariance). */
  final case class Model(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double],
      totalVariance: Double) {
    def explainedRatio: Array[Double] = eigenvalues.map(_ / totalVariance)
  }

  /** Fit the top-k principal components of `vecCol` (array<float>,
    * fixed width `dim`; rows with null or wrong-width vectors are
    * skipped). */
  def fit(df: DataFrame, vecCol: String, dim: Int, k: Int): Model = {
    require(k >= 1 && k <= dim, s"need 1 <= k <= dim, got k=$k dim=$dim")
    val tri = dim * (dim + 1) / 2
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df.select(col(vecCol))
      .as[Array[Float]]
      .rdd.mapPartitions { it =>
        var n = 0L
        val s = new Array[Double](dim)
        val g = new Array[Double](tri)
        it.foreach { v =>
          if (v != null && v.length == dim) {
            n += 1
            var i = 0
            var t = 0
            while (i < dim) {
              val xi = v(i).toDouble
              s(i) += xi
              var j = i
              while (j < dim) {
                g(t) += xi * v(j).toDouble
                j += 1; t += 1
              }
              i += 1
            }
          }
        }
        Iterator.single((n, s, g))
      }.collect()
    val n = partials.map(_._1).sum
    require(n >= 2, s"PCA needs >= 2 valid vectors, got $n")
    val s = new Array[Double](dim)
    val g = new Array[Double](tri)
    partials.foreach { case (_, ps, pg) =>
      var i = 0
      while (i < dim) { s(i) += ps(i); i += 1 }
      var t = 0
      while (t < tri) { g(t) += pg(t); t += 1 }
    }
    val mean = s.map(_ / n)
    // covariance (population form): C = G/n - mean meanT
    val c = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = g(t) / n - mean(i) * mean(j)
        c(i)(j) = v; c(j)(i) = v
        j += 1; t += 1
      }
      i += 1
    }
    val (evalsAll, evecsAll) = jacobiEigen(c)
    val order = evalsAll.zipWithIndex.sortBy(-_._1).map(_._2).take(k)
    val comps = order.map { idx =>
      val v = Array.tabulate(dim)(r => evecsAll(r)(idx))
      // sign convention: largest-|coordinate| positive
      val m = v.indices.maxBy(r => math.abs(v(r)))
      if (v(m) < 0) v.map(-_) else v
    }
    Model(mean, comps, order.map(evalsAll(_)),
      c.indices.map(r => c(r)(r)).sum)
  }

  /** Append projected coordinates pc0..pc(k-1): x·v_j - mu·v_j, one
    * codegen'd dot per component against a literal vector. */
  def project(df: DataFrame, vecCol: String, model: Model): DataFrame =
    model.components.zipWithIndex.foldLeft(df) { case (d, (v, j)) =>
      val muDot = model.mean.zip(v).map { case (a, b) => a * b }.sum
      d.withColumn(s"pc$j",
        FloatDotExpr.float_dot(col(vecCol),
          typedLit(v.map(_.toFloat).toSeq)) - lit(muDot))
    }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Deterministic: fixed sweep order, convergence on off-diagonal
    * norm < 1e-12 * frobenius or `maxSweeps`. */
  private[similarity] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val frob = math.sqrt(a0.map(_.map(x => x * x).sum).sum)
    val tol = 1e-12 * math.max(frob, 1e-300)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tSign = if (theta >= 0) 1.0 else -1.0
            val tt = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cc = 1.0 / math.sqrt(tt * tt + 1.0)
            val ss = tt * cc
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = cc * arp - ss * arq
              a(r)(q) = ss * arp + cc * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = cc * apr - ss * aqr
              a(q)(r) = ss * apr + cc * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = cc * vrp - ss * vrq
              v(r)(q) = ss * vrp + cc * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
