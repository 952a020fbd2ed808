package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.CacheScope
import graft.functions.DecimalDotExpr

/** Signed-random-projection (hyperplane) LSH over embedding columns — the
  * LSH-bucketed ANN variant: `nBits` fixed hyperplanes (seeded, shipped as
  * literals so an external oracle can replicate them) map each vector to a
  * bit signature; vectors sharing the signature bucket become candidates,
  * verified exactly by cosine. Collision probability per bit is
  * 1 - theta/pi, so near-parallel vectors share buckets with high
  * probability while the candidate space shrinks by ~2^nBits.
  *
  * Bit rule: sign(decimal_dot(v, plane)) >= 0 — the decimal dot keeps the
  * signature engine-exact (sum order cannot flip a near-zero projection
  * differently on different engines).
  */
object HyperplaneLSH {

  /** Deterministic planes: `nBits` x `dims` doubles from a seeded RNG. */
  def planes(nBits: Int, dims: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dims)(rnd.nextGaussian()))
  }

  private[similarity] def planeLit(p: Array[Double]): Column =
    array(p.toIndexedSeq.map(v => lit(v.toFloat)): _*)

  /** Signature bucket id in [0, 2^nBits). Planes are cast to float arrays
    * so the same DecimalDot element rounding applies on both engines. */
  def bucket(vecCol: Column, ps: Seq[Array[Double]]): Column =
    ps.zipWithIndex.map { case (p, j) =>
      when(DecimalDotExpr.decimal_dot(vecCol, planeLit(p)) >= 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The persistable signature table: (id, vec, norm_sq, bucket). At
    * scale this is what you KEEP between pipeline runs (typically as a
    * parquet table): incremental dedup joins a new batch's buckets
    * against it instead of re-projecting the corpus — see
    * [[nearDupPairsIncremental]]. The (nBits, seed, dims) triple is part
    * of the table's identity; joining tables built with different planes
    * is meaningless. */
  def bucketTable(
      vecs: DataFrame, idCol: String, vecCol: String,
      nBits: Int, seed: Long, dims: Int = 64): DataFrame =
    CosineSearch.withNormSq(vecs, vecCol)
      .select(col(idCol), col(vecCol), col("norm_sq"),
        bucket(col(vecCol), planes(nBits, dims, seed)).as("bucket"))

  /** Bucketed near-neighbor pairs: same signature bucket, cosine >=
    * threshold (exact verification via CosineSearch). `dims` must match
    * the embedding dimensionality — planes are generated at that length
    * and the dot product silently truncates to the shorter side.
    * The bucketed table is persisted (it feeds both join legs); `scope`
    * owns its release — see [[graft.core.CacheScope]]. */
  def nearDupPairs(
      vecs: DataFrame, idCol: String, vecCol: String,
      nBits: Int, seed: Long, threshold: Double, dims: Int = 64,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val bucketed = scope.retain(
      bucketTable(vecs, idCol, vecCol, nBits, seed, dims))
    val l = bucketed.select(col("bucket"), col(idCol).as("vec_a"),
      col(vecCol).as("va"), col("norm_sq").as("na"))
    val r = bucketed.select(col("bucket"), col(idCol).as("vec_b"),
      col(vecCol).as("vb"), col("norm_sq").as("nb"))
    // shared screen + exact-rescore tail (CosineSearch.scorePairs)
    CosineSearch.scorePairs(
        l.join(r, Seq("bucket")).filter(col("vec_a") < col("vec_b")),
        threshold, dedupOrder = None)
      .select(col("vec_a"), col("vec_b"), col("bucket"), col("cos_sim"))
  }

  /** Incremental bucketed near-dup pairs: a NEW batch of vectors against
    * an EXISTING corpus bucket table (from [[bucketTable]], built with
    * the SAME (nBits, seed, dims) and maintained across runs — append
    * the new batch's rows after each call), plus pairs within the new
    * batch itself. A daily-ingest pipeline re-projects only the
    * increment; the corpus is touched through the bucket join alone,
    * never re-hashed — the continuous-ingest shape at 100 TB.
    *
    * Equivalence contract (spec-pinned): with ids disjoint between batch
    * and corpus, the result is exactly [[nearDupPairs]] over
    * (corpus + batch) restricted to pairs touching at least one new
    * vector. Output: (vec_a = new id, vec_b = matched id, bucket,
    * cos_sim); batch-internal pairs ordered vec_a < vec_b. */
  def nearDupPairsIncremental(
      newVecs: DataFrame, corpusBuckets: DataFrame, idCol: String,
      vecCol: String, nBits: Int, seed: Long, threshold: Double,
      dims: Int = 64, scope: CacheScope = CacheScope.session): DataFrame =
    nearDupPairsIncrementalBucketed(
      // the increment feeds both the corpus probe and its own self-join
      scope.retain(bucketTable(newVecs, idCol, vecCol, nBits, seed, dims)),
      corpusBuckets, idCol, vecCol, threshold)

  /** [[nearDupPairsIncremental]] over an ALREADY-bucketed new batch —
    * for callers that derive the batch's bucket table once and also
    * persist it (the streaming sink): the single derivation becomes
    * structural instead of relying on cache-plan matching. Both inputs
    * must come from [[bucketTable]] with the same plane family. */
  def nearDupPairsIncrementalBucketed(
      newBucketed: DataFrame, corpusBuckets: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val n = newBucketed.select(col("bucket"), col(idCol).as("vec_a"),
      col(vecCol).as("va"), col("norm_sq").as("na"))
    val c = corpusBuckets.select(col("bucket"), col(idCol).as("vec_b"),
      col(vecCol).as("vb"), col("norm_sq").as("nb"))
    val vsCorpus = n.join(c, Seq("bucket"))
      .filter(col("vec_a") =!= col("vec_b"))
    val n2 = newBucketed.select(col("bucket"), col(idCol).as("vec_b"),
      col(vecCol).as("vb"), col("norm_sq").as("nb"))
    val within = n.join(n2, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
    CosineSearch.scorePairs(vsCorpus.unionByName(within), threshold,
        dedupOrder = None)
      .select(col("vec_a"), col("vec_b"), col("bucket"), col("cos_sim"))
  }

  /** OR-amplified (multi-table) LSH pairs — the recall knob: `nTables`
    * independent plane sets (seeds `seed .. seed + nTables - 1`); a pair
    * becomes a candidate by sharing a bucket in ANY table, so the
    * per-pair miss probability drops from `1 - p^nBits` to
    * `(1 - p^nBits)^nTables` while candidate cost grows linearly with
    * nTables. With the same seed, table 0 IS the single-table family:
    * the returned pair set grows monotonically in nTables (spec-pinned).
    *
    * A pair sharing buckets in several tables is screened by the cheap
    * double dot wherever it appears but decimal-rescored once — the
    * dedup window runs AFTER the screen so its (vec_a, vec_b) shuffle
    * carries only screen survivors (same shape as
    * CosineSearch.ivfNearDupPairs). Output: unique (vec_a, vec_b,
    * cos_sim). */
  def nearDupPairsAmplified(
      vecs: DataFrame, idCol: String, vecCol: String,
      nBits: Int, nTables: Int, seed: Long, threshold: Double,
      dims: Int = 64, scope: CacheScope = CacheScope.session): DataFrame = {
    // retained BEFORE the per-table explode: the cache holds one row per
    // vector (vector + norm + bucket array), not nTables copies of the
    // full vector; each join leg explodes the cached array
    val bucketed = scope.retain(bucketTableAmplified(
      vecs, idCol, vecCol, nBits, nTables, seed, dims))
    val cand = explodeTables(bucketed, idCol, vecCol, "a")
      .join(explodeTables(bucketed, idCol, vecCol, "b"),
        Seq("table_idx", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
    // shared tail; pairs found in several tables rescored once
    CosineSearch.scorePairs(cand, threshold,
        if (nTables == 1) None
        else Some(Seq(col("table_idx"), col("bucket"))))
      .select(col("vec_a"), col("vec_b"), col("cos_sim"))
  }

  /** The persistable multi-table signature table: one row per vector
    * with the per-table bucket ARRAY — (id, vec, norm_sq, __buckets).
    * Stored un-exploded so the kept table carries each vector once, not
    * `nTables` copies; consumers explode per join leg. Same
    * (nBits, nTables, seed, dims) identity rule as [[bucketTable]]. */
  def bucketTableAmplified(
      vecs: DataFrame, idCol: String, vecCol: String,
      nBits: Int, nTables: Int, seed: Long, dims: Int = 64): DataFrame = {
    require(nTables >= 1, s"nTables must be >= 1, got $nTables")
    val tables = (0 until nTables).map(t => planes(nBits, dims, seed + t))
    CosineSearch.withNormSq(vecs, vecCol)
      .select(col(idCol), col(vecCol), col("norm_sq"),
        array(tables.map(ps => bucket(col(vecCol), ps)): _*).as("__buckets"))
  }

  /** One join leg over a multi-table bucket table: the bucket array
    * exploded to (vec_<side>, v<side>, n<side>, table_idx, bucket) —
    * shared by the full and incremental amplified operators so their
    * candidate shapes cannot drift. */
  private def explodeTables(
      bucketed: DataFrame, idCol: String, vecCol: String,
      side: String): DataFrame =
    bucketed.select(col(idCol).as(s"vec_$side"), col(vecCol).as(s"v$side"),
      col("norm_sq").as(s"n$side"),
      posexplode(col("__buckets")).as(Seq("table_idx", "bucket")))

  /** Incremental OR-amplified pairs: a NEW batch against an EXISTING
    * multi-table bucket table (from [[bucketTableAmplified]], same plane
    * family), plus pairs within the batch. Same contract as
    * [[nearDupPairsIncremental]] — the full-corpus amplified pair set
    * restricted to pairs touching a new vector — with the multi-table
    * recall. Pairs colliding in several tables are screened wherever
    * they appear but decimal-rescored once (dedup after the screen, as
    * in [[nearDupPairsAmplified]]). Output: (vec_a = new id,
    * vec_b = matched id, cos_sim). */
  def nearDupPairsIncrementalAmplified(
      newVecs: DataFrame, corpusBuckets: DataFrame, idCol: String,
      vecCol: String, nBits: Int, nTables: Int, seed: Long,
      threshold: Double, dims: Int = 64,
      scope: CacheScope = CacheScope.session): DataFrame = {
    val newBucketed = scope.retain(bucketTableAmplified(
      newVecs, idCol, vecCol, nBits, nTables, seed, dims))
    val n = explodeTables(newBucketed, idCol, vecCol, "a")
    val vsCorpus = n
      .join(explodeTables(corpusBuckets, idCol, vecCol, "b"),
        Seq("table_idx", "bucket"))
      .filter(col("vec_a") =!= col("vec_b"))
    val within = n
      .join(explodeTables(newBucketed, idCol, vecCol, "b"),
        Seq("table_idx", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
    CosineSearch.scorePairs(vsCorpus.unionByName(within), threshold,
        if (nTables == 1) None
        else Some(Seq(col("table_idx"), col("bucket"))))
      .select(col("vec_a"), col("vec_b"), col("cos_sim"))
  }

  /** The planes rendered as SQL VALUES rows `(bit, dim_index, weight)` —
    * or `(table, bit, dim_index, weight)` when `table` is given (the
    * amplified oracle's shape) — float-valued literals so the oracle's
    * arithmetic matches `planeLit`. dim_index is 1-based for engines
    * with 1-based array indexing. */
  def planesSqlValues(ps: Seq[Array[Double]], table: Option[Int] = None): String = {
    val prefix = table.map(t => s"$t, ").getOrElse("")
    ps.zipWithIndex.flatMap { case (p, j) =>
      p.zipWithIndex.map { case (w, i) =>
        // double-routed literal: DuckDB parses a bare decimal literal as
        // DECIMAL and its DECIMAL->FLOAT conversion is off by 1 ulp for
        // some values; DOUBLE parse + narrowing cast is correctly rounded
        s"($prefix$j, ${i + 1}, CAST(CAST(${w.toFloat} AS DOUBLE) AS FLOAT))"
      }
    }.mkString(",\n")
  }

  /** CASE arm mapping a bit index to its power of two — the oracle-SQL
    * rendering of the signature fold. */
  def powArmSql(nBits: Int): String =
    (0 until nBits).map(j => s"WHEN $j THEN ${1L << j}").mkString(" ")
}
