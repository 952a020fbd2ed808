package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.CacheScope

/** Similarity search over embedding columns (Array[Float]).
  *
  * Two paths:
  *  - brute-force cosine top-k: exact, O(|queries| x |corpus|) — the
  *    correctness baseline; fine when |queries| is small.
  *  - IVF (inverted-file) bucketing: corpus assigned to nearest centroid
  *    once, candidate generation restricted to the probe's bucket — the
  *    scale path (search cost divided by #buckets; the corpus-sized
  *    assignment is one map-side pass).
  *
  * Dot products fold the element pairs into a DECIMAL accumulator: decimal
  * addition is associative-exact, so results are bit-identical regardless
  * of engine or partitioning (double accumulation is not), which is what
  * lets a DuckDB oracle hash-match these queries.
  */
object CosineSearch {

  /** Exact decimal dot product of two float-array columns — native
    * codegen'd expression (graft.functions.DecimalDot); semantically
    * identical to the aggregate(zip_with(...decimal cast...)) fold but
    * without interpreted per-element lambda dispatch. */
  def dotDecimal(a: Column, b: Column): Column =
    graft.functions.DecimalDotExpr.decimal_dot(a, b)

  /** Cosine similarity from decimal dot products (double output —
    * deterministic given deterministic inputs). */
  def cosine(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") /
      (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))

  /** Vectors augmented with their squared norm (one pass, no shuffle). */
  def withNormSq(vecs: DataFrame, vecCol: String): DataFrame =
    vecs.withColumn("norm_sq", dotDecimal(col(vecCol), col(vecCol)))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), ranked desc with id tiebreak. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val c = withNormSq(corpus, vecCol)
      .select(col(idCol).as("nn_id"), col(vecCol).as("nn_vec"),
        col("norm_sq").as("nn_norm_sq"))
    val q = withNormSq(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("norm_sq").as("q_norm_sq"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("nn_id"))
      .withColumn("cos_sim",
        cosine(dotDecimal(col("q_vec"), col("nn_vec")),
          col("q_norm_sq"), col("nn_norm_sq")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("cos_sim"))
  }

  /** IVF assignment: each vector's `nAssign` nearest centroids by cosine
    * (centroids broadcast; one map-side pass over the corpus). The
    * default single assignment puts every vector in exactly one bucket —
    * the search/candidate side; multi-assignment (`nAssign > 1`) is the
    * recall knob for symmetric pair detection ([[ivfNearDupPairs]]),
    * where a pair straddling a bucket boundary is only found if the two
    * vectors share at least one assigned bucket.
    *
    * The nearest-centroid selection is strictly map-side: the centroid
    * set is collected into ONE broadcast row (an array of (id, vec,
    * norm) structs), and each corpus row picks its `nAssign` best
    * centroids with array expressions over that broadcast array —
    * `array_min` (nAssign = 1) / `array_sort` + `slice` (nAssign > 1)
    * over (-c_sim, centroid_id) structs. No window, no aggregation, no
    * exchange, no sort of the |corpus| x |centroids| fan-out: the
    * assignment literally is one pass over the corpus, and the scored
    * fan-out never materializes outside a per-row array. Ordering matches
    * the window formulation this replaces — (c_sim DESC, centroid_id
    * ASC) = ascending (-c_sim, centroid_id) — including the degenerate
    * end: a zero-norm centroid or vector yields a NULL similarity (Spark
    * and DuckDB both return NULL for 0/0 double division; NaN cannot
    * reach the cosine because the decimal dot rejects NaN elements),
    * which the descending window ranked last (desc_nulls_last) and which
    * maps to +Infinity here.
    *
    * Output: (idCol, vecCol, norm_sq, centroid_id, c_sim) — the winning
    * similarity rides along for free (null when it was the null-vector
    * sentinel), so consumers like [[Centroids.objective]] never re-derive
    * it. An input already carrying a `norm_sq` column is trusted as-is —
    * the hook for iterative callers ([[Centroids.kmeans]]) to compute and
    * cache the corpus norms once instead of once per round. */
  def ivfAssign(
      vecs: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      centroidIdCol: String, nAssign: Int = 1): DataFrame = {
    require(nAssign >= 1, s"nAssign must be >= 1, got $nAssign")
    val v =
      if (vecs.columns.contains("norm_sq")) vecs
      else withNormSq(vecs, vecCol)
    val centArr = broadcast(withNormSq(centroids, vecCol)
      .agg(collect_list(struct(col(centroidIdCol).as("cid"),
        col(vecCol).as("c_vec"), col("norm_sq").as("c_norm_sq"))).as("cents")))
    // per-row scored centroid array; the struct order IS the ranking order
    val scoredArr = transform(col("cents"), cn => struct(
      coalesce(-cosine(dotDecimal(col(vecCol), cn.getField("c_vec")),
          col("norm_sq"), cn.getField("c_norm_sq")),
        lit(Double.PositiveInfinity)).as("neg_sim"),
      cn.getField("cid").as("centroid_id")))
    // the +Infinity null sentinel must not surface as a similarity
    def sim(negSim: Column): Column =
      when(negSim === lit(Double.PositiveInfinity), lit(null)
        .cast("double")).otherwise(-negSim)
    val joined = v.crossJoin(centArr)
    if (nAssign == 1)
      joined
        .withColumn("__best", array_min(scoredArr))
        .select(col(idCol), col(vecCol), col("norm_sq"),
          col("__best.centroid_id").as("centroid_id"),
          sim(col("__best.neg_sim")).as("c_sim"))
        .filter(col("centroid_id").isNotNull)
    else
      joined
        .select(col(idCol), col(vecCol), col("norm_sq"),
          explode(slice(array_sort(scoredArr), 1, nAssign)).as("sc"))
        .select(col(idCol), col(vecCol), col("norm_sq"),
          col("sc.centroid_id").as("centroid_id"),
          sim(col("sc.neg_sim")).as("c_sim"))
  }

  /** IVF-bucketed top-k search: each query vector is probed only against
    * corpus vectors in its `nProbe` nearest centroid buckets (1-probe by
    * default). Recall is traded for a |buckets|/nProbe-fold candidate
    * reduction — the standard ANN scale path; raising nProbe is the
    * recall knob (candidate cost grows linearly with it). Measure the
    * trade with [[recallAtK]] against [[bruteForceTopK]] on a sample. */
  def ivfTopK(
      vecs: DataFrame, centroids: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, centroidIdCol: String, k: Int,
      nProbe: Int = 1, scope: CacheScope = CacheScope.session): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    // assigned feeds both the probe derivation and the candidate side of
    // the bucket join — retained so the centroid-scoring pass over the
    // corpus runs once, not once per consumer
    val assigned = scope.retain(
      ivfAssign(vecs, centroids, idCol, vecCol, centroidIdCol))
    val q = queries.select(col(idCol).as("query_id"))
      .join(assigned.withColumnRenamed(idCol, "query_id"), Seq("query_id"))
      .select(col("query_id"), col(vecCol).as("q_vec"),
        col("norm_sq").as("q_norm_sq"), col("centroid_id"))
    // probe set: the query's nProbe nearest centroids. The probe ranking
    // uses the same scoring and tiebreak as ivfAssign, so rank 1 IS the
    // query's own assignment bucket — at the default nProbe = 1 the
    // assignment is reused directly and the per-query centroid
    // crossJoin + window is skipped entirely.
    val probes =
      if (nProbe == 1) q
      else
        // the probe ranking is just a multi-assignment of the query
        // vectors — same map-side argmin, no window
        ivfAssign(q.select(col("query_id"), col("q_vec").as(vecCol)),
            centroids, "query_id", vecCol, centroidIdCol, nAssign = nProbe)
          .select(col("query_id"), col(vecCol).as("q_vec"),
            col("norm_sq").as("q_norm_sq"), col("centroid_id"))
    val c = assigned.select(col("centroid_id"), col(idCol).as("nn_id"),
      col(vecCol).as("nn_vec"), col("norm_sq").as("nn_norm_sq"))
    // a corpus vector lives in exactly one bucket, so probing several
    // buckets cannot produce duplicate (query, nn) candidates
    val scored = probes.join(c, Seq("centroid_id"))
      .filter(col("query_id") =!= col("nn_id"))
      .withColumn("cos_sim",
        cosine(dotDecimal(col("q_vec"), col("nn_vec")),
          col("q_norm_sq"), col("nn_norm_sq")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"), col("centroid_id"),
        col("cos_sim"))
  }

  /** Shared candidate-pair scoring tail for the bucketed near-dup
    * operators (IVF and hyperplane LSH): a codegen'd double dot screens
    * every candidate at `threshold - 1e-6` (the double/decimal divergence
    * is ~1e-15, so no true positive is lost at that margin), an optional
    * one-per-pair dedup runs AFTER the screen (the (vec_a, vec_b) window
    * shuffle carries both full vectors — only screen survivors may pay
    * it), and survivors are rescored with the exact decimal fold.
    * Expects columns vec_a/vec_b/va/vb/na/nb; appends cos_sim. */
  private[similarity] def scorePairs(
      cand: DataFrame, threshold: Double,
      dedupOrder: Option[Seq[Column]]): DataFrame = {
    val screened = cand
      .withColumn("cos_approx",
        graft.functions.FloatDotExpr.float_dot(col("va"), col("vb")) /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      .filter(col("cos_approx") >= threshold - 1e-6)
    val uniq = dedupOrder match {
      case None => screened
      case Some(ord) =>
        val w = Window.partitionBy(col("vec_a"), col("vec_b")).orderBy(ord: _*)
        screened.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
    }
    uniq
      .withColumn("cos_sim",
        cosine(dotDecimal(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos_sim") >= threshold)
  }

  /** Recall@k of an approximate top-k result against the exact one: the
    * fraction of (query_id, nn_id) pairs in `exact` that `approx` also
    * returned. Both inputs are the [[bruteForceTopK]]/[[ivfTopK]] output
    * shape. The operational quality metric for the nProbe/#buckets trade —
    * run it on a query sample before settling 100 TB search parameters. */
  def recallAtK(exact: DataFrame, approx: DataFrame): Double = {
    val e = exact.select(col("query_id"), col("nn_id"))
    val total = e.count()
    if (total == 0) 1.0
    else {
      val hits = e.join(approx.select(col("query_id"), col("nn_id")),
        Seq("query_id", "nn_id")).count()
      hits.toDouble / total
    }
  }

  /** IVF-bucketed near-duplicate pairs: vectors sharing a bucket with
    * cosine >= threshold. The self-join key is the bucket id, so the
    * pair space is |bucket|^2, not |corpus|^2.
    *
    * `nProbe` is the recall knob for pairs straddling a bucket boundary:
    * each vector is assigned to its `nProbe` nearest centroids, so two
    * near-identical vectors whose nearest centroids differ are still
    * paired through any shared probe bucket (candidate cost grows
    * linearly with nProbe; pairs sharing several buckets are scored
    * once). At the default nProbe = 1 a boundary-straddling pair is
    * missed — acceptable only when buckets are coarse relative to the
    * dup threshold; measure on a labeled sample before settling 100 TB
    * parameters.
    *
    * Scoring is two-phase: a codegen'd native double dot product screens
    * every candidate pair (cheap), then the exact decimal fold rescores
    * only survivors of `threshold - 1e-6` (the double/decimal divergence
    * is ~1e-15, so no true positive can be lost at that margin). */
  def ivfNearDupPairs(
      vecs: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      centroidIdCol: String, threshold: Double, nProbe: Int = 1,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    // both sides of the bucket self-join read the assignment — retain it
    val assigned = scope.retain(
      ivfAssign(vecs, centroids, idCol, vecCol, centroidIdCol, nProbe))
    pairsFromAssigned(assigned, idCol, vecCol, threshold, nProbe)
  }

  /** The bucket self-join + scoring tail of [[ivfNearDupPairs]], over an
    * already-materialized [[ivfAssign]] output — shared with consumers
    * that need the assignment for their own purposes as well
    * ([[SemDedup.verdicts]]) so the corpus-scoring pass isn't re-run. */
  private[similarity] def pairsFromAssigned(
      assigned: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nProbe: Int): DataFrame = {
    val l = assigned.select(col("centroid_id"), col(idCol).as("vec_a"),
      col(vecCol).as("va"), col("norm_sq").as("na"))
    val r = assigned.select(col("centroid_id"), col(idCol).as("vec_b"),
      col(vecCol).as("vb"), col("norm_sq").as("nb"))
    val cand = l.join(r, Seq("centroid_id"))
      .filter(col("vec_a") < col("vec_b"))
    // multi-probe: a pair sharing several probed buckets is emitted once
    // — smallest shared bucket id kept (deterministic)
    scorePairs(cand, threshold,
        if (nProbe == 1) None else Some(Seq(col("centroid_id"))))
      .select(col("vec_a"), col("vec_b"), col("centroid_id"), col("cos_sim"))
  }

  /** Incremental IVF near-dup pairs: a NEW batch against an EXISTING
    * corpus assignment table (an [[ivfAssign]] output — with the SAME
    * centroids and nProbe — maintained across runs; append the batch's
    * assignment after each call), plus pairs within the batch. Only the
    * increment is scored against the centroids; the corpus is touched
    * through the bucket join alone — the same continuous-ingest shape
    * as the LSH/simhash/minhash/jaccard incremental operators, with the
    * same contract (spec-pinned): ids disjoint, result = [[ivfNearDupPairs]]
    * over (corpus + batch) restricted to pairs touching a new vector.
    * Output: (vec_a = new id, vec_b = matched id, centroid_id,
    * cos_sim); batch-internal pairs a < b. */
  def ivfNearDupPairsIncremental(
      newVecs: DataFrame, corpusAssigned: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, centroidIdCol: String,
      threshold: Double, nProbe: Int = 1,
      scope: CacheScope = CacheScope.session): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val newAssigned = scope.retain(
      ivfAssign(newVecs, centroids, idCol, vecCol, centroidIdCol, nProbe))
    val n = newAssigned.select(col("centroid_id"), col(idCol).as("vec_a"),
      col(vecCol).as("va"), col("norm_sq").as("na"))
    val c = corpusAssigned.select(col("centroid_id"), col(idCol).as("vec_b"),
      col(vecCol).as("vb"), col("norm_sq").as("nb"))
    val vsCorpus = n.join(c, Seq("centroid_id"))
      .filter(col("vec_a") =!= col("vec_b"))
    val n2 = newAssigned.select(col("centroid_id"), col(idCol).as("vec_b"),
      col(vecCol).as("vb"), col("norm_sq").as("nb"))
    val within = n.join(n2, Seq("centroid_id"))
      .filter(col("vec_a") < col("vec_b"))
    scorePairs(vsCorpus.unionByName(within), threshold,
        if (nProbe == 1) None else Some(Seq(col("centroid_id"))))
      .select(col("vec_a"), col("vec_b"), col("centroid_id"), col("cos_sim"))
  }
}
