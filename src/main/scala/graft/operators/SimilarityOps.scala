package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Fixtures

/** Approximate-nearest-neighbor operators over the embeddings table,
  * complementing the brute-force baseline in [[LlmOps.embeddingTopKCosine]]:
  *
  *  - `embedding_near_dup`: random-hyperplane (sign) bucketing → exact
  *    cosine only within buckets — the LSH scale path for all-pairs
  *    near-duplicate detection (candidate count ∝ bucket sizes, never n²).
  *  - `embedding_ivf_topk`: IVF — assign every vector to its nearest
  *    coarse centroid, probe the query's top cells, exact-search inside.
  *
  * Hyperplanes/centroids must be identical across engines, so hyperplane
  * weights are deterministic integer arithmetic (`((i·31 + j·17) mod 13) −
  * 6`) and centroids are the first `C` vectors by id (standing in for an
  * offline k-means — the assignment/probe machinery is what's exercised).
  * Cosines are rounded to 6 decimals before any ordering so ranking is
  * stable across summation orders.
  */
object SimilarityOps {

  val NumPlanes = 8

  /** IVF centroid-count bounds for [[defaultNumCentroids]]: at least 8
    * (the historical fixed geometry — unit-test corpora pin here), at
    * most 64 (the fixture ceiling; production MaxCentroids is whatever
    * keeps the C×dim centroid artifact a driver constant — 10^5 rows ×
    * 64 dims ≈ 50 MB is still fine). */
  val MinCentroids = 8
  val MaxCentroids = 64

  /** Centroid count for a corpus of `corpusSize` vectors —
    * `clamp(MinCentroids, MaxCentroids, floor(sqrt(n)))`, the
    * [[defaultNumPlanes]] discipline applied to the IVF index (round 12;
    * closes the last fixed-geometry scale shape): with C FIXED a probe
    * reads numProbe/C of the corpus at ANY scale (25% forever at the
    * old C=8), while C ~ √n keeps expected CELL SIZE at √n — per-probe
    * cost grows sublinearly and cells stay tight enough to rank. The
    * √n rule is the standard IVF sizing (FAISS guidance: C ∈
    * [√n, 16√n]). Exactly mirrored by the generated oracles' `ivf_geo`
    * CTE (`greatest(min, least(max, floor(sqrt(count(*)))))` — IEEE
    * sqrt/floor agree bit-for-bit), so the derivation itself is
    * oracle-checked. */
  def defaultNumCentroids(corpusSize: Long): Int = {
    require(corpusSize > 0, s"defaultNumCentroids: corpusSize=$corpusSize must be positive")
    math.min(MaxCentroids,
      math.max(MinCentroids, math.floor(math.sqrt(corpusSize.toDouble)).toInt))
  }

  /** Probe-count floor and the library default for the unstaged
    * (explicit-index) call shapes. */
  val NumProbe = 2

  /** Probe count for a DECLARED centroid count `c` — `max(NumProbe,
    * c / 8)`: a fixed probe count over a growing C shrinks coverage to
    * numProbe/C, so np scales with C (but stays a small constant
    * multiple of it — per-query cost np × n/C ~ √n stays sublinear).
    * Derived from the declared C, never the surviving cell count
    * (Lloyd may drop empty cells; the oracle derives from count(*) and
    * must agree). */
  def defaultNumProbe(declaredC: Int): Int = math.max(NumProbe, declaredC / 8)

  /** Sentinel for `numProbe` parameters on the STAGED serving paths:
    * "derive from the staged index's declared geometry". */
  val DerivedProbe = 0

  /** The staged DECLARED centroid count for a corpus dir — the C that
    * [[defaultNumCentroids]] picks from the corpus count, memoized on
    * the corpus snapshot like every staged artifact. */
  private val declaredCCache = new graft.util.StampedMemo[Int]("embeddings")

  def stagedDeclaredC(spark: SparkSession, sfDir: String): Int =
    declaredCCache.get(sfDir)(
      defaultNumCentroids(Fixtures.embeddings(spark, sfDir).count()))

  private def resolveNumProbe(spark: SparkSession, sfDir: String, requested: Int): Int =
    if (requested > 0) requested
    else defaultNumProbe(stagedDeclaredC(spark, sfDir))

  /** Prototypes kept per IVF cell by [[embeddingCellPrototypes]]. */
  val ProtoK = 8

  /** Salt fan-out for the pre-prune stage of [[embeddingCellPrototypes]]
    * — sized like a shuffle-partition count in production (so each
    * (cell, salt) slice fits one task); 8 suffices to exercise the
    * two-stage shape on the fixture. */
  val ProtoSalts = 8L

  /** Plane-count bounds for [[defaultNumPlanes]]: at least 4 (16 buckets
    * — below that LSH degenerates to near-all-pairs), at most 24 (16M
    * buckets — the bucket id stays a small Long sum and recall loss from
    * over-splitting dominates past that).
    */
  val MinPlanes = 4
  val MaxPlanes = 24

  /** Bucket geometry for a corpus of `corpusSize` vectors: enough
    * hyperplanes that the MEAN bucket holds ~`targetBucket` members —
    * `ceil(log2(n / targetBucket))`, clamped to
    * [[MinPlanes]]..[[MaxPlanes]]. This is the 100 TB lever: a fixed
    * plane count overflows every bucket past [[DedupOps.MaxBucketMembers]]
    * at 100× the corpus (truncation becomes the recall failure mode),
    * while planes scaling with log(n) keep expected bucket size — and
    * therefore candidate quality — constant. Callers that need
    * cross-engine determinism (the oracle-checked keys) pin an explicit
    * count instead of deriving it from a live `count()`.
    */
  def defaultNumPlanes(corpusSize: Long,
      targetBucket: Int = DedupOps.MaxBucketMembers / 2): Int = {
    require(corpusSize > 0 && targetBucket > 0,
      s"defaultNumPlanes: corpusSize=$corpusSize targetBucket=$targetBucket must be positive")
    val planes = math.ceil(
      math.log(corpusSize.toDouble / targetBucket) / math.log(2.0)).toInt
    math.min(MaxPlanes, math.max(MinPlanes, planes))
  }

  import VectorMath.cosine

  /** Sign-bucket of every vector against `numPlanes` deterministic
    * hyperplanes: bit j = [Σ_i w(i,j)·v_i > 0], bucket = Σ bit_j · 2^j.
    * A pure per-row projection — no explode, no re-aggregation, no join:
    * the bucket column costs the scan it rides on. Dispatches to the
    * fused native [[graft.functions.LshBucket]] expression (one codegen'd
    * dim×planes loop) when a session is active; the higher-order form
    * below is the sessionless fallback and numerics reference (the
    * native expression is bit-identical — same per-plane left-to-right
    * double sums; equivalence asserted in tests).
    */
  private[graft] def bucketColumn(numPlanes: Int): Column = {
    def proj(j: Int): Column = aggregate(
      zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
        (x, i) => ((i * 31 + lit(j) * 17) % 13 - 6).cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    (0 until numPlanes)
      .map(j => when(proj(j) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  private def withBucket(emb: DataFrame, numPlanes: Int): DataFrame = {
    // registered on the DATAFRAME's session — the active session could be
    // a different one in a multi-session JVM, whose registry the analyzer
    // of this plan never consults
    graft.GraftSession.registerFunctions(emb.sparkSession)
    // the HOF reference yields 0 (not NULL) for null input — `when` over
    // a NULL projection falls through to otherwise(0) — so the native
    // NULL coalesces to 0 to stay bit-compatible
    val bucket =
      coalesce(call_function("lsh_bucket", col("embedding"), lit(numPlanes)), lit(0L))
    emb.select(col("vec_id"), col("embedding"), bucket.as("bucket"))
  }

  /** Near-duplicate candidate pairs: same sign-bucket → exact cosine →
    * global top-k pairs, on the same capped group-then-enumerate skeleton
    * as every other candidate generator ([[DedupOps.groupMembers]]): one
    * shuffle on the bucket key, members collected once (never a self-join
    * recomputing the projection pipeline per side), pair enumeration
    * in-row and bounded by [[DedupOps.MaxBucketMembers]]. The top-k is
    * TakeOrderedAndProject. `numPlanes` sets the bucket geometry — size
    * it to the corpus with [[defaultNumPlanes]].
    */
  def embeddingNearDup(emb: DataFrame, k: Int, numPlanes: Int = NumPlanes): DataFrame = {
    require(numPlanes >= 1 && numPlanes <= 62,
      s"embeddingNearDup: numPlanes $numPlanes outside 1..62 (bucket id is a Long bit-sum)")
    graft.GraftSession.registerFunctions(emb.sparkSession)
    def pairStruct(a: Column, b: Column): Column = struct(
      a.getField("vec_id").as("vec_a"),
      b.getField("vec_id").as("vec_b"),
      cosine(a.getField("embedding"), b.getField("embedding")).as("cosine"))
    DedupOps.groupMembers(withBucket(emb, numPlanes), Seq(col("bucket")),
        struct(col("vec_id"), col("embedding")), col("vec_id"),
        "embdup_bucket_overflow")
      .select(explode(DedupOps.memberPairs(col("m"), pairStruct)).as("p"))
      .select(col("p.vec_a").as("vec_a"), col("p.vec_b").as("vec_b"),
        col("p.cosine").as("cosine"))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
      .limit(k)
  }

  /** Near-duplicate CLUSTERS in embedding space — [[DedupOps.clusterPairs]]
    * (min-label connected components) over the [[embeddingNearDup]] pair
    * graph: semantic dedup's group step, electing one canonical vector
    * per near-dup component the way [[DedupOps.docDupGroups]] does for
    * lexical duplicates. Same scale story: every structure ∝ the pair
    * list, never the corpus.
    */
  def embeddingDupGroups(emb: DataFrame, k: Int, numPlanes: Int = NumPlanes): DataFrame =
    DedupOps.clusterPairs(embeddingNearDup(emb, k, numPlanes).select(col("vec_a"), col("vec_b")))
      .withColumnRenamed("id", "vec_id")

  /** Lloyd (k-means) iteration count for the staged centroid index: a
    * FIXED small n so the oracle's generated CTE chain stays bounded and
    * the refinement is deterministic end-to-end. Chosen by measured
    * fixture recall@10 of the served IVF probe vs the exact top-k
    * (see `recordIvfRecall` / PipelineOpsSpec): iterating past the
    * single seed step moves centroids to true cell means and measurably
    * improves probe recall; returns diminish within a few passes.
    * The centroid COUNT is corpus-derived ([[defaultNumCentroids]]). At
    * 100 TB k-means training runs as an offline pipeline on a sample —
    * this is that pipeline's in-engine form (per pass: one broadcast
    * assignment join + one dim-wise shuffle, both scale-safe). */
  val LloydIters = 3

  /** The first-`c`-by-id seed centroids as driver rows (c × dim
    * doubles — an index-sized collect). */
  private def lloydSeeds(emb: DataFrame, c: Int): Seq[(Long, Array[Double])] =
    emb.filter(col("vec_id") < c)
      .orderBy(col("vec_id"))
      .select(col("vec_id"),
        transform(col("embedding"), e => e.cast("double")).as("ce"))
      .collect().toSeq
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

  /** `iters` deterministic Lloyd steps from the first-`C`-by-id seed —
    * real k-means refinement: assign every vector to its max-cosine
    * centroid (lowest-cent_id tie-break), then recompute each centroid
    * as the dimension-wise mean of its cell. Means are rounded to 6
    * decimals so the refined centroids are bit-identical across engines
    * and summation orders (the same discipline as the cosines
    * themselves) — which is what keeps the iterated index ORACLE-CHECKED
    * rather than a fixed-seed stand-in. Empty cells drop in both engines
    * identically (group-by semantics).
    *
    * Scale shape (round 11 rewrite, the PQ-trainer discipline): the
    * assignment is the IN-ROW [[cellAssignExpr]] literal fold — the
    * same expression (same cosine kernel, same max-cosine/lowest-id
    * tie-break) the serving paths use, already asserted row-identical
    * to the windowed rank-1 form — so each step touches the corpus
    * once (scan → in-row argmax → dim explode → map-side-combined
    * means) instead of paying a corpus × C crossJoin plus a corpus-wide
    * rank window per step; only the C × dim refreshed centroids cross
    * the driver (the MLlib KMeans per-iteration model collect). */
  private[graft] def lloydIterateRows(emb: DataFrame,
      iters: Int): Seq[(Long, Array[Double])] = {
    require(iters >= 0, s"lloydIterateRows: iters $iters must be >= 0")
    graft.GraftSession.registerFunctions(emb.sparkSession)
    // declared C from the CORPUS COUNT (one cheap parquet-metadata job,
    // paid once per trainer run) — the corpus-scaled geometry; the
    // generated oracles derive the identical C from count(*)
    var cents = lloydSeeds(emb, defaultNumCentroids(emb.count()))
    for (_ <- 1 to iters) {
      val dims = emb
        .withColumn("cell",
          cellAssignExpr(cents.map { case (id, a) => id -> a.toSeq }))
        .select(col("cell"), posexplode(col("embedding")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(avg(col("col").cast("double")), 6).as("cx"))
        .collect()
      cents = dims.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map { case (id, rows) =>
        val arr = new Array[Double](rows.length)
        rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
        id -> arr
      }
    }
    cents
  }

  /** IVF top-k: vectors are assigned to their max-cosine centroid (rank-1
    * window over the vector×centroid broadcast join); the query probes its
    * `NumProbe` best cells and exact-searches only those. Centroids are
    * the [[lloydIterateRows]] k-means refinement of the first-`C` seed. Centroid
    * count scales as √n at 100 TB; the assignment join stays broadcast
    * (centroid table is tiny) and the probe prunes the exact search to a
    * fraction of the corpus.
    */
  /** The refined centroid table, MATERIALIZED: the plan references the
    * centroids from two consumers (corpus assignment + query probe), and
    * without materialization each reference re-executes the whole Lloyd
    * DAG — measured at 2-3× the query's cost. Collecting the model is
    * the idiomatic Spark pattern for iterative refinement (MLlib's
    * KMeans collects centers every iteration): the artifact is C×dim
    * doubles — an INDEX, not data — and re-enters the plan as a local
    * relation that broadcasts for free. This is the one deliberate
    * driver materialization in the engine, bounded by the declared C.
    */
  /** Run the refinement and collect the C×dim index rows — the one
    * shared trainer behind the staged and unstaged paths. */
  private def collectCentroids(emb: DataFrame): Seq[(Long, Array[Double])] =
    collectCentroidsIter(emb, LloydIters)

  /** [[collectCentroids]] at an explicit iteration count — the recall
    * measurement's handle on the 1-step seed baseline. */
  private[graft] def collectCentroidsIter(emb: DataFrame,
      iters: Int): Seq[(Long, Array[Double])] = {
    lloydRuns.incrementAndGet()
    lloydIterateRows(emb, iters)
  }

  private def lloydCentroids(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    collectCentroids(emb).toDF("cent_id", "ce")
  }

  /** How many times the Lloyd refinement actually EXECUTED (collected) —
    * observability for the staging cache, asserted by tests. */
  val lloydRuns = new java.util.concurrent.atomic.AtomicLong(0)

  /** The staged IVF index: [[lloydCentroids]] per embeddings TOPIC (its
    * sf dir), built once and reused by every later IVF query — the
    * "train offline, serve many" shape of a real vector index
    * ([[BucketedOps.stagedTables]] is the relational sibling). The cached
    * artifact is plain doubles (C×dim), valid across sessions — unlike a
    * catalog table there is nothing session-scoped to re-check.
    * Staleness: memo is keyed by the corpus files' (size, mtime) stamp
    * ([[graft.util.StampedMemo]]), so a corpus rewritten in place
    * rebuilds the centroids on next access; [[dropStagedCentroids]]
    * stays as the explicit flush.
    */
  private val centroidCache =
    new graft.util.StampedMemo[Seq[(Long, Array[Double])]]("embeddings")

  def dropStagedCentroids(): Unit = centroidCache.clear()

  def stagedCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    centroidCache.get(sfDir)(
      collectCentroids(Fixtures.embeddings(spark, sfDir))).toDF("cent_id", "ce")
  }

  /** The same staged index as driver data, for operators that fold the
    * centroids into IN-ROW literals ([[ivfPqTopK]]). */
  def stagedCentroidIndex(spark: SparkSession, sfDir: String): Seq[(Long, Seq[Double])] =
    centroidCache.get(sfDir)(
      collectCentroids(Fixtures.embeddings(spark, sfDir)))
      .map { case (id, a) => id -> a.toSeq }

  /** In-row IVF cell assignment against the centroid index: argmax
    * cosine with the lowest-cent_id tie-break — ONE native expression
    * ([[graft.functions.IvfKernels]]) whose centroid matrix rides into
    * generated code as a reference object. Broadcast-by-construction,
    * zero exchanges, and the exact selection the windowed rank-1 form
    * and the composable `least`-over-structs fold
    * ([[cellAssignStructFold]]) perform, so all three assignment shapes
    * agree row-for-row (asserted). Round 12: the fold form's expression
    * tree grew ∝ C under the corpus-scaled geometry and its per-query
    * plan overhead dominated the encode keys (1.3 of 1.4 s at sf0.1,
    * C=44); the kernel is O(1) plan nodes at any C. */
  private def cellAssignStruct(centroids: Seq[(Long, Seq[Double])]): Column = {
    require(centroids.nonEmpty, "cellAssignStruct: empty centroid index")
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(spark) =>
        graft.GraftSession.registerFunctions(spark)
        call_function("ivf_assign", col("embedding"),
          idsLit(centroids), centsLit(centroids))
      case None => cellAssignStructFold(centroids)
    }
  }

  /** The composable `least`-over-structs assignment fold — the numerics
    * REFERENCE the native kernel must match bit-for-bit (equivalence
    * asserted in tests; kept off the hot paths). */
  private[graft] def cellAssignStructFold(centroids: Seq[(Long, Seq[Double])]): Column = {
    require(centroids.nonEmpty, "cellAssignStructFold: empty centroid index")
    val structs = centroids.map { case (id, ce) =>
      struct(negate(cosine(col("embedding"), typedlit(ce))).as("nc"),
        lit(id).as("cid"))
    }
    // `least` rejects a single argument — a degenerate index (every
    // vector in one surviving cell, e.g. an identical-vector corpus
    // after a Lloyd step drops the empty cells) assigns trivially
    val folded = if (structs.length == 1) structs.head else least(structs: _*)
    // The native kernel nulls the whole (nc, cid) struct on a malformed
    // input (null element / dimension mismatch). Ungated, the fold
    // would instead emit a NON-null struct there (null nc sorts first
    // in struct ordering → lowest cid wins). Cosine is null exactly on
    // those inputs — and identically for every centroid, since they
    // share one dimension — so gating on the first centroid's cosine
    // makes both assignment shapes agree on malformed rows too.
    when(cosine(col("embedding"), typedlit(centroids.head._2.toSeq)).isNotNull,
      folded)
  }

  private def idsLit(centroids: Seq[(Long, Seq[Double])]): Column =
    typedLit(centroids.map(_._1))
  private def centsLit(centroids: Seq[(Long, Seq[Double])]): Column =
    typedLit(centroids.flatMap(_._2))

  private def cellAssignExpr(centroids: Seq[(Long, Seq[Double])]): Column =
    cellAssignStruct(centroids).getField("cid")

  /** The centroid VECTOR for a cell-id column — the native lookup twin
    * of [[cellAssignStruct]] (null on a foreign id, exactly like the
    * composable when-chain reference [[ceForCellChain]]). */
  private def ceForCell(centroids: Seq[(Long, Seq[Double])], cell: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(spark) =>
        graft.GraftSession.registerFunctions(spark)
        call_function("ivf_centroid", cell, idsLit(centroids), centsLit(centroids))
      case None => ceForCellChain(centroids, cell)
    }

  /** The composable when-chain centroid lookup — the reference form of
    * [[ceForCell]] (equivalence asserted in tests). */
  private[graft] def ceForCellChain(centroids: Seq[(Long, Seq[Double])], cell: Column): Column =
    centroids.tail.foldLeft(
      when(cell === centroids.head._1, typedlit(centroids.head._2))) {
      case (acc, (id, ce)) => acc.when(cell === id, typedlit(ce))
    }

  /** Element-wise residual `x − ce`: floats widen to double FIRST
    * (exact), then one IEEE subtract per dim — the oracle mirrors
    * `CAST(embedding[i] AS DOUBLE) - ce[i]` bit-for-bit. */
  private def residualOf(x: Column, ce: Column): Column =
    zip_with(x, ce, (a, b) => a.cast("double") - b)

  /** The corpus as RESIDUALS against its IVF assignment — `(vec_id,
    * embedding = x − centroid(cell), cell)`. This is the input framing
    * that makes the whole PQ stack residual (the standard FAISS IVFPQ
    * construction): the raw trainer/encoder run verbatim on this frame,
    * so most of the 4-bit code budget describes WITHIN-cell variation
    * instead of re-stating the cell centroid every member shares
    * (measured: recall@10 0.27 raw → see observed_metrics residual).
    * Pure projection: assignment and centroid lookup are literal folds,
    * zero exchanges at any corpus size. */
  private[graft] def residualFrame(emb: DataFrame,
      centroids: Seq[(Long, Seq[Double])]): DataFrame =
    emb
      .select(col("vec_id"), col("embedding"),
        cellAssignExpr(centroids).as("cell"))
      .select(col("vec_id"),
        residualOf(col("embedding"), ceForCell(centroids, col("cell")))
          .as("embedding"),
        col("cell"))

  private val ivfIndexDirs =
    new graft.util.StampedMemo[java.nio.file.Path]("embeddings")

  /** How many times the IVF index actually MATERIALIZED — staging
    * observability for tests (the `lloydRuns` sibling). */
  val ivfIndexBuilds = new java.util.concurrent.atomic.AtomicLong(0)

  /** TEST-ONLY isolation drop (the `dropStagedProbeIndexes` semantics:
    * the durable dirs delete, so the next access rebuilds). */
  def dropStagedIvfIndex(): Unit = {
    ivfIndexDirs.clear()
    graft.util.StagedArtifacts.dropDurable("ivf_idx")
  }

  /** The IVF index as a CELL-PARTITIONED materialization of the corpus:
    * `(vec_id, embedding, pq_code)` written once per corpus dir,
    * `partitionBy(cell)` — the on-disk shape a production vector index
    * actually serves from. A probe then reads `cell IN (probed)` and
    * Spark's partition pruning touches ONLY the probed cells' files
    * (asserted in PlanSpec): per-query cost scales with cells probed,
    * never corpus size, and the assignment + PQ-encode passes run ONCE
    * at index build instead of inside every query
    * ([[embeddingIvfTopK]] / [[ivfPqTopK]] keep the per-query forms as
    * the no-index-available path). One artifact serves three read
    * disciplines through column pruning: exact rescoring reads
    * `embedding` (IVF-flat), ADC ranking reads only the packed
    * `pq_code` — the 64×-smaller scan that makes 10^10 vectors fit —
    * and curation reads (cell prototypes) touch only the scalar
    * `(vec_id, ccos)` pair.
    * Staleness: (size, mtime)-stamped like every staged artifact here —
    * a corpus rewritten in place rebuilds the index on next access.
    * DURABLE (r14 verdict #2): the dir lives under the corpus-keyed
    * staged root, so a restarted JVM resolves the same index — with its
    * in-place appends — instead of rebuilding without them; the full
    * retrain bumps the generation. */
  def stagedIvfIndexDir(spark: SparkSession, sfDir: String): String =
    ivfIndexDir(spark, sfDir).toString

  private def ivfIndexDir(spark: SparkSession, sfDir: String,
      fresh: Boolean = false): java.nio.file.Path =
    graft.util.StagedArtifacts.parquetDir(sfDir, ivfIndexDirs,
      "ivf_idx", ivfIndexBuilds, Seq("cell"), freshGen = fresh) {
      graft.GraftSession.registerFunctions(spark)
      val codebook = stagedPqCodebook(spark, sfDir)
      val cents = stagedCentroidIndex(spark, sfDir)
      indexRows(Fixtures.embeddings(spark, sfDir), cents, codebook)
    }

  /** The index-row projection shared by the from-scratch build and the
    * incremental append — ONE definition of what a stored index row is:
    * `(vec_id, embedding, ccos, pq_code, cell)` with ccos = cosine to
    * the OWN centroid (negate of the assignment fold's key — exact,
    * stored so curation reads never re-score) and pq_code encoding the
    * RESIDUAL against the assigned cell's centroid (see
    * [[residualFrame]]; ADC readers reconstruct the query side per
    * probed cell). Pure projection — assignment and encode are literal
    * folds, zero exchanges at any batch size. */
  private[graft] def indexRows(emb: DataFrame, cents: Seq[(Long, Seq[Double])],
      codebook: Seq[Array[Double]]): DataFrame =
    emb
      .withColumn("b", cellAssignStruct(cents))
      // int8 companion column ([[embeddingQuantizeInt8]]'s exact
      // numerics): the 4×-smaller refine source — cosine is
      // scale-invariant, so re-ranking reads q8 alone; q8_scale rides
      // along for reconstruction/L2 readers
      .withColumn("x", transform(col("embedding"), e => e.cast("double")))
      .withColumn("mx",
        aggregate(col("x"), lit(0.0), (a, v) => greatest(a, abs(v))))
      .withColumn("q8_scale",
        when(col("mx") > 0, col("mx") / 127.0).otherwise(lit(1.0)))
      .select(col("vec_id"), col("embedding"),
        negate(col("b.nc")).as("ccos"),
        call_function("pq_enc",
          residualOf(col("embedding"), ceForCell(cents, col("b.cid"))),
          cbLit(codebook)).getField("code").as("pq_code"),
        transform(col("x"), v => round(v / col("q8_scale")).cast("tinyint"))
          .as("q8"),
        col("q8_scale"),
        col("b.cid").as("cell"))

  /** TOMBSTONE rows for the segment overlay — the deletion marker a
    * takedown/right-to-be-forgotten request ingests at INCREMENT
    * cadence (r17 verdict: before this, a deleted vector kept serving
    * until the next corpus re-stage). One row per id in `ids`
    * (`vec_id BIGINT`), schema-aligned with the live segment writer's
    * [[indexRows]]-plus-flag shape so every epoch under one root reads
    * uniformly: payload columns are typed NULLs (no reader ever
    * dereferences them — [[servedIndex]] filters tombstones before
    * projection), `deleted = true`, and `cell = -1` — a real partition
    * value no probe ever matches (a null cell would land in the Hive
    * default partition), so a pruned probe scan never lists tombstone
    * files while the un-pruned anti-join build still sees them.
    * Lifecycle: [[servedIndex]] drops the id from both union sides;
    * [[maybeCompactIndexSegments]] carries the tombstone through folds
    * (dominant over any live row); the staleness-triggered retrain /
    * corpus re-stage absorbs it — durable deletion is the corpus
    * rewrite's job, the overlay's job is the serving gap between. */
  def tombstoneSegmentRows(spark: SparkSession, sfDir: String,
      ids: DataFrame): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val template = indexRows(
      graft.model.Fixtures.embeddings(spark, sfDir).limit(0),
      stagedCentroidIndex(spark, sfDir), stagedPqCodebook(spark, sfDir))
    val payload = template.schema.fields.toSeq.filterNot(_.name == "vec_id")
    ids.select(
      col("vec_id") +:
        payload.map(f =>
          if (f.name == "cell") lit(-1L).as("cell")
          else lit(null).cast(f.dataType).as(f.name)) :+
        lit(true).as("deleted"): _*)
  }

  /** Deterministic takedown slice for the `ann_del` contract key: every
    * vec_id ≡ [[DeleteRem]] (mod [[DeleteMod]]) — SQL-expressible, so
    * the oracle is the IVF chain minus exactly these ids. */
  private[graft] val DeleteMod = 17
  private[graft] val DeleteRem = 3

  /** ANN serve WITH DELETIONS through the segment overlay — the
    * takedown contract key (`ann_del`): ingest one tombstone epoch for
    * the deterministic [[DeleteMod]]-slice, register the overlay, and
    * run the batched top-k THROUGH it ([[servedIndex]] drops the
    * tombstoned ids from base and segments alike), materializing before
    * the registration retires (the `ann_seg` lifecycle discipline).
    * Oracle-checkable because the deleted set is pure arithmetic:
    * the IVF chain with `vec_id % 17 = 3` excluded from the candidate
    * side. The registration retires by ROOT in `finally` (ADVICE r13),
    * so the key leaves no global serving state. */
  def annDeleteServe(spark: SparkSession, sfDir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_ann_del_")
    graft.util.TempDirs.track(root)
    val ids = graft.model.Fixtures.embeddings(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(DeleteMod)) === lit(DeleteRem))
      .select("vec_id")
    tombstoneSegmentRows(spark, sfDir, ids)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$root/epoch=0")
    registerIndexSegments(spark, sfDir, root.toString)
    try {
      val out = embeddingBatchTopK(spark, sfDir, QUERY_BATCH, IVF_K)
      val dir = java.nio.file.Files.createTempDirectory("graft_ann_del_out_")
      graft.util.TempDirs.track(dir)
      out.write.mode("overwrite").parquet(dir.toString)
      // declared schema (the frame just written) — skips the read-back's
      // footer-inference job (opt r20)
      spark.read.schema(out.schema).parquet(dir.toString)
    } finally dropIndexSegments(sfDir, root.toString)
  }

  /** Manifest family for the append/staleness counters — persisted per
    * (corpus dir, index dir) in the [[graft.util.ServingManifest]]
    * sidecar, so the bookkeeping survives a JVM restart and is visible
    * to a second serving JVM (r13 verdict #5). Counters key by the
    * index DIR they count into: a restarted JVM whose staged dir
    * rebuilt fresh (without the appends) correctly reads zero. */
  private val AnnAppendsFamily = "ann_appends"
  private val AnnTables = Seq("embeddings")

  /** INCREMENTAL index maintenance — the `incr_dedup` sibling for ANN,
    * and the shape a production pipeline actually runs (full retrains
    * are periodic; appends are continuous): fold a new vector batch
    * into the staged cell-partitioned index by assigning against the
    * FROZEN staged centroids and PQ-encoding with the FROZEN codebook,
    * then appending files into ONLY the touched cells' partition dirs
    * (`partitionBy(cell)` append writes nothing for untouched cells).
    * Every serving path (probe, ADC, refine, batch, stream) picks the
    * new rows up on its next pruned scan with zero changes — the index
    * contract is "rows projected by [[indexRows]] under the staged
    * artifacts", which is exactly what an append writes, so an appended
    * index is row-identical to a from-scratch rebuild of the widened
    * corpus AT THE SAME centroids+codebook (asserted in tests).
    * Scale shape: the append touches batch-sized data only — assignment
    * and encode are in-row literal folds; no shuffle, no read of the
    * existing index. A corpus rewrite still invalidates the
    * (size,mtime) stamp and forces the periodic full retrain. */
  def appendToStagedIvfIndex(spark: SparkSession, sfDir: String,
      batch: DataFrame): Unit = {
    graft.GraftSession.registerFunctions(spark)
    val dir = stagedIvfIndexDir(spark, sfDir)
    val cents = stagedCentroidIndex(spark, sfDir)
    val codebook = stagedPqCodebook(spark, sfDir)
    val n = batch.count()
    val rows = indexRows(batch, cents, codebook)
    graft.util.StagedArtifacts.noteAppend(java.nio.file.Paths.get(dir), rows)
    rows.write.mode("append").partitionBy("cell").parquet(dir)
    graft.util.ServingManifest.addCounter(sfDir, AnnAppendsFamily, AnnTables,
      dir, n)
    ()
  }

  /** Staleness gauge: the fraction of the SERVED index that entered
    * outside the full retrain — in-place appends AND registered live
    * segments, both assigned/encoded under frozen artifacts the full
    * trainer never saw. A serving tier retrains when this crosses its
    * quality budget (the recall gauges quantify the cost). */
  def ivfIndexStaleFraction(spark: SparkSession, sfDir: String): Double = {
    // arithmetic over manifest values (r14 verdict #4): base rows
    // recorded at staging, segment rows at registration, appends
    // counted as they land — no index scan, and RESOLVE, never build
    // (the text/media gauge discipline): a monitoring read on a host
    // that never staged the index must not pay Lloyd + PQ + the index
    // write just to report. Un-staged base with live segments = 100%
    // stale (everything served would come from segments).
    val segRows = registeredSegmentRows(sfDir)
    ivfIndexDirs.peek(sfDir)
      .orElse(graft.util.StagedArtifacts.resolveExisting(
        sfDir, ivfIndexDirs, "ivf_idx")) match {
      case None => if (segRows > 0) 1.0 else 0.0
      case Some(dir) =>
        val appended = graft.util.ServingManifest
          .getCounter(sfDir, AnnAppendsFamily, AnnTables, dir.toString)
        val stale = segRows + appended
        if (stale == 0) 0.0
        else stale.toDouble /
          (graft.util.StagedArtifacts.stagedBaseRows(sfDir, ivfIndexDirs, dir)
            + appended + segRows).toDouble
    }
  }

  /** Live streaming segment root registered for serving, per corpus dir
    * — the union side of the LSM: [[servedIndex]] = base index ∪ these
    * segments. One root per corpus (a root holds every epoch's
    * cell-partitioned segment dir); re-registration replaces, so a
    * restarted ingestion stream swaps its whole segment set atomically.
    * This map is only the fast path: the registration of record lives
    * in the [[graft.util.ServingManifest]] sidecar, so a restarted JVM
    * serves the same base ∪ segments view (r13 verdict #5). */
  private val liveSegmentRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val SegmentsFamily = "ann_segments"

  /** Publish an ingestion stream's segment root into the serve path:
    * every subsequent index read ([[embeddingIvfTopKIndexed]],
    * `ann_batch`, `stream_ann`, ADC, refine, prototypes) sees base ∪
    * segments with no retrain — in THIS JVM (the in-memory fast path)
    * and, through the persisted manifest, in any JVM serving the same
    * corpus after a restart. [[maybeRetrainStagedIndex]] retires the
    * registration when compaction folds the corpus snapshot back into
    * the base. */
  def registerIndexSegments(spark: SparkSession, sfDir: String,
      segRoot: String): Unit = {
    // a re-registration of the SAME root (checkpointed stream restart)
    // first completes any fold the dead JVM journaled mid-swap, so the
    // registration count below sees the full row set (r17 verdict #3)
    recoverInterruptedSegmentFold(spark, sfDir, segRoot)
    foldRecoveryChecked.add(segRoot)
    // a fresh registration writes a manifest entry without the "epochs"
    // gauge — drop the skip cache so the next maintenance turn re-seeds it
    epochGaugeCache.remove(segRoot)
    liveSegmentRoots.put(sfDir, segRoot)
    // segment rows counted ONCE at registration (footer metadata) and
    // persisted next to the root, so the staleness gauge is arithmetic
    // — a monitoring read never scans the segments. The count needs no
    // payload columns, so a minimal declared schema (vec_id + the two
    // partition keys) skips the footer-inference job a bare read pays
    // per registration (opt r20); row count is schema-independent.
    val n = spark.read.schema(
      org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id BIGINT, cell BIGINT, epoch BIGINT"))
      .parquet(segRoot).count()
    graft.util.ServingManifest.put(sfDir, SegmentsFamily, AnnTables,
      Map("segRoot" -> segRoot, "segRows" -> n.toString))
  }

  /** Bump a REGISTERED segment root's row count after a post-
    * registration epoch append — conditional on `segRoot` still being
    * the registration of record AND `epochId` being newer than the
    * registration's high-water mark, in ONE manifest lock
    * ([[graft.util.ServingManifest.addCounterIfNewEpoch]]). Without the
    * bump, a continuous ingestion stream that registers its root early
    * and keeps appending epochs grows the overlay while
    * [[ivfIndexStaleFraction]] sits frozen at the registration-time
    * count (ADVICE r15); without the epoch guard, a replayed epoch's
    * idempotent sink overwrite would double-count its rows. No-ops
    * (false) before registration, after retirement, or on replay, so
    * callers can emit it unconditionally per epoch. */
  def noteSegmentAppend(sfDir: String, segRoot: String, rows: Long,
      epochId: Long): Boolean =
    graft.util.ServingManifest.addCounterIfNewEpoch(sfDir, SegmentsFamily,
      AnnTables, "segRoot", segRoot, "segRows", rows, "lastEpoch", epochId)

  /** The registered segment root's row count, from the manifest — 0
    * with no live registration. */
  private def registeredSegmentRows(sfDir: String): Long =
    registeredSegmentRoot(sfDir) match {
      case None => 0L
      case Some(_) => graft.util.ServingManifest
        .get(sfDir, SegmentsFamily, AnnTables)
        .get("segRows").map(_.toLong).getOrElse(0L)
    }

  /** The segment root currently serving for `sfDir`, if any: the
    * in-memory registration, else the manifest's — provided its files
    * still exist (a dead JVM's retired temp dir is ignored and the
    * stale manifest entry dropped: self-healing). A manifest hit
    * re-warms the in-memory fast path. */
  private[graft] def registeredSegmentRoot(sfDir: String): Option[String] =
    Option(liveSegmentRoots.get(sfDir)).orElse {
      val fromManifest = graft.util.ServingManifest
        .get(sfDir, SegmentsFamily, AnnTables).get("segRoot")
      fromManifest match {
        case Some(r) if java.nio.file.Files.isDirectory(java.nio.file.Paths.get(r)) =>
          liveSegmentRoots.put(sfDir, r)
          Some(r)
        case Some(_) =>
          graft.util.ServingManifest.remove(sfDir, SegmentsFamily)
          None
        case None => None
      }
    }

  def dropIndexSegments(sfDir: String): Unit = {
    liveSegmentRoots.remove(sfDir)
    graft.util.ServingManifest.remove(sfDir, SegmentsFamily)
  }

  /** Retire ONLY the registration for `segRoot` — a key that published
    * its own segments drops exactly those, never a registration some
    * other serve path installed after it (ADVICE r13). The persisted
    * side is a compare-and-delete under ONE manifest lock
    * ([[graft.util.ServingManifest.removeIf]]): the r14 get-then-remove
    * took two locks, so a registration installed by a second JVM
    * between them was wrongly deleted (r14 verdict #1). */
  def dropIndexSegments(sfDir: String, segRoot: String): Unit = {
    liveSegmentRoots.remove(sfDir, segRoot)
    // segRows rides in the SAME conditional write: a second removal
    // step under its own lock could delete a registration another JVM
    // installed between the two (the race class removeIf exists for)
    graft.util.ServingManifest.removeIf(sfDir, SegmentsFamily, AnnTables,
      "segRoot", segRoot,
      alsoRemove = Seq("segRows", "lastEpoch", "epochs"))
    ()
  }

  /** Drop the in-memory segment fast path WITHOUT touching the
    * persisted manifest — test-only: simulates a JVM restart so the
    * restart-durability spec can assert the manifest alone restores
    * serving. */
  private[graft] def forgetSegmentRegistrations(): Unit =
    liveSegmentRoots.clear()

  /** Epoch-count trigger at which [[maybeCompactIndexSegments]] folds
    * (the [[graft.operators.DedupOps.XmCompactEpochs]] sibling). */
  val AnnCompactEpochs = 8

  /** INTRA-OVERLAY MINOR COMPACTION for the ANN segment overlay — the
    * LSM step between per-epoch segment appends and the staleness-
    * triggered full retrain ([[maybeRetrainStagedIndex]], which it does
    * not replace): when the segment root has accumulated more than
    * `maxEpochs` epoch dirs, fold every epoch EXCEPT the newest into ONE
    * cell-partitioned segment dir (newest epoch wins per `vec_id` —
    * under the ingestion contract each vector arrives in exactly one
    * epoch, so the collapse is row-identical to the folded union; a
    * re-ingested vector, if one ever appeared, serves only its newest
    * row after the fold, which is the LSM intent) published at the
    * highest folded epoch id, one file per cell instead of one segment
    * tree per micro-batch. The newest epoch stays out of the fold for
    * the same replay reason as the cluster compactor. Also the per-call
    * EPOCH GAUGE (`ann.segment_epochs` + the registration's `epochs`
    * manifest key), recorded whether or not a fold runs.
    *
    * SWAP DISCIPLINE (vs
    * [[graft.operators.DedupOps.maybeCompactClusterDeltas]]'s
    * journal-free dominance argument): [[servedIndex]] consumes
    * segments as a plain UNION — partition pruning must keep reaching
    * both cell-partitioned scans, so there is no read-side newest-wins
    * collapse to make duplicate or missing rows self-healing, and the
    * fold MUST drop the source dirs before renaming the collapsed
    * scratch in (publishing first would serve every folded row twice).
    * The drop→publish window is therefore closed by a JOURNAL (r17
    * verdict #3): before the first drop, the fold intent — scratch dir
    * name, the epoch ids to drop, the publish target — is written into
    * the registration's manifest entry under the existing lock; the
    * post-fold measurement write retires the journal in the same
    * atomic update ([[graft.util.ServingManifest.setAndClearIf]]). A
    * crash anywhere between leaves the journal live, and the next
    * maintenance turn or [[registerIndexSegments]] call completes the
    * interrupted fold ([[recoverInterruptedSegmentFold]]) BEFORE
    * anything reads or sweeps the overlay — the folded rows are never
    * lost and the missing-rows window ends at the next writer entry,
    * not at the next retrain. Single-writer precondition: the caller
    * is the ingestion stream's own maintenance turn (foreachBatch),
    * serialized with the epoch writes. */
  def maybeCompactIndexSegments(spark: SparkSession, sfDir: String,
      segRoot: String, maxEpochs: Int = AnnCompactEpochs): Boolean = {
    // recovery check ONCE per root per JVM (steady state stays
    // lock-free): a journal can only appear when a fold is interrupted,
    // and an interrupted fold in THIS JVM threw — the catch below
    // re-arms the check, and a restarted JVM re-checks through
    // registerIndexSegments or its own first maintenance turn
    if (foldRecoveryChecked.add(segRoot))
      recoverInterruptedSegmentFold(spark, sfDir, segRoot)
    val epochs = graft.util.EpochDirs.list(segRoot)
    graft.ObservedMetrics.recordGauge("ann.segment_epochs", epochs.size.toDouble)
    // manifest epoch gauge only when the count CHANGED (r17 verdict
    // #3): the un-triggered maintenance turn of every micro-batch must
    // not serialize an OS-file-locked read-modify-write into the
    // stream — the in-memory last-written cache makes the steady state
    // lock-free (one write per count change, one after JVM restart)
    val prevGauge = epochGaugeCache.put(segRoot, epochs.size)
    if (prevGauge == null || prevGauge.intValue != epochs.size)
      graft.util.ServingManifest.setIf(sfDir, SegmentsFamily, AnnTables,
        "segRoot", segRoot, Map("epochs" -> epochs.size.toString))
    if (epochs.size <= maxEpochs || epochs.size < 3) false
    else try {
      // any .compact_* here is pre-journal garbage (a journaled scratch
      // was consumed by the recovery pass above)
      graft.util.EpochDirs.sweepScratch(segRoot)
      val newest = epochs.last
      val foldMax = epochs(epochs.size - 2)
      // mergeSchema: the servedIndex discipline — a tombstone epoch may
      // be the only one carrying the `deleted` column
      val segs = spark.read.option("mergeSchema", "true").parquet(segRoot)
      // cast the exclusion literal to the INFERRED partition type:
      // small epoch values infer INT, and a Long literal against an Int
      // partition attribute inserts a widening cast that defeats
      // pruning (the servedClusterAssignment BIGINT-declaration lesson)
      val folded = segs.filter(
        col("epoch") =!= lit(newest).cast(segs.schema("epoch").dataType))
      val dataCols = segs.schema.fieldNames.toSeq
        .filterNot(n => n == "vec_id" || n == "epoch")
      // TOMBSTONE DOMINANCE in the collapse (terminal-delete): a
      // deleted row wins over any live row regardless of epoch order —
      // folding (tombstone@e1, live@e2) down to the newest-by-epoch
      // live row would resurrect the vector the pre-fold read excluded.
      // Among rows with the same flag, newest epoch wins as before.
      val ordKey =
        if (segs.columns.contains("deleted"))
          struct(coalesce(col("deleted"), lit(false)).cast("int").as("d"),
            col("epoch").as("e"))
        else struct(lit(0).as("d"), col("epoch").as("e"))
      val collapsed = folded.groupBy("vec_id")
        .agg(max_by(struct(dataCols.map(col): _*), ordKey).as("s"))
        .select(col("vec_id") +: dataCols.map(n => col(s"s.$n").as(n)): _*)
      val scratch = graft.util.EpochDirs.scratch(segRoot)
      // repartition by cell → one task owns each cell → one file per
      // cell: the file-consolidation the fold exists for (a long stream
      // writes a whole small-file segment tree per micro-batch)
      collapsed.repartition(col("cell"))
        .write.partitionBy("cell").parquet(scratch.toString)
      val toDrop = epochs.dropRight(1)
      // JOURNAL the intent BEFORE the first drop — from here to the
      // journal's retirement, a crash is recoverable from the manifest.
      // An unregistered/swapped-out root can't journal (the conditional
      // write no-ops) — but nothing serves such a root through the
      // manifest either; the fold proceeds with the pre-journal window
      // as its (unreachable-by-serving) caveat — OBSERVED, not silent
      // (ADVICE r18): the unjournaled fold logs and bumps a gauge, so a
      // crash-loses-rows window that somehow became reachable shows up
      // in the operator log instead of only in a comment.
      val journaled = graft.util.ServingManifest.setIf(sfDir, SegmentsFamily,
        AnnTables, "segRoot", segRoot,
        Map(FoldScratchKey -> scratch.getFileName.toString,
          FoldDropKey -> toDrop.mkString(","),
          FoldMaxKey -> foldMax.toString))
      if (!journaled) {
        System.err.println(s"[annfold] $segRoot is not the registered " +
          "segment root — fold proceeds UNJOURNALED (a crash between " +
          "drop and publish would lose this root's folded rows)")
        graft.ObservedMetrics.bumpGauge("ann.unjournaled_folds")
      }
      toDrop.foreach(e => graft.util.EpochDirs.drop(segRoot, e))
      foldCrashpoint("afterDrop")
      graft.util.EpochDirs.publish(scratch, segRoot, foldMax)
      foldCrashpoint("afterPublish")
      finishSegmentFold(spark, sfDir, segRoot)
      graft.ObservedMetrics.bumpGauge("ann.segment_folds")
      true
    } catch { case t: Throwable =>
      // the fold may have journaled and died mid-swap — re-arm the
      // once-per-JVM recovery check so the NEXT entry repairs it
      foldRecoveryChecked.remove(segRoot)
      throw t
    }
  }

  /** Roots whose fold journal this JVM has already checked — the
    * steady-state skip that keeps the per-micro-batch maintenance turn
    * free of manifest lock traffic. */
  private val foldRecoveryChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** TEST-ONLY failpoint inside the fold's journaled swap window,
    * invoked with the stage just completed ("afterDrop" = sources
    * dropped, collapsed scratch not yet published; "afterPublish" =
    * published, journal not yet retired). The crash-point spec throws
    * from here to exercise [[recoverInterruptedSegmentFold]] against
    * the exact states a killed writer leaves; production never
    * reassigns it. */
  private[graft] var foldCrashpoint: String => Unit = _ => ()

  /** Fold-intent journal keys, living inside the registration's own
    * manifest entry (same lock, same conditional-on-`segRoot`
    * lifetime): present exactly while a fold's drop→publish swap is in
    * flight. */
  private val FoldScratchKey = "foldScratch"
  private val FoldDropKey = "foldDrop"
  private val FoldMaxKey = "foldMax"

  /** Complete an INTERRUPTED segment fold journaled by a dead writer —
    * called at every maintenance-turn entry and at
    * [[registerIndexSegments]], i.e. before the next epoch write, sweep
    * or registration count can observe the half-swapped overlay. Three
    * journal states: (1) scratch dir still present → the publish never
    * happened: re-drop the journaled source epochs (idempotent — some
    * may already be gone) and publish the scratch at the journaled
    * target, exactly the steps the dead writer had left; (2) scratch
    * gone → the publish completed and only the journal retirement was
    * lost: nothing to move; (3) no journal → no-op (the overwhelmingly
    * common path: one manifest read). States 1-2 end with the same
    * atomic measurement-update-plus-journal-retirement the uncrashed
    * fold uses. Returns whether a journaled fold was completed. */
  private[graft] def recoverInterruptedSegmentFold(spark: SparkSession,
      sfDir: String, segRoot: String): Boolean = {
    val m = graft.util.ServingManifest.get(sfDir, SegmentsFamily, AnnTables)
    if (!m.get("segRoot").contains(segRoot)) false
    else (m.get(FoldScratchKey), m.get(FoldDropKey), m.get(FoldMaxKey)) match {
      case (Some(scr), Some(dropList), Some(fm)) =>
        val scratch = java.nio.file.Paths.get(segRoot, scr)
        if (java.nio.file.Files.isDirectory(scratch)) {
          dropList.split(",").filter(_.nonEmpty)
            .foreach(e => graft.util.EpochDirs.drop(segRoot, e.toLong))
          graft.util.EpochDirs.publish(scratch, segRoot, fm.toLong)
        }
        finishSegmentFold(spark, sfDir, segRoot)
        true
      case _ => false
    }
  }

  /** The fold's closing write, shared by the uncrashed path and the
    * recovery path: re-measure the overlay and retire the journal in
    * ONE conditional manifest update. The row recount is the
    * AUTHORITATIVE physical figure, deliberately a fresh
    * metadata-footer count over the collapsed overlay rather than an
    * arithmetic carry (ADVICE r17): under the disjoint-ingestion
    * contract it equals the pre-fold counter, and whenever that
    * contract is ever violated (a re-ingested vec_id, a lost epoch the
    * journal replayed) the physical count is the one that keeps the
    * staleness gauge honest — the fold is the natural re-sync point and
    * runs at epoch cadence, so the extra footer-metadata job is
    * amortized across `AnnCompactEpochs` micro-batches. */
  private def finishSegmentFold(spark: SparkSession, sfDir: String,
      segRoot: String): Unit = {
    // minimal declared schema: the recount reads no payload columns
    // (the registerIndexSegments discipline, opt r20)
    val total = spark.read.schema(
      org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id BIGINT, cell BIGINT, epoch BIGINT"))
      .parquet(segRoot).count()
    val nEpochs = graft.util.EpochDirs.list(segRoot).size
    epochGaugeCache.put(segRoot, nEpochs)
    graft.util.ServingManifest.setAndClearIf(sfDir, SegmentsFamily, AnnTables,
      "segRoot", segRoot,
      Map("segRows" -> total.toString, "epochs" -> nEpochs.toString),
      Seq(FoldScratchKey, FoldDropKey, FoldMaxKey))
    ()
  }

  /** Last epoch count written to the manifest per segment root — the
    * steady-state skip for the per-micro-batch gauge write (r17 verdict
    * #3). Int boxing via the map's Integer values; `put` returns null
    * on first sight, which != any count, forcing the one post-restart
    * write. */
  private val epochGaugeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** The index every serve path reads: the staged base ∪ the registered
    * live segments — the LSM read view that makes freshly ingested
    * vectors visible BEFORE any retrain. Newest wins: a base row whose
    * vec_id reappears in a segment is anti-joined away (an update that
    * moved a vector to a new cell serves only the new row). DELETION
    * (r17 verdict #2's missing pipeline operator): a segment epoch may
    * carry TOMBSTONE rows (`deleted = true`, written by
    * [[tombstoneSegmentRows]]) — a tombstoned vec_id is dropped from
    * BOTH sides of the union: its base row anti-joins away exactly like
    * an update's, and its segment rows (the tombstone itself AND any
    * live segment row from an earlier ingestion epoch) are excluded
    * from the union side. Deletion is TERMINAL at increment cadence —
    * a tombstoned id stays out regardless of epoch order until the
    * corpus re-stage rewrites the base without it (takedown semantics:
    * un-deleting requires the rewrite, not a race between epochs).
    * Scale shape: the probe's cell filter pushes through the union into
    * BOTH cell-partitioned scans (partition pruning holds — asserted in
    * PlanSpec), and the anti-join build sides are segment vec_ids /
    * tombstone vec_ids only (the small, recently-ingested slice by LSM
    * design; compaction bounds it). With no registered segments this is
    * exactly the base read — zero plan change; with no tombstones the
    * live filter is a nullable-column predicate on the segment scan and
    * the tombstone anti-join never builds (columns.contains guard). */
  private[graft] def servedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val base = graft.util.StagedArtifacts.readStaged(spark,
      java.nio.file.Paths.get(stagedIvfIndexDir(spark, sfDir)))
    registeredSegmentRoot(sfDir) match {
      case None => base
      case Some(root) =>
        // mergeSchema: a root whose early epochs predate the `deleted`
        // column (or whose only tombstone epoch introduces it) must
        // read the union schema deterministically, not a random footer
        val raw = spark.read.option("mergeSchema", "true").parquet(root)
        val hasTomb = raw.columns.contains("deleted")
        // live = non-tombstone rows of vec_ids with NO tombstone
        // anywhere in the overlay (terminal-delete collapse without a
        // read-side shuffle: tombstone ids are a bounded broadcast)
        val live =
          if (!hasTomb) raw
          else {
            val tombIds = raw
              .filter(coalesce(col("deleted"), lit(false)))
              .select("vec_id")
            raw.filter(!coalesce(col("deleted"), lit(false)))
              .join(broadcast(tombIds), Seq("vec_id"), "left_anti")
          }
        // project to the base read schema: drop the epoch partition
        // column and the tombstone flag, align inferred partition types
        val segs = live.select(
          base.schema.fields.toSeq
            .map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
        // the anti-join shadows base rows by ALL segment ids — updates
        // AND tombstones (raw, not live: a deleted id must drop its
        // base row even though nothing replaces it)
        base.join(raw.select("vec_id"), Seq("vec_id"), "left_anti")
          .unionByName(segs)
    }
  }

  /** IVF top-k served FROM the staged cell-partitioned index: probe the
    * query's [[NumProbe]] best cells (an O(C) driver job against the
    * staged centroids), then exact-rescore only those cells' members —
    * read with partition pruning, so the scan's input is the probed
    * partitions' files, nothing else. Row-identical to
    * [[embeddingIvfTopK]] over the same centroid index (asserted in
    * tests): same assignment tie-break, same cosine expression, same
    * (cosine desc, vec_id) ranking. */
  def embeddingIvfTopKIndexed(spark: SparkSession, sfDir: String,
      queryId: Long, k: Int, numProbe: Int = DerivedProbe): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val np = resolveNumProbe(spark, sfDir, numProbe)
    import spark.implicits._
    val centroids = stagedCentroidIndex(spark, sfDir)
    val centDf = centroids.toDF("cent_id", "ce")
    val qdf = Fixtures.embeddings(spark, sfDir)
      .filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    val probeCells = centDf.crossJoin(broadcast(qdf))
      .select(col("cent_id"), cosine(col("ce"), col("qe")).as("ccos"))
      .orderBy(col("ccos").desc, col("cent_id")).limit(np)
      .collect().map(_.getLong(0)).toSeq
    servedIndex(spark, sfDir)
      .filter(col("cell").isin(probeCells: _*))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qdf))
      .select(col("vec_id"), cosine(col("embedding"), col("qe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF+PQ served FROM the staged index: probe cells, then ADC-rank the
    * probed partitions' PRECOMPUTED codes — the scan reads only
    * `(vec_id, pq_code)` (column pruning drops the embedding array;
    * asserted in PlanSpec), which is the 64×-smaller read a production
    * IVFPQ index exists for. Row-identical to the per-query
    * [[ivfPqTopK]] over the same staged artifacts (asserted in tests):
    * same probe, same codes, same ADC lookup. */
  def ivfPqTopKIndexed(spark: SparkSession, sfDir: String,
      queryId: Long, k: Int, numProbe: Int = DerivedProbe): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val np = resolveNumProbe(spark, sfDir, numProbe)
    import spark.implicits._
    val codebook = stagedPqCodebook(spark, sfDir)
    val cents = stagedCentroidIndex(spark, sfDir)
    val centDf = cents.toDF("cent_id", "ce")
    val qdf = Fixtures.embeddings(spark, sfDir)
      .filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    val probeCells = centDf.crossJoin(broadcast(qdf))
      .select(col("cent_id"), cosine(col("ce"), col("qe")).as("ccos"))
      .orderBy(col("ccos").desc, col("cent_id")).limit(np)
      .collect().map(_.getLong(0)).toSeq
    servedIndex(spark, sfDir)
      .filter(col("cell").isin(probeCells: _*))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qdf))
      .select(col("vec_id"),
        // stored codes are residuals: the ADC table is built per probed
        // cell from the QUERY's residual against that cell's centroid
        // (partition-column `cell` reads back INT — cast for the lookup)
        call_function("pq_adc",
          residualOf(col("qe"), ceForCell(cents, col("cell").cast("long"))),
          col("pq_code"), cbLit(codebook)).as("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(k)
  }

  /** Exact-rescore shortlist size, as a multiple of k (FAISS
    * `IndexRefineFlat`'s `k_factor`): the refined path ADC-ranks the
    * probed codes, keeps the best `RefineFactor × k`, and re-ranks only
    * those by true cosine. A serving CONSTANT — at 10^10 vectors the
    * refine stage still touches 50 full vectors per query while the ADC
    * stage scans codes 32× smaller than the raw embeddings. Round 12:
    * 5 → 3, funded by PQ8x8's higher ADC recall (the shortlist needs
    * less slack when the quantized ranking is already close). */
  val RefineFactor = 3

  /** Default refine SOURCE (round 13): the stored int8 codes. Cosine is
    * scale-invariant, so raw `q8` ranks without dequantizing, the fetch
    * per refined row is 4× smaller than the float vectors, and the
    * measured recall cost is ZERO — the int8 gauge equals the float
    * gauge exactly at both fixture scales
    * (`ann.ivfpq_refine_recall_at10[_int8]`: 0.44/0.44 at sf0.001,
    * 0.56/0.56 at sf0.1). Returned cosines are computed over the
    * quantized candidate (ranking-grade, within int8 rounding of
    * exact); pass `refineInt8 = false` for the exact-cosine source. */
  val RefineFromInt8 = true

  /** The re-rank expression both refined serves share: cosine of the
    * query against the chosen refine source. */
  private def rerankCosine(refineInt8: Boolean) =
    if (refineInt8)
      cosine(transform(col("q8"), v => v.cast("double")), col("qe"))
    else cosine(col("embedding"), col("qe"))

  /** IVF+PQ with exact re-ranking — the production two-stage read
    * (FAISS refine / ScaNN reorder): stage 1 ADC-ranks the probed
    * cells' PRECOMPUTED codes exactly as [[ivfPqTopKIndexed]] (the scan
    * reads `(vec_id, pq_code)` only); stage 2 takes the `refine × k`
    * shortlist (a bounded TakeOrdered), joins it back against the SAME
    * probed partitions to fetch just those rows' full vectors, and
    * emits the true-cosine top-k. Closes the quantization gap at a cost
    * that stays constant in corpus size: measured recall@10 at the
    * fixture geometry ≈ the IVF-flat ceiling (the ADC misrankings PQ's
    * 4-bit budget causes all sit inside the shortlist), while the full
    * vectors read per query stay `refine × k` regardless of scale. The
    * output schema is [[embeddingIvfTopKIndexed]]'s `(vec_id, cosine)`
    * — a drop-in higher-recall serve of the same contract. */
  def ivfPqTopKRefinedIndexed(spark: SparkSession, sfDir: String,
      queryId: Long, k: Int, numProbe: Int = DerivedProbe,
      refine: Int = RefineFactor,
      refineInt8: Boolean = RefineFromInt8): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val np = resolveNumProbe(spark, sfDir, numProbe)
    import spark.implicits._
    val codebook = stagedPqCodebook(spark, sfDir)
    val cents = stagedCentroidIndex(spark, sfDir)
    val centDf = cents.toDF("cent_id", "ce")
    val qdf = Fixtures.embeddings(spark, sfDir)
      .filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    val probeCells = centDf.crossJoin(broadcast(qdf))
      .select(col("cent_id"), cosine(col("ce"), col("qe")).as("ccos"))
      .orderBy(col("ccos").desc, col("cent_id")).limit(np)
      .collect().map(_.getLong(0)).toSeq
    val index = servedIndex(spark, sfDir)
      .filter(col("cell").isin(probeCells: _*))
      .filter(col("vec_id") =!= queryId)
    val shortlist = index
      .crossJoin(broadcast(qdf))
      .select(col("vec_id"),
        call_function("pq_adc",
          residualOf(col("qe"), ceForCell(cents, col("cell").cast("long"))),
          col("pq_code"), cbLit(codebook)).as("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(refine * k)
      .select("vec_id")
    index
      .join(broadcast(shortlist), "vec_id")
      .crossJoin(broadcast(qdf))
      .select(col("vec_id"), rerankCosine(refineInt8).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** BATCHED ANN serving from the staged index — the offline shape that
    * actually amortizes a vector index (near-dup versus an index,
    * retrieval-pair mining): ONE pruned scan answers a whole bounded
    * query batch. Probe staging is a |Q|×C engine-cosine job collected
    * to a driver artifact (bounded: a serving batch times the centroid
    * count — the single-query precedent, widened), so the serving plan
    * is: partition-pruned index scan → broadcast hash join against the
    * (qid, qe, cell) probe set → in-row cosine → per-query top-k as a
    * rank window (map-side pre-pruned by WindowGroupLimit; |Q| bounded,
    * so the per-qid keying never collapses parallelism the way a
    * corpus-cardinality window would). Per query, rows are identical to
    * [[embeddingIvfTopK]] (asserted in tests). */
  def embeddingBatchTopK(spark: SparkSession, sfDir: String,
      queryIds: Seq[Long], k: Int, numProbe: Int = DerivedProbe): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val np = resolveNumProbe(spark, sfDir, numProbe)
    require(queryIds.nonEmpty, "embeddingBatchTopK needs a non-empty query batch")
    val (probes, cells) = stagedBatchProbes(spark, sfDir, queryIds, np)
    val byRank = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    servedIndex(spark, sfDir)
      .filter(col("cell").isin(cells: _*))
      .join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("embedding"), col("qe")).as("cosine"))
      .withColumn("rnk", row_number().over(byRank).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** The staged (qid, qe, cell) probe set for a bounded query batch —
    * the |Q|×C engine-cosine job collected to a driver artifact that
    * every batched serve shares (flat cosine, ADC, refined). A repeated
    * id must not rank twice (duplicate probe rows would put the same
    * candidate at two ranks), so ids distinct here; ids absent from the
    * corpus have no vector to probe with and drop out. */
  private def stagedBatchProbes(spark: SparkSession, sfDir: String,
      queryIds: Seq[Long], np: Int): (DataFrame, Seq[Long]) = {
    import spark.implicits._
    val ids = queryIds.distinct
    val centDf = stagedCentroidIndex(spark, sfDir).toDF("cent_id", "ce")
    val queries = Fixtures.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val byQ = Window.partitionBy("qid").orderBy(col("ccos").desc, col("cent_id"))
    val probeRows = queries.crossJoin(broadcast(centDf))
      .select(col("qid"), col("qe"), col("cent_id"),
        cosine(col("ce"), col("qe")).as("ccos"))
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= np)
      .select(col("qid"), col("qe"), col("cent_id").as("cell"))
      .collect()
    val probes = probeRows.toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getLong(2)))
      .toDF("qid", "qe", "cell")
    (probes, probeRows.map(_.getLong(2)).distinct.toSeq)
  }

  /** BATCHED IVF+PQ (ADC) serving from the staged index — the
    * compressed-read sibling of [[embeddingBatchTopK]], completing the
    * batch family (flat / ADC / refined): one partition-pruned scan of
    * `(vec_id, pq_code, cell)` ADC-ranks the whole query batch, per-row
    * lookup tables built from each probe's residual against its cell's
    * centroid. Per query, rows are identical to [[ivfPqTopKIndexed]]
    * (asserted in tests): same probe staging, same codes, same
    * (adist asc, vec_id) ranking. The nprobe-sweep recall gauges ride
    * this — O(gauges) jobs instead of O(gauges × queries). */
  def ivfPqBatchTopK(spark: SparkSession, sfDir: String,
      queryIds: Seq[Long], k: Int, numProbe: Int = DerivedProbe): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val np = resolveNumProbe(spark, sfDir, numProbe)
    require(queryIds.nonEmpty, "ivfPqBatchTopK needs a non-empty query batch")
    val codebook = stagedPqCodebook(spark, sfDir)
    val cents = stagedCentroidIndex(spark, sfDir)
    val (probes, cells) = stagedBatchProbes(spark, sfDir, queryIds, np)
    val byRank = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
    servedIndex(spark, sfDir)
      .filter(col("cell").isin(cells: _*))
      .join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        call_function("pq_adc",
          residualOf(col("qe"), ceForCell(cents, col("cell").cast("long"))),
          col("pq_code"), cbLit(codebook)).as("adist"))
      .withColumn("rnk", row_number().over(byRank).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** [[embeddingBatchTopK]] through the COMPRESSED two-stage read — the
    * batch form of [[ivfPqTopKRefinedIndexed]]: stage 1 ADC-ranks the
    * probed cells' precomputed codes per query (the scan reads
    * `(vec_id, pq_code, cell)` — the 64×-smaller read) and keeps each
    * query's `refine × k` shortlist via a rank window; stage 2 joins
    * the bounded shortlist back against the same probed partitions for
    * just those rows' full vectors and emits the true-cosine top-k.
    * Per query, rows are identical to [[ivfPqTopKRefinedIndexed]]
    * (asserted in tests); the output schema is
    * [[embeddingBatchTopK]]'s `(qid, vec_id, cosine, rnk)`. At 10^10
    * vectors this is the serving shape that makes a large batch cheap:
    * the full-vector read per query stays `refine × k` regardless of
    * corpus or batch size, and everything else rides the compressed
    * codes. */
  def embeddingBatchTopKRefined(spark: SparkSession, sfDir: String,
      queryIds: Seq[Long], k: Int, numProbe: Int = DerivedProbe,
      refine: Int = RefineFactor,
      refineInt8: Boolean = RefineFromInt8): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val np = resolveNumProbe(spark, sfDir, numProbe)
    require(queryIds.nonEmpty, "embeddingBatchTopKRefined needs a non-empty query batch")
    import spark.implicits._
    val codebook = stagedPqCodebook(spark, sfDir)
    val cents = stagedCentroidIndex(spark, sfDir)
    val ids = queryIds.distinct
    val centDf = cents.toDF("cent_id", "ce")
    val queries = Fixtures.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val byQ = Window.partitionBy("qid").orderBy(col("ccos").desc, col("cent_id"))
    val probeRows = queries.crossJoin(broadcast(centDf))
      .select(col("qid"), col("qe"), col("cent_id"),
        cosine(col("ce"), col("qe")).as("ccos"))
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= np)
      .select(col("qid"), col("qe"), col("cent_id").as("cell"))
      .collect()
    val probes = probeRows.toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getLong(2)))
      .toDF("qid", "qe", "cell")
    val cells = probeRows.map(_.getLong(2)).distinct.toSeq
    val index = servedIndex(spark, sfDir)
      .filter(col("cell").isin(cells: _*))
    val byAdc = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
    val shortlist = index
      .join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        call_function("pq_adc",
          residualOf(col("qe"), ceForCell(cents, col("cell").cast("long"))),
          col("pq_code"), cbLit(codebook)).as("adist"))
      .withColumn("srn", row_number().over(byAdc))
      .filter(col("srn") <= refine * k)
      .select(col("qid"), col("vec_id"))
    val byRank = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    index
      .join(broadcast(shortlist), "vec_id")
      .join(broadcast(probes.select("qid", "qe").distinct()), "qid")
      .select(col("qid"), col("vec_id"),
        rerankCosine(refineInt8).as("cosine"))
      .withColumn("rnk", row_number().over(byRank).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** [[embeddingBatchTopKRefined]] for UNBOUNDED query batches — the
    * refined twin of [[embeddingBatchTopKFrame]]: ids, query vectors,
    * probe rows, the per-query ADC shortlist, and the exact re-rank all
    * stay DataFrames end-to-end (join strategy left to AQE), so nothing
    * batch-sized ever crosses the driver; the one collect is the
    * distinct probed-cell list (bounded by the centroid count) that
    * drives partition pruning. Row-identical per query to
    * [[ivfPqTopKRefinedIndexed]] (asserted in tests). */
  def embeddingBatchTopKRefinedFrame(spark: SparkSession, sfDir: String,
      queryIds: DataFrame, k: Int, numProbe: Int = DerivedProbe,
      refine: Int = RefineFactor,
      refineInt8: Boolean = RefineFromInt8): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val np = resolveNumProbe(spark, sfDir, numProbe)
    import spark.implicits._
    val codebook = stagedPqCodebook(spark, sfDir)
    val cents = stagedCentroidIndex(spark, sfDir)
    val centDf = cents.toDF("cent_id", "ce")
    val ids = queryIds
      .select(col(queryIds.columns.head).cast("long").as("qid")).distinct()
    val queries = Fixtures.embeddings(spark, sfDir)
      .join(ids, col("vec_id") === col("qid"))
      .select(col("qid"), col("embedding").as("qe"))
    val byQ = Window.partitionBy("qid").orderBy(col("ccos").desc, col("cent_id"))
    val probes = queries.crossJoin(broadcast(centDf))
      .select(col("qid"), col("qe"), col("cent_id"),
        cosine(col("ce"), col("qe")).as("ccos"))
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= np)
      .select(col("qid"), col("qe"), col("cent_id").as("cell"))
    val cells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val index = servedIndex(spark, sfDir)
      .filter(col("cell").isin(cells: _*))
    val byAdc = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
    val shortlist = index
      .join(probes, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        call_function("pq_adc",
          residualOf(col("qe"), ceForCell(cents, col("cell").cast("long"))),
          col("pq_code"), cbLit(codebook)).as("adist"))
      .withColumn("srn", row_number().over(byAdc))
      .filter(col("srn") <= refine * k)
      .select(col("qid"), col("vec_id"))
    val byRank = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    index
      .join(shortlist, "vec_id")
      .join(queries, "qid")
      .select(col("qid"), col("vec_id"),
        rerankCosine(refineInt8).as("cosine"))
      .withColumn("rnk", row_number().over(byRank).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** Per-micro-batch admission bound for driver-staged ANN probe lists
    * ([[embeddingBatchTopK]]'s collect): past this many query ids the
    * id list no longer counts as a bounded serving batch and callers
    * must route through [[embeddingBatchTopKFrame]], which never ships
    * ids to the driver. 64 ids × NumProbe cells × (id, vector) rows is
    * a few KB of probe artifact — comfortably a driver constant. */
  val MaxDriverProbeIds = 64

  /** How many batches served through the JOIN-based (no driver id list)
    * path — observability for the admission-cap tests. */
  val annJoinServes = new java.util.concurrent.atomic.AtomicLong(0)

  /** [[embeddingBatchTopK]] for UNBOUNDED query batches: the ids stay a
    * DataFrame end-to-end — dedup by `distinct`, query vectors by inner
    * join (ids absent from the corpus drop out, as in the collect form),
    * probe rows per query by the same rank window — so nothing
    * batch-sized ever crosses the driver. The one collect left is the
    * DISTINCT PROBED CELLS list (bounded by the centroid count, an
    * index-sized constant) that drives partition pruning on the staged
    * index scan. Join strategy is left to AQE: a small probe set still
    * broadcasts at runtime; an oversized one shuffles instead of
    * OOM-ing the driver — exactly the degradation a serving tier wants.
    * Row-identical to [[embeddingBatchTopK]] on the same ids (asserted
    * in tests). */
  def embeddingBatchTopKFrame(spark: SparkSession, sfDir: String,
      queryIds: DataFrame, k: Int, numProbe: Int = DerivedProbe): DataFrame = {
    graft.GraftSession.registerFunctions(spark)
    val np = resolveNumProbe(spark, sfDir, numProbe)
    annJoinServes.incrementAndGet()
    import spark.implicits._
    val centDf = stagedCentroidIndex(spark, sfDir).toDF("cent_id", "ce")
    val ids = queryIds
      .select(col(queryIds.columns.head).cast("long").as("qid")).distinct()
    val queries = Fixtures.embeddings(spark, sfDir)
      .join(ids, col("vec_id") === col("qid"))
      .select(col("qid"), col("embedding").as("qe"))
    val byQ = Window.partitionBy("qid").orderBy(col("ccos").desc, col("cent_id"))
    val probes = queries.crossJoin(broadcast(centDf))
      .select(col("qid"), col("qe"), col("cent_id"),
        cosine(col("ce"), col("qe")).as("ccos"))
      .withColumn("rn", row_number().over(byQ))
      .filter(col("rn") <= np)
      .select(col("qid"), col("qe"), col("cent_id").as("cell"))
    val cells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val byRank = Window.partitionBy("qid").orderBy(col("cosine").desc, col("vec_id"))
    servedIndex(spark, sfDir)
      .filter(col("cell").isin(cells: _*))
      .join(probes, "cell")
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        cosine(col("embedding"), col("qe")).as("cosine"))
      .withColumn("rnk", row_number().over(byRank).cast("int"))
      .filter(col("rnk") <= k)
  }

  def embeddingIvfTopK(emb: DataFrame, queryId: Long, k: Int,
      index: Option[DataFrame] = None, numProbe: Int = NumProbe): DataFrame = {
    graft.GraftSession.registerFunctions(emb.sparkSession)
    val centroids = index.getOrElse(lloydCentroids(emb))
    val scored = emb
      .crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        cosine(col("embedding"), col("ce")).as("ccos"))
    val byVec = Window.partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id"))
    val assigned = scored
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    val queryCells = scored.filter(col("vec_id") === queryId)
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") <= numProbe)
      .select(col("cent_id").as("cell"))
    val query = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    assigned
      .join(broadcast(queryCells), "cell")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(query))
      .select(col("vec_id"), cosine(col("embedding"), col("qe")).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-cell prototype election — the curation read of an IVF index
    * (SemDeDup/prototype-sampling family): within each cell keep the `p`
    * vectors most cosine-similar to their centroid. Prototypes seed
    * semantic stratified sampling, per-cluster labeling, and the
    * "representative exemplars" audits an embedding pipeline ships next
    * to the index.
    *
    * Scale shape, in order: (1) centroid scoring is a broadcast of the
    * bounded staged index; (2) per-vector argmax runs as `min_by` — a
    * partial-combinable AGGREGATE, not a window, so the C-per-vector
    * scored rows collapse map-side before the one vec_id exchange (the
    * window form would shuffle C× corpus rows); (3) the per-cell top-p
    * is TWO-STAGE — rank within (cell, md5-salt of vec_id) first, keep ≤
    * p, then rank the ≤ cells × salts × p survivors per cell — because a
    * single per-cell window keys the whole corpus into |cells|
    * partitions, the classic low-cardinality-window parallelism collapse
    * at 10^10 vectors. The salted pre-prune is semantics-free: a global
    * top-p row ranks ≤ p inside any subset containing it (ties total-
    * ordered by vec_id), so stage 2 sees every survivor. Only scalars
    * (vec_id, cell, ccos) cross either exchange; embeddings never leave
    * stage 1.
    */
  def embeddingCellPrototypes(emb: DataFrame, p: Int = ProtoK,
      index: Option[DataFrame] = None): DataFrame = {
    graft.GraftSession.registerFunctions(emb.sparkSession)
    val centroids = index.getOrElse(lloydCentroids(emb))
    val best = struct(col("cent_id"), col("ccos"))
    val byScore = struct(negate(col("ccos")), col("cent_id"))
    val assigned = emb.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("cent_id"),
        cosine(col("embedding"), col("ce")).as("ccos"))
      .groupBy("vec_id")
      .agg(min_by(best, byScore).as("b"))
      .select(col("vec_id"), col("b.cent_id").as("cell"), col("b.ccos").as("ccos"))
    protoRank(assigned, p)
  }

  /** The two-stage salted top-p election over an `(vec_id, cell, ccos)`
    * assignment (see [[embeddingCellPrototypes]] for why two stages). */
  private def protoRank(assigned: DataFrame, p: Int): DataFrame = {
    val pre = Window
      .partitionBy(col("cell"), Hashing.md5Bucket(col("vec_id"), ProtoSalts))
      .orderBy(col("ccos").desc, col("vec_id"))
    val fin = Window.partitionBy(col("cell"))
      .orderBy(col("ccos").desc, col("vec_id"))
    assigned
      .withColumn("pr", row_number().over(pre)).filter(col("pr") <= p).drop("pr")
      .withColumn("proto_rank", row_number().over(fin))
      .filter(col("proto_rank") <= p)
  }

  /** [[embeddingCellPrototypes]] served FROM the staged index: the
    * assignment (cell + own-centroid cosine) was stored at build, so the
    * election reads only the scalar `(vec_id, ccos)` columns + the
    * `cell` partition key — no embedding bytes, no centroid scoring, no
    * assignment aggregate; just the two bounded windows over scalars.
    * Row-identical to the self-assigning form (asserted in tests). */
  def embeddingCellPrototypesIndexed(spark: SparkSession, sfDir: String,
      p: Int = ProtoK): DataFrame =
    protoRank(
      servedIndex(spark, sfDir)
        // partition-column type inference reads `cell` back as INT (the
        // values fit); the self-assigning form emits BIGINT from cent_id
        // — cast so both serving shapes return the SAME schema, not just
        // the same values
        .select(col("vec_id"), col("cell").cast("long").as("cell"), col("ccos")),
      p)

  /** Symmetric per-vector int8 quantization — the storage-compression
    * step of an embedding index (4× memory vs float32; what an IVF cell
    * or HNSW layer actually holds at 10^10 vectors): `scale = max|x|/127`,
    * `q_i = round(x_i / scale)` ∈ [-127, 127], plus the per-vector
    * reconstruction MSE so a pipeline can gate on quantization loss.
    *
    * A pure per-row projection — zero shuffle at any corpus size.
    * Numerics discipline: elements are widened float→double FIRST (exact),
    * every subsequent op is double IEEE arithmetic identical in DuckDB
    * (max is order-free; the MSE fold is a SEQUENTIAL left fold in both
    * engines — `aggregate` here, `list_reduce` in the oracle — because a
    * reduction-tree sum of doubles would differ in final ulps).
    * round() is half-away-from-zero in both engines; a max-magnitude
    * element maps to exactly ±127, so no clamp is needed. Zero vectors
    * take scale = 1 and quantize to all-zeros with MSE 0.
    */
  def embeddingQuantizeInt8(emb: DataFrame): DataFrame =
    emb
      .select(col("vec_id"),
        transform(col("embedding"), e => e.cast("double")).as("x"))
      .withColumn("mx", aggregate(col("x"), lit(0.0), (a, v) => greatest(a, abs(v))))
      .withColumn("scale", when(col("mx") > 0, col("mx") / 127.0).otherwise(lit(1.0)))
      .withColumn("qvec", transform(col("x"), v => round(v / col("scale")).cast("int")))
      .withColumn("mse",
        aggregate(
          zip_with(col("x"), col("qvec"), (a, q) => {
            val d = a - q * col("scale"); d * d
          }),
          lit(0.0), (acc, v) => acc + v) / size(col("x")))
      .select(col("vec_id"), col("scale"), col("qvec"), col("mse"))

  // ---------------------------------------------------------------------
  // Product quantization (PQ) — the fine-grained half of the standard
  // coarse(IVF) + fine(PQ) + compressed(int8) ANN index stack
  // ---------------------------------------------------------------------

  /** PQ geometry: 8 subspaces × 256 codes, 8-bit codes (the FAISS
    * default code width), so a 64-dim float vector compresses to one
    * 64-bit code — 32× smaller than float32. Round 12 doubled the
    * subspace count from 4 (which round 11 had widened from the
    * original 8×16/4-bit shape): ADC-only recall at the 32-bit budget
    * sat well under the IVF-flat ceiling, forcing RefineFactor=5; the
    * doubled bit budget funds dropping the refine shortlist to 3×k
    * with the refined serve still gauging ≥ the r11 0.55 ceiling
    * (measured 0.56 at sf0.1's derived geometry). The ADC-ONLY gap to
    * the flat probe closes fully only at small corpora (0.39 vs 0.44
    * at sf0.001); at sf0.1 the residual ranking saturates near 0.37 at
    * any nprobe — precise top-10 ordering among 2000 near-unit vectors
    * needs more than 8 bits/subspace, which is exactly why the
    * production read is the refined two-stage serve, not ADC alone.
    * The asymmetric-distance lookup stays
    * bounded (8×256 entries); subspace 7 packs into the BIGINT's sign
    * byte (exact two's-complement wrap, mirrored by the oracle's
    * HUGEINT sum — see [[graft.functions.PqKernels]]). */
  val PqSubspaces: Int = graft.functions.PqKernels.Subs
  val PqCodes: Int = graft.functions.PqKernels.Codes
  val PqCodeBits: Int = graft.functions.PqKernels.CodeBits
  val PqSubDim = 8

  /** PQ-codebook Lloyd iteration count — the per-SUBSPACE k-means twin
    * of [[LloydIters]]. Real product quantization trains 256 centroids
    * per 8-dim subspace; iteration count chosen by measured fixture
    * recall of the ADC ranking (see PipelineOpsSpec). */
  val PqIters = 3

  /** The seed codebook as driver rows: the first-[[PqCodes]] vectors by
    * id, cyclically extended when the corpus is smaller (code `c` takes
    * seed row `c mod m`; the kernels require exactly [[PqCodes]] rows).
    * For any corpus with ≥[[PqCodes]] dense ids this IS `vec_id <
    * PqCodes` — the text the oracle derivation keeps. Cyclic duplicates
    * alone would equal an m-row codebook only through the FIRST Lloyd
    * step (argmin's first-min keeps the lowest code; once step 1 moves
    * centroid r, a stale duplicate at r+m could win later argmins) —
    * so [[trainPqCodebook]] RE-MIRRORS codes ≥ m onto their base code
    * after every step, keeping training on an m-row corpus exactly the
    * m-row training cyclically extended, at every iteration count.
    * Bounded collect: ≤ PqCodes × dim doubles. */
  private def pqSeedRows(x: DataFrame): Array[Array[Double]] = {
    val base = x.filter(col("vec_id") < PqCodes)
      .orderBy(col("vec_id")).select(col("x"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(base.nonEmpty, "pqSeedRows: corpus has no seed rows (vec_id < PqCodes)")
    Array.tabulate(PqCodes)(c => base(c % base.length).clone())
  }

  /** REAL per-subspace k-means PQ training (`iters` rounded Lloyd steps
    * from the first-[[PqCodes]] seed), producing the `PqCodes × dim`
    * row shape the native kernels and oracles consume: row c = concat
    * over subspaces of that subspace's centroid c. `iters = 0`
    * reproduces the untrained seed codebook bit-for-bit (asserted).
    *
    * Scale shape (round 11 rewrite): the assignment step IS the
    * [[graft.functions.PqEnc]] kernel — one in-row native argmin pass
    * per vector against the current codebook LITERAL (identical
    * numerics to the former `min_by` form: same sequential fold, same
    * strict-< lowest-code ties, kernel-vs-HOF equivalence-tested) —
    * replacing a corpus × (Codes·Subs) interpreted crossJoin that
    * cost 31 s at 5 000 vectors and would be 10¹⁰ rows at 10⁷. Per
    * step the corpus is touched once (scan → kernel → dim explode →
    * map-side-combined mean), and the only driver traffic is the
    * refreshed codebook itself (the MLlib KMeans per-iteration model
    * collect — an INDEX, bounded by design). Means round to 6 decimals
    * (the cross-engine determinism discipline); a cell with no members
    * keeps its previous centroid (codes are positional in the packed
    * id — they cannot drop the way empty IVF cells do). */
  private[graft] def trainPqCodebook(emb: DataFrame, iters: Int): Seq[Array[Double]] = {
    require(iters >= 0, s"trainPqCodebook: iters $iters must be >= 0")
    graft.GraftSession.registerFunctions(emb.sparkSession)
    val x = emb.select(col("vec_id"),
      transform(col("embedding"), e => e.cast("double")).as("x"))
    var cb = pqSeedRows(x)
    // distinct seed width: a sub-PqCodes corpus seeds cyclically and the
    // duplicates must TRACK their base code through training (see
    // pqSeedRows); full-width corpora make the mirroring a no-op
    val baseLen = math.min(
      x.filter(col("vec_id") < PqCodes).count().toInt, PqCodes)
    val dim = cb(0).length
    val subDim = dim / PqSubspaces
    for (_ <- 1 to iters) {
      val dims = x
        .select(col("x"),
          call_function("pq_enc", col("x"), cbLit(cb.toSeq))
            .getField("code").as("code"))
        .select(col("x"),
          explode(sequence(lit(0), lit(PqSubspaces - 1))).as("sub"), col("code"))
        .select(col("sub"),
          expr(s"shiftright(code, sub * $PqCodeBits) & ${PqCodes - 1}").as("c"),
          col("x"))
        .withColumn("j", explode(sequence(lit(1), lit(subDim))))
        .select(col("sub"), col("c"), col("j"),
          element_at(col("x"), (col("sub") * subDim + col("j")).cast("int")).as("cx"))
        .groupBy("sub", "c", "j")
        .agg(round(avg(col("cx")), 6).as("cx"))
        .collect()
      val next = cb.map(_.clone())
      dims.foreach { r =>
        val sub = r.getAs[Int]("sub")
        val c = r.getAs[Long]("c").toInt
        val j = r.getAs[Int]("j")
        next(c)(sub * subDim + j - 1) = r.getAs[Double]("cx")
      }
      // re-mirror cyclic duplicates onto their base code: first-min
      // argmin routes every assignment to codes < baseLen, so only base
      // codes ever receive cell means — copying them out keeps the
      // extended book a faithful cyclic image after EVERY step
      var c = baseLen
      while (c < PqCodes) { next(c) = next(c % baseLen).clone(); c += 1 }
      cb = next
    }
    cb.toSeq
  }

  /** The staged PQ codebook for an embeddings topic: [[PqIters]] rounds
    * of per-subspace k-means over the corpus (see [[trainPqCodebook]]),
    * trained once per corpus snapshot and reused — the offline-training
    * shape, exactly as [[lloydIterateRows]] trains the IVF centroids; the
    * oracle re-derives the identical codebook from the table through a
    * generated CTE chain. The artifact is PqCodes×dim doubles — an
    * INDEX, bounded by design. */
  private val pqCodebookCache =
    new graft.util.StampedMemo[Seq[Array[Double]]]("embeddings")

  def stagedPqCodebook(spark: SparkSession, sfDir: String): Seq[Array[Double]] =
    pqCodebookCache.get(sfDir)(
      // RESIDUAL training (round 11): the codebook quantizes
      // `x − centroid(cell)` — see [[residualFrame]]
      trainPqCodebook(
        residualFrame(Fixtures.embeddings(spark, sfDir),
          stagedCentroidIndex(spark, sfDir)),
        PqIters))

  def dropStagedPqCodebook(): Unit = pqCodebookCache.clear()

  /** Squared L2 between subspace `s` of the (double-widened) vector
    * column and a codebook row's same subspace, as a SEQUENTIAL left
    * fold over the 8 dims. Deliberately UNROUNDED: the oracle mirrors
    * the identical fold (`list_reduce` over the same index order), so
    * the doubles agree bit-for-bit — and round-6 would INTRODUCE
    * divergence, not remove it, because the engines' round()
    * implementations disagree on near-midpoint doubles (caught at
    * sf0.1: a final-mse midpoint flipped 0.011478 vs 0.011479). The
    * cosine keys round because their group-by sums are order-dependent;
    * these folds are not. */
  private def pqSubDist(x: Column, cbRow: Array[Double], s: Int): Column = {
    // sub-dimension derives from the codebook row (dim / 8), exactly as
    // the native kernel derives it from the data — PqSubDim is only the
    // FIXTURE's instance of it (64/8, what the oracle SQL hardcodes)
    val subDim = cbRow.length / PqSubspaces
    val sub = array(cbRow.slice(s * subDim, (s + 1) * subDim).toIndexedSeq.map(lit): _*)
    aggregate(
      zip_with(slice(x, s * subDim + 1, subDim), sub, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
  }

  /** [[ivfPqTopK]] taking the centroid index as a DataFrame (the
    * [[embeddingIvfTopK]]-style call shape). Delegates to the
    * literal-fold implementation below — ONE serving path, two call
    * shapes; the index is a bounded staged artifact (declared-C
    * rows), so collecting it to literals is the same driver-side cost
    * `stagedCentroidIndex` already pays. Cell-assignment tie-breaks
    * (highest cosine, then lowest cent_id) are identical by
    * construction, which `PipelineOpsSpec` asserts across both shapes. */
  def ivfPqTopK(emb: DataFrame, queryId: Long, k: Int,
      // no `= None` default here: only ONE overload may carry defaults
      // (the literal-fold form below owns them, for its numProbe knob)
      index: Option[DataFrame],
      codebook: Seq[Array[Double]]): DataFrame = {
    val cents = index.getOrElse(lloydCentroids(emb)).collect().toSeq
      // by NAME on both fields: a caller-supplied index frame with
      // reordered/extra columns must resolve or error, never silently
      // read the wrong column as the centroid vector
      .map(r => r.getAs[Long]("cent_id") -> r.getSeq[Double](r.fieldIndex("ce")))
    ivfPqTopK(emb, codebook, cents, queryId, k)
  }

  /** The flattened `[code][dim]` codebook literal both kernels take. */
  private def cbLit(codebook: Seq[Array[Double]]): Column = {
    require(codebook.length == PqCodes, s"PQ codebook needs $PqCodes rows")
    typedLit(codebook.flatMap(_.toSeq))
  }

  /** PQ-encode every vector against a staged codebook: per subspace,
    * the argmin-distance code (ties → lowest code), packed into one
    * BIGINT (4 bits per subspace), plus the reconstruction MSE for
    * quality gating.
    *
    * A PURE PROJECTION — zero shuffle, zero join: encoding 10^10
    * vectors is map-only, the shape PQ must have at scale (the codebook
    * rides into the plan as one literal, embedded as a primitive array
    * reference in generated code). Dispatches to the native fused
    * [[graft.functions.PqEnc]] kernel — one code-resident dim×codes
    * loop; [[pqEncodeRef]] is the bit-identical higher-order reference
    * form the equivalence tests hold it to. Compare
    * [[embeddingQuantizeInt8]]: same scale story, finer-grained codes.
    */
  def pqEncode(emb: DataFrame, codebook: Seq[Array[Double]]): DataFrame = {
    graft.GraftSession.registerFunctions(emb.sparkSession)
    emb
      .select(col("vec_id"), col("embedding"),
        call_function("pq_enc", col("embedding"), cbLit(codebook)).as("k"))
      .select(col("vec_id"),
        col("k.code").as("pq_code"),
        (col("k.mse") / size(col("embedding"))).as("mse"))
  }

  /** [[pqEncode]] over the RESIDUAL framing — the serving encode
    * (contract key `pq_enc`): codes quantize `x − centroid(cell)`, so
    * `mse` is the residual reconstruction error (what IVFPQ actually
    * loses). Delegation keeps ONE encode numerics: the raw kernel runs
    * verbatim on the residual frame. Still a pure projection — the
    * assignment and centroid lookup are literal folds. */
  def pqEncodeResidual(emb: DataFrame, codebook: Seq[Array[Double]],
      centroids: Seq[(Long, Seq[Double])]): DataFrame =
    pqEncode(residualFrame(emb, centroids), codebook)

  /** Flat-PQ top-k over RESIDUAL codes (contract key `pq_topk`): every
    * vector is ranked by ADC against the query's residual RELATIVE TO
    * THAT VECTOR'S OWN CELL — i.e. IVFPQ with every cell probed. Scale
    * shape unchanged from [[pqTopK]]: encode is a pure projection, the
    * query rides one 1-row broadcast, the per-cell query residual is an
    * in-row literal fold, and the top-k is TakeOrdered — zero corpus
    * shuffles. */
  def pqTopKResidual(emb: DataFrame, codebook: Seq[Array[Double]],
      centroids: Seq[(Long, Seq[Double])], queryId: Long, k: Int): DataFrame = {
    graft.GraftSession.registerFunctions(emb.sparkSession)
    val query = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    val rf = residualFrame(emb, centroids)
    rf.select(col("vec_id"), col("cell"),
        call_function("pq_enc", col("embedding"), cbLit(codebook)).as("k"))
      .select(col("vec_id"), col("cell"),
        col("k.code").as("pq_code"))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(query))
      .select(col("vec_id"),
        call_function("pq_adc",
          residualOf(col("qe"), ceForCell(centroids, col("cell"))),
          col("pq_code"), cbLit(codebook)).as("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(k)
  }

  /** Higher-order reference form of [[pqEncode]] — the numerics spec the
    * native kernel is equivalence-tested against (`array_position`
    * first-match ≡ the kernel's strict-< first-min argmin). */
  private[graft] def pqEncodeRef(emb: DataFrame, codebook: Seq[Array[Double]]): DataFrame = {
    require(codebook.length == PqCodes, s"pqEncodeRef: codebook needs $PqCodes rows")
    val x = transform(col("embedding"), e => e.cast("double"))
    val perSub = (0 until PqSubspaces).map { s =>
      val dists = array((0 until PqCodes).map(c => pqSubDist(x, codebook(c), s)): _*)
      val md = array_min(dists)
      val code = (array_position(dists, md) - 1).cast("long")
      (code, md)
    }
    // shiftleft, not multiply: subspace 7 occupies the sign byte, and
    // under ANSI mode a Long multiply overflow THROWS while shifts wrap
    // silently — the wrap is the intended two's-complement packing
    val pqCode = perSub.zipWithIndex
      .map { case ((code, _), s) => shiftleft(code, PqCodeBits * s) }
      .reduce(_ + _)
    val mse = perSub.map(_._2).reduce(_ + _) / lit(64.0)
    emb.select(col("vec_id"), pqCode.as("pq_code"), mse.as("mse"))
  }

  /** PQ top-k via asymmetric distance computation (ADC): the query stays
    * uncompressed; each database vector's distance is approximated by
    * summing, per subspace, the query↔codebook-entry distance of the
    * vector's stored code. The lookup runs in the native
    * [[graft.functions.PqAdc]] kernel over the broadcast query row and
    * the literal codebook — so the search is encode (pure projection) +
    * one broadcast join + TakeOrdered: no shuffle of the corpus at any
    * scale. [[pqTopKRef]] is the higher-order reference form. */
  def pqTopK(emb: DataFrame, codebook: Seq[Array[Double]], queryId: Long, k: Int): DataFrame = {
    graft.GraftSession.registerFunctions(emb.sparkSession)
    val query = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"))
    pqEncode(emb, codebook)
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(query))
      .select(col("vec_id"),
        call_function("pq_adc", col("qe"), col("pq_code"), cbLit(codebook)).as("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(k)
  }

  /** Higher-order reference form of [[pqTopK]] for the equivalence
    * tests. */
  /** The composed IVF+PQ query path — what a production ANN index
    * actually executes per query (the FAISS `IVFPQ` shape): coarse-probe
    * the query's [[NumProbe]] best cells, then rank ONLY those cells'
    * members by PQ asymmetric distance. Composes the two staged
    * artifacts this engine already maintains (Lloyd centroids, PQ
    * codebook).
    *
    * Scale shape — ZERO corpus exchanges: the cell assignment is an
    * IN-ROW argmax against the centroid LITERALS (`least` over
    * (−cosine, id) structs — broadcast-by-construction, like the
    * classifier weights), the probe-cell set is a driver artifact from
    * an 8-row job (computed with the SAME engine cosine expression, so
    * no third numerics implementation exists), the PQ code forms in-row,
    * and the ADC ranking is a TakeOrdered behind a 1-row query
    * broadcast. Every per-vector byte stays in its scan task: the whole
    * read path is scan → project → filter → top-k.
    */
  def ivfPqTopK(emb: DataFrame, codebook: Seq[Array[Double]],
      centroids: Seq[(Long, Seq[Double])], queryId: Long, k: Int,
      numProbe: Int = NumProbe): DataFrame = {
    graft.GraftSession.registerFunctions(emb.sparkSession)
    require(centroids.nonEmpty, "ivfPqTopK needs a non-empty centroid index")
    import emb.sparkSession.implicits._
    val centDf = centroids.toDF("cent_id", "ce")
    val qdf = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    val probeCells = centDf.crossJoin(broadcast(qdf))
      .select(col("cent_id"), cosine(col("ce"), col("qe")).as("ccos"))
      .orderBy(col("ccos").desc, col("cent_id")).limit(numProbe)
      .collect().map(_.getLong(0)).toSeq
    val query = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= queryId)
      .withColumn("cell", cellAssignExpr(centroids))
      .filter(col("cell").isin(probeCells: _*))
      .crossJoin(broadcast(query))
      .select(col("vec_id"),
        // RESIDUAL ADC (round 11): both sides quantize against the
        // member's cell centroid — in-row encode of the member residual,
        // per-cell residual of the broadcast query
        call_function("pq_adc",
          residualOf(col("qe"), ceForCell(centroids, col("cell"))),
          call_function("pq_enc",
            residualOf(col("embedding"), ceForCell(centroids, col("cell"))),
            cbLit(codebook)).getField("code"),
          cbLit(codebook)).as("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(k)
  }

  private[graft] def pqTopKRef(emb: DataFrame, codebook: Seq[Array[Double]],
      queryId: Long, k: Int): DataFrame = {
    val query = emb.filter(col("vec_id") === queryId)
      .select(transform(col("embedding"), e => e.cast("double")).as("qe"))
    val adist = (0 until PqSubspaces).map { s =>
      val qdists = array((0 until PqCodes).map(c => pqSubDist(col("qe"), codebook(c), s)): _*)
      val code = shiftright(col("pq_code"), PqCodeBits * s)
        .bitwiseAND(lit(PqCodes - 1L))
      element_at(qdists, code.cast("int") + 1)
    }.reduce(_ + _)
    pqEncodeRef(emb, codebook)
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(query))
      .select(col("vec_id"), adist.as("adist"))
      .orderBy(col("adist"), col("vec_id"))
      .limit(k)
  }

  /** Scalar-columns projection of [[embeddingQuantizeInt8]] for the
    * driver contract: the harness comparator sorts result rows in pandas
    * and cannot factorize array-typed cells (round-7 gate failure), so
    * the contract key digests `qvec` into an md5 over its comma-joined
    * elements plus its element sum — together a content-equality witness
    * — while library callers keep the array-returning operator above.
    * Int→string rendering and the md5 hex digest are engine-identical
    * (oracle mirrors with `array_to_string`/`list_sum`).
    */
  def embeddingQuantizeInt8Scalar(emb: DataFrame): DataFrame =
    embeddingQuantizeInt8(emb).select(
      col("vec_id"), col("scale"),
      md5(array_join(transform(col("qvec"), v => v.cast("string")), ",")
        .cast("binary")).as("qvec_md5"),
      aggregate(col("qvec"), lit(0L), (a, v) => a + v).as("qvec_sum"),
      col("mse"))

  // ---------------------------------------------------------------------
  // Driver-contract wiring
  // ---------------------------------------------------------------------

  private val NEAR_DUP_K = 20
  private[graft] val IVF_K = 10
  private val QUERY_VEC = 0L

  /** Query batch for the batched-ANN contract key: ids spread across the
    * corpus so the probed cell sets differ between queries. */
  private[graft] val QUERY_BATCH = Seq(0L, 7L, 13L)

  /** Query ids for the recall gauges: 20 ids spread across the fixture
    * (recall granularity 1/200 at k=10, vs 1/30 on the 3-id contract
    * batch). */
  private[graft] val RecallIds: Seq[Long] = (0 until 20).map(_ * 7L)

  /** Fixture recall@k of the served IVF probe against the exact
    * brute-force top-k ([[LlmOps.embeddingTopKCosine]]): the index
    * QUALITY readout that pairs with the hash-checked correctness keys
    * (those prove the probe computes exactly what it declares; this
    * measures how much of the true neighborhood the declared probe
    * covers). All comparisons run over bounded top-k driver artifacts.
    */
  def ivfRecallAtK(spark: SparkSession, sfDir: String,
      ids: Seq[Long] = RecallIds, k: Int = IVF_K,
      iters: Int = LloydIters, numProbe: Int = DerivedProbe): Double = {
    import spark.implicits._
    val np = resolveNumProbe(spark, sfDir, numProbe)
    // staged-geometry gauges ride the BATCHED serve — one plan for the
    // whole query set instead of one job per query (spec-locked
    // row-identical per query to the per-query probe), which is what
    // keeps the nprobe sweep's 13 gauges O(gauges) jobs, not
    // O(gauges × queries). Custom-iteration baselines (the 1-step/seed
    // comparisons) train their own centroids and keep the per-query
    // path.
    if (iters == LloydIters)
      batchRecall(ids, k, q => exactTopKIds(spark, sfDir, q, k),
        embeddingBatchTopK(spark, sfDir, ids, k, np))
    else {
      val emb = Fixtures.embeddings(spark, sfDir)
      val centDf = centsFor(spark, sfDir, iters).toDF("cent_id", "ce")
      avgOverlap(ids, k,
        q => exactTopKIds(spark, sfDir, q, k),
        q => embeddingIvfTopK(emb, q, k, index = Some(centDf), numProbe = np))
    }
  }

  /** Fixture recall@k of the composed IVF+PQ (ADC) ranking vs the exact
    * top-k — the end-to-end quality of the compressed serving path. */
  def ivfPqRecallAtK(spark: SparkSession, sfDir: String,
      ids: Seq[Long] = RecallIds, k: Int = IVF_K,
      iters: Int = LloydIters, numProbe: Int = DerivedProbe): Double = {
    val np = resolveNumProbe(spark, sfDir, numProbe)
    // staged-geometry gauges ride the batched ADC serve (per query
    // row-identical to the per-query path — the staged index contract);
    // custom-iteration baselines keep the per-query on-the-fly form
    if (iters == LloydIters)
      batchRecall(ids, k, q => exactTopKIds(spark, sfDir, q, k),
        ivfPqBatchTopK(spark, sfDir, ids, k, np))
    else {
      val emb = Fixtures.embeddings(spark, sfDir)
      val cb = stagedPqCodebook(spark, sfDir)
      val cents = centsFor(spark, sfDir, iters)
      avgOverlap(ids, k,
        q => exactTopKIds(spark, sfDir, q, k),
        q => ivfPqTopK(emb, cb, cents, q, k, np))
    }
  }

  /** Fixture recall@k of the REFINED two-stage serve (ADC shortlist →
    * exact re-rank) vs the exact top-k. */
  def ivfPqRefineRecallAtK(spark: SparkSession, sfDir: String,
      ids: Seq[Long] = RecallIds, k: Int = IVF_K,
      numProbe: Int = DerivedProbe, refineInt8: Boolean = false): Double =
    // batched two-stage serve — per query row-identical to
    // ivfPqTopKRefinedIndexed (asserted in tests), one plan per gauge
    batchRecall(ids, k, q => exactTopKIds(spark, sfDir, q, k),
      embeddingBatchTopKRefined(spark, sfDir, ids, k, numProbe,
        refineInt8 = refineInt8))

  private def centsFor(spark: SparkSession, sfDir: String,
      iters: Int): Seq[(Long, Seq[Double])] =
    if (iters == LloydIters) stagedCentroidIndex(spark, sfDir)
    else collectCentroidsIter(Fixtures.embeddings(spark, sfDir), iters)
      .map { case (id, a) => id -> a.toSeq }

  /** Exact brute-force top-k ids per (query, k), memoized per corpus
    * snapshot: EVERY recall gauge compares against the same ground
    * truth, and the nprobe sweep reads it ~17 times per corpus — the
    * ground truth is a pure function of the snapshot, so the
    * (size,mtime)-stamped memo cuts the gauge pass's exact-side Spark
    * actions from O(gauges × queries) to O(queries), for the suite's
    * recall lock and Verify's `recordIvfRecall` alike. */
  private val exactTopKMemo = new graft.util.StampedMemo[
    scala.collection.concurrent.TrieMap[(Long, Int), Set[Long]]]("embeddings")

  private def exactTopKIds(spark: SparkSession, sfDir: String,
      q: Long, k: Int): Set[Long] = {
    val m = exactTopKMemo.get(sfDir)(
      scala.collection.concurrent.TrieMap.empty[(Long, Int), Set[Long]])
    m.getOrElseUpdate((q, k),
      graft.operators.LlmOps
        .embeddingTopKCosine(Fixtures.embeddings(spark, sfDir), q, k)
        .select("vec_id").collect().map(_.getLong(0)).toSet)
  }

  private def avgOverlap(ids: Seq[Long], k: Int,
      exact: Long => Set[Long], probe: Long => DataFrame): Double = {
    val scores = ids.map { q =>
      val e = exact(q)
      val p = probe(q).select("vec_id").collect().map(_.getLong(0)).toSet
      (e & p).size.toDouble / k
    }
    scores.sum / ids.size
  }

  /** [[avgOverlap]] against a BATCHED probe frame (`qid, vec_id, …`):
    * one collect serves every query's overlap — a query the batch
    * returned no rows for scores 0 (exactly as its empty per-query
    * frame would). */
  private def batchRecall(ids: Seq[Long], k: Int,
      exact: Long => Set[Long], batch: => DataFrame): Double = {
    val byQ = batch.select("qid", "vec_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val scores = ids.map { q =>
      (exact(q) & byQ.getOrElse(q, Set.empty)).size.toDouble / k
    }
    scores.sum / ids.size
  }

  /** Measure and record the ANN quality gauges `Verify` dumps into
    * `observed_metrics.json`: recall@10 of the served (iterated-Lloyd)
    * IVF probe and of the IVF+PQ ADC ranking, plus the 1-step-seed IVF
    * baseline the iterated index is graded against (measured: seed
    * 0.48 → 1 step 0.53 → [[LloydIters]]=3 steps 0.55 at sf0.001/0.01,
    * 20 queries at the historical fixed C=8/np=2 geometry; diminishing
    * past 3 — recall is bounded well below 1 by design when np/C cells
    * are probed; the round-12 corpus-scaled geometry re-gauges the
    * whole curve). */
  def recordIvfRecall(spark: SparkSession, sfDir: String): Unit = {
    // the DECLARED geometry itself (round 12: corpus-derived, no longer
    // a constant) — so every recall gauge below reads against its C/np
    graft.ObservedMetrics.recordGauge("ann.declared_centroids",
      stagedDeclaredC(spark, sfDir).toDouble)
    graft.ObservedMetrics.recordGauge("ann.num_probe",
      defaultNumProbe(stagedDeclaredC(spark, sfDir)).toDouble)
    graft.ObservedMetrics.recordGauge("ann.ivf_recall_at10",
      ivfRecallAtK(spark, sfDir))
    graft.ObservedMetrics.recordGauge("ann.ivf_recall_at10_1step",
      ivfRecallAtK(spark, sfDir, iters = 1))
    graft.ObservedMetrics.recordGauge("ann.ivfpq_recall_at10",
      ivfPqRecallAtK(spark, sfDir))
    // The recall/cost CURVE a serving tier tunes against: nprobe is the
    // per-query-class knob (cost ∝ probed cells × cell size), so record
    // recall@10 at nprobe ∈ {1, 2, 4, 8} for the flat-IVF probe, the
    // compressed IVF+PQ path, and the refined serve. The headline gauges
    // above use the DERIVED np (max(2, C/8)).
    Seq(1, 2, 4, 8).foreach { np =>
      graft.ObservedMetrics.recordGauge(s"ann.ivf_recall_at10_np$np",
        ivfRecallAtK(spark, sfDir, numProbe = np))
      graft.ObservedMetrics.recordGauge(s"ann.ivfpq_recall_at10_np$np",
        ivfPqRecallAtK(spark, sfDir, numProbe = np))
      graft.ObservedMetrics.recordGauge(s"ann.ivfpq_refine_recall_at10_np$np",
        ivfPqRefineRecallAtK(spark, sfDir, numProbe = np))
    }
    // recall of the two-stage refined serve ([[ivfPqTopKRefinedIndexed]])
    // — expected ≈ the IVF-flat ceiling: the exact re-rank absorbs the
    // ADC misrankings, so the residual loss is probe coverage only
    graft.ObservedMetrics.recordGauge("ann.ivfpq_refine_recall_at10",
      ivfPqRefineRecallAtK(spark, sfDir))
    // the same two-stage serve re-ranked from the stored int8 codes
    // (4× less read per refined row): measured EQUAL to the float gauge
    // at both fixture scales, which made int8 the default refine source
    // (RefineFromInt8); both gauges stay recorded so a future drift is
    // visible
    graft.ObservedMetrics.recordGauge("ann.ivfpq_refine_recall_at10_int8",
      ivfPqRefineRecallAtK(spark, sfDir, refineInt8 = true))
    // fraction of the served index appended under frozen artifacts
    // (0 unless a pipeline has run incremental appends this session)
    graft.ObservedMetrics.recordGauge("ann.index_stale_fraction",
      ivfIndexStaleFraction(spark, sfDir))
    // PQ reconstruction quality of the staged trained codebook: mean
    // per-vector RESIDUAL MSE since round 11 (raw-vector history:
    // 0.0118 untrained → 0.0088 trained; residual codes spend the same
    // budget on a much smaller signal, so the scale drops)
    graft.ObservedMetrics.recordGauge("ann.pq_train_mse",
      pqEncodeResidual(Fixtures.embeddings(spark, sfDir),
        stagedPqCodebook(spark, sfDir), stagedCentroidIndex(spark, sfDir))
        .agg(avg(col("mse"))).collect()(0).getDouble(0))
  }

  /** Second pinned plane count for the oracle-checked keys: the geometry
    * [[defaultNumPlanes]] would pick for a ~10M-vector corpus — proving
    * the operator+oracle pair holds across geometries, not just at the
    * historical constant. */
  private val AltPlanes = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_near_dup" ->
      ((s, d) => embeddingNearDup(Fixtures.embeddings(s, d), NEAR_DUP_K)),
    "emb_nd16" ->
      ((s, d) => embeddingNearDup(Fixtures.embeddings(s, d), NEAR_DUP_K, AltPlanes)),
    // round 9: served from the staged cell-partitioned index (partition
    // pruning reads only probed cells) — row-identical to the
    // assignment-per-query form, which remains the library path
    "emb_ivf_topk" ->
      ((s, d) => embeddingIvfTopKIndexed(s, d, QUERY_VEC, IVF_K)),
    // round 9: served from the staged index's stored assignment — the
    // election reads scalars only; row-identical to the self-assigning form
    "emb_protos" ->
      ((s, d) => embeddingCellPrototypesIndexed(s, d)),
    "emb_dup_groups" ->
      ((s, d) => embeddingDupGroups(Fixtures.embeddings(s, d), NEAR_DUP_K)),
    "emb_q8" ->
      ((s, d) => embeddingQuantizeInt8Scalar(Fixtures.embeddings(s, d))),
    // short key names by necessity: the one-line bench JSON must fit the
    // driver's 2000-char stdout-tail capture ([[graft.Bench]])
    // round 11: residual encode/serve (see [[residualFrame]])
    "pq_enc" ->
      ((s, d) => pqEncodeResidual(Fixtures.embeddings(s, d),
        stagedPqCodebook(s, d), stagedCentroidIndex(s, d))),
    "pq_topk" ->
      ((s, d) => pqTopKResidual(Fixtures.embeddings(s, d), stagedPqCodebook(s, d),
        stagedCentroidIndex(s, d), QUERY_VEC, IVF_K)),
    // round 9: served from the staged index's precomputed codes (scan
    // reads vec_id + pq_code only) — row-identical to the per-query form
    "ivfpq" ->
      ((s, d) => ivfPqTopKIndexed(s, d, QUERY_VEC, IVF_K)),
    // round 11: two-stage serve — ADC shortlist, exact-cosine re-rank
    // ("ivfpq_r" short for the bench line budget)
    "ivfpq_r" ->
      ((s, d) => ivfPqTopKRefinedIndexed(s, d, QUERY_VEC, IVF_K)),
    // round 9: batched ANN — one pruned index scan serves the whole
    // query batch ("ann_batch" short for the bench line budget)
    "ann_batch" ->
      ((s, d) => embeddingBatchTopK(s, d, QUERY_BATCH, IVF_K)),
    // round 18: takedown through the segment overlay — tombstone epoch
    // ingested, top-k served minus the deleted slice ("ann_del" short
    // for the bench line budget)
    "ann_del" ->
      ((s, d) => annDeleteServe(s, d)))

  /** Per-subspace squared-L2 in DuckDB: the SAME sequential left fold
    * over the same index order as [[pqSubDist]], so doubles agree
    * bit-for-bit raw (see the no-rounding note there). `s.s` is the
    * subspace from the enclosing `range(0, $PqSubspaces) s(s)`. */
  private def pqSubDistSql(x: String, ce: String): String =
    s"""list_reduce(list_prepend(0.0,
          list_transform(range(1, ${PqSubDim + 1}),
            i -> ($x[s.s*$PqSubDim+i] - $ce[s.s*$PqSubDim+i])
                 * ($x[s.s*$PqSubDim+i] - $ce[s.s*$PqSubDim+i]))),
          (a, b) -> a + b)"""

  /** The PQ codebook TRAINING derivation, generated for [[PqIters]]
    * per-subspace Lloyd steps (the staged-artifact numerics): seed =
    * first-[[PqCodes]] vectors' subspace slices; per step — argmin-squared-L2
    * code per (vector, subspace) (sequential fold, lowest-code ties),
    * dimension means rounded to 6 decimals, empty cells keeping the
    * prior centroid — then the per-subspace centroids reassemble into
    * the full-dim `seeds` relation the encode chain consumes. */
  private def pqTrainCte: String = {
    val sb = new StringBuilder
    sb.append(
      s"""pq_cb_0 AS MATERIALIZED (
          SELECT v.vec_id AS code, s.s AS sub,
                 v.x[s.s*$PqSubDim+1 : s.s*$PqSubDim+$PqSubDim] AS ce
          FROM x v, range(0, $PqSubspaces) s(s) WHERE v.vec_id < $PqCodes)""")
    for (i <- 1 to PqIters) {
      sb.append(s""",
        pq_d_$i AS MATERIALIZED (
          SELECT v.vec_id, c.sub, c.code,
                 list_reduce(list_prepend(0.0,
                   list_transform(range(1, ${PqSubDim + 1}),
                     j -> (v.x[c.sub*$PqSubDim+j] - c.ce[j])
                          * (v.x[c.sub*$PqSubDim+j] - c.ce[j]))),
                   (a, b) -> a + b) AS d
          FROM x v, pq_cb_${i - 1} c),
        pq_best_$i AS MATERIALIZED (
          SELECT vec_id, sub, first(code ORDER BY d, code) AS code
          FROM pq_d_$i GROUP BY vec_id, sub),
        pq_dims_$i AS MATERIALIZED (
          SELECT b.sub, b.code, j.j,
                 round(avg(v.x[b.sub*$PqSubDim+j.j]), 6) AS cx
          FROM pq_best_$i b JOIN x v USING (vec_id),
               range(1, ${PqSubDim + 1}) j(j)
          GROUP BY b.sub, b.code, j.j),
        pq_cb_$i AS MATERIALIZED (
          SELECT p.code, p.sub, coalesce(n.ce, p.ce) AS ce
          FROM pq_cb_${i - 1} p LEFT JOIN
            (SELECT sub, code, list(cx ORDER BY j) AS ce
             FROM pq_dims_$i GROUP BY sub, code) n
          ON n.sub = p.sub AND n.code = p.code)""")
    }
    sb.append(s""",
        seeds AS MATERIALIZED (
          SELECT code AS cent_id, flatten(list(ce ORDER BY sub)) AS ce
          FROM pq_cb_$PqIters GROUP BY code)""")
    sb.toString
  }

  /** The PQ encode derivation as a WITH chain — RESIDUAL since round
    * 11: the IVF index chain ([[ivfScoredCte]]) derives the assignment,
    * `x` becomes `embedding − centroid(cell)` (the exact framing
    * [[residualFrame]] computes in-row), and the train/encode chain
    * runs verbatim on it: codebook = [[pqTrainCte]] (matching the
    * staged trained artifact), per-(vector, subspace) argmin code with
    * the lowest-code tie-break (`first(... ORDER BY d, cent_id)` ≡
    * `array_position` first-match), codes packed integer-exactly, MSE
    * as the ordered sequential fold. Exposes `scored`/`assigned` for
    * the composed `ivfpq` oracle, and `x.cell` for the per-cell ADC. */
  private def pqEncodeCte: String =
    s"""WITH $ivfScoredCte,
        assigned AS MATERIALIZED (
          SELECT vec_id, cent_id AS cell FROM (
            SELECT vec_id, cent_id,
                   row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
            FROM scored) WHERE rn = 1),
        x AS MATERIALIZED (SELECT e.vec_id, a.cell,
                     list_transform(range(1, 65),
                       i -> CAST(e.embedding[i] AS DOUBLE) - c.ce[i]) AS x
              FROM embeddings e
              JOIN assigned a USING (vec_id)
              JOIN ivf_cents_$LloydIters c ON c.cent_id = a.cell),
        $pqTrainCte,
        d AS MATERIALIZED (SELECT v.vec_id, c.cent_id, s.s AS sub,
                     ${pqSubDistSql("v.x", "c.ce")} AS d
              FROM x v, seeds c, range(0, $PqSubspaces) s(s)),
        best AS MATERIALIZED (SELECT vec_id, sub, min(d) AS md,
                        first(cent_id ORDER BY d, cent_id) AS code
                 FROM d GROUP BY vec_id, sub),
        pq_enc AS MATERIALIZED (SELECT vec_id,
                          -- HUGEINT sum wrapped into signed 64: subspace 7
                          -- packs into the sign byte, and DuckDB's BIGINT <<
                          -- raises on overflow where the engine's Long wraps
                          CAST(CASE WHEN pv >= 9223372036854775808::HUGEINT
                                    THEN pv - 18446744073709551616::HUGEINT
                                    ELSE pv END AS BIGINT) AS pq_code,
                          mse
                   FROM (SELECT vec_id,
                                sum(code::HUGEINT * (1::HUGEINT << ($PqCodeBits * sub))) AS pv,
                                list_reduce(list_prepend(0.0, list(md ORDER BY sub)),
                                            (a, b) -> a + b) / 64 AS mse
                         FROM best GROUP BY vec_id))"""

  /** The per-cell query-residual ADC table CTEs shared by `pq_topk` and
    * `ivfpq`: the raw query widens to doubles, residualizes against
    * EVERY cell's centroid, and each (cell, code, sub) gets its
    * subspace distance — the lookup the member's stored (cell, code)
    * pair then joins. */
  private def pqQueryResidualCte(queryVec: Long): String =
    s"""q AS (SELECT list_transform(embedding, e -> CAST(e AS DOUBLE)) AS qx
              FROM embeddings WHERE vec_id = $queryVec),
        qr AS (SELECT ic.cent_id AS cell,
                      list_transform(range(1, 65), i -> q.qx[i] - ic.ce[i]) AS x
               FROM q, ivf_cents_$LloydIters ic),
        qd AS (SELECT qr.cell, c.cent_id, s.s AS sub,
                      ${pqSubDistSql("qr.x", "c.ce")} AS qdist
               FROM qr, seeds c, range(0, $PqSubspaces) s(s))"""

  /** The near-dup oracle, parameterized on the bucket geometry exactly as
    * the operator is. */
  private def nearDupOracle(numPlanes: Int, k: Int): String =
    s"""WITH bits AS (
          SELECT e.vec_id, j.j,
                 CASE WHEN sum((((t.i - 1) * 31 + j.j * 17) % 13 - 6)
                               * CAST(e.embedding[t.i] AS DOUBLE)) > 0
                      THEN 1::BIGINT << j.j ELSE 0 END AS bitval
          FROM embeddings e, range(1, 65) t(i), range(0, $numPlanes) j(j)
          GROUP BY e.vec_id, j.j),
        buckets AS (SELECT vec_id, sum(bitval) AS bucket FROM bits GROUP BY vec_id),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY bucket
                                                ORDER BY vec_id) AS rk
                   FROM buckets),
        pairs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM ranked a JOIN ranked b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            AND a.rk <= ${DedupOps.MaxBucketMembers} AND b.rk <= ${DedupOps.MaxBucketMembers}),
        scored AS (
          SELECT p.vec_a, p.vec_b,
                 round(sum(CAST(ea.embedding[t.i] AS DOUBLE) * CAST(eb.embedding[t.i] AS DOUBLE))
                       / (sqrt(sum(CAST(ea.embedding[t.i] AS DOUBLE) * CAST(ea.embedding[t.i] AS DOUBLE)))
                          * sqrt(sum(CAST(eb.embedding[t.i] AS DOUBLE) * CAST(eb.embedding[t.i] AS DOUBLE)))), 6) AS cosine
          FROM pairs p
          JOIN embeddings ea ON ea.vec_id = p.vec_a
          JOIN embeddings eb ON eb.vec_id = p.vec_b, range(1, 65) t(i)
          GROUP BY p.vec_a, p.vec_b)
        SELECT vec_a, vec_b, cosine FROM scored
        ORDER BY cosine DESC, vec_a, vec_b LIMIT $k"""

  /** Shared DuckDB scaffolding: per-(pair) cosine via positional sums. */
  /** One rounded-cosine scoring CTE: every vector against the `cents`
    * relation (cent_id, ce) — the text both the per-iteration assignment
    * and the final `scored` CTE reuse verbatim. */
  private def ivfScoreCte(cents: String, out: String): String =
    s"""$out AS MATERIALIZED (
          SELECT e.vec_id, c.cent_id,
                 round(sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(c.ce[t.i] AS DOUBLE))
                       / (sqrt(sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE)))
                          * sqrt(sum(CAST(c.ce[t.i] AS DOUBLE) * CAST(c.ce[t.i] AS DOUBLE)))), 6) AS ccos
          FROM embeddings e, $cents c, range(1, 65) t(i)
          GROUP BY e.vec_id, c.cent_id)"""

  /** The IVF index derivation as a WITH-chain BODY (caller supplies the
    * `WITH `), GENERATED for [[LloydIters]] Lloyd steps: seed pick, then
    *
    * Chain CTEs are `AS MATERIALIZED` (here and in the PQ/BPE chains):
    * each step references its predecessor along TWO paths (assignment +
    * carry-forward), so DuckDB's default inlining re-evaluates the
    * whole prefix 2^steps times — measured 216 s → 2.3 s on the pq_enc
    * chain at 256 codes. Materialization pins each step to one
    * evaluation, which is also the semantics the Spark trainers have
    * (every step runs once).
    * per step — rounded-cosine assignment (rank-1, lowest-cent_id ties)
    * and dimension means rounded to 6 decimals (the staged-index
    * numerics) — and finally the full per-(vector, centroid) rounded
    * cosine in `scored` against the last refinement. Factored so
    * `emb_ivf_topk`, `emb_protos`, `ivfpq` and the batch/stream ANN keys
    * all check the SAME index text — the qualityScoreOracle no-drift
    * discipline. */
  private def ivfScoredCte: String = {
    val sb = new StringBuilder
    sb.append(
      s"""ivf_geo AS MATERIALIZED (
            SELECT c, greatest($NumProbe, c // 8) AS np FROM (
              SELECT greatest($MinCentroids, least($MaxCentroids,
                       CAST(floor(sqrt(count(*))) AS BIGINT))) AS c
              FROM embeddings)),
        ivf_cents_0 AS MATERIALIZED (SELECT vec_id AS cent_id,
                 list_transform(embedding, e -> CAST(e AS DOUBLE)) AS ce
          FROM embeddings WHERE vec_id < (SELECT c FROM ivf_geo))""")
    for (i <- 1 to LloydIters) {
      sb.append(",\n        " + ivfScoreCte(s"ivf_cents_${i - 1}", s"ivf_scored_$i"))
      sb.append(s""",
        ivf_assign_$i AS MATERIALIZED (
          SELECT vec_id, cent_id AS cell FROM (
            SELECT vec_id, cent_id,
                   row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
            FROM ivf_scored_$i) WHERE rn = 1),
        ivf_dims_$i AS MATERIALIZED (
          SELECT a.cell AS cent_id, t.i,
                 round(avg(CAST(e.embedding[t.i] AS DOUBLE)), 6) AS cx
          FROM ivf_assign_$i a JOIN embeddings e ON e.vec_id = a.vec_id,
               range(1, 65) t(i)
          GROUP BY a.cell, t.i),
        ivf_cents_$i AS MATERIALIZED (SELECT cent_id, list(cx ORDER BY i) AS ce
                  FROM ivf_dims_$i GROUP BY cent_id)""")
    }
    sb.append(",\n        " + ivfScoreCte(s"ivf_cents_$LloydIters", "scored"))
    sb.toString
  }

  def oracle: Map[String, String] = Map(
    "emb_q8" ->
      """WITH x AS (SELECT vec_id,
                           list_transform(embedding, e -> CAST(e AS DOUBLE)) AS x
                    FROM embeddings),
          s AS (SELECT vec_id, x,
                       list_max(list_transform(x, v -> abs(v))) AS mx
                FROM x),
          sc AS (SELECT vec_id, x,
                        CASE WHEN mx > 0 THEN mx / 127.0 ELSE 1.0 END AS scale
                 FROM s),
          q AS (SELECT vec_id, x, scale,
                       list_transform(x, v -> CAST(round(v / scale) AS INTEGER)) AS qvec
                FROM sc)
          SELECT vec_id, scale,
                 md5(array_to_string(
                   list_transform(qvec, v -> CAST(v AS VARCHAR)), ',')) AS qvec_md5,
                 CAST(list_reduce(list_prepend(0, qvec), (a, v) -> a + v)
                      AS BIGINT) AS qvec_sum,
                 list_reduce(
                   list_prepend(0.0,
                     list_transform(range(1, len(x) + 1),
                       i -> (x[i] - qvec[i] * scale) * (x[i] - qvec[i] * scale))),
                   (a, v) -> a + v) / len(x) AS mse
          FROM q""",
    "pq_enc" -> s"$pqEncodeCte SELECT vec_id, pq_code, mse FROM pq_enc",
    "pq_topk" ->
      // residual flat-PQ: every member joins the ADC table at ITS OWN
      // cell's query residual (x.cell carries the assignment)
      s"""$pqEncodeCte,
          ${pqQueryResidualCte(QUERY_VEC)},
          ad AS (SELECT b.vec_id, b.sub, qd.qdist
                 FROM best b
                 JOIN x v ON v.vec_id = b.vec_id
                 JOIN qd ON qd.sub = b.sub AND qd.cent_id = b.code
                        AND qd.cell = v.cell
                 WHERE b.vec_id <> $QUERY_VEC),
          agg AS (SELECT vec_id,
                         list_reduce(list_prepend(0.0, list(qdist ORDER BY sub)),
                                     (a, b) -> a + b) AS adist
                  FROM ad GROUP BY vec_id)
          SELECT vec_id, adist FROM agg ORDER BY adist, vec_id LIMIT $IVF_K""",
    "ivfpq" ->
      // pqEncodeCte (residual) already carries the IVF chain: `scored`
      // drives the probe, `assigned` the candidates, and the ADC stages
      // mirror pq_topk's per-cell residual lookup restricted to them
      s"""$pqEncodeCte,
          qcells AS (
            SELECT cent_id AS cell FROM (
              SELECT cent_id,
                     row_number() OVER (ORDER BY ccos DESC, cent_id) AS rn
              FROM scored WHERE vec_id = $QUERY_VEC) WHERE rn <= (SELECT np FROM ivf_geo)),
          cand AS (SELECT a.vec_id, a.cell FROM assigned a JOIN qcells USING (cell)
                   WHERE a.vec_id <> $QUERY_VEC),
          ${pqQueryResidualCte(QUERY_VEC)},
          ad AS (SELECT b.vec_id, b.sub, qd.qdist
                 FROM best b
                 JOIN cand ON cand.vec_id = b.vec_id
                 JOIN qd ON qd.sub = b.sub AND qd.cent_id = b.code
                        AND qd.cell = cand.cell),
          agg AS (SELECT vec_id,
                         list_reduce(list_prepend(0.0, list(qdist ORDER BY sub)),
                                     (a, b) -> a + b) AS adist
                  FROM ad GROUP BY vec_id)
          SELECT vec_id, adist FROM agg ORDER BY adist, vec_id LIMIT $IVF_K""",
    "ivfpq_r" ->
      // the ivfpq chain up to `agg`, then: ADC shortlist of
      // RefineFactor×k, rounded-cosine re-rank over the INT8 refine
      // source (round 13 default — the stored q8 codes re-derived per
      // candidate via the emb_quantize_int8 derivation; cosine is
      // scale-invariant so the scale never appears). The query side
      // stays float. Integer products keep the dot and the candidate
      // norm order-free exact; round(…, 6) absorbs the query-norm
      // associativity exactly as the float tail did.
      s"""$pqEncodeCte,
          qcells AS (
            SELECT cent_id AS cell FROM (
              SELECT cent_id,
                     row_number() OVER (ORDER BY ccos DESC, cent_id) AS rn
              FROM scored WHERE vec_id = $QUERY_VEC) WHERE rn <= (SELECT np FROM ivf_geo)),
          cand AS (SELECT a.vec_id, a.cell FROM assigned a JOIN qcells USING (cell)
                   WHERE a.vec_id <> $QUERY_VEC),
          ${pqQueryResidualCte(QUERY_VEC)},
          ad AS (SELECT b.vec_id, b.sub, qd.qdist
                 FROM best b
                 JOIN cand ON cand.vec_id = b.vec_id
                 JOIN qd ON qd.sub = b.sub AND qd.cent_id = b.code
                        AND qd.cell = cand.cell),
          agg AS (SELECT vec_id,
                         list_reduce(list_prepend(0.0, list(qdist ORDER BY sub)),
                                     (a, b) -> a + b) AS adist
                  FROM ad GROUP BY vec_id),
          sl AS (SELECT vec_id FROM agg
                 ORDER BY adist, vec_id LIMIT ${RefineFactor * IVF_K}),
          slx AS (SELECT e.vec_id,
                         list_transform(e.embedding, v -> CAST(v AS DOUBLE)) AS x
                  FROM embeddings e JOIN sl ON sl.vec_id = e.vec_id),
          slq AS (SELECT vec_id,
                         list_transform(x,
                           v -> CAST(round(v / (CASE WHEN mx > 0
                                                     THEN mx / 127.0
                                                     ELSE 1.0 END)) AS INTEGER)) AS qv
                  FROM (SELECT vec_id, x,
                               list_max(list_transform(x, v -> abs(v))) AS mx
                        FROM slx))
          SELECT e.vec_id,
                 round(sum(CAST(e.qv[t.i] AS DOUBLE) * CAST(q.embedding[t.i] AS DOUBLE))
                       / (sqrt(sum(CAST(e.qv[t.i] AS DOUBLE) * CAST(e.qv[t.i] AS DOUBLE)))
                          * sqrt(sum(CAST(q.embedding[t.i] AS DOUBLE) * CAST(q.embedding[t.i] AS DOUBLE)))), 6) AS cosine
          FROM slq e,
               (SELECT embedding FROM embeddings WHERE vec_id = $QUERY_VEC) q,
               range(1, 65) t(i)
          GROUP BY e.vec_id
          ORDER BY cosine DESC, e.vec_id LIMIT $IVF_K""",
    "emb_near_dup" -> nearDupOracle(NumPlanes, NEAR_DUP_K),
    "emb_nd16" -> nearDupOracle(AltPlanes, NEAR_DUP_K),
    "emb_dup_groups" ->
      // the near-dup pair query (its own WITH chain) nests as the `dup`
      // CTE; `reach` closes it transitively, min(r) labels the component
      s"""WITH RECURSIVE dup AS (${nearDupOracle(NumPlanes, NEAR_DUP_K)}),
          edges AS (SELECT vec_a AS a, vec_b AS b FROM dup
                    UNION ALL SELECT vec_b, vec_a FROM dup),
          verts AS (SELECT DISTINCT a AS id FROM edges),
          reach(id, r) AS (
            SELECT id, id FROM verts
            UNION
            SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b),
          comp AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
          sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS cluster_size
                    FROM comp GROUP BY cluster)
          SELECT c.id AS vec_id, c.cluster,
                 CAST(c.id = c.cluster AS INTEGER) AS is_canonical,
                 s.cluster_size
          FROM comp c JOIN sizes s USING (cluster)""",
    "emb_protos" ->
      // the SAME index text as emb_ivf_topk ([[ivfScoredCte]]); the
      // final window mirrors the operator's (ccos DESC, vec_id) order
      s"""WITH $ivfScoredCte,
          assigned AS (
            SELECT vec_id, cent_id AS cell, ccos FROM (
              SELECT vec_id, cent_id, ccos,
                     row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
              FROM scored) WHERE rn = 1)
          SELECT vec_id, cell, ccos, proto_rank FROM (
            SELECT vec_id, cell, ccos,
                   CAST(row_number() OVER (PARTITION BY cell
                                           ORDER BY ccos DESC, vec_id) AS INTEGER) AS proto_rank
            FROM assigned) WHERE proto_rank <= $ProtoK""",
    "emb_ivf_topk" ->
      s"""WITH $ivfScoredCte,
          assigned AS (
            SELECT vec_id, cent_id AS cell FROM (
              SELECT vec_id, cent_id,
                     row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
              FROM scored) WHERE rn = 1),
          qcells AS (
            SELECT cent_id AS cell FROM (
              SELECT cent_id,
                     row_number() OVER (ORDER BY ccos DESC, cent_id) AS rn
              FROM scored WHERE vec_id = $QUERY_VEC) WHERE rn <= (SELECT np FROM ivf_geo)),
          cand AS (
            SELECT a.vec_id FROM assigned a JOIN qcells q ON a.cell = q.cell
            WHERE a.vec_id <> $QUERY_VEC)
          SELECT e.vec_id,
                 round(sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.embedding[t.i] AS DOUBLE))
                       / (sqrt(sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE)))
                          * sqrt(sum(CAST(q.embedding[t.i] AS DOUBLE) * CAST(q.embedding[t.i] AS DOUBLE)))), 6) AS cosine
          FROM embeddings e
          JOIN cand ON cand.vec_id = e.vec_id,
               (SELECT embedding FROM embeddings WHERE vec_id = $QUERY_VEC) q,
               range(1, 65) t(i)
          GROUP BY e.vec_id
          ORDER BY cosine DESC, e.vec_id LIMIT $IVF_K""",
    // the multi-query generalization of emb_ivf_topk's oracle: probe
    // cells and candidate ranking PER query id, same assignment CTEs
    "ann_batch" -> annBatchOracleSql(s"vec_id IN (${QUERY_BATCH.mkString(", ")})", IVF_K),
    // ann_del: the SAME chain minus the tombstoned slice — deletion is
    // pure candidate exclusion, so the oracle is arithmetic
    "ann_del" -> annBatchOracleSql(s"vec_id IN (${QUERY_BATCH.mkString(", ")})", IVF_K,
      candPredicate = s"a.vec_id % $DeleteMod <> $DeleteRem"))

  /** The batched-ANN oracle, parameterized on the query-id predicate and
    * k — shared verbatim by `ann_batch` and the streaming `stream_ann`
    * key (whose id window is a range), so the two cannot drift. */
  /** Oracle for the stored index CONTENTS — the scalar triple every
    * index row carries: per-vector cell assignment (argmax cosine
    * against the re-derived iterated-Lloyd centroids) and residual PQ
    * code (re-derived trained codebook). Shared by the streaming
    * segment-ingestion key (`stream_idx`), whose final union must equal
    * this projection at any micro-batch split. */
  def indexContentsOracleSql: String =
    s"""$pqEncodeCte
        SELECT a.vec_id, a.cell, p.pq_code
        FROM assigned a JOIN pq_enc p USING (vec_id)"""

  /** Staleness-triggered COMPACTION: when the stale fraction of the
    * served index (in-place appends + live segments) crosses
    * `threshold`, drop every staged ANN artifact (centroids, PQ
    * codebook, index files), rebuild from the current corpus, and
    * retire the live-segment registration — the periodic full retrain
    * that bounds the quality drift frozen-artifact ingestion
    * accumulates (the recall gauges price that drift). Returns whether
    * a retrain ran. Production wires this after each append batch; the
    * threshold is the serving tier's quality budget.
    *
    * COMPACTION CONTRACT: the rebuild reads ONLY the corpus dir. Rows
    * that entered via [[appendToStagedIvfIndex]] or a registered
    * segment root but were never landed in the corpus dir are DROPPED
    * from the served index at compaction — the ingestion tier must
    * commit each batch to corpus storage before the retrain threshold
    * trips (the usual LSM discipline: segments are a serving overlay,
    * the corpus is the source of truth). */
  def maybeRetrainStagedIndex(spark: SparkSession, sfDir: String,
      threshold: Double): Boolean = {
    val stale = ivfIndexStaleFraction(spark, sfDir)
    if (stale <= threshold) false
    else {
      // per-dir invalidation: retraining THIS corpus's index must not
      // un-stage every other corpus's artifacts
      centroidCache.invalidate(sfDir)
      pqCodebookCache.invalidate(sfDir)
      dropIndexSegments(sfDir)        // compaction absorbs the overlay
      // fresh generation: the rebuild's append counter reads zero, the
      // old dir sweeps, its counter self-heals on next manifest read
      ivfIndexDir(spark, sfDir, fresh = true) // eager: serving never
      true                                    // races a half-build
    }
  }

  /** `candPredicate` excludes candidates (alias `a`) from the pool —
    * the `ann_del` oracle passes the tombstoned slice's complement;
    * every other key passes the default TRUE. */
  def annBatchOracleSql(qidPredicate: String, k: Int,
      candPredicate: String = "TRUE"): String =
    s"""WITH $ivfScoredCte,
        assigned AS MATERIALIZED (
          SELECT vec_id, cent_id AS cell FROM (
            SELECT vec_id, cent_id,
                   row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
            FROM scored) WHERE rn = 1),
        qcells AS (
          SELECT vec_id AS qid, cent_id AS cell FROM (
            SELECT vec_id, cent_id,
                   row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS rn
            FROM scored WHERE $qidPredicate) WHERE rn <= (SELECT np FROM ivf_geo)),
        cand AS (
          SELECT q.qid, a.vec_id FROM assigned a JOIN qcells q ON a.cell = q.cell
          WHERE a.vec_id <> q.qid AND ($candPredicate)),
        pair_scored AS (
          SELECT c.qid, e.vec_id,
                 round(sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(qe.embedding[t.i] AS DOUBLE))
                       / (sqrt(sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(e.embedding[t.i] AS DOUBLE)))
                          * sqrt(sum(CAST(qe.embedding[t.i] AS DOUBLE) * CAST(qe.embedding[t.i] AS DOUBLE)))), 6) AS cosine
          FROM cand c
          JOIN embeddings e ON e.vec_id = c.vec_id
          JOIN embeddings qe ON qe.vec_id = c.qid,
               range(1, 65) t(i)
          GROUP BY c.qid, e.vec_id)
        SELECT qid, vec_id, cosine, rnk FROM (
          SELECT qid, vec_id, cosine,
                 CAST(row_number() OVER (PARTITION BY qid
                                         ORDER BY cosine DESC, vec_id) AS INTEGER) AS rnk
          FROM pair_scored) WHERE rnk <= $k"""
}
