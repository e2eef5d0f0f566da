package graft.operators

import graft.functions.Vec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer partitions the corpus into `nlist` cells; each query scans
  * only its `nprobe` nearest cells.
  *
  * Scale design: the quantizer trains on a bounded driver-side sample
  * (Lloyd's on ≤ `sampleSize` unit vectors — seconds of driver CPU for
  * any corpus size); centroids ship to executors as literals inside the
  * assignment expression, so cell assignment is map-side with zero
  * shuffle. The search itself shuffles only (cell, id, unit) rows for
  * the probed cells.
  *
  * Candidate volume per query ≈ N · nprobe / nlist vs N for brute
  * force; recall is governed by nprobe/nlist like any IVF index.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def nlist: Int = centroids.length
  }

  /** Lloyd's k-means on a deterministic sample of unit vectors.
    *
    * The sample key is `xxhash64` of the raw embedding bytes — a cheap
    * per-row hash (vs e.g. md5 of the stringified array, which pays an
    * array→string render per row). `orderBy(...).limit(n)` compiles to
    * `TakeOrderedAndProject`: a per-partition heap + driver merge, no
    * full sort and no shuffle — the pattern survives a 100 TB corpus. */
  def train(df: DataFrame, embCol: String, nlist: Int, iters: Int = 10,
      sampleSize: Int = 2048): Model =
    train(sampleUnits(df, embCol, sampleSize), nlist, iters)

  /** The deterministic unit-vector sample the trainers share — one
    * TakeOrderedAndProject job; composite indexes (IVF-PQ) collect it
    * once and feed both trainers instead of paying two corpus scans.
    *
    * The result is memoized per (session, corpus plan, embCol, size) —
    * the session by OBJECT IDENTITY through a WeakHashMap (sessions
    * don't override equals, a hashCode alone could alias two sessions,
    * and weak keys keep a stopped session collectable instead of
    * pinning its SessionState here), the plan by
    * `semanticHash` (a 32-bit digest: a cross-corpus collision is
    * possible in principle; pair it with the session key and 64
    * entries, and the practical risk is two same-session corpora
    * hashing identically — accepted and documented here). The sample
    * is a pure function of the corpus plan, so repeat index builds
    * over the same corpus (the build-once / search-many pattern) skip
    * the scan AND — because the trainers are deterministic — yield
    * byte-identical models, letting the CacheManager dedup the encoded
    * index plans too. Eviction is LRU one-at-a-time (least-recently
    * USED entry drops when a 65th arrives). Same staleness contract as
    * `Dataset.cache`: if the underlying files are rewritten in place,
    * call [[clearSampleCache]]. */
  def sampleUnits(df: DataFrame, embCol: String,
      sampleSize: Int = 2048): Array[Array[Double]] = {
    val key = (df.queryExecution.analyzed.semanticHash(), embCol, sampleSize)
    val perSession = sampleMemo.synchronized {
      var m = sampleMemo.get(df.sparkSession)
      if (m == null) {
        m = newLru()
        sampleMemo.put(df.sparkSession, m)
      }
      m
    }
    val cached = perSession.synchronized(perSession.get(key))
    if (cached != null) cached
    else {
      val s = Similarity.withUnit(df, embCol)
        .select(col("_unit"))
        .orderBy(xxhash64(col("_unit"))) // deterministic subset, cheap key
        .limit(sampleSize)
        .collect()
        .map(_.getSeq[Double](0).toArray)
      perSession.synchronized(perSession.put(key, s))
      s
    }
  }

  private type SampleKey = (Int, String, Int)
  private type Lru = java.util.LinkedHashMap[SampleKey, Array[Array[Double]]]

  // access-ordered LinkedHashMap = LRU; removeEldestEntry bounds each
  // session's memo at 64 entries, evicting one stale entry at a time
  private def newLru(): Lru =
    new Lru(16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SampleKey, Array[Array[Double]]]): Boolean =
        size() > 64
    }

  // WeakHashMap on the SESSION: sessions are compared by identity (no
  // equals override) but never strongly retained — a stopped,
  // dereferenced session's whole memo is GC-collectable, instead of
  // pinning SessionState until 64 newer entries push it out
  private val sampleMemo =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, Lru]()

  /** Drop memoized training samples (see [[sampleUnits]]). */
  def clearSampleCache(): Unit = sampleMemo.synchronized(sampleMemo.clear())

  /** Lloyd's on an already-collected sample (see [[sampleUnits]]). */
  def train(sample: Array[Array[Double]], nlist: Int, iters: Int): Model = {
    require(sample.nonEmpty, "empty corpus")
    val k = math.min(nlist, sample.length)
    var centroids = sample.take(k).map(_.clone())
    val dim = sample.head.length
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.MinValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { d += v(i) * centroids(c)(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else {
          val m = sums(c)
          val norm = math.sqrt(m.map(x => x * x).sum)
          if (norm == 0) old else m.map(_ / norm)
        }
      }
    }
    Model(centroids)
  }

  /** Cells ranked by centroid similarity, as array<struct<d,i>> sorted
    * descending — head is the assignment, first nprobe are the probes. */
  private def rankedCells(unit: Column, model: Model): Column = {
    val scored = model.centroids.zipWithIndex.map { case (c, i) =>
      struct(Vec.dot(unit, array(c.map(lit): _*)).as("d"), lit(i).as("i"))
    }
    sort_array(array(scored: _*), asc = false)
  }

  /** Top-1 cell without the sort: array_max over (d, i) structs is a
    * linear scan per row (same lexicographic order the sort used) —
    * corpus-side assignment touches every row, so it shouldn't pay an
    * O(nlist log nlist) sort for a max. */
  def assignCell(unit: Column, model: Model): Column = {
    val scored = model.centroids.zipWithIndex.map { case (c, i) =>
      struct(Vec.dot(unit, array(c.map(lit): _*)).as("d"), lit(i).as("i"))
    }
    array_max(array(scored: _*)).getField("i")
  }

  /** The `nprobe` nearest cell ids for a query vector, as array<int> —
    * the query side of IVF probing ([[ivfTopK]] and the IVF-PQ
    * composition both explode this). */
  def probeCells(unit: Column, model: Model, nprobe: Int): Column =
    transform(slice(rankedCells(unit, model), 1, nprobe), s => s.getField("i"))

  /** Persist a trained index: the tiny centroid table plus the
    * cell-assigned unit corpus (the inverted file), PARTITIONED BY
    * cell — so a later search's `nprobe` cells prune to
    * `nprobe / nlist` of the index files instead of scanning all of
    * them. This is the build-once / search-across-JOBS shape: the
    * expensive normalize + assign scan runs once, every future session
    * reads back only the cells it probes. */
  def save(corpus: DataFrame, idCol: String, embCol: String, dir: String,
      nlist: Int = 16): Model = {
    val model = train(corpus, embCol, nlist)
    val spark = corpus.sparkSession
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      model.centroids.zipWithIndex
        .map { case (c, i) => org.apache.spark.sql.Row(i, c.toSeq) }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("i",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    Similarity.withUnit(corpus, embCol)
      .select(col(idCol).as("neighbor_id"), col("_unit").as("u_c"))
      .withColumn("_cell", assignCell(col("u_c"), model))
      .write.mode("overwrite").partitionBy("_cell").parquet(s"$dir/cells")
    model
  }

  /** Incremental index growth — append `newDocs` to a [[save]]d
    * inverted file WITHOUT retraining: assign each new vector to its
    * cell under the SAVED centroids (parquet doubles round-trip
    * bit-exactly, so assignment math is identical to the original
    * build) and append into the same `_cell` partition layout. This is
    * the standing-index ops path at 100 TB: a daily crawl delta is one
    * assign-and-append job over the delta only, and every subsequent
    * [[searchSaved]] sees old + new rows through the identical
    * partition-pruned scan — IvfWinnowSpec pins save(half) + append
    * (rest) == one-shot search over the full corpus. Centroids go
    * stale as the distribution drifts (recall decays, never
    * correctness of the top-k over scanned cells); re-train when the
    * v27 cell-balance audit degrades. Caller owns id uniqueness across
    * appends — content-addressed ids (CorpusReader) make replayed
    * deltas idempotent to DEDUPE downstream, but this writer does not
    * scan existing cells to reject duplicates (that would re-read the
    * whole index per delta). */
  def appendToSaved(spark: org.apache.spark.sql.SparkSession, dir: String,
      newDocs: DataFrame, idCol: String, embCol: String): Unit = {
    val model = loadModel(spark, dir)
    Similarity.withUnit(newDocs, embCol)
      .select(col(idCol).as("neighbor_id"), col("_unit").as("u_c"))
      .withColumn("_cell", assignCell(col("u_c"), model))
      .write.mode("append").partitionBy("_cell").parquet(s"$dir/cells")
  }

  /** Read back the centroid table of a [[save]]d index. Doubles
    * round-trip parquet bit-exactly, so the loaded model reproduces the
    * saving session's cell ranking everywhere. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, dir: String): Model =
    Model(spark.read.parquet(s"$dir/centroids")
      .orderBy("i").collect()
      .map(_.getSeq[Double](1).toArray))

  /** Top-k search against a [[save]]d index. Identical probe math to
    * [[ivfTopK]] (IvfWinnowSpec pins result equality), but the corpus
    * side is the persisted inverted file: the equi-join on the `_cell`
    * PARTITION column lets dynamic partition pruning drop every
    * un-probed cell's files at the scan — the I/O win that makes a
    * persisted index pay for itself at 100 TB. */
  def searchSaved(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, idCol: String, embCol: String, k: Int,
      nprobe: Int = 4, roundTo: Int = 6): DataFrame = {
    val model = loadModel(spark, dir)
    val cells = spark.read.parquet(s"$dir/cells")
    val q = Similarity.withUnit(queries, embCol)
      .select(col(idCol).as("query_id"), col("_unit").as("u_q"),
        explode(probeCells(col("_unit"), model, nprobe)).as("_cell"))
    val scored = cells.join(broadcast(q), Seq("_cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(Vec.dot(col("u_c"), col("u_q")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }

  /** Oracle-parity centroids: the unit vectors of the `nlist`
    * smallest-id corpus rows, no Lloyd iteration. An external SQL
    * engine can rebuild these centroids exactly (ORDER BY id LIMIT
    * nlist), which makes the ENTIRE IVF pipeline — cell assignment,
    * probing, candidate top-k, downstream vote — replayable as plain
    * SQL; trained k-means centroids are not expressible that way. The
    * v15 registry entry runs this mode for the correctness gate (the
    * d04 `md5Parity` pattern); production keeps [[train]], whose
    * centroids give real recall. The collect is `nlist` rows (16-ish)
    * via TakeOrderedAndProject — bounded like the training sample. */
  def parityModel(corpus: DataFrame, idCol: String, embCol: String,
      nlist: Int): Model = {
    val rows = Similarity.withUnit(corpus, embCol)
      .select(col(idCol).as("_id"), col("_unit"))
      .orderBy(col("_id"))
      .limit(nlist)
      .collect()
    Model(rows.map(_.getSeq[Double](1).toArray))
  }

  /** Probe COST curve — the denominator of the recall-vs-nprobe
    * trade [[graft.operators.Similarity.ivfRecallSweep]] reports the
    * numerator of: for each `nprobe`, how many candidate rows the
    * probed cells actually contain, total and as the average ppm
    * share of the corpus each query scans. Recall without this number
    * is half a tuning decision; nprobe = nlist must cost exactly
    * 1e6 ppm (exhaustive scan) and cost is strictly monotone in
    * nprobe (both natural invariants for a spec).
    *
    * Scale shape: one corpus assignment scan collapsed to |cells|
    * counts; the query side ranks cells against the ≤nlist centroid
    * literals and joins the tiny count table — nothing corpus-sized
    * moves per sweep point. */
  def probeCostCurve(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, nprobes: Seq[Int], model: Model): DataFrame = {
    require(nprobes.nonEmpty &&
      nprobes.forall(p => p >= 1 && p <= model.nlist),
      s"nprobes=$nprobes must be within [1, nlist=${model.nlist}]")
    val units = Similarity.withUnit(corpus, embCol)
      .select(col(idCol).as("_id"), col("_unit"))
    val cellCounts = OpCaches.track(units
      .select(assignCell(col("_unit"), model).as("_cell"))
      .groupBy(col("_cell")).agg(count(lit(1)).as("_n")))
    // share of the INDEXED corpus: withUnit drops zero-norm vectors,
    // so the denominator must count what the cells actually hold — a
    // raw corpus.count() would silently deflate the ppm on data with
    // unindexable rows
    val nCorpus = units.count()
    val qUnits = Similarity.withUnit(queries, embCol)
      .select(col(idCol).as("query_id"), col("_unit"))
    val nQueries = qUnits.count()
    val per = nprobes.map { p =>
      qUnits
        .select(col("query_id"),
          explode(probeCells(col("_unit"), model, p)).as("_cell"))
        .join(broadcast(cellCounts), Seq("_cell"))
        .agg(sum(col("_n")).as("total_candidates"))
        .select(lit(p.toLong).as("nprobe"),
          col("total_candidates"),
          round(col("total_candidates").cast("double") /
              lit((nCorpus * nQueries).toDouble) * 1e6)
            .cast("long").as("scan_share_ppm"))
    }
    per.reduce(_ unionByName _)
  }

  /** Approximate top-k via IVF probing with freshly trained k-means
    * centroids. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      roundTo: Int = 6): DataFrame =
    ivfTopKWithModel(corpus, queries, idCol, embCol, k,
      train(corpus, embCol, nlist), nprobe, roundTo)

  /** [[ivfTopK]] against a caller-supplied [[Model]] — the seam the
    * parity mode and saved-index search share with the trained path.
    *
    * `allowed` (single-id-column frame) turns this into FILTERED
    * vector search — the vector-DB feature where a metadata predicate
    * scopes retrieval ("top-k among English docs"). The filter is a
    * LEFT SEMI join applied to the cell-assigned index stream before
    * candidates form, so it behaves as a PRE-filter: top-k is exact
    * over the allowed subset of probed cells, and recall within the
    * allowed set never degrades as selectivity tightens (a
    * post-filter's would — k survivors of an unfiltered top-k can all
    * be disallowed). Ids are fixed-width, so the semi join shuffles
    * id pairs only; the cached index itself is filter-agnostic and
    * shared across predicates. */
  def ivfTopKWithModel(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, model: Model, nprobe: Int = 4,
      roundTo: Int = 6, allowed: Option[DataFrame] = None): DataFrame = {
    // materialize units before the 16-way centroid scoring: otherwise
    // the normalization expression is re-evaluated inside every VecDot
    val units = OpCaches.track(Similarity.withUnit(corpus, embCol)
      .select(col(idCol).as("neighbor_id"), col("_unit").as("u_c")))
    // the "index": cell-assigned units, cached — deterministic model
    // literals make this plan identical across invocations, so repeat
    // searches over one corpus reuse a single in-memory inverted file.
    // Both frames are registered with [[OpCaches]]; a pipeline cycling
    // distinct corpora calls OpCaches.release() between them.
    val cAll = OpCaches.track(units.select(col("neighbor_id"), col("u_c"),
      assignCell(col("u_c"), model).as("_cell")))
    val c = allowed match {
      case Some(a) =>
        require(a.columns.length == 1,
          s"allowed must be a single-id-column frame, got ${a.columns.toSeq}")
        cAll.join(a.select(col(a.columns.head).as("neighbor_id")),
          Seq("neighbor_id"), "left_semi")
      case None => cAll
    }
    val q = Similarity.withUnit(queries, embCol)
      .select(col(idCol).as("query_id"), col("_unit").as("u_q"),
        explode(probeCells(col("_unit"), model, nprobe)).as("_cell"))
    val scored = c.join(q, Seq("_cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(Vec.dot(col("u_c"), col("u_q")), roundTo))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
  }
}
