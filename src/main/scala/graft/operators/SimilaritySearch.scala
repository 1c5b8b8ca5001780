package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.{HashFns, VectorFns}
import graft.plans.TopKAgg

/** Approximate-nearest-neighbor search over an embedding column
  * (beyond-reference operator; the LSH idea generalizes the reference's
  * MinHashLSH usage, models/item_cf_model.py:126-136, to dense vectors).
  *
  * Three tiers, in scale order:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query side is broadcast
  *    (small), the corpus is scanned once per partition — correct baseline,
  *    O(|Q|·|corpus|) work, the right choice when |Q| is small.
  *  - [[hyperplaneBuckets]] + [[lshTopK]]: random-hyperplane sign LSH.
  *    Corpus hashed once (per-row codegen fold, no shuffle), candidates
  *    meet via an equi-join on the bucket id — at 100 TB this is a
  *    shuffle-on-bucket instead of a cartesian product.
  *  - [[ivfAssign]]: inverted-file coarse quantization against fixed seed
  *    centroids; search visits one cell (or a probe list), same join shape.
  */
object SimilaritySearch {

  /** Semantic dedup end-to-end: label-blocked embedding near-dup pairs
    * (cosine ≥ minCos, vectors normalized ONCE per row) fed into
    * min-label connected components — the embedding analog of
    * [[Dedup.dedupClusters]], closing pair mining → clusters →
    * survivors for the vector modality. Returns
    * (vec_id, cluster, is_survivor). */
  def embeddingDedupClusters(emb: DataFrame, minCos: Double): DataFrame = {
    val normed = emb
      .withColumn("nrm", VectorFns.norm2(col("embedding")))
      .filter(col("nrm") > 0.0)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double") / col("nrm")).as("ne"))
    val pairs = normed.as("a")
      .join(normed.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", VectorFns.dot(col("a.ne"), col("b.ne")))
      .filter(col("cos") >= minCos)
      .select(col("a.vec_id").as("a"), col("b.vec_id").as("b"))
    Dedup.connectedComponents(emb.select(col("vec_id").as("id")), pairs)
      .select(col("id").as("vec_id"), col("cluster"),
        (col("id") === col("cluster")).as("is_survivor"))
  }

  /** Exact top-k re-rank of scored (query_id, neighbor_id, cos) candidates
    * via the bounded [[TopKAgg]] aggregate. The window formulation
    * (row_number over every candidate) shuffles and sorts ALL candidates
    * of every query before discarding all but k — a hot LSH bucket or fat
    * IVF cell makes that sort the bottleneck at 100 TB. The aggregate
    * keeps a k-bounded heap per query: map-side state ≤ k per query per
    * partition, shuffle ≤ k entries per query per map partition. Ordering
    * (cos desc, neighbor_id asc) is identical to the window's total order
    * — gate q77 pins the hash-equality of the two formulations.
    * Precondition: cos and neighbor_id non-null (cosine over non-empty
    * vectors never is; a null would be dropped here but ranked NULLS LAST
    * by the window). */
  def rerank(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(TopKAgg.topK(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("query_id"), (col("i") + 1).as("rank"),
        col("e").getField("id").as("neighbor_id"),
        Cross.r6(col("e").getField("w")).as("cos"))

  /** Maximal Marginal Relevance selection — greedy diversity-aware
    * top-k from a scored candidate pool: round r picks
    * argmax λ·rel − (1−λ)·max_{s∈selected} cos(ne, ne_s), ties to the
    * lowest id. The RAG re-ranking answer to "the plain top-k is five
    * copies of the same passage" (λ = 1 degenerates to relevance
    * top-k, λ = 0 to pure diversity). Zero-norm vectors are dropped
    * (no direction to diversify against). Returns one row per pick:
    * (rank, vec_id, rel, max_sim, mmr).
    *
    * Scale shape: k driver-side rounds — k is the OUTPUT size, so the
    * collected state (k normalized vectors + ids) is the bounded
    * loop-control class (IVF centroids, BPE merges). Each round is ONE
    * distributed argmax (TakeOrdered) over the candidate pool, with
    * the already-selected vectors baked in as literals — max_sim is a
    * greatest() over ≤ k codegen'd FloatVectorDot folds per row, no
    * shuffle, no cross join. Total cost k passes over the pool.
    *
    * Determinism: rel and every cosine are r6-micro-rounded before the
    * greatest/argmax compare, vectors normalize through the in-order
    * fold both engines share, and the selected vectors re-enter as the
    * SAME Scala doubles — the [[graft.core.Cross]] literal-interpolation
    * contract. */
  def mmrSelect(cands: DataFrame, id: Column, emb: Column, rel: Column,
      k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && k <= 1024, s"k out of range: $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val spark = cands.sparkSession
    import spark.implicits._
    val base0 = cands
      .select(id.cast("long").as("vec_id"), emb.as("e"),
        Cross.r6(rel.cast("double")).as("rel"))
      .withColumn("nrm", VectorFns.norm2(col("e")))
      .filter(col("nrm") > 0.0)
      .select(col("vec_id"), col("rel"),
        transform(col("e"), x => x.cast("double") / col("nrm")).as("ne"))
    val base = base0.localCheckpoint(true) // reused k times — one materialization
    var selected = List.empty[(Long, Seq[Double])]
    var out = List.empty[(Long, Long, Double, Double, Double)]
    for (r <- 1 to k if selected.size == r - 1) {
      val simTerms = selected.map { case (_, v) =>
        Cross.r6(VectorFns.dotLit(col("ne"), v.toArray)) }
      val maxSim = simTerms match {
        case Nil => lit(0.0)
        case one :: Nil => one
        case many => greatest(many: _*)
      }
      val mmr = Cross.r6(lit(lambda) * col("rel") -
        lit(1.0 - lambda) * maxSim)
      val pick = base
        .filter(!col("vec_id").isin(selected.map(_._1): _*))
        .select(col("vec_id"), col("rel"), maxSim.as("max_sim"),
          mmr.as("mmr"), col("ne"))
        .orderBy(col("mmr").desc, col("vec_id"))
        .limit(1).collect()
      if (pick.nonEmpty) {
        val row = pick.head
        selected ::= (row.getLong(0), row.getSeq[Double](4))
        out ::= ((r.toLong, row.getLong(0), row.getDouble(1),
          row.getDouble(2), row.getDouble(3)))
      }
    }
    out.reverse.toDF("rank", "vec_id", "rel", "max_sim", "mmr")
  }

  /** Per-query MMR — [[mmrSelect]] for a FLEET of queries at once.
    * `cands` is (query_id, vec_id, embedding, rel); each query's pool
    * is diversified independently with identical arithmetic (r6-rounded
    * rel/cos/objective, ties to the lowest vec_id). Returns
    * (query_id, rank, vec_id, rel, max_sim, mmr).
    *
    * Why a second entry point: [[mmrSelect]] collects each round's pick
    * to the DRIVER and bakes selected vectors in as literals — perfect
    * for one query, quadratic driver chatter for a serving batch of
    * thousands. Here the selected set stays a DATAFRAME: round r is one
    * anti-join (drop already-picked), one equi-join on query_id to the
    * ≤(r−1)-per-query selected vectors, a max aggregation for max_sim,
    * and one per-query arg-max (max_by on the rounded (mmr, −vec_id)
    * key — no window sort, no collect). k is output-bounded, so the
    * loop is k driver ROUNDS with zero driver DATA: at 100 TB the
    * rounds are k shuffles on query_id, each proportional to the
    * candidate table, and queries parallelize freely.
    *
    * A query with fewer than k candidates simply stops producing rows
    * — same semantics as [[mmrSelect]] running dry. PropertySpec pins
    * the per-slice equality law against [[mmrSelect]]. */
  def mmrSelectPerQuery(cands: DataFrame, k: Int, lambda: Double): DataFrame = {
    require(k >= 1 && k <= 64, s"k out of range: $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val base = cands
      .select(col("query_id").cast("long").as("query_id"),
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").as("e"), Cross.r6(col("rel").cast("double")).as("rel"))
      .withColumn("nrm", VectorFns.norm2(col("e")))
      .filter(col("nrm") > 0.0)
      .select(col("query_id"), col("vec_id"), col("rel"),
        transform(col("e"), x => x.cast("double") / col("nrm")).as("ne"))
      .localCheckpoint(true) // reused k times — one materialization
    var selected: DataFrame = null
    for (r <- 1 to k) {
      val scored =
        if (r == 1) base.withColumn("max_sim", lit(0.0))
        else {
          val sel = selected.select(col("query_id").as("sq"),
            col("vec_id").as("sid"), col("ne").as("sne"))
          base
            .join(sel.select(col("sq").as("query_id"), col("sid").as("vec_id")),
              Seq("query_id", "vec_id"), "left_anti")
            .join(sel.drop("sid"), col("query_id") === col("sq"))
            .withColumn("s", Cross.r6(VectorFns.dot(col("ne"), col("sne"))))
            .groupBy("query_id", "vec_id")
            // rel/ne are constant within the (query_id, vec_id) group
            .agg(first("rel").as("rel"), first("ne").as("ne"),
              max("s").as("max_sim"))
        }
      val pick = scored
        .withColumn("mmr", Cross.r6(lit(lambda) * col("rel") -
          lit(1.0 - lambda) * col("max_sim")))
        .groupBy("query_id")
        .agg(max_by(
          struct(col("vec_id"), col("rel"), col("max_sim"), col("mmr"), col("ne")),
          struct(col("mmr").as("m"), (-col("vec_id")).as("nid"))).as("w"))
        .select(col("query_id"), lit(r.toLong).as("rank"),
          col("w.vec_id").as("vec_id"), col("w.rel").as("rel"),
          col("w.max_sim").as("max_sim"), col("w.mmr").as("mmr"),
          col("w.ne").as("ne"))
        .localCheckpoint(true) // picks are |queries|-bounded; caps lineage at k joins
      selected = if (r == 1) pick else selected.unionByName(pick)
    }
    selected.select("query_id", "rank", "vec_id", "rel", "max_sim", "mmr")
  }

  /** Exact top-k cosine neighbors for each query row. `queries` must be
    * small (broadcast); excludes self-matches. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    rerank(scored, k)
  }

  /** Matryoshka-style prefix-dim evaluation: exact top-k under the
    * FIRST `kDims` dimensions (sliced + cosine on the prefix, the
    * matryoshka-representation-learning deployment trick) scored as
    * recall against the full-dim top-k, per query. Returns
    * (query_id, n_common, recall).
    *
    * Why it earns its place at 100 TB: a 16-of-64 prefix scan reads a
    * quarter of the vector bytes and fits 4x more candidates per
    * executor, so prefix-dim search is the cheap first tier above
    * int8/PQ — IF the prefix ranking agrees with the full ranking.
    * This operator measures that agreement exactly, which is the
    * number that decides the knob. Truncation is a pure projection
    * (`slice`) — no shuffle beyond the underlying searches. */
  def prefixDimRecall(queries: DataFrame, corpus: DataFrame, k: Int,
      kDims: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(kDims >= 1, s"kDims must be >= 1, got $kDims")
    def trunc(df: DataFrame) = df.select(col("vec_id"),
      slice(col("embedding"), 1, kDims).as("embedding"))
    val full = bruteForceTopK(queries, corpus, k)
      .select(col("query_id"), col("neighbor_id"))
    val pre = bruteForceTopK(trunc(queries), trunc(corpus), k)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    full.join(pre, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_common"))
      .select(col("query_id"), col("n_common"),
        Cross.r6(col("n_common") / lit(k.toDouble)).as("recall"))
  }

  /** Sign-LSH bucket id from `nPlanes` fixed hyperplanes (bit p set iff
    * the dot with plane p is positive). Pure per-row fold — no shuffle. */
  def bucketCol(emb: Column, nPlanes: Int, dims: Int): Column =
    (0 until nPlanes).map { p =>
      when(VectorFns.dotLit(emb, HashFns.litVector(s"plane-$p", dims)) > 0.0,
        lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  def hyperplaneBuckets(corpus: DataFrame, nPlanes: Int, dims: Int): DataFrame =
    corpus.select(col("vec_id"), col("embedding"),
      bucketCol(col("embedding"), nPlanes, dims).as("bucket"))

  /** Semantic benchmark decontamination — the embedding-space analog of
    * the shingle-overlap screen (Dedup.decontaminate): flag every train
    * vector whose cosine against ANY eval vector clears `minCos`, with
    * the best-matching eval id as evidence. EXACT (zero false
    * negatives — a contamination screen cannot trade recall), which is
    * affordable for the same reason the text screen is: benchmark sets
    * are tiny next to the corpus, so the eval side BROADCASTS and the
    * scan is one map-side pass of |train| × |eval| dot products with an
    * algebraic per-train argmax — no shuffle wider than one row per
    * train vector. Ties on cosine resolve to the lowest eval id
    * (min_by over the rounded score, engine-portable). Returns
    * (vec_id, eval_id, max_cos, contaminated). */
  def semanticDecontaminate(train: DataFrame, evalSet: DataFrame,
      minCos: Double): DataFrame = {
    require(minCos > -1.0 && minCos <= 1.0, s"minCos out of range: $minCos")
    val e = evalSet.select(col("vec_id").as("eval_id"), col("embedding").as("ee"))
    train.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(e))
      .select(col("vec_id"), col("eval_id"),
        Cross.r6(VectorFns.cosine(col("embedding"), col("ee"))).as("cos"))
      .groupBy("vec_id")
      .agg(
        min_by(col("eval_id"), struct((-col("cos")).as("nc"),
          col("eval_id").as("tid"))).as("eval_id"),
        max("cos").as("max_cos"))
      .withColumn("contaminated", col("max_cos") >= minCos)
  }

  /** ANN top-k: candidates share the LSH bucket; exact cosine re-rank. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int, dims: Int): DataFrame = {
    val qb = hyperplaneBuckets(queries, nPlanes, dims)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val cb = hyperplaneBuckets(corpus, nPlanes, dims)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("bucket"))
    val scored = qb.join(cb, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    rerank(scored, k)
  }

  /** The deterministic seed centroids (cell c = litVector("centroid-c")). */
  def seedCentroids(nCells: Int, dims: Int): Array[Array[Double]] =
    (0 until nCells).map(c => HashFns.litVector(s"centroid-$c", dims)).toArray

  /** Nearest-centroid struct (d, cell) — min by squared L2, ties → lowest
    * cell id. Pure per-row fold, no shuffle. */
  private def nearestCentroid(emb: Column, nCells: Int, dims: Int): Column =
    array_min(array((0 until nCells).map { c =>
      struct(VectorFns.sqDistLit(emb, HashFns.litVector(s"centroid-$c", dims)).as("d"),
        lit(c).as("cell"))
    }: _*))

  /** (d, cell) min-struct against EXPLICIT centroid literals with
    * r6-rounded distances: the rounding absorbs float addition-order
    * differences between the Spark fold and a SQL SUM, so the ASSIGNMENT
    * (which only consumes the order of distances) is bit-stable across
    * engines — required for the k-means trajectory to be oracle-mirrorable. */
  private def nearestCellOf(emb: Column, cents: Array[Array[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (w, c) =>
      struct(Cross.r6(VectorFns.sqDistLit(emb, w)).as("d"), lit(c).as("cell"))
    }: _*))

  /** Lloyd k-means refinement of the IVF coarse quantizer, starting from
    * [[seedCentroids]]. Each round is ONE distributed pass — assignment
    * is a per-row literal fold (no shuffle), the per-dim mean a
    * decimal-exact groupBy — plus a k×dims driver collect: centroid
    * state is loop control, the same contract as connectedComponents'
    * convergence scalar, never data. Distances and means are r6-rounded
    * every round so the whole trajectory is engine-reproducible (gate
    * q49 unrolls the identical rounds in SQL). Raises if a cell empties:
    * the gate must fail loudly rather than silently diverge from the
    * oracle's inner-join semantics. */
  def ivfTrain(corpus: DataFrame, nCells: Int, dims: Int, iters: Int): Array[Array[Double]] = {
    var cents = seedCentroids(nCells, dims)
    for (round <- 0 until iters) {
      // two selects: mixing getField-on-aliased-struct with a
      // multi-aliased generator in ONE select makes CleanupAliases strip
      // the struct's inner field names before ExtractValue resolves
      val means = corpus
        .select(col("embedding"),
          nearestCellOf(col("embedding"), cents).getField("cell").as("cell"))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "e")))
        .groupBy("cell", "pos")
        .agg(Cross.r6(Cross.davg(col("e").cast("double"), 9)).as("v"))
        .collect()
      require(means.map(_.getInt(0)).distinct.length == nCells,
        s"k-means round $round emptied a cell; reduce nCells or reseed")
      val next = Array.ofDim[Double](nCells, dims)
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      cents = next
    }
    cents
  }

  /** Mean squared distance of every corpus vector to its assigned
    * centroid — the k-means objective, for convergence tests. */
  def ivfInertia(corpus: DataFrame, cents: Array[Array[Double]]): Double =
    corpus.select(nearestCellOf(col("embedding"), cents).getField("d").as("d"))
      .agg(avg("d")).head().getDouble(0)

  /** IVF search against explicit (e.g. trained) centroids — same shape
    * as [[ivfTopK]]: corpus in its nearest cell, queries probe their
    * nProbe nearest cells, bounded top-k re-rank. */
  def ivfTopKTrained(queries: DataFrame, corpus: DataFrame, k: Int,
      cents: Array[Array[Double]], nProbe: Int = 1): DataFrame = {
    require(nProbe >= 1 && nProbe <= cents.length,
      s"need 1 <= nProbe <= nCells, got $nProbe/${cents.length}")
    val cellStructs = array(cents.zipWithIndex.map { case (w, c) =>
      struct(Cross.r6(VectorFns.sqDistLit(col("embedding"), w)).as("d"), lit(c).as("cell"))
    }: _*)
    val qb = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      explode(slice(array_sort(cellStructs), 1, nProbe).getField("cell")).as("cell"))
    val cb = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"),
      array_min(cellStructs).getField("cell").as("cell"))
    val scored = qb.join(cb, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    rerank(scored, k)
  }

  /** SemDeDup-style semantic deduplication with LEARNED blocking
    * (Abbas et al. 2023): cluster the corpus with the Lloyd-trained
    * coarse quantizer, then call a vector a duplicate iff some
    * lower-id cell-mate's cosine reaches `tau` — min-id survivor, the
    * library-wide dedup convention. Complements the label-blocked path
    * (q41): this is the recipe when no blocking key exists.
    *
    * Scale shape: the k-means cells bound the quadratic — within-cell
    * pairing is a self-equi-join on cell id, so total pair work is
    * sum(cell²) not N²; size nCells ~ N / targetCellSize to hold the
    * per-cell candidate set constant as the corpus grows (the same cap
    * discipline as the LSH band joins). Assignment is a per-row
    * literal fold (no shuffle); centroids are k×dims driver loop
    * state, never data. Returns one row per vector:
    * (vec_id, cell, n_dups_below, keep). */
  def semanticDedup(corpus: DataFrame, cents: Array[Array[Double]],
      tau: Double): DataFrame = {
    val assigned = cellAssigned(corpus, cents)
    // assignment feeds both sides of the pair join and the final output
    graft.core.Caching.releasing(assigned)(semanticDedupFrom(assigned, tau))
  }

  /** Uncheckpointed [[semanticDedup]] plan for inspection/composition. */
  def semanticDedupPlan(corpus: DataFrame, cents: Array[Array[Double]],
      tau: Double): DataFrame =
    semanticDedupFrom(cellAssigned(corpus, cents), tau)

  private def cellAssigned(corpus: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    val cellStructs = array(cents.zipWithIndex.map { case (w, c) =>
      struct(Cross.r6(VectorFns.sqDistLit(col("embedding"), w)).as("d"), lit(c).as("cell"))
    }: _*)
    corpus.select(col("vec_id"),
      array_min(cellStructs).getField("cell").as("cell"), col("embedding"))
  }

  private def semanticDedupFrom(assigned: DataFrame, tau: Double): DataFrame = {
    val a = assigned.select(col("cell"), col("vec_id"), col("embedding").as("ea"))
    val b = assigned.select(col("cell"), col("vec_id").as("vec_b"),
      col("embedding").as("eb"))
    val dups = a.join(b, Seq("cell"))
      .filter(col("vec_b") < col("vec_id") &&
        VectorFns.cosine(col("ea"), col("eb")) >= lit(tau))
      .groupBy("vec_id").agg(count(lit(1)).as("n_dups_below"))
    assigned.join(dups, Seq("vec_id"), "left")
      .na.fill(0L, Seq("n_dups_below"))
      .select(col("vec_id"), col("cell"), col("n_dups_below"),
        (col("n_dups_below") === 0L).as("keep"))
  }

  /** Contrastive triplet mining over the trained coarse quantizer —
    * training-data prep for embedding models: every vector becomes an
    * anchor with its hardest in-cell positive (top-1 cosine among
    * cell-mates) and a hard negative mined from its SECOND-nearest
    * cell (close enough to be confusable, guaranteed outside the
    * anchor's own neighborhood). Both candidate sets are cell-bounded,
    * so the pair work is sum(cell²) like [[semanticDedup]], and both
    * top-1s run through the bounded-heap re-rank — no global sort, no
    * cartesian. Anchors alone in their cell drop (no positive exists).
    * Returns (vec_id, pos_id, pos_cos, neg_id, neg_cos, margin). */
  def contrastiveTriplets(corpus: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    val assigned = twoCellAssigned(corpus, cents)
    graft.core.Caching.releasing(assigned)(tripletsFrom(assigned))
  }

  /** Uncheckpointed [[contrastiveTriplets]] plan for inspection. */
  def contrastiveTripletsPlan(corpus: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    tripletsFrom(twoCellAssigned(corpus, cents))

  private def twoCellAssigned(corpus: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    require(cents.length >= 2, "need >= 2 cells to mine a negative cell")
    val cellStructs = array(cents.zipWithIndex.map { case (w, c) =>
      struct(Cross.r6(VectorFns.sqDistLit(col("embedding"), w)).as("d"), lit(c).as("cell"))
    }: _*)
    val sorted = array_sort(cellStructs)
    corpus.select(col("vec_id"), col("embedding"),
      element_at(sorted, 1).getField("cell").as("cell1"),
      element_at(sorted, 2).getField("cell").as("cell2"))
  }

  private def tripletsFrom(assigned: DataFrame): DataFrame = {
    val mates = assigned.select(col("cell1").as("cell"),
      col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val posScored = assigned
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cell1").as("cell"))
      .join(mates, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    val pos = rerank(posScored, 1).select(col("query_id").as("vec_id"),
      col("neighbor_id").as("pos_id"), col("cos").as("pos_cos"))
    // the negative pool is the second cell's MEMBERS (their cell1):
    // never contains the anchor, so no self-filter needed
    val negScored = assigned
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("cell2").as("cell"))
      .join(mates, Seq("cell"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    val neg = rerank(negScored, 1).select(col("query_id").as("vec_id"),
      col("neighbor_id").as("neg_id"), col("cos").as("neg_cos"))
    pos.join(neg, Seq("vec_id"))
      .select(col("vec_id"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"),
        Cross.r6(col("pos_cos") - col("neg_cos")).as("margin"))
  }

  /** IVF coarse assignment: nearest of `nCells` fixed seed centroids by
    * squared L2 (ties → lowest cell id). */
  def ivfAssign(corpus: DataFrame, nCells: Int, dims: Int): DataFrame = {
    val nc = nearestCentroid(col("embedding"), nCells, dims)
    corpus.select(col("vec_id"), col("label"),
      nc.getField("cell").as("cell"),
      Cross.r6(nc.getField("d")).as("dist"))
  }

  /** Incremental IVF index maintenance: fold a CDC delta into an
    * existing assignment table WITHOUT re-assigning the corpus.
    * `baseAssign` is the persisted [[ivfAssign]] output; `changedVecs`
    * are upserted vectors (vec_id, label, embedding — new or updated
    * rows); `deletedIds` are tombstoned vec_ids. Per-key latest-wins:
    * touched keys leave the base via one anti-join, upserts re-assign
    * through the identical centroid arithmetic, deletes just vanish.
    *
    * The law (gate q268): maintain(assign(S), Δ) ≡ assign(apply(S, Δ))
    * — incremental output is row-identical to re-assigning the updated
    * snapshot. At 100 TB that is the difference between touching
    * O(|Δ|) vectors per ingest tick and re-quantizing the corpus: the
    * anti-join shuffles on vec_id (or prunes by partition when the
    * assignment table is id-partitioned) and the only new centroid
    * math is the delta's. */
  def ivfMaintain(baseAssign: DataFrame, changedVecs: DataFrame,
      deletedIds: DataFrame, nCells: Int, dims: Int): DataFrame = {
    val touched = changedVecs.select("vec_id")
      .unionByName(deletedIds.select("vec_id")).distinct()
    baseAssign.join(touched, Seq("vec_id"), "left_anti")
      .unionByName(ivfAssign(changedVecs, nCells, dims))
  }

  /** [[ivfAssign]] carrying the embedding column — the SERVED
    * inverted-list row shape (cell id + vector payload in one row),
    * what a log-structured ANN index stores and [[ivfTopKServed]]
    * probes: assignment batches (full builds and [[ivfMaintain]]-style
    * CDC ticks) fold into a latest-wins-per-vec_id serving table, and
    * probes read the table's stored cells instead of re-quantizing the
    * corpus (q334 drives the full topology). */
  def ivfAssignWithVec(corpus: DataFrame, nCells: Int, dims: Int): DataFrame = {
    val nc = nearestCentroid(col("embedding"), nCells, dims)
    corpus.select(col("vec_id"), col("label"),
      nc.getField("cell").as("cell"), col("embedding"))
  }

  /** IVF probe FROM A SERVED INDEX: `served` already carries its
    * `cell` column ([[ivfAssignWithVec]] rows — the compacted
    * inverted-list table), so the corpus side does NO centroid math at
    * probe time and a metadata predicate applied to `served` reaches
    * its parquet scan as a pushed filter (PlanSpec pins it over the
    * compacted base). Query cells still derive from the query
    * embedding (`nProbe` nearest — the recall knob); results are
    * identical to [[ivfTopK]] over the same logical corpus because the
    * stored cells came from the identical assignment arithmetic. */
  def ivfTopKServed(queries: DataFrame, served: DataFrame, k: Int,
      nCells: Int, dims: Int, nProbe: Int = 1): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells,
      s"need 1 <= nProbe <= nCells, got $nProbe/$nCells")
    val qb = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      explode(nearestCells(col("embedding"), nCells, dims, nProbe).getField("cell")).as("cell"))
    val cb = served.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ne"), col("cell"))
    val scored = qb.join(cb, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    rerank(scored, k)
  }

  /** RECALL-CURVE report for a served IVF index — the governance table
    * an operator actually tunes `nProbe` by: for each probe depth in
    * `nProbes`, the ANN result set is scored against the EXACT
    * brute-force top-k over the SAME served table, alongside the probe
    * cost (candidate rows scanned before rerank — what each recall
    * point costs). One row per sweep point: (n_probe, k, matched,
    * truth_rows, cand_rows, recall). nProbe = nCells is exhaustive, so
    * that point's recall is 1.0 by construction — a built-in
    * self-check the gate's oracle re-derives.
    *
    * Scale shape: the truth pass is ONE brute-force top-k (queries
    * broadcast, corpus scanned once); each sweep arm reuses the stored
    * cells (no re-quantization) and reduces to three algebraic counts —
    * the arms are independent single-row aggregates unioned at the
    * end, so the report costs |sweep| probe joins over the same
    * served relation, nothing quadratic. Recall on a 100 TB corpus
    * would swap the exact truth pass for a held-out query sample — the
    * report shape is unchanged. */
  def recallCurveServed(queries: DataFrame, served: DataFrame, k: Int,
      nCells: Int, dims: Int, nProbes: Seq[Int]): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(p => p >= 1 && p <= nCells),
      s"need probe depths within [1, $nCells], got $nProbes")
    val q = queries.select(col("vec_id"), col("embedding"))
    val truthIds = bruteForceTopK(q, served, k)
      .select("query_id", "neighbor_id")
      .localCheckpoint(true) // read by every sweep arm
    nProbes.map { p =>
      val gotIds = ivfTopKServed(q, served, k, nCells, dims, p)
        .select("query_id", "neighbor_id")
      val cand = q.select(col("vec_id").as("query_id"),
          explode(nearestCells(col("embedding"), nCells, dims, p)
            .getField("cell")).as("cell"))
        .join(served.select(col("vec_id").as("neighbor_id"), col("cell")), "cell")
        .filter(col("query_id") =!= col("neighbor_id"))
      gotIds.join(truthIds, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("matched"))
        .crossJoin(truthIds.agg(count(lit(1)).as("truth_rows")))
        .crossJoin(cand.agg(count(lit(1)).as("cand_rows")))
        .select(lit(p).as("n_probe"), lit(k).as("k"), col("matched"),
          col("truth_rows"), col("cand_rows"),
          graft.core.Cross.r6(col("matched").cast("double") /
            col("truth_rows").cast("double")).as("recall"))
    }.reduce(_ unionByName _)
  }

  /** The query's `p` nearest cells (d asc, cell asc — the same total
    * order as [[nearestCentroid]]'s min). Per-row fold + array_sort on
    * (d, cell) structs, no shuffle. */
  private def nearestCells(emb: Column, nCells: Int, dims: Int, p: Int): Column =
    slice(array_sort(array((0 until nCells).map { c =>
      struct(VectorFns.sqDistLit(emb, HashFns.litVector(s"centroid-$c", dims)).as("d"),
        lit(c).as("cell"))
    }: _*)), 1, p)

  /** IVF search: the corpus lives in its nearest cell's inverted list;
    * each query probes its `nProbe` nearest cells (the standard IVF recall
    * knob — nProbe=1 is the fastest/lowest-recall point, nProbe=nCells is
    * exhaustive and equals [[bruteForceTopK]]). Exact cosine re-rank over
    * the probed candidates. Same join shape as [[lshTopK]] — a shuffle on
    * cell id (queries replicated nProbe×, never the corpus), never a
    * cartesian. Each corpus vector sits in exactly one cell and probe
    * cells are distinct, so no candidate dedup is needed. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int, dims: Int, nProbe: Int = 1): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells, s"need 1 <= nProbe <= nCells, got $nProbe/$nCells")
    val cell = nearestCentroid(col("embedding"), nCells, dims).getField("cell")
    val qb = queries.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
      explode(nearestCells(col("embedding"), nCells, dims, nProbe).getField("cell")).as("cell"))
    val cb = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ne"), cell.as("cell"))
    val scored = qb.join(cb, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    rerank(scored, k)
  }

  /** Metadata-FILTERED IVF probe — "top-k neighbors among rows
    * satisfying a predicate" (label = class, lang = en, quality above
    * threshold: the filtered-search shape every production vector
    * store serves). This is the PRE-filter strategy: the predicate
    * restricts the corpus side BEFORE the cell join, so a
    * scan-pushable predicate reaches the parquet scan (PlanSpec pins
    * `PushedFilters` on the corpus read) and every inverted list
    * shrinks before any distance math — the result is EXACTLY the
    * top-k of the filtered corpus within the probed cells, at any
    * selectivity. The alternative (post-filtering an unfiltered
    * top-k') is wrong at any fixed overfetch: a query whose k'
    * nearest all fail the predicate under-fills, and the overfetch
    * that guarantees k grows unboundedly as the filter gets rarer.
    * Pre-filtering costs nothing here because IVF scoring is already
    * cell-local — selectivity only makes the probe cheaper. */
  def ivfTopKFiltered(queries: DataFrame, corpus: DataFrame, pred: Column,
      k: Int, nCells: Int, dims: Int, nProbe: Int = 1): DataFrame =
    ivfTopK(queries, corpus.filter(pred), k, nCells, dims, nProbe)

  /** IVF probe over a CELL-CO-LOCATED physical layout: corpus and probe
    * batch both persist bucketed BY CELL ([[Layout.bucketedWrite]]), so
    * the inverted-list join meets bucket-to-bucket with ZERO Exchange —
    * "the inverted list IS the partition". This is the layout a 100 TB
    * ANN index wants: the per-probe-batch cost becomes a merge of
    * co-sorted buckets plus the bounded re-rank, and neither the corpus
    * nor the candidate stream ever reshuffles; only the ≤ k-per-query
    * re-rank aggregation exchanges (keyed on query, inherently). Search
    * results are identical to [[ivfTopK]] at nProbe=1 — the layout
    * changes WHERE the join happens, never what it returns. */
  def ivfTopKBucketed(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int, dims: Int, buckets: Int = 8,
      tablePrefix: String = "graft_ivf_bkt"): DataFrame = {
    val spark = corpus.sparkSession
    val cell = nearestCentroid(col("embedding"), nCells, dims).getField("cell")
    Layout.bucketedWrite(corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ne"), cell.as("cell")),
      s"${tablePrefix}_corpus", "cell", buckets)
    Layout.bucketedWrite(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"), cell.as("cell")),
      s"${tablePrefix}_queries", "cell", buckets)
    val scored = spark.table(s"${tablePrefix}_queries").hint("merge")
      .join(spark.table(s"${tablePrefix}_corpus").hint("merge"), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", VectorFns.cosine(col("qe"), col("ne")))
    rerank(scored, k)
  }

  // ---- Product quantization (PQ): the compression tier below int8 ----
  // The vector splits into m subspaces; each subspace has its own tiny
  // codebook, and a vector's code is m small integers (m bytes at
  // k ≤ 256) instead of dims floats — the billion-vector memory lever.
  // Search is ADC (asymmetric distance computation): the query stays
  // float, each encoded row's approximate distance is the sum of its
  // subspace centroids' distances to the query's subvectors.

  /** Deterministic seed codebooks: m × k centroids of `subDims` dims
    * (literal vectors, shared with the oracle). */
  def pqSeedCodebooks(m: Int, k: Int, subDims: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m, k)((s, c) => HashFns.litVector(s"pq-$s-$c", subDims))

  /** Per-subspace Lloyd-trained codebooks: [[ivfTrain]] run on each
    * subvector slice independently (the PQ training recipe). */
  def pqTrain(corpus: DataFrame, m: Int, k: Int, subDims: Int,
      iters: Int): Array[Array[Array[Double]]] =
    (0 until m).map { s =>
      ivfTrain(corpus.select(col("vec_id"),
        slice(col("embedding"), s * subDims + 1, subDims).as("embedding")), k, subDims, iters)
    }.toArray

  /** Argmin centroid of subspace `s` — same (d, cell) struct-min total
    * order as [[nearestCellOf]] (r6 distance, ties → lowest code). */
  private def pqCode(emb: Column, s: Int, cents: Array[Array[Double]],
      subDims: Int): Column = {
    val sub = slice(emb, s * subDims + 1, subDims)
    array_min(array(cents.zipWithIndex.map { case (w, c) =>
      struct(Cross.r6(VectorFns.sqDistLit(sub, w)).as("d"), lit(c).as("cell"))
    }: _*)).getField("cell")
  }

  /** Encode the corpus: (vec_id, c0 … c(m−1)) — one small integer per
    * subspace, all inside a single codegen'd projection (no shuffle,
    * the [[Lsh.signatureColsFromHashes]] discipline). */
  def pqEncode(corpus: DataFrame, cb: Array[Array[Array[Double]]],
      subDims: Int): DataFrame =
    corpus.select(col("vec_id") +: cb.zipWithIndex.map { case (cents, s) =>
      pqCode(col("embedding"), s, cents, subDims).as(s"c$s")
    }.toIndexedSeq: _*)

  /** IVF-PQ encode — the composite index layout of billion-scale ANN
    * deployments: each vector stores its coarse cell (the [[ivfAssign]]
    * quantizer) plus the PQ codes of its RESIDUAL (vector minus its
    * cell's centroid). Residuals concentrate around zero, so the same
    * tiny codebooks quantize them far more accurately than raw vectors
    * — at search time a query visits a cell's inverted list and scores
    * the residual codes. Still one codegen'd projection per row: coarse
    * argmin (per-row literal fold), residual (zip_with against the
    * assigned centroid literal), and m subspace argmins — no shuffle
    * anywhere. Returns (vec_id, cell, c0 … c(m−1)). */
  def ivfPqEncode(corpus: DataFrame, nCells: Int, dims: Int,
      cb: Array[Array[Array[Double]]], subDims: Int): DataFrame = {
    val coarse = seedCentroids(nCells, dims)
    val resid = coalesce(coarse.zipWithIndex.map { case (w, c) =>
      when(col("cell") === c,
        zip_with(col("embedding"), typedLit(w), (x, y) => x.cast("double") - y))
    }: _*)
    corpus
      .withColumn("cell", nearestCentroid(col("embedding"), nCells, dims).getField("cell"))
      .withColumn("res", resid)
      .select(col("vec_id") +: col("cell") +: cb.zipWithIndex.map { case (cents, s) =>
        pqCode(col("res"), s, cents, subDims).as(s"c$s")
      }.toIndexedSeq: _*)
  }

  /** IVF-PQ search: the query assigns to its coarse cell, takes its own
    * RESIDUAL against that cell's centroid, and ADC-scores only the
    * cell's inverted list (the [[ivfPqEncode]] codes) — cell equi-join
    * plus code scan, the two-level pruning that makes billion-vector
    * search tractable. Same decimal-exact ADC arithmetic as
    * [[pqAdcTopK]]. */
  def ivfPqTopK(queries: DataFrame, encoded: DataFrame, nCells: Int,
      dims: Int, cb: Array[Array[Array[Double]]], subDims: Int, k: Int): DataFrame = {
    val coarse = seedCentroids(nCells, dims)
    val qres = coalesce(coarse.zipWithIndex.map { case (w, c) =>
      when(col("cell") === c,
        zip_with(col("embedding"), typedLit(w), (x, y) => x.cast("double") - y))
    }: _*)
    val qb = broadcast(queries
      .withColumn("cell", nearestCentroid(col("embedding"), nCells, dims).getField("cell"))
      .withColumn("qres", qres)
      .select(col("vec_id").as("query_id"), col("cell"), col("qres")))
    val joined = qb.join(encoded.withColumnRenamed("vec_id", "neighbor_id"), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
    val terms = cb.zipWithIndex.map { case (cents, s) =>
      val sub = slice(col("qres"), s * subDims + 1, subDims)
      coalesce(cents.zipWithIndex.map { case (w, c) =>
        when(col(s"c$s") === c, Cross.r6(VectorFns.sqDistLit(sub, w)))
      }: _*)
    }
    val dist = terms
      .map(_.cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .reduce(_ + _).cast("double")
    rerank(joined.withColumn("cos", -dist), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        Cross.r6(-col("cos")).as("adist"))
  }

  /** ADC top-k over an encoded corpus: per (query, encoded row), the
    * approximate distance is Σ_s sqDist(query subvector, centroid of
    * code c_s) — each subspace term r6-rounded, the sum accumulated in
    * DECIMAL so it is order-free and engine-exact. The sweep is a
    * broadcast-queries scan of the m-byte codes (never the floats), and
    * the top-k is the bounded [[graft.plans.TopKAgg]] heap (negated
    * distance: largest weight ≡ smallest distance, ties → smallest
    * neighbor id — the oracle's (adist, neighbor_id) order). */
  /** ADC shortlist + EXACT re-rank — the "refine" step that completes
    * a production PQ pipeline: the cheap code-only ADC sweep nominates
    * `shortlist` candidates per query, then ONLY those rows join back
    * to the float corpus and re-rank by exact squared L2. At scale the
    * expensive float vectors are touched for |queries|·shortlist rows
    * instead of the whole corpus (a shuffled equi-join on neighbor_id,
    * shortlist ≪ corpus), which is the entire point of encoding the
    * corpus in the first place. Ranks/ties follow the same
    * (dist, neighbor_id) order as every other kNN gate. */
  def pqAdcRefineTopK(queries: DataFrame, encoded: DataFrame,
      corpus: DataFrame, cb: Array[Array[Array[Double]]], subDims: Int,
      shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val short = pqAdcTopK(queries, encoded, cb, subDims, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val scored = short
      .join(corpus.select(col("vec_id").as("query_id"), col("embedding").as("qe")),
        "query_id")
      .join(corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")),
        "neighbor_id")
      .withColumn("cos", -Cross.r6(VectorFns.sqDist(col("qe"), col("ne"))))
    rerank(scored, k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        Cross.r6(-col("cos")).as("dist"))
  }

  def pqAdcTopK(queries: DataFrame, encoded: DataFrame,
      cb: Array[Array[Array[Double]]], subDims: Int, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val joined = q.crossJoin(encoded.withColumnRenamed("vec_id", "neighbor_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
    val terms = cb.zipWithIndex.map { case (cents, s) =>
      val sub = slice(col("qe"), s * subDims + 1, subDims)
      coalesce(cents.zipWithIndex.map { case (w, c) =>
        when(col(s"c$s") === c, Cross.r6(VectorFns.sqDistLit(sub, w)))
      }: _*)
    }
    val dist = terms
      .map(_.cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .reduce(_ + _).cast("double")
    rerank(joined.withColumn("cos", -dist), k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        Cross.r6(-col("cos")).as("adist"))
  }
}
