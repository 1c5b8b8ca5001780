package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.functions.{TextFns, VectorFns}
import graft.operators.{Sampling, TemporalJoins}

/** Property-based invariants for the operator kernels: the unit suites
  * pin specific fixtures; these pin the LAWS (bounds, partitions,
  * orderings, reconstructions) over generated inputs. Generator sizes
  * stay small — each property round-trips through Spark. (Raw scalacheck
  * runner: the scalatest bridge artifact isn't in the offline cache.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val smallN = 40

  private def check(prop: Prop, minSuccessful: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, res.status.toString)
  }

  test("hashSplit partitions every generated key set disjointly and exhaustively") {
    check(forAll(Gen.listOfN(smallN, Gen.chooseNum(Long.MinValue, Long.MaxValue)),
        Gen.choose(1, 7)) { (keys, evalBuckets) =>
      val df = keys.toDF("k").cache()
      val (train, eval_) = Sampling.hashSplit(df, col("k"), evalBuckets, 8)
      val t = train.collect().map(_.getLong(0))
      val e = eval_.collect().map(_.getLong(0))
      df.unpersist()
      Prop(t.length + e.length == keys.length) :| "exhaustive" &&
        Prop(t.toSet.intersect(e.toSet).isEmpty || keys.distinct.length != keys.length) :| "disjoint"
    }, minSuccessful = 10)
  }

  test("clusterSplit never splits a cluster and agrees with the cluster-key hash") {
    check(forAll(Gen.listOfN(smallN,
        Gen.zip(Gen.chooseNum(0L, 1000L), Gen.chooseNum(0L, 12L))),
        Gen.choose(1, 7)) { (rows, evalBuckets) =>
      val df = rows.toDF("doc_id", "cluster").cache()
      val got = Sampling.clusterSplit(df, col("cluster"), evalBuckets, 8)
        .select("doc_id", "cluster", "part")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      df.unpersist()
      val byCluster = got.groupBy(_._2).values
      Prop(got.length == rows.length) :| "exhaustive" &&
        Prop(byCluster.forall(_.map(_._3).distinct.length == 1)) :| "no cluster straddles" &&
        Prop(got.forall(r => r._3 == "train" || r._3 == "eval")) :| "valid parts"
    }, minSuccessful = 10)
  }

  test("chunkTokens covers every token; overlap and bounds hold for any doc") {
    val genToks = Gen.listOfN(30, Gen.identifier.map(_.take(4))).map(_.mkString(" "))
    check(forAll(genToks, Gen.choose(2, 8), Gen.choose(0, 1)) { (text, size, ovRaw) =>
      val overlap = math.min(ovRaw, size - 1)
      val row = Seq(text).toDF("text")
        .select(TextFns.tokens(col("text")).as("tk"),
          TextFns.chunkTokens(TextFns.tokens(col("text")), size, overlap).as("c"))
        .head()
      val toks = row.getSeq[String](0)
      val chunks = row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(1))
      val step = size - overlap
      val rejoined = chunks.zipWithIndex.flatMap { case (ch, i) =>
        val words = if (ch.isEmpty) Seq.empty else ch.split(" ").toSeq
        // drop the overlapped prefix of every chunk after the first
        if (i == 0) words else words.drop(overlap)
      }
      Prop(chunks.forall(c => c.isEmpty || c.split(" ").length <= size)) :| "chunk size bound" &&
        Prop(rejoined == toks || (toks.isEmpty && chunks.size == 1)) :| "lossless coverage" &&
        Prop(chunks.size == math.max(1, (toks.size - overlap + step - 1) / step)) :| "chunk count"
    }, minSuccessful = 20)
  }

  test("quantizeI8 round-trip: codes in [-127,127], reconstruction within scale/2 + eps") {
    val genVec = Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))
    check(forAll(genVec) { vec =>
      val row = Seq(vec).toDF("embedding")
        .select(VectorFns.quantizeI8(col("embedding")).as("q"))
        .select(col("q.scale"), col("q.codes")).head()
      val scale = row.getDouble(0)
      val codes = row.getSeq[Byte](1)
      val maxErr = vec.zip(codes).map { case (x, c) =>
        math.abs(x.toDouble - c * scale)
      }.maxOption.getOrElse(0.0)
      Prop(codes.forall(c => c >= -127 && c <= 127)) :| "code bounds" &&
        // r6 rounding of the ratio adds up to 5e-7 relative slack
        Prop(maxErr <= scale / 2 + scale * 1e-5 + 1e-12) :| s"reconstruction err $maxErr scale $scale"
    }, minSuccessful = 20)
  }

  test("asofJoin equals the naive per-row max-earlier lookup on generated events") {
    val genRows = Gen.listOfN(25, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
    check(forAll(genRows, genRows) { (lRaw, rRaw) =>
      val l = lRaw.zipWithIndex.map { case ((k, t), i) => (k, i.toLong, t) }
      val r = rRaw.zipWithIndex.map { case ((k, t), i) => (k, 1000L + i, t) }
      val got = TemporalJoins.asofJoin(
          l.toDF("k", "lid", "t"), r.toDF("k", "rid", "t").withColumn("tag", col("rid")),
          "k", "t", "t", "lid", "rid", Seq("tag"))
        .collect().map(row => row.getLong(1) -> Option(row.get(3)).map(_.asInstanceOf[Long])).toMap
      val expected = l.map { case (k, lid, t) =>
        val cands = r.filter { case (rk, _, rt) => rk == k && rt <= t }
        lid -> cands.sortBy { case (_, rid, rt) => (rt, rid) }.lastOption.map(_._2)
      }.toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }, minSuccessful = 15)
  }

  test("zValue is a bijection on the bit range and monotone in each axis at the origin") {
    check(forAll(Gen.choose(0L, 255L), Gen.choose(0L, 255L)) { (a, b) =>
      val z = Seq((a, b)).toDF("a", "b")
        .select(graft.operators.Layout.zValue(col("a"), col("b"), 8))
        .head().getLong(0)
      // reconstruct both inputs from the interleaved bits
      val (ra, rb) = (0 until 8).foldLeft((0L, 0L)) { case ((xa, xb), i) =>
        (xa | (((z >> (2 * i)) & 1L) << i), xb | (((z >> (2 * i + 1)) & 1L) << i))
      }
      Prop(ra == a && rb == b) :| s"z=$z reconstructed ($ra,$rb) != ($a,$b)" &&
        Prop(z >= 0 && z < (1L << 16)) :| "range"
    }, minSuccessful = 30)
  }

  test("cdc applyChangeset equals the naive latest-version fold on generated logs") {
    import graft.operators.Cdc
    val genChanges = Gen.listOfN(12,
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(1L, 6L), Gen.choose(0, 99), Gen.prob(0.3)))
    check(forAll(genChanges) { raw =>
      // unique (key, version): the contract; dedup generated collisions
      val changes = raw.groupBy(c => (c._1, c._2)).map(_._2.head).toList
      val snap = (1L to 4L).map(k => (k, k * 10.0)).toList
      val got = Cdc.applyChangeset(snap.toDF("k", "v2"),
          changes.map { case (k, v, p, d) => (k, v, p.toDouble, d) }
            .toDF("k", "version", "v2", "deleted"), "k", "version")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val expected = snap.flatMap { case (k, p0) =>
        val log = (0L, p0, false) +: changes.collect { case (ck, v, p, d) if ck == k => (v, p.toDouble, d) }
        val (v, p, d) = log.maxBy(_._1)
        if (d) None else Some(k -> ((v, p)))
      }.toMap
      Prop(got == expected) :| s"got=$got expected=$expected"
    }, minSuccessful = 15)
  }

  test("packOffsets bins partition the token stream for any sizes") {
    val genSizes = Gen.listOfN(20, Gen.choose(0L, 9L))
    check(forAll(genSizes, Gen.choose(4L, 16L)) { (sizes, binSize) =>
      val docs = sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val out = graft.operators.Packing.packOffsets(
          docs.toDF("id", "ntok"), col("id"), col("ntok"), binSize, bucketSize = 8L)
        .orderBy("id").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val total = sizes.sum
      val prefix = sizes.scanLeft(0L)(_ + _)
      Prop(out.map(_._2).toSeq == prefix.init) :| "starts are the exact prefix sums" &&
        Prop(out.forall { case (n, st, bf, bl) => bf == st / binSize &&
          bl == (st + math.max(n, 1) - 1) / binSize }) :| "bin arithmetic" &&
        Prop(out.lastOption.forall { case (n, st, _, _) => st + n == total }) :| "total"
    }, minSuccessful = 15)
  }

  test("selectUnderBudget equals the flat in-memory greedy prefix for any input") {
    import graft.operators.Curation
    val genDocs = Gen.listOfN(25, Gen.zip(
      Gen.choose(0.0, 1.0).map(q => math.rint(q * 100) / 100.0),
      Gen.choose(0L, 50L)))
    check(forAll(genDocs, Gen.choose(0L, 600L), Gen.choose(1, 16)) {
      (docs, budget, bands) =>
      val df = docs.zipWithIndex.map { case ((q, n), i) => (i.toLong, q, n) }
        .toDF("id", "q", "ntok")
      val got = Curation.selectUnderBudget(df, col("id"), col("q"), col("ntok"),
          budget, bands)
        .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
      // flat reference: sort by (quality desc, id), running prefix sum
      val order = docs.zipWithIndex
        .map { case ((q, n), i) => (i.toLong, q, n) }
        .sortBy { case (i, q, _) => (-q, i) }
      var cum = 0L
      val want = order.map { case (i, _, n) =>
        val r = i -> ((cum, cum + n <= budget)); cum += n; r
      }.toMap
      Prop(got == want) :| s"banded scan must equal flat order (bands=$bands)"
    }, minSuccessful = 15)
  }

  test("chunkSliding laws: coverage, start grid, non-empty chunks, chunk count") {
    import graft.operators.Packing
    val genDoc = Gen.choose(0, 60).map(n => (1 to n).map(i => s"t$i"))
    check(forAll(Gen.listOfN(6, genDoc), Gen.choose(2, 12), Gen.choose(1, 12)) {
      (docs, chunkSize, strideRaw) =>
      val stride = math.min(strideRaw, chunkSize)
      val df = docs.zipWithIndex.map { case (tk, i) => (i.toLong, tk) }
        .toDF("doc_id", "tk")
      val got = Packing.chunkSliding(df, col("doc_id"), col("tk"),
          chunkSize, stride)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
        .groupBy(_._1._1)
      val props = docs.zipWithIndex.map { case (tk, i) =>
        val n = tk.size
        val rows = got.getOrElse(i.toLong, Array.empty).sortBy(_._1._2)
        if (n == 0) Prop(rows.isEmpty) :| s"doc $i empty -> no chunks"
        else {
          val kmax = if (n <= chunkSize) 0L
            else (n - chunkSize + stride - 1L) / stride
          val covered = rows.flatMap { case (_, (_, s, l, _)) => s until (s + l) }.toSet
          Prop(rows.length == kmax + 1) :| s"doc $i chunk count" &&
            Prop(rows.forall { case ((_, ci), (nc, s, l, txt)) =>
              nc == kmax + 1 && s == ci * stride && l > 0 &&
                txt == tk.slice(s.toInt, (s + l).toInt).mkString(" ")
            }) :| s"doc $i grid/text" &&
            Prop(covered == (0L until n.toLong).toSet) :| s"doc $i coverage"
        }
      }
      props.reduce(_ && _)
    }, minSuccessful = 10)
  }

  test("containmentProbe + verify equals brute-force exact containment") {
    import graft.operators.Dedup
    // tiny vocab so cross-doc shingle collisions are common; shingleN=2
    val genDoc = Gen.listOfN(7, Gen.oneOf("a", "b", "c", "d", "e"))
      .map(_.mkString(" "))
    check(forAll(Gen.listOfN(5, genDoc), Gen.listOfN(3, genDoc),
        Gen.oneOf(0.4, 0.6, 0.9)) { (corpusT, probesT, t) =>
      val corpus = corpusT.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      val probes = probesT.zipWithIndex.map { case (s, i) => (100L + i, s) }
        .toDF("doc_id", "text")
      val got = Dedup.verifyContainment(
          Dedup.containmentProbe(probes, Dedup.containerIndex(corpus, 2), 2, t),
          Dedup.containmentSets(probes, 2),
          Dedup.containmentSets(corpus, 2), t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def sh(s: String): Set[String] =
        s.split(" ").sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
      val want = (for {
        (p, pi) <- probesT.zipWithIndex
        (c, ci) <- corpusT.zipWithIndex
        a = sh(p); b = sh(c)
        if a.nonEmpty && b.nonEmpty
        cont = a.intersect(b).size.toDouble / a.size
        // mirror the r6 rounding the operator thresholds on (the exact
        // Spark Round path: shortest-repr BigDecimal, HALF_UP)
        r = java.math.BigDecimal.valueOf(cont + 1e-9)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        if r >= t
      } yield (100L + pi, ci.toLong)).toSet
      Prop(got == want) :| s"t=$t got=$got want=$want"
    }, minSuccessful = 10)
  }

  test("mmrSelect equals the in-memory greedy for any pool") {
    import graft.operators.SimilaritySearch
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x + 1e-9)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    val genVec = Gen.listOfN(3, Gen.choose(-1.0, 1.0).map(v => math.rint(v * 8) / 8.0))
    check(forAll(Gen.listOfN(8, genVec), Gen.oneOf(0.3, 0.7)) { (vecs, lam) =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
      val qv = Seq(Tuple1(Seq(1.0, 0.0, 0.0))).toDF("qne")
      val cands = df.crossJoin(qv)
        .select(col("vec_id"), col("embedding"),
          VectorFns.cosine(col("embedding"), col("qne")).as("rel"))
      val got = SimilaritySearch.mmrSelect(cands, col("vec_id"),
          col("embedding"), col("rel"), k = 3, lambda = lam)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // in-memory greedy over the same normalized doubles
      val normed = vecs.zipWithIndex.flatMap { case (v, i) =>
        val fv = v.map(_.toFloat.toDouble)
        val nrm = math.sqrt(fv.map(x => x * x).sum)
        if (nrm == 0.0) None
        else Some((i.toLong, fv.map(_ / nrm)))
      }
      def dot(a: Seq[Double], b: Seq[Double]): Double =
        a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      val rel = normed.map { case (i, ne) =>
        i -> r6(if (ne.isEmpty) 0.0 else ne.head) }.toMap // q = (1,0,0)
      var sel = List.empty[(Long, Seq[Double])]
      val want = (1 to 3).flatMap { r =>
        val rem = normed.filterNot { case (i, _) => sel.exists(_._1 == i) }
        if (rem.isEmpty) None
        else {
          val scored = rem.map { case (i, ne) =>
            val ms = if (sel.isEmpty) 0.0
              else sel.map(s => r6(dot(ne, s._2))).max
            (i, r6(lam * rel(i) - (1.0 - lam) * ms))
          }
          val (bi, _) = scored.minBy { case (i, m) => (-m, i) }
          sel ::= (bi, normed.find(_._1 == bi).get._2)
          Some((r.toLong, bi))
        }
      }
      Prop(got.toSeq == want) :| s"got=${got.toSeq} want=$want"
    }, minSuccessful = 8)
  }

  test("mmrSelectPerQuery equals mmrSelect on every query slice") {
    import graft.operators.SimilaritySearch
    val genVec = Gen.listOfN(3, Gen.choose(-1.0, 1.0).map(v => math.rint(v * 8) / 8.0))
    check(forAll(Gen.listOfN(9, genVec), Gen.oneOf(0.3, 0.7)) { (vecs, lam) =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
        .toDF("vec_id", "embedding")
      // two fixed anchors → two independent query slices over one pool
      val anchors = Seq((100L, Seq(1.0, 0.0, 0.0)), (101L, Seq(0.0, 1.0, 0.0)))
        .toDF("query_id", "qne")
      val cands = df.crossJoin(anchors)
        .select(col("query_id"), col("vec_id"), col("embedding"),
          VectorFns.cosine(col("embedding"), col("qne")).as("rel"))
      val fleet = SimilaritySearch.mmrSelectPerQuery(cands, k = 3, lambda = lam)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      val single = anchors.collect().map(_.getLong(0)).flatMap { q =>
        SimilaritySearch.mmrSelect(
            cands.filter(col("query_id") === q)
              .select("vec_id", "embedding", "rel"),
            col("vec_id"), col("embedding"), col("rel"), k = 3, lambda = lam)
          .collect()
          .map(r => (q, r.getLong(0)) ->
            (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      }.toMap
      Prop(fleet == single) :| s"fleet=$fleet single=$single"
    }, minSuccessful = 6)
  }

  test("MisraGries guarantees hold for any stream and any partitioning") {
    import graft.operators.Sketches
    // skewed alphabet: few hot keys, some tail
    val genKey = Gen.frequency(
      (8, Gen.const("hot_a")), (5, Gen.const("hot_b")),
      (2, Gen.oneOf("warm_c", "warm_d")),
      (1, Gen.choose(0, 30).map(i => s"cold_$i")))
    check(forAll(Gen.listOfN(120, genKey), Gen.oneOf(2, 4, 8)) { (keys, k) =>
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = keys.size.toLong
      val props = Seq(1, 2, 5).map { parts =>
        val df = keys.toDF("k").repartition(parts)
        val summ = Sketches.misraGries(df, col("k"), k)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val sizeOk = summ.size <= k
        val neverOver = summ.forall { case (kk, est) => est <= exact.getOrElse(kk, 0L) }
        val heavy = exact.filter { case (_, c) => c * (k + 1) > n }
        val recall = heavy.forall { case (kk, c) =>
          summ.get(kk).exists(est => est * (k + 1) >= c * (k + 1) - n) }
        Prop(sizeOk && neverOver && recall) :|
          s"parts=$parts k=$k summ=$summ heavy=$heavy n=$n"
      }
      Prop.all(props: _*)
    }, minSuccessful = 10)
  }

  test("decayed count-min: never-under and partition-independence for any stream") {
    import graft.operators.Analytics
    val hl = 100L
    val genRow = for {
      k <- Gen.frequency((6, Gen.const("hot")), (3, Gen.oneOf("warm_a", "warm_b")),
        (1, Gen.choose(0, 20).map(i => s"cold_$i")))
      t <- Gen.choose(0L, 500L)
    } yield (k, t)
    check(forAll(Gen.listOfN(80, genRow)) { rows =>
      val tMax = rows.map(_._2).max
      // exact decayed mass per key at the global watermark
      val exact = rows.groupBy(_._1).view.mapValues(
        _.map { case (_, t) => math.pow(2.0, (t - tMax).toDouble / hl) }.sum).toMap
      val props = Seq(1, 3, 7).map { parts =>
        val df = rows.toDF("k", "t").repartition(parts)
        val cells = Analytics.decayedCmCells(df, col("k"), col("t"), hl, 3, 8)
        val got = Analytics.decayedCmVerify(cells, df, col("k"), col("t"), hl, 3, 8)
          .collect().map(r => (r.getString(0),
            (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
        val counts = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val flags = got.forall { case (k, (n, nu, le, tk)) =>
          n == counts(k) && nu == 1L && le == 1L && tk == 1L }
        Prop(got.keySet == exact.keySet && flags) :|
          s"parts=$parts got=$got exact=${exact.view.mapValues(m => f"$m%.4f").toMap}"
      }
      Prop.all(props: _*)
    }, minSuccessful = 8)
  }

  test("KMV sketch equals brute-force k-min distinct hashes for any input and partitioning") {
    import graft.operators.Sketches
    def hash64(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    // duplicates on purpose: the sketch must be duplication-insensitive
    val genVal = Gen.choose(0, 25).map(_.toLong)
    check(forAll(Gen.listOfN(60, Gen.zip(Gen.oneOf("s1", "s2", "s3"), genVal)),
        Gen.oneOf(1, 3, 7), Gen.oneOf(4, 8, 64)) { (rows, parts, k) =>
      val df = rows.toDF("key", "v").repartition(parts)
      val got = Sketches.kmvSketch(df, col("key"), col("v"), k)
        .collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
      val want = rows.groupBy(_._1).view.mapValues(
        _.map(t => hash64(t._2.toString)).distinct.sorted.take(k).toList).toMap
      val perKey = got == want
      // mergeability law: re-folding the per-key sketches == the sketch
      // built directly over the whole input
      val merged = Sketches.kmvMerge(
          Sketches.kmvSketch(df, col("key"), col("v"), k), k)
        .collect().head.getSeq[Long](0).toList
      val globalWant = rows.map(t => hash64(t._2.toString))
        .distinct.sorted.take(k).toList
      Prop(perKey && merged == globalWant) :|
        s"k=$k parts=$parts got=$got want=$want merged=$merged global=$globalWant"
    }, minSuccessful = 8)
  }

  test("sliding KMV state is partition-independent and answers every window exactly") {
    import graft.operators.Sketches
    def hash64(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    // small value alphabet + coarse timestamps: duplicates and ts ties on purpose
    val genRow = Gen.zip(Gen.choose(0, 18).map(_.toLong), Gen.choose(100L, 110L))
    check(forAll(Gen.listOfN(70, genRow), Gen.oneOf(1, 3, 7), Gen.oneOf(2, 4)) {
      (rows, parts, k) =>
      val df = rows.toDF("v", "t").repartition(parts)
      val st = Sketches.kmvSlidingState(df, col("v"), col("t"), k)
        .select(explode(col("st")).as("e"))
        .select(col("e.h"), col("e.ts"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toList
      // brute reference: latest ts per hash; keep h iff < k smaller
      // hashes have later-or-equal ts
      val latest = rows.groupBy(r => hash64(r._1.toString))
        .view.mapValues(_.map(_._2).max).toMap
      val want = latest.toList.sortBy(_._1).filter { case (h, t) =>
        latest.count { case (h2, t2) => h2 < h && t2 >= t } < k
      }
      val stateOk = st == want
      // window law: for every start, k smallest kept with ts >= start
      // == k smallest distinct hashes active in the window
      val windowOk = (100L to 111L).forall { start =>
        val fromState = st.filter(_._2 >= start).map(_._1).sorted.take(k)
        val direct = latest.filter(_._2 >= start).keys.toList.sorted.take(k)
        fromState == direct
      }
      Prop(stateOk && windowOk) :|
        s"parts=$parts k=$k st=$st want=$want"
    }, minSuccessful = 12)
  }

  test("removeDuplicatedSpans equals the brute-force reference for any corpus") {
    import graft.operators.Repetition
    // tiny vocab so cross-doc span collisions actually occur
    val genDoc = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))
    check(forAll(Gen.listOfN(5, genDoc), Gen.choose(2, 3)) { (texts, w) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Repetition.removeDuplicatedSpans(df, w)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
      val toks = texts.map(_.split(" ").toSeq)
      val spanDocs = toks.zipWithIndex
        .flatMap { case (ts, d) => ts.sliding(w).filter(_.size == w)
          .map(sp => (sp.mkString(" "), d.toLong)).toSeq.distinct }
        .groupBy(_._1).map { case (sp, xs) =>
          sp -> (xs.map(_._2).distinct.size, xs.map(_._2).min) }
      val want = toks.zipWithIndex.map { case (ts, d) =>
        val covered = ts.sliding(w).zipWithIndex.collect {
          case (sp, j) if sp.size == w &&
            spanDocs.get(sp.mkString(" ")).exists { case (nd, keeper) =>
              nd >= 2 && keeper != d.toLong } =>
            (j until j + w)
        }.flatten.toSet
        val kept = ts.zipWithIndex.collect { case (t, j) if !covered(j) => t }
        d.toLong -> ((kept.size.toLong, kept.mkString(" ")))
      }.toMap
      Prop(got == want) :| "distributed removal must equal brute force"
    }, minSuccessful = 15)
  }

  test("floorEpochSec agrees across the two ts physical encodings for any instant") {
    // the testdata generator has shipped events.ts both as int64 nanos and
    // as timestamp[us]; the loader dispatches on type and BOTH arms must
    // floor to the identical epoch second — including pre-1970 instants,
    // where truncating division would round the wrong way
    check(forAll(Gen.listOfN(smallN,
        Gen.chooseNum(-4102444800000000L, 4102444800000000L))) { micros =>
      val asNanos = micros.map(_ * 1000L).toDF("ts")
        .select(graft.core.Tables.floorEpochSec(
          org.apache.spark.sql.types.LongType).as("sec"))
        .collect().map(_.getLong(0)).toSeq
      val asTs = micros.toDF("us")
        .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
        .select(graft.core.Tables.floorEpochSec(
          org.apache.spark.sql.types.TimestampNTZType).as("sec"))
        .collect().map(_.getLong(0)).toSeq
      val want = micros.map(u => Math.floorDiv(u, 1000000L))
      Prop(asNanos == want) :| s"nanos arm: $asNanos != $want" &&
        Prop(asTs == want) :| s"timestamp arm: $asTs != $want"
    }, minSuccessful = 10)
  }
}
