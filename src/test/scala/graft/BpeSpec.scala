package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE: word-frequency table, nMerges rounds of (argmax
    * adjacent pair by (count DESC, a, b), greedy left-to-right apply). */
  private def refBpe(words: Seq[String], nMerges: Int): Seq[(Int, String, String, Long)] = {
    var seg: Map[Vector[String], Long] = words.groupBy(identity)
      .map { case (w, ws) => (w.split("").toVector, ws.size.toLong) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 0 until nMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- seg; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        if (n >= 2) {
          out += ((r, a, b, n))
          seg = seg.groupMapReduce { case (syms, _) =>
            val acc = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                acc += (a + b); i += 2
              } else { acc += syms(i); i += 1 }
            }
            acc.result()
          }(_._2)(_ + _)
        }
      }
    }
    out.toSeq
  }

  test("train matches the reference algorithm on the classic corpus") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq(Tuple1(words.mkString(" "))).toDF("text")
    val got = Bpe.train(docs, split(col("text"), " "), nMerges = 6)
      .orderBy("rank")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq
    assert(got == refBpe(words, 6))
    // and the merged column really is the concatenation
    val merged = Bpe.train(docs, split(col("text"), " "), nMerges = 2)
      .orderBy("rank").collect()
    assert(merged.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
  }

  test("greedy apply handles overlapping runs (aaa + merge(a,a) -> [aa, a])") {
    val docs = Seq(Tuple1("aaa aaa aaa")).toDF("text")
    val m = Bpe.train(docs, split(col("text"), " "), nMerges = 1)
    val seg = Bpe.segment(docs, split(col("text"), " "), m)
      .collect().map(r => (r.getString(0), r.getSeq[String](2)))
    assert(seg.toSeq == Seq(("aaa", Seq("aa", "a"))))
  }

  test("early stop when no pair reaches minPairFreq") {
    // every word distinct, so every adjacent pair has count 1 < 2
    val docs = Seq(Tuple1("ab cd ef")).toDF("text")
    val m = Bpe.train(docs, split(col("text"), " "), nMerges = 5)
    assert(m.count() == 0L)
  }

  test("segment under the trained merges reproduces the loop's final state") {
    val words = Seq.fill(4)("banana") ++ Seq.fill(3)("bandana")
    val docs = Seq(Tuple1(words.mkString(" "))).toDF("text")
    val m = Bpe.train(docs, split(col("text"), " "), nMerges = 4)
    val seg = Bpe.segment(docs, split(col("text"), " "), m)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    // reference: replay refBpe merges over the same words
    var ref: Map[Vector[String], Vector[String]] =
      words.distinct.map(w => (w.split("").toVector, w.split("").toVector)).toMap
    for ((_, a, b, _) <- refBpe(words, 4)) {
      ref = ref.map { case (k, syms) =>
        val acc = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            acc += (a + b); i += 2
          } else { acc += syms(i); i += 1 }
        }
        (k, acc.result())
      }
    }
    val refByWord = ref.map { case (k, v) => (k.mkString, v) }
    assert(seg == refByWord)
  }

  test("fixed artifact vocab keeps ids stable across batches; OOV maps to -1") {
    val corpus = Seq(Tuple1("abab abab cdcd")).toDF("text")
    val toks = split(col("text"), " ")
    val m = Bpe.train(corpus, toks, nMerges = 2)
    val vocab = Bpe.symbolVocab(corpus, toks, m)
    // two disjoint "batches": without the artifact vocab each derives
    // its own id space (batch 2 never sees batch 1's symbols, so ids
    // renumber); with it, ids agree with the full-corpus encode
    def enc(df: org.apache.spark.sql.DataFrame,
        v: Option[org.apache.spark.sql.DataFrame]) =
      Bpe.encodeDocs(df.withColumn("doc_id", lit(1L)), col("doc_id"),
          toks, m, v)
        .collect().map(_.getSeq[Int](1).toVector).headOption.getOrElse(Vector())
    val b1 = Seq(Tuple1("abab")).toDF("text")
    val b2 = Seq(Tuple1("cdcd")).toDF("text")
    // the corpus doc is "abab abab cdcd": its id sequence must be
    // exactly batch-1's twice then batch-2's, token for token
    val full = enc(corpus, Some(vocab))
    assert(full == enc(b1, Some(vocab)) ++ enc(b1, Some(vocab)) ++
      enc(b2, Some(vocab)),
      "artifact-vocab ids must be the full-corpus id space")
    // the derive-per-call mode renumbers: batch-2-alone ids collide
    // with batch-1 ids (both start at 0) — the bug the artifact fixes
    assert(enc(b2, None).exists(enc(b1, None).contains),
      "per-call derivation renumbers ids (expected, documents the hazard)")
    // OOV: a symbol the training corpus never produced → unk id -1
    val oov = Seq(Tuple1("zz")).toDF("text")
    assert(enc(oov, Some(vocab)).forall(_ == -1),
      "symbols outside the artifact vocab must take the unk id -1")
  }

  test("BpeMergeFold pins the greedy fold semantics merge by merge") {
    // the whole-table replay expression that round 14 swapped in for
    // the nested aggregate() HOF chain: same greedy left-to-right
    // semantics, one planning-time node (optimization guide §4)
    import graft.plans.BpeMergeFold
    def run(syms: Seq[String], ms: Seq[(String, String)]): Seq[String] =
      Seq(Tuple1(syms)).toDF("syms")
        .select(BpeMergeFold.applyMerges(col("syms"), ms).as("out"))
        .collect().head.getSeq[String](0)
    // overlap never chains: "aaa" under (a,a) -> [aa, a]
    assert(run(Seq("a", "a", "a"), Seq(("a", "a"))) == Seq("aa", "a"))
    // a later merge consumes an earlier merge's output
    assert(run("lower".split("").toSeq,
      Seq(("l", "o"), ("lo", "w"), ("e", "r"))) == Seq("low", "er"))
    // no-match and degenerate inputs pass through
    assert(run(Seq("x", "y"), Seq(("a", "b"))) == Seq("x", "y"))
    assert(run(Seq("x"), Seq(("x", "x"))) == Seq("x"))
    assert(run(Seq.empty, Seq(("a", "b"))) == Seq.empty)
    // repeated application inside ONE table: (a,b) then (ab,ab)
    assert(run(Seq("a", "b", "a", "b"), Seq(("a", "b"), ("ab", "ab"))) ==
      Seq("abab"))
  }
}
