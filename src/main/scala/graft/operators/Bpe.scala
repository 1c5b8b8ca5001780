package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Byte-pair-encoding vocabulary induction — distributed tokenizer
  * training (Sennrich-style word-level BPE, the subword algorithm behind
  * most LLM tokenizers' training loop).
  *
  * Scale shape (the part that matters at 100 TB): ONE corpus-wide pass
  * aggregates tokens into a frequency-weighted word vocabulary; every
  * merge iteration after that touches only the vocab-sized relation
  * (distinct words × their current segmentation), never the corpus —
  * the classic trick that makes BPE training corpus-size-independent
  * after the first shuffle. Per iteration: adjacent-pair counts are one
  * algebraic aggregation; the winning pair (count DESC, pair ASC — a
  * total order, so ties are deterministic) is ONE collected row of
  * driver loop control (the CC/Lloyd pattern); the merge applies as a
  * left-to-right greedy fold over each word's symbol array. The
  * segmentation is localCheckpoint-ed every few rounds so lineage never
  * grows with merge count.
  *
  * No end-of-word marker is appended (a policy choice, not an
  * algorithmic one — callers wanting '</w>' semantics can suffix words
  * before training).
  */
object Bpe {

  /** Frequency-weighted word vocabulary of a document corpus: one row
    * per distinct token with its corpus count. */
  def wordFreq(docs: DataFrame, toks: Column): DataFrame =
    docs.select(explode(toks).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Left-to-right greedy merge of adjacent (a, b) into the
    * concatenated symbol: state is (accumulated symbols, pending
    * previous symbol); each step either completes a merge, flushes the
    * pending symbol, or starts a new pending one. "aaa" under merge
    * (a,a) → ["aa", "a"], exactly the reference greedy semantics.
    * Evaluated by [[graft.plans.BpeMergeFold]] — round 14 replaced the
    * original per-merge `aggregate()` HOF here because nMerges NESTED
    * lambda folds cost more in driver planning/codegen than the jobs
    * themselves (optimization guide §4; q339 9.7 s warm wall vs 4.3 s
    * job total), and the streaming encode re-paid it per micro-batch.
    * BpeSpec pins the semantics equality. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    graft.plans.BpeMergeFold.applyMerges(syms, Seq((a, b)))

  /** Train `nMerges` BPE merges over the corpus' word vocabulary.
    * Returns (rank, a, b, merged, pair_count) ordered by rank — the
    * merge table a tokenizer consumes — stopping early when no adjacent
    * pair reaches `minPairFreq`. */
  def train(docs: DataFrame, toks: Column, nMerges: Int,
      minPairFreq: Long = 2L): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // initial segmentation: one symbol per character
    var seg = wordFreq(docs, toks)
      .select(col("freq"), split(col("word"), "").as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // adjacent pairs weighted by word frequency (overlapping
      // occurrences all count, as in the reference implementation)
      val best = seg
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(arrays_zip(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))))).as("z"))
        .select(col("z.0").as("a"), col("z.1").as("b"), col("freq"))
        .groupBy("a", "b").agg(sum("freq").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption.filter(_._3 >= minPairFreq) match {
        case Some((a, b, n)) =>
          merges += ((rank, a, b, n))
          val next = seg.select(col("freq"), applyMerge(col("syms"), a, b).as("syms"))
          // truncate lineage every few merges (CC/PageRank discipline);
          // eager checkpoint also materializes before the old blocks
          // could be cleaned
          seg = if ((rank + 1) % 4 == 0) next.localCheckpoint(true) else next
          rank += 1
        case None => done = true
      }
    }
    merges.toSeq.toDF("rank", "a", "b", "pair_count")
      .select(col("rank"), col("a"), col("b"),
        concat(col("a"), col("b")).as("merged"), col("pair_count"))
  }

  /** Segment the word vocabulary with a trained merge table: re-applies
    * the merges in rank order to the initial character segmentation.
    * Returns (word, freq, syms). `mergeTable` must be small (it is
    * nMerges rows by construction) — it is collected to drive the fold,
    * never joined. */
  def segment(docs: DataFrame, toks: Column, mergeTable: DataFrame): DataFrame = {
    val ms = mergeTable.select("rank", "a", "b")
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    wordFreq(docs, toks)
      .select(col("word"), col("freq"),
        graft.plans.BpeMergeFold.applyMerges(
          split(col("word"), ""), ms.toSeq).as("syms"))
  }

  /** Encode EVERY document to its token-id sequence — the artifact a
    * pretraining run actually consumes (per-doc contiguous-id arrays),
    * closing the tokenizer lifecycle that [[train]] (merge table),
    * [[segment]] (vocabulary segmentation), and fertility reporting
    * left open at the word vocabulary.
    *
    * Id space: the distinct symbols of the final segmentation, ids
    * assigned by symbol sort order. That table is bounded by
    * |alphabet| + nMerges rows (each merge mints exactly ONE new
    * symbol type), so it is driver-side loop control by the same
    * argument as the collected merge table, and it bakes into a
    * literal map — the per-word id arrays need no second join.
    *
    * Scale shape: the merge folds run once per DISTINCT word (the
    * [[segment]] vocabulary relation, never the corpus), then ONE
    * equi-join maps each document token occurrence to its word's id
    * array — hash join on `word`, doc side carries only (doc_id, pos),
    * AQE skew-join covers hot words — and ONE groupBy(doc_id)
    * reassembles positionally (sort the collected (pos, ids) structs,
    * flatten). Nothing but the final per-doc arrays ever holds a full
    * document, and those ARE the output. Documents with zero tokens
    * emit nothing (there is no sequence to train on).
    *
    * Returns (doc_id, ids: array<int>). */
  def encodeDocs(docs: DataFrame, id: Column, toks: Column,
      mergeTable: DataFrame, vocab: Option[DataFrame] = None): DataFrame = {
    val seg = segment(docs, toks, mergeTable).select("word", "syms")
      .localCheckpoint(true) // vocab pass runs once, not once per use below
    val vpairs = vocab match {
      case Some(v) => v.select("sym", "id").collect()
        .map(r => (r.getString(0), r.getInt(1)))
      case None => seg.select(explode(col("syms")).as("sym")).distinct()
        .orderBy("sym").collect().map(_.getString(0)).zipWithIndex
    }
    val vmap = map(vpairs.flatMap { case (s, i) =>
      Seq(lit(s), lit(i)) }.toIndexedSeq: _*)
    // OOV symbols (possible only under a FIXED artifact vocab: a doc
    // containing characters the training corpus never produced) take
    // the conventional unk id −1 instead of a silent null
    val segIds = seg.select(col("word"),
      transform(col("syms"), s =>
        coalesce(element_at(vmap, s), lit(-1))).as("wids"))
    docs.select(id.as("doc_id"), posexplode(toks).as(Seq("pos", "word")))
      .join(segIds, "word")
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("wids")))),
        s => s.getField("wids"))).as("ids"))
  }

  /** The training-time SYMBOL VOCABULARY: (sym, id), ids by symbol
    * sort order over the training corpus' final segmentation — the
    * FIXED id space a tokenizer artifact ships. [[encodeDocs]] without
    * an explicit vocab re-derives ids from whatever corpus it encodes,
    * which is correct for a one-shot job but silently re-numbers the
    * id space between jobs (and between micro-batches of a stream);
    * the production contract assigns ids ONCE at train time and every
    * encode job loads them (gate q343 streams batches through the
    * persisted vocab and hash-matches the batch encode). Bounded by
    * |alphabet| + nMerges rows, like the merge table itself. */
  def symbolVocab(docs: DataFrame, toks: Column,
      mergeTable: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    segment(docs, toks, mergeTable)
      .select(explode(col("syms")).as("sym")).distinct()
      .orderBy("sym").collect().map(_.getString(0))
      .zipWithIndex.toSeq.toDF("sym", "id")
  }
}
