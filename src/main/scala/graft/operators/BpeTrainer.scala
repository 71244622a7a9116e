package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016,
  * arXiv:1508.07909) in the shape real trainers use at corpus scale:
  * the CORPUS pass is one distributed word-count aggregate (the only
  * thing that touches 100 TB — [[graft.queries.TextQueries.bpePairs]]
  * is its oracle-gated first iteration), and the merge loop then runs
  * on the counted VOCABULARY — millions of rows, not billions — on the
  * driver, exactly like HF tokenizers / SentencePiece train on one
  * node after their distributed count. A vocabulary that overflows the
  * driver budget fails loudly (the production answer is min-frequency
  * pruning, which the `minFreq` knob provides, not a distributed merge
  * loop that re-shuffles the vocab thousands of times).
  *
  * No end-of-word marker: merges never cross word boundaries here and
  * symbols concatenate back to the word (a documented simplification
  * of the paper's `</w>` variant; the merge dynamics are identical
  * within words).
  */
object BpeTrainer {

  /** One learned merge: `left`+`right` fused, in rank order. */
  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Driver-budget cap for the collected vocabulary (same guard family
    * as TextQueries.maxDriverPairs): ~4M distinct words is ~200 MB of
    * split-symbol arrays — comfortably driver-sized, while a corpus
    * whose vocab exceeds it needs `minFreq` pruning first. */
  val maxVocabRows: Long = 4000000L

  /** Distributed corpus pass: whitespace word counts, optionally
    * frequency-pruned (the standard vocab-bound for BPE training —
    * hapax noise adds nothing to merge statistics). */
  def wordCounts(docs: DataFrame, textCol: String, minFreq: Long = 1L): DataFrame =
    docs
      .select(explode(split(trim(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minFreq)

  /** Learn `nMerges` merges from the counted vocabulary. Deterministic:
    * the argmax pair breaks frequency ties to the lexicographically
    * smallest (left, right) — partition order can never change the
    * learned tokenizer. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minFreq: Long = 1L, maxCollect: Long = maxVocabRows): Seq[Merge] = {
    val wc = wordCounts(docs, textCol, minFreq)
    val capped = math.min(maxCollect + 1, Int.MaxValue.toLong).toInt
    val rows = wc.limit(capped).collect()
    if (rows.length > maxCollect)
      throw new IllegalStateException(
        s"vocabulary exceeds the driver budget ($maxCollect rows); " +
          "raise minFreq to prune rare words before training")
    trainLocal(rows.map(r => (r.getString(0), r.getLong(1))).toSeq, nMerges)
  }

  /** The merge loop over an in-memory (word, count) vocabulary — split
    * out so specs can drive it without a session. */
  def trainLocal(vocab: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    // each word as its current symbol segmentation (starts as chars)
    var segs: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (w.map(_.toString).toArray, c) }.toArray
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    while (rank < nMerges) {
      val pairFreq = scala.collection.mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (s, c) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          pairFreq.update(k, pairFreq.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairFreq.isEmpty) return merges.result()
      val ((l, r), f) = pairFreq.minBy { case ((a, b), n) => (-n, a, b) }
      merges += Merge(rank, l, r, f)
      val fused = l + r
      segs = segs.map { case (s, c) =>
        if (s.length < 2) (s, c)
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
              out += fused; i += 2
            } else { out += s(i); i += 1 }
          }
          (out.toArray, c)
        }
      }
      rank += 1
    }
    merges.result()
  }

  /** Segment a word with a learned merge list: apply merges in rank
    * order (each exhaustively, left-to-right — the same order training
    * used, so encoding a training word reproduces its final training
    * segmentation). */
  def encode(word: String, merges: Seq[Merge]): Seq[String] = {
    var s: Array[String] = word.map(_.toString).toArray
    merges.sortBy(_.rank).foreach { m =>
      if (s.length >= 2) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == m.left && s(i + 1) == m.right) {
            out += (m.left + m.right); i += 2
          } else { out += s(i); i += 1 }
        }
        s = out.toArray
      }
    }
    s.toSeq
  }
}
