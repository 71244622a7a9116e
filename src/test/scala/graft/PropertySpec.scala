package graft

import graft.functions.WordNGrams
import graft.model._
import org.apache.spark.unsafe.types.UTF8String

import java.time.temporal.ChronoUnit

/** Randomized property checks (seeded, deterministic) for the pure
  * kernels: key codec round-trip and the native n-gram expression vs an
  * independent model, across adversarial token shapes (doubled spaces,
  * unicode, empty tokens, 1-char tokens).
  */
class PropertySpec extends SparkSuite {

  private val rnd = new scala.util.Random(20260812L)

  test("BackupKey round-trips for random instants, units, and codecs") {
    val units = Seq(ChronoUnit.SECONDS, ChronoUnit.MINUTES, ChronoUnit.HOURS, ChronoUnit.DAYS)
    (1 to 500).foreach { _ =>
      val ts = BackupKey.ofEpochMillis(math.abs(rnd.nextLong()) % 4102444800000L) // < year 2100
      val gz = if (rnd.nextBoolean()) Some(Gzip) else None
      val conf: TimeConfiguration =
        if (rnd.nextBoolean()) ChronoUnitSlice(units(rnd.nextInt(units.size)))
        else PeriodFromFirst(1 + rnd.nextInt(100000))
      val key = BackupKey.calculateKey(ts, conf, gz)
      assert(key.endsWith(if (gz.isDefined) ".json.gz" else ".json"))
      val back = BackupKey.keyToOffsetDateTime(key)
      val expect = conf match {
        case ChronoUnitSlice(u) => ts.truncatedTo(u)
        case _                  => ts
      }
      assert(back.toInstant == expect.toInstant, s"key '$key' round-trip mismatch")
    }
  }

  test("word_ngrams equals the split+sliding+distinct model on random text") {
    val alphabets = Seq("abc", "αβγ", "日本語", "a1-", "x")
    def randToken(): String = {
      val a = alphabets(rnd.nextInt(alphabets.size))
      (0 until (1 + rnd.nextInt(4))).map(_ => a(rnd.nextInt(a.length))).mkString
    }
    (1 to 500).foreach { _ =>
      val nTok = rnd.nextInt(12)
      val sb = new StringBuilder
      if (rnd.nextInt(5) == 0) sb.append("  ") // leading spaces
      (0 until nTok).foreach { i =>
        if (i > 0) sb.append(" " * (1 + rnd.nextInt(3))) // 1-3 spaces
        sb.append(if (rnd.nextInt(8) == 0) "" else randToken()) // occasional empty
      }
      if (rnd.nextInt(5) == 0) sb.append(" ")
      val s = sb.toString
      val n = 1 + rnd.nextInt(4)
      val got = WordNGrams.ngrams(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val model = s.trim.split(" ", -1).toSeq.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq.distinct
      assert(got == model, s"mismatch for n=$n text='$s'")
    }
  }

  test("BPE training is vocab-order invariant; encode always reassembles the word") {
    import graft.operators.BpeTrainer
    def randWord(): String = {
      val alpha = "abcd" // small alphabet forces heavy pair collisions
      (0 until 1 + rnd.nextInt(8)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    (1 to 60).foreach { _ =>
      val vocab = (1 to 2 + rnd.nextInt(20))
        .map(_ => (randWord(), 1L + rnd.nextInt(9)))
        .distinctBy(_._1)
      val n = 1 + rnd.nextInt(8)
      val merges = BpeTrainer.trainLocal(vocab, n)
      // the claimed determinism: ANY vocab ordering learns the same merges
      val shuffled = rnd.shuffle(vocab)
      assert(BpeTrainer.trainLocal(shuffled, n) == merges,
        s"order-dependent merges for vocab $vocab")
      // encode must reassemble EVERY word, seen or unseen
      (vocab.map(_._1) ++ (1 to 5).map(_ => randWord())).foreach { w =>
        val enc = BpeTrainer.encode(w, merges)
        assert(enc.mkString == w, s"encode lost content: '$w' -> $enc")
        assert(enc.nonEmpty || w.isEmpty)
      }
    }
  }

  test("misra-gries invariants hold on random streams under random merge trees") {
    import graft.functions.{FrequentItemsAggregator, MGState}
    (1 to 50).foreach { trial =>
      val k = 1 + rnd.nextInt(12)
      val vocab = 1 + rnd.nextInt(40)
      val n = 50 + rnd.nextInt(2000)
      // zipf-ish skew so some trials have true heavies, some don't
      val items = Seq.fill(n)(s"t${(math.pow(rnd.nextDouble(), 3) * vocab).toInt}")
      val agg = FrequentItemsAggregator(k)
      // random partition split + pairwise merges in random order
      def fold(xs: Seq[String]): MGState = xs.foldLeft(agg.zero)(agg.reduce)
      val parts = items.grouped(1 + rnd.nextInt(items.size)).map(fold).toIndexedSeq
      val merged = parts.reduceLeft(agg.merge)
      val exact = items.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      assert(merged.n == n, s"trial $trial: n mismatch")
      assert(merged.counters.size <= k, s"trial $trial: > k counters")
      exact.foreach { case (w, t) =>
        val est = merged.counters.getOrElse(w, 0L)
        assert(est <= t, s"trial $trial: $w overestimated")
        assert(est >= t - n / (k + 1),
          s"trial $trial (k=$k n=$n): $w est=$est true=$t bound=${t - n / (k + 1)}")
      }
      // the guarantee the two-pass consumers rely on
      exact.filter { case (_, t) => t * (k + 1) > n }.keys.foreach { w =>
        assert(merged.counters.contains(w), s"trial $trial: heavy $w lost")
      }
    }
  }

  test("ZOrder interleave/deinterleave: reference equality, inversion, prefix identity over random widths") {
    import org.apache.spark.sql.functions._
    import graft.operators.ZOrder
    import spark.implicits._
    def ref(ranks: Seq[Long], bits: Int): Long = MortonRef.interleave(ranks, bits)
    (1 to 30).foreach { trial =>
      val n = 1 + rnd.nextInt(4)            // 1..4 dimensions
      val bits = 1 + rnd.nextInt(63 / n)    // any width that fits a long
      val drop = rnd.nextInt(bits)          // prefix-cell coarsening
      val rows = Seq.fill(80)(Seq.fill(n)(
        // & MaxValue, not abs: abs(MinValue) is negative
        if (bits == 63) rnd.nextLong() & Long.MaxValue
        else (rnd.nextLong() & Long.MaxValue) % (1L << bits)))
      val df = rows.map(r => (r.head, r.lift(1).getOrElse(0L),
          r.lift(2).getOrElse(0L), r.lift(3).getOrElse(0L)))
        .toDF("a", "b", "c", "d")
      val ranks = Seq("a", "b", "c", "d").take(n).map(col)
      val out = df.withColumn("z", ZOrder.interleave(ranks, bits))
      val checked = (0 until n).foldLeft(out) { (d, i) =>
        d.withColumn(s"back_$i", ZOrder.deinterleave(col("z"), i, n, bits))
          .withColumn(s"cell_$i",
            ZOrder.deinterleave(shiftright(col("z"), n * drop), i, n, bits - drop))
      }.collect()
      checked.zip(rows).foreach { case (row, in) =>
        assert(row.getAs[Long]("z") == ref(in, bits),
          s"trial $trial n=$n bits=$bits: interleave != reference")
        (0 until n).foreach { i =>
          assert(row.getAs[Long](s"back_$i") == in(i),
            s"trial $trial n=$n bits=$bits dim $i: deinterleave not inverse")
          // the identity q_zorder_prune's rank-prefix filter rests on
          assert(row.getAs[Long](s"cell_$i") == (in(i) >> drop),
            s"trial $trial n=$n bits=$bits drop=$drop dim $i: prefix identity broken")
        }
      }
    }
  }
}
