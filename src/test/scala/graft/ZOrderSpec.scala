package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder
import graft.queries.AnalyticsQueries

/** Z-order layout: bit-algebra correctness against a Scala reference,
  * prune losslessness against the direct predicate, prune
  * effectiveness, and the property the layout exists for — files whose
  * footer min/max boxes skip on BOTH dimensions.
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._
  private val sf = SparkSuite.sf0001

  private def refInterleave(ranks: Seq[Long], bits: Int): Long =
    MortonRef.interleave(ranks, bits)

  test("interleave matches the driver-side reference; deinterleave inverts it") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong))
    val df = rows.toDF("a", "b", "c")
      .withColumn("z2", ZOrder.interleave(Seq(col("a"), col("b")), 8))
      .withColumn("z3", ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 8))
      .withColumn("a2", ZOrder.deinterleave(col("z2"), 0, 2, 8))
      .withColumn("b2", ZOrder.deinterleave(col("z2"), 1, 2, 8))
      .withColumn("a3", ZOrder.deinterleave(col("z3"), 0, 3, 8))
    val got = df.collect()
    got.foreach { r =>
      val (a, b, c) = (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"))
      assert(r.getAs[Long]("z2") == refInterleave(Seq(a, b), 8))
      assert(r.getAs[Long]("z3") == refInterleave(Seq(a, b, c), 8))
      assert(r.getAs[Long]("a2") == a && r.getAs[Long]("b2") == b
        && r.getAs[Long]("a3") == a)
    }
  }

  test("prefix identity: deinterleave of a cell prefix equals the rank prefix") {
    // q_zorder_prune filters on rank >> dropBits instead of
    // deinterleave(cell) (codegen size); this is the identity that
    // substitution rests on: deinterleave(z >> n*drop, i, n, bits-drop)
    // == rank_i >> drop.
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = rows.toDF("a", "b")
      .withColumn("z", ZOrder.interleave(Seq(col("a"), col("b")), 8))
      .withColumn("cell", shiftright(col("z"), 8))
      .select(
        (ZOrder.deinterleave(col("cell"), 0, 2, 4) === shiftright(col("a"), 4)).as("ia"),
        (ZOrder.deinterleave(col("cell"), 1, 2, 4) === shiftright(col("b"), 4)).as("ib"))
    assert(df.where(!col("ia") || !col("ib")).count() == 0)
  }

  test("withZValue: ranks bounded, z in [0, 2^(n*bits)), degenerate column ranks 0") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey")
      .withColumn("flat", lit(7L)) // degenerate hi == lo dimension
    val z = ZOrder.withZValue(df, Seq("l_partkey", "l_suppkey", "flat"), bits = 4)
    val bad = z.where(col("_z") < 0 || col("_z") >= (1L << 12)).count()
    assert(bad == 0)
    // the degenerate dimension contributes nothing: its deinterleaved rank is 0
    val flatRank = z.select(ZOrder.deinterleave(col("_z"), 2, 3, 4).as("r"))
      .agg(max("r")).as[Long].head()
    assert(flatRank == 0L)
  }

  test("q_zorder_prune: cell prune + residual equals the direct predicate (lossless)") {
    val pruned = AnalyticsQueries.zorderPrune(spark, sf)
    // the direct form: same census, exact predicate only, no cell filter
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_extendedprice")
    val stats = li.agg(
      min(col("l_partkey")).cast("double").as("plo"), max(col("l_partkey")).cast("double").as("phi"),
      min(col("l_suppkey")).cast("double").as("slo"), max(col("l_suppkey")).cast("double").as("shi"))
    val j = li.crossJoin(broadcast(stats))
    val pv = col("l_partkey").cast("double"); val sv = col("l_suppkey").cast("double")
    val direct = j.where(
        pv >= col("plo") + (col("phi") - col("plo")) * 0.25 &&
        pv < col("plo") + (col("phi") - col("plo")) * 0.5 &&
        sv >= col("slo") + (col("shi") - col("slo")) * 0.25 &&
        sv < col("slo") + (col("shi") - col("slo")) * 0.5)
      .withColumn("_ra", ZOrder.linearRank(pv, col("plo"), col("phi"), 8))
      .withColumn("_rb", ZOrder.linearRank(sv, col("slo"), col("shi"), 8))
      .withColumn("cell",
        shiftright(ZOrder.interleave(Seq(col("_ra"), col("_rb")), 8), 8))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
    assert(pruned.count() > 0, "box must match rows at sf0.001")
    assert(pruned.exceptAll(direct).isEmpty && direct.exceptAll(pruned).isEmpty,
      "cell prune must be lossless vs the direct predicate")
  }

  test("cell filter alone is selective: ~(5/16)^2 of rows for the quarter box") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet").select("l_partkey", "l_suppkey")
    val total = li.count()
    val stats = li.agg(
      min(col("l_partkey")).cast("double").as("plo"), max(col("l_partkey")).cast("double").as("phi"),
      min(col("l_suppkey")).cast("double").as("slo"), max(col("l_suppkey")).cast("double").as("shi"))
    val pv = col("l_partkey").cast("double"); val sv = col("l_suppkey").cast("double")
    val j = li.crossJoin(broadcast(stats))
      .withColumn("_ra", ZOrder.linearRank(pv, col("plo"), col("phi"), 8))
      .withColumn("_rb", ZOrder.linearRank(sv, col("slo"), col("shi"), 8))
    def cb(corner: org.apache.spark.sql.Column, lo: String, hi: String) =
      shiftright(ZOrder.linearRank(corner, col(lo), col(hi), 8), 4)
    val bplo = col("plo") + (col("phi") - col("plo")) * 0.25
    val bphi = col("plo") + (col("phi") - col("plo")) * 0.5
    val bslo = col("slo") + (col("shi") - col("slo")) * 0.25
    val bshi = col("slo") + (col("shi") - col("slo")) * 0.5
    val kept = j.where(
      shiftright(col("_ra"), 4).between(cb(bplo, "plo", "phi"), cb(bphi, "plo", "phi")) &&
      shiftright(col("_rb"), 4).between(cb(bslo, "slo", "shi"), cb(bshi, "slo", "shi"))).count()
    // quarter box per dim covers cells 4..8 of 16 => (5/16)^2 ~ 9.8% on
    // uniform keys; allow slack for the tiny-SF key distribution
    assert(kept.toDouble / total < 0.2,
      s"cell filter kept $kept of $total rows — prune not selective")
  }

  test("layout: row-preserving, no _z column, files skip a box on BOTH dimensions") {
    val out = tmpDir("zorder-layout") + "/li"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    ZOrder.layout(li, Seq("l_partkey", "l_suppkey"), out, bits = 16, partitions = 16)
    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    assert(!back.columns.contains("_z"))
    assert(back.schema == li.schema, "layout must not change the schema")
    // per-file min/max boxes — what a footer-stats reader prunes with
    val boxes = back
      .groupBy(input_file_name().as("f"))
      .agg(min("l_partkey").as("plo"), max("l_partkey").as("phi"),
        min("l_suppkey").as("slo"), max("l_suppkey").as("shi"))
      .collect()
    assert(boxes.length >= 8, s"expected >=8 files, got ${boxes.length}")
    val (pLo, pHi) = (boxes.map(_.getAs[Long]("plo")).min, boxes.map(_.getAs[Long]("phi")).max)
    val (sLo, sHi) = (boxes.map(_.getAs[Long]("slo")).min, boxes.map(_.getAs[Long]("shi")).max)
    // quarter box in the middle of both dimensions
    def q(lo: Long, hi: Long, f: Double) = lo + ((hi - lo) * f).toLong
    val (qplo, qphi) = (q(pLo, pHi, 0.25), q(pLo, pHi, 0.5))
    val (qslo, qshi) = (q(sLo, sHi, 0.25), q(sLo, sHi, 0.5))
    val touched = boxes.count { b =>
      b.getAs[Long]("plo") <= qphi && b.getAs[Long]("phi") >= qplo &&
      b.getAs[Long]("slo") <= qshi && b.getAs[Long]("shi") >= qslo }
    assert(touched < boxes.length,
      s"a 2-D quarter box must skip at least one of ${boxes.length} files")
    // and a single-dimension band must ALSO skip files — the property
    // a linear sort on the other column cannot give
    val bandTouched = boxes.count { b =>
      b.getAs[Long]("slo") <= qshi && b.getAs[Long]("shi") >= qslo }
    assert(bandTouched < boxes.length,
      s"a suppkey-only band must skip files too (touched $bandTouched/${boxes.length})")
  }

  test("z-order gates execute without codegen fallback") {
    // The trap this whole file designs around: Catalyst inlines alias
    // trees into every reference (CollapseProject for cheap producers,
    // predicate pushdown unconditionally), so a Morton tree referenced
    // per-term blows janino's method limit and Spark silently falls
    // back to interpreted evaluation — correct answers, ~10x slower.
    // Guard: run both gates with an appender on the codegen logger and
    // require zero compile failures.
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.appender.AbstractAppender
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val app = new AbstractAppender(
        "zorder-codegen-guard", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getLoggerName.endsWith("CodeGenerator")
            && e.getLevel.isMoreSpecificThan(Level.ERROR))
          captured.add(e.getMessage.getFormattedMessage.take(120))
    }
    app.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val root = ctx.getConfiguration.getRootLogger
    root.addAppender(app, Level.ERROR, null)
    ctx.updateLoggers()
    try {
      // noop sink, not count(): count() prunes the orderBy and the
      // aggregate value projections, so it would compile a SMALLER plan
      // than the one the bench executes — the guard must compile the
      // full-column plan
      AnalyticsQueries.zorderCells(spark, sf)
        .write.format("noop").mode("overwrite").save()
      AnalyticsQueries.zorderPrune(spark, sf)
        .write.format("noop").mode("overwrite").save()
    } finally {
      root.removeAppender("zorder-codegen-guard")
      ctx.updateLoggers()
      app.stop()
    }
    assert(captured.isEmpty,
      s"codegen fell back to interpreted: ${captured.peek()}")
  }

  test("non-numeric and over-wide configurations are rejected loudly") {
    val df = Seq(("a", 1L)).toDF("s", "v")
    intercept[IllegalArgumentException] {
      ZOrder.withZValue(df, Seq("s", "v"), 8)
    }
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(col("v"), col("v")), 32) // 64 bits > 63
    }
  }
}
