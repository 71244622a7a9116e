package graft

import graft.queries.KMeans

/** Lloyd k-means properties on the harness embeddings: deterministic
  * fit, non-increasing objective over iterations, and assignment
  * optimality (each vector's cell is its true nearest centroid).
  */
class KMeansSpec extends SparkSuite {
  import spark.implicits._
  private val sf = SparkSuite.sf0001

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("objective is non-increasing over Lloyd iterations") {
    val costs = (0 to 3).map { iters =>
      KMeans.cost(spark, emb, KMeans.fit(spark, emb, k = 8, iters = iters))
    }
    costs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"objective increased: $costs")
    }
    assert(costs.last < costs.head, s"no improvement at all: $costs")
  }

  test("assignment picks the true nearest centroid") {
    val model = KMeans.fit(spark, emb, k = 8, iters = 2)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    val assigned = KMeans.assign(spark, emb, model).as[(Long, Int)].collect()
    assert(assigned.length == vecs.size)
    def d2(v: Array[Double], c: Array[Double]): Double =
      v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
    assigned.foreach { case (id, cell) =>
      val dists = model.centroids.map(c => d2(vecs(id), c))
      val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      assert(math.abs(dists(cell) - dists(best)) < 1e-9,
        s"vec $id assigned to $cell (d=${dists(cell)}) but nearest is $best (d=${dists(best)})")
    }
  }

  test("fit is deterministic for fixed data and parameters") {
    val a = KMeans.fit(spark, emb, k = 4, iters = 2)
    val b = KMeans.fit(spark, emb, k = 4, iters = 2)
    // avg() partial-sum order can differ at the last ulp across runs;
    // centroids must agree to float tolerance
    a.centroids.zip(b.centroids).foreach { case (x, y) =>
      x.zip(y).foreach { case (p, q) => assert(math.abs(p - q) < 1e-9) }
    }
  }
}
