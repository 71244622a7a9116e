package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeSeq, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.{
  BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning,
  UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{StructField, StructType}

/** Broadcast variant of the as-of join — the feature-store norm, where
  * the right side is a dimension-sized table (rate curves, quote books,
  * nightly feature snapshots) joined against a fact stream many orders
  * of magnitude larger. The merge-shape [[AsOfJoinExec]] makes BOTH
  * children pay a `ClusteredDistribution` exchange plus a sort; at
  * 100 TB the left fact table's shuffle is the entire cost of the join.
  * This exec instead broadcasts the right side and probes a per-key
  * TIME-SORTED index per left row, so the left side needs **no exchange
  * and no sort at all** — it streams through in whatever partitioning
  * it already has, exactly like the probe side of a broadcast hash
  * join.
  *
  * Physical mechanics: the right child satisfies
  * `BroadcastDistribution(IdentityBroadcastMode)` (one
  * `BroadcastExchangeExec` collects and ships the rows; a reused
  * exchange shares one ship across consumers — Spark 4's exchange
  * accepts only `HashedRelation`/row-array payloads from a mode's
  * `transform`, so the index itself cannot ride the broadcast), and
  * each EXECUTOR builds the [[AsOfBroadcastIndex]] from the shared row
  * array exactly once — memoized in a weak map keyed by the broadcast
  * value, so the index lives and dies with the broadcast block. Build
  * cost is one dimension-sized sort per executor; probe cost per left
  * row is a hash lookup plus an O(log rows-per-key) binary search.
  * Match semantics (direction, tolerance, tiebreak, null-key grouping)
  * are IDENTICAL to the merge exec — AsOfJoinSpec's randomized
  * brute-force test runs against both physical paths.
  */
final case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression],
    tolerance: Option[Long],
    direction: AsOfDirection,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** The whole point: the left child is UNSPECIFIED — no exchange, no
    * sort; only the right child pays, and what it pays is a broadcast.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(Nil, Nil)

  // probe-side pass-through, like BroadcastHashJoin's streamed side
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" ->
      org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"),
    "numMatched" ->
      org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val relation = right.executeBroadcast[Array[InternalRow]]()
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val lTimeExpr = leftTime
    // bind the index-build expressions on the driver; the closure
    // ships them to each executor's one-time build
    val rKeyBound = BindReferences.bindReferences(rightKeys, AttributeSeq(rightOut))
    val rTimeBound = BindReferences.bindReference(rightTime, rightOut)
    val rTbBound = BindReferences.bindReferences(rightTiebreak, AttributeSeq(rightOut))
    val tol = tolerance
    val dir = direction
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    left.execute().mapPartitions({ lIt =>
      val idx = AsOfBroadcastIndex.forRows(
        relation.value, rKeyBound, rTimeBound, rTbBound)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val lTime = BindReferences.bindReference(lTimeExpr, leftOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      // bind against NULLABLE right attrs (same reasoning as the merge
      // exec): a BoundReference that skips its null check would read
      // the null-row's defaults as 0s
      val outProj = UnsafeProjection.create(
        outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
      lIt.map { lrow =>
        val lt = lTime.eval(lrow).asInstanceOf[Long]
        val m = idx.probe(lKeyProj(lrow), lt, dir, tol)
        val chosen: InternalRow = if (m == null) nullRight else m
        outRows += 1
        if (chosen ne nullRight) matched += 1
        outProj(joined(lrow, chosen))
      }
    }, preservesPartitioning = true)
  }
}

/** The probe structure: right rows sorted by (key, time, tiebreak), a
  * parallel epoch-ms array, and a key→row-range hash map. Probe cost
  * per left row: one hash lookup + one binary search over that key's
  * rows.
  */
final class AsOfBroadcastIndex(
    val rows: Array[InternalRow],
    val times: Array[Long],
    keyToRange: java.util.HashMap[UnsafeRow, Array[Int]]) {

  /** First index in [s, e) with times(i) >= lt (e if none). */
  private def lowerBound(s: Int, e: Int, lt: Long): Int = {
    var lo = s; var hi = e
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (times(mid) >= lt) hi = mid else lo = mid + 1
    }
    lo
  }

  /** First index in [s, e) with times(i) > lt (e if none). */
  private def upperBound(s: Int, e: Int, lt: Long): Int = {
    var lo = s; var hi = e
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (times(mid) > lt) hi = mid else lo = mid + 1
    }
    lo
  }

  /** The match for (key, lt) under (direction, tolerance), or null.
    * Within a key the rows are (time, tiebreak)-sorted, so backward's
    * "last at-or-before, ties last-in-tiebreak" is `upperBound - 1`
    * and forward's "first at-or-after, ties first-in-tiebreak" is
    * `lowerBound` — the bounds land exactly on each arm's convention.
    * Nearest compares the two arms; equal distance prefers backward
    * (identical to the merge exec and the brute-force reference).
    */
  def probe(key: UnsafeRow, lt: Long,
      dir: AsOfDirection, tol: Option[Long]): InternalRow = {
    val range = keyToRange.get(key)
    if (range == null) return null
    val s = range(0)
    val e = range(1)
    var back = -1
    if (dir != AsOfDirection.Forward) {
      val ub = upperBound(s, e, lt)
      if (ub > s && tol.forall(t => lt - times(ub - 1) <= t)) back = ub - 1
    }
    var fwd = -1
    if (dir != AsOfDirection.Backward) {
      val lb = lowerBound(s, e, lt)
      if (lb < e && tol.forall(t => times(lb) - lt <= t)) fwd = lb
    }
    if (back >= 0 && fwd >= 0) {
      if (lt - times(back) <= times(fwd) - lt) rows(back) else rows(fwd)
    } else if (back >= 0) rows(back)
    else if (fwd >= 0) rows(fwd)
    else null
  }
}

object AsOfBroadcastIndex {

  /** One memoized index per (broadcast row array, bound key/time/
    * tiebreak expressions). The expressions are part of the key because
    * a REUSED BroadcastExchange hands the SAME row-array instance to
    * every consumer: two as-of joins over one dimension but different
    * time columns (effective_ts vs expiry_ts) would otherwise share one
    * index and the second join's binary searches would run over the
    * wrong column's times — silently wrong matches, no error. Entries
    * under one array are a short list matched by `semanticEquals`
    * (reused-exchange consumers are few).
    */
  private final case class Entry(
      keys: Seq[Expression], time: Expression, tb: Seq[Expression],
      index: AsOfBroadcastIndex)

  /** Per-executor memo, keyed WEAKLY on the array instance the
    * broadcast manager caches, so entries (and their indexes) are
    * collectable exactly when the broadcast block is — no unbounded
    * growth across a long session's many joins.
    */
  private val cache =
    new java.util.WeakHashMap[Array[InternalRow], java.util.ArrayList[Entry]]()

  /** Per-array build monitors: concurrent tasks of the same stage wait
    * for ONE build of their array's index instead of each paying the
    * sort, while builds for DIFFERENT broadcasts proceed in parallel
    * (a single global build lock would serialize unrelated joins'
    * dimension-sized sorts behind one monitor).
    */
  private val slots =
    new java.util.WeakHashMap[Array[InternalRow], Object]()

  private def sameExprs(a: Seq[Expression], b: Seq[Expression]): Boolean =
    a.length == b.length &&
      a.zip(b).forall { case (x, y) => x.semanticEquals(y) }

  def forRows(
      rows: Array[InternalRow],
      boundKeys: Seq[Expression],
      boundTime: Expression,
      boundTiebreak: Seq[Expression]): AsOfBroadcastIndex = {
    def lookup(): AsOfBroadcastIndex = {
      val list = cache.get(rows)
      if (list == null) null
      else {
        var i = 0
        while (i < list.size) {
          val e = list.get(i)
          if (sameExprs(e.keys, boundKeys) && e.time.semanticEquals(boundTime) &&
              sameExprs(e.tb, boundTiebreak)) return e.index
          i += 1
        }
        null
      }
    }
    val slot = slots.synchronized {
      var s = slots.get(rows)
      if (s == null) { s = new Object; slots.put(rows, s) }
      s
    }
    slot.synchronized {
      val hit = cache.synchronized(lookup())
      if (hit != null) hit
      else {
        val built = build(rows, boundKeys, boundTime, boundTiebreak)
        cache.synchronized {
          var list = cache.get(rows)
          if (list == null) {
            list = new java.util.ArrayList[Entry]()
            cache.put(rows, list)
          }
          list.add(Entry(boundKeys, boundTime, boundTiebreak, built))
        }
        built
      }
    }
  }

  /** One sort of the dimension rows by (key, time, tiebreak) — the
    * identical ranking order the merge exec's `requiredChildOrdering`
    * imposes — then a single pass collecting per-key ranges. The
    * shared broadcast array itself is never mutated (other plans may
    * reuse the same exchange); the sort permutes a copied reference
    * array.
    */
  private[plans] def build(
      input: Array[InternalRow],
      boundKeys: Seq[Expression],
      boundTime: Expression,
      boundTiebreak: Seq[Expression]): AsOfBroadcastIndex = {
    val keyProj = UnsafeProjection.create(boundKeys)
    val tbProj = UnsafeProjection.create(boundTiebreak)
    val keySchema = StructType(boundKeys.zipWithIndex.map { case (e, i) =>
      StructField(s"k$i", e.dataType, e.nullable)
    })
    val tbSchema = StructType(boundTiebreak.zipWithIndex.map { case (e, i) =>
      StructField(s"t$i", e.dataType, e.nullable)
    })
    val keyOrd = GenerateOrdering.create(keySchema)
    val tbOrd = GenerateOrdering.create(tbSchema)
    val n = input.length
    val entries = new Array[(UnsafeRow, Long, UnsafeRow, InternalRow)](n)
    var i = 0
    while (i < n) {
      val r = input(i)
      entries(i) = ((keyProj(r).copy(), boundTime.eval(r).asInstanceOf[Long],
        tbProj(r).copy(), r))
      i += 1
    }
    java.util.Arrays.sort(entries,
      new java.util.Comparator[(UnsafeRow, Long, UnsafeRow, InternalRow)] {
        override def compare(
            a: (UnsafeRow, Long, UnsafeRow, InternalRow),
            b: (UnsafeRow, Long, UnsafeRow, InternalRow)): Int = {
          val c = keyOrd.compare(a._1, b._1)
          if (c != 0) c
          else if (a._2 != b._2) java.lang.Long.compare(a._2, b._2)
          else tbOrd.compare(a._3, b._3)
        }
      })
    val rows = new Array[InternalRow](n)
    val times = new Array[Long](n)
    val map = new java.util.HashMap[UnsafeRow, Array[Int]]()
    var start = 0
    i = 0
    while (i < n) {
      rows(i) = entries(i)._4
      times(i) = entries(i)._2
      val isLast = i == n - 1
      if (isLast || keyOrd.compare(entries(i)._1, entries(i + 1)._1) != 0) {
        map.put(entries(start)._1, Array(start, i + 1))
        start = i + 1
      }
      i += 1
    }
    new AsOfBroadcastIndex(rows, times, map)
  }
}
