package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Backward as-of join as a first-class Catalyst operator — the one
  * whole-operator semantics on the board that Spark's built-ins
  * genuinely cannot express as a single relational node (SPARK-22947
  * has been open since 2017; pandas/Polars/QuestDB ship it natively).
  *
  * Semantics: for every left row, attach the LAST right row of the
  * same key whose time is `<= ` the left row's time (ties on right
  * time broken by the explicit tiebreak order — last wins), or nulls
  * when no right row qualifies; an optional tolerance drops matches
  * older than `time - tolerance`.
  *
  * Why a custom node (the SURVEY custom-operator ladder, step c): the
  * composable form — union both sides, null-pad each other's columns,
  * run `last(..., ignoreNulls)` over a running frame, filter the left
  * rows back out ([[graft.queries.AnalyticsQueries.asofJoinViaWindow]])
  * — shuffles the UNION (n+m rows through one exchange), sorts the
  * union, materializes the padded schema, and windows over it. The
  * native operator plans like a sort-merge join instead: each side
  * shuffles ONLY ITSELF on its own key (EnsureRequirements
  * co-partitions the two ClusteredDistributions exactly as it does for
  * SMJ), each side sorts separately, and one streaming merge pass per
  * partition emits left rows with a ONE-ROW right-side memory — no
  * union materialization, no padded columns, no window buffer. At
  * 100 TB the union form's single exchange carries both tables widened
  * to the combined schema; the native form moves each table once in
  * its own shape and never allocates per-key state beyond the last
  * candidate row.
  */
final case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Seq[Expression],
    tolerance: Option[Long],
    direction: AsOfDirection,
    broadcastRight: Option[Boolean] = None) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Match direction, pandas `merge_asof` surface: `Backward` takes the
  * last right row at-or-before the left time (right-time ties: LAST in
  * tiebreak order), `Forward` the first at-or-after (ties: FIRST in
  * tiebreak order), `Nearest` whichever of the two is closer in time
  * (equal distance: the backward row). All three run the same single
  * merge pass; tolerance bounds `|Δt|`.
  */
sealed trait AsOfDirection extends Serializable
object AsOfDirection {
  case object Backward extends AsOfDirection
  case object Forward extends AsOfDirection
  case object Nearest extends AsOfDirection
}

/** Plans [[AsOfJoinNode]] → [[BroadcastAsOfJoinExec]] when the right
  * side is dimension-sized (the same stats-vs-`autoBroadcastJoinThreshold`
  * test Spark's own JoinSelection applies, overridable per join via the
  * node's `broadcastRight`), else the merge-shape [[AsOfJoinExec]].
  * Keyless (global) as-of ALWAYS broadcasts — with no key there is
  * nothing to cluster on, and the right side of a global as-of is a
  * small ordered table (calibration curve, rate table) by nature.
  * Injected by [[graft.GraftExtensions]] next to the function
  * registrations; AQE re-runs the choice with runtime stats.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      val autoSmall = {
        val thresh =
          org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
        thresh > 0 && n.right.stats.sizeInBytes <= thresh
      }
      if (n.leftKeys.isEmpty || n.broadcastRight.getOrElse(autoSmall))
        BroadcastAsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
          n.rightTiebreak, n.tolerance, n.direction,
          planLater(n.left), planLater(n.right)) :: Nil
      else
        AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
          n.rightTiebreak, n.tolerance, n.direction,
          planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: requires both children clustered on
  * their keys (co-partitioned by EnsureRequirements, same as SMJ) and
  * sorted by (keys, time[, tiebreak]); executes one streaming merge
  * per partition. Per-partition state is a SINGLE buffered right row
  * (the newest qualifying candidate for the current key) — not a
  * window buffer, not a hash table: memory is O(1) per task regardless
  * of key cardinality or skew.
  */
final case class AsOfJoinExec(
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

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +:
        rightTiebreak.map(SortOrder(_, Ascending))))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // first-class observability, like every built-in join: row volume
  // and match rate show up in the Spark UI / listener metrics
  override lazy val metrics = Map(
    "numOutputRows" ->
      org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"),
    "numMatched" ->
      org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matched left rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val keySchema = StructType(leftKeys.zipWithIndex.map { case (e, i) =>
      StructField(s"k$i", e.dataType, e.nullable)
    })
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val tol = tolerance
    val dir = direction
    val outAttrs = output
    val outRows = longMetric("numOutputRows")
    val matched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIt, rIt) =>
        val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
        val keyOrd = GenerateOrdering.create(keySchema)
        val lTime = BindReferences.bindReference(lTimeExpr, leftOut)
        val rTime = BindReferences.bindReference(rTimeExpr, rightOut)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rightOut.length)
        // bind against NULLABLE right attrs: the original right output
        // is often non-nullable, and a BoundReference that skips its
        // null check reads the null-row's defaults as 0s
        val outProj = UnsafeProjection.create(
          outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
        val rBuf = rIt.buffered
        // the one-row candidate memory: newest right row at or before
        // the current left time, for the key it was taken from.
        // Forward matches need no memory at all — the first qualifying
        // row is exactly the buffered head, which stays unconsumed.
        var candidate: InternalRow = null
        var candidateKey: UnsafeRow = null
        var candidateTime = 0L
        lIt.map { lrow =>
          val lKey = lKeyProj(lrow)
          val lt = lTime.eval(lrow).asInstanceOf[Long]
          if (candidateKey != null && keyOrd.compare(candidateKey, lKey) != 0) {
            candidate = null
            candidateKey = null
          }
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rKey = rKeyProj(rBuf.head)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              rBuf.next() // right row of a key the left side has passed
            } else if (c == 0) {
              val rt = rTime.eval(rBuf.head).asInstanceOf[Long]
              // Forward keeps rt == lt rows AHEAD (eligible as the
              // head); Backward/Nearest absorb them into the candidate
              val take = if (dir == AsOfDirection.Forward) rt < lt else rt <= lt
              if (take) {
                if (dir == AsOfDirection.Forward) {
                  rBuf.next() // strictly-past row: useless for this and all later left rows
                } else {
                  candidate = rBuf.next().copy()
                  candidateKey = lKey.copy()
                  candidateTime = rt
                }
              } else advancing = false
            } else advancing = false
          }
          // backward arm: the buffered last-at-or-before row
          val backOk = dir != AsOfDirection.Forward &&
            candidate != null && candidateKey != null &&
            keyOrd.compare(candidateKey, lKey) == 0 &&
            tol.forall(t => lt - candidateTime <= t)
          // forward arm: the unconsumed head, iff it is this key's
          // first at-or-after row (ties on time: first in tiebreak
          // order, since the head is the sort-least of them)
          var fwdRow: InternalRow = null
          var fwdTime = 0L
          if (dir != AsOfDirection.Backward && rBuf.hasNext &&
              keyOrd.compare(rKeyProj(rBuf.head), lKey) == 0) {
            val rt = rTime.eval(rBuf.head).asInstanceOf[Long]
            if (rt >= lt && tol.forall(t => rt - lt <= t)) {
              fwdRow = rBuf.head
              fwdTime = rt
            }
          }
          val chosen =
            if (backOk && fwdRow != null) {
              // Nearest with both arms live: closer wins, ties backward
              if (lt - candidateTime <= fwdTime - lt) candidate else fwdRow
            } else if (backOk) candidate
            else if (fwdRow != null) fwdRow
            else nullRight
          outRows += 1
          if (chosen ne nullRight) matched += 1
          outProj(joined(lrow, chosen))
        }
    }
  }
}

/** Public API over the operator. Keys/time resolve against the input
  * frames' own columns (`df("col")`), times cast to epoch-long.
  *
  * Null contract (pinned in AsOfJoinSpec): NULL KEYS FORM THEIR OWN
  * JOIN GROUP — the merge compares keys with ordering semantics, so a
  * null-key left row matches null-key right rows (unlike an SQL
  * equi-join, where NULL = NULL is never true; like grouping, where
  * nulls share a group). Null TIMES are a contract violation and FAIL
  * LOUDLY: the API wraps each nullable time column in a raise-on-null
  * guard, so a null time raises with an actionable message instead of
  * silently matching at epoch 0 — filter or default upstream. (The
  * guard costs one branch on a column the merge evaluates per row
  * anyway, and is skipped entirely when the column is statically
  * non-nullable.)
  */
object AsOfJoin {

  /** `left ASOF JOIN right` (backward): every left row picks the last
    * right row with equal keys and `rightTime <= leftTime` (right-time
    * ties broken by `rightTiebreak`, last wins), right columns null
    * when no row qualifies, matches older than `leftTime −
    * toleranceMs` dropped when a tolerance is given.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[Column],
      rightKeys: Seq[Column],
      leftTime: Column,
      rightTime: Column,
      rightTiebreak: Seq[Column] = Nil,
      toleranceMs: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame =
    join(AsOfDirection.Backward, left, right, leftKeys, rightKeys,
      leftTime, rightTime, rightTiebreak, toleranceMs, broadcast)

  /** Forward as-of: every left row picks the FIRST right row with
    * equal keys and `rightTime >= leftTime` (right-time ties broken by
    * `rightTiebreak`, first wins); tolerance drops matches newer than
    * `leftTime + toleranceMs`.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[Column],
      rightKeys: Seq[Column],
      leftTime: Column,
      rightTime: Column,
      rightTiebreak: Seq[Column] = Nil,
      toleranceMs: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame =
    join(AsOfDirection.Forward, left, right, leftKeys, rightKeys,
      leftTime, rightTime, rightTiebreak, toleranceMs, broadcast)

  /** Nearest as-of: every left row picks whichever of its backward and
    * forward matches is closer in time; equal distance prefers the
    * backward (at-or-before) row. Within each arm ties on right time
    * follow that arm's convention (backward: last in tiebreak order;
    * forward: first). Tolerance bounds `|Δt|` on both arms.
    */
  def nearest(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[Column],
      rightKeys: Seq[Column],
      leftTime: Column,
      rightTime: Column,
      rightTiebreak: Seq[Column] = Nil,
      toleranceMs: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame =
    join(AsOfDirection.Nearest, left, right, leftKeys, rightKeys,
      leftTime, rightTime, rightTiebreak, toleranceMs, broadcast)

  /** Time column → epoch milliseconds. TIMESTAMP (either kind) and
    * DATE go through `unix_millis`, because a bare `cast(LongType)`
    * yields epoch SECONDS for timestamps (and DAYS for dates) — a
    * silent 1000× unit error against the millisecond `toleranceMs`
    * contract. Numeric columns are already the caller's epoch-ms and
    * just widen to long.
    */
  private[graft] def toEpochMs(c: Column): Column = {
    val isTimeTyped = {
      val e = GraftSqlShim.expr(c)
      e.resolved && (e.dataType match {
        case org.apache.spark.sql.types.TimestampType |
             org.apache.spark.sql.types.TimestampNTZType |
             org.apache.spark.sql.types.DateType => true
        case _ => false
      })
    }
    if (isTimeTyped)
      org.apache.spark.sql.functions.unix_millis(
        c.cast(org.apache.spark.sql.types.TimestampType))
    else c.cast(LongType)
  }

  /** [[toEpochMs]] plus the loud null guard: the merge reads the time
    * as a primitive long, so a null would silently coerce to epoch 0
    * and MATCH THERE — the worst kind of wrong answer on dirty data.
    * Nullable time columns instead raise per offending row via
    * `raise_error`; statically non-nullable columns skip the branch.
    */
  private[graft] def guardedEpochMs(c: Column, side: String): Column = {
    val ms = toEpochMs(c)
    val e = GraftSqlShim.expr(ms)
    if (e.resolved && !e.nullable) ms
    else {
      import org.apache.spark.sql.functions.{lit, raise_error, when}
      when(ms.isNotNull, ms).otherwise(
        raise_error(lit(s"as-of join: null $side-side time — the time column " +
          "must be non-null (a null would otherwise match at epoch 0); " +
          "filter nulls or default the time upstream")).cast(LongType))
    }
  }

  /** The shared constructor behind [[backward]]/[[forward]]/[[nearest]]
    * — public so CLI/streaming dispatch can pass an [[AsOfDirection]]
    * through instead of re-matching on it.
    *
    * `broadcast` picks the physical path: `None` (default) lets the
    * strategy decide from the right side's stats vs
    * `autoBroadcastJoinThreshold` (exactly like Spark's own join
    * selection), `Some(true)` forces the broadcast-index exec — the
    * left side then pays NO exchange and NO sort — and `Some(false)`
    * forces the co-partitioned merge exec (e.g. to exploit bucketed
    * layouts, where the merge plans with zero exchanges).
    *
    * KEYLESS (GLOBAL) as-of: empty key lists are allowed — every left
    * row matches against the single global right timeline (pandas
    * `merge_asof` with `by=None`; calibration curves, rate tables).
    * With nothing to cluster on, the merge shape does not apply, so a
    * keyless join always broadcasts the right side — which must
    * therefore be driver-collectable (dimension-sized), and
    * `broadcast = Some(false)` is rejected.
    */
  def join(
      direction: AsOfDirection,
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[Column],
      rightKeys: Seq[Column],
      leftTime: Column,
      rightTime: Column,
      rightTiebreak: Seq[Column] = Nil,
      toleranceMs: Option[Long] = None,
      broadcast: Option[Boolean] = None): DataFrame = {
    require(leftKeys.nonEmpty || broadcast != Some(false),
      "a keyless (global) as-of join has nothing to cluster a merge on — " +
        "it always broadcasts the right side; drop broadcast=Some(false) " +
        "or supply at least one key")
    require(leftKeys.length == rightKeys.length,
      s"key arity mismatch: ${leftKeys.length} vs ${rightKeys.length}")
    require(toleranceMs.forall(_ >= 0L), "tolerance must be non-negative")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    // self-join guard: built-in joins get DeduplicateRelations; a
    // custom node does not, and shared exprIds would bind right-side
    // expressions against the wrong child or collide in the output
    val shared = lPlan.outputSet.intersect(rPlan.outputSet)
    require(shared.isEmpty,
      s"left and right share column instances (${shared.toSeq.take(3).mkString(", ")}…): " +
        "alias one side first, e.g. right.select(right.columns.map(c => col(c).as(c + \"_r\")): _*)")
    val lKeyExprs = leftKeys.map(GraftSqlShim.expr)
    val rKeyExprs = rightKeys.map(GraftSqlShim.expr)
    // the merge generates its key ordering from the LEFT key types and
    // compares both sides' key projections with it — mismatched types
    // would compare garbage bytes, so fail loudly instead
    lKeyExprs.zip(rKeyExprs).zipWithIndex.foreach { case ((le, re), i) =>
      if (le.resolved && re.resolved)
        require(le.dataType == re.dataType,
          s"key $i type mismatch: left ${le.dataType.simpleString} vs " +
            s"right ${re.dataType.simpleString} — cast one side explicitly")
    }
    val node = AsOfJoinNode(
      lPlan,
      rPlan,
      lKeyExprs,
      rKeyExprs,
      GraftSqlShim.expr(guardedEpochMs(leftTime, "left")),
      GraftSqlShim.expr(guardedEpochMs(rightTime, "right")),
      rightTiebreak.map(GraftSqlShim.expr),
      toleranceMs,
      direction,
      broadcast)
    GraftSqlShim.ofRows(left.sparkSession, node)
  }

  /** SKEW-SAFE merge as-of. Custom execs sit outside AQE's
    * OptimizeSkewedJoin, so on the merge path one hot key (a bot user
    * owning 10% of the facts) serializes its entire left volume into a
    * single task. This wrapper replicates the RIGHT side's rows across
    * `saltBuckets` salt values and scatters left rows among them, then
    * runs the ordinary operator with the salt as an extra key — each
    * left row still sees its key's FULL right timeline (every salt
    * bucket holds a complete copy), so direction, tolerance, tiebreak
    * and null-group semantics are exactly [[join]]'s (the randomized
    * sweep in AsOfJoinSpec runs this path against the same brute-force
    * reference), while the hot key's left rows now fan out over
    * `saltBuckets` tasks.
    *
    * Costs and scatter: the right side pays ×`saltBuckets` rows through
    * its exchange — the usual skew trade, cheap when right is the
    * dimension side (and if the RIGHT side is itself too big to
    * replicate, the broadcast path was never an option either — split
    * the job by key range instead). Left scatter is `hash(leftTime [,
    * saltOn...]) pmod saltBuckets`: deterministic (retry-safe, no rng),
    * and time-spread by construction — a hot key's facts span many
    * timestamps. When left times repeat heavily (coarse-grained
    * clocks), pass high-cardinality `saltOn` columns (an id) to keep
    * the scatter uniform. Forces the merge path: the broadcast exec has
    * no per-key task serialization to fix, so salting it would only
    * inflate the build.
    */
  def joinSalted(
      direction: AsOfDirection,
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[Column],
      rightKeys: Seq[Column],
      leftTime: Column,
      rightTime: Column,
      rightTiebreak: Seq[Column] = Nil,
      toleranceMs: Option[Long] = None,
      saltBuckets: Int = 8,
      saltOn: Seq[Column] = Nil): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, hash, lit, pmod}
    require(saltBuckets >= 2,
      s"saltBuckets must be >= 2 (1 is just the unsalted merge), got $saltBuckets")
    require(leftKeys.nonEmpty,
      "keyless as-of always broadcasts — salting applies to the merge path")
    val lsCol = "__asof_salt_l"
    val rsCol = "__asof_salt_r"
    require(!left.columns.contains(lsCol) && !right.columns.contains(rsCol),
      s"$lsCol/$rsCol are reserved internal column names")
    // withColumn preserves the children's attributes, so the caller's
    // frame-qualified key/time refs keep resolving by exprId
    val l2 = left.withColumn(lsCol,
      pmod(hash(leftTime +: saltOn: _*), lit(saltBuckets)))
    val r2 = right.withColumn(rsCol,
      explode(lit((0 until saltBuckets).toArray)))
    join(direction, l2, r2,
      leftKeys :+ l2(lsCol), rightKeys :+ r2(rsCol),
      leftTime, rightTime, rightTiebreak, toleranceMs,
      broadcast = Some(false))
      .drop(lsCol, rsCol)
  }

  /** What [[detectSkew]] saw: the hottest key's share of the sampled
    * left rows, whether that crosses the salting threshold, and the
    * bucket count [[joinSkewAware]] would use. `sampledRows` is the
    * evidence size — a recommendation from under [[minSampleRows]]
    * rows is never made (`recommendSalting` stays false).
    */
  final case class SkewReport(
      sampledRows: Long,
      topKeyShare: Double,
      recommendSalting: Boolean,
      recommendedBuckets: Int)

  /** Below this many sampled rows the histogram is noise, not
    * evidence — no recommendation either way. */
  val minSampleRows = 100L

  /** Default hottest-key share above which the merge path's per-key
    * task serialization is worth the salted form's ×buckets right-side
    * replication. 0.2 is deliberately far above any uniform
    * distribution's top share at realistic key cardinality (1/keys)
    * and far below the shares where the serialization is ruinous
    * (the A/B fixture's 0.9) — between them the salted plan is already
    * measurably ahead whenever one task would carry ≥ 20% of the left
    * volume against 32+ available slots.
    */
  val defaultHotShareThreshold = 0.2

  /** Cheap left-side key-skew sketch: ONE aggregate over a SAMPLE of
    * the left keys (payload columns never move; at `sampleFraction =
    * 0.01` a 100 TB fact table contributes ~1% of one projected column
    * set, and the per-key partial aggregation collapses it map-side).
    * The merge exec sits outside AQE's OptimizeSkewedJoin, so a user
    * who doesn't know they have a bot key silently serializes that
    * key's whole left volume into one task — this is the detect half
    * that makes [[joinSalted]] discoverable: call it directly for the
    * report, or let [[joinSkewAware]] route on it.
    *
    * The sample is seeded (retry-deterministic for a fixed partition
    * layout); `sampleFraction = 1.0` skips sampling entirely (exact
    * histogram — what the specs use).
    */
  def detectSkew(
      left: DataFrame,
      leftKeys: Seq[Column],
      sampleFraction: Double = 0.01,
      hotShareThreshold: Double = defaultHotShareThreshold): SkewReport = {
    import org.apache.spark.sql.functions.{col, count, lit, max, sum}
    require(leftKeys.nonEmpty, "skew detection needs at least one key")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    require(hotShareThreshold > 0.0 && hotShareThreshold < 1.0,
      s"hotShareThreshold must be in (0, 1), got $hotShareThreshold")
    val keyed = left.select(
      leftKeys.zipWithIndex.map { case (c, i) => c.as(s"__asof_skew_k$i") }: _*)
    val sampled =
      if (sampleFraction >= 1.0) keyed
      else keyed.sample(withReplacement = false, sampleFraction, seed = 42L)
    val row = sampled
      .groupBy(leftKeys.indices.map(i => col(s"__asof_skew_k$i")): _*)
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n"), max(col("c")).as("mx"))
      .head()
    if (row.isNullAt(0)) SkewReport(0L, 0.0, recommendSalting = false, 1)
    else {
      val n = row.getLong(0)
      val mx = row.getLong(1)
      val share = if (n == 0L) 0.0 else mx.toDouble / n.toDouble
      val hot = n >= minSampleRows && share >= hotShareThreshold
      // enough buckets that the hot key's per-task slice shrinks to a
      // uniform key's: share × parallelism, next power of two, floor 8
      // (the measured-win floor), capped at the shuffle width — more
      // buckets than tasks only replicates the right side for nothing
      val parts = left.sparkSession.sessionState.conf.numShufflePartitions
      val want = math.max(8L, math.ceil(share * parts).toLong)
      val pow2 =
        if (want <= 1L) 1L else java.lang.Long.highestOneBit(want - 1L) << 1
      SkewReport(n, share, hot, math.min(pow2, math.max(8L, parts.toLong)).toInt)
    }
  }

  /** [[join]] with the skew DETECT half wired in: sketches the left
    * key histogram ([[detectSkew]]), routes through [[joinSalted]]
    * with the recommended bucket count when one key crosses
    * `hotShareThreshold`, and logs the decision loudly either way.
    * Semantics are exactly [[join]]'s in both routes (the salted form
    * preserves each key's full right timeline). There is no broadcast
    * override here: a right side under the broadcast threshold plans
    * the broadcast exec through [[join]] regardless, and that exec has
    * no per-key task serialization for salting to fix — detection only
    * ever redirects the merge path.
    */
  def joinSkewAware(
      direction: AsOfDirection,
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[Column],
      rightKeys: Seq[Column],
      leftTime: Column,
      rightTime: Column,
      rightTiebreak: Seq[Column] = Nil,
      toleranceMs: Option[Long] = None,
      sampleFraction: Double = 0.01,
      hotShareThreshold: Double = defaultHotShareThreshold,
      saltOn: Seq[Column] = Nil): DataFrame =
    joinSkewAwareWithReport(direction, left, right, leftKeys, rightKeys,
      leftTime, rightTime, rightTiebreak, toleranceMs, sampleFraction,
      hotShareThreshold, saltOn)._1

  private[graft] def joinSkewAwareWithReport(
      direction: AsOfDirection,
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[Column],
      rightKeys: Seq[Column],
      leftTime: Column,
      rightTime: Column,
      rightTiebreak: Seq[Column],
      toleranceMs: Option[Long],
      sampleFraction: Double,
      hotShareThreshold: Double,
      saltOn: Seq[Column]): (DataFrame, SkewReport) = {
    require(leftKeys.nonEmpty,
      "keyless as-of always broadcasts — skew routing applies to the merge path")
    // a broadcast-eligible right side never reaches the merge exec
    // (join() plans the broadcast-index path, whose left pays no
    // exchange and no sort), so a hot LEFT key is a non-problem there —
    // salting it would force the strictly worse merge shape. Route
    // straight to join() without paying the detection sample.
    val bcThresh =
      org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    if (bcThresh > 0 &&
        right.queryExecution.optimizedPlan.stats.sizeInBytes <= bcThresh) {
      log.info("as-of join: right side under the broadcast threshold — " +
        "broadcast path, skew detection skipped (nothing to salt)")
      return (join(direction, left, right, leftKeys, rightKeys, leftTime,
        rightTime, rightTiebreak, toleranceMs),
        SkewReport(0L, 0.0, recommendSalting = false, recommendedBuckets = 1))
    }
    val report = detectSkew(left, leftKeys, sampleFraction, hotShareThreshold)
    if (report.recommendSalting) {
      log.warn(
        f"as-of join: hottest left key holds ${report.topKeyShare * 100}%.1f%% " +
          f"of ${report.sampledRows} sampled rows (threshold " +
          f"${hotShareThreshold * 100}%.0f%%) — routing through the salted " +
          f"merge with ${report.recommendedBuckets} buckets to break per-key " +
          "task serialization")
      (joinSalted(direction, left, right, leftKeys, rightKeys, leftTime,
        rightTime, rightTiebreak, toleranceMs,
        saltBuckets = report.recommendedBuckets, saltOn = saltOn), report)
    } else {
      log.info(
        f"as-of join: hottest left key holds ${report.topKeyShare * 100}%.1f%% " +
          f"of ${report.sampledRows} sampled rows — no skew routing needed")
      (join(direction, left, right, leftKeys, rightKeys, leftTime, rightTime,
        rightTiebreak, toleranceMs), report)
    }
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
