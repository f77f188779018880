package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native AS-OF JOIN — a whole-operator planner extension (logical
  * node → strategy → physical exec), the (c)-tier customization the
  * composed form cannot reach: `q_join_asof` expresses as-of as
  * left-outer-join-all-earlier-rows + row_number + filter, which
  * MATERIALIZES every (left row, earlier right row) candidate pair
  * into the window sort. For a left row whose key has R earlier right
  * rows that is R buffered rows — at 100 TB of order history per
  * customer, quadratic pressure the optimizer cannot undo.
  *
  * This operator instead sorts both sides once on (key, time) —
  * ordinary shuffle+sort, exactly what a sort-merge join does — and
  * streams BOTH sides with two pointers per partition: for each left
  * row in (key, time) order, the last right row with rtime <= ltime is
  * the match; one right row is buffered at a time, nothing is
  * materialized. O(L + R) per partition after the sort, vs O(matching
  * pairs) for the composed form.
  *
  * Semantics (pandas merge_asof / QuestDB ASOF JOIN, left outer
  * flavor): for each left row, the right row with equal key and the
  * LARGEST (rtime, tieBreak...) <= tuple such that rtime <= ltime;
  * nulls when no such row. `tieBreak` columns resolve equal-rtime
  * ambiguity deterministically (they extend the right sort key, and
  * the merge keeps the last row in sort order).
  *
  * `direction` completes the pandas merge_asof surface:
  *  - `backward` (default): last right row with rtime <= ltime — keeps
  *    the largest (rtime, tieBreak) among equals;
  *  - `forward`: FIRST right row with rtime >= ltime — keeps the
  *    smallest (rtime, tieBreak) among equals; same single monotone
  *    cursor, nothing buffered at all;
  *  - `nearest`: whichever of the backward candidate (rtime <= ltime)
  *    and the strictly-later forward candidate (rtime > ltime) has the
  *    smaller |gap|; equal gaps choose backward (the pandas rule).
  *    Exact-time rows belong to the backward side, so an exact match
  *    always wins at gap 0. Requires an integral-comparable time type
  *    (timestamp/date/long/int) for the gap arithmetic.
  * Tolerance bounds the chosen direction's gap (|gap| for nearest) and
  * filters each CANDIDATE before nearest chooses, mirroring pandas: a
  * too-old backward match does not shadow an in-tolerance forward one.
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression],
    tolerance: Option[Long] = None,
    direction: String = Asof.Backward)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical AsofJoin to its exec node; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tb, tol, dir) =>
      AsofJoinExec(lk, rk, lt, rt, tb, tol, dir,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression],
    tolerance: Option[Long],
    direction: String,
    left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both children cluster on their key — the same contract as a
    * sort-merge join, so EnsureRequirements inserts the co-partitioned
    * exchanges. The partition count is pinned (spark.sql.shuffle
    * .partitions, NOT SQLConf.numShufflePartitions: the latter resolves
    * to AQE's initialPartitionNum when coalescing is on, and a pinned
    * requirement is uncoalescible — the join would run the full
    * initial width as real tasks) so the two sides stay aligned for
    * zipPartitions even under AQE's coalescing; a cluster deployment
    * tunes that single conf, exactly as for any shuffle. */
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.defaultNumShufflePartitions)
    ClusteredDistribution(Seq(leftKey), requiredNumPartitions = n) ::
      ClusteredDistribution(Seq(rightKey), requiredNumPartitions = n) :: Nil
  }

  /** (key, time) both sides; the right side additionally orders by the
    * tie-break columns so "last row <= ltime" is a total order. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = Seq(
    SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = BindReferences.bindReference(leftKey, lOut)
    val lt = BindReferences.bindReference(leftTime, lOut)
    val rk = BindReferences.bindReference(rightKey, rOut)
    val rt = BindReferences.bindReference(rightTime, rOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    // Tolerance (pandas merge_asof): max allowed ltime - rtime, in the
    // time type's underlying integral unit (µs for timestamps, days
    // for dates). Resolved to a long extractor once per plan.
    val timeAsLong: Any => Long = leftTime.dataType match {
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType |
          org.apache.spark.sql.types.LongType => _.asInstanceOf[Long]
      case org.apache.spark.sql.types.DateType |
          org.apache.spark.sql.types.IntegerType =>
        v => v.asInstanceOf[Int].toLong
      case t if tolerance.isDefined || direction == Asof.Nearest =>
        throw new IllegalArgumentException(
          s"as-of ${if (tolerance.isDefined) "tolerance" else "nearest"} " +
            s"unsupported for time type ${t.simpleString}")
      case _ => _ => 0L
    }
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val rightWidth = rOut.size
    // Bind the result projection against NULLABLE right attributes:
    // unmatched left rows emit an all-null right side, and a
    // non-nullable binding would skip the null check and read garbage.
    val attrs = lOut ++ rOut.map(_.withNullability(true))
    val outAttrs = output
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val result = UnsafeProjection.create(outAttrs, attrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // Codegen'd (key, time) extractors — ONE projection apply per row
      // per side. r5 evaluated the interpreted `rk.eval`/`rt.eval` up
      // to three times per right row (null check, compare, and a
      // re-eval of a value already in hand); for an operator whose
      // whole point is the 100 TB merge path, the per-row cost is the
      // product.
      val lProj = UnsafeProjection.create(Seq(lk, lt))
      val rProj = UnsafeProjection.create(Seq(rk, rt))
      // Values read out of a projection result point into its REUSED
      // row buffer (UTF8String is a view, not a copy); a value that
      // must outlive the next projection apply (bestKey/bestTime) is
      // snapshotted. Boxed primitives are immune; string keys clone.
      def snapper(t: org.apache.spark.sql.types.DataType): Any => Any =
        t match {
          case org.apache.spark.sql.types.StringType =>
            v => if (v == null) null
              else v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
                .clone()
          case _ => identity
        }
      val snapKey = snapper(keyType)
      val snapTime = snapper(timeType)
      // Right cursor: the current un-consumed right row plus its (key,
      // time), evaluated exactly once when the row is first seen. SQL
      // semantics: a null key or time matches nothing, so null right
      // rows are discarded as encountered (they sort first under
      // Ascending, so discarding keeps the pointer monotonic).
      var rRow: InternalRow = null
      var rKeyV: Any = null
      var rTimeV: Any = null
      var rValid = false
      def advanceRight(): Unit = {
        rValid = false
        while (!rValid && rIter.hasNext) {
          rRow = rIter.next()
          val kt = rProj(rRow)
          val k = kt.get(0, keyType)
          if (k != null) {
            val t = kt.get(1, timeType)
            if (t != null) { rKeyV = k; rTimeV = t; rValid = true }
          }
        }
      }
      advanceRight()
      // `best` is the most recent right row whose (key, time) is <=
      // the current left cursor — copied once when consumed, because
      // the child iterator reuses its row object.
      var best: InternalRow = null
      var bestKey: Any = null
      var bestTime: Any = null
      val forwardOnly = direction == Asof.Forward
      val nearest = direction == Asof.Nearest
      lIter.map { lRow =>
        val lkt = lProj(lRow)
        val lKeyV = lkt.get(0, keyType)
        val lTimeV = if (lKeyV == null) null else lkt.get(1, timeType)
        if (lKeyV == null || lTimeV == null) {
          numOutputRows += 1
          result(joined(lRow, nullRight))
        } else {
          // Advance the shared cursor. Backward/nearest consume rows
          // with rtime <= ltime into `best`; forward merely discards
          // rows strictly before ltime (nothing buffered) so the
          // cursor halts at the first row with rtime >= ltime. In all
          // modes the cursor afterwards sits at the first row beyond
          // the consumed/discarded region — for nearest that is
          // exactly the strictly-later forward candidate.
          var advance = true
          while (advance && rValid) {
            val c = keyOrd.compare(rKeyV, lKeyV)
            if (c < 0) advanceRight() // earlier key: discard
            else if (c == 0 &&
                (if (forwardOnly) timeOrd.compare(rTimeV, lTimeV) < 0
                 else timeOrd.compare(rTimeV, lTimeV) <= 0)) {
              if (!forwardOnly) {
                best = rRow.copy()
                bestKey = snapKey(rKeyV)
                bestTime = snapTime(rTimeV)
              }
              advanceRight()
            } else advance = false
          }
          // Tolerance filters the MATCH, not the buffer: `best` must
          // stay even when too old for this left row, because a later
          // left row first pulls newer right rows into `best` (the
          // while-loop above) before its own tolerance check.
          val backOk = !forwardOnly && best != null &&
            keyOrd.compare(bestKey, lKeyV) == 0 &&
            tolerance.forall(tol =>
              timeAsLong(lTimeV) - timeAsLong(bestTime) <= tol)
          val fwdOk = (forwardOnly || nearest) && rValid &&
            keyOrd.compare(rKeyV, lKeyV) == 0 &&
            tolerance.forall(tol =>
              timeAsLong(rTimeV) - timeAsLong(lTimeV) <= tol)
          val chosen: InternalRow =
            if (nearest) {
              if (backOk && fwdOk) {
                // equal gaps choose backward (the pandas rule); exact
                // matches sit in `best` with gap 0 and always win
                if (timeAsLong(lTimeV) - timeAsLong(bestTime) <=
                    timeAsLong(rTimeV) - timeAsLong(lTimeV)) best else rRow
              } else if (backOk) best
              else if (fwdOk) rRow
              else null
            } else if (forwardOnly) { if (fwdOk) rRow else null }
            else { if (backOk) best else null }
          numOutputRows += 1
          if (chosen != null) numMatched += 1
          result(joined(lRow, if (chosen != null) chosen else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `Asof.join(left, right, "user_id", "o_custkey", "ts",
  * "o_orderdate", tieBreak = Seq("o_orderkey"))`. Columns are resolved
  * against each side's analyzed plan, so the node is born resolved.
  *
  * Name lookup honors the session's `spark.sql.caseSensitive` setting
  * (via the analyzer's resolver — r5 resolved with `==`, silently
  * case-sensitive in a case-insensitive session), and a self-join
  * (same DataFrame, or any shared lineage, on both sides) re-aliases
  * the right plan with fresh expression IDs first — the same dedup
  * `Dataset.join` performs — so the two sides never carry conflicting
  * attribute IDs into the plan. */
object Asof {
  val Backward = "backward"
  val Forward = "forward"
  val Nearest = "nearest"
  private val Directions = Set(Backward, Forward, Nearest)

  /** Shared resolution core for the DataFrame API and the SQL
    * resolution rule: dedup right-side attribute IDs, resolve the six
    * column names with the given resolver, type-check, build the node. */
  private[plans] def resolveNode(
      lp: LogicalPlan, rp0: LogicalPlan,
      resolver: (String, String) => Boolean,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      tieBreak: Seq[String], tolerance: Option[Long],
      direction: String = Backward): AsofJoin = {
    require(Directions.contains(direction),
      s"as-of direction must be one of $Directions, got '$direction'")
    val rp: LogicalPlan =
      if (lp.outputSet.intersect(rp0.outputSet).isEmpty) rp0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rp0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        rp0)
    def att(p: LogicalPlan, n: String): Attribute = {
      val hits = p.output.filter(a => resolver(a.name, n))
      if (hits.isEmpty) throw new IllegalArgumentException(
        s"column $n not in [${p.output.map(_.name).mkString(", ")}]")
      if (hits.size > 1) throw new IllegalArgumentException(
        s"column $n is ambiguous: [${hits.map(_.name).mkString(", ")}]")
      hits.head
    }
    require(att(lp, leftKey).dataType == att(rp, rightKey).dataType,
      "as-of key types must match")
    require(att(lp, leftTime).dataType == att(rp, rightTime).dataType,
      "as-of time types must match")
    AsofJoin(lp, rp,
      att(lp, leftKey), att(rp, rightKey),
      att(lp, leftTime), att(rp, rightTime),
      tieBreak.map(att(rp, _)), tolerance, direction)
  }

  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      tieBreak: Seq[String] = Nil,
      tolerance: Option[Long] = None,
      direction: String = Backward): DataFrame = {
    val plan = resolveNode(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      left.sparkSession.sessionState.analyzer.resolver,
      leftKey, rightKey, leftTime, rightTime, tieBreak, tolerance,
      direction)
    org.apache.spark.sql.GraftPlanBridge.ofRows(left.sparkSession, plan)
  }
}

/** SQL surface of the native as-of join — a table-valued function, so
  * a pure-SQL user reaches AsofJoinExec without the DataFrame API:
  *
  * {{{
  * SELECT * FROM asof_join('purchases', 'orders',
  *   'user_id', 'o_custkey', 'ts', 'o_orderdate',
  *   'o_orderkey')              -- optional comma-sep tie-break cols
  * }}}
  *
  * (8th optional arg: tolerance as a LONG in the time type's integral
  * unit — µs for timestamps, days for dates.) Table args are view /
  * table names resolved through the session catalog, exactly like a
  * FROM-clause reference; the TVF route composes into any enclosing
  * query and needs no bespoke parser. The builder runs at parse-level
  * analysis where the catalog isn't in hand, so it emits
  * [[UnresolvedAsofJoin]] over [[UnresolvedRelation]] children and
  * [[ResolveAsofJoin]] finishes the job once the analyzer has resolved
  * them — the standard two-phase shape of analyzer extensions. */
case class UnresolvedAsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: String, rightKey: String,
    leftTime: String, rightTime: String,
    tieBreak: Seq[String], tolerance: Option[Long],
    direction: String = Asof.Backward)
    extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsofJoin =
    copy(left = newLeft, right = newRight)
}

object AsofTableFunction {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

  val name = "asof_join"
  val info = new ExpressionInfo(classOf[AsofJoin].getName, name)

  private def usage = s"$name(leftTable, rightTable, leftKey, rightKey, " +
    "leftTime, rightTime [, tieBreakCols [, toleranceLong [, " +
    "direction]]]) — string literals; tieBreakCols comma-separated; " +
    "tolerance a long in the time type's integral unit (-1 = none); " +
    "direction backward|forward|nearest"

  private def str(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
      s.toString
    case other => throw new IllegalArgumentException(
      s"$name: $what must be a string literal, got $other; $usage")
  }

  val builder: Seq[Expression] => LogicalPlan = { args =>
    if (args.size < 6 || args.size > 9)
      throw new IllegalArgumentException(
        s"$name expects 6-9 arguments, got ${args.size}; $usage")
    val tie =
      if (args.size >= 7)
        str(args(6), "tieBreakCols").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq
      else Nil
    // -1 = "no tolerance": a SQL caller that only wants a direction
    // still has to fill the positional tolerance slot.
    val tol =
      if (args.size >= 8) (args(7) match {
        case Literal(v: Long, LongType) => Some(v)
        case Literal(v: Int, IntegerType) => Some(v.toLong)
        case other => throw new IllegalArgumentException(
          s"$name: tolerance must be an integral literal, got $other")
      }).filter(_ >= 0)
      else None
    val dir =
      if (args.size == 9) str(args(8), "direction") else Asof.Backward
    UnresolvedAsofJoin(
      UnresolvedRelation(Seq(str(args(0), "leftTable"))),
      UnresolvedRelation(Seq(str(args(1), "rightTable"))),
      str(args(2), "leftKey"), str(args(3), "rightKey"),
      str(args(4), "leftTime"), str(args(5), "rightTime"),
      tie, tol, dir)
  }
}

/** Analyzer rule completing [[AsofTableFunction]]: once both relation
  * children are resolved, resolve the column names with the session's
  * resolver and emit the planner-ready [[AsofJoin]]. Injected via
  * `injectResolutionRule` (GraftExtensions). */
object ResolveAsofJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedAsofJoin if u.childrenResolved =>
        Asof.resolveNode(u.left, u.right, conf.resolver,
          u.leftKey, u.rightKey, u.leftTime, u.rightTime,
          u.tieBreak, u.tolerance, u.direction)
    }
}
