package graft

/** Plan inspection: prints the formatted physical plan for named queries
  * (all when no names given). Used to audit pushdown/pruning/broadcast/
  * codegen choices per operator.
  *
  * Usage: runMain graft.Explain [--codegen] [sfDir] [name ...]
  *
  * With --codegen, instead of dumping plans it audits every query for
  * whole-stage-codegen coverage: each physical operator line in the
  * simple-mode plan either carries a `*(n)` marker (inside a
  * WholeStageCodegen span) or not. Operators that never participate in
  * codegen BY DESIGN (exchanges, scans feeding ColumnarToRow, AQE
  * wrappers, window/object/streaming-state operators, commands) are
  * allowlisted; anything else without a marker is reported as a
  * fallback so hot-path regressions (e.g. a non-codegen Expression
  * sneaking into a Project) surface as a diff in the committed audit.
  */
object Explain {

  /** Operators outside WholeStageCodegen by design — not fallbacks.
    * Spark has no codegen path for these nodes (or they are plan
    * plumbing, not compute): flagging them would be permanent noise.
    */
  private val byDesign: Set[String] = Set(
    // plan plumbing / AQE scaffolding
    "AdaptiveSparkPlan", "ResultQueryStage", "ShuffleQueryStage", "BroadcastQueryStage",
    "AQEShuffleRead", "ReusedExchange", "ReusedSubquery", "Subquery", "SubqueryBroadcast",
    "InputAdapter", "ColumnarToRow", "RowToColumnar",
    // exchanges & scans (codegen consumes them via InputAdapter)
    "Exchange", "BroadcastExchange", "Scan", "FileScan", "BatchScan", "LocalTableScan",
    "InMemoryTableScan", "InMemoryRelation",
    // operators with no codegen implementation in Spark
    "Window", "WindowGroupLimit", "MergingSessions", "TakeOrderedAndProject", "CollectLimit",
    "GlobalLimit", "LocalLimit", "Union", "Coalesce", "Sample", "Generate",
    "ObjectHashAggregate", "SortAggregate", "Expand", "BroadcastNestedLoopJoin",
    // object / typed pipelines (Dataset encoders, mapPartitions, pandas)
    "DeserializeToObject", "SerializeFromObject", "MapPartitions", "MapElements",
    "MapGroups", "FlatMapGroupsWithState", "TransformWithStateInPySpark",
    "AppendColumns", "MapInPandas", "ArrowEvalPython", "BatchEvalPython",
    // streaming state (memory-sink audit sees the batch side only, but
    // keep them for completeness when auditing pre-sink plans)
    "StateStoreRestore", "StateStoreSave", "SessionWindowStateStoreRestore",
    "SessionWindowStateStoreSave", "StreamingDeduplicate", "StreamingSymmetricHashJoin",
    "EventTimeWatermark", "MicroBatchScan",
    // V2/commands
    "AppendData", "OverwriteByExpression", "ReplaceData", "WriteFiles", "Execute",
    "CommandResult")

  /** Parse a simple-mode plan: (operator name, has `*(n)` codegen marker)
    * per physical node line. An executed AQE plan prints BOTH a
    * `== Final Plan ==` and an (unstarred) `== Initial Plan ==`
    * section; only the final one reflects the codegen actually run, so
    * the initial section is cut before parsing.
    */
  private[graft] def nodes(simplePlan: String): Seq[(String, Boolean)] = {
    val cut = simplePlan.indexOf("== Initial Plan ==")
    val effective = if (cut >= 0) simplePlan.substring(0, cut) else simplePlan
    // A LogicalQueryStage subtree prints LOGICAL nodes (Project/Filter/
    // Aggregate without physical codegen markers) inside an otherwise
    // physical plan — skip its whole indented subtree, not just the
    // header, or logical nodes masquerade as fallbacks.
    var skipDepth = -1
    effective.linesIterator.flatMap { line =>
      val depth = line.indexWhere(c => !" :+-".contains(c))
      val t = if (depth < 0) "" else line.substring(depth)
      if (t.isEmpty || t.startsWith("==")) None
      else if (skipDepth >= 0 && depth > skipDepth) None
      else {
        skipDepth = -1
        val codegen = t.startsWith("*(")
        val body = if (codegen) t.dropWhile(_ != ')').drop(1).trim else t
        val name = body.takeWhile(c => c.isLetterOrDigit)
        if (name == "LogicalQueryStage") { skipDepth = depth; None }
        else if (name.isEmpty || name.head.isDigit) None
        else Some((name, codegen))
      }
    }.toSeq
  }

  private[graft] def fallbacks(simplePlan: String): Seq[String] =
    nodes(simplePlan).collect {
      case (name, false) if !byDesign.exists(name.startsWith) => name
    }.distinct

  def main(args: Array[String]): Unit = {
    val codegenAudit = args.contains("--codegen")
    val rest = args.filterNot(_ == "--codegen")
    val sfDir = if (rest.nonEmpty) rest(0) else "/root/testdata/sf0.001"
    val names = if (rest.length > 1) rest.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    if (codegenAudit) {
      var nFallback = 0
      names.foreach { n =>
        val line = try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          // AQE materializes WholeStageCodegen per query stage at
          // runtime; the pre-execution plan carries no *(n) markers.
          // Execute first (gated queries return oracle-sized results),
          // then read the final adaptive plan.
          df.collect()
          val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
          if (sys.env.contains("SPARK_GRAFT_AUDIT_DUMP")) println(plan)
          val fb = fallbacks(plan)
          if (fb.isEmpty) s"| $n | clean | — |"
          else { nFallback += 1; s"| $n | FALLBACK | ${fb.mkString(", ")} |" }
        } catch { case e: Throwable => s"| $n | error | ${e.getMessage.take(80)} |" }
        println(s"[codegen] $line")
      }
      println(s"[codegen] total_fallback_queries=$nFallback of ${names.size}")
    } else {
      names.foreach { n =>
        println(s"\n===== $n =====")
        try println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
