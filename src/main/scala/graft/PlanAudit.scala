package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `explain("formatted")` for representative
  * catalog queries and asserts the scale-critical plan properties hold —
  * broadcast joins where dims are small, partial aggregation, pushed
  * filters / pruned read schemas, TakeOrderedAndProject for top-k. Run as
  * `runMain graft.PlanAudit [sfDir]`; exits nonzero if an expectation is
  * violated (so the plan shape is CI-checkable, not just eyeballed).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = Sessions.local(8, appName = "plan-audit")
    spark.sparkContext.setLogLevel("WARN")
    var failures = 0

    def audit(name: String, expectations: (String, String => Boolean)*): Unit = {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n===== $name =====")
      println(plan.linesIterator.take(40).mkString("\n"))
      expectations.foreach { case (what, check) =>
        val ok = check(plan)
        if (!ok) failures += 1
        println(s"[audit] $name :: $what -> ${if (ok) "OK" else "VIOLATED"}")
      }
    }

    // star join: both dims broadcast, fact side never shuffled for them
    audit("j1_star_join",
      "customer+nation broadcast" -> (p => "BroadcastHashJoin".r.findAllIn(p).size >= 2),
      "partial aggregation" -> (_.contains("HashAggregate")))
    // flagship agg: partial agg + pruned columns; codegen is checked on the
    // EXECUTED plan (AQE's formatted pre-execution plan hides codegen spans)
    audit("q1_agg",
      "partial aggregation" -> (_.contains("partial_sum")),
      // exists+check, not forall: a plan format without a ReadSchema line
      // must fail the audit, not pass it vacuously
      "column-pruned scan (<=4 data cols)" ->
        (p => p.linesIterator.find(_.contains("ReadSchema"))
          .exists(l => l.count(_ == ',') <= 4)))
    locally {
      val df = SparkEntry.queries("q1_agg")(spark, dir)
      df.collect() // executes THIS plan (count() would wrap a new one)
      val executed = df.queryExecution.executedPlan.toString
      // codegen stages print as "WholeStageCodegen (n)" in formatted mode
      // or as "*(n) Operator" markers in tree toString
      val ok = executed.contains("WholeStageCodegen") || executed.contains("*(")
      if (!ok) failures += 1
      println(s"[audit] q1_agg :: whole-stage codegen (executed plan) -> ${if (ok) "OK" else "VIOLATED"}")
    }
    // anti join stays a real join, no cartesian
    audit("j5_anti_join_dedup",
      "left anti join" -> (p => p.contains("LeftAnti")),
      "no cartesian product" -> (p => !p.contains("CartesianProduct")))
    // semi filter join: key filter runs map-side against a broadcast
    // dimension slice — the fact side is never exchanged for the join
    audit("j3_semi_filter_join",
      "broadcast left-semi" -> (p =>
        p.contains("BroadcastHashJoin") && p.contains("LeftSemi")),
      "fact side not shuffled for the join" -> (p =>
        !p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin")))
    // scalar-threshold queries are ONE lazy plan: building the DataFrame
    // must run zero QUERY jobs (a driver-side .head probe would run one —
    // two scans and two scheduling rounds per query at scale). Spark 4
    // runs a tiny footer/schema job per read.parquet call ("parquet at
    // ..."); that is table-open cost, identical for any plan shape, and
    // excluded from the count.
    Seq("j5_anti_join_dedup", "j6_anti_probe").foreach { name =>
      var probeJobs = 0
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (!js.stageInfos.forall(_.name.startsWith("parquet at"))) probeJobs += 1
      }
      spark.sparkContext.addSparkListener(listener)
      SparkEntry.queries(name)(spark, dir) // construction only — no action
      Thread.sleep(300) // listener bus is async; give any job event time to land
      spark.sparkContext.removeSparkListener(listener)
      val ok = probeJobs == 0
      if (!ok) failures += 1
      println(s"[audit] $name :: lazy construction, no driver-side probe jobs -> ${if (ok) "OK" else s"VIOLATED ($probeJobs jobs)"}")
    }
    // similarity/near-dup candidate joins must be bucketed equi-joins,
    // never all-pairs
    audit("d3_simhash",
      "no cartesian product" -> (p => !p.contains("CartesianProduct")))
    audit("sim2_lsh_ann",
      "no cartesian product" -> (p => !p.contains("CartesianProduct")))
    audit("d5_embedding_dup",
      "no cartesian product" -> (p => !p.contains("CartesianProduct")))
    // IVF: the ONLY cross join is vectors × broadcast centroids (K rows);
    // probe→candidate expansion must be an equi-join on cell id
    audit("sim3_ivf_ann",
      "centroid build side broadcast" -> (p => p.contains("BroadcastNestedLoopJoin")
        || p.contains("BroadcastExchange")),
      "no unbroadcast cartesian" -> (p => !p.contains("CartesianProduct")))
    // windowed event agg: partial agg before the shuffle (state per open
    // window x type, not per event)
    audit("st1_window_agg",
      "partial aggregation" -> (_.contains("partial_count")))
    // sessionize: lag + running sum + group-agg all ride ONE user_id
    // hash exchange (plus the final presentation orderBy's range exchange)
    audit("st2_sessionize",
      "single user_id shuffle for the window chain" ->
        (p => "hashpartitioning\\(user_id".r.findAllIn(p).size <= 1))
    // top-k must be TakeOrderedAndProject, not a global sort+window
    audit("w1_ranked_topk",
      "take-ordered top-k" -> (_.contains("TakeOrderedAndProject")))
    // melt: Expand node, single pass over input
    audit("p1_melt_unpivot",
      "expand-based unpivot" -> (_.contains("Expand")))
    // filter pushdown reaches parquet
    audit("p6_range_flags",
      "pushed filters" -> (_.contains("PushedFilters: [")))

    // d4's inverted-index self-join runs on the df-guarded index: no token
    // above the document-frequency cap may reach the join (executed check —
    // the guard is a semi-join, so the bound is a data property of the
    // exact relation the join consumes)
    locally {
      import org.apache.spark.sql.functions.{col, count, max}
      val cap = 50L
      val slice = graft.textops.TextQueries.tokenSets(
        spark.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") < 100))
      val worst = graft.textops.TextQueries.invertedIndex(slice, cap)
        .groupBy(col("token")).agg(count(org.apache.spark.sql.functions.lit(1)).as("df"))
        .agg(max(col("df"))).collect()(0).getLong(0)
      val ok = worst <= cap
      if (!ok) failures += 1
      println(s"[audit] d4_ngram_jaccard :: no token with df > $cap reaches the join (max df = $worst) -> ${if (ok) "OK" else "VIOLATED"}")
    }

    // materialized-pair aggregate: pair expansion is array transforms
    // after a per-order collect, NOT a self-join. Three DISTINCT shuffles:
    // per-order collect (consumed by both the small-set and the
    // degenerate-set branches), the degenerate-order chunk spread, and the
    // per-pair count. The static plan prints the shared collect exchange
    // once per branch (4 textual exchanges); AQE deduplicates it at
    // runtime via stage reuse — asserted on the executed plan below.
    locally {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val df = graft.analytics.MaterializedPairs.candidatePairs(li)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n===== candidate_pairs =====")
      println(plan.linesIterator.take(30).mkString("\n"))
      df.collect() // materialize THIS QueryExecution so AQE finalizes it
      // the adaptive toString prints "== Final Plan ==" then the initial
      // plan; assert on the final section only
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      Seq(
        "no self-join" -> !plan.contains("Join"),
        "generate-based pair expansion" -> plan.contains("Generate"),
        // formatted mode prints each node twice (tree + detail section);
        // the "(n) Exchange" detail headers count each exchange once
        "four static exchanges (shared collect printed per branch)" ->
          ("""\(\d+\) Exchange""".r.findAllIn(plan).size == 4),
        // healthy data has no >chunkSize order, so AQE's empty-relation
        // propagation deletes the degenerate-spread branch at runtime —
        // the guard's only cost is one empty shuffle stage
        "degenerate branch eliminated at runtime (no oversized orders)" ->
          (!finalPlan.contains("Union") &&
            "Exchange hashpartitioning".r.findAllIn(finalPlan).size == 2))
        .foreach { case (what, ok) =>
          if (!ok) failures += 1
          println(s"[audit] candidate_pairs :: $what -> ${if (ok) "OK" else "VIOLATED"}")
        }
    }

    // CDC-out changelog read: the diff must SCAN only buckets whose file
    // sets differ between the two snapshots (inputFiles is the executed
    // scan set), and the winner diff must be an anti-join, never a
    // cartesian. One commit touching 1 of 16 buckets ⇒ the window read
    // touches that bucket's files only, at BOTH snapshots.
    locally {
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-audit-chg-")
        .toString + "/t"
      val table = graft.lake.LakeTable.create(spark, root, schemaVer = 2, numBuckets = 16)
      val ts = new java.sql.Timestamp(1704067200000L)
      def ev(lsn: Long, conv: String) = graft.model.Model.ChangeEvent(
        lsn, "I", 2, conv, 0, Some("user"), Some(s"t$lsn"), None, Some(ts))
      graft.cdc.MergeApply.applyBatch(table,
        spark.createDataset((0 until 64).map(i => ev(i + 1L, s"conv-$i"))).toDF(), 0L)
      val from = table.current
      graft.cdc.MergeApply.applyBatch(table,
        spark.createDataset(Seq(ev(100L, "conv-0"))).toDF(), 1L)
      val changed = table.changedBuckets(from, table.current)
      val df = table.readChangesSince(from.id)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n===== cdc_changes_since =====")
      println(plan.linesIterator.take(30).mkString("\n"))
      val scanned = df.inputFiles.toSeq
        .flatMap("_bucket=(\\d+)".r.findFirstMatchIn(_).map(_.group(1).toInt)).toSet
      Seq(
        "scan restricted to the changed buckets" ->
          (scanned.nonEmpty && scanned.subsetOf(changed) && changed.size < 16),
        // the whole diff rides ONE full-outer winner join — a second join
        // (the old reverse anti-join) would double changed-bucket scans
        "winner diff is a single full-outer join" ->
          (plan.contains("FullOuter") &&
            """\(\d+\) \w*(Join|CartesianProduct)""".r.findAllIn(plan).size == 1),
        "no cartesian product" -> !plan.contains("CartesianProduct"))
        .foreach { case (what, ok) =>
          if (!ok) failures += 1
          println(s"[audit] cdc_changes_since :: $what -> ${if (ok) "OK" else "VIOLATED"}")
        }
    }

    println(s"\n[audit] total violations: $failures")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
