package graft

/** Records the AQE-final join decisions of the TPC-H macro tier at a
  * given replica (VERDICT r11 #4: "the 100× macro gate ... with the AQE
  * join decisions recorded").  For each macro query the result is
  * materialized (so AQE finalizes its runtime re-plan), then the
  * executed plan is scanned for join nodes — the broadcast-vs-shuffle
  * choice per join is THE 100-TB-safety signal for these shapes: a
  * fixed-size dim must stay broadcast at every SF, a growing side must
  * flip to shuffle rather than OOM-broadcast.
  *
  * Usage: `runMain graft.MacroPlanProbe <sfDir> [prefix,...]` → one
  * line per (query, joinNode) plus a per-query row-count line.
  */
object MacroPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val prefixes: Seq[String] =
      if (args.length > 1) args(1).split(',').toSeq
      else Seq("q191", "q192", "q193", "q194", "q196", "q197", "q198",
        "q200", "q201", "q202", "q203", "q204", "q205", "q206",
        "q207", "q208", "q209", "q210", "q211", "q212", "q213", "q214")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.getOrCreate(cpus)
    val joinRe = ("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|" +
      "BroadcastNestedLoopJoin|CartesianProduct)[^\n]*").r
    SparkEntry.queries
      .filter { case (name, _) => prefixes.exists(name.startsWith) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        val df = fn(spark, dir)
        val t0 = System.nanoTime()
        // collect(), not count(): count() runs a SEPARATE pruned
        // QueryExecution, leaving df's own executedPlan an unexecuted
        // initial AdaptiveSparkPlanExec — the probe would print static
        // decisions over a pruned plan (ADVICE r13 #2; macro outputs are
        // small aggregates, collect is safe)
        val n = df.collect().length
        val secs = (System.nanoTime() - t0) / 1e9
        val raw = df.queryExecution.executedPlan.toString
        // keep only the "Final Plan" regions — an executed adaptive plan
        // prints Initial Plan sections too and double-counts every join
        var keepL = true
        val plan = raw.linesIterator.filter { l =>
          if (l.contains("== Initial Plan ==")) keepL = false
          else if (l.contains("== Final Plan ==") || l.contains("Subquery:")) keepL = true
          keepL
        }.mkString("\n")
        val finalized = if (raw.contains("isFinalPlan=true")) "final" else "STATIC"
        println(f"[macroplan] $name rows=$n%d secs=$secs%.2f plan=$finalized")
        joinRe.findAllMatchIn(plan).map(_.group(1)).toSeq
          .groupBy(identity).toSeq.sortBy(_._1)
          .foreach { case (j, xs) => println(s"[macroplan] $name join $j x${xs.size}") }
      }
    spark.stop()
  }
}
