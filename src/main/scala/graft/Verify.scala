package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name prefixes (local iteration)
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(',').toSeq) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.getOrCreate(cpus)
    // machine-enforced task-size gate: any "task of very large size"
    // warning during the dump fails the run (a task that ships MBs in its
    // closure is a driver-state bug that only grows with SF) — opt out
    // with SPARK_GRAFT_TASKSIZE_ALLOW=1 for deliberate experiments
    TaskSizeGuard.install()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>

      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // some queries persist() intermediate views (q208/q213); Bench
      // clears between queries, so the dump protocol must too or a long
      // run accumulates cached views (VERDICT r13 #4)
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // task-size verdict: recorded next to the dump, then enforced — the
    // dump itself is complete at this point, so a failure here loses no
    // correctness evidence, it just refuses to bless the run
    val oversized = TaskSizeGuard.warnings
    Files.writeString(Paths.get(s"$outDir/tasksize.json"),
      s"""{"oversized_task_warnings":${oversized.size},"samples":[${
        oversized.take(5).map(q).mkString(",")}]}""")
    spark.stop()
    // opt-out is '=1' exactly — mere presence (or =0) must NOT disable
    // the gate, or a stray exported var blinds CI forever (ADVICE r13 #3)
    if (oversized.nonEmpty && !sys.env.get("SPARK_GRAFT_TASKSIZE_ALLOW").contains("1")) {
      System.err.println(s"[verify] FAIL: ${oversized.size} oversized-task " +
        s"warning(s) — first: ${oversized.head}")
      sys.exit(1)
    }
  }
}
