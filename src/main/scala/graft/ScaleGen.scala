package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress fixture generator: replicates the sf0.1 tables ×N with
  * consistent key offsets into an sf1-like directory, so the SAME bench
  * queries can be run at ~10× rows (`runMain graft.ScaleGen [n] [out]`).
  * Used to check that plan shapes hold as data grows (see PLANS.md) —
  * the local stand-in for the 100 TB scale-up question.
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val out = if (args.length > 1) args(1) else "/tmp/sf1"
    val src = "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)

    val KEY_STRIDE = 100000000L // larger than any key in sf0.1

    def rep(df: DataFrame, keyCols: Seq[String]): DataFrame = {
      val copies = broadcast(spark.range(n).select(col("id").as("__rep")))
      val crossed = df.crossJoin(copies)
      keyCols.foldLeft(crossed) { (d, k) =>
        d.withColumn(k, col(k) + col("__rep") * KEY_STRIDE)
      }.drop("__rep")
    }
    def t(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"[scalegen] wrote $name")
    }

    // small dims unreplicated — broadcast joins must stay broadcasts
    write(t("region"), "region")
    write(t("nation"), "nation")
    write(rep(t("customer"), Seq("c_custkey")), "customer")
    write(rep(t("supplier"), Seq("s_suppkey")), "supplier")
    write(rep(t("part"), Seq("p_partkey")), "part")
    write(rep(t("orders"), Seq("o_orderkey", "o_custkey")), "orders")
    write(rep(t("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    // events: written as a plain µs TIMESTAMP (readable by Spark AND the
    // DuckDB oracle; GraftSession.events adapts to either physical form)
    write(rep(GraftSession.events(spark, src), Seq("event_id", "user_id")), "events")
    write(rep(t("documents"), Seq("doc_id")), "documents")
    write(rep(t("embeddings"), Seq("vec_id")), "embeddings")
    spark.stop()
  }
}
