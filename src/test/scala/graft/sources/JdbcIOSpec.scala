package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** read_sql_table / to_sql round-trip through the embedded Derby that
  * ships on Spark's classpath (`jdbc:derby:memory:`) — exercises the
  * partition-ranged scan (`io/sql.py:195` semantics) without an external
  * database.
  */
class JdbcIOSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("jdbc round-trip: to_sql then partition-ranged read_sql_table") {
    val df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    IO.toJdbc(df, url, "t_roundtrip", props)
    val back = IO.readJdbc(spark, url, "t_roundtrip", "id", 0, 100, 4, props)
    // the ranged scan splits into numPartitions independent WHERE-range queries
    assert(back.df.rdd.getNumPartitions == 4)
    assert(back.df.count() == 100)
    assert(back.df.agg(sum(col("v"))).head().getLong(0) == 9900L)
    // predicate pushdown survives the JDBC source
    assert(back.df.filter(col("id") < 10).count() == 10)
  }
}
