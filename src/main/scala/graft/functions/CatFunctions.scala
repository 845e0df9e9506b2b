package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical surface (reference `dask_expr/_categorical.py:1-212`,
  * `categorize` `_collection.py:3757`).
  *
  * Spark has no categorical dtype; per SURVEY §1.3 categories are modeled
  * as strings plus an explicit integer code column. `categorize` mirrors
  * the reference exactly: one distinct-aggregation computes the category
  * set, codes are assigned in sorted order, and the (small) mapping is
  * broadcast-joined back — no global sort of the data.
  */
object CatFunctions {

  /** Attach a dictionary code column for `c`.  Codes are assigned in
    * sorted order by a range-partitioned sort + `zipWithIndex` — fully
    * parallel, so a silently high-cardinality column degrades to a wide
    * sort instead of serializing into one window task.  The mapping is
    * dictionary-sized by contract and broadcast back onto the data.
    */
  def categorize(df: DataFrame, c: String, codeCol: String): DataFrame = {
    val spark = df.sparkSession
    val distinct = df.select(col(c)).filter(col(c).isNotNull).distinct()
      .repartitionByRange(col(c).asc)
      .sortWithinPartitions(col(c).asc)
    // zipWithIndex = one partition-size count pass + a narrow map; global
    // order is the range-partition order, matching the sorted-codes rule
    val numbered = distinct.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(0), i.toInt)
    }
    val mapping = spark.createDataFrame(numbered,
      org.apache.spark.sql.types.StructType(Seq(
        distinct.schema.fields(0),
        org.apache.spark.sql.types.StructField(codeCol,
          org.apache.spark.sql.types.IntegerType, nullable = false))))
    df.join(broadcast(mapping), Seq(c), "left")
      // pandas .cat.codes sentinel for missing values
      .withColumn(codeCol, coalesce(col(codeCol), lit(-1)))
  }

  /** The category set itself (dask `.cat.categories`). */
  def categories(df: DataFrame, c: String): DataFrame =
    df.select(col(c)).filter(col(c).isNotNull).distinct().orderBy(col(c))
}
