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

  /** Attach a dictionary code column for `c`. The mapping table is
    * distinct-sized (dimension scale), so the window that numbers it and
    * the join that applies it are both cheap at any data size.
    */
  def categorize(df: DataFrame, c: String, codeCol: String): DataFrame = {
    val w = Window.orderBy(col(c))
    val mapping = df.select(col(c)).filter(col(c).isNotNull).distinct()
      .withColumn(codeCol, (row_number().over(w) - 1).cast("int"))
    df.join(broadcast(mapping), Seq(c), "left")
      // pandas .cat.codes sentinel for missing values
      .withColumn(codeCol, coalesce(col(codeCol), lit(-1)))
  }

  /** The category set itself (dask `.cat.categories`). */
  def categories(df: DataFrame, c: String): DataFrame =
    df.select(col(c)).filter(col(c).isNotNull).distinct().orderBy(col(c))
}
