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

  /** `.cat.codes` (`_categorical.py:116`): the dictionary code column
    * alone, coded in sorted-category order like [[categorize]].
    */
  def codes(df: DataFrame, c: String, codeCol: String = "code"): DataFrame =
    categorize(df, c, codeCol).select(codeCol)

  /** Explicit-dictionary coding — pandas `set_categories`
    * (`_categorical.py:48` tuple): codes become the POSITION of the value
    * in `cats`, and values outside the new dictionary become null with
    * code −1 (pandas turns them into NaN).  In the code-column model
    * `add_categories` / `remove_categories` / `reorder_categories` are
    * all dictionary edits — pass the edited list (pandas itself defines
    * them as `set_categories` shorthands, `pandas/core/arrays/
    * categorical.py`).  The dictionary rides the plan as one map literal
    * (dictionary-sized by contract, like categorize's broadcast).
    */
  def setCategories(df: DataFrame, c: String, codeCol: String,
                    cats: Seq[String]): DataFrame = {
    require(cats.nonEmpty && cats.distinct.size == cats.size,
      "set_categories: categories must be non-empty and unique")
    val m = typedLit(cats.zipWithIndex.toMap)
    df.withColumn(codeCol, coalesce(element_at(m, col(c)), lit(-1)))
      .withColumn(c, when(col(codeCol) >= 0, col(c)))
  }

  /** pandas `rename_categories(dict)`: relabel category VALUES; unlisted
    * categories keep their name, codes are unchanged (a pure relabel).
    */
  def renameCategories(df: DataFrame, c: String,
                       mapping: Map[String, String]): DataFrame = {
    val m = typedLit(mapping)
    df.withColumn(c, coalesce(element_at(m, col(c)), col(c)))
  }

  /** pandas `remove_unused_categories`: the dictionary restricted to the
    * values actually present.  The code-column model derives the
    * dictionary FROM the data, so this is [[categories]] by construction
    * — kept as an explicit member so the parity surface is 1:1.
    */
  def removeUnusedCategories(df: DataFrame, c: String): DataFrame =
    categories(df, c)
}
