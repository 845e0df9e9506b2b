package graft.sources

import graft.api.GDF
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** IO surface — reference §2.1/§2.2 (`dask/dataframe/io`).
  *
  * Every reader maps to a Spark DataSource (vectorized parquet/orc scan,
  * line-splittable csv/json/text, partition-ranged jdbc), so byte-range
  * splitting, schema inference, predicate pushdown and parallel writes —
  * which the reference implements by hand (e.g. csv byte-range splitting
  * `io/csv.py:748`, parquet row-group planning `io/parquet.py:827`) — are
  * engine-native.  `read_hdf`/`to_hdf` are documented descopes (no Spark
  * source; SURVEY §2.1).
  */
object IO {

  // ---- readers ---------------------------------------------------------

  def readParquet(spark: SparkSession, path: String, columns: Seq[String] = Nil): GDF = {
    val df = spark.read.parquet(path)
    GDF(if (columns.isEmpty) df else df.select(columns.map(df.col): _*))
  }

  /** `read_csv`: header + dtype inference from sample, like the
    * reference; pass an explicit schema to skip the inference scan (the
    * scalable path — inference reads the data twice).
    */
  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
              schema: Option[StructType] = None, sep: String = ","): GDF = {
    val r = spark.read.option("header", header.toString).option("sep", sep)
    GDF(schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path))
  }

  /** `read_json`: line-delimited by default (splittable); `multiLine`
    * for whole-file documents (one task per file, as in the reference).
    */
  def readJson(spark: SparkSession, path: String, multiLine: Boolean = false): GDF =
    GDF(spark.read.option("multiLine", multiLine.toString).json(path))

  def readOrc(spark: SparkSession, path: String): GDF = GDF(spark.read.orc(path))

  /** `read_fwf`: fixed-width fields — byte-range-splittable text scan +
    * codegen substring slicing per column (the reference parses per chunk
    * with pandas, `io/csv.py:418`).
    *
    * @param widths column widths in characters, in order
    * @param names  output column names (same arity as widths)
    */
  def readFwf(spark: SparkSession, path: String, widths: Seq[Int], names: Seq[String]): GDF = {
    require(widths.size == names.size, "one name per width")
    import org.apache.spark.sql.functions.{col, substring, trim}
    val offsets = widths.scanLeft(1)(_ + _)
    val cols = names.zip(widths).zip(offsets).map { case ((n, w), off) =>
      trim(substring(col("value"), off, w)).as(n)
    }
    GDF(spark.read.text(path).select(cols: _*))
  }

  def readText(spark: SparkSession, path: String): GDF = GDF(spark.read.text(path))

  /** `read_sql_table`: partition by numeric column range — identical
    * semantics to the reference's per-partition `WHERE lo <= col < hi`
    * pushdown (`io/sql.py:195`).
    */
  def readJdbc(spark: SparkSession, url: String, table: String,
               partitionColumn: String, lowerBound: Long, upperBound: Long,
               numPartitions: Int, props: java.util.Properties = new java.util.Properties()): GDF =
    GDF(spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props))

  /** `from_delayed` (reference `io/_delayed.py`): build a frame from
    * driver-defined DELAYED partition thunks — each thunk materializes
    * one partition's rows lazily ON AN EXECUTOR, Spark's scheduler
    * replacing the dask graph (laziness, per-partition placement, and
    * re-execution on failure all come from the RDD contract).  Thunks
    * must be serializable closures (pure functions over driver data).
    */
  def fromDelayed[U: org.apache.spark.sql.Encoder: scala.reflect.ClassTag](
      spark: SparkSession, thunks: Seq[() => IterableOnce[U]]): GDF = {
    val rdd = spark.sparkContext
      .parallelize(thunks, math.max(thunks.size, 1))
      .flatMap(_().iterator)
    GDF(spark.createDataset(rdd).toDF())
  }

  /** bag `read_avro` (reference `dask/bag/avro.py`): Avro CONTAINER files
    * decoded with the core Avro reader (present on every Spark classpath)
    * over `binaryFiles` — one task per file, records surfaced as JSON
    * strings (the Scala analog of the reference's dicts; feed
    * `spark.read.json` / `from_json` for a typed frame).  The spark-avro
    * DataSource would replace this with a vectorized splittable scan when
    * the connector jar is deployed; per-FILE parallelism is the same unit
    * the reference uses (it splits on avro BLOCKS within a file — the
    * upgrade path here, via FileSystem range reads).
    */
  def readAvro(spark: SparkSession, path: String): GDF = {
    import org.apache.avro.file.DataFileStream
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val rows = spark.sparkContext.binaryFiles(path + "/*.avro")
      .flatMap { case (_, pds) =>
        val in = pds.open()
        val reader = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        new Iterator[String] {
          def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) { reader.close(); in.close() }
            h
          }
          def next(): String = reader.next().toString // Avro's canonical JSON
        }
      }
    import spark.implicits._
    GDF(rows.toDF("value"))
  }

  /** bag `to_avro`: writes one Avro container file per partition with the
    * core Avro writer (records = `{"value": <string>}`), the mirror of
    * [[readAvro]]'s per-file unit.
    */
  def toAvro(df: DataFrame, path: String): Unit = {
    val schemaJson =
      """{"type":"record","name":"line","fields":[{"name":"value","type":"string"}]}"""
    val col0 = df.columns.head
    df.select(org.apache.spark.sql.functions.col(col0).cast("string").as("value"))
      .rdd.map(_.getString(0))
      .mapPartitionsWithIndex { (pid, it) =>
        import org.apache.avro.Schema
        import org.apache.avro.file.DataFileWriter
        import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
        val schema = new Schema.Parser().parse(schemaJson)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          java.net.URI.create(path), new org.apache.hadoop.conf.Configuration())
        val file = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
        val out = fs.create(file, true)
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        var n = 0L
        it.foreach { s =>
          val rec = new GenericData.Record(schema)
          rec.put("value", s)
          w.append(rec)
          n += 1
        }
        w.close()
        Iterator.single(n)
      }.count(): Unit
  }

  /** `from_map`-style source: one row-group per input item, function
    * applied distributively (reference `io/io.py:237`).
    */
  def fromMap[T: scala.reflect.ClassTag, U: org.apache.spark.sql.Encoder: scala.reflect.ClassTag](
      spark: SparkSession, items: Seq[T],
      numPartitions: Int)(f: T => IterableOnce[U]): GDF = {
    val rdd = spark.sparkContext.parallelize(items, math.min(numPartitions, math.max(items.size, 1)))
      .flatMap(f(_).iterator)
    GDF(spark.createDataset(rdd).toDF())
  }

  // ---- writers ---------------------------------------------------------

  def toParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
                mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def toCsv(df: DataFrame, path: String, header: Boolean = true,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def toJson(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def toOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  def toJdbc(df: DataFrame, url: String, table: String,
             props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.jdbc(url, table, props)
}
