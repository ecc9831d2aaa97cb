package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest surface for rating data (SURVEY.md §2 O1/O15/O16/O17).
  *
  * The reference normalizes 5 MovieLens layouts offline
  * (ALS-Hadoop/mapid.py:4-24): whitespace-delimited (ml-100k `u.data`),
  * `::`-delimited (ml-1m/10m `ratings.dat`), and comma-delimited with a
  * header row (ml-20m/25m `ratings.csv`); only the first 3 fields survive
  * (mapid.py:21). Here each layout is a declarative reader — no offline
  * rewrite step, Spark scans the raw files directly.
  */
object Ratings {

  sealed trait Format
  /** ml-100k `u.data`: fields split on arbitrary whitespace runs. */
  case object Whitespace extends Format
  /** ml-1m / ml-10m `ratings.dat`: `user::item::rating::ts`. */
  case object DoubleColon extends Format
  /** ml-20m / ml-25m `ratings.csv`: `userId,movieId,rating,timestamp` + header. */
  case object CsvHeader extends Format

  /** O1+O16: schema-enforced scan of any MovieLens layout into the
    * canonical long form (user INT, item INT, rating FLOAT).
    * FAILFAST mirrors the reference's throwing Integer.parseInt
    * (ALS-Hadoop/ALS/ALS.java:91-93).
    */
  def read(spark: SparkSession, path: String, format: Format): DataFrame = format match {
    case Whitespace =>
      // regex split can't be a csv `sep`; split the text line instead —
      // still a narrow, codegen'd projection over the scan.
      spark.read.text(path)
        .select(split(trim(col("value")), "\\s+").as("f"))
        .select(
          element_at(col("f"), 1).cast("int").as("user"),
          element_at(col("f"), 2).cast("int").as("item"),
          element_at(col("f"), 3).cast("float").as("rating"))
    case DoubleColon =>
      spark.read.option("sep", "::").option("mode", "PERMISSIVE")
        .schema("user INT, item INT, rating FLOAT, ts STRING")
        .csv(path)
        .select("user", "item", "rating")
    case CsvHeader =>
      spark.read.option("header", "true").option("mode", "PERMISSIVE")
        .schema("user INT, item INT, rating FLOAT, ts STRING")
        .csv(path)
        .select("user", "item", "rating")
  }

  /** O15 (mapid.py:14-46): deterministic dictionary encoding of an id
    * column. The reference enumerates a Python set (nondeterministic
    * across runs); we sort then zipWithIndex — distributed (no global
    * window / single reducer) and reproducible. Returns (orig, id) with
    * dense 0-based ids.
    */
  def dictionary(df: DataFrame, column: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(column).cast("string")).distinct().orderBy(column)
      .as[String].rdd.zipWithIndex
      .toDF(column, "id")
  }

  /** O15 applied to both id columns: rewrite ratings with dense 0-based
    * user/item ids, returning (encoded ratings, user dict, item dict).
    * The dictionary joins are broadcast when small; at 100 TB the dicts
    * are themselves large, so no hint — AQE picks shuffle vs broadcast.
    */
  def encode(ratings: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val umap = dictionary(ratings, "user").withColumnRenamed("id", "user_id")
    val imap = dictionary(ratings, "item").withColumnRenamed("id", "item_id")
    val enc = ratings
      .withColumn("user", col("user").cast("string"))
      .withColumn("item", col("item").cast("string"))
      .join(umap, "user").join(imap, "item")
      .select(
        col("user_id").cast("int").as("user"),
        col("item_id").cast("int").as("item"),
        col("rating"))
    (enc, umap, imap)
  }

  /** O17 (split.py:5-25): seeded Bernoulli 80/20 train/probe split.
    * Same distribution as the reference's per-line `random.random() < 0.8`;
    * different RNG stream (documented parity gap, SURVEY.md §7).
    */
  def trainProbeSplit(ratings: DataFrame, trainFraction: Double = 0.8, seed: Long = 1L)
      : (DataFrame, DataFrame) = {
    val Array(train, probe) = ratings.randomSplit(Array(trainFraction, 1 - trainFraction), seed)
    (train, probe)
  }
}
