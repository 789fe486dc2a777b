package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table-lifecycle DDL surface (SURVEY §2.1 S10/S11):
  * CTAS (`create table security as select * from ...`, dp_demo.sql:250)
  * and `truncate table if exists` (dp_demo.sql:16-19), over
  * parquet-backed tables addressed by directory path — consistent with
  * the Pipeline's table layout.
  */
object Ddl {

  /** CTAS: materialize a query result as a new table and hand back the
    * re-read (snapshot semantics — later source mutations don't leak).
    */
  def ctas(df: DataFrame, path: String): DataFrame = {
    df.write.mode("errorifexists").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** TRUNCATE IF EXISTS: keep the table's schema, drop every row. A
    * no-op when the table does not exist (the `if exists` branch).
    * Implemented as an overwrite with an empty plan of the same schema.
    * Single-writer semantics: same-path overwrite deletes the old files
    * before committing new ones, so a CONCURRENT reader holding the old
    * file list can fail mid-scan — the parquet commit protocol does not
    * make in-place overwrite reader-atomic. (Reader-atomic truncate needs
    * write-to-new-dir + pointer swap, i.e. a table format's metadata
    * indirection; the pipeline runs truncate only at setup,
    * dp_demo.sql:16-19, where no readers exist.)
    */
  def truncate(spark: SparkSession, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new org.apache.hadoop.fs.Path(path).toUri, spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path))) {
      val schema: StructType = spark.read.parquet(path).schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(path)
    }
  }
}
