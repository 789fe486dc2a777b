package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE deterministic split assignment — one definition shared by sp1,
  * `CorpusPipeline.clean`, and `CorpusStream.cleanStream`, because all
  * three are spec-asserted to agree and three hand-copies of the same
  * md5 arithmetic were one edit away from silent drift (review r12).
  *
  * bucket = first 8 md5 hex digits of the id as an integer, mod 100
  * (uniform; Spark `conv(x,16,10)` ≡ DuckDB `CAST('0x'||substr(..) AS
  * BIGINT)`); split = 80/10/10 train/val/test. Keyed on the DOC ID, so
  * upstream filtering/dedup cannot bias the assignment.
  */
object SplitAssign {

  def bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("bigint") % 100

  def split(bucketCol: Column): Column =
    when(bucketCol < 80, "train")
      .when(bucketCol < 90, "val")
      .otherwise("test")
}
