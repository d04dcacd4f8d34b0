package graft.sink

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Sink configuration, mirroring the reference's option contract
  * (reference `HiveOptions.scala:89-114`): required options throw an
  * [[IllegalArgumentException]] naming the missing key; numeric options
  * carry the reference's defaults (`HiveOptions.scala:33-38`):
  * `batch.size` = 10000 rows per flushed batch, `txn.per.batch` = 100
  * batches per rotated file segment.
  *
  * Option mapping from the reference (`README.md:72-78`):
  *  - `metastore`/`db`/`table` → `path` + `db` + `table` (the destination is
  *    a filesystem table root `path/db.table/` rather than a Hive metastore
  *    endpoint — Spark-first: durability comes from the epoch commit log,
  *    not Hive ACID transactions)
  *  - `partition.columns` → comma-separated partition column names (the
  *    reference reads these from the metastore table; a filesystem sink
  *    declares them explicitly)
  *  - `auto.create.partitions` → kept: when false, writing a partition value
  *    whose directory does not yet exist is an error
  */
final case class GraftSinkOptions(
    path: String,
    db: String,
    table: String,
    partitionColumns: Seq[String],
    batchSize: Int,
    txnPerBatch: Int,
    autoCreatePartitions: Boolean) {

  /** Table root directory: `<path>/<db>.<table>` */
  def tableDir: String = s"$path/$db.$table"
}

object GraftSinkOptions {
  val PATH = "path"
  val DB = "db"
  val TABLE = "table"
  val PARTITION_COLUMNS = "partition.columns"
  val BATCH_SIZE = "batch.size"
  val TXN_PER_BATCH = "txn.per.batch"
  val AUTO_CREATE_PARTITIONS = "auto.create.partitions"

  /** Parse + validate, with the reference's required-option error behavior
    * (`HiveOptions.scala:90-103` throws IllegalArgumentException listing the
    * missing option).
    */
  def from(options: CaseInsensitiveStringMap): GraftSinkOptions = {
    def required(key: String): String = {
      val v = options.get(key)
      if (v == null || v.trim.isEmpty) {
        throw new IllegalArgumentException(
          s"Option '$key' is required for the graft-streaming sink")
      }
      v
    }
    def positiveInt(key: String, default: Int): Int = {
      val v = options.getInt(key, default)
      if (v <= 0) {
        throw new IllegalArgumentException(
          s"Option '$key' must be a positive integer, got $v")
      }
      v
    }
    val partCols = Option(options.get(PARTITION_COLUMNS))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    GraftSinkOptions(
      path = required(PATH),
      db = required(DB),
      table = required(TABLE),
      partitionColumns = partCols,
      batchSize = positiveInt(BATCH_SIZE, 10000),
      txnPerBatch = positiveInt(TXN_PER_BATCH, 100),
      autoCreatePartitions = options.getBoolean(AUTO_CREATE_PARTITIONS, true))
  }
}
