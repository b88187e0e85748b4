package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}

import graft.model.TableSpec
import graft.operators.CompactedBatch
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** JDBC warehouse sink — the reference's actual load path re-expressed over
  * plain JDBC: stage the batch, `DELETE … WHERE EXISTS` against the target,
  * `INSERT … SELECT` the upsert tuples from the stage, commit ONCE
  * (reference: ChangeLoader.java:211-344 — temp-table COPY at 294-332 and
  * 407-468, delete SQL at 346-369, single-transaction commit at 211-242,
  * rollback-and-drop-connection on failure at 128-138).
  *
  * Scale shape: the row volume moves EXECUTOR-parallel — every partition
  * opens its own connection and batch-inserts into the staging tables, which
  * have no transactional-visibility requirement (they are cleared and rebuilt
  * per merge). The driver's single transaction then only runs three
  * statements inside the database — semi-join DELETE, `INSERT INTO target
  * SELECT DISTINCT FROM stage`, COMMIT — so no tuple ever streams through the
  * driver. The `DISTINCT` absorbs Spark task retries re-inserting a staged
  * partition, and is the reference's own insert dedup (M8,
  * ChangeLoader.java:227-229). The one-transaction visibility point per table
  * matches the reference's one COPY session per table.
  *
  * PostgreSQL `COPY FROM STDIN` becomes `addBatch`/`executeBatch` so any JDBC
  * target works (tests run on embedded Derby; against Greenplum the partition
  * writer can be swapped for CopyManager without touching the merge
  * protocol).
  *
  * Upsert = delete-then-insert in one transaction (M6); deleting a key never
  * present is a no-op (M7); re-applying a batch after a crash-before-commit
  * is idempotent (the stages are cleared at the start of every merge), giving
  * the same effectively-once story as the reference's commit-after-load
  * offset handling (KafkaPipeLine.java:160-179).
  */
final class JdbcTableStore(
    spark: SparkSession,
    url: String,
    val spec: TableSpec,
    insertBatchSize: Int = 1000)
  extends TableStore {

  private val table = spec.name.replace('.', '_').toUpperCase
  private val stageKeys = s"${table}_STAGE_KEYS"
  private val stageRows = s"${table}_STAGE_ROWS"
  private val pk = spec.pkCols
  private val pkFields = pk.map(c => spec.schema(spec.schema.fieldIndex(c)))
  private val colList = spec.schema.fieldNames.mkString(", ")

  private def sqlType(dt: DataType): String = dt match {
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => "VARCHAR(4000)"
    case other => throw new IllegalArgumentException(s"no JDBC mapping for $other")
  }

  private def withConnection[A](f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  private def tableExists(conn: Connection, name: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, name, null)
    try rs.next() finally rs.close()
  }

  /** Create the target table and/or its staging twins if missing — each
    * independently, so a target pre-created by the warehouse side (the
    * reference's normal deployment: it probes pre-existing DDL,
    * Table.java:30-88) still gets its staging tables.
    */
  def ensureTable(): Unit = withConnection { conn =>
    val allCols = spec.schema.fields.map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ")
    val keyCols = pkFields.map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ")
    Seq(table -> allCols, stageKeys -> keyCols, stageRows -> allCols).foreach {
      case (name, cols) =>
        if (!tableExists(conn, name))
          conn.createStatement().execute(s"CREATE TABLE $name ($cols)")
    }
  }

  private def clearStages(): Unit = withConnection { conn =>
    conn.createStatement().execute(s"DELETE FROM $stageKeys")
    conn.createStatement().execute(s"DELETE FROM $stageRows")
  }

  /** Stage `df` into `stageTable` partition-parallel: each partition opens
    * its own connection and commits independently, so staging bandwidth
    * scales with the cluster, not the driver.
    */
  private def stage(df: DataFrame, stageTable: String, fields: Seq[StructField]): Unit = {
    val u = url
    val bs = insertBatchSize
    val sql = s"INSERT INTO $stageTable (${fields.map(_.name).mkString(", ")}) " +
      s"VALUES (${fields.map(_ => "?").mkString(", ")})"
    val n = fields.size
    df.foreachPartition((rows: Iterator[Row]) =>
      JdbcTableStore.writePartition(u, sql, bs, n, rows))
  }

  def init(df: DataFrame): Unit = {
    ensureTable()
    clearStages()
    stage(df.select(spec.dataCols.map(col): _*), stageRows, spec.schema.fields.toSeq)
    withConnection { conn =>
      conn.setAutoCommit(false)
      try {
        conn.createStatement().execute(s"DELETE FROM $table")
        conn.createStatement().execute(
          s"INSERT INTO $table ($colList) SELECT DISTINCT $colList FROM $stageRows")
        conn.commit()
      } catch { case e: Throwable => conn.rollback(); throw e }
    }
  }

  def snapshot(): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  def merge(batch: CompactedBatch): Unit = {
    ensureTable()
    clearStages()
    val keyDf = batch.deletes.select(pk.map(col): _*)
      .unionByName(batch.upserts.select(pk.map(col): _*))
      .dropDuplicates(pk)
    // 1. stage changed keys + upsert tuples, executor-parallel
    //    (reference: temp-table COPY, ChangeLoader.java:454-468)
    stage(keyDf, stageKeys, pkFields)
    stage(batch.upserts.select(spec.dataCols.map(col): _*), stageRows,
      spec.schema.fields.toSeq)

    withConnection { conn =>
      conn.setAutoCommit(false)
      try {
        // 2. semi-join delete (reference: DELETE WHERE EXISTS, 346-369);
        //    covers both tombstones and the delete-before-insert of upserts
        val cond = pk.map(c => s"$table.$c = $stageKeys.$c").mkString(" AND ")
        conn.createStatement().execute(
          s"DELETE FROM $table WHERE EXISTS (SELECT 1 FROM $stageKeys WHERE $cond)")

        // 3. bulk insert the staged upsert tuples (reference: COPY, 294-332);
        //    DISTINCT = the reference's HashSet tuple dedup (M8)
        conn.createStatement().execute(
          s"INSERT INTO $table ($colList) SELECT DISTINCT $colList FROM $stageRows")

        // 4. one commit for the whole task (reference: 211-242)
        conn.commit()
      } catch { case e: Throwable => conn.rollback(); throw e }
    }
  }
}

object JdbcTableStore {
  /** Executor-side staging writer: one connection per partition, batched
    * `PreparedStatement` inserts, one commit per partition. Deliberately a
    * static method so the `foreachPartition` closure captures only strings
    * and ints, never the store (which holds a SparkSession).
    */
  private[sources] def writePartition(
      url: String, sql: String, batchSize: Int, nFields: Int,
      rows: Iterator[Row]): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val ps: PreparedStatement = conn.prepareStatement(sql)
      try {
        var n = 0
        rows.foreach { row =>
          var i = 0
          while (i < nFields) {
            if (row.isNullAt(i)) ps.setNull(i + 1, java.sql.Types.NULL)
            else ps.setObject(i + 1, row.get(i))
            i += 1
          }
          ps.addBatch()
          n += 1
          if (n % batchSize == 0) ps.executeBatch()
        }
        if (n % batchSize != 0) ps.executeBatch()
      } finally ps.close()
      conn.commit()
    } finally conn.close()
  }
}
