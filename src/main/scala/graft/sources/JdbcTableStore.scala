package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}

import graft.model.TableSpec
import graft.operators.CompactedBatch
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** JDBC warehouse sink — the reference's actual load path re-expressed over
  * plain JDBC: stage the batch's keys, `DELETE … WHERE EXISTS` against the
  * target, bulk-insert the upsert tuples, commit ONCE
  * (reference: ChangeLoader.java:211-344 — temp-table COPY at 294-332 and
  * 407-468, delete SQL at 346-369, single-transaction commit at 211-242,
  * rollback-and-drop-connection on failure at 128-138).
  *
  * Differences from the Parquet store, by design:
  *  - each merge funnels through ONE connection so deletes+inserts commit in
  *    one transaction — the same single-COPY-session-per-table serialization
  *    point the reference has. Rows stream off the executors via
  *    `toLocalIterator` into a batched `PreparedStatement` (constant driver
  *    memory; batch size = `insertBatchSize`). The horizontal-scale path is
  *    [[ParquetTableStore]]; this sink exists for warehouse parity.
  *  - PostgreSQL `COPY FROM STDIN` becomes `addBatch`/`executeBatch` so any
  *    JDBC target works (tests run on embedded Derby; against Greenplum the
  *    statement path can be swapped for CopyManager without touching the
  *    merge protocol).
  *
  * Upsert = delete-then-insert in one transaction (M6); deleting a key never
  * present is a no-op (M7); re-applying a batch after a crash-before-commit
  * is idempotent, giving the same effectively-once story as the reference's
  * commit-after-load offset handling (KafkaPipeLine.java:160-179).
  */
final class JdbcTableStore(
    spark: SparkSession,
    url: String,
    val spec: TableSpec,
    insertBatchSize: Int = 1000)
  extends TableStore {

  private val table = spec.name.replace('.', '_').toUpperCase
  private val stage = s"${table}_STAGE_KEYS"
  private val pk = spec.pkCols
  private val pkFields = pk.map(c => spec.schema(spec.schema.fieldIndex(c)))

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

  /** Create the target table and/or its key-staging twin if missing — each
    * independently, so a target pre-created by the warehouse side (the
    * reference's normal deployment: it probes pre-existing DDL,
    * Table.java:30-88) still gets its staging table.
    */
  def ensureTable(): Unit = withConnection { conn =>
    if (!tableExists(conn, table)) {
      val cols = spec.schema.fields.map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ")
      conn.createStatement().execute(s"CREATE TABLE $table ($cols)")
    }
    if (!tableExists(conn, stage)) {
      val keyCols = pkFields.map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ")
      conn.createStatement().execute(s"CREATE TABLE $stage ($keyCols)")
    }
  }

  def init(df: DataFrame): Unit = {
    ensureTable()
    withConnection { conn =>
      conn.setAutoCommit(false)
      try {
        conn.createStatement().execute(s"DELETE FROM $table")
        insertRows(conn, df.select(spec.dataCols.map(org.apache.spark.sql.functions.col): _*))
        conn.commit()
      } catch { case e: Throwable => conn.rollback(); throw e }
    }
  }

  def snapshot(): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  /** Batched insert streaming rows off the executors; one statement, one
    * transaction, constant memory.
    */
  private def insertRows(conn: Connection, df: DataFrame): Unit = {
    val fields = spec.schema.fields
    val ps = conn.prepareStatement(
      s"INSERT INTO $table (${fields.map(_.name).mkString(", ")}) " +
        s"VALUES (${fields.map(_ => "?").mkString(", ")})")
    try batched(ps, df) { (ps, row) =>
      fields.indices.foreach { i =>
        if (row.isNullAt(i)) ps.setNull(i + 1, java.sql.Types.NULL)
        else ps.setObject(i + 1, row.get(i))
      }
    } finally ps.close()
  }

  private def batched(ps: PreparedStatement, df: DataFrame)(
      bind: (PreparedStatement, Row) => Unit): Unit = {
    var n = 0
    df.toLocalIterator().forEachRemaining { row =>
      bind(ps, row)
      ps.addBatch()
      n += 1
      if (n % insertBatchSize == 0) ps.executeBatch()
    }
    if (n % insertBatchSize != 0) ps.executeBatch()
  }

  def merge(batch: CompactedBatch): Unit = {
    ensureTable()
    val keyDf = batch.deletes.select(pk.map(org.apache.spark.sql.functions.col): _*)
      .unionByName(batch.upserts.select(pk.map(org.apache.spark.sql.functions.col): _*))
      .dropDuplicates(pk)

    withConnection { conn =>
      conn.setAutoCommit(false)
      try {
        // 1. stage the changed keys (reference: temp-table COPY, 454-468)
        conn.createStatement().execute(s"DELETE FROM $stage")
        val kps = conn.prepareStatement(
          s"INSERT INTO $stage (${pkFields.map(_.name).mkString(", ")}) " +
            s"VALUES (${pkFields.map(_ => "?").mkString(", ")})")
        try batched(kps, keyDf) { (ps, row) =>
          pkFields.indices.foreach { i =>
            if (row.isNullAt(i)) ps.setNull(i + 1, java.sql.Types.NULL)
            else ps.setObject(i + 1, row.get(i))
          }
        } finally kps.close()

        // 2. semi-join delete (reference: DELETE WHERE EXISTS, 346-369);
        //    covers both tombstones and the delete-before-insert of upserts
        val cond = pk.map(c => s"$table.$c = $stage.$c").mkString(" AND ")
        conn.createStatement().execute(
          s"DELETE FROM $table WHERE EXISTS (SELECT 1 FROM $stage WHERE $cond)")

        // 3. bulk insert the upsert tuples (reference: COPY, 294-332)
        insertRows(conn, batch.upserts.select(
          spec.dataCols.map(org.apache.spark.sql.functions.col): _*))

        // 4. one commit for the whole task (reference: 211-242)
        conn.commit()
      } catch { case e: Throwable => conn.rollback(); throw e }
    }
  }
}
