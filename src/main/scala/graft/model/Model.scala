package graft.model

import org.apache.spark.sql.types._

/** Canonical change-operation names carried in the normalized event stream.
  *
  * Mirrors the reference's `RowType {INSERT, UPDATE, DELETE}`
  * (reference: src/main/java/cn/hashdata/bireme/Row.java:15-25), kept as
  * strings so they live naturally in DataFrame columns.
  */
object CdcOp {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  val all: Seq[String] = Seq(Insert, Update, Delete)
}

/** Target-table metadata: schema + primary key.
  *
  * The reference fetches this per target table via a zero-row JDBC probe and
  * a pg_index primary-key query, and fails fast when a mapped table has no PK
  * (reference: Table.java:30-88, GetPrimaryKeys.java:39-83). We declare it
  * (or load it from a catalog) instead, but keep the same invariant.
  *
  * @param name     fully qualified target name, e.g. "public.orders"
  * @param schema   column names and Catalyst types, in table order
  * @param pkCols   primary-key column names (must be non-empty, subset of schema)
  */
final case class TableSpec(name: String, schema: StructType, pkCols: Seq[String]) {
  require(pkCols.nonEmpty, s"table $name must have a primary key (reference: GetPrimaryKeys.java:71-83)")
  private val fieldNames = schema.fieldNames.map(_.toLowerCase).toSet
  require(
    pkCols.forall(c => fieldNames.contains(c.toLowerCase)),
    s"table $name: pk columns ${pkCols.mkString(",")} must exist in schema")

  def dataCols: Seq[String] = schema.fieldNames.toSeq
}

/** Source→target routing: which source tables are synced and where to.
  *
  * Mirrors the `tableMap` built from `<source>.properties`
  * (reference: Config.java:242-272): keys are "db.table" on the source,
  * values are target table names present in `specs`. Events whose source
  * table is not a key are dropped (operator F1,
  * reference: MaxwellPipeLine.java:63-71).
  */
final case class TableRegistry(tableMap: Map[String, String], specs: Map[String, TableSpec]) {
  require(
    tableMap.values.forall(specs.contains),
    s"every mapped target needs a TableSpec; missing: ${tableMap.values.filterNot(specs.contains).mkString(",")}")

  def specFor(target: String): TableSpec = specs(target)
  def targets: Seq[String] = tableMap.values.toSeq.distinct
}

object TableRegistry {

  /** §1.4 parity: build the registry from the TARGET database's own metadata
    * at startup, exactly like the reference — a zero-row probe per mapped
    * table for column names/types/precision/scale (reference: Table.java:67-78,
    * `select * from <t> where 1=2`) and a primary-key lookup that fails fast
    * when a mapped table is missing or has no PK (reference:
    * GetPrimaryKeys.java:39-83, "All tables must have primary keys",
    * README.md:20). The PK query is the portable JDBC
    * `DatabaseMetaData.getPrimaryKeys` instead of the reference's
    * Greenplum-specific `pg_index` SQL; the fail-fast contract is identical.
    *
    * @param ident how a target name maps to a DB identifier — the default
    *              mirrors [[graft.sources.JdbcTableStore]]
    *              (`public.orders → PUBLIC_ORDERS`); a real PostgreSQL target
    *              would pass `identity`.
    */
  def fromJdbc(
      url: String,
      tableMap: Map[String, String],
      ident: String => String =
        _.replace('.', '_').toUpperCase(java.util.Locale.ROOT),
      user: Option[String] = None,
      passwd: Option[String] = None): TableRegistry = {
    val conn = user match {
      case Some(u) => java.sql.DriverManager.getConnection(url, u, passwd.orNull)
      case None => java.sql.DriverManager.getConnection(url)
    }
    try {
      val specs = tableMap.values.toSeq.distinct.map { target =>
        val t = ident(target)
        val st = conn.createStatement()
        val fields = try {
          val rs = st.executeQuery(s"SELECT * FROM $t WHERE 1=0")
          try {
            val md = rs.getMetaData
            (1 to md.getColumnCount).map { i =>
              StructField(
                md.getColumnName(i).toLowerCase(java.util.Locale.ROOT),
                catalystType(md.getColumnType(i), md.getPrecision(i), md.getScale(i),
                  target, md.getColumnName(i)))
            }
          } finally rs.close()
        } finally st.close()

        val pkCols = {
          // a schema-qualified ident ("public.orders", the pg identity
          // path) must split into getPrimaryKeys' schema + table arguments:
          // no table is literally NAMED "public.orders", so the one-string
          // form would return no rows and fail startup spuriously. Probe
          // each identifier fold (Derby upper-cases, pg lower-cases).
          val lr = java.util.Locale.ROOT
          val (schemaPart, tablePart) = t.lastIndexOf('.') match {
            // An unqualified ident must probe the CONNECTION's current
            // schema first, not getPrimaryKeys(null, null, t): the null
            // schema searches EVERY schema, and a same-named table in
            // another schema (backup, another user's) could supply wrong
            // PK columns — the column probe above resolves in the current
            // schema, so the PK probe must too. Null stays as the LAST
            // candidate for drivers where getSchema is unsupported/null.
            case -1 =>
              (try conn.getSchema catch { case _: Exception => null: String }, t)
            case i => (t.substring(0, i), t.substring(i + 1))
          }
          def probe(sch: String, tb: String): Seq[(Short, String)] = {
            val rs = conn.getMetaData.getPrimaryKeys(null, sch, tb)
            val buf = scala.collection.mutable.ArrayBuffer.empty[(Short, String)]
            try while (rs.next())
              buf += rs.getShort("KEY_SEQ") -> rs.getString("COLUMN_NAME").toLowerCase(lr)
            finally rs.close()
            buf.toSeq
          }
          // For an UNQUALIFIED name the all-schemas probe (null) stays as
          // the last resort (driver without getSchema support); a name the
          // operator explicitly schema-qualified never falls back — probing
          // other schemas for it is exactly the wrong-PK hazard.
          val schemaCandidates =
            (if (t.lastIndexOf('.') == -1)
              Seq(schemaPart,
                Option(schemaPart).map(_.toLowerCase(lr)).orNull,
                Option(schemaPart).map(_.toUpperCase(lr)).orNull,
                null: String)
            else
              Seq(schemaPart, schemaPart.toLowerCase(lr), schemaPart.toUpperCase(lr))
            ).distinct
          val candidates = for {
            sch <- schemaCandidates
            tb <- Seq(tablePart, tablePart.toLowerCase(lr), tablePart.toUpperCase(lr)).distinct
          } yield (sch, tb)
          candidates.iterator.map { case (sch, tb) => probe(sch, tb) }
            .find(_.nonEmpty).getOrElse(Seq.empty)
            .sortBy(_._1).map(_._2)
        }
        require(pkCols.nonEmpty,
          s"table $target ($t) has no primary key — startup fails fast like the " +
            "reference (GetPrimaryKeys.java:71-83)")
        target -> TableSpec(target, StructType(fields), pkCols)
      }.toMap
      TableRegistry(tableMap, specs)
    } finally conn.close()
  }

  /** java.sql.Types → Catalyst, the inverse of SURVEY.md §1.3's target-type
    * dispatch (reference switches on these same codes, PipeLine.java:298-356).
    */
  private[model] def catalystType(
      sqlType: Int, precision: Int, scale: Int,
      table: String, column: String): DataType = {
    import java.sql.Types._
    sqlType match {
      case TINYINT | SMALLINT | INTEGER => IntegerType
      case BIGINT => LongType
      case DOUBLE | FLOAT => DoubleType
      case REAL => FloatType
      case BOOLEAN | BIT => BooleanType
      case DATE => DateType
      case TIMESTAMP => TimestampType
      case DECIMAL | NUMERIC =>
        // pg-family targets report precision 0 for an unconstrained NUMERIC
        // declaration — DecimalType(0,0) can hold no non-zero value, so the
        // first merge would overflow per-row far from this probe. Spark's
        // widest decimal stands in; beyond-38 declarations fail fast HERE
        // with a clear message instead of at DecimalType construction.
        if (precision < 1) DecimalType.SYSTEM_DEFAULT
        else if (precision > DecimalType.MAX_PRECISION || scale > precision || scale < 0)
          throw new IllegalArgumentException(
            s"$table.$column: NUMERIC($precision,$scale) exceeds Spark's decimal " +
              s"range (max precision ${DecimalType.MAX_PRECISION}, 0 <= scale <= precision)")
        else DecimalType(precision, scale)
      case CHAR | VARCHAR | LONGVARCHAR | NCHAR | NVARCHAR | LONGNVARCHAR | CLOB | NCLOB =>
        StringType
      case BINARY | VARBINARY | LONGVARBINARY | BLOB => BinaryType
      case other =>
        throw new IllegalArgumentException(s"$table.$column: unsupported JDBC type code $other")
    }
  }
}
