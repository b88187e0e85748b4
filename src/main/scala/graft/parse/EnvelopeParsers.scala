package graft.parse

import graft.model.{CdcOp, TableRegistry, TableSpec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalized CDC event columns produced by both envelope parsers.
  *
  * `data`/`old` are maps with LOWERCASED keys carrying the raw string form of
  * every field — the reference resolves CDC JSON fields case-insensitively
  * (reference: BiremeUtility.java:40-64) and renders every value from its
  * string form (reference: PipeLine.java:292-365). Typed decoding to the
  * target schema happens later in [[Projection]], driven by [[TableSpec]].
  *
  * Column contract: op, sourceTable, mappedTable, ts (ms), seq (long, total
  * order per key), data (map<string,string>), old (map<string,string>, null
  * unless update — Maxwell carries the changed fields' pre-images, Debezium
  * the full `before` image).
  */
object CdcEvents {
  val columns: Seq[String] = Seq("op", "sourceTable", "mappedTable", "ts", "seq", "data", "old")

  /** Lowercase map keys so later lookups are case-insensitive, FIRST match
    * winning on a fold collision — the reference's resolution order
    * (BiremeUtility.java:40-64 returns the first case-insensitive hit). A
    * plain `transform_keys(lower)` would throw Spark's duplicate-map-key
    * exception when a payload carries keys differing only in case (legal
    * with quoted pg columns "ID" and "id"), killing the whole batch.
    */
  private[parse] def lowerKeys(m: Column): Column = {
    val empty = map_from_arrays(
      array().cast("array<string>"), array().cast("array<string>"))
    // first-match-wins fold for the COLLIDING row: O(n²) — the aggregate
    // copies the accumulator map once per entry
    val collisionFold = aggregate(map_entries(m), empty, (acc, e) =>
      when(map_contains_key(acc, lower(e.getField("key"))), acc)
        .otherwise(map_concat(acc,
          map_from_arrays(array(lower(e.getField("key"))),
            array(e.getField("value"))))))
    // …but collisions are the rare exception, so the common collision-free
    // row takes the one-pass transform_keys (guarded: unguarded it would
    // hit Spark's duplicate-map-key EXCEPTION policy on the colliding row).
    // A 200-column table pays 200 map copies per row per map otherwise.
    val loweredKeys = transform(map_keys(m), k => lower(k))
    when(size(array_distinct(loweredKeys)) === size(loweredKeys),
      transform_keys(m, (k, _) => lower(k)))
      .otherwise(collisionFold)
  }

  /** Route source tables to targets and drop unmapped ones (operators F1+F2,
    * reference: MaxwellPipeLine.java:55-71, Config.java:242-272).
    */
  private[parse] def route(df: DataFrame, registry: TableRegistry): DataFrame = {
    val mapping = typedLit(registry.tableMap)
    df.withColumn("mappedTable", element_at(mapping, col("sourceTable")))
      .filter(col("mappedTable").isNotNull)
  }
}

/** Maxwell envelope → normalized events
  * (reference: MaxwellPipeLine.java:127-154).
  *
  * Envelope: `{"database","table","type","ts","data":{...},"old":{...}}`;
  * `type ∈ insert|update|delete`; `old` holds pre-image values of changed
  * fields on update only; `produceTime = ts * 1000`.
  */
object MaxwellParser {
  // data/old parsed as map<string,string>: Spark's JSON reader renders
  // non-string scalars to their literal text for StringType, matching the
  // reference's treat-everything-as-string decode model (SURVEY.md §1.2).
  val envelopeSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", LongType),
    StructField("data", MapType(StringType, StringType)),
    StructField("old", MapType(StringType, StringType))))

  /** Parse a DataFrame of raw JSON strings (column `valueCol`) into the
    * normalized event columns. `seqCol` must give a per-key total order —
    * Kafka `(partition, offset)` folded to a long, or a file line number.
    */
  def events(raw: DataFrame, registry: TableRegistry, seqCol: Column,
             valueCol: String = "value"): DataFrame = {
    val parsed = raw
      .withColumn("seq", seqCol)
      .withColumn("env", from_json(col(valueCol), envelopeSchema))
      .select(
        col("env.type").as("op"),
        concat_ws(".", col("env.database"), col("env.table")).as("sourceTable"),
        (col("env.ts") * 1000).as("ts"),
        col("seq"),
        CdcEvents.lowerKeys(col("env.data")).as("data"),
        CdcEvents.lowerKeys(col("env.old")).as("old"))
      .filter(col("op").isin(CdcOp.all: _*))
    CdcEvents.route(parsed, registry).select(CdcEvents.columns.map(col): _*)
  }
}

/** Debezium envelope → normalized events
  * (reference: DebeziumPipeLine.java:86-111, 213-238).
  *
  * Envelope: `{"payload":{"op","ts_ms","before":{...},"after":{...}}}`;
  * `op r|c → insert(after)`, `u → update(after, old = before)`,
  * `d → delete(before)`; events with a missing/null payload are skipped.
  * The source table comes from the Kafka topic name
  * `<namespace>.<schema>.<table>` — callers pass it via `topicCol`
  * (reference: DebeziumPipeLine.java:75-83).
  *
  * Surfacing `before` as `old` goes BEYOND the reference (its Debezium
  * pipeline never produces oldKeys — standard Debezium splits a PK update
  * into d + c events, so `before`'s key never differs from `after`'s):
  * [[Projection.typed]] nulls oldKey whenever it equals the new key, so
  * standard streams are unchanged, while a nonstandard producer emitting a
  * PK-changing `u` still merges correctly instead of leaving the stale row
  * under the old key.
  */
object DebeziumParser {
  val envelopeSchema: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("before", MapType(StringType, StringType)),
      StructField("after", MapType(StringType, StringType)))))))

  /** @param namespace when known (the config's `<source>.namespace`), the
    *   EXACT topic prefix to strip — Debezium's `topic.prefix` may itself
    *   contain dots (`prod.mysql`), in which case the default first-segment
    *   strip would yield a 3-part source name that can never match the
    *   table map's enforced `db.table` keys and every event would be
    *   silently dropped. Without it the standard single-segment prefix is
    *   assumed.
    */
  def events(raw: DataFrame, registry: TableRegistry, seqCol: Column,
             topicCol: Column, valueCol: String = "value",
             namespace: Option[String] = None): DataFrame = {
    // topic "<namespace>.schema.table" → source key "schema.table"; an exact
    // (possibly dotted) namespace strips verbatim, else first segment
    val sourceTable = namespace match {
      case Some(ns) =>
        regexp_extract(topicCol, "^" + java.util.regex.Pattern.quote(ns) + "\\.(.+)$", 1)
      case None => regexp_extract(topicCol, "^[^.]+\\.(.+)$", 1)
    }
    val parsed = raw
      .withColumn("seq", seqCol)
      .withColumn("env", from_json(col(valueCol), envelopeSchema))
      .filter(col("env.payload").isNotNull)
      .select(
        when(col("env.payload.op").isin("r", "c"), CdcOp.Insert)
          .when(col("env.payload.op") === "u", CdcOp.Update)
          .when(col("env.payload.op") === "d", CdcOp.Delete)
          .as("op"),
        sourceTable.as("sourceTable"),
        col("env.payload.ts_ms").as("ts"),
        col("seq"),
        CdcEvents.lowerKeys(
          when(col("env.payload.op") === "d", col("env.payload.before"))
            .otherwise(col("env.payload.after"))).as("data"),
        // the full before image on updates (see object doc: a no-op for
        // standard Debezium streams, correct PK-change handling beyond them)
        when(col("env.payload.op") === "u",
          CdcEvents.lowerKeys(col("env.payload.before")))
          .otherwise(lit(null).cast(MapType(StringType, StringType))).as("old"))
      .filter(col("op").isNotNull)
    CdcEvents.route(parsed, registry).select(CdcEvents.columns.map(col): _*)
  }
}

/** Decode normalized events into the target table's types: key / oldKey
  * structs and a typed data struct (operators P3+P4,
  * reference: PipeLine.java:292-365, MaxwellPipeLine.java:87-116).
  */
object Projection {
  sealed trait Flavor
  case object Maxwell extends Flavor
  case object Debezium extends Flavor

  /** Decode one raw string field to its Catalyst type per SURVEY.md §1.3. */
  private def decode(raw: Column, field: StructField, flavor: Flavor): Column = {
    val md = field.metadata
    field.dataType match {
      case StringType if md.contains(Decoders.BitPrecisionKey) =>
        val p = md.getLong(Decoders.BitPrecisionKey).toInt
        flavor match {
          case Maxwell => Decoders.maxwellBit(raw, p)
          case Debezium => Decoders.debeziumBit(raw, p)
        }
      case StringType if md.contains(Decoders.TimePrecisionKey) =>
        val p = md.getLong(Decoders.TimePrecisionKey).toInt
        flavor match {
          case Maxwell => raw // Maxwell sends time-of-day as-is (PipeLine.java:395-397)
          case Debezium => Decoders.debeziumTime(raw, p)
        }
      case StringType => Decoders.stripNul(raw)
      case BinaryType => unbase64(raw)
      case dt: DecimalType => flavor match {
        case Maxwell => raw.cast(dt)
        case Debezium => Decoders.debeziumDecimal(raw, dt)
      }
      case DateType => flavor match {
        case Maxwell => raw.cast(DateType)
        case Debezium => Decoders.debeziumDate(raw)
      }
      case TimestampType => flavor match {
        case Maxwell => raw.cast(TimestampType)
        case Debezium =>
          // Truncate the fraction to the column's declared scale, like the
          // reference (DebeziumPipeLine.java:146-174); default TIMESTAMP(6).
          val p = if (md.contains(Decoders.TimePrecisionKey))
            md.getLong(Decoders.TimePrecisionKey).toInt else 6
          Decoders.debeziumTimestamp(raw, p)
      }
      case dt => raw.cast(dt)
    }
  }

  // Locale.ROOT: the map keys were folded by Spark's locale-independent
  // lower(); a tr-TR JVM default locale would fold "ID" to dotless-i and
  // miss every key
  private def field(m: Column, name: String): Column =
    element_at(m, name.toLowerCase(java.util.Locale.ROOT))

  /** Typed event rows for one target table: (op, ts, seq, key, oldKey, data).
    *
    * `oldKey` is non-null only for updates that move the primary key: each PK
    * field resolves from `old` with fallback to `data` (the Maxwell `old`
    * object carries only changed fields, reference:
    * MaxwellPipeLine.java:156-169) and the struct is nulled when it equals
    * the new key (M5, reference: MaxwellPipeLine.java:110-112).
    */
  /** Case-insensitive schema-field lookup: [[graft.model.TableSpec]]
    * validates pkCols case-insensitively, so resolution here must match —
    * a case-sensitive `fieldIndex` would accept the spec at construction
    * and then throw on the first processed batch.
    */
  private def fieldSpec(schema: StructType, name: String): StructField = {
    val lr = java.util.Locale.ROOT
    schema.fields.find(_.name.toLowerCase(lr) == name.toLowerCase(lr))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not found in schema [${schema.fieldNames.mkString(", ")}]"))
  }

  def typed(events: DataFrame, spec: TableSpec, flavor: Flavor = Maxwell): DataFrame = {
    val data = col("data")
    val old = col("old")
    val keyStruct = struct(spec.pkCols.map(k =>
      decode(field(data, k), fieldSpec(spec.schema, k), flavor).as(k)): _*)
    val oldKeyStruct = struct(spec.pkCols.map(k =>
      decode(coalesce(field(old, k), field(data, k)),
        fieldSpec(spec.schema, k), flavor).as(k)): _*)
    val dataStruct = struct(spec.schema.fields.toSeq.map(f =>
      decode(field(data, f.name), f, flavor).as(f.name)): _*)

    events
      .filter(col("mappedTable") === spec.name)
      .select(
        col("op"), col("ts"), col("seq"),
        keyStruct.as("key"),
        when(col("op") === CdcOp.Update && old.isNotNull && !(oldKeyStruct <=> keyStruct),
          oldKeyStruct).as("oldKey"),
        when(col("op") =!= CdcOp.Delete, dataStruct).as("data"))
  }
}
