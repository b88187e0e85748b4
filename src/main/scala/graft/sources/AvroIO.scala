package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.GenericRecord
import org.apache.avro.mapred.{AvroInputFormat, AvroJob, AvroOutputFormat, AvroWrapper}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapred.JobConf
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file interchange WITHOUT the `spark-avro` datasource
  * (absent from this distribution): the distribution ships the core
  * `avro` + `avro-mapred` jars for its own internals, and those public
  * Hadoop-format APIs are all a container-file round trip needs. Reads and
  * writes stay executor-parallel — `hadoopFile`/`saveAsHadoopFile` split
  * and write per partition exactly like any Hadoop-format source; only the
  * SCHEMA is touched on the driver (one `DataFileReader` open of the first
  * part file), so the path scales like the built-in file sources.
  *
  * Type mapping (both directions):
  *   long/int/double/float/boolean/string/bytes ↔ the obvious Avro
  *   primitives; TimestampType ↔ avro long + `timestamp-micros` logical
  *   type (exact µs, no double); DateType ↔ avro int + `date` logical
  *   type (epoch days). Every field is written as the nullable union
  *   `["null", T]` — Spark columns are nullable by default and Avro
  *   encodes nullability only through unions. DecimalType is rejected
  *   loudly rather than silently widened: Avro's decimal logical type is
  *   bytes + scale metadata, and a lossy double round-trip here would be a
  *   data bug a 100 TB interchange cannot tolerate — cast upstream if a
  *   double is acceptable.
  *
  * Compression is the Avro container default (null codec) — interchange
  * compatibility over size; callers wanting deflate set
  * `avro.output.codec` on a custom JobConf variant if needed.
  */
object AvroIO {

  /** Spark StructType → Avro record schema JSON (nullable-union fields). */
  def toAvroSchemaJson(schema: StructType, name: String = "graft_record"): String = {
    def prim(dt: DataType): String = dt match {
      case LongType => """"long""""
      case IntegerType => """"int""""
      case DoubleType => """"double""""
      case FloatType => """"float""""
      case BooleanType => """"boolean""""
      case StringType => """"string""""
      case BinaryType => """"bytes""""
      case TimestampType => """{"type":"long","logicalType":"timestamp-micros"}"""
      case TimestampNTZType => """{"type":"long","logicalType":"local-timestamp-micros"}"""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case other => throw new IllegalArgumentException(
        s"AvroIO has no lossless mapping for $other (decimal needs bytes+scale; " +
          "nested types are out of the interchange contract) — cast upstream")
    }
    val fields = schema.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${prim(f.dataType)}],"default":null}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  /** Avro file schema → Spark StructType (the read-side inverse, accepting
    * both bare primitives and ["null", T] unions).
    */
  def toStructType(avro: Schema): StructType = {
    def field(s: Schema): DataType = s.getType match {
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.toArray(Array.empty[Schema])
          .filterNot(_.getType == Schema.Type.NULL)
        require(nonNull.length == 1, s"unsupported union $s")
        field(nonNull.head)
      case Schema.Type.LONG =>
        if (s.getLogicalType != null &&
            s.getLogicalType.getName == "timestamp-micros") TimestampType
        else if (s.getLogicalType != null &&
            s.getLogicalType.getName == "local-timestamp-micros") TimestampNTZType
        else LongType
      case Schema.Type.INT =>
        if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
        else IntegerType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.STRING => StringType
      case Schema.Type.BYTES => BinaryType
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
    StructType(avro.getFields.toArray(Array.empty[Schema.Field]).map { f =>
      StructField(f.name(), field(f.schema()), nullable = true)
    })
  }

  /** Write `df` as Avro container files at `path`, one file per partition
    * (`part-NNNNN.avro`), executor-parallel. Values are encoded per the
    * type mapping above; the schema travels in every container header, so
    * the files are self-describing to any Avro reader.
    */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = toAvroSchemaJson(df.schema)
    val sparkSchema = df.schema
    val conf = new JobConf(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputSchema(conf, new Schema.Parser().parse(schemaJson))
    df.rdd.mapPartitions { rows =>
      // parse per task: Schema is serializable in recent Avro, but the
      // JSON string is version-proof and costs one parse per partition
      val schema = new Schema.Parser().parse(schemaJson)
      val dts = sparkSchema.fields.map(_.dataType)
      rows.map { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        var i = 0
        while (i < dts.length) {
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else dts(i) match {
              case TimestampType =>
                // exact µs — java.sql.Timestamp carries ns precision;
                // getTime() alone would floor to ms
                val ts = row.getAs[java.sql.Timestamp](i)
                java.lang.Long.valueOf(
                  math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
              case TimestampNTZType =>
                val ldt = row.getAs[java.time.LocalDateTime](i)
                java.lang.Long.valueOf(
                  ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
                    ldt.getNano / 1000L)
              case DateType =>
                java.lang.Integer.valueOf(
                  row.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
              case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case _ => row.get(i).asInstanceOf[AnyRef]
            }
          rec.put(i, v)
          i += 1
        }
        (new AvroWrapper[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsHadoopFile(path, classOf[AvroWrapper[GenericRecord]],
      classOf[NullWritable], classOf[AvroOutputFormat[GenericRecord]], conf)
  }

  /** Read Avro container files at `path` as a DataFrame. The schema comes
    * from the first container's header (driver-side, one file open); the
    * row decode runs executor-parallel over Hadoop splits.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".avro"))
      .sortBy(_.getName)
      .headOption
      .getOrElse(throw new IllegalArgumentException(s"no .avro files under $path"))
    val reader = new org.apache.avro.file.DataFileReader[GenericRecord](
      new org.apache.avro.mapred.FsInput(first, spark.sparkContext.hadoopConfiguration),
      new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
    val avroSchema = try reader.getSchema finally reader.close()
    val sparkSchema = toStructType(avroSchema)
    val dts = sparkSchema.fields.map(_.dataType)

    val rowRdd = spark.sparkContext.hadoopFile(
      path, classOf[AvroInputFormat[GenericRecord]],
      classOf[AvroWrapper[GenericRecord]], classOf[NullWritable]
    ).map { case (w, _) =>
      val rec = w.datum()
      Row.fromSeq(dts.indices.map { i =>
        val v = rec.get(i)
        if (v == null) null
        else dts(i) match {
          case StringType => v.toString // avro Utf8 → String
          case TimestampType =>
            val us = v.asInstanceOf[java.lang.Long].longValue()
            val ts = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
            ts.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
            ts
          case TimestampNTZType =>
            val us = v.asInstanceOf[java.lang.Long].longValue()
            java.time.LocalDateTime.ofEpochSecond(
              math.floorDiv(us, 1000000L),
              (math.floorMod(us, 1000000L) * 1000L).toInt,
              java.time.ZoneOffset.UTC)
          case DateType =>
            java.sql.Date.valueOf(
              java.time.LocalDate.ofEpochDay(v.asInstanceOf[java.lang.Integer].longValue()))
          case BinaryType =>
            val bb = v.asInstanceOf[java.nio.ByteBuffer]
            val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
          case _ => v
        }
      })
    }
    spark.createDataFrame(rowRdd, sparkSchema)
  }
}
