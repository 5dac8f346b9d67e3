package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Avro (de)serialization for the Kafka transport surface — the
  * reference's entire wire format is Schema-Registry Avro
  * (/root/reference/docker-compose.yaml:58-62, producer schemas in
  * traffic-generator/generator.py:167-187).
  *
  * The environment ships Avro core (avro-1.12.1) but not the spark-avro
  * connector, so the engine carries its own StructType↔Schema conversion
  * and row codec. Everything here is driver/executor-side plain JVM code
  * — no SparkSession — so it is closure-shippable and unit-testable with
  * no broker (see [[KafkaIO]] for the DataFrame-level seams).
  *
  * Supported field types = the fixture/reference surface: numeric,
  * string, boolean, binary, timestamp (Avro long + timestamp-micros
  * logical type), nullable via union(null, T).
  */
object AvroCodec {

  /** StructType → Avro record schema. Nullable fields become
    * union(null, T) with a null default, matching what Connect's
    * AvroConverter emits for an optional column.
    */
  def avroSchemaFor(
      schema: StructType,
      name: String = "Record",
      namespace: String = "graft"): Schema = {
    val fields = schema.fields.map { f =>
      new Schema.Field(
        f.name,
        if (f.nullable) Schema.createUnion(
          List(Schema.create(Schema.Type.NULL), avroTypeFor(f.dataType, f.name)).asJava)
        else avroTypeFor(f.dataType, f.name),
        null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, namespace, false, fields.toList.asJava)
  }

  private def avroTypeFor(dt: DataType, fieldName: String): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case ShortType   => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(elem, containsNull) =>
      Schema.createArray(
        if (containsNull) Schema.createUnion(
          List(Schema.create(Schema.Type.NULL), avroTypeFor(elem, fieldName)).asJava)
        else avroTypeFor(elem, fieldName))
    case st: StructType => avroSchemaFor(st, fieldName + "_rec")
    case other => throw new IllegalArgumentException(
      s"AvroCodec: unsupported Spark type $other for field $fieldName")
  }

  /** Avro record schema → StructType — the registry-style inference
    * direction: ksql's `CREATE STREAM events WITH (VALUE_FORMAT='AVRO')`
    * with no column list derives its columns from the Schema-Registry
    * subject (reference README.md:39); here the caller passes the
    * registry-served schema (JSON via [[schemaFromJson]]) and gets the
    * Spark schema, instead of declaring StructTypes by hand.
    */
  def structTypeFor(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"structTypeFor expects a record schema, got ${avro.getType}")
    StructType(avro.getFields.asScala.map { f =>
      val (inner, nullable) = unwrapNullable(f.schema())
      StructField(f.name, sparkTypeFor(inner), nullable)
    }.toSeq)
  }

  /** Parse the JSON text a schema registry serves. */
  def schemaFromJson(json: String): Schema = new Schema.Parser().parse(json)

  private def unwrapNullable(s: Schema): (Schema, Boolean) =
    if (s.isUnion) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only union(null, T) nullability is supported, got $s")
      (nonNull.head, true)
    } else (s, false)

  private def sparkTypeFor(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG =>
      if (s.getLogicalType != null &&
        s.getLogicalType.getName == "timestamp-micros") TimestampType
      else LongType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY =>
      val (inner, containsNull) = unwrapNullable(s.getElementType)
      ArrayType(sparkTypeFor(inner), containsNull)
    case Schema.Type.RECORD => structTypeFor(s)
    case other => throw new IllegalArgumentException(
      s"AvroCodec: unsupported Avro type $other")
  }

  /** Reusable per-partition encoder: datum writer, output buffer, and
    * binary encoder constructed once and reused per record — the hot
    * produce path allocates nothing but the output copy.
    */
  final class RowEncoder(schema: StructType, avro: Schema) {
    private val writer = new GenericDatumWriter[GenericRecord](avro)
    private val out = new ByteArrayOutputStream(256)
    private var enc = EncoderFactory.get().binaryEncoder(out, null)
    def encode(row: Row): Array[Byte] = {
      out.reset()
      enc = EncoderFactory.get().binaryEncoder(out, enc)
      writer.write(toRecord(row, schema, avro), enc)
      enc.flush()
      out.toByteArray
    }
  }

  /** Reusable per-partition decoder (mirror of [[RowEncoder]]): datum
    * reader, decoder, and record instance reused across records. The
    * three-argument form takes SEPARATE writer/reader schemas and runs
    * full Avro schema resolution between them — removed fields skipped,
    * added fields filled from defaults, int→long promotions applied —
    * the consumer-side evolution path a registry deployment exercises on
    * every producer upgrade.
    */
  final class RowDecoder(schema: StructType, writer: Schema, reader: Schema) {
    def this(schema: StructType, avro: Schema) = this(schema, avro, avro)
    private val datumReader = new GenericDatumReader[GenericRecord](writer, reader)
    private var dec: org.apache.avro.io.BinaryDecoder = null
    private var record: GenericRecord = null
    def decode(bytes: Array[Byte]): Row = {
      dec = DecoderFactory.get().binaryDecoder(bytes, dec)
      record = datumReader.read(record, dec)
      fromRecord(record, schema)
    }
  }

  /** Row → Avro binary (one record, raw Avro body, no framing).
    * One-shot convenience; batch paths use [[RowEncoder]].
    */
  def encodeRow(row: Row, schema: StructType, avro: Schema): Array[Byte] =
    new RowEncoder(schema, avro).encode(row)

  /** Avro binary → Row (inverse of [[encodeRow]]); batch paths use
    * [[RowDecoder]].
    */
  def decodeBytes(bytes: Array[Byte], schema: StructType, avro: Schema): Row =
    new RowDecoder(schema, avro).decode(bytes)

  private[sources] def toRecord(row: Row, schema: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, if (row.isNullAt(i)) null
        else toAvroValue(row.get(i), f.dataType, nonNullBranch(avro.getField(f.name).schema())))
    }
    rec
  }

  /** Union-unwrap to the value branch. GenericData resolves union branches
    * by record full name, so nested records must be encoded against the
    * schema instance the PARENT declares (graft.<field>_rec) — never a
    * regenerated one with the default name.
    */
  private def nonNullBranch(s: Schema): Schema =
    if (s.isUnion) s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else s

  private def toAvroValue(v: Any, dt: DataType, avro: Schema): Any = dt match {
    case ShortType => v.asInstanceOf[Short].toInt // Avro INT carries shorts
    case TimestampType => v match {
      case t: java.sql.Timestamp => t.getTime * 1000L + (t.getNanos / 1000) % 1000
      case i: java.time.Instant =>
        i.getEpochSecond * 1000000L + i.getNano / 1000
    }
    case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case ArrayType(elem, _) =>
      val elemSchema = nonNullBranch(avro.getElementType)
      v.asInstanceOf[scala.collection.Seq[Any]]
        .map(e => if (e == null) null else toAvroValue(e, elem, elemSchema)).asJava
    case st: StructType =>
      toRecord(v.asInstanceOf[Row], st, avro)
    case _ => v
  }

  private[sources] def fromRecord(rec: GenericRecord, schema: StructType): Row = {
    val values = schema.fields.map { f =>
      val v = rec.get(f.name)
      if (v == null) null else fromAvroValue(v, f.dataType)
    }
    Row.fromSeq(values.toIndexedSeq)
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = dt match {
    case StringType => v.toString // Avro Utf8 → String
    case ShortType => v.asInstanceOf[Int].toShort
    case TimestampType =>
      val micros = v.asInstanceOf[Long]
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
    case BinaryType =>
      val bb = v.asInstanceOf[ByteBuffer]
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
    case ArrayType(elem, _) =>
      v.asInstanceOf[java.util.List[Any]].asScala
        .map(e => if (e == null) null else fromAvroValue(e, elem)).toSeq
    case st: StructType => fromRecord(v.asInstanceOf[GenericRecord], st)
    case _ => v
  }

  // ---- Confluent Schema-Registry wire format ---------------------------
  // magic byte 0x00 + 4-byte big-endian schema id + Avro body — what the
  // reference's KafkaAvroSerializer actually puts on the topic.

  val MagicByte: Byte = 0x00

  def frame(body: Array[Byte], schemaId: Int): Array[Byte] =
    ByteBuffer.allocate(5 + body.length)
      .put(MagicByte).putInt(schemaId).put(body).array()

  /** → (schemaId, body). Rejects payloads without the magic byte, like
    * the registry deserializer does.
    */
  def unframe(framed: Array[Byte]): (Int, Array[Byte]) = {
    require(framed.length >= 5 && framed(0) == MagicByte,
      s"not a Schema-Registry framed payload (len=${framed.length})")
    val bb = ByteBuffer.wrap(framed)
    bb.get()
    val id = bb.getInt
    val body = new Array[Byte](bb.remaining()); bb.get(body)
    (id, body)
  }
}
