package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.Path
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro CONTAINER-FILE source/sink — the row-interchange format
  * training-data pipelines meet between engines (Kafka dumps, Beam/
  * Flink handoffs), implemented directly on the avro-java library the
  * Spark distribution already ships (`avro-1.12` + `avro-mapred`'s
  * `FsInput`): no connector jar, no format plugin — the Spark side is
  * plain per-partition imperative I/O, exactly the case the
  * RDD/`mapPartitions` escape hatch exists for.
  *
  * Scope: FLAT row schemas over the primitive lattice
  * (string/long/int/double/float/boolean/binary, each independently
  * nullable via the standard `["null", T]` union) — the q95/q96
  * interchange shape. Nested records/arrays/maps and logical types
  * are out of scope here; a pipeline needing them flattens upstream
  * (the q212 nested-pruning story) or ships the spark-avro connector.
  *
  * Write protocol (the [[graft.pipeline.Emitter]] commit discipline,
  * scaled down): each task writes its partition to an attempt-unique
  * `.tmp` under the output dir and renames to the partition-keyed
  * final name — two attempts of one partition produce identical
  * bytes, so DEST-EXISTS-WINS: a loser only drops its staged copy.
  * Empty partitions write nothing; a fully empty frame still commits
  * one schema-bearing empty file so the round-trip stays total.
  *
  * Read side lists `part-*.avro`, reads the writer schema from the
  * FIRST container header driver-side, and fans the files out one
  * per task (Avro blocks are splittable in principle; file-per-task
  * is the right grain here because the writer already sized files to
  * partitions — a 100 TB reader repartitions after load or writes
  * more, smaller files).
  */
object AvroIO {

  /** Spark → Avro field type for the supported flat lattice. */
  private def avroType(dt: DataType): Schema = dt match {
    case StringType => Schema.create(Schema.Type.STRING)
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case other => throw new IllegalArgumentException(
      s"AvroIO supports flat string/long/int/double/float/boolean/binary " +
        s"columns; got ${other.catalogString} — flatten or re-encode upstream")
  }

  /** Build the Avro record schema for a Spark struct (nullable fields
    * become `["null", T]` unions, the Avro idiom). */
  def avroSchema(schema: StructType): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroType(f.dataType)
      val t = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord("GraftRow", null, "graft.avro", false,
      java.util.List.of(fields: _*))
  }

  /** Avro → Spark inverse mapping (what [[read]] infers from the
    * container header). */
  def sparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"AvroIO.read needs a record schema, got ${schema.getType}")
    def field(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
        require(branches.size == 2 && branches.exists(_.getType == Schema.Type.NULL),
          s"AvroIO supports only [null, T] unions, got $s")
        val inner = branches.find(_.getType != Schema.Type.NULL).get
        (field(inner)._1, true)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.LONG => (LongType, false)
      case Schema.Type.INT => (IntegerType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case other => throw new IllegalArgumentException(
        s"AvroIO cannot map Avro type $other to a flat Spark column")
    }
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = field(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  private def toAvro(v: Any): Any = v match {
    case null => null
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other // String/Long/Int/Double/Float/Boolean pass through
  }

  private def fromAvro(v: Any): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: CharSequence => s.toString
    case bb: java.nio.ByteBuffer =>
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    case other => other
  }

  /** Write `df` as Avro container files under `path` (overwrite). */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val outDir = new Path(path)
    val fs = outDir.getFileSystem(conf)
    // map the schema BEFORE touching the destination: an unsupported
    // column type must throw with the prior dataset intact, not after
    // an overwrite-delete destroyed it
    val schemaJson = avroSchema(df.schema).toString
    if (fs.exists(outDir)) fs.delete(outDir, true)
    fs.mkdirs(outDir)
    val n = df.schema.length
    val confBc = spark.sparkContext.broadcast(new SerializableWritable(conf))
    import spark.implicits._
    // one tiny (pid, rows) receipt per partition keeps this in the
    // Dataset API; the action drives the distributed file writes
    val receipts = df.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val schema = new Schema.Parser().parse(schemaJson)
        val c = confBc.value.value
        val dir = new Path(path)
        val f = dir.getFileSystem(c)
        val tmp = new Path(dir, f".part-$pid%05d-a${tc.attemptNumber()}.avro.tmp")
        val dst = new Path(dir, f"part-$pid%05d.avro")
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, f.create(tmp, true))
        var written = 0L
        try {
          rows.foreach { r =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < n) { rec.put(i, toAvro(r.get(i))); i += 1 }
            w.append(rec)
            written += 1
          }
        } finally w.close()
        // dest-exists-wins: a concurrent duplicate attempt committed
        // the identical bytes; this attempt only drops its stage
        if (f.exists(dst)) f.delete(tmp, false)
        else if (!f.rename(tmp, dst) && !f.exists(dst))
          throw new java.io.IOException(s"AvroIO: rename $tmp -> $dst failed")
        Iterator.single((pid, written))
      }
    }.collect() // bounded: one row per non-empty partition
    confBc.destroy()
    if (receipts.isEmpty) {
      // fully empty frame: commit one schema-bearing empty file so the
      // round-trip stays total
      val schema = new Schema.Parser().parse(schemaJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, fs.create(new Path(outDir, "part-00000.avro"), true))
      w.close()
    }
  }

  /** Read the Avro container files under `path` back as a DataFrame,
    * schema inferred from the first container's writer schema. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val files = fs.globStatus(new Path(dir, "part-*.avro"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"AvroIO.read: no part-*.avro files under $path")
    val header = new DataFileReader[GenericRecord](
      new FsInput(new Path(files.head), conf),
      new GenericDatumReader[GenericRecord]())
    val writerSchema = try header.getSchema finally header.close()
    val schema = sparkSchema(writerSchema)
    val n = schema.length
    val confBc = spark.sparkContext.broadcast(new SerializableWritable(conf))
    val rows = spark.sparkContext
      .parallelize(files.toSeq, files.length) // one container per task
      .flatMap { file =>
        val c = confBc.value.value
        val r = new DataFileReader[GenericRecord](
          new FsInput(new Path(file), c),
          new GenericDatumReader[GenericRecord]())
        // close on exhaustion AND on task end — a short-circuiting
        // consumer (limit/take) must not leak the stream (a leaked
        // connection per task on a remote FS)
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; r.close() }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        new Iterator[Row] {
          def hasNext: Boolean = {
            if (closed) false
            else {
              val h = r.hasNext
              if (!h) closeOnce()
              h
            }
          }
          def next(): Row = {
            val rec = r.next()
            val vals = new Array[Any](n)
            var i = 0
            while (i < n) { vals(i) = fromAvro(rec.get(i)); i += 1 }
            Row.fromSeq(vals.toIndexedSeq)
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
