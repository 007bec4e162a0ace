package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroIOSpec extends SparkSpec {
  import spark.implicits._

  describe("AvroIO (container-file round-trip)") {
    it("round-trips the full flat type lattice, nulls included, schema intact") {
      withTempDir { dir =>
        val path = s"${dir.getAbsolutePath}/avro"
        val schema = StructType(Seq(
          StructField("s", StringType, nullable = true),
          StructField("l", LongType, nullable = true),
          StructField("i", IntegerType, nullable = true),
          StructField("d", DoubleType, nullable = true),
          StructField("f", FloatType, nullable = true),
          StructField("b", BooleanType, nullable = true),
          StructField("bin", BinaryType, nullable = true)))
        val rows = Seq(
          Row("x\ny", 1L, 2, 1.5d, 0.5f, true, Array[Byte](1, 2, 3)),
          Row("", 0L, 0, 0.0d, 0.0f, false, Array.empty[Byte]),
          Row(null, null, null, null, null, null, null))
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 2), schema)
        AvroIO.write(df, path)
        val back = AvroIO.read(spark, path)
        assert(back.schema == schema)
        val got = back.collect().map(r => (Option(r.get(0)), Option(r.get(1)),
          Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
          Option(r.get(6)).map(_.asInstanceOf[Array[Byte]].toSeq)))
          .sortBy(_._2.map(_.asInstanceOf[Long]))
        val want = rows.map(r => (Option(r.get(0)), Option(r.get(1)),
          Option(r.get(2)), Option(r.get(3)), Option(r.get(4)), Option(r.get(5)),
          Option(r.get(6)).map(_.asInstanceOf[Array[Byte]].toSeq)))
          .sortBy(_._2.map(_.asInstanceOf[Long]))
        assert(got.toSeq == want)
      }
    }

    it("distinguishes empty string from null — the union the CSV leg cannot express") {
      withTempDir { dir =>
        val path = s"${dir.getAbsolutePath}/avro"
        val df = Seq((1L, Some("")), (2L, None), (3L, Some("v")))
          .toDF("id", "s")
        AvroIO.write(df, path)
        val got = AvroIO.read(spark, path)
          .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
        assert(got == Seq((1L, Some("")), (2L, None), (3L, Some("v"))))
      }
    }

    it("a fully empty frame still round-trips with its schema") {
      withTempDir { dir =>
        val path = s"${dir.getAbsolutePath}/avro"
        val df = Seq.empty[(Long, String)].toDF("id", "s")
        AvroIO.write(df, path)
        val back = AvroIO.read(spark, path)
        assert(back.schema.fieldNames.toSeq == Seq("id", "s"))
        assert(back.count() == 0)
      }
    }

    it("one container file per non-empty partition; each read task gets one file") {
      withTempDir { dir =>
        val path = s"${dir.getAbsolutePath}/avro"
        val df = (0L until 100L).toDF("id").repartition(4)
        AvroIO.write(df, path)
        val files = new java.io.File(path).listFiles()
          .filter(_.getName.matches("part-\\d+\\.avro"))
        assert(files.length == 4, files.map(_.getName).mkString(","))
        assert(AvroIO.read(spark, path).as[Long].collect().sorted.toSeq
          == (0L until 100L))
      }
    }

    it("an unsupported column type fails loudly at write time, naming the column type") {
      withTempDir { dir =>
        val df = Seq((1L, Seq("a"))).toDF("id", "arr")
        val ex = intercept[IllegalArgumentException] {
          AvroIO.write(df, s"${dir.getAbsolutePath}/avro")
        }
        assert(ex.getMessage.contains("array<string>"), ex.getMessage)
      }
    }
  }
}
