package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funspec.AnyFunSpec

/** Shared local session for specs (one per forked test JVM). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSpec with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestSession.spark
  import scala.reflect.io.Directory

  def withTempDir[A](f: java.io.File => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-spec").toFile
    try f(dir)
    finally { new Directory(dir).deleteRecursively(); () }
  }
}
