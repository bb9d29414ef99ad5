package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for the whole suite (JVM-wide, like the
  * reference's single listener shared by all connections). */
object TestSpark {
  lazy val spark: SparkSession = Engine.build("local[8]", shufflePartitions = 8)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  /** Smallest fixture scale — specs must stay fast. */
  val sf = "/root/testdata/sf0.001"

  /** Spec-scratch temp dir, recursively deleted on JVM exit (unhooked
    * createTempDirectory calls were accumulating ~13 leftover fixture
    * copies per prefix across runs). */
  def tempDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
    p.toString
  }
}
