package graft

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Source lint for the executor-conf defect class (round-11 verdict
  * finding 1): a zero-arg `new Configuration()` anywhere in src/main
  * silently drops every s3a/hdfs credential the session carries, so
  * code that passes on local FS breaks on the remote object stores a
  * real deployment reads. The pattern was fixed one flagged site at a
  * time across rounds 10–11 (lakeVacuum, m7PageIndex) and kept
  * reappearing; this spec makes the whole class unlandable:
  * [[graft.sources.SessionConf]] is the one sanctioned constructor
  * (`entries` on the driver, `build` inside the closure), and
  * driver-side code must use `spark.sparkContext.hadoopConfiguration`.
  */
class SessionConfLintSpec extends AnyFunSuite {

  private val banned =
    raw"""new\s+(org\.apache\.hadoop\.conf\.)?Configuration\s*\(\s*\)""".r

  private def scalaFiles(root: Path): Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq

  test("src/main has no zero-arg new Configuration() outside SessionConf") {
    val root = Paths.get("src/main/scala")
    assert(Files.isDirectory(root), s"expected to run from repo root, cwd=${Paths.get("").toAbsolutePath}")
    val hits = for {
      f <- scalaFiles(root)
      // SessionConf.scala names the banned pattern in its scaladoc; it
      // constructs only Configuration(false)
      if f.getFileName.toString != "SessionConf.scala"
      (line, idx) <- Files.readAllLines(f).asScala.zipWithIndex
      if banned.findFirstIn(line).isDefined
      // comment lines that merely describe the anti-pattern are fine
      if !line.trim.startsWith("//") && !line.trim.startsWith("*")
    } yield s"$f:${idx + 1}: ${line.trim}"
    assert(hits.isEmpty,
      "zero-arg new Configuration() drops session s3a/hdfs credentials — " +
        "use SessionConf.entries/build (executor closures) or " +
        "spark.sparkContext.hadoopConfiguration (driver):\n  " +
        hits.mkString("\n  "))
  }

  test("SessionConf.build reconstructs session entries including overrides") {
    val spark = TestSpark.spark
    spark.sparkContext.hadoopConfiguration.set("graft.lint.probe", "v-17")
    try {
      val entries = graft.sources.SessionConf.entries(spark)
      val rebuilt = graft.sources.SessionConf.build(entries)
      assert(rebuilt.get("graft.lint.probe") === "v-17")
      // defaults came through too (loadDefaults=true conf iterates them)
      assert(rebuilt.get("fs.defaultFS") != null || entries.nonEmpty)
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.lint.probe")
  }

  test("footer scans work through a rebuilt session conf (S4/S5 executor path)") {
    val spark = TestSpark.spark
    // marker entry visible on the session conf; fileMeta's executor
    // closure must carry it (it rebuilds from SessionConf.entries) —
    // and the scan must still decode real footers through that conf
    spark.sparkContext.hadoopConfiguration.set("graft.lint.footer", "on")
    try {
      val rows = graft.sources.FooterMeta
        .fileMeta(spark, Seq(s"${TestSpark.sf}/region.parquet")).collect()
      assert(rows.nonEmpty && rows.forall(_.num_rows > 0))
      val chunks = graft.sources.FooterMeta
        .chunkStats(spark, Seq(s"${TestSpark.sf}/region.parquet")).collect()
      assert(chunks.nonEmpty)
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.lint.footer")
  }
}
