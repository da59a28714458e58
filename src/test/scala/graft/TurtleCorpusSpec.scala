package graft

import graft.sources.Turtle
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Parse the full bundled 45-graph Brick corpus (reference:
  * mortar-parquet-client/graphs/, 88 374 lines) — read-only validation that
  * the Turtle subset grammar covers every construct the corpus uses, and
  * that all 7 227 timeseries ids surface (BASELINE.md corpus facts). */
class TurtleCorpusSpec extends AnyFunSuite {
  val dir = Paths.get("/root/reference/mortar-parquet-client/graphs")

  test("all 45 graphs parse; 7 227 hasTimeseriesId literals recovered") {
    assume(Files.isDirectory(dir))
    var total = 0L; var tsIds = 0L; var files = 0
    Files.list(dir).iterator().asScala.filter(_.toString.endsWith(".ttl")).foreach { f =>
      val ts = Turtle.parse(Files.readString(f), f.getFileName.toString)
      files += 1
      total += ts.size
      tsIds += ts.count(_._2 == "https://brickschema.org/schema/Brick#hasTimeseriesId")
    }
    assert(files == 45)
    assert(tsIds == 7227L)
    assert(total > 50000L)
  }
}
