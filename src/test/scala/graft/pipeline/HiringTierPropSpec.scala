package graft.pipeline

import java.sql.Timestamp

import graft.PropHelper.samples
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property (SURVEY §5.2): adding a recent tech job never lowers the
  * hiring tier, across randomized job boards.
  */
class HiringTierPropSpec extends SparkSpec {

  private val asOf = to_timestamp(lit("2026-08-12 12:00:00"))
  private val careers = "https://boards.greenhouse.io/xcorp"

  private val titleGen = Gen.oneOf(
    "Software Engineer", "ML Engineer", "Backend Developer", // tech
    "Office Manager", "Sales Lead", "Recruiter")             // non-tech
  private val jobGen = for {
    t <- titleGen
    d <- Gen.option(Gen.choose(0, 40)) // posted N days before asOf, or undated
  } yield (t, d)
  private val boardGen = Gen.listOfN(5, jobGen)

  private def tierOf(jobs: List[(String, Option[Int])]): String = {
    import spark.implicits._
    val resolved = Seq(("X Corp", "https://x.example")).toDF("company_name", "domain")
    val anchors = Seq(("https://x.example", 0, careers, "Careers"))
      .toDF("page_url", "ord", "href", "text")
    // render the board as raw Greenhouse JSON — the engine parses it
    val jobsJson = jobs.zipWithIndex.map { case ((t, d), i) =>
      val updated = d.map { days =>
        val dt = java.time.LocalDateTime.parse("2026-08-12T12:00:00").minusDays(days)
        "\"" + dt.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")) + "Z\""
      }.getOrElse("null")
      s"""{"title": "$t", "location": null, "absolute_url": "$careers/jobs/$i", "updated_at": $updated, "created_at": null}"""
    }.mkString("[", ", ", "]")
    val payloads = Seq((careers, "Greenhouse", s"""{"jobs": $jobsJson}"""))
      .toDF("careers_url", "provider", "payload")
    Stages.hiringSignal(resolved, anchors, payloads, asOf)
      .select("hiring_tier").collect().head.getString(0)
  }

  test("adding a recent tech job never lowers the tier") {
    val rank = Map("A" -> 3, "B" -> 2, "C" -> 1)
    samples(boardGen, 6).foreach { board =>
      val before = tierOf(board)
      val after = tierOf(board :+ (("Platform Engineer", Some(2))))
      assert(rank(after) >= rank(before), s"$before -> $after for $board")
      assert(after == "A") // a 2-day-old tech job always makes tier A
    }
  }
}
