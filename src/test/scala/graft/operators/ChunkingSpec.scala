package graft.operators

import graft.SparkSpec

/** [[Packing.chunkTokens]]: window layout (starts every `stride`,
  * length ≤ `maxLen`), full token coverage, tiling at stride = maxLen,
  * and argument validation.
  */
class ChunkingSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def doc(id: Long, n: Int) =
    (id, (0 until n).map(i => s"t$i").mkString(" "))

  test("overlapping windows: starts, lengths, and text") {
    val df = Seq(doc(1L, 10)).toDF("doc_id", "text")
    val out = Packing.chunkTokens(df, "doc_id", "text", maxLen = 4, stride = 3)
      .orderBy($"chunk_idx")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(out.toSeq == Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 3L, 4L, "t3 t4 t5 t6"),
      (2L, 6L, 4L, "t6 t7 t8 t9"),
      (3L, 9L, 1L, "t9")))
  }

  test("every token is covered by at least one window") {
    val df = (1 to 40).map(i => doc(i.toLong, 1 + i * 3 % 29)).toDF("doc_id", "text")
    val covered = Packing.chunkTokens(df, "doc_id", "text", maxLen = 7, stride = 5)
      .select($"doc_id", explode(sequence($"chunk_start",
        $"chunk_start" + $"n_tokens" - 1)).as("pos"))
      .distinct().groupBy($"doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = df.select($"doc_id", size(split($"text", " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(covered == expected, "window union must equal each doc's token range")
  }

  test("stride = maxLen tiles without overlap, mass preserved") {
    val df = Seq(doc(1L, 11), doc(2L, 8)).toDF("doc_id", "text")
    val out = Packing.chunkTokens(df, "doc_id", "text", maxLen = 4, stride = 4)
    val mass = out.agg(sum($"n_tokens")).collect().head.getLong(0)
    assert(mass == 19L, "non-overlapping tiling must preserve token mass")
    assert(out.count() == 3 + 2)
  }

  test("invalid arguments rejected") {
    val df = Seq(doc(1L, 5)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.chunkTokens(df, "doc_id", "text", maxLen = 0, stride = 1)
    }
    intercept[IllegalArgumentException] {
      // stride > maxLen would silently drop the tokens between windows
      Packing.chunkTokens(df, "doc_id", "text", maxLen = 4, stride = 5)
    }
  }
}
