package graft.operators

import graft.SparkSpec

/** [[Dedup.cdcChunks]]: boundaries are content-defined (shift
  * invariance — the property fixed-stride chunking lacks), chunks
  * partition the document, expected length tracks `avgLen`, and the
  * chunk hash is the content identity.
  */
class CdcChunksSpec extends SparkSpec {

  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val body = (0 until 400).map(i => s"w${i * 13 % 211}").mkString(" ")

  test("shift invariance: a prefix edit leaves the chunk-hash tail intact") {
    val docs = Seq(
      (1L, body),
      (2L, "inserted preamble tokens here " + body) // prefix edit only
    ).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, "doc_id", "text", avgLen = 16, seed = 23)
    val h1 = ch.filter($"doc_id" === 1).select($"chunk_hash")
      .collect().map(_.getLong(0)).toSet
    val h2 = ch.filter($"doc_id" === 2).select($"chunk_hash")
      .collect().map(_.getLong(0)).toSet
    val shared = h1.intersect(h2).size.toDouble / h1.size
    assert(shared > 0.8,
      s"CDC must keep most chunks identical under a prefix edit: $shared")
    // the control: fixed-stride chunking misaligns EVERY window (the
    // 4-token insertion is not a multiple of the stride)
    val fx = Packing.chunkTokens(docs, "doc_id", "text", maxLen = 16, stride = 16)
      .withColumn("h", graft.functions.GraftFunctions.hash64($"chunk_text", 23))
    val f1 = fx.filter($"doc_id" === 1).select($"h").collect().map(_.getLong(0)).toSet
    val f2 = fx.filter($"doc_id" === 2).select($"h").collect().map(_.getLong(0)).toSet
    assert(f1.intersect(f2).size.toDouble / f1.size < 0.1,
      "fixed windows must misalign under the same edit — the gap CDC closes")
  }

  test("chunks partition the document; expected length tracks avgLen") {
    val docs = Seq((1L, body)).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, "doc_id", "text", avgLen = 16, seed = 23)
    val total = ch.agg(sum($"n_tokens")).collect().head.getLong(0)
    assert(total == 400L, "chunk token mass must equal the document's")
    val n = ch.count()
    assert(n >= 400 / 16 / 3 && n <= 400 / 16 * 3,
      s"chunk count should be within 3x of n/avgLen: $n")
    // chunk ids are dense from 0
    val ids = ch.select($"chunk_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until n).toSeq)
  }

  test("cutDuplicateChunks: later copies lose the shared chunks, owner untouched") {
    val uniq = (0 until 200).map(i => s"u$i").mkString(" ")
    val tail = (0 until 60).map(i => s"own$i").mkString(" ")
    val docs = Seq((1L, uniq), (2L, uniq + " " + tail)).toDF("doc_id", "text")
    val out = Dedup.cutDuplicateChunks(docs, "doc_id", "text",
        avgLen = 16, seed = 23)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.map(_._1).toSeq == Seq(2L),
      s"only the later copy is affected (doc 1 owns first occurrence): ${out.toSeq}")
    val (_, before, after, clean) = out.head
    assert(before == 260L, s"before must count all of doc 2's tokens: $before")
    // doc 2 keeps its own tail plus at most one boundary-straddling chunk
    // (the chunk where uniq's tail and doc 2's suffix meet differs from
    // doc 1's final chunk, so it survives)
    assert(after >= 60L && after < 100L, s"shared chunks must be cut: $after")
    assert(clean.contains("own59") && !clean.contains("u0 "),
      s"clean text keeps the tail, drops the shared head: $clean")
  }

  test("identical content yields identical chunk hashes across docs") {
    // distinct tokens — `body` repeats with period 211, which would
    // duplicate chunks WITHIN a doc and break the pair count
    val uniq = (0 until 400).map(i => s"u$i").mkString(" ")
    val docs = Seq((1L, uniq), (2L, uniq)).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, "doc_id", "text", avgLen = 16, seed = 23)
    val dup = ch.groupBy($"chunk_hash").count().filter($"count" === 2).count()
    assert(dup == ch.count() / 2, "every chunk must pair with its twin")
  }
}
