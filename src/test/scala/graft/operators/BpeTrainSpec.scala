package graft.operators

import graft.SparkSpec

/** [[BpeTrain]]: pair counts use sliding-window multiplicity weighted
  * by word frequency, the winner is (count desc, a, b), merges compound
  * across rounds, and a trained table tokenizes consistently with
  * [[graft.functions.BpeTokenCount]]'s merge semantics.
  */
class BpeTrainSpec extends SparkSpec {

  import spark.implicits._

  test("two rounds on a hand-computed corpus") {
    // histogram: "aaab" n=3, "abab" n=2
    // round 1: (a,a)=2x3=6, (a,b)=1x3+2x2=7, (b,a)=1x2=2 -> winner (a,b) 7
    // merge: aaab -> [a,a,ab]; abab -> [ab,ab]
    // round 2: (a,a)=1x3=3, (a,ab)=1x3=3, (ab,ab)=1x2=2
    //          tie at 3 -> lexicographic: "a" < "ab" -> winner (a,a) 3
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab abab abab")).toDF("doc_id", "text")
    val out = BpeTrain.train(docs, "text", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1, "a", "b", 7L), (2, "a", "a", 3L)), out.toSeq)
  }

  test("tie-break is lexicographic on (a, b)") {
    // "xy" and "xz" both occur twice: counts tie at 2; (x,y) < (x,z)
    val docs = Seq((1L, "xy xz xy xz")).toDF("doc_id", "text")
    val out = BpeTrain.train(docs, "text", rounds = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq(("x", "y", 2L)), out.toSeq)
  }

  test("merged symbols participate in later rounds") {
    // round 1 merges (a,b) -> ab; round 2 must see (ab, c)
    val docs = Seq((1L, "abc abc abc")).toDF("doc_id", "text")
    val out = BpeTrain.train(docs, "text", rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1, "a", "b"), (2, "ab", "c")), out.toSeq)
  }

  test("a trained table is directly executable by the tokenizer") {
    import graft.functions.BpeTokenCount
    // training learns (a,b) then (ab,c); the trained table must
    // tokenize exactly as the trainer modeled the vocabulary
    val docs = Seq((1L, "abc abc abc ad")).toDF("doc_id", "text")
    val table = BpeTrain.train(docs, "text", rounds = 2)
      .orderBy($"merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(table == Seq(("a", "b"), ("ab", "c")), table)
    assert(BpeTokenCount.countWordWith("abc", table) == 1) // a b c -> ab c -> abc
    assert(BpeTokenCount.countWordWith("abd", table) == 2) // ab d
    assert(BpeTokenCount.countWordWith("ad", table) == 2)  // untouched
    assert(BpeTokenCount.countWordWith("cab", table) == 2) // c ab (no wrap-around)
  }

  test("writeMerges/loadMerges round-trips and the artifact executes") {
    import graft.functions.BpeTokenCount
    val docs = Seq((1L, "abc abc abc ad")).toDF("doc_id", "text")
    val trained = BpeTrain.train(docs, "text", rounds = 2)
    val path = java.nio.file.Files
      .createTempDirectory("bpe").resolve("merges.txt").toString
    BpeTrain.writeMerges(trained, path)
    val loaded = BpeTrain.loadMerges(path)
    assert(loaded == Seq(("a", "b"), ("ab", "c")),
      s"artifact must round-trip in learned order: $loaded")
    // the deployable file tokenizes exactly as the in-memory table
    assert(BpeTokenCount.countWordWith("abc", loaded) == 1)
    assert(BpeTokenCount.countWordWith("abd", loaded) == 2)
    // format tolerance: comments and blank lines are ignored, so the
    // artifact parses under the same contract as the shipped resource
    val raw = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    assert(raw.startsWith("#"), "artifact should carry a header comment")
    assert(BpeTokenCount.parseMerges(
      ("" +: "# c" +: raw.linesIterator.toSeq).iterator) == loaded)
  }
}
