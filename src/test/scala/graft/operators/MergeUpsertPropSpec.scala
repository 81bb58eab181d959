package graft.operators

import graft.PropHelper.samples
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the J5 merge semantics (SURVEY §5.2 item 3):
  * idempotence, insert/update partitioning, per-column rule correctness,
  * and the null-key always-inserts SQLite fidelity.
  */
class MergeUpsertPropSpec extends SparkSpec {

  private val keyGen = Gen.choose(0, 5).map(i => s"k$i")
  private val valGen = Gen.option(Gen.alphaLowerStr.map(_.take(4)))
  private val rowGen = for {
    k <- keyGen; c <- valGen; o <- valGen; p <- valGen
  } yield (k, c, o, p)
  // distinct keys within one relation (the store has a UNIQUE constraint)
  private val relGen = Gen.listOfN(6, rowGen)
    .map(_.groupBy(_._1).map(_._2.head).toList.sortBy(_._1))

  private def df(rows: List[(String, Option[String], Option[String], Option[String])]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "c", "o", "p")
  }

  private def merge(store: DataFrame, batch: DataFrame): DataFrame =
    MergeUpsert(store, batch, keys = Seq("k"),
      coalesceCols = Seq("c"), overwriteCols = Seq("o"), keepCols = Seq("p"))

  private def canon(d: DataFrame): Set[(String, String, String, String)] =
    d.collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet

  private val pairs = samples(Gen.zip(relGen, relGen), 15)

  test("merge is idempotent: re-applying the same batch changes nothing") {
    pairs.foreach { case (s, b) =>
      val once = merge(df(s), df(b)).cache()
      val twice = merge(once, df(b))
      assert(canon(twice) == canon(once), s"store=$s batch=$b")
      once.unpersist()
    }
  }

  test("result keys = store keys ∪ batch keys; per-column rules hold") {
    pairs.foreach { case (s, b) =>
      val out = merge(df(s), df(b)).collect()
        .map(r => r.getString(0) -> (Option(r.getString(1)), Option(r.getString(2)), Option(r.getString(3))))
        .toMap
      val sm = s.map(r => r._1 -> (r._2, r._3, r._4)).toMap
      val bm = b.map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(out.keySet == (sm.keySet ++ bm.keySet))
      out.foreach { case (k, (c, o, p)) =>
        (sm.get(k), bm.get(k)) match {
          case (Some((sc, so, sp)), Some((bc, bo, bp))) =>
            assert(c == bc.orElse(sc), s"coalesce col at $k") // batch unless null
            assert(o == bo, s"overwrite col at $k")           // even with null
            assert(p == sp, s"keep col at $k")                // store even with null
          case (Some(sv), None) => assert((c, o, p) == sv)
          case (None, Some(bv)) => assert((c, o, p) == bv)
          case (None, None) => fail("key from nowhere")
        }
      }
    }
  }

  test("duplicate batch keys collapse to one row (no full-outer fan-out)") {
    import spark.implicits._
    val store = Seq(("k1", Some("sc"), Some("so"), Some("sp"))).toDF("k", "c", "o", "p")
    val batch = Seq(
      ("k1", Some("1"), Some("o1"), Some("p1")),
      ("k1", Some("2"), Option.empty[String], Some("p2")))
      .toDF("k", "c", "o", "p")
    val out = MergeUpsert(store, batch, keys = Seq("k"),
      coalesceCols = Seq("c"), overwriteCols = Seq("o"), keepCols = Seq("p"),
      batchOrder = Some(col("c")))
    val rows = out.collect()
    assert(rows.length == 1, "duplicate keys must not fan out")
    val r = rows.head
    assert(r.getString(1) == "2")   // coalesce: last non-null in batch order
    assert(r.getString(2) == null)  // overwrite: LAST batch value, even null
    assert(r.getString(3) == "sp")  // keep: store wins on conflict
  }

  test("batched merge ≡ sequential per-row upserts (reference fidelity)") {
    import spark.implicits._
    val store = Seq(("k1", Some("sc"), Some("so"), Some("sp"))).toDF("k", "c", "o", "p")
    val row1 = Seq(("k1", Option.empty[String], Some("o1"), Some("p1"))).toDF("k", "c", "o", "p")
    val row2 = Seq(("k1", Some("c2"), Option.empty[String], Some("p2"))).toDF("k", "c", "o", "p")
    val sequential = merge(merge(store, row1), row2)
    // batch order: row1 then row2, keyed by an expression that sorts them so
    val batch = row1.unionByName(row2)
    val batched = MergeUpsert(store, batch, keys = Seq("k"),
      coalesceCols = Seq("c"), overwriteCols = Seq("o"), keepCols = Seq("p"),
      batchOrder = Some(col("p"))) // p1 < p2 = arrival order
    assert(canon(batched) == canon(sequential))
  }

  test("null-key duplicate batch rows are NOT collapsed (each inserts)") {
    import spark.implicits._
    val store = Seq(("k1", Some("sc"), Some("so"), Some("sp"))).toDF("k", "c", "o", "p")
    val batch = Seq(
      (null.asInstanceOf[String], Some("b1"), Option.empty[String], Option.empty[String]),
      (null.asInstanceOf[String], Some("b1"), Option.empty[String], Option.empty[String]))
      .toDF("k", "c", "o", "p")
    val out = merge(store, batch)
    // SQLite UNIQUE treats NULLs as distinct: both rows insert
    assert(out.filter(col("k").isNull).count() == 2)
  }

  test("null-key batch rows always insert, never match") {
    import spark.implicits._
    val store = Seq(("k1", Some("sc"), Some("so"), Some("sp")),
      (null.asInstanceOf[String], Some("s-null"), Option.empty[String], Option.empty[String]))
      .toDF("k", "c", "o", "p")
    val batch = Seq((null.asInstanceOf[String], Some("b-null-1"), Option.empty[String], Option.empty[String]),
      (null.asInstanceOf[String], Some("b-null-2"), Option.empty[String], Option.empty[String]))
      .toDF("k", "c", "o", "p")
    val out = merge(store, batch)
    assert(out.count() == 4) // store's 2 + both null-key inserts
    assert(out.filter(col("k").isNull).count() == 3)
  }
}
