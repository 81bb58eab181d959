package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic ScalaCheck sampling without the scalatestplus bridge
  * (offline build has scalatest + scalacheck only). Fixed seeds keep the
  * suite reproducible run to run.
  */
object PropHelper {
  def samples[A](gen: Gen[A], n: Int, seed: Long = 42L): Seq[A] =
    (0 until n).map(i => gen.pureApply(Gen.Parameters.default, Seed(seed + i)))
}
