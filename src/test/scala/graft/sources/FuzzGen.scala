package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Shared scalacheck plumbing for the reader fuzz specs (MatFuzzSpec,
  * H5FuzzSpec, SqliteFuzzSpec, ShapefileFuzzSpec): deterministic
  * seed-driven sampling (a failure reproduces by seed index) and the
  * common identifier generator.
  */
object FuzzGen {

  /** First value `g` produces from the given seed (falling back to
    * nearby seeds if the generator declines one — ours never do).
    */
  def sample[A](g: Gen[A], seed: Long): A =
    Iterator.from(0)
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(seed * 1000 + i)))
      .next()

  /** Alphanumeric identifier starting with a letter. */
  def nameGen(tailLen: Int = 5): Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(tailLen, Gen.alphaNumChar)
  } yield (h :: t).mkString
}
