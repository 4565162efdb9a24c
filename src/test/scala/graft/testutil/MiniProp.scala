package graft.testutil

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal property-check harness: samples N deterministic values from
  * ScalaCheck generators and runs the assertion body (the scalatestplus
  * bridge isn't available in the offline cache). */
trait MiniProp {
  val miniPropRuns = 100

  private def samples[A](g: Gen[A]): Seq[A] = {
    val p = Gen.Parameters.default
    (0 until miniPropRuns).flatMap(i => g.apply(p, Seed(42L + i)))
  }

  def forAll[A](ga: Gen[A])(body: A => Unit): Unit =
    samples(ga).foreach(body)

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    samples(ga).zip(samples(gb)).foreach { case (a, b) => body(a, b) }

  def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(body: (A, B, C) => Unit): Unit =
    samples(ga).lazyZip(samples(gb)).lazyZip(samples(gc)).foreach { case (a, b, c) => body(a, b, c) }

  def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(
      body: (A, B, C, D) => Unit): Unit =
    samples(ga).lazyZip(samples(gb)).lazyZip(samples(gc)).lazyZip(samples(gd)).foreach {
      case (a, b, c, d) => body(a, b, c, d)
    }

  def forAll[A, B, C, D, E, F, G](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D], ge: Gen[E],
      gf: Gen[F], gg: Gen[G])(body: (A, B, C, D, E, F, G) => Unit): Unit =
    (0 until miniPropRuns).foreach { i =>
      val p = Gen.Parameters.default
      val s = Seed(42L + i)
      for {
        a <- ga.apply(p, s); b <- gb.apply(p, s.next); c <- gc.apply(p, s.next.next)
        d <- gd.apply(p, s.slide); e <- ge.apply(p, s.slide.next)
        f <- gf.apply(p, s.slide.next.next); g <- gg.apply(p, s.slide.slide)
      } body(a, b, c, d, e, f, g)
    }
}
