package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Randomized-property checks for the driver-side kernels whose
  * correctness arguments the streaming fold leans on — the
  * differentials in OperatorsSpec exercise them on the real corpus;
  * these pin the ALGEBRA on adversarial random inputs (batchings the
  * corpus never produces, sig sets denser than any real phash
  * distribution). Seeded, so every run checks the identical cases.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  test("sigKeepFold: any batching of any permutation drains to the one-shot aggregate") {
    val rnd = new scala.util.Random(0xf01d)
    for (trial <- 1 to 200) {
      // tiny sig domain so collisions (the interesting case) are common
      val obs = List.fill(rnd.nextInt(60))(
        (rnd.nextInt(16).toLong, rnd.nextInt(1000).toLong))
      val truth = obs.groupBy(_._1).map { case (ph, rows) =>
        ph -> (rows.map(_._2).min, rows.size.toLong)
      }
      val nBatches = 1 + rnd.nextInt(5)
      val perm = rnd.shuffle(obs)
      val store = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      perm.grouped(math.max(1, (perm.size + nBatches - 1) / nBatches))
        .foreach { batch =>
          val agg = batch.groupBy(_._1).map { case (ph, rows) =>
            (ph, rows.map(_._2).min, rows.size.toLong)
          }.toArray
          Multimodal.sigKeepFold(store, agg)
        }
      assert(store.toMap == truth,
        s"trial $trial: fold of $nBatches batches diverged from the one-shot aggregate")
    }
  }

  test("sigComponents: equals the brute-force Hamming-radius transitive closure") {
    val rnd = new scala.util.Random(0x51c5)
    for (trial <- 1 to 100) {
      val present = List.fill(rnd.nextInt(120))(
        rnd.nextLong((1L << Multimodal.PhashBits))).distinct.toArray
      val comp = Multimodal.sigComponents(present)
      // brute force: union-find over pairwise popcount <= radius
      val parent = Array.tabulate(present.length)(identity)
      def find(i: Int): Int =
        if (parent(i) == i) i else { parent(i) = find(parent(i)); parent(i) }
      for {
        i <- present.indices; j <- present.indices if i < j
        if java.lang.Long.bitCount(present(i) ^ present(j)) <= Multimodal.PhashMaxHamming
      } {
        val (a, b) = (find(i), find(j))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
      val naive = present.indices.groupBy(find).values
        .map(_.map(present).toSet).toSet
      val fast = present.groupBy(comp).values.map(_.toSet).toSet
      assert(fast == naive,
        s"trial $trial: sig-space components diverged from the brute-force " +
          s"closure on ${present.length} sigs")
    }
  }

  test("md5-prefix truncation is monotone (the bounded-topk losslessness premise)") {
    // prefix(a) <= prefix(b) whenever a <= b, and prefix(a) < prefix(b)
    // implies a < b — the property every threshold pre-filter's
    // inclusive 52-bit compare rests on
    val rnd = new scala.util.Random(0x9e5f)
    def hex32() = List.fill(32)("0123456789abcdef"(rnd.nextInt(16))).mkString
    for (_ <- 1 to 500) {
      val (a, b) = (hex32(), hex32())
      val (pa, pb) = (a.take(13), b.take(13))
      if (a <= b) assert(pa <= pb)
      if (pa < pb) assert(a < b)
    }
  }
}
