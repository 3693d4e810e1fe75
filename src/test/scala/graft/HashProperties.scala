package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.HashImpl

/** Pure-kernel property tests (no SparkSession — these run the same code the
  * codegen'd expressions call). */
object HashProperties extends Properties("HashImpl") {

  private val token: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val tokenSet: Gen[Set[String]] = Gen.choose(5, 60)
    .flatMap(n => Gen.listOfN(n, token).map(_.toSet))

  private def arr(items: Iterable[String]): GenericArrayData =
    new GenericArrayData(items.map(UTF8String.fromString).toArray[Any])

  private def estJaccard(a: Set[String], b: Set[String], k: Int): Double = {
    val sa = HashImpl.minhash(arr(a), k, 42L)
    val sb = HashImpl.minhash(arr(b), k, 42L)
    (0 until k).count(i => sa.getLong(i) == sb.getLong(i)).toDouble / k
  }

  property("minhash of identical sets is identical") = forAll(tokenSet) { s =>
    estJaccard(s, s, 32) == 1.0
  }

  property("minhash estimate within 4 sigma of true jaccard") =
    forAll(tokenSet, tokenSet) { (a, b) =>
      val k = 256
      val j = a.intersect(b).size.toDouble / a.union(b).size
      val est = estJaccard(a, b, k)
      val sigma = math.sqrt(j * (1 - j) / k) max 0.01
      math.abs(est - j) <= 4 * sigma
    }

  property("minhash is order- and duplication-invariant") = forAll(tokenSet) { s =>
    val once = HashImpl.minhash(arr(s), 32, 42L)
    val shuffledDup = HashImpl.minhash(arr(s.toList.reverse ++ s.toList), 32, 42L)
    (0 until 32).forall(i => once.getLong(i) == shuffledDup.getLong(i))
  }

  property("dup3Frac equals the compositional distinct-trigram formulation") =
    forAll(Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "x")))) { toks =>
      val grams = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toList
      val expected =
        if (grams.isEmpty) 0.0 else 1.0 - grams.distinct.size.toDouble / grams.size
      val got = HashImpl.dup3Frac(arr(toks))
      math.abs(got - expected) < 1e-12
    }

  property("simhash of a permuted token multiset is unchanged") =
    forAll(tokenSet) { s =>
      HashImpl.simhash64(arr(s.toList)) == HashImpl.simhash64(arr(s.toList.reverse))
    }

  property("rollingHash distinguishes distinct strings (no accidental collisions)") =
    forAll(token, token) { (a, b) =>
      (a == b) == (HashImpl.rollingHash(UTF8String.fromString(a)) ==
        HashImpl.rollingHash(UTF8String.fromString(b)))
    }

  property("minhashText equals minhash over explicitly built shingles") =
    forAll(Gen.oneOf(
      Gen.choose(2, 20).flatMap(n => Gen.listOfN(n, token)),
      Gen.const(List.empty[String]), // empty + whitespace-only documents must
      Gen.const(List.empty[String])  // agree too (all-MaxValue signatures)
    ).flatMap(identity(_))) { toks =>
      val text = if (toks.isEmpty) "   " else toks.mkString(" ")
      val w = 2
      // mirrors Dedup.shingles: no tokens → no shingles (empty signature)
      val shingles =
        if (toks.isEmpty) Nil
        else if (toks.length >= w) toks.sliding(w).map(_.mkString(" ")).toList
        else List(toks.mkString(" "))
      val fused = HashImpl.minhashText(UTF8String.fromString(text), w, 32, 42L)
      val composed = HashImpl.minhash(arr(shingles), 32, 42L)
      // fused hashes UTF-16 chars, composed hashes UTF-8 bytes: identical for
      // ASCII tokens, which alphaLowerChar guarantees
      (0 until 32).forall(i => fused.getLong(i) == composed.getLong(i))
    }

  property("charNgrams kernel equals the compositional substr form") =
    forAll(Gen.oneOf(
      Gen.const(""),
      Gen.const("   "),
      Gen.choose(0, 40).flatMap(n => Gen.listOfN(n,
        Gen.oneOf(Gen.alphaChar, Gen.numChar, Gen.oneOf(' ', '.', ',', '!')))
        .map(_.mkString)))) { s =>
      val n = 3
      // the compositional reference: lower(trim(text)).substr(i, n) for
      // i in 1..greatest(len-(n-1), 1), then array_distinct (first-occurrence
      // order). BMP-only inputs keep String.substring == code-point slicing.
      val t = UTF8String.fromString(s).trim().toLowerCase().toString
      val len = t.length
      val expected = (0 until math.max(len - (n - 1), 1))
        .map(i => t.substring(i, math.min(i + n, len))).distinct.toList
      val got = HashImpl.charNgrams(UTF8String.fromString(s), n)
      val gotList = (0 until got.numElements()).map(got.getUTF8String(_).toString).toList
      gotList == expected
    }

  property("nearestCellUnit == unit-normalize then nearestCell, bit for bit") =
    forAll(for {
      d <- Gen.choose(2, 16)
      k <- Gen.choose(1, 8)
      vec <- Gen.listOfN(d, Gen.choose(-1000, 1000).map(_ / 100.0f))
      cents <- Gen.listOfN(k * d, Gen.choose(-100, 100).map(_ / 100.0))
    } yield (d, vec, cents)) { case (d, vec, cents) =>
      val raw = new GenericArrayData(vec.toArray[Any])
      // the reference path: cast-to-double, sum-of-squares in index order,
      // sqrt, divide (zero vectors divide by 1) — exactly the engine's old
      // normalize lineage
      val dbl = vec.map(_.toDouble).toArray
      var n2 = 0.0
      dbl.foreach(x => n2 += x * x)
      val n = math.sqrt(n2)
      val inv = if (n == 0.0) 1.0 else n
      val unit = new GenericArrayData(dbl.map(_ / inv).toArray[Any])
      val ca = cents.toArray
      HashImpl.nearestCellUnit(raw, ca, d) == HashImpl.nearestCell(unit, ca, d)
    }

  property("cosine is 1 on self, symmetric, and in [-1, 1]") =
    forAll(Gen.choose(4, 64).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100, 100).map(_ / 10.0f)))) { xs =>
      val nonZero = if (xs.forall(_ == 0f)) 1f :: xs.tail else xs
      def ad(v: List[Float]) = new GenericArrayData(v.toArray[Any])
      val a = ad(nonZero)
      val b = ad(nonZero.reverse)
      val selfSim = HashImpl.cosineF(a, a)
      val ab = HashImpl.cosineF(a, b)
      val ba = HashImpl.cosineF(b, a)
      Prop(math.abs(selfSim - 1.0) < 1e-9) &&
        Prop(ab == ba) && Prop(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
    }

  private val floatVec: Gen[Array[Float]] = Gen.choose(4, 64)
    .flatMap(n => Gen.listOfN(n,
      Gen.choose(-8.0, 8.0).map(_.toFloat)).map(_.toArray))
  private def farr(v: Array[Float]): GenericArrayData =
    new GenericArrayData(v.map(java.lang.Float.valueOf).toArray[Any])

  property("srpProjNorm sign structure matches srpBucket's hyperplanes") =
    forAll(floatVec) { v =>
      // recompute the per-bit projections with srpBucket's exact sign rule
      // and check srpProjNorm equals the norm of that projection vector
      val nBits = 16; val seed = 7L * 0x9e3779b97f4a7c15L
      val accs = (0 until nBits).map { b =>
        var acc = 0.0
        for (j <- v.indices) {
          val sign = if ((HashImpl.mix64(seed + b.toLong * 131071L + j) & 1L) == 1L) 1.0 else -1.0
          acc += sign * v(j)
        }
        acc
      }
      val want = math.sqrt(accs.map(a => a * a).sum / nBits)
      val got = HashImpl.srpProjNorm(farr(v), nBits, seed)
      // the bucket bits are exactly the projection signs
      val bucket = HashImpl.srpBucket(farr(v), nBits, seed)
      val bitsOk = (0 until nBits).forall { b =>
        (((bucket >> b) & 1) == 1) == (accs(b) > 0)
      }
      Prop(math.abs(got - want) < 1e-9) && Prop(bitsOk)
    }

  property("minCellDistUnit is the distance AT nearestCellUnit's argmin") =
    forAll(Gen.listOfN(3, floatVec.map(_.take(8))), floatVec.map(_.take(8))) { (cs, v0) =>
      val v = if (v0.length >= 8) v0 else Array.fill(8)(1.0f)
      val cents = cs.filter(_.length >= 8).map(_.take(8))
      (cents.nonEmpty) ==> {
        // unit-normalize centers the way the operators do
        def unit(x: Array[Float]): Array[Double] = {
          val d = x.map(_.toDouble)
          val n = math.sqrt(d.map(a => a * a).sum)
          val inv = if (n == 0.0) 1.0 else n
          d.map(_ / inv)
        }
        val flat = cents.flatMap(unit).toArray
        val best = HashImpl.nearestCellUnit(farr(v), flat, 8)
        val dmin = HashImpl.minCellDistUnit(farr(v), flat, 8)
        // recompute the distance to the chosen cell
        val u = unit(v)
        val off = best * 8
        var dd = 0.0
        for (j <- 0 until 8) { val df = u(j) - flat(off + j); dd += df * df }
        Prop(math.abs(dd - dmin) < 1e-9)
      }
    }

  property("normF equals the sequential norm of the widened floats") =
    forAll(floatVec) { v =>
      var s2 = 0.0
      v.foreach(x => s2 += x.toDouble * x.toDouble)
      Prop(HashImpl.normF(farr(v)) == math.sqrt(s2))
    }
}
