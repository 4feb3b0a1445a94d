package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{HexConv, Keccak256}
import graft.model.ImpermanentLossModel

/** ScalaCheck generalizations of the reference's point-invariant tests
  * (SURVEY.md §5.2 item 2) — pure scalar layers, no Spark jobs. */
object ModelProperties extends Properties("graft") {

  private val ratios = Gen.choose(1e-6, 1e6)

  property("IL ≤ 0 for every price ratio") = Prop.forAll(ratios) { r =>
    ImpermanentLossModel.compute(1000.0, 1000.0 * r).ilPct <= 1e-9
  }

  property("IL(r) == IL(1/r) — AMM symmetry, exact by formula") =
    Prop.forAll(Gen.choose(1e-3, 1e3)) { r =>
      val a = ImpermanentLossModel.compute(1000.0, 1000.0 * r).ilPct
      val b = ImpermanentLossModel.compute(1000.0, 1000.0 / r).ilPct
      math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(a))
    }

  property("LP value never exceeds hold value") = Prop.forAll(ratios) { r =>
    val res = ImpermanentLossModel.compute(1000.0, 1000.0 * r, 10000.0)
    res.lpValue <= res.holdValue + 1e-9
  }

  private val uint256 = Gen.chooseNum(0L, Long.MaxValue).flatMap(a =>
    Gen.chooseNum(0L, Long.MaxValue).map(b =>
      (BigInt(a) << 60) + BigInt(b))) // < 2^124 ≈ 2.1e37 < 10^38 (38 digits)

  property("hex_to_decimal inverts BigInt.toString(16), any case/prefix") =
    Prop.forAll(uint256, Gen.oneOf("", "0x", "0X")) { (n, prefix) =>
      val hex = prefix + n.toString(16)
      val d = HexConv.convert(UTF8String.fromString(hex))
      d != null && BigInt(d.toJavaBigDecimal.toBigInteger) == n
    }

  property("hex_to_decimal: > 38 digits → null, never wrong values") =
    Prop.forAll(Gen.choose(39, 60)) { digits =>
      val n = BigInt("9" * digits)
      HexConv.convert(UTF8String.fromString(n.toString(16))) == null
    }

  private val addresses = Gen.listOfN(40, Gen.oneOf("0123456789abcdef".toSeq))
    .map(cs => "0x" + cs.mkString)

  property("EIP-55 checksum is case-only and idempotent") =
    Prop.forAll(addresses) { a =>
      val c = Keccak256.toChecksumAddress(a)
      c.toLowerCase == a && Keccak256.toChecksumAddress(c) == c
    }

  property("keccak256 is 32 bytes hex and deterministic") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = Keccak256.hashHex(s)
      h.length == 66 && h.startsWith("0x") && h == Keccak256.hashHex(s)
    }

  private val rates = Gen.choose(0.0, 1.5)

  property("rateBoundary is 12 lowercase hex chars below 1, 'g' at/above") =
    Prop.forAll(rates) { r =>
      val b = graft.analytics.CorpusOps.rateBoundary(r)
      if (r >= 1.0) b == "g"
      else b.length == 12 && b.forall(c => "0123456789abcdef".contains(c))
    }

  property("rateBoundary is monotone in the rate (string order)") =
    Prop.forAll(rates, rates) { (r1, r2) =>
      val (lo, hi) = if (r1 <= r2) (r1, r2) else (r2, r1)
      graft.analytics.CorpusOps.rateBoundary(lo) <=
        graft.analytics.CorpusOps.rateBoundary(hi)
    }

  property("rateBoundary quantizes to the exact 2^-48 grid") =
    Prop.forAll(Gen.choose(0.0, 0.999999)) { r =>
      val v = java.lang.Long.parseLong(
        graft.analytics.CorpusOps.rateBoundary(r), 16)
      v == (r * 281474976710656.0).toLong
    }
}
