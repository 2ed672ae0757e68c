package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Nomenclature
import graft.functions.Nomenclature.MatchKey

/** Table-driven specs for the nomenclature rule library, cases lifted
  * from the reference's regexes and documented examples
  * (reference: civicutils/match.py:8-549, README.md:220,
  * info_on_matching_framework.md).
  */
class NomenclatureSpec extends AnyFunSuite {

  test("translateAa basic + CIViC-custom codes") {
    assert(Nomenclature.translateAa("V").contains("VAL"))
    assert(Nomenclature.translateAa("v").contains("VAL"))
    assert(Nomenclature.translateAa("*").contains("*"))
    assert(Nomenclature.translateAa("X").contains("*"))
    assert(Nomenclature.translateAa("B").isEmpty)
    assert(Nomenclature.translateAa("Z").isEmpty)
  }

  test("civicNameToHgvs: 1-letter protein names (match.py:24-53)") {
    assert(Nomenclature.civicNameToHgvs("V600E") == List("P.VAL600GLU"))
    // general variant: second aa empty
    assert(Nomenclature.civicNameToHgvs("V600") == List("P.VAL600"))
    // stop codon in 1st position -> TER
    assert(Nomenclature.civicNameToHgvs("*600E") == List("P.TER600GLU"))
    // stop codon in 2nd position stays "*" unless aa1 is TER
    assert(Nomenclature.civicNameToHgvs("V600*") == List("P.VAL600*"))
    assert(Nomenclature.civicNameToHgvs("*600*") == List("P.TER600TER"))
    // X encodes a stop codon
    assert(Nomenclature.civicNameToHgvs("V600X") == List("P.VAL600*"))
    // name with trailing " (" context
    assert(Nomenclature.civicNameToHgvs("V600E (C.1799T>A)") ==
      List("P.VAL600GLU", "C.1799T>A"))
    // unknown aa code -> no string generated
    assert(Nomenclature.civicNameToHgvs("B600E").isEmpty)
    // non-matching names
    assert(Nomenclature.civicNameToHgvs("AMPLIFICATION").isEmpty)
    assert(Nomenclature.civicNameToHgvs("EXON 15 MUTATION").isEmpty)
  }

  test("civicNameToHgvs: frameshift names (match.py:63-71)") {
    assert(Nomenclature.civicNameToHgvs("T157FS") == List("P.THR157FS"))
    assert(Nomenclature.civicNameToHgvs("T157MFS") == List("P.THR157FS"))
  }

  test("civicHgvsToInput: frameshift long->short (match.py:94-98)") {
    assert(Nomenclature.civicHgvsToInput("P.GLU55ARGFSTER11").contains("P.GLU55FS"))
    assert(Nomenclature.civicHgvsToInput("p.Phe76Leufs*56".toUpperCase).contains("P.PHE76FS"))
    // already short: no change -> None
    assert(Nomenclature.civicHgvsToInput("P.GLU55FS").isEmpty)
  }

  test("civicHgvsToInput: nonsense Ter->* (match.py:104-108)") {
    assert(Nomenclature.civicHgvsToInput("P.TRP24TER").contains("P.TRP24*"))
  }

  test("civicHgvsToInput: silent = rewrite (match.py:118-122)") {
    assert(Nomenclature.civicHgvsToInput("P.PRO61=").contains("P.PRO61PRO"))
    assert(Nomenclature.civicHgvsToInput("P.PRO61CYS").isEmpty)
    assert(Nomenclature.civicHgvsToInput("C.1799T>A").isEmpty)
  }

  test("extractPStart (match.py:127-144)") {
    assert(Nomenclature.extractPStart("P.VAL600GLU").contains("P.VAL600"))
    assert(Nomenclature.extractPStart("p.Val600").map(_.toUpperCase).contains("P.VAL600"))
    assert(Nomenclature.extractPStart("C.1799T>A").isEmpty)
  }

  test("checkGeneralVariant (match.py:147-164)") {
    assert(Nomenclature.checkGeneralVariant("V600"))
    assert(Nomenclature.checkGeneralVariant("V600 (BUCKET)"))
    assert(!Nomenclature.checkGeneralVariant("V600E"))
    assert(!Nomenclature.checkGeneralVariant("AMPLIFICATION"))
  }

  test("cnvIsExonString (match.py:167-187)") {
    assert(Nomenclature.cnvIsExonString("EXON 1-2 DELETION"))
    assert(Nomenclature.cnvIsExonString("EXON 5 DELETION"))
    assert(Nomenclature.cnvIsExonString("3' EXON DELETION"))
    assert(Nomenclature.cnvIsExonString("5' EXON DELETION"))
    assert(Nomenclature.cnvIsExonString("EXON 14 SKIPPING MUTATION"))
    assert(!Nomenclature.cnvIsExonString("DELETION"))
    assert(!Nomenclature.cnvIsExonString("EXON 5 MUTATION"))
  }

  test("exprIsExonString (match.py:190-216)") {
    assert(Nomenclature.exprIsExonString("EXON 5 EXPRESSION") == (true, "EXPRESSION"))
    assert(Nomenclature.exprIsExonString("EXON 1-2 OVEREXPRESSION") == (true, "OVEREXPRESSION"))
    assert(Nomenclature.exprIsExonString("EXON 9 UNDEREXPRESSION") == (true, "UNDEREXPRESSION"))
    assert(Nomenclature.exprIsExonString("OVEREXPRESSION") == (false, ""))
  }

  test("civicMatchStrings SNV: full pipeline (match.py:313-367)") {
    // reference README example: V600E record with transcript-prefixed HGVS
    val got = Nomenclature.civicMatchStrings("V600E",
      Seq("NM_004333.4:c.1799T>A", "NP_004324.2:p.Val600Glu"), "SNV")
    assert(got.contains("C.1799T>A"))
    assert(got.contains("P.VAL600GLU"))
    assert(got.contains("P.VAL600"))     // positional prefix
    assert(got.contains("V600E"))        // record name appended last
    assert(got.last == "V600E")
    // no duplicates except possibly the name
    assert(got.count(_ == "P.VAL600GLU") == 1)
  }

  test("civicMatchStrings: name always appended even when duplicated") {
    val got = Nomenclature.civicMatchStrings("P.VAL600GLU", Seq("p.Val600Glu"), "SNV")
    // cleaned hgvs == uppercase name: the name is appended regardless
    assert(got.count(_ == "P.VAL600GLU") == 2)
  }

  test("civicMatchStrings CNV/EXPR: name only (match.py:336)") {
    assert(Nomenclature.civicMatchStrings("AMPLIFICATION", Seq("ignored:c.1A>G"), "CNV")
      == List("AMPLIFICATION"))
    assert(Nomenclature.civicMatchStrings("OVEREXPRESSION", Nil, "EXPR")
      == List("OVEREXPRESSION"))
  }

  test("civicMatchStrings: silent + frameshift + Ter rewrites flow through") {
    val got = Nomenclature.civicMatchStrings("E55FS",
      Seq("NP_1.1:p.Glu55ArgfsTer11"), "SNV")
    assert(got.contains("P.GLU55ARGFSTER11"))
    assert(got.contains("P.GLU55FS"))   // via civicHgvsToInput AND name-derived
    assert(got.contains("P.GLU55"))     // positional
    assert(got.last == "E55FS")
  }

  test("inputMatchStrings SNV: exact + positional + tags (match.py:402-482)") {
    val got = Nomenclature.inputMatchStrings(
      Seq("c.1799T>A", "p.Val600Glu"), "SNV",
      impactAnnotsRaw = Seq("missense_variant"), exonAnnotsRaw = Seq("15/18"))
    val m = got.map(k => k.s -> (k.isExact, k.isTrueExact)).toMap
    assert(m("C.1799T>A") == (true, true))
    assert(m("P.VAL600GLU") == (true, true))
    assert(m("P.VAL600") == (false, false))
    assert(m("MUTATION") == (true, false))
    assert(m("EXON 15 MUTATION") == (true, false))
    assert(!m.contains("INTRON 15 MUTATION"))
  }

  test("inputMatchStrings SNV: impact-driven tags (match.py:442-452)") {
    val got = Nomenclature.inputMatchStrings(Seq("p.Glu55fs"), "SNV",
      impactAnnotsRaw = Seq("frameshift_variant&stop_gained"),
      exonAnnotsRaw = Seq("3/10"))
    val ss = got.map(_.s)
    assert(ss.contains("TRUNCATING MUTATION"))
    assert(ss.contains("FRAMESHIFT MUTATION"))
    assert(ss.contains("EXON 3 MUTATION"))
    assert(ss.contains("EXON 3 FRAMESHIFT"))
  }

  test("inputMatchStrings SNV: intron + UTR tags (match.py:442-470)") {
    val got = Nomenclature.inputMatchStrings(Seq("c.100+1G>A"), "SNV",
      impactAnnotsRaw = Seq("splice_donor_variant&intron_variant"),
      exonAnnotsRaw = Seq("4/7"))
    assert(got.map(_.s).contains("INTRON 4 MUTATION"))
    val utr = Nomenclature.inputMatchStrings(Seq("c.-12C>T"), "SNV",
      impactAnnotsRaw = Seq("5_prime_UTR_variant"), exonAnnotsRaw = Seq("1/7"))
    assert(utr.map(_.s).contains("5' UTR MUTATION"))
    assert(utr.map(_.s).contains("EXON 1 MUTATION"))
  }

  test("inputMatchStrings SNV: protein extension trim (match.py:412-417)") {
    val got = Nomenclature.inputMatchStrings(Seq("p.Ter130Tyrext*?"), "SNV")
    val m = got.map(k => k.s -> (k.isExact, k.isTrueExact)).toMap
    assert(m("P.TER130TYREXT*?") == (true, true))
    assert(m("P.TER130TYR") == (true, true))
    assert(m("P.TER130") == (false, false))
  }

  test("inputMatchStrings CNV: canonical tag families (match.py:485-502)") {
    for (t <- Seq("AMPLIFICATION", "AMP", "GAIN", "DUPLICATION", "DUP")) {
      val got = Nomenclature.inputMatchStrings(Seq(t), "CNV")
      assert(got.map(_.s) == List("AMPLIFICATION", "COPY NUMBER VARIATION"), t)
      assert(got.forall(k => k.isExact && k.isTrueExact))
    }
    for (t <- Seq("DELETION", "DEL", "LOSS")) {
      val got = Nomenclature.inputMatchStrings(Seq(t), "CNV")
      assert(got.map(_.s) == List("DELETION", "LOSS", "COPY NUMBER VARIATION"), t)
    }
  }

  test("getExpressionStrings (match.py:507-549)") {
    assert(Nomenclature.getExpressionStrings("EGFR", 2.5) ==
      List("OVEREXPRESSION", "EXPRESSION"))
    assert(Nomenclature.getExpressionStrings("EGFR", -1.0) ==
      List("UNDEREXPRESSION", "EXPRESSION"))
    assert(Nomenclature.getExpressionStrings("CDKN2A", 1.0) ==
      List("OVEREXPRESSION", "EXPRESSION", "P16 OVEREXPRESSION", "P16 EXPRESSION"))
    intercept[IllegalArgumentException] {
      Nomenclature.getExpressionStrings("EGFR", 0.0)
    }
  }

  test("drugSupportClass (match.py:1450-1457, data.yml:54-64)") {
    assert(Nomenclature.drugSupportClass("SUPPORTS", "SENSITIVITYRESPONSE") == "POSITIVE")
    assert(Nomenclature.drugSupportClass("SUPPORTS", "RESISTANCE") == "NEGATIVE")
    assert(Nomenclature.drugSupportClass("SUPPORTS", "REDUCED SENSITIVITY") == "NEGATIVE")
    assert(Nomenclature.drugSupportClass("DOES_NOT_SUPPORT", "RESISTANCE") == "UNKNOWN_DNS")
    assert(Nomenclature.drugSupportClass("NULL", "RESISTANCE") == "UNKNOWN_BLANK")
    assert(Nomenclature.drugSupportClass("SUPPORTS", "N/A") == "UNKNOWN_BLANK")
    intercept[IllegalArgumentException] {
      Nomenclature.drugSupportClass("SUPPORTS", "BOGUS")
    }
  }

  test("consensus vote: all branches (match.py:1484-1493)") {
    assert(Nomenclature.consensus(3, 1, 1, 0) == "CIVIC_SUPPORT")
    assert(Nomenclature.consensus(1, 3, 1, 1) == "CIVIC_RESISTANCE")
    assert(Nomenclature.consensus(2, 2, 0, 0) == "CIVIC_CONFLICT")
    assert(Nomenclature.consensus(0, 0, 1, 0) == "CIVIC_UNKNOWN")
    assert(Nomenclature.consensus(1, 0, 2, 1) == "CIVIC_UNKNOWN")  // unk strictly greatest
    assert(Nomenclature.consensus(2, 0, 2, 0) == "CIVIC_SUPPORT")  // tie vs unk -> confident
    assert(Nomenclature.consensus(0, 2, 1, 1) == "CIVIC_RESISTANCE")
    assert(Nomenclature.consensus(0, 0, 0, 0+1) == "CIVIC_UNKNOWN")
    intercept[IllegalArgumentException] { Nomenclature.consensus(0, 0, 0, 0) }
  }

  test("parseInput (utils.py:121-141)") {
    assert(Nomenclature.parseInput("a,b,a", isRequired = true) == List("a", "b"))
    assert(Nomenclature.parseInput("a,,b", isRequired = false) == List("a", "", "b"))
    assert(Nomenclature.parseInput(".", isRequired = false) == List(""))
    intercept[IllegalArgumentException] {
      Nomenclature.parseInput("", isRequired = true)
    }
    intercept[IllegalArgumentException] {
      Nomenclature.parseInput("a,,b", isRequired = true)
    }
  }

  test("record-kind classification (match.py:219-310)") {
    assert(Nomenclature.isCnvRecordName("AMPLIFICATION"))
    assert(Nomenclature.isCnvRecordName("EXON 1-2 DELETION"))
    assert(!Nomenclature.isCnvRecordName("V600E"))
    assert(Nomenclature.isExprRecordName("OVEREXPRESSION"))
    assert(Nomenclature.isExprRecordName("EXON 5 OVEREXPRESSION"))
    assert(!Nomenclature.isExprRecordName("DELETION"))
  }
}
