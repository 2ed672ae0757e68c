package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Pure-Scala nomenclature rule library.
  *
  * Re-expresses the reference's match-string generation rules
  * (reference: civicutils/match.py:8-549) as side-effect-free functions.
  * These are the "scalar functions" of the engine: every downstream
  * operator (match kernel, streaming automaton, filters) keys on their
  * output, so they are exhaustively unit-tested and kept deterministic.
  *
  * Uppercase is applied internally exactly where the reference does
  * ("uppercase is critical for the match", match.py:18).
  */
object Nomenclature {

  /** 1-letter -> 3-letter amino-acid codes incl. CIViC-custom entries
    * (reference: civicutils/data/data.yml:4-27, loaded by
    * read_and_write.py:9-27). `X` and `*` both encode a stop codon.
    */
  val aminoAcids: Map[String, String] = Map(
    "C" -> "CYS", "D" -> "ASP", "S" -> "SER", "Q" -> "GLN", "K" -> "LYS",
    "I" -> "ILE", "P" -> "PRO", "T" -> "THR", "F" -> "PHE", "N" -> "ASN",
    "G" -> "GLY", "H" -> "HIS", "L" -> "LEU", "R" -> "ARG", "W" -> "TRP",
    "A" -> "ALA", "V" -> "VAL", "E" -> "GLU", "Y" -> "TYR", "M" -> "MET",
    "*" -> "*", "X" -> "*")

  /** direction -> significance -> response class
    * (reference: civicutils/data/data.yml:54-64). Blank/N-A handled
    * separately as UNKNOWN_BLANK (match.py:1450-1451).
    */
  val drugSupportMap: Map[String, Map[String, String]] = Map(
    "SUPPORTS" -> Map(
      "SENSITIVITYRESPONSE" -> "POSITIVE",
      "RESISTANCE" -> "NEGATIVE",
      "REDUCED SENSITIVITY" -> "NEGATIVE",
      "ADVERSE RESPONSE" -> "NEGATIVE"),
    "DOES_NOT_SUPPORT" -> Map(
      "RESISTANCE" -> "UNKNOWN_DNS",
      "SENSITIVITYRESPONSE" -> "UNKNOWN_DNS",
      "REDUCED SENSITIVITY" -> "UNKNOWN_DNS",
      "ADVERSE RESPONSE" -> "UNKNOWN_DNS"))

  /** Translate 1-letter to 3-letter aa code; None on unknown
    * (reference: utils.py:401-415).
    */
  def translateAa(code: String): Option[String] =
    aminoAcids.get(code.toUpperCase)

  private val ReName = """([A-Z*])(\d+)([A-Z*]?)($|\s\().*""".r
  private val ReEmbeddedC = """\((C\..+?)\)""".r
  private val ReNameFs = """([A-Z])(\d+)([A-Z]?)FS.*""".r

  /** CIViC record name -> candidate p./c. HGVS strings
    * (reference: match.py:8-73). Order of generated strings is preserved.
    */
  def civicNameToHgvs(varNameRaw: String): List[String] = {
    val varName = varNameRaw.toUpperCase
    val out = ArrayBuffer.empty[String]
    // 1) 1-letter protein code incl. stop codons / general variants
    varName match {
      case ReName(aa1, npos, aa2, _) =>
        val aa1New = if (aa1 == "*") Some("TER") else translateAa(aa1)
        val aa2New =
          if (aa2.nonEmpty) {
            if (aa1New.contains("TER") && aa2 == "*") Some("TER")
            else translateAa(aa2)
          } else Some("")
        for (a1 <- aa1New; a2 <- aa2New) out += s"P.$a1$npos$a2"
      case _ =>
    }
    // 2) embedded c. annotation "(c.XXX)" anywhere in the name
    ReEmbeddedC.findFirstMatchIn(varName).foreach(m => out += m.group(1))
    // 3) frameshifts (e.g. T157FS or T157MFS)
    varName match {
      case ReNameFs(aa, npos, _) =>
        translateAa(aa).foreach(a => out += s"P.$a${npos}FS")
      case _ =>
    }
    out.toList
  }

  private val ReFsLong = """(P\.[A-Z]+[0-9]+)[A-Z]+FS.*""".r
  private val ReTer = """(P\.[A-Z]+[0-9]+)TER.*""".r
  private val ReSilent = """P\.([A-Z]+)([0-9]+)=.*""".r

  /** CIViC p.HGVS -> input-table convention; None when unchanged
    * (reference: match.py:76-124). The three rewrite cases are mutually
    * exclusive by construction.
    */
  def civicHgvsToInput(civicHgvsRaw: String): Option[String] = {
    val s = civicHgvsRaw.toUpperCase
    s match {
      case ReFsLong(_*) => // long->short frameshift (p.Glu55Argfs... -> p.Glu55fs)
        val n = s.replaceAll("""(P\.[A-Z]+[0-9]+)[A-Z]+FS.*""", "$1FS")
        return if (n != s) Some(n) else None
      case _ =>
    }
    s match {
      case ReTer(_*) => // nonsense: Ter -> *
        val n = s.replaceAll("""(P\.[A-Z]+[0-9]+)TER""", "$1*")
        return if (n != s) Some(n) else None
      case _ =>
    }
    s match {
      case ReSilent(_*) => // silent: p.Pro61= -> p.Pro61Pro
        val n = s.replaceAll("""P\.([A-Z]+)([0-9]+)=""", "P.$1$2$1")
        return if (n != s) Some(n) else None
      case _ =>
    }
    None
  }

  private val RePStart = """(P\.[A-Z]+[0-9]+).*""".r

  /** p.Val600Glu -> positional prefix P.VAL600; None for non-p. strings
    * (reference: match.py:127-144).
    */
  def extractPStart(pHgvsRaw: String): Option[String] =
    pHgvsRaw.toUpperCase match {
      case RePStart(start) => Some(start)
      case _ => None
    }

  private val ReGeneral = """[A-Z]\d+($|\s\().*""".r

  /** Is a record name a positional bucket variant (e.g. V600)?
    * (reference: match.py:147-164).
    */
  def checkGeneralVariant(varNameRaw: String): Boolean =
    varNameRaw.toUpperCase match {
      case ReGeneral(_*) => true
      case _ => false
    }

  private val cnvExonPatterns = List(
    """^EXON [0-9-]+ DELETION$""".r,
    """^[35']+ EXON DELETION$""".r,
    """^EXON [0-9-]+ SKIPPING MUTATION$""".r)

  /** Does a record name denote an exon-level CNV?
    * (reference: match.py:167-187).
    */
  def cnvIsExonString(varNameRaw: String): Boolean = {
    val v = varNameRaw.toUpperCase
    cnvExonPatterns.exists(_.findFirstIn(v).isDefined)
  }

  /** Is a record name an exon-level expression record, and of which
    * expression type? (reference: match.py:190-216).
    */
  def exprIsExonString(varNameRaw: String): (Boolean, String) = {
    val v = varNameRaw.toUpperCase
    if ("""^EXON [0-9-]+ EXPRESSION$""".r.findFirstIn(v).isDefined)
      (true, "EXPRESSION")
    else if ("""^EXON [0-9-]+ OVEREXPRESSION$""".r.findFirstIn(v).isDefined)
      (true, "OVEREXPRESSION")
    else if ("""^EXON [0-9-]+ UNDEREXPRESSION$""".r.findFirstIn(v).isDefined)
      (true, "UNDEREXPRESSION")
    else (false, "")
  }

  /** Common CNV / EXPR record names (reference: match.py:256,291). */
  val cnvNames: Set[String] =
    Set("AMPLIFICATION", "DELETION", "LOSS", "COPY NUMBER VARIATION")
  val exprNames: Set[String] =
    Set("OVEREXPRESSION", "UNDEREXPRESSION", "EXPRESSION")

  /** Is a record a CNV record by name (common names + exon-CNV forms)?
    * (reference: match.py:246-278).
    */
  def isCnvRecordName(varNameRaw: String): Boolean = {
    val v = varNameRaw.toUpperCase
    cnvNames.contains(v) || cnvIsExonString(v)
  }

  /** Is a record an EXPRESSION record by name (common + exon forms)?
    * (reference: match.py:281-310).
    */
  def isExprRecordName(varNameRaw: String): Boolean = {
    val v = varNameRaw.toUpperCase
    exprNames.contains(v) || exprIsExonString(v)._1
  }

  /** Dimension-side match-string generation (reference: match.py:313-367).
    * SNV: cleaned HGVS + input-convention rewrites + name-derived HGVS +
    * positional prefixes + the record name itself. CNV/EXPR: name only.
    * The returned list preserves the reference's generation order; the
    * record name is always appended last (possibly duplicated, as in the
    * reference).
    */
  def civicMatchStrings(varNameRaw: String, hgvsExpressions: Seq[String],
                        dataType: String): List[String] = {
    val varName = varNameRaw.toUpperCase
    val out = ArrayBuffer.empty[String]
    if (dataType == "SNV") {
      // 1-2) strip "reference:" prefix; add input-convention rewrites
      for (x <- hgvsExpressions) {
        val clean = x.toUpperCase.split(":").last.toUpperCase
        if (!out.contains(clean)) {
          out += clean
          civicHgvsToInput(clean).foreach { n =>
            if (!out.contains(n)) out += n
          }
        }
      }
      // 3) name-derived HGVS candidates
      for (x <- civicNameToHgvs(varName)) if (!out.contains(x)) out += x
      // 4) positional prefixes for existing strings (growing-list scan,
      // converges because positional-of-positional is identity)
      var i = 0
      while (i < out.length) {
        extractPStart(out(i)).foreach { s => if (!out.contains(s)) out += s }
        i += 1
      }
    }
    // 5) record name always added (for descriptive-term matching)
    out += varName
    out.toList
  }

  /** One generated input match key with its match-class flags
    * (reference: match.py:393-398). (isExact, isTrueExact):
    * (true, true)  = true exact (input HGVS / CNV tag),
    * (true, false) = descriptive synonym (e.g. EXON 15 MUTATION),
    * (false, false)= positional (e.g. P.VAL600).
    */
  final case class MatchKey(s: String, isExact: Boolean, isTrueExact: Boolean)

  private val ReExt = """(P\.TER[0-9]+[A-Z]+)EXT.*""".r

  /** Input-side match-key generation for SNV/CNV
    * (reference: match.py:370-504). Order preserved.
    */
  def inputMatchStrings(varAnnotationsRaw: Seq[String], dataType: String,
                        impactAnnotsRaw: Seq[String] = Nil,
                        exonAnnotsRaw: Seq[String] = Nil): List[MatchKey] = {
    val varAnnotations = varAnnotationsRaw.map(_.toUpperCase)
    val impacts = impactAnnotsRaw.map(_.toUpperCase)
    val exons = exonAnnotsRaw.map(_.toUpperCase)
    val out = ArrayBuffer.empty[MatchKey]
    def contains(s: String) = out.exists(_.s == s)

    if (dataType == "SNV") {
      // 1) input HGVS annotations -> true exact
      for (annot <- varAnnotations) if (!contains(annot)) {
        out += MatchKey(annot, isExact = true, isTrueExact = true)
        // protein-extension trim (p.Ter130Tyrext*? -> p.Ter130Tyr)
        annot match {
          case ReExt(prefix) =>
            if (!contains(prefix))
              out += MatchKey(prefix, isExact = true, isTrueExact = true)
          case _ =>
        }
      }
      // 2) positional prefixes -> positional (growing-list scan)
      var i = 0
      while (i < out.length) {
        extractPStart(out(i).s).foreach { start =>
          if (!contains(start))
            out += MatchKey(start, isExact = false, isTrueExact = false)
        }
        i += 1
      }
      // 3) synonym descriptive tags -> exact but not true exact
      val newTags = ArrayBuffer("MUTATION")
      for (impact <- impacts if impact.nonEmpty) {
        if (impact.contains("3_PRIME_UTR_VARIANT")) newTags += "3' UTR MUTATION"
        if (impact.contains("5_PRIME_UTR_VARIANT")) newTags += "5' UTR MUTATION"
        if (impact.contains("STOP_GAINED")) newTags += "TRUNCATING MUTATION"
        if (impact.contains("FRAMESHIFT_VARIANT")) newTags += "FRAMESHIFT MUTATION"
      }
      for ((exon, i) <- exons.zipWithIndex if exon.nonEmpty) {
        require(impacts.length == exons.length,
          "Provided 'impact_annots' and 'exon_annots' are not of identical length.")
        val rank = exon.split("/")(0)
        if (impacts(i).contains("INTRON_VARIANT") || impacts(i).contains("SEQUENCE_FEATURE"))
          newTags += s"INTRON $rank MUTATION"
        else {
          newTags += s"EXON $rank MUTATION"
          if (impacts(i).contains("FRAMESHIFT_VARIANT"))
            newTags += s"EXON $rank FRAMESHIFT"
        }
      }
      for (tag <- newTags) if (!contains(tag))
        out += MatchKey(tag, isExact = true, isTrueExact = false)
    }

    if (dataType == "CNV") {
      val newTags = ArrayBuffer.empty[String]
      for (annot <- varAnnotations) {
        annot match {
          case "AMPLIFICATION" | "AMP" | "GAIN" | "DUPLICATION" | "DUP" =>
            newTags += "AMPLIFICATION"
          case "DELETION" | "DEL" | "LOSS" =>
            newTags += "DELETION"
            newTags += "LOSS"
          case _ =>
        }
        newTags += "COPY NUMBER VARIATION"
      }
      for (tag <- newTags) if (!contains(tag))
        out += MatchKey(tag, isExact = true, isTrueExact = true)
    }
    out.toList
  }

  /** EXPR-side match-key generation (reference: match.py:507-549).
    * Throws on logFC == 0 or non-numeric, as the reference does
    * (utils.py:145-159) — a validation error that must fail the job.
    *
    * NOTE: the reference's CDKN2A/P16 special case appends to the list
    * it is iterating (match.py:543-547), which in Python never terminates.
    * The documented intent — add "P16 "-prefixed copies of the base tags
    * once — is implemented here instead; the hang is not reproducible
    * output and is deliberately not replicated.
    */
  def getExpressionStrings(geneRaw: String, logfc: Double): List[String] = {
    val gene = geneRaw.toUpperCase
    require(logfc != 0.0,
      s"Invalid logFC = '$logfc' for gene '$gene'. Only differentially expressed genes are valid.")
    val base =
      if (logfc > 0) List("OVEREXPRESSION", "EXPRESSION")
      else List("UNDEREXPRESSION", "EXPRESSION")
    if (gene == "CDKN2A") base ++ base.map("P16 " + _) else base
  }

  /** Resolve one evidence (direction, significance) pair into a drug
    * response class (reference: match.py:1450-1457). Unknown non-blank
    * keys raise, as in the reference (a data-validation invariant).
    */
  def drugSupportClass(direction: String, significance: String): String = {
    if (direction.contains("NULL") || direction.contains("N/A") ||
        significance.contains("NULL") || significance.contains("N/A"))
      "UNKNOWN_BLANK"
    else {
      val byDir = drugSupportMap.getOrElse(direction,
        throw new IllegalArgumentException(
          s"Could not find evidence direction '$direction' in support map"))
      byDir.getOrElse(significance,
        throw new IllegalArgumentException(
          s"Could not find clinical significance '$significance' in support map"))
    }
  }

  /** Majority-vote consensus (reference: match.py:1480-1493).
    * Unknowns strictly greatest -> CIVIC_UNKNOWN; pos==neg ->
    * CIVIC_CONFLICT; else the confident majority (ties vs unknown go to
    * the confident side).
    */
  def consensus(pos: Long, neg: Long, unkBlank: Long, unkDns: Long): String = {
    val unk = unkBlank + unkDns
    require(pos + neg + unk > 0, "Encountered unexpected support case")
    if (unk > pos && unk > neg) "CIVIC_UNKNOWN"
    else if (pos == neg) "CIVIC_CONFLICT"
    else if (pos > neg && pos >= unk) "CIVIC_SUPPORT"
    else if (neg > pos && neg >= unk) "CIVIC_RESISTANCE"
    else throw new IllegalStateException("Encountered unexpected support case")
  }

  /** Parse a comma-separated multi-value input cell
    * (reference: utils.py:121-141). Empty/"." normalize to ""; when
    * isRequired, empty cells/tokens raise and tokens are deduplicated
    * preserving first-seen order; when optional, tokens pass through.
    */
  def parseInput(cell: String, isRequired: Boolean): List[String] = {
    def checkEmpty(s: String): String =
      if (s.isEmpty || s == ".") {
        if (isRequired)
          throw new IllegalArgumentException(s"Required field is empty: '$cell'")
        ""
      } else s
    val whole = checkEmpty(cell)
    val out = ArrayBuffer.empty[String]
    for (tok <- whole.split(",", -1)) {
      val t = checkEmpty(tok)
      if (isRequired) { if (t.nonEmpty && !out.contains(t)) out += t }
      else out += t
    }
    out.toList
  }
}
