package graft.operators

import scala.collection.mutable
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Dataset
import graft.functions.Nomenclature
import graft.model.Turn

/** Per-turn tier annotation: one `Annotation` row per transcript turn
  * (analog of one `match_map` entry + drug support,
  * reference: civicutils/match.py:552-942,1353-1506).
  *
  * Tier lists are ordered by dimension scan order (`dim_order`) — the
  * explicit replacement for the reference's dict insertion order
  * (SURVEY.md §2.6 O4). `drug_support` lists are canonically sorted by
  * (drug, ct rank); the reference's emission order depends on Python
  * set iteration order (match.py:1417 `set(...) ^ set(...)`), which is
  * PYTHONHASHSEED-dependent, so a canonical order is the only
  * reproducible choice — documented deviation.
  */
final case class Annotation(
    conv_id: String,
    turn_idx: Int,
    role: String,
    ts: java.sql.Timestamp,
    gene_key: String,
    data_type: String,
    tier_1: Seq[String],
    tier_1b: Seq[String],
    tier_2: Seq[String],
    tier_3: Seq[String],
    tier_4: Boolean,
    highest_tier: String,
    ds_tier_1: Seq[String],
    ds_tier_1b: Seq[String],
    ds_tier_2: Seq[String],
    ds_tier_3: Seq[String])

object MatchKernel {

  /** Parsed payload of one turn. role -> data type dispatch is the
    * transcript analog of the reference's SNV/CNV/EXPR input files
    * (SURVEY.md §1.4; utils.py:71-87).
    */
  final case class Parsed(
      geneKey: String, dataType: String,
      variants: List[String], impacts: List[String], exons: List[String],
      logfc: Double)

  def roleToDataType(role: String): String = role match {
    case "user" => "SNV"
    case "assistant" => "CNV"
    case _ => "EXPR"
  }

  /** Parse `text` = "ENTITY payload". SNV payload "dna|prot|impact|exon"
    * mirrors the reference's encoded variant key
    * (read_and_write.py:142); CNV payload is the cnv cell; EXPR payload
    * the logFC. Validation mirrors match.py:857-913.
    */
  def parse(t: Turn): Parsed = {
    val sp = t.text.indexOf(' ')
    require(sp > 0, s"malformed turn text: '${t.text}'")
    val gene = t.text.substring(0, sp).toUpperCase
    val payload = t.text.substring(sp + 1)
    roleToDataType(t.role) match {
      case "SNV" =>
        val f = payload.split("\\|", -1)
        require(f.length >= 4,
          "Must provide at least 4 fields to describe a SNV variant")
        val cVars = Nomenclature.parseInput(f(0), isRequired = true)
        val pVars = Nomenclature.parseInput(f(1), isRequired = false)
        val variants = mutable.ArrayBuffer.empty[String]
        for (c <- cVars if c.nonEmpty) {
          require(c.toUpperCase.startsWith("C."), s"not a c.HGVS: '$c'")
          if (!variants.contains(c)) variants += c
        }
        for (p <- pVars if p.nonEmpty) {
          require(p.toUpperCase.startsWith("P."), s"not a p.HGVS: '$p'")
          if (!variants.contains(p)) variants += p
        }
        require(variants.nonEmpty,
          "At least one non-empty variant annotation must be provided")
        Parsed(gene, "SNV", variants.toList,
          Nomenclature.parseInput(f(2), isRequired = false),
          Nomenclature.parseInput(f(3), isRequired = false), 0.0)
      case "CNV" =>
        Parsed(gene, "CNV",
          Nomenclature.parseInput(payload, isRequired = true), Nil, Nil, 0.0)
      case _ =>
        val logfc = payload.trim.toDouble
        Parsed(gene, "EXPR", Nil, Nil, Nil, logfc)
    }
  }

  /** The tier-resolution kernel for one turn against the broadcast
    * index — pure function, zero shuffle (reference kernels:
    * match.py:552-679 SNV/CNV, match.py:682-747 EXPR).
    */
  def annotateTurn(t: Turn, idx: DimIndex): Annotation = {
    val p = parse(t)
    val keys: List[Nomenclature.MatchKey] = p.dataType match {
      case "SNV" =>
        Nomenclature.inputMatchStrings(p.variants, "SNV", p.impacts, p.exons)
      case "CNV" => Nomenclature.inputMatchStrings(p.variants, "CNV")
      case _ => Nomenclature.getExpressionStrings(p.geneKey, p.logfc)
        .map(s => Nomenclature.MatchKey(s, isExact = true, isTrueExact = true))
    }

    idx.genes.get(p.geneKey) match {
      case None =>
        // gene absent from the dimension -> tier_4 (match.py:672-678)
        Annotation(t.conv_id, t.turn_idx, t.role, t.ts, p.geneKey, p.dataType,
          Nil, Nil, Nil, Nil, tier_4 = true, "tier_4", Nil, Nil, Nil, Nil)
      case Some(gd) =>
        var t1 = mutable.SortedSet.empty[Int]
        var t1b = mutable.SortedSet.empty[Int]
        var t2 = mutable.SortedSet.empty[Int]
        p.dataType match {
          case "SNV" =>
            for (k <- keys; ps <- gd.snvIndex.get(k.s); pos <- ps) {
              if (k.isExact) { if (k.isTrueExact) t1 += pos else t1b += pos }
              else t2 += pos
            }
          case "CNV" =>
            for (k <- keys) {
              gd.cnvIndex.get(k.s).foreach(ps => ps.foreach(t1 += _))
              // input DELETION also positionally matches exon-CNV
              // records (match.py:627-638)
              if (k.s == "DELETION") gd.exonCnvPositions.foreach(t2 += _)
            }
          case _ =>
            for (k <- keys; ps <- gd.exprIndex.get(k.s); pos <- ps) t1 += pos
        }
        // general-variant promotion: first (scan-order) general bucket
        // wins the positional tier (match.py:644-652)
        if (p.dataType == "SNV" && t2.nonEmpty)
          t2.find(gd.isGeneral).foreach(g => t2 = mutable.SortedSet(g))

        var t3: List[Int] = Nil
        var t3Sentinel: Option[String] = None
        if (t1.isEmpty && t1b.isEmpty && t2.isEmpty) {
          val fb = p.dataType match {
            case "SNV" => gd.snvFallback
            case "CNV" => gd.cnvFallback
            case _ => gd.exprFallback
          }
          if (fb.nonEmpty) t3 = fb.toList
          else t3Sentinel = Some(s"NON_${p.dataType}_MATCH_ONLY")
        }

        // NOTE: iterate explicitly — .map on a SortedSet through the
        // Iterable interface would rebuild into an unordered HashSet
        def ids(ps: Iterable[Int]): Seq[String] =
          ps.iterator.map(gd.varIds).toList
        def support(ps: Iterable[Int]): Seq[String] =
          if (ps.isEmpty) Nil
          else {
            val acc = mutable.HashMap.empty[(String, String), SupportCounts]
            for (pos <- ps; ((drug, ct), c) <- gd.support(pos))
              acc((drug, ct)) = acc.getOrElse((drug, ct),
                SupportCounts(0, 0, 0, 0)) + c
            acc.toSeq
              .sortBy { case ((drug, ct), _) =>
                (drug, graft.model.Cts.rank(ct)) }
              .map { case ((drug, ct), c) =>
                s"$drug:${ct.toUpperCase}:" +
                  Nomenclature.consensus(c.pos, c.neg, c.unkB, c.unkD) }
          }

        val tier3Ids = t3Sentinel.map(Seq(_)).getOrElse(ids(t3))
        val tier4 = t1.isEmpty && t1b.isEmpty && t2.isEmpty &&
          tier3Ids.isEmpty
        val highest =
          if (t1.nonEmpty) "tier_1" else if (t1b.nonEmpty) "tier_1b"
          else if (t2.nonEmpty) "tier_2" else if (tier3Ids.nonEmpty) "tier_3"
          else "tier_4"
        Annotation(t.conv_id, t.turn_idx, t.role, t.ts, p.geneKey, p.dataType,
          ids(t1), ids(t1b), ids(t2), tier3Ids, tier4, highest,
          support(t1), support(t1b), support(t2),
          if (t3Sentinel.isDefined) Nil else support(t3))
    }
  }

  /** Distributed map-only annotation over a typed turn Dataset. */
  def annotate(turns: Dataset[Turn], bc: Broadcast[DimIndex]): Dataset[Annotation] = {
    import turns.sparkSession.implicits._
    turns.map(t => annotateTurn(t, bc.value))
  }
}
