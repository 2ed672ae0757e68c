package graft.ref

import scala.collection.mutable
import graft.functions.Nomenclature
import graft.model.EvidenceRow

/** Naive in-memory transcription of the reference pipeline, used ONLY
  * as the test oracle for parity (SURVEY.md §7.1 "RefModel").
  *
  * Mirrors the nested-dict algorithm of civicutils 1:1 — row-at-a-time
  * loops, insertion-ordered maps — so the Spark engine can be checked
  * bit-for-bit against an independent implementation of the same
  * semantics. Wherever the reference relies on dict insertion order
  * (SURVEY.md §2.6 O4) this model uses LinkedHashMap insertion order
  * fed by `dim_order`, the same explicit sort key the engine uses.
  *
  * NOT used in any production path: the engine never calls into this.
  */
object RefModel {

  type LHM[V] = mutable.LinkedHashMap[String, V]
  private def lhm[V]() = mutable.LinkedHashMap.empty[String, V]

  /** evidence "DIR:SIG" -> level -> [item strings] */
  type EvidenceLeaf = LHM[LHM[mutable.ArrayBuffer[String]]]
  /** drug -> leaf */
  type DrugLayer = LHM[EvidenceLeaf]
  /** disease -> drug -> leaf */
  type DiseaseLayer = LHM[DrugLayer]
  /** ct -> disease -> drug -> leaf */
  type CtLayer = LHM[DiseaseLayer]

  final class RefMp(val civicScore: Double, var nEvidenceItems: Int) {
    /** evidence_type -> disease -> drug -> "DIR:SIG" -> level -> items
      * (reference: query.py:97-258); after annotateCt an extra ct layer
      * sits between evidence_type and disease (match.py:1198).
      */
    val evidenceItems: LHM[DiseaseLayer] = lhm()
    /** evidence_type -> ct -> disease -> drug -> ... (annotated form) */
    val evidenceItemsCt: LHM[CtLayer] = lhm()
    var isAnnot: Boolean = false
  }

  final class RefVariant(val name: String, val hgvs: List[String],
                         val types: List[String]) {
    val mps: LHM[RefMp] = lhm()
  }

  /** gene -> var_id -> record (reference: var_map) */
  type VarMap = LHM[LHM[RefVariant]]

  /** Build the nested var_map from flat evidence rows, replaying the
    * reference's construction order via `dim_order`
    * (reference: query.py:80-260).
    */
  def buildVarMap(rows: Seq[EvidenceRow]): VarMap = {
    val vm: VarMap = lhm()
    for (r <- rows.sortBy(_.dim_order)) {
      val gene = vm.getOrElseUpdate(r.gene_key, lhm())
      val v = gene.getOrElseUpdate(r.var_id,
        new RefVariant(r.var_name.toUpperCase,
          r.hgvs.map(_.trim.toUpperCase).toList,
          if (r.var_types.isEmpty) List("NULL")
          else r.var_types.map(_.trim.toUpperCase).toList))
      val mp = v.mps.getOrElseUpdate(r.mp_id, new RefMp(r.civic_score, 0))
      mp.nEvidenceItems += 1
      val evKey = r.direction + ":" + r.significance
      val item = r.source_type + "_" + r.source_id + ":" + r.evidence_status +
        ":" + r.source_status + ":" + r.variant_origin + ":" +
        r.rating.map(d => if (d == d.floor && !d.isInfinite) {
          // Python str(float): 4.0 -> "4.0"
          d.toString
        } else d.toString).getOrElse("NULL")
      mp.evidenceItems
        .getOrElseUpdate(r.evidence_type, lhm())
        .getOrElseUpdate(r.disease, lhm())
        .getOrElseUpdate(r.drug, lhm())
        .getOrElseUpdate(evKey, lhm())
        .getOrElseUpdate(r.level, mutable.ArrayBuffer.empty[String])
        .append(item)
    }
    vm
  }

  /** Tier match result, reference shape (match.py:568). */
  final case class Match(
      tier1: List[String], tier1b: List[String], tier2: List[String],
      tier3: List[String], tier4: Boolean)

  /** reference: match.py:219-243 */
  def civicReturnAllSnvs(geneData: LHM[RefVariant]): List[String] = {
    val cnvIds = civicReturnAllCnvs(geneData).toSet
    val exprIds = civicReturnAllExpr(geneData).toSet
    geneData.keys.filterNot(id => cnvIds(id) || exprIds(id)).toList
  }

  /** reference: match.py:246-278 */
  def civicReturnAllCnvs(geneData: LHM[RefVariant]): List[String] =
    geneData.collect {
      case (id, v) if Nomenclature.isCnvRecordName(v.name) => id
    }.toList

  /** reference: match.py:281-310 */
  def civicReturnAllExpr(geneData: LHM[RefVariant]): List[String] =
    geneData.collect {
      case (id, v) if Nomenclature.isExprRecordName(v.name) => id
    }.toList

  /** The SNV/CNV tier-resolution kernel (reference: match.py:552-679). */
  def matchVariantsInCivic(geneRaw: String, variantsRaw: List[String],
      varMap: VarMap, dataType: String,
      impacts: List[String] = Nil, exons: List[String] = Nil): Match = {
    val gene = geneRaw.toUpperCase
    val inputKeys = Nomenclature.inputMatchStrings(
      variantsRaw.map(_.toUpperCase), dataType, impacts, exons)
    val t1 = mutable.ArrayBuffer.empty[String]
    val t1b = mutable.ArrayBuffer.empty[String]
    var t2 = mutable.ArrayBuffer.empty[String]
    var t3 = mutable.ArrayBuffer.empty[String]
    var t4 = false

    varMap.get(gene) match {
      case Some(geneData) =>
        for ((varId, v) <- geneData) {
          val civicStrings =
            Nomenclature.civicMatchStrings(v.name, v.hgvs, dataType)
          for (k <- inputKeys) {
            if (civicStrings.contains(k.s)) {
              if (k.isExact) {
                if (k.isTrueExact) { if (!t1.contains(varId)) t1 += varId }
                else { if (!t1b.contains(varId)) t1b += varId }
              } else { if (!t2.contains(varId)) t2 += varId }
            } else if (dataType == "CNV" && k.s == "DELETION") {
              // exon-CNV records count as positional matches (match.py:627-638)
              if (civicStrings.exists(Nomenclature.cnvIsExonString) &&
                  !t2.contains(varId)) t2 += varId
            }
          }
        }
        // general-variant promotion: first general wins (match.py:644-652)
        if (t2.nonEmpty && dataType == "SNV") {
          t2.find(id => Nomenclature.checkGeneralVariant(geneData(id).name))
            .foreach(g => t2 = mutable.ArrayBuffer(g))
        }
        if (t1.isEmpty && t1b.isEmpty && t2.isEmpty) {
          val fallback =
            if (dataType == "SNV") civicReturnAllSnvs(geneData)
            else civicReturnAllCnvs(geneData)
          t3 = mutable.ArrayBuffer(
            (if (fallback.nonEmpty) fallback
             else List(s"NON_${dataType}_MATCH_ONLY")): _*)
        }
      case None => t4 = true
    }
    Match(t1.toList, t1b.toList, t2.toList, t3.toList, t4)
  }

  /** The EXPR kernel (reference: match.py:682-747). */
  def matchExpressionInCivic(geneRaw: String, exprStrings: List[String],
      varMap: VarMap): Match = {
    val gene = geneRaw.toUpperCase
    val tags = exprStrings.map(_.toUpperCase)
    val t1 = mutable.ArrayBuffer.empty[String]
    var t3 = mutable.ArrayBuffer.empty[String]
    var t4 = false
    varMap.get(gene) match {
      case Some(geneData) =>
        for ((varId, v) <- geneData) {
          val civicStrings = Nomenclature.civicMatchStrings(v.name, Nil, "EXPR")
          for (tag <- tags if civicStrings.contains(tag))
            if (!t1.contains(varId)) t1 += varId
          for (s <- civicStrings) {
            val (isExon, exprType) = Nomenclature.exprIsExonString(s)
            if (isExon && exprType.nonEmpty && tags.contains(exprType) &&
                !t1.contains(varId)) t1 += varId
          }
        }
        if (t1.isEmpty) {
          val fallback = civicReturnAllExpr(geneData)
          t3 = mutable.ArrayBuffer(
            (if (fallback.nonEmpty) fallback
             else List("NON_EXPR_MATCH_ONLY")): _*)
        }
      case None => t4 = true
    }
    Match(t1.toList, Nil, Nil, t3.toList, t4)
  }

  /** Tier selection per match (reference: match.py:945-1014). */
  def filterMatch(m: Match, selectTier: Either[String, List[String]]): Match = {
    val keep: Set[String] = selectTier match {
      case Left("all") => graft.model.Tiers.sorted.toSet
      case Left("highest") =>
        if (m.tier1.nonEmpty) Set("tier_1")
        else if (m.tier1b.nonEmpty) Set("tier_1b")
        else if (m.tier2.nonEmpty) Set("tier_2")
        else if (m.tier3.nonEmpty) Set("tier_3")
        else Set("tier_4")
      case Left(other) =>
        throw new IllegalArgumentException(s"bad tier selection '$other'")
      case Right(list) => list.toSet
    }
    val n = Match(
      if (keep("tier_1")) m.tier1 else Nil,
      if (keep("tier_1b")) m.tier1b else Nil,
      if (keep("tier_2")) m.tier2 else Nil,
      if (keep("tier_3")) m.tier3 else Nil,
      tier4 = false)
    // recompute tier_4 if everything kept is empty (match.py:1009-1012)
    if (n.tier1.isEmpty && n.tier1b.isEmpty && n.tier2.isEmpty && n.tier3.isEmpty)
      n.copy(tier4 = true)
    else n
  }

  /** Disease -> ct classification (reference: match.py:1055-1144).
    * Returns (ctList, gtList, nctList) in first-seen order.
    */
  def classifyDiseases(diseaseListRaw: List[String], notIn: List[String],
      in: List[String], altNames: List[String])
      : (List[String], List[String], List[String]) = {
    val diseaseList = diseaseListRaw.map(_.toUpperCase)
    val deny = notIn.map(_.toUpperCase)
    val allow = in.map(_.toUpperCase)
    val alts = altNames.map(_.toUpperCase)
    val cleanSet =
      if (deny.nonEmpty)
        diseaseList.filterNot(d => deny.exists(t => d.contains(t))).distinct
      else diseaseList
    val matched = mutable.ArrayBuffer.empty[String]
    val ct = mutable.ArrayBuffer.empty[String]
    val gt = mutable.ArrayBuffer.empty[String]
    val nct = mutable.ArrayBuffer.empty[String]
    for (d <- cleanSet; a <- allow if d.contains(a))
      if (!matched.contains(d)) { matched += d; if (!ct.contains(d)) ct += d }
    for (d <- cleanSet if alts.contains(d) && !matched.contains(d)) {
      matched += d; if (!gt.contains(d)) gt += d
    }
    for (d <- cleanSet if !matched.contains(d)) {
      matched += d; if (!nct.contains(d)) nct += d
    }
    (ct.toList, gt.toList, nct.toList)
  }

  /** Insert the ct layer into every mp's evidence items
    * (reference: match.py:1224-1275). Mutates varMap in place.
    */
  def annotateCt(varMap: VarMap, notIn: List[String], in: List[String],
      altNames: List[String]): VarMap = {
    for ((_, geneData) <- varMap; (_, v) <- geneData; (_, mp) <- v.mps) {
      mp.evidenceItemsCt.clear()
      for ((evType, byDisease) <- mp.evidenceItems) {
        val allDiseases = byDisease.keys.toList
        val (ctL, gtL, nctL) = classifyDiseases(allDiseases, notIn, in, altNames)
        val ctLayer: CtLayer = lhm()
        for ((ctName, diseases) <- List("ct" -> ctL, "gt" -> gtL, "nct" -> nctL)) {
          val dl: DiseaseLayer = lhm()
          for (d <- diseases) dl += d -> byDisease(d)
          ctLayer += ctName -> dl
        }
        mp.evidenceItemsCt += evType -> ctLayer
      }
      mp.isAnnot = true
    }
    varMap
  }

  /** ct-specificity selection (reference: match.py:1278-1350).
    * Supports "all", "highest" or an explicit list; operates on the
    * ct-annotated layer in place.
    */
  def filterCt(varMap: VarMap, selectCt: Either[String, List[String]]): VarMap = {
    selectCt match {
      case Left("all") => varMap
      case other =>
        for ((_, geneData) <- varMap; (_, v) <- geneData; (_, mp) <- v.mps) {
          for ((evType, ctLayer) <- mp.evidenceItemsCt) {
            val newLayer: CtLayer = lhm()
            var skip = false
            for (ct <- graft.model.Cts.sorted) {
              val dl: DiseaseLayer = ctLayer.getOrElse(ct, lhm())
              other match {
                case Left("highest") =>
                  if (dl.nonEmpty && !skip) { newLayer += ct -> dl; skip = true }
                  else newLayer += ct -> lhm()
                case Right(list) =>
                  if (list.contains(ct)) newLayer += ct -> dl
                  else newLayer += ct -> lhm()
                case _ => throw new IllegalArgumentException
              }
            }
            mp.evidenceItemsCt += evType -> newLayer
          }
        }
        varMap
    }
  }

  final case class TierSupport(matched: List[String], tier4Matched: Boolean,
                               drugSupport: List[String])

  /** Consensus drug support per (gene, variant, tier)
    * (reference: match.py:1353-1506). Requires ct-annotated varMap.
    * Returns gene -> variant -> tier -> TierSupport with the short
    * "DRUG:CT:RESULT" strings (counts omitted, match.py:1497).
    */
  def processDrugSupport(
      matches: Seq[(String, String, Match)],
      varMap: VarMap): Map[(String, String, String), TierSupport] = {
    val specialCases = Set("NON_SNV_MATCH_ONLY", "NON_CNV_MATCH_ONLY", "NON_EXPR_MATCH_ONLY")
    val out = mutable.LinkedHashMap.empty[(String, String, String), TierSupport]
    for ((gene, variant, m) <- matches) {
      val tiers = List("tier_1" -> m.tier1, "tier_1b" -> m.tier1b,
        "tier_2" -> m.tier2, "tier_3" -> m.tier3)
      var anyMatched = false
      for ((tier, ids) <- tiers) {
        // drug -> ct -> occurrences
        val drugMap = lhm[LHM[mutable.ArrayBuffer[String]]]()
        for (varId <- ids) {
          if (specialCases.contains(varId.toUpperCase)) {
            require(ids.length == 1, "multiple matches in special tier3 case")
          } else {
            val v = varMap(gene)(varId)
            for ((_, mp) <- v.mps) {
              mp.evidenceItemsCt.get("PREDICTIVE").foreach { ctLayer =>
                for ((ct, byDisease) <- ctLayer; (_, byDrug) <- byDisease;
                     (drug, byEv) <- byDrug) {
                  val ctMap = drugMap.getOrElseUpdate(drug, lhm())
                  val occ = ctMap.getOrElseUpdate(ct, mutable.ArrayBuffer.empty[String])
                  for ((evKey, byLevel) <- byEv) {
                    val Array(dir, sig) = evKey.trim.split(":", -1)
                    val cls = Nomenclature.drugSupportClass(dir, sig)
                    for ((_, items) <- byLevel; _ <- items) occ += cls
                  }
                }
              }
            }
          }
        }
        val support = mutable.ArrayBuffer.empty[String]
        for ((drug, ctMap) <- drugMap; (ct, occ) <- ctMap) {
          val pos = occ.count(_ == "POSITIVE")
          val neg = occ.count(_ == "NEGATIVE")
          val unkB = occ.count(_ == "UNKNOWN_BLANK")
          val unkD = occ.count(_ == "UNKNOWN_DNS")
          val cons = Nomenclature.consensus(pos, neg, unkB, unkD)
          support += s"$drug:${ct.toUpperCase}:$cons"
        }
        if (ids.nonEmpty) anyMatched = true
        out += ((gene, variant, tier)) -> TierSupport(ids, tier4Matched = false, support.toList)
      }
      out += ((gene, variant, "tier_4")) ->
        TierSupport(Nil, tier4Matched = !anyMatched, Nil)
    }
    out.toMap
  }
}
