package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{EvidenceRow, Turn}

/** One raw (pre-reformat) evidence leaf: multi-drug + interaction type,
  * the shape `ReformatCivic.reshapeDrugs` flattens into the one-drug
  * `EvidenceRow` form (reference query.py:214-246).
  */
final case class RawEvidenceLeaf(
    gene_key: String, var_id: String, var_name: String,
    evidence_type: String, disease: String,
    drugs: Seq[String], drug_interaction: String,
    direction: String, significance: String, level: String,
    source_type: String, source_id: String,
    evidence_status: String, variant_origin: String)

/** Deterministic synthetic data (FIXTURES.md §1-2): the transcript fact
  * table per `BASELINE.json input_hint` and the flat evidence dimension.
  *
  * Every row is a pure function of (seed, index) via a splitmix64-style
  * mix, so generation is distributed (`spark.range(n).map`), reproducible
  * at any scale, and never materializes on the driver. The dimension is
  * small by design (a knowledge base), the fact table is the thing that
  * scales to 10^12 turns.
  */
object Synth {

  /** splitmix64 finalizer — stateless per-index PRNG. */
  def mix(seed: Long, i: Long, salt: Long): Long = {
    var z = seed ^ (i * 0x9E3779B97F4A7C15L) ^ (salt * 0xBF58476D1CE4E5B9L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def pick[T](xs: IndexedSeq[T], h: Long): T =
    xs((java.lang.Long.remainderUnsigned(h, xs.length)).toInt)

  def geneName(g: Long): String = f"ENT$g%04d"

  // ---------------------------------------------------------------------
  // Evidence dimension (analog of var_map; reference: query.py:97-258)
  // ---------------------------------------------------------------------

  /** Variant-record templates covering every match path of the reference
    * taxonomy (FIXTURES.md §2): exact SNV names, general buckets,
    * descriptive names, CNV names incl. exon-CNVs, EXPR names incl.
    * exon-EXPR, and HGVS edge forms (frameshift/Ter/silent/extension).
    */
  private val varTemplates: IndexedSeq[(String, List[String])] = IndexedSeq(
    ("V600E", List("NM_004333.4:c.1799T>A", "NP_004324.2:p.Val600Glu")),
    ("V600", Nil),
    ("V600K", List("NP_004324.2:p.Val600Lys")),
    ("E55FS", List("NP_000001.1:p.Glu55ArgfsTer11")),
    ("T157FS", Nil),
    ("P61=", List("NP_000002.1:p.Pro61=")),
    ("W24*", List("NP_000003.1:p.Trp24Ter")),
    ("MUTATION", Nil),
    ("EXON 15 MUTATION", Nil),
    ("TRUNCATING MUTATION", Nil),
    ("FRAMESHIFT MUTATION", Nil),
    ("INTRON 4 MUTATION", Nil),
    ("AMPLIFICATION", Nil),
    ("DELETION", Nil),
    ("LOSS", Nil),
    ("COPY NUMBER VARIATION", Nil),
    ("EXON 1-2 DELETION", Nil),
    ("3' EXON DELETION", Nil),
    ("EXON 5 SKIPPING MUTATION", Nil),
    ("OVEREXPRESSION", Nil),
    ("UNDEREXPRESSION", Nil),
    ("EXPRESSION", Nil),
    ("EXON 5 OVEREXPRESSION", Nil))

  private val varTypePool: IndexedSeq[List[String]] = IndexedSeq(
    List("MISSENSE_VARIANT"), List("FRAMESHIFT_VARIANT"),
    List("TRANSCRIPT_AMPLIFICATION"), List("TRANSCRIPT_ABLATION"),
    List("NULL"), List("MISSENSE_VARIANT", "GAIN_OF_FUNCTION_VARIANT"))

  private val evidenceTypes: IndexedSeq[String] = IndexedSeq(
    "PREDICTIVE", "PREDICTIVE", "PREDICTIVE", // weighted towards predictive
    "DIAGNOSTIC", "PROGNOSTIC", "PREDISPOSING", "ONCOGENIC", "FUNCTIONAL")

  private val diseases: IndexedSeq[String] = IndexedSeq(
    "BLADDER CANCER", "BLADDER UROTHELIAL CARCINOMA", "SOLID TUMOR", "CANCER",
    "LUNG SMALL CELL CARCINOMA", "NON-SMALL CELL LUNG CANCER", "MELANOMA",
    "SKIN MELANOMA", "COLORECTAL CANCER", "NULL")

  private val drugsPool: IndexedSeq[String] = IndexedSeq(
    "DABRAFENIB", "TRAMETINIB", "VEMURAFENIB", "CETUXIMAB", "ERLOTINIB",
    "DABRAFENIB+TRAMETINIB", "NULL")

  private val dirSig: IndexedSeq[(String, String)] = IndexedSeq(
    ("SUPPORTS", "SENSITIVITYRESPONSE"), ("SUPPORTS", "SENSITIVITYRESPONSE"),
    ("SUPPORTS", "RESISTANCE"), ("SUPPORTS", "REDUCED SENSITIVITY"),
    ("SUPPORTS", "ADVERSE RESPONSE"), ("DOES_NOT_SUPPORT", "RESISTANCE"),
    ("DOES_NOT_SUPPORT", "SENSITIVITYRESPONSE"), ("NULL", "NULL"),
    ("N/A", "N/A"))

  private val levels: IndexedSeq[String] = IndexedSeq("A", "B", "C", "D", "E")
  private val evStatuses: IndexedSeq[String] =
    IndexedSeq("ACCEPTED", "ACCEPTED", "ACCEPTED", "SUBMITTED", "REJECTED")
  private val origins: IndexedSeq[String] =
    IndexedSeq("SOMATIC", "SOMATIC", "GERMLINE", "NA", "NULL")
  private val sourceTypes: IndexedSeq[String] = IndexedSeq("PUBMED", "PUBMED", "ASCO")

  /** Generate the flat evidence dimension for `nGenes` genes.
    * Driver-side (the dimension is the broadcast-small side); fully
    * deterministic in (seed, nGenes).
    */
  def evidenceRows(nGenes: Int, seed: Long): Seq[EvidenceRow] = {
    val rows = Vector.newBuilder[EvidenceRow]
    var dimOrder = 0L
    var varCounter = 100
    for (g <- 0 until nGenes) {
      val gene = geneName(g.toLong)
      for ((tmpl, j) <- varTemplates.zipWithIndex) {
        val h = mix(seed, g.toLong * 131L + j, 7L)
        // record kind by template position (SNV-ish / CNV / EXPR)
        val kind = if (j < 12) "SNV" else if (j < 19) "CNV" else "EXPR"
        // gene profiles so sentinel fallbacks fire: every 7th gene
        // carries only CNV+EXPR records (SNV input -> NON_SNV_MATCH_ONLY),
        // the next only SNV records (CNV/EXPR inputs -> NON_*_MATCH_ONLY)
        // profile 4 genes hold only exact/positional-bucket SNVs and
        // exon-CNVs: positional-only inputs land on tier_2 (the V600
        // bucket path + the exon-CNV DELETION path)
        val profileKeep = (g % 7) match {
          case 4 => j == 0 || j == 3 || j >= 16
          case 5 => kind != "SNV"
          case 6 => kind == "SNV"
          case _ => true
        }
        // deterministic subset: each gene carries ~70% of the templates
        // (profile-4 genes keep their whole reduced set)
        if (profileKeep &&
            ((g % 7) == 4 || java.lang.Long.remainderUnsigned(h, 10L) < 7)) {
          val (name, hgvs) = tmpl
          val varId = varCounter.toString
          varCounter += 1
          val types = pick(varTypePool, mix(seed, h, 11L))
          val nMps = if (java.lang.Long.remainderUnsigned(h, 17L) == 0) 2 else 1
          for (m <- 0 until nMps) {
            val mpId = s"$varId-$m"
            val score = (java.lang.Long.remainderUnsigned(mix(seed, h, 13L + m), 80L)).toDouble / 4.0
            val nEv = 1 + java.lang.Long.remainderUnsigned(mix(seed, h, 17L + m), 5L).toInt
            val leaves = (0 until nEv).map { e =>
              val he = mix(seed, h, 19L * (m + 1) + e)
              val evType = pick(evidenceTypes, he)
              val disease = pick(diseases, mix(seed, he, 23L))
              val drug =
                if (evType == "PREDICTIVE") pick(drugsPool, mix(seed, he, 29L))
                else "NULL"
              val (dir, sig) = pick(dirSig, mix(seed, he, 31L))
              val level = pick(levels, mix(seed, he, 37L))
              val st = pick(sourceTypes, mix(seed, he, 41L))
              val sid = (10000 + java.lang.Long.remainderUnsigned(he, 89999L)).toString
              val est = pick(evStatuses, mix(seed, he, 43L))
              val orig = pick(origins, mix(seed, he, 47L))
              val rating =
                if (java.lang.Long.remainderUnsigned(mix(seed, he, 53L), 5L) == 0) None
                else Some((1 + java.lang.Long.remainderUnsigned(mix(seed, he, 59L), 5L)).toDouble)
              (evType, disease, drug, dir, sig, level, st, sid, est, orig, rating)
            }
            for ((evType, disease, drug, dir, sig, level, st, sid, est, orig, rating) <- leaves) {
              rows += EvidenceRow(
                gene_key = gene, var_id = varId, var_name = name, hgvs = hgvs,
                var_types = types, dim_order = dimOrder, mp_id = mpId,
                mp_name = s"$gene $name", civic_score = score,
                n_evidence_items = nEv, evidence_type = evType,
                disease = disease, drug = drug, direction = dir,
                significance = sig, level = level, source_type = st,
                source_id = sid, evidence_status = est, source_status = est,
                variant_origin = orig, rating = rating)
              dimOrder += 1
            }
          }
        }
      }
    }
    rows.result()
  }

  def evidenceDim(spark: SparkSession, nGenes: Int, seed: Long): Dataset[EvidenceRow] = {
    import spark.implicits._
    spark.createDataset(evidenceRows(nGenes, seed))
  }

  // ---------------------------------------------------------------------
  // Raw (pre-reformat) evidence leaves — the input shape the S5
  // reformat_civic drug reshaping consumes (reference query.py:214-246):
  // a drug LIST plus a drug_interaction_type per leaf, before the
  // one-drug-per-row flat dimension exists.
  // ---------------------------------------------------------------------

  /** Drug-shape cases exercised by the raw generator, cycling so every
    * reshaping path (dedup+normalize, SUBSTITUTES explode,
    * SEQUENTIAL/COMBINATION sort+join, NULL backfill, the
    * empty+COMBINATION → "" reference quirk) appears.
    */
  private val rawDrugCases: IndexedSeq[(List[String], Option[String])] = IndexedSeq(
    (List("dabrafenib "), None),                                // single, noisy case/space
    (List("VEMURAFENIB", "vemurafenib "), None),                // dup collapses on dedup
    (List("TRAMETINIB", "DABRAFENIB"), Some("Combination")),    // sorted + "+"-joined
    (List("ERLOTINIB", "CETUXIMAB"), Some("SEQUENTIAL")),       // sorted + "+"-joined
    (List("DABRAFENIB", "TRAMETINIB", "VEMURAFENIB"), Some("Substitutes")), // stays separate
    (Nil, None),                                                // PREDICTIVE w/o drugs -> "NULL"
    (Nil, Some("COMBINATION")))                                 // reference quirk -> [""]

  /** Deterministic raw leaves; evidence_type cycles so the
    * only-PREDICTIVE-may-carry-drugs guard path is present (all
    * non-PREDICTIVE leaves carry no drugs, as in CIViC).
    */
  def rawEvidenceRows(nGenes: Int, seed: Long): Seq[RawEvidenceLeaf] = {
    val rows = Vector.newBuilder[RawEvidenceLeaf]
    var varCounter = 500
    for (g <- 0 until nGenes) {
      val gene = geneName(g.toLong)
      for (j <- 0 until 4) {
        val varId = varCounter.toString
        varCounter += 1
        val name = varTemplates(j % varTemplates.length)._1
        val nEv = 1 + java.lang.Long.remainderUnsigned(mix(seed, g.toLong * 37 + j, 83L), 4L).toInt
        for (e <- 0 until nEv) {
          val he = mix(seed, g.toLong * 131 + j * 17 + e, 89L)
          val evType = pick(evidenceTypes, he)
          val (drugs, inter) =
            if (evType == "PREDICTIVE")
              rawDrugCases((java.lang.Long.remainderUnsigned(he, rawDrugCases.length.toLong)).toInt)
            else (Nil, None)
          val disease = pick(diseases, mix(seed, he, 23L))
          val (dir, sig) = pick(dirSig, mix(seed, he, 31L))
          rows += RawEvidenceLeaf(
            gene_key = gene, var_id = varId, var_name = name,
            evidence_type = evType, disease = disease,
            drugs = drugs, drug_interaction = inter.orNull,
            direction = dir, significance = sig,
            level = pick(levels, mix(seed, he, 37L)),
            source_type = pick(sourceTypes, mix(seed, he, 41L)),
            source_id = (10000 + java.lang.Long.remainderUnsigned(he, 89999L)).toString,
            evidence_status = pick(evStatuses, mix(seed, he, 43L)),
            variant_origin = pick(origins, mix(seed, he, 47L)))
        }
      }
    }
    rows.result()
  }

  def rawEvidenceDim(spark: SparkSession, nGenes: Int, seed: Long): Dataset[RawEvidenceLeaf] = {
    import spark.implicits._
    spark.createDataset(rawEvidenceRows(nGenes, seed))
  }

  /** Gene alias table (analog of CIViC gene aliases, query.py:54-65):
    * every gene has a deterministic "ALT<g>" alias, every third gene an
    * additional legacy symbol.
    */
  def aliasRows(nGenes: Int): Seq[(String, String)] =
    (0 until nGenes).flatMap { g =>
      val gene = geneName(g.toLong)
      Seq(gene -> f"ALT$g%04d") ++
        (if (g % 3 == 0) Seq(gene -> f"LEGACY$g%04d") else Nil)
    }

  def aliasTable(spark: SparkSession, nGenes: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    aliasRows(nGenes).toDF("gene_key", "alias")
  }

  // ---------------------------------------------------------------------
  // Transcript fact table (BASELINE.json input_hint)
  // ---------------------------------------------------------------------

  /** SNV-like payload pool: (dna, prot, impact, exon) cells, multi-values
    * comma-separated with no spaces (reference input format README.md:43-46).
    * Chosen so every tier path fires against the dimension templates.
    */
  private val snvPayloads: IndexedSeq[String] = IndexedSeq(
    "c.1799T>A|p.Val600Glu|missense_variant|15/18",
    "c.35G>A|p.Gly12Asp|missense_variant|2/5",
    "c.100T>C|p.Glu55fs|frameshift_variant&stop_gained|3/10",
    "c.388C>T|p.Ter130Tyrext*?|stop_lost|4/7",
    "c.183A>C|p.Pro61Pro|synonymous_variant|1/3",
    "c.72G>A|p.Trp24*|stop_gained|1/3",
    "c.100+1G>A||splice_donor_variant&intron_variant|4/7",
    "c.5000A>T|p.Ala999Thr|missense_variant|20/20",
    "c.1799T>A,c.1798G>C|p.Val600Glu,p.Val600Lys|missense_variant,missense_variant|15/18,15/18",
    "c.470A>G|p.His157Arg|missense_variant|")

  private val cnvPayloads: IndexedSeq[String] = IndexedSeq(
    "AMPLIFICATION", "AMP", "GAIN", "DUPLICATION", "DUP",
    "DELETION", "DEL", "LOSS", "DEL,AMP")

  private val exprPayloads: IndexedSeq[String] =
    IndexedSeq("2.5", "-1.3", "0.7", "-0.2", "4.25")

  private val roles = IndexedSeq("user", "assistant", "tool")
  private val tools = IndexedSeq("", "search", "calculator", "annotate")

  /** Config for the transcript generator. `hotConvs` conversations
    * receive `hotMult`x the turns of a normal conversation (skew knob);
    * `dupRate`/`lateRate` inject duplicate and late rows for the
    * watermark/dedup paths.
    */
  final case class TurnGenConfig(
      nConvs: Int = 50,
      turnsPerConv: Int = 20,
      nGenes: Int = 20,
      unknownGeneFrac: Double = 0.15,
      hotConvs: Int = 0,
      hotMult: Int = 10,
      dupRate: Double = 0.0,
      lateRate: Double = 0.0,
      baseTs: Long = 1700000000000L, // fixed epoch; no wall clock
      stepMs: Long = 30000L,
      seed: Long = 42L) {
    /** Total generated row count incl. hot-conversation extra turns. */
    def totalRows: Long = {
      val base = nConvs.toLong * turnsPerConv
      val hot = hotConvs.toLong * turnsPerConv * (hotMult - 1).max(0)
      val dups = (base * dupRate).toLong
      base + hot + dups
    }
  }

  /** Pure row-at-index generator: the i-th turn of the stream. */
  def turnAt(i: Long, cfg: TurnGenConfig): Turn = {
    val base = cfg.nConvs.toLong * cfg.turnsPerConv
    val hot = cfg.hotConvs.toLong * cfg.turnsPerConv * (cfg.hotMult - 1).max(0)
    val (conv, turnIdx, isDup) =
      if (i < base) ((i / cfg.turnsPerConv).toInt, (i % cfg.turnsPerConv).toInt, false)
      else if (i < base + hot) {
        // extra turns land on the first hotConvs conversations
        val j = i - base
        val perHot = cfg.turnsPerConv.toLong * (cfg.hotMult - 1)
        val c = (j / perHot).toInt
        (c, (cfg.turnsPerConv + (j % perHot)).toInt, false)
      } else {
        // duplicate re-emissions of existing rows (same conv_id, turn_idx)
        val j = java.lang.Long.remainderUnsigned(mix(cfg.seed, i, 61L), base)
        ((j / cfg.turnsPerConv).toInt, (j % cfg.turnsPerConv).toInt, true)
      }
    val h = mix(cfg.seed, conv.toLong * 1000003L + turnIdx, 3L)
    val role = roles((turnIdx % 3).toInt)
    val geneSpan = (cfg.nGenes / (1.0 - cfg.unknownGeneFrac)).toInt.max(cfg.nGenes + 1)
    val gene = geneName(java.lang.Long.remainderUnsigned(h, geneSpan.toLong))
    val payload = role match {
      case "user" => pick(snvPayloads, mix(cfg.seed, h, 67L))
      case "assistant" => pick(cnvPayloads, mix(cfg.seed, h, 71L))
      case _ => pick(exprPayloads, mix(cfg.seed, h, 73L))
    }
    val late = !isDup &&
      (java.lang.Long.remainderUnsigned(mix(cfg.seed, h, 79L), 1000L) < (cfg.lateRate * 1000).toLong)
    val tsBase = cfg.baseTs + conv.toLong * 3600000L + turnIdx.toLong * cfg.stepMs
    val ts = if (late) tsBase - 3600000L else if (isDup) tsBase + 1000L else tsBase
    Turn(f"conv$conv%05d", turnIdx, role, s"$gene $payload",
      tools((math.abs(h) % tools.length).toInt), new Timestamp(ts))
  }

  /** Distributed transcript table: `spark.range` + pure per-index map —
    * no driver materialization, scales to arbitrary row counts.
    */
  def transcripts(spark: SparkSession, cfg: TurnGenConfig): Dataset[Turn] = {
    import spark.implicits._
    spark.range(cfg.totalRows).map(i => turnAt(i, cfg))
  }

  /** Driver-side variant for small test fixtures. */
  def transcriptRows(cfg: TurnGenConfig): Seq[Turn] =
    (0L until cfg.totalRows).map(i => turnAt(i, cfg))
}
