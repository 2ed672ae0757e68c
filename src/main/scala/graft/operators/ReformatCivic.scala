package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S5 dimension ETL: the drug-combination reshaping every raw
  * evidence-dimension load needs before the flat `EvidenceRow` schema
  * exists (reference: query.py:214-246).
  *
  * Raw CIViC-like evidence leaves carry a drug LIST plus a
  * drug_interaction_type; the flat dimension wants exactly one drug
  * string per leaf:
  *
  *  - names are trimmed + uppercased, deduped keeping first occurrence
  *    (query.py:216-220);
  *  - interaction "SUBSTITUTES": drugs stay separate → one output row
  *    per drug (query.py:226);
  *  - any other non-null interaction ("SEQUENTIAL"/"COMBINATION"):
  *    drugs are sorted alphabetically and joined with "+" into a
  *    single tag (query.py:227-230) — note the reference quirk that an
  *    EMPTY drug list with such an interaction yields [""], not
  *    ["NULL"], replicated here;
  *  - empty drug list → the "NULL" dummy (query.py:232-236);
  *  - only PREDICTIVE evidence may carry drugs — anything else with a
  *    non-"NULL" drug set raises (query.py:238-240).
  *
  * Pure Column expressions + one explode: map-only, whole-stage
  * codegen, no shuffle — dimension loads stay trivially parallel at
  * any scale.
  */
object ReformatCivic {

  /** The reshaped drug list for one leaf (pre-explode). */
  def reshapedDrugList(drugs: Column, interaction: Column): Column = {
    val dedup = array_distinct(transform(drugs, d => upper(trim(d))))
    val inter = upper(trim(interaction))
    val combined = when(interaction.isNull, dedup)
      .when(inter === "SUBSTITUTES", dedup)
      .otherwise(array(array_join(array_sort(dedup), "+")))
    when(combined.isNull || size(combined) === 0, array(lit("NULL")))
      .otherwise(combined)
  }

  /** Reshape a raw dimension (drugs: ARRAY<STRING>, drug_interaction:
    * STRING nullable) into one row per drug with a single `drug`
    * column. `drug_order` preserves the within-leaf emission order
    * (the reference walks `for drug in drugs:`).
    */
  def reshapeDrugs(raw: DataFrame,
                   drugsCol: String = "drugs",
                   interactionCol: String = "drug_interaction",
                   evidenceTypeCol: String = "evidence_type"): DataFrame = {
    val drugList = reshapedDrugList(col(drugsCol), col(interactionCol))
    // reference sanity check (query.py:238-240): non-PREDICTIVE leaves
    // must reshape to the ["NULL"] dummy — assert_true raises per-row.
    // The assertion is folded into the exploded expression (assert_true
    // yields NULL when the condition holds) so column pruning can never
    // drop it.
    val guard = assert_true(
      upper(col(evidenceTypeCol)) === "PREDICTIVE" ||
        (size(drugList) === 1 && drugList.getItem(0) === "NULL"),
      lit("Only evidences of type 'PREDICTIVE' can have drugs associated!"))
    val guardedList = when(guard.isNull, drugList)
    val passthrough = raw.columns.toIndexedSeq
      .filterNot(c => c == drugsCol || c == interactionCol).map(col)
    raw.select(passthrough :+
      posexplode(guardedList).as(Seq("drug_order", "drug")): _*)
  }
}
