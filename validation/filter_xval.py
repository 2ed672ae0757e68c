import json, sys
sys.path.insert(0, '/root/reference')
from civicutils.filtering import filter_civic

vm = json.load(open('/tmp/filter_xval/varmap.json'))

configs = {
 'tcga_default': dict(evidence_type_not_in=["FUNCTIONAL","ONCOGENIC"], evidence_status_in=["ACCEPTED"], var_origin_not_in=["GERMLINE"]),
 'disease_drug': dict(disease_in=["BLADDER"], drug_name_not_in=["TRAME"], min_civic_score=5.0),
 'types_counts': dict(var_type_in=["MISSENSE"], min_evidence_items=3, evidence_level_in=["A","B","C"]),
 'gene_rating': dict(gene_id_in=[f"ENT{i:04d}" for i in range(8)], min_variants=10, source_type_in=["PUBMED"], min_evidence_rating=3.0),
 'dir_sig': dict(evidence_dir_in=["SUPPORTS"], evidence_clinsig_not_in=["RESISTANCE"], var_name_not_in=["EXON"]),
 'null_probes': dict(var_origin_in=["SOMATIC"], drug_name_in=["NIB"], evidence_status_not_in=["REJECTED"]),
}

VAR_KEYS = {"name","hgvs","types"}
def flatten(cm):
    leaves, counts = [], {}
    for gene, gd in cm.items():
        for var, vd in gd.items():
            for mp, md in vd.items():
                if mp in VAR_KEYS: continue
                counts[f"{gene}%%{var}%%{mp}"] = md.get("n_evidence_items", 0)
                for et, td in md.get("evidence_items", {}).items():
                    for dis, dd in td.items():
                        for drug, ed in dd.items():
                            for ev, ld in ed.items():
                                for lev, items in ld.items():
                                    for it in items:
                                        leaves.append("%%".join([gene,var,mp,et,dis,drug,ev,lev,it]))
    return sorted(leaves), counts

ok = True
for name, kw in configs.items():
    got = json.load(open(f'/tmp/filter_xval/spark_{name}.json'))
    cm = filter_civic(vm, **kw)
    leaves, counts = flatten(cm)
    same_leaves = leaves == sorted(got['leaves'])
    same_counts = counts == got['counts']
    print(f"{name}: leaves={len(leaves)}/{len(got['leaves'])} match={same_leaves} counts_match={same_counts}")
    if not same_leaves:
        ok = False
        sl, sg = set(leaves), set(got['leaves'])
        print("  only_ref:", list(sl-sg)[:3])
        print("  only_spark:", list(sg-sl)[:3])
    if not same_counts:
        ok = False
        for k in set(counts) | set(got['counts']):
            if counts.get(k) != got['counts'].get(k):
                print("  count diff", k, counts.get(k), got['counts'].get(k))
                break
print("ALL MATCH" if ok else "MISMATCH")
