"""DEV-ONLY: diff our D2 feature generation (the 29 connective feature
families) against the reference's _generate_connective_features, run over
identical parses and OUR SyntaxTree (duck-typed into its syntax_tree_cache;
the tree itself is parity-tested separately via get_clauses), with the
reference's real per-family vocab files loaded.  Compares the final merged
sparse vectors (dimension + index->value dict) bit-for-bit, then freezes
raw feature-STRING fixtures the committed pytest suite checks without the
reference.

Usage: python scripts/freeze_connective_features.py [n_convs] [--freeze]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from validate_helpers import (load_reference_argpos_classifier,  # noqa: E402
                              load_reference_connective_extractor,
                              load_reference_explicit_classifier,
                              load_reference_ps_arg_extractor,
                              load_reference_ss_arg_extractor)


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 120
    freeze = "--freeze" in sys.argv

    ce = load_reference_connective_extractor()
    ac = load_reference_argpos_classifier()
    ec = load_reference_explicit_classifier()
    ss = load_reference_ss_arg_extractor()
    psx = load_reference_ps_arg_extractor()
    from aser_spark.datagen.transcripts import gen_conversation_rows
    from aser_spark.kernel.discourse import (ARGPOS_FEATURE_FAMILIES,
                                             CONNECTIVE_FEATURE_FAMILIES,
                                             EXPLICIT_FEATURE_FAMILIES,
                                             PS_ARG1_FEATURE_FAMILIES,
                                             PS_ARG2_FEATURE_FAMILIES,
                                             SS_ARG_FEATURE_FAMILIES,
                                             argument_position_feature_strings,
                                             connective_feature_strings,
                                             connective_feature_vector,
                                             explicit_sense_feature_strings,
                                             ps_argument1_feature_strings,
                                             ps_argument2_feature_strings,
                                             ss_argument_feature_strings,
                                             merge_feature_vector)
    from aser_spark.nlp import parse_text
    from aser_spark.nlp.syntax import SyntaxTree

    vocab = {fam: getattr(ce, fam + "_dict")
             for fam, kind in CONNECTIVE_FEATURE_FAMILIES if kind != "raw"}
    ap_vocab = {fam: getattr(ac, fam + "_dict")
                for fam, _ in ARGPOS_FEATURE_FAMILIES}
    ex_vocab = {fam: getattr(ec, fam + "_dict")
                for fam, _ in EXPLICIT_FEATURE_FAMILIES}
    ss_vocab = {fam: getattr(ss, fam + "_dict")
                for fam, kind in SS_ARG_FEATURE_FAMILIES if kind != "raw"}
    ps1_vocab = {fam: getattr(psx, ("conn_category_dict" if fam == "conn_category"
                                    else fam + "_dict1"))
                 for fam, _ in PS_ARG1_FEATURE_FAMILIES}
    ps2_vocab = {fam: getattr(psx, ("conn_category_dict" if fam == "conn_category"
                                    else fam + "_dict2"))
                 for fam, _ in PS_ARG2_FEATURE_FAMILIES}

    hand = [
        "the dog barked because the cat slept.",
        "for example a bird crashed, but the team waited.",
        "either the manager reviewed the report or the user closed the ticket.",
        "i was happy when the test passed.",
    ]
    n_conn = n_bad = 0
    fixtures = []
    docs = [hand]
    # out-of-generator PDTB-vocabulary corpus: in-vocabulary features, so
    # the frozen vectors exercise real model weights (gen_oog_corpus.py)
    oog = REPO / "fixtures" / "oog_docs.jsonl"
    if oog.exists():
        with oog.open() as f:
            docs.extend(json.loads(line)["doc_texts"] for line in f)
    for ci in range(n_convs):
        docs.append([r[3] for r in gen_conversation_rows(42, ci)])
    for texts in docs:
        parsed = []
        for t in texts:
            parsed.extend(parse_text(t))
        cache = {i: SyntaxTree(p["parse"]) for i, p in enumerate(parsed)}
        doc_conns = []
        for si, sp in enumerate(parsed):
            for c in ce._extract_connectives(sp):
                c["sent_idx"] = si
                doc_conns.append(c)
        if not doc_conns:
            continue
        ref_feats = ce._generate_connective_features(parsed, doc_conns, cache)
        ref_ap = ac._generate_argument_position_features(parsed, doc_conns, cache)
        ref_ex = ec._generate_explicit_features(parsed, doc_conns, cache)
        # D4 constituent features: non-parallel connectives only (as
        # SSArgumentExtractor.extract routes them)
        np_conns = [c for c in doc_conns
                    if not any(c["indices"][k] + 1 < c["indices"][k + 1]
                               for k in range(len(c["indices"]) - 1))]
        ref_ss = ss._generate_constituent_argument_features(parsed, np_conns, cache)
        my_ss = []
        for c in np_conns:
            for row in ss_argument_feature_strings(
                    parsed, c["sent_idx"], c["indices"], cache[c["sent_idx"]]):
                my_ss.append(merge_feature_vector(row, ss_vocab,
                                                  SS_ARG_FEATURE_FAMILIES))
        # D5: PS connectives (sent_idx > 0) arg1/arg2 clause features
        ps_conns = [c for c in doc_conns if c["sent_idx"] > 0]
        ref_a1 = psx._generate_argument1_features(parsed, ps_conns, cache)
        ref_a2 = psx._generate_argument2_features(parsed, ps_conns, cache)
        my_a1, my_a2 = [], []
        for c in ps_conns:
            for row in ps_argument1_feature_strings(
                    parsed, c["sent_idx"], c["indices"], cache[c["sent_idx"] - 1]):
                my_a1.append(merge_feature_vector(row, ps1_vocab,
                                                  PS_ARG1_FEATURE_FAMILIES))
            for row in ps_argument2_feature_strings(
                    parsed, c["sent_idx"], c["indices"], cache[c["sent_idx"]]):
                my_a2.append(merge_feature_vector(row, ps2_vocab,
                                                  PS_ARG2_FEATURE_FAMILIES))
        for tag, mine, refs_list in (("D5a1", my_a1, ref_a1), ("D5a2", my_a2, ref_a2)):
            if len(mine) != len(refs_list):
                n_bad += 1
                print(f"{tag} COUNT MISMATCH: {len(mine)} vs {len(refs_list)}")
                continue
            for (mdim, mfd), refs in zip(mine, refs_list):
                if mdim != refs.dimension or mfd != refs.feat_dict:
                    n_bad += 1
                    if n_bad <= 15:
                        print(f"{tag} MISMATCH: dim {mdim} vs {refs.dimension}; "
                              f"extra={set(mfd) - set(refs.feat_dict)} "
                              f"missing={set(refs.feat_dict) - set(mfd)}")
        if len(my_ss) != len(ref_ss):
            n_bad += 1
            print(f"D4 COUNT MISMATCH: {len(my_ss)} vs {len(ref_ss)}")
        else:
            for (mdim, mfd), refs in zip(my_ss, ref_ss):
                if mdim != refs.dimension or mfd != refs.feat_dict:
                    n_bad += 1
                    if n_bad <= 12:
                        print(f"D4 MISMATCH: dim {mdim} vs {refs.dimension}; "
                              f"extra={set(mfd) - set(refs.feat_dict)} "
                              f"missing={set(refs.feat_dict) - set(mfd)}")
        for conn, ref, refp, refe in zip(doc_conns, ref_feats, ref_ap, ref_ex):
            strings = connective_feature_strings(
                parsed, conn["sent_idx"], conn["indices"], cache[conn["sent_idx"]])
            dim, fd = connective_feature_vector(strings, vocab)
            ap_strings = argument_position_feature_strings(
                parsed, conn["sent_idx"], conn["indices"], cache[conn["sent_idx"]])
            ap_dim, ap_fd = merge_feature_vector(ap_strings, ap_vocab,
                                                 ARGPOS_FEATURE_FAMILIES)
            ex_strings = explicit_sense_feature_strings(
                parsed, conn["sent_idx"], conn["indices"], cache[conn["sent_idx"]])
            ex_dim, ex_fd = merge_feature_vector(ex_strings, ex_vocab,
                                                 EXPLICIT_FEATURE_FAMILIES)
            n_conn += 1
            if dim != ref.dimension or fd != ref.feat_dict:
                n_bad += 1
                if n_bad <= 3:
                    print(f"D2 MISMATCH conn={conn['connective']}: "
                          f"dim {dim} vs {ref.dimension}; "
                          f"extra={set(fd) - set(ref.feat_dict)} "
                          f"missing={set(ref.feat_dict) - set(fd)}")
            if ex_dim != refe.dimension or ex_fd != refe.feat_dict:
                n_bad += 1
                if n_bad <= 9:
                    print(f"D6 MISMATCH conn={conn['connective']}: "
                          f"dim {ex_dim} vs {refe.dimension}; "
                          f"extra={set(ex_fd) - set(refe.feat_dict)} "
                          f"missing={set(refe.feat_dict) - set(ex_fd)}")
            if ap_dim != refp.dimension or ap_fd != refp.feat_dict:
                n_bad += 1
                if n_bad <= 6:
                    print(f"D3 MISMATCH conn={conn['connective']}: "
                          f"dim {ap_dim} vs {refp.dimension}; "
                          f"extra={set(ap_fd) - set(refp.feat_dict)} "
                          f"missing={set(refp.feat_dict) - set(ap_fd)}")
            fixtures.append({
                "doc_texts": texts,
                "sent_idx": conn["sent_idx"],
                "indices": conn["indices"],
                "strings": strings,
                "argpos_strings": ap_strings,
                "explicit_strings": ex_strings,
            })

    print(f"{n_conn} connectives | mismatching vectors: {n_bad}")
    if freeze:
        out = REPO / "fixtures" / "golden_connective_features.jsonl"
        with out.open("w") as f:
            for row in fixtures[:2000]:
                f.write(json.dumps(row) + "\n")
        print(f"froze {min(len(fixtures), 2000)} -> {out}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
