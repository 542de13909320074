"""DEV-ONLY: end-to-end parity of the discourse path (eventualities AND
relations) against the REFERENCE code running its OWN pickled classifiers.

Reference side: the real ConnectiveExtractor / ArgumentPositionClassifier /
SSArgumentExtractor / PSArgumentExtractor / ExplicitSenseClassifier with
their pickles loaded through functional scipy/sklearn stand-ins
(validate_helpers.install_functional_ml_stubs — numpy reimplementation of
sklearn-0.22 LogisticRegression.predict), DiscourseEventualityExtractor +
DiscourseRelationExtractor wired exactly as DiscourseASERExtractor does
(shared syntax_tree_cache, aser_extractor.py:819), over OUR SyntaxTree
(bit-parity-validated separately) and OUR parses.

Our side: aser_spark.kernel.discourse.extract_document_eventualities_discourse
+ extract_paragraph_relations_discourse with the frozen weights
(aser_spark/resources).

Usage: python scripts/validate_discourse_e2e.py [n_convs] [--freeze]
  --freeze rewrites fixtures/golden_discourse_eventualities.jsonl and
  fixtures/golden_discourse_relations.jsonl from the REFERENCE outputs.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from validate_helpers import (install_functional_ml_stubs,  # noqa: E402
                              load_reference_modules)

HAND_SENTENCES = [
    "i was happy when the test passed.",
    "if the build failed then the team waited.",
    "either the manager reviewed the report or the user closed the ticket.",
    "the dog barked because the cat slept.",
    "we went home, the test passed.",
    "she was right although he was angry and the child smiled.",
    "i found the answer when the server crashed.",
    "the server crashed. however the team stayed calm.",
    "the user opened a ticket. as a result the bug was fixed.",
]


def load_reference_discourse_extractors():
    install_functional_ml_stubs()
    load_reference_modules()
    from aser.extract.discourse_parser import (ArgumentPositionClassifier,
                                               ConnectiveExtractor,
                                               ExplicitSenseClassifier,
                                               PSArgumentExtractor,
                                               SSArgumentExtractor)
    from aser.extract.eventuality_extractor import (
        DiscourseEventualityExtractor, SeedRuleEventualityExtractor)
    from aser.extract.relation_extractor import DiscourseRelationExtractor

    seed = SeedRuleEventualityExtractor.__new__(SeedRuleEventualityExtractor)
    seed.skip_words = set()  # v2.0 config: no CLAUSE_WORDS skip
    seed.is_externel_corenlp = True

    dev = DiscourseEventualityExtractor.__new__(DiscourseEventualityExtractor)
    dev.seed_rule_eventuality_extractor = seed
    dev.conn_extractor = ConnectiveExtractor()
    dev.is_externel_corenlp = True

    drel = DiscourseRelationExtractor.__new__(DiscourseRelationExtractor)
    drel.conn_extractor = dev.conn_extractor
    drel.argpos_classifier = ArgumentPositionClassifier()
    drel.ss_extractor = SSArgumentExtractor()
    drel.ps_extractor = PSArgumentExtractor()
    drel.explicit_classifier = ExplicitSenseClassifier()
    return dev, drel


def reference_doc(dev, drel, parsed, similarity="simpson"):
    from aser_spark.nlp.syntax import SyntaxTree

    cache = {i: SyntaxTree(p["parse"]) for i, p in enumerate(parsed)}
    para_evs = dev.extract_from_parsed_result(
        parsed, output_format="Eventuality", in_order=True, use_lemma=True,
        syntax_tree_cache=cache)
    rels = drel.extract_from_parsed_result(
        parsed, para_evs, output_format="Relation", in_order=False,
        similarity=similarity, syntax_tree_cache=cache)
    ev_keys = [
        sorted((e.eid, tuple(sorted(set(e.raw_sent_mapping.values()))))
               for e in sent_evs)
        for sent_evs in para_evs
    ]
    triples = {}
    for r in rels:
        for sense, w in r.relations.items():
            key = (r.hid, r.tid, sense)
            triples[key] = triples.get(key, 0.0) + w
    return ev_keys, triples, para_evs


def our_doc(parsed, method="Simpson"):
    from aser_spark.kernel.discourse import (
        extract_document_eventualities_discourse,
        extract_paragraph_relations_discourse)
    from aser_spark.nlp.syntax import SyntaxTree

    trees = [SyntaxTree(p["parse"]) for p in parsed]
    para_evs = extract_document_eventualities_discourse(parsed, trees)
    rows = extract_paragraph_relations_discourse(parsed, para_evs, trees,
                                                 method=method)
    ev_keys = [
        sorted((e["eid"], tuple(e["raw_indices"])) for e in sent_evs)
        for sent_evs in para_evs
    ]
    triples = {}
    for h, t, s, w in rows:
        triples[(h, t, s)] = triples.get((h, t, s), 0.0) + w
    return ev_keys, triples


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 200
    freeze = "--freeze" in sys.argv

    dev, drel = load_reference_discourse_extractors()
    from aser_spark.datagen.transcripts import gen_conversation_rows
    from aser_spark.nlp import parse_text

    docs = [[s] for s in HAND_SENTENCES]  # each hand sentence = 1-sent doc
    docs.append(list(HAND_SENTENCES))     # + one doc with all of them
    # out-of-generator corpus: PDTB-vocabulary sentences the transcript
    # generator never produces (scripts/gen_oog_corpus.py) — on these the
    # classifiers see in-vocabulary features, so parity exercises real
    # model decisions
    oog = REPO / "fixtures" / "oog_docs.jsonl"
    if oog.exists():
        with oog.open() as f:
            docs.extend(json.loads(line)["doc_texts"] for line in f)
    for ci in range(n_convs):
        docs.append([r[3] for r in gen_conversation_rows(42, ci)])

    n_docs = ev_mismatch = 0
    ev_tp = ev_fp = ev_fn = 0
    rel_tp = rel_fp = rel_fn = rel_wbad = 0
    ev_fixtures, rel_fixtures = [], []
    for texts in docs:
        parsed = []
        for t in texts:
            parsed.extend(parse_text(t))
        if not parsed:
            continue
        ref_evs, ref_triples, _ = reference_doc(dev, drel, parsed)
        my_evs, my_triples = our_doc(parsed)
        n_docs += 1

        if n_docs <= 100:
            # also check the dependency-link matcher (similarity='discourse')
            _, ref_dep, _ = reference_doc(dev, drel, parsed,
                                          similarity="discourse")
            _, my_dep = our_doc(parsed, method="discourse")
            if set(ref_dep) != set(my_dep) or any(
                    abs(ref_dep[k] - my_dep[k]) > 1e-9 for k in ref_dep):
                rel_wbad += 1
                print(f"DEP-MATCH MISMATCH doc={texts[:2]}...\n"
                      f"  only-ref={sorted(set(ref_dep) - set(my_dep))}\n"
                      f"  only-us ={sorted(set(my_dep) - set(ref_dep))}")

        for want, got in zip(ref_evs, my_evs):
            wk, gk = set(want), set(got)
            ev_tp += len(wk & gk)
            ev_fp += len(gk - wk)
            ev_fn += len(wk - gk)
            if wk != gk:
                ev_mismatch += 1
                if ev_mismatch <= 5:
                    print(f"EV MISMATCH doc={texts[:2]}...\n"
                          f"  want={sorted(wk)}\n  got ={sorted(gk)}")

        wk, gk = set(ref_triples), set(my_triples)
        rel_tp += len(wk & gk)
        rel_fp += len(gk - wk)
        rel_fn += len(wk - gk)
        for k in wk & gk:
            if abs(ref_triples[k] - my_triples[k]) > 1e-9:
                rel_wbad += 1
        if wk != gk and rel_fp + rel_fn <= 20:
            print(f"REL MISMATCH doc={texts[:2]}...\n"
                  f"  only-ref={sorted(wk - gk)}\n  only-us ={sorted(gk - wk)}")

        ev_fixtures.append({
            "doc_texts": texts,
            "eventualities": [[list(k) for k in sent] for sent in ref_evs],
        })
        rel_fixtures.append({
            "doc_texts": texts,
            "triples": sorted([h, t, s, w] for (h, t, s), w in ref_triples.items()),
        })

    ev_p = ev_tp / (ev_tp + ev_fp) if ev_tp + ev_fp else 1.0
    ev_r = ev_tp / (ev_tp + ev_fn) if ev_tp + ev_fn else 1.0
    rel_p = rel_tp / (rel_tp + rel_fp) if rel_tp + rel_fp else 1.0
    rel_r = rel_tp / (rel_tp + rel_fn) if rel_tp + rel_fn else 1.0
    print(f"{n_docs} docs | eventualities P={ev_p:.4f} R={ev_r:.4f} "
          f"(mismatching sentences: {ev_mismatch}) | "
          f"relations P={rel_p:.4f} R={rel_r:.4f} weight-mismatches={rel_wbad}")

    if freeze:
        out = REPO / "fixtures" / "golden_discourse_eventualities.jsonl"
        with out.open("w") as f:
            for row in ev_fixtures:
                f.write(json.dumps(row) + "\n")
        out2 = REPO / "fixtures" / "golden_discourse_relations.jsonl"
        with out2.open("w") as f:
            for row in rel_fixtures:
                f.write(json.dumps(row) + "\n")
        print(f"froze {len(ev_fixtures)} docs -> {out}, {out2}")

    bad = ev_mismatch or rel_fp or rel_fn or rel_wbad
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
