"""DEV-ONLY harness: diff our extraction kernel against the ACTUAL reference
implementation (/root/reference), on identical parsed inputs.

Used to (a) debug semantic drift during development and (b) freeze golden
fixtures (fixtures/golden_*.jsonl) that the committed pytest suite checks
WITHOUT importing the reference.  The reference's heavy deps (stanza,
sklearn, scipy, ete3) are stubbed out — the seed-rule code path never touches
them at runtime.

Usage:
    python scripts/validate_vs_reference.py [n_convs] [--freeze]
"""

from __future__ import annotations

import json
import sys
import types
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference():
    """Import the reference aser package with heavy deps stubbed."""
    class _Dummy:  # placeholder class for never-touched symbols
        def __init__(self, *a, **kw):
            raise RuntimeError("stubbed dependency used at runtime")

    _stub_module("stanza")
    _stub_module("stanza.server", CoreNLPClient=_Dummy, TimeoutException=Exception)
    _stub_module("ete3", Tree=_Dummy)
    _stub_module("scipy", sparse=None)
    _stub_module("scipy.sparse", csr_matrix=_Dummy, hstack=_Dummy, vstack=_Dummy)
    sys.modules["scipy"].sparse = sys.modules["scipy.sparse"]
    _stub_module("sklearn")
    _stub_module("sklearn.preprocessing", MultiLabelBinarizer=_Dummy)
    _stub_module("sklearn.linear_model", LogisticRegression=_Dummy, LogisticRegressionCV=_Dummy)
    _stub_module("sklearn.multiclass", OneVsRestClassifier=_Dummy)

    sys.path.insert(0, "/root/reference")
    from aser.extract.eventuality_extractor import SeedRuleEventualityExtractor
    from aser.extract.relation_extractor import SeedRuleRelationExtractor
    from aser.extract.rule import CLAUSE_WORDS

    ev_ext = SeedRuleEventualityExtractor.__new__(SeedRuleEventualityExtractor)
    ev_ext.skip_words = set(CLAUSE_WORDS)
    ev_ext.is_externel_corenlp = True  # silence __del__ on the __new__ instance
    rel_ext = SeedRuleRelationExtractor.__new__(SeedRuleRelationExtractor)
    return ev_ext, rel_ext


def reference_extract(ev_ext, rel_ext, parsed_para):
    """(eventuality records, relation instance rows) via the reference."""
    para_evs = ev_ext.extract_from_parsed_result(
        parsed_para, output_format="Eventuality", in_order=True, use_lemma=True
    )
    ev_rows = []
    for sent_idx, sent_evs in enumerate(para_evs):
        for e in sent_evs:
            ev_rows.append({
                "sent_idx": sent_idx,
                "eid": e.eid,
                "pattern": e.pattern,
                "words": e.words,
                "pos_tags": e.pos_tags,
                "dependencies": [list(d) for d in e._dependencies],
                "skeleton_words": e.skeleton_words,
                "verbs": e.verbs,
                "position": e.position,
            })
    rel_lists = rel_ext.extract_from_parsed_result(
        parsed_para, para_evs, output_format="Relation", in_order=True
    )
    rel_rows = []
    for rels in rel_lists:
        for r in rels:
            for sense, cnt in r.relations.items():
                rel_rows.append((r.hid, r.tid, sense, float(cnt)))
    return ev_rows, rel_rows


def ours_extract(parsed_para):
    from aser_spark.kernel import (extract_sentence_eventualities,
                                   extract_paragraph_relations)

    para_evs = []
    ev_rows = []
    for sent_idx, sent in enumerate(parsed_para):
        evs = extract_sentence_eventualities(
            sent["tokens"], sent["lemmas"], sent["pos_tags"], sent["dependencies"]
        )
        para_evs.append(evs)
        for e in evs:
            ev_rows.append(dict(e, sent_idx=sent_idx))
    rel_rows = extract_paragraph_relations(parsed_para, para_evs)
    return ev_rows, rel_rows


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    freeze = "--freeze" in sys.argv

    from aser_spark.datagen.transcripts import gen_conversation_rows
    from aser_spark.nlp import parse_text

    ev_ext, rel_ext = load_reference()

    ref_ev, our_ev = Counter(), Counter()
    ref_rel, our_rel = Counter(), Counter()
    mismatched_paras = 0
    golden_ev, golden_rel = [], []

    # paragraphs = generated conversations + the out-of-generator corpus
    # (fixtures/oog_docs.jsonl, PDTB-vocabulary sentences the generator
    # never produces — seed-kernel parity beyond the synthetic grammar)
    paragraphs = []
    for conv_idx in range(n_convs):
        rows = gen_conversation_rows(42, conv_idx)
        paragraphs.append((rows[0][0], [text for _, _, _, text, _, _ in rows]))
    oog = REPO / "fixtures" / "oog_docs.jsonl"
    if oog.exists():
        with oog.open() as f:
            paragraphs.extend(
                (f"oog-{i}", json.loads(line)["doc_texts"])
                for i, line in enumerate(f))

    for conv_id, texts in paragraphs:
        # paragraph = the WHOLE conversation, sentences stably ordered by
        # (turn_idx, sent_idx) — this is the conv_id relation window
        # (SURVEY.md §1.4: reference paragraph <-> conversation).
        parsed = []
        for text in texts:
            parsed.extend(parse_text(text))

        r_ev, r_rel = reference_extract(ev_ext, rel_ext, parsed)
        o_ev, o_rel = ours_extract(parsed)

        r_keys = Counter((e["eid"], e["pattern"]) for e in r_ev)
        o_keys = Counter((e["eid"], e["pattern"]) for e in o_ev)
        r_rkeys = Counter((h, s, t) for h, t, s, w in r_rel)
        o_rkeys = Counter((h, s, t) for h, t, s, w in o_rel)
        ref_ev.update(r_keys); our_ev.update(o_keys)
        ref_rel.update(r_rkeys); our_rel.update(o_rkeys)
        if r_keys != o_keys or r_rkeys != o_rkeys:
            mismatched_paras += 1
            if mismatched_paras <= 5:
                print(f"--- MISMATCH conv={conv_id}")
                print("  ref ev :", sorted(r_keys - o_keys), "| extra:", sorted(o_keys - r_keys))
                print("  ref rel:", sorted(r_rkeys - o_rkeys), "| extra:", sorted(o_rkeys - r_rkeys))
        if freeze:
            for e in r_ev:
                golden_ev.append(dict(e, conv_id=conv_id))
            for h, t, s, w in r_rel:
                golden_rel.append({"conv_id": conv_id,
                                   "hid": h, "tid": t, "sense": s, "weight": w})

    def pr(ours: Counter, ref: Counter):
        tp = sum((ours & ref).values())
        p = tp / sum(ours.values()) if ours else 1.0
        r = tp / sum(ref.values()) if ref else 1.0
        return p, r

    ep, er = pr(our_ev, ref_ev)
    rp, rr = pr(our_rel, ref_rel)
    print(f"convs={n_convs} paras_mismatched={mismatched_paras}")
    print(f"eventualities: ours={sum(our_ev.values())} ref={sum(ref_ev.values())} P={ep:.4f} R={er:.4f}")
    print(f"relations    : ours={sum(our_rel.values())} ref={sum(ref_rel.values())} P={rp:.4f} R={rr:.4f}")

    if freeze:
        fx = REPO / "fixtures"
        with open(fx / "golden_eventualities.jsonl", "w") as f:
            for row in golden_ev:
                f.write(json.dumps(row) + "\n")
        with open(fx / "golden_relations.jsonl", "w") as f:
            for row in golden_rel:
                f.write(json.dumps(row) + "\n")
        print(f"froze {len(golden_ev)} eventualities / {len(golden_rel)} relations to fixtures/")

    ok = ep >= 0.95 and er >= 0.95 and rp >= 0.95 and rr >= 0.95
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
