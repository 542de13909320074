"""P/R gate vs frozen reference goldens (FIXTURES.md §3).

fixtures/golden_*.jsonl were produced by running the ACTUAL reference
implementation (scripts/validate_vs_reference.py --freeze) on the same
deterministic corpus + parses.  The committed suite re-extracts with OUR
kernel and requires precision/recall >= 0.95 on (eid, pattern) multisets and
(hid, sense, tid) relation-instance multisets — the BASELINE.json metric.
Current status: exact equality (P = R = 1.0).
"""

import json
from collections import Counter

N_CONVS = 150  # prefix of the frozen corpus, for test-time speed


def _extract_paragraph(conv_id, texts):
    from aser_spark.kernel import (extract_paragraph_relations,
                                   extract_sentence_eventualities)
    from aser_spark.nlp import parse_text

    parsed = []
    for t in texts:
        parsed.extend(parse_text(t))
    para_evs = [
        extract_sentence_eventualities(s["tokens"], s["lemmas"],
                                       s["pos_tags"], s["dependencies"])
        for s in parsed
    ]
    ev = Counter((conv_id, e["eid"], e["pattern"]) for evs in para_evs for e in evs)
    rel = Counter((conv_id, h, s, t)
                  for h, t, s, w in extract_paragraph_relations(parsed, para_evs))
    return conv_id, ev, rel


def _corpus_paragraphs(fixtures_dir):
    """(para_id, texts) for the golden corpus prefix: generated
    conversations + the out-of-generator PDTB-vocabulary docs."""
    from aser_spark.datagen.transcripts import gen_conversation_rows

    out = []
    for ci in range(N_CONVS):
        rows = gen_conversation_rows(42, ci)
        out.append((rows[0][0], [r[3] for r in rows]))
    with open(fixtures_dir / "oog_docs.jsonl") as f:
        for i, line in enumerate(f):
            out.append((f"oog-{i}", json.loads(line)["doc_texts"]))
    return out


def _load_goldens(fixtures_dir, conv_ids):
    ev, rel = Counter(), Counter()
    with open(fixtures_dir / "golden_eventualities.jsonl") as f:
        for line in f:
            r = json.loads(line)
            if r["conv_id"] in conv_ids:
                ev[(r["conv_id"], r["eid"], r["pattern"])] += 1
    with open(fixtures_dir / "golden_relations.jsonl") as f:
        for line in f:
            r = json.loads(line)
            if r["conv_id"] in conv_ids:
                rel[(r["conv_id"], r["hid"], r["sense"], r["tid"])] += 1
    return ev, rel


def _pr(ours, ref):
    tp = sum((ours & ref).values())
    return (tp / sum(ours.values()) if ours else 1.0,
            tp / sum(ref.values()) if ref else 1.0)


def test_triple_precision_recall_vs_reference(fixtures_dir):
    our_ev, our_rel = Counter(), Counter()
    conv_ids = set()
    for para_id, texts in _corpus_paragraphs(fixtures_dir):
        conv_id, ev, rel = _extract_paragraph(para_id, texts)
        conv_ids.add(conv_id)
        our_ev.update(ev)
        our_rel.update(rel)
    ref_ev, ref_rel = _load_goldens(fixtures_dir, conv_ids)

    assert sum(ref_ev.values()) > 1000, "golden corpus unexpectedly small"
    ep, er = _pr(our_ev, ref_ev)
    rp, rr = _pr(our_rel, ref_rel)
    assert ep >= 0.95 and er >= 0.95, f"eventuality P/R {ep:.4f}/{er:.4f}"
    assert rp >= 0.95 and rr >= 0.95, f"relation P/R {rp:.4f}/{rr:.4f}"


def test_golden_eids_bit_compatible(fixtures_dir):
    """Spot-check that eids in the goldens (produced by the reference's
    json.dumps+sha1, eventuality.py:45-55) are reproduced by our eid_of."""
    from aser_spark.kernel.extractor import eid_of

    checked = 0
    with open(fixtures_dir / "golden_eventualities.jsonl") as f:
        for line in f:
            r = json.loads(line)
            rendered = [
                [[g, r["words"][g], r["pos_tags"][g]], lab,
                 [d, r["words"][d], r["pos_tags"][d]]]
                for g, lab, d in r["dependencies"]
            ]
            assert eid_of(rendered, r["words"], r["pos_tags"]) == r["eid"]
            checked += 1
            if checked >= 500:
                break
    assert checked == 500


def test_reference_doc_example_boat_accommodations():
    """The reference's own published doc example
    (aser_extractor.py:728-738, eventuality_extractor.py:184-193):
    natural text with contractions, a leading temporal PP, and an
    adjective-complement clause — none of which the synthetic generator
    produces.  Our parser + kernel must reproduce the published word lists
    exactly."""
    from aser_spark.kernel import extract_sentence_eventualities
    from aser_spark.nlp import parse_sentence, split_sentences

    text = ("My army will find your boat. In the meantime, I'm sure we "
            "could find you suitable accommodations.")
    got = []
    for s in split_sentences(text):
        p = parse_sentence(s)
        evs = extract_sentence_eventualities(
            p["tokens"], p["lemmas"], p["pos_tags"], p["dependencies"])
        got.append([" ".join(e["words"]) for e in evs])
    assert got == [["my army will find you boat"],
                   ["i be sure", "we could find you suitable accommodation"]]
