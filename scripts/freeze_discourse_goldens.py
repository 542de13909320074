"""DEV-ONLY: diff the discourse-path extraction (connective scan + clause
split + per-clause re-extraction) against the ACTUAL reference code, and
freeze golden fixtures.

Reference side, run with stubbed heavy deps (same approach as
validate_vs_reference.py):
  * ConnectiveExtractor._extract_connectives_by_tokens — instantiated via
    __new__ with sorted_conn loaded from the reference's exp_conn.txt
    (the sklearn classifier stage cannot run in-sandbox; BOTH sides use the
    candidates-only configuration, which is the documented semantics of
    aser_spark.kernel.discourse).
  * aser.extract.utils.get_clauses — the real P4 code, duck-typed over OUR
    SyntaxTree (it only needs traverse/get_leaves/subtree), so the clause
    algorithm itself is the reference's.
  * SeedRuleEventualityExtractor per clause with index remapping — the
    DiscourseEventualityExtractor loop (eventuality_extractor.py:593-692)
    replicated verbatim on clause_parsed_result dicts.

Our side: aser_spark.kernel.discourse.extract_sentence_eventualities_discourse.

Usage: python scripts/freeze_discourse_goldens.py [n_convs] [--freeze]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from validate_helpers import load_reference_modules  # noqa: E402

# extra hand cases exercising paths the synthetic grammar rarely produces:
# SBAR splits without a connective separator, paired connectives, skip-word
# sentences the seed path drops wholesale
HAND_SENTENCES = [
    "i was happy when the test passed.",
    "if the build failed then the team waited.",
    "either the manager reviewed the report or the user closed the ticket.",
    "the dog barked because the cat slept.",
    "we went home, the test passed.",
    "she was right although he was angry and the child smiled.",
    "i found the answer when the server crashed.",
]


def reference_discourse_extract(ref, parsed):
    """Replicates DiscourseEventualityExtractor.extract_from_parsed_result
    for one sentence (candidates-only connective config)."""
    from aser_spark.nlp.syntax import SyntaxTree

    tokens = parsed["tokens"]
    cands = ref["conn_scan"](tokens)
    sep = set()
    for c in cands:
        sep.update(c["indices"])
    tree = SyntaxTree(parsed["parse"])
    clauses = ref["get_clauses"]({"tokens": tokens}, tree, sep)

    sent_evs = []
    for clause in clauses:
        clause = list(clause)
        mapping = {j: i for i, j in enumerate(clause)}
        idx_set = set(clause)
        cpr = {
            "text": "",
            "dependencies": [(mapping[g], lab, mapping[d])
                             for g, lab, d in parsed["dependencies"]
                             if g in idx_set and d in idx_set],
            "tokens": [tokens[i] for i in clause],
            "pos_tags": [parsed["pos_tags"][i] for i in clause],
            "lemmas": [parsed["lemmas"][i] for i in clause],
        }
        evs = ref["ev_ext"].extract_from_parsed_result(
            cpr, output_format="Eventuality", in_order=True, use_lemma=True)
        for e in evs:
            for k, v in e.raw_sent_mapping.items():
                e.raw_sent_mapping[k] = clause[v]
            dup = any(
                prev.eid == e.eid and prev.raw_sent_mapping == e.raw_sent_mapping
                for prev in sent_evs)
            if not dup:
                sent_evs.append(e)
    sent_evs.sort(key=lambda e: e.position)
    return [
        {
            "eid": e.eid,
            "pattern": e.pattern,
            "words": list(e.words),
            "raw": sorted(set(e.raw_sent_mapping.values())),
            "position": e.position,
        }
        for e in sent_evs
    ]


def our_discourse_extract(parsed):
    from aser_spark.kernel.discourse import extract_sentence_eventualities_discourse
    from aser_spark.nlp.syntax import SyntaxTree

    evs = extract_sentence_eventualities_discourse(
        parsed["tokens"], parsed["lemmas"], parsed["pos_tags"],
        [(g, l, d) for g, l, d in parsed["dependencies"]],
        syntax_tree=SyntaxTree(parsed["parse"]))
    return [
        {
            "eid": e["eid"],
            "pattern": e["pattern"],
            "words": list(e["words"]),
            "raw": list(e["raw_indices"]),
            "position": e["position"],
        }
        for e in evs
    ]


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 200
    freeze = "--freeze" in sys.argv

    ref = load_reference_modules()
    from aser_spark.datagen.transcripts import gen_conversation_rows
    from aser_spark.nlp import parse_sentence, split_sentences

    sentences = list(HAND_SENTENCES)
    for ci in range(n_convs):
        for row in gen_conversation_rows(42, ci):
            sentences.extend(split_sentences(row[3]))

    n_sents = n_mismatch = 0
    tp = fp = fn = 0
    fixtures = []
    seen_sent = set()
    for sent in sentences:
        if sent in seen_sent:
            continue
        seen_sent.add(sent)
        parsed = parse_sentence(sent)
        want = reference_discourse_extract(ref, parsed)
        got = our_discourse_extract(parsed)
        n_sents += 1
        wk = {(e["eid"], tuple(e["raw"])) for e in want}
        gk = {(e["eid"], tuple(e["raw"])) for e in got}
        tp += len(wk & gk)
        fp += len(gk - wk)
        fn += len(wk - gk)
        if wk != gk:
            n_mismatch += 1
            if n_mismatch <= 5:
                print(f"MISMATCH: {sent}\n  want={sorted(wk)}\n  got ={sorted(gk)}")
        fixtures.append({"sentence": sent, "eventualities": want})

    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    print(f"{n_sents} unique sentences | P={p:.4f} R={r:.4f} | "
          f"mismatching sentences: {n_mismatch}")

    if freeze:
        out = REPO / "fixtures" / "golden_discourse_eventualities.jsonl"
        with out.open("w") as f:
            for row in fixtures:
                f.write(json.dumps(row) + "\n")
        print(f"froze {len(fixtures)} sentences -> {out}")

    sys.exit(1 if n_mismatch else 0)


if __name__ == "__main__":
    main()
