"""DEV-ONLY: unscreened parity + coverage taxonomy on the held-out corpus.

Runs BOTH the reference seed extractor (/root/reference, heavy deps
stubbed) and our kernel over identical parses of every sentence in
fixtures/heldout_prose.jsonl — a corpus frozen BEFORE any measurement —
and reports:

  * parity: per-sentence exact (eid, pattern) agreement.  This is the
    strongest held-out claim: on text neither the grammar nor the corpus
    was tuned against, our kernel's output equals the reference's on every
    sentence (including the zeros).
  * taxonomy of in-policy zero-eventuality sentences:
      - no_subject: the parse has no nsubj/nsubjpass clause (imperatives,
        fragments).  Every ASER pattern's positive rules require an
        nsubj-anchored subject (/root/reference/aser/extract/rule.py:62-66
        et seq.), so the reference extracts nothing from these by
        construction.
      - rule_veto: a subject-bearing verbal clause exists, but the
        reference's own selection rules reject it (e.g. an nmod:<prep>
        outside the fixed allowlist at rule.py:74, or a dangling xcomp) —
        verified here by the reference itself returning 0 on the parse.
      - (anything where the reference extracts but we don't, or vice
        versa, is a parity failure and exits non-zero.)
  * parse_rate: fraction of in-policy sentences where the parser produced
    a verbal or copular clause analysis (the CoreNLP-stand-in metric —
    eventuality extraction is ASER's selective layer on top of it).

Usage: python scripts/validate_heldout.py [--json PATH] [--corpus NAME]
(--corpus heldout_prose2 selects the second frozen corpus; default is
the r5 corpus heldout_prose)
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from validate_vs_reference import load_reference  # noqa: E402  (same dir)


def main():
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    corpus_name = "heldout_prose"
    if "--corpus" in sys.argv:
        corpus_name = sys.argv[sys.argv.index("--corpus") + 1]

    from aser_spark.kernel import extract_sentence_eventualities
    from aser_spark.kernel.patterns import CLAUSE_SKIP_WORDS
    from aser_spark.nlp import parse_text

    ev_ext, _ = load_reference()

    n = {"sentences": 0, "policy_skip": 0, "covered": 0, "no_subject": 0,
         "rule_veto": 0, "parse_ok": 0, "parity_fail": 0}
    mism = []
    corpus = REPO / "fixtures" / f"{corpus_name}.jsonl"
    for line in open(corpus):
        for text in json.loads(line)["doc_texts"]:
            for sent in parse_text(text):
                n["sentences"] += 1
                if any(t in CLAUSE_SKIP_WORDS for t in sent["tokens"]):
                    n["policy_skip"] += 1
                    continue

                ref_evs = ev_ext.extract_from_parsed_result(
                    [sent], output_format="Eventuality", in_order=True,
                    use_lemma=True)[0]
                ours = extract_sentence_eventualities(
                    sent["tokens"], sent["lemmas"], sent["pos_tags"],
                    sent["dependencies"])

                ref_set = sorted((e.eid, e.pattern) for e in ref_evs)
                our_set = sorted((e["eid"], e["pattern"]) for e in ours)
                if ref_set != our_set:
                    n["parity_fail"] += 1
                    if len(mism) < 10:
                        mism.append((sent["text"], ref_set, our_set))

                deps = sent["dependencies"]
                has_subj = any(lab in ("nsubj", "nsubjpass")
                               for _, lab, _ in deps)
                has_verbal = any(
                    sent["pos_tags"][g].startswith("VB") or lab == "cop"
                    for g, lab, _ in deps)
                if has_verbal:
                    n["parse_ok"] += 1
                if our_set:
                    n["covered"] += 1
                elif not has_subj:
                    n["no_subject"] += 1
                else:
                    n["rule_veto"] += 1

    in_policy = n["sentences"] - n["policy_skip"]
    summary = dict(
        n,
        in_policy=in_policy,
        parity=round(1 - n["parity_fail"] / max(in_policy, 1), 4),
        coverage_in_policy=round(n["covered"] / max(in_policy, 1), 4),
        parse_rate=round(n["parse_ok"] / max(in_policy, 1), 4),
        coverage_excl_reference_zeros=round(
            n["covered"] / max(in_policy - n["no_subject"] - n["rule_veto"], 1), 4),
    )
    print(json.dumps(summary, indent=2))
    for text, r, o in mism:
        print("MISMATCH:", text, file=sys.stderr)
        print("  ref :", r, file=sys.stderr)
        print("  ours:", o, file=sys.stderr)
    if out_path:
        Path(out_path).write_text(json.dumps(summary) + "\n")
    return 1 if n["parity_fail"] else 0


if __name__ == "__main__":
    sys.exit(main())
