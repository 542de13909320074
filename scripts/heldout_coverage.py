#!/usr/bin/env python
"""Measure parse coverage over the frozen held-out prose corpus.

Classifies every sentence as:
  - policy_skip: contains a CLAUSE_SKIP_WORD (wh-word / '?') — the
    reference extractor drops these wholesale
    (/root/reference/aser/extract/rule.py:13-19), so they are excluded
    from the grammar-coverage denominator and reported separately;
  - covered: the grammar produced >= 1 eventuality;
  - gap: in-policy sentence with 0 eventualities (a real grammar gap).

Usage: python scripts/heldout_coverage.py [--gaps N] [--corpus PATH]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aser_spark.kernel.patterns import CLAUSE_SKIP_WORDS
from aser_spark.nlp import split_sentences
from aser_spark.nlp.parser import tokenize
from aser_spark.pipeline.extract import _sentence_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaps", type=int, default=0,
                    help="print the first N gap sentences with POS tags")
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    corpus = args.corpus or os.path.join(root, "fixtures", "heldout_prose.jsonl")

    memo = _sentence_cache("seed")
    n_total = n_policy = n_covered = 0
    gaps = []
    for line in open(corpus):
        for text in json.loads(line)["doc_texts"]:
            for sent in split_sentences(text):
                n_total += 1
                toks = tokenize(sent)
                if any(t in CLAUSE_SKIP_WORDS for t in toks) or "?" in sent:
                    n_policy += 1
                    continue
                p, evs = memo(sent)[:2]
                if evs:
                    n_covered += 1
                else:
                    gaps.append((sent, list(zip(p["tokens"], p["pos_tags"]))))

    n_gap = n_total - n_policy - n_covered
    denom = n_total - n_policy
    print(json.dumps({
        "sentences": n_total,
        "policy_skips": n_policy,
        "covered": n_covered,
        "gaps": n_gap,
        "coverage_in_policy": round(n_covered / denom, 4) if denom else None,
        "coverage_raw": round(n_covered / n_total, 4) if n_total else None,
    }))
    for sent, tagged in gaps[: args.gaps]:
        print("GAP:", sent, file=sys.stderr)
        print("    ", " ".join(f"{t}/{g}" for t, g in tagged), file=sys.stderr)


if __name__ == "__main__":
    main()
