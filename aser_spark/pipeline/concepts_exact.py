"""Reference-exact eventuality conceptualization (the heap-beam path).

The bounded DataFrame expansions in ``concepts.py`` (probase_concepts /
probase_concepts_multi) are the scalable plan-shaped conceptualizers; this
module reproduces the reference's ``ProbaseASERConceptualizer`` decision
procedure BIT-FOR-BIT — including its `topk**topk` score heap, its
(prob, word-list) tie ordering, its early-break heuristic, and its
always-true fallback comparison — so concept SETS and their ranked order
match the reference exactly (/root/reference/aser/conceptualize/
aser_conceptualizer.py:32-208, aser/concept.py:165-191).

Everything here is pure Python over one eventuality's (words, pos_tags,
ners) sequences: per-row bounded work (matched nouns <= ~4, heap <= 27),
which is exactly what makes the Spark side embarrassingly parallel — an
Arrow-batched mapInPandas with zero shuffles (see
concepts.probase_concepts_exact).  The oracle stager runs these same
functions over the pure-Python-staged instance rows, so the DuckDB gate
verifies the distributed plumbing against an input Spark never touched.
"""

from __future__ import annotations

import heapq
from collections import defaultdict
from itertools import combinations

# aser_conceptualizer.py:38-49
SELECTED_NERS = frozenset([
    "TIME", "DATE", "DURATION", "MONEY", "PERCENT", "NUMBER", "COUNTRY",
    "STATE_OR_PROVINCE", "CITY", "NATIONALITY", "PERSON", "RELIGION", "URL",
])
SEED_CONCEPTS = frozenset("__%s__" % n for n in SELECTED_NERS)
PERSON_PRONOUNS = frozenset([
    "he", "she", "i", "him", "her", "me", "woman", "man", "boy", "girl",
    "you", "we", "they",
])
PRONOUNS = PERSON_PRONOUNS | frozenset(["it"])


def seed_rule_words(words: list, ners: list) -> list:
    """SeedRuleASERConceptualizer.conceptualize_from_text (:63-87): selected
    NER classes and person pronouns become ``__CLASS__<i>`` with i = the
    word's first-occurrence index among that class's distinct words."""
    output_words = []
    ners_dict = {ner: dict() for ner in SELECTED_NERS}
    for word, ner in zip(words, ners):
        if ner in SELECTED_NERS:
            if word not in ners_dict[ner]:
                ners_dict[ner][word] = len(ners_dict[ner])
            output_words.append("__%s__%d" % (ner, ners_dict[ner][word]))
        elif word in PERSON_PRONOUNS:
            if word not in ners_dict["PERSON"]:
                ners_dict["PERSON"][word] = len(ners_dict["PERSON"])
            output_words.append("__PERSON__%d" % ners_dict["PERSON"][word])
        else:
            output_words.append(word)
    return output_words


def build_probase_index(probase_rows: list) -> dict:
    """instance -> [(concept, score) ...] sorted by score DESC, ties kept in
    ROW ORDER — ProbaseConcept.conceptualize sorts its inverted list (built
    in input-line order) with a stable sort (concept.py:165-191), so both
    sides must consume the same row sequence."""
    inv = defaultdict(list)
    for instance, concept, score in probase_rows:
        inv[instance].append((concept, float(score)))
    return {inst: sorted(lst, key=lambda x: x[1], reverse=True)
            for inst, lst in inv.items()}


def probase_concepts_heap(words: list, pos_tags: list, probase_index: dict,
                          topk: int = 3) -> list:
    """_get_probase_concepts (:136-208), mirrored statement-for-statement.
    ``words`` are the SEED-RULE OUTPUT words; returns
    [(word_list, score), ...] in the reference's final (descending
    (score, words)) order, possibly empty."""
    assert len(words) == len(pos_tags)

    word2indices = defaultdict(list)
    for idx, word in enumerate(words):
        word2indices[word].append(idx)

    word2concepts = {}
    for i in range(len(pos_tags)):
        word = words[i]
        tag = pos_tags[i]
        if tag.startswith("NN"):
            if word in SEED_CONCEPTS or word in PRONOUNS:
                continue
            elif word not in word2concepts:
                concepts = probase_index.get(word, [])
                if concepts:
                    concept_set = set()
                    valid_indices = []
                    for idx, (tmp_concept, score) in enumerate(concepts):
                        tmp = tmp_concept.replace(" ", "-")
                        if tmp not in concept_set:
                            valid_indices.append(idx)
                            concept_set.add(tmp)
                        if len(valid_indices) >= topk:
                            break
                    word2concepts[word] = [
                        (concepts[idx][0].replace(" ", "-"), concepts[idx][1])
                        for idx in valid_indices]
                else:
                    continue

    matched_words = list(word2concepts.keys())
    replace_word_tuples = []
    for i in range(1, len(word2concepts) + 1):
        replace_word_tuples.extend(combinations(matched_words, i))

    output_words_heap = []
    max_len = topk ** topk
    pre_min_score = 1.0
    min_score = -1.0
    pre_comb_len = 0
    comb_len = 1
    for word_tuples in replace_word_tuples:
        tmp_words_list = [(1.0, words)]
        for word in word_tuples:
            new_tmp_words_list = []
            for prob, tmp_words in tmp_words_list:
                for concept, c_prob in word2concepts[word]:
                    _tmp_words = tmp_words[:]
                    for idx in word2indices[word]:
                        _tmp_words[idx] = concept
                    new_tmp_words_list.append((prob * c_prob, _tmp_words))
            tmp_words_list = new_tmp_words_list

        for tmp in tmp_words_list:
            if len(output_words_heap) >= max_len:
                tmp = heapq.heappushpop(output_words_heap, tmp)
            else:
                heapq.heappush(output_words_heap, tmp)
            if min_score < tmp[0]:
                min_score = tmp[0]
        comb_len = len(word_tuples)
        if (pre_min_score == min_score and pre_comb_len + 1 < comb_len
                and len(output_words_heap) >= max_len):
            break
        if pre_min_score != min_score:
            pre_min_score = min_score
            pre_comb_len = comb_len

    return [heapq.heappop(output_words_heap)[::-1]
            for _ in range(len(output_words_heap))][::-1]


def exact_concept_rows(words: list, pos_tags: list, ners: list,
                       probase_index: dict, topk: int = 3) -> list:
    """Full ProbaseASERConceptualizer.conceptualize (:116-134) for one
    eventuality: seed-rule abstraction, heap beam, and the fallback.  The
    reference guards the fallback with ``concept_after_seed_rule !=
    " ".join(...)`` — a LIST compared to a STRING, which is always unequal,
    so the effective semantics (mirrored here) are: empty beam -> emit the
    seed-rule word list at score 1.0.

    Input note: the reference feeds skeleton_phrases/_ners/_pos_tags; this
    graft's node payload carries the full word/tag/ner sequences, so
    callers pass those — the decision procedure itself is what's pinned
    bit-exact (see tests/test_concepts_exact.py, which drives the
    reference class over identical inputs).

    Returns [(rank, concept_str, score), ...], rank = reference output
    position."""
    seed = seed_rule_words(words, ners)
    beam = probase_concepts_heap(seed, pos_tags, probase_index, topk)
    if not beam:
        beam = [(seed, 1.0)]
    return [(rank, " ".join(ws), float(score))
            for rank, (ws, score) in enumerate(beam)]
