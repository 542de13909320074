"""Unit tests for the extraction kernel on curated sentences — one per
eventuality pattern family and per relation sense family."""

import hashlib
import json

import pytest

from aser_spark.kernel import (extract_paragraph_relations,
                               extract_sentence_eventualities)
from aser_spark.nlp import parse_sentence, parse_text


def _extract(text):
    p = parse_sentence(text)
    return extract_sentence_eventualities(
        p["tokens"], p["lemmas"], p["pos_tags"], p["dependencies"])


@pytest.mark.parametrize("text,pattern,words", [
    ("the dog barked loudly.", "s-v", ["the", "dog", "bark", "loudly"]),
    ("my army will find your boat.", "s-v-o", ["my", "army", "will", "find", "you", "boat"]),
    ("we gave them the key.", "s-v-o-o", ["we", "give", "they", "the", "key"]),
    ("i am hungry.", "s-be-a", ["i", "be", "hungry"]),
    ("he is a teacher.", "s-be-o", ["he", "be", "a", "teacher"]),
    ("he wants to leave.", "s-v-v", ["he", "want", "to", "leave"]),
    ("she feels happy.", "s-v-a", ["she", "feel", "happy"]),
    ("he wants to buy a car.", "s-v-v-o", ["he", "want", "to", "buy", "a", "car"]),
    ("the order was shipped.", "spass-v", ["the", "order", "be", "ship"]),
    ("he was given the key.", "spass-v-o", ["he", "be", "give", "the", "key"]),
    ("there is a problem.", "there-be-o", ["there", "be", "a", "problem"]),
    ("he seems to be happy.", "s-v-be-a", ["he", "seem", "to", "be", "happy"]),
    ("he seems to be a teacher.", "s-v-be-o", ["he", "seem", "to", "be", "a", "teacher"]),
    # note: s-v-o-be-a/-o cannot select the infinitival 'to' (mark is not in
    # the A1 possible-group of that rule in the reference table) — faithful
    ("she considered him to be smart.", "s-v-o-be-a", ["she", "consider", "he", "be", "smart"]),
    ("she considered him to be a doctor.", "s-v-o-be-o", ["she", "consider", "he", "be", "doctor"]),
    ("she asked him to fix the bug.", "s-v-o-v-o", ["she", "ask", "he", "fix", "the", "bug"]),
    ("she asked him to give me the key.", "s-v-o-v-o-o", ["she", "ask", "he", "give", "i", "the", "key"]),
    ("he was asked to fix the bug.", "spass-v-v-o", ["he", "be", "ask", "fix", "the", "bug"]),
])
def test_pattern_fires(text, pattern, words):
    evs = _extract(text)
    hit = [e for e in evs if e["pattern"] == pattern]
    assert hit, f"{pattern} did not fire on {text!r}: got {[(e['pattern'], e['words']) for e in evs]}"
    assert hit[0]["words"] == words


def test_skip_words_drop_sentence():
    assert _extract("what is the problem?") == []
    assert _extract("When he left.") == []


def test_eid_is_reference_sha1():
    evs = _extract("i am hungry.")
    e = evs[0]
    rendered = [
        [[g, e["words"][g], e["pos_tags"][g]], lab, [d, e["words"][d], e["pos_tags"][d]]]
        for g, lab, d in e["dependencies"]
    ]
    msg = json.dumps([rendered, e["words"], e["pos_tags"]])
    assert e["eid"] == hashlib.sha1(msg.encode("utf-8")).hexdigest()


def test_eid_deterministic_across_sentences():
    a = _extract("i am hungry.")[0]
    b = _extract("i am hungry because the test failed.")
    hungry = [e for e in b if e["words"] == ["i", "be", "hungry"]]
    assert hungry and hungry[0]["eid"] == a["eid"]


def test_dangling_object_vetoes_bare_sv():
    evs = _extract("my army will find your boat.")
    assert all(e["pattern"] != "s-v" for e in evs)


def _para_relations(text):
    parsed = parse_text(text)
    para_evs = [
        extract_sentence_eventualities(s["tokens"], s["lemmas"],
                                       s["pos_tags"], s["dependencies"])
        for s in parsed
    ]
    return [(s, ) for s in []], extract_paragraph_relations(parsed, para_evs), para_evs


@pytest.mark.parametrize("text,sense", [
    ("the dog barked because he was hungry.", "Reason"),
    ("we stay home if it rains.", "Condition"),
    ("she smiled although she was tired.", "Concession"),
    ("i was tired. so i went home.", "Result"),
    ("he left. but she stayed home.", "Contrast"),
    ("he slept. meanwhile she worked.", "Synchronous"),
    ("i was tired and i went home.", "Co_Occurrence"),
])
def test_relation_sense_fires(text, sense):
    _, rels, _ = _para_relations(text)
    senses = {s for h, t, s, w in rels}
    assert sense in senses, f"{sense} not in {senses} for {text!r}"


def test_intra_sentence_pairs_get_co_occurrence():
    _, rels, para_evs = _para_relations("the dog barked because he was hungry.")
    n = len(para_evs[0])
    co = [r for r in rels if r[2] == "Co_Occurrence"]
    assert len(co) == n * (n - 1) // 2


def test_adjacent_sentence_requires_single_eventualities():
    # first sentence has 2 eventualities -> no cross-sentence relation
    _, rels, para_evs = _para_relations(
        "the dog barked because he was hungry. so i went home.")
    assert len(para_evs[0]) >= 2
    cross = [r for r in rels if r[2] == "Result"]
    assert ("Reason" in {r[2] for r in rels}) and not cross


def test_mention_projection_onto_eventualities():
    """F8: sentence NER mention spans survive into an eventuality iff both
    boundary tokens are kept, remapped to eventuality-local coordinates
    (eventuality.py:317-334)."""
    from aser_spark.kernel import extract_sentence_eventualities
    from aser_spark.kernel.extractor import project_mentions
    from aser_spark.nlp import parse_sentence

    # direct unit semantics
    assert project_mentions([{"start": 1, "end": 3, "text": "x y"}],
                            [0, 1, 2, 5]) == \
        [{"start": 1, "end": 3, "text": "x y"}]      # 1,2 kept -> local 1..3
    assert project_mentions([{"start": 1, "end": 3}], [0, 1, 5]) == []  # 2 dropped

    # through the extractor: "the dog barked" with a mention on "the dog"
    p = parse_sentence("the dog barked.")
    evs = extract_sentence_eventualities(
        p["tokens"], p["lemmas"], p["pos_tags"], p["dependencies"],
        mentions=[{"start": 0, "end": 2, "ner": "ANIMAL", "text": "the dog"}])
    assert len(evs) == 1
    m = evs[0]["mentions"]
    assert m == [{"start": 0, "end": 2, "ner": "ANIMAL", "text": "the dog"}]
