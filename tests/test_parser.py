"""Deterministic parser invariants (no Spark)."""

import pytest

from aser_spark.nlp import parse_sentence, parse_text, split_sentences, tokenize


def test_tokenize_peels_punctuation():
    assert tokenize("the dog barked.") == ["the", "dog", "barked", "."]
    assert tokenize("if it rains, we stay.") == ["if", "it", "rains", ",", "we", "stay", "."]


def test_split_sentences():
    assert split_sentences("a b. c d! e?") == ["a b.", "c d!", "e?"]
    assert split_sentences("") == []


@pytest.mark.parametrize("text", [
    "the dog barked loudly.",
    "my army will find your boat.",
    "i am not hungry because the test passed.",
    "there was a problem. so we fixed the bug.",
    "he was given the key by the manager.",
])
def test_parallel_arrays_and_sorted_deps(text):
    for p in parse_text(text):
        n = len(p["tokens"])
        assert len(p["lemmas"]) == n == len(p["pos_tags"]) == len(p["ners"])
        deps = p["dependencies"]
        assert deps == sorted(set(deps), key=lambda e: (e[0], e[2]))
        for g, lab, d in deps:
            assert 0 <= g < n and 0 <= d < n and g != d


def test_copular_structure():
    p = parse_sentence("i am hungry.")
    assert (2, "cop", 1) in p["dependencies"]
    assert (2, "nsubj", 0) in p["dependencies"]


def test_passive_structure():
    p = parse_sentence("the order was shipped.")
    d = p["dependencies"]
    assert (3, "nsubjpass", 1) in d and (3, "auxpass", 2) in d
    assert p["pos_tags"][3] == "VBN"


def test_subordinate_clause_advcl():
    p = parse_sentence("the dog barked because he was hungry.")
    labs = {lab for _, lab, _ in p["dependencies"]}
    assert "advcl:because" in labs and "mark" in labs


def test_vp_coordination_propagates_subject():
    p = parse_sentence("he cooked and cleaned.")
    d = p["dependencies"]
    assert (1, "nsubj", 0) in d          # cooked <- he
    assert (3, "nsubj", 0) in d          # cleaned <- he (enhanced-style)
    assert any(lab == "conj:and" for _, lab, _ in d)


def test_oov_fallback_is_deterministic():
    a = parse_sentence("the quorble snarfed zibbily.")
    b = parse_sentence("the quorble snarfed zibbily.")
    assert a == b
    assert a["pos_tags"][3] == "RB"      # -ly fallback


# --- r5 held-out grammar-growth rules --------------------------------------

def test_compound_noun_np_run():
    p = parse_sentence("our train left the border station.")
    d = p["dependencies"]
    # head = last noun of the run, compound edge to the inner noun
    assert (5, "compound", 4) in d       # station <- border
    assert (2, "dobj", 5) in d           # left -> station


def test_attributive_participle_reads_jj():
    p = parse_sentence("the museum unveiled a restored mural.")
    assert p["pos_tags"][4] == "JJ"      # restored
    assert (5, "amod", 4) in p["dependencies"]


def test_np_internal_vbz_demotes_to_nns():
    p = parse_sentence("the dog liked the reports.")
    assert p["pos_tags"][4] == "NNS"
    assert p["lemmas"][4] == "report"    # lemma stays the singular


def test_sentence_initial_subject_noun_before_finite_verb():
    p = parse_sentence("rain delayed the game.")
    assert p["pos_tags"][0] == "NN"
    assert (1, "nsubj", 0) in p["dependencies"]


def test_plural_subject_vbz_before_modal():
    p = parse_sentence("counts will continue.")
    assert p["pos_tags"][0] == "NNS"
    assert (2, "nsubj", 0) in p["dependencies"]


def test_have_as_main_verb():
    p = parse_sentence("the island has one road.")
    d = p["dependencies"]
    assert (2, "nsubj", 1) in d
    assert (2, "dobj", 4) in d
    assert p["pos_tags"][3] == "CD"      # number word


def test_that_complement_is_ccomp():
    p = parse_sentence("he knew that she waited.")
    labs = {lab for _, lab, _ in p["dependencies"]}
    assert "ccomp" in labs and "advcl:that" not in labs


def test_demonstrative_that_before_noun():
    p = parse_sentence("she liked that song.")
    assert p["pos_tags"][2] == "DT"
    assert (3, "dobj" , 3) not in p["dependencies"]  # sanity: no self-dep
    assert (1, "dobj", 3) in p["dependencies"]


def test_verb_particle_compound_prt():
    p = parse_sentence("the power went out.")
    assert (2, "compound:prt", 3) in p["dependencies"]


def test_bare_temporal_np_is_tmod():
    p = parse_sentence("he worked that morning.")
    d = p["dependencies"]
    assert (1, "nmod:tmod", 3) in d
    assert not any(lab == "dobj" for _, lab, _ in d)


def test_constituency_tree_matches_rendered_string():
    """parse_sentence(with_tree=True) returns nodes the `parse` string is
    rendered FROM; parsing that string back must give the identical
    structure (the discourse memo consumes the nodes directly)."""
    import itertools
    import json
    from pathlib import Path

    from aser_spark.nlp import split_sentences
    from aser_spark.nlp.parser import parse_sentence
    from aser_spark.nlp.syntax import SyntaxTree

    def shape(t):
        if t.tree is None:
            return None
        out = []
        stack = [(t.tree, 0)]
        while stack:
            n, d = stack.pop()
            out.append((d, n.name, n.index, len(n.children)))
            stack.extend((c, d + 1) for c in reversed(n.children))
        return out

    fixtures = Path(__file__).resolve().parent.parent / "fixtures"
    texts = []
    with open(fixtures / "heldout_prose.jsonl") as f:
        for line in itertools.islice(f, 30):
            texts.extend(json.loads(line)["doc_texts"])
    n = 0
    for text in texts:
        for s in split_sentences(text):
            p, root = parse_sentence(s, with_tree=True)
            assert shape(SyntaxTree(p["parse"])) == shape(
                SyntaxTree.from_root(root)), s
            n += 1
    assert n > 100
