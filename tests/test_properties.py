"""Property-based robustness tests (hypothesis): the parser and kernel must
be total and deterministic over arbitrary text — a 100 TB corpus WILL
contain garbage, and a single executor exception fails the stage."""

from hypothesis import given, settings, strategies as st

from aser_spark.kernel import (extract_paragraph_relations,
                               extract_sentence_eventualities)
from aser_spark.nlp import parse_text

TEXTS = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=400,
)


def _pipeline(text):
    parsed = parse_text(text)
    para_evs = []
    for p in parsed:
        n = len(p["tokens"])
        assert len(p["lemmas"]) == n == len(p["pos_tags"])
        for g, lab, d in p["dependencies"]:
            assert 0 <= g < n and 0 <= d < n and g != d
        para_evs.append(extract_sentence_eventualities(
            p["tokens"], p["lemmas"], p["pos_tags"], p["dependencies"]))
    rels = extract_paragraph_relations(parsed, para_evs)
    return parsed, para_evs, rels


@settings(max_examples=300, deadline=None)
@given(TEXTS)
def test_parser_and_kernel_total_on_arbitrary_text(text):
    _pipeline(text)


@settings(max_examples=100, deadline=None)
@given(TEXTS)
def test_extraction_deterministic(text):
    a = _pipeline(text)
    b = _pipeline(text)
    assert [[e["eid"] for e in evs] for evs in a[1]] == \
           [[e["eid"] for e in evs] for evs in b[1]]
    assert a[2] == b[2]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(
    ["the dog barked.", "i am hungry.", "so we went home.",
     "he wants to buy a car because the test passed.",
     "there is a problem, but she fixed the bug."]), min_size=1, max_size=8))
def test_eventuality_invariants_on_template_text(sents):
    parsed, para_evs, rels = _pipeline(" ".join(sents))
    eids = set()
    for evs in para_evs:
        positions = [e["position"] for e in evs]
        assert positions == sorted(positions)          # in-order output
        for e in evs:
            assert len(e["words"]) == len(e["pos_tags"])
            assert len(e["eid"]) == 40
            assert e["frequency"] == 1.0
            eids.add(e["eid"])
    for hid, tid, sense, w in rels:
        assert hid in eids and tid in eids and w == 1.0


def _discourse_pipeline(text):
    from aser_spark.kernel.discourse import (
        extract_paragraph_relations_discourse,
        extract_sentence_eventualities_discourse)
    from aser_spark.nlp.syntax import SyntaxTree

    parsed = parse_text(text)
    trees, para_evs = [], []
    for p in parsed:
        tree = SyntaxTree(p["parse"])
        assert len(tree.leaves) in (0, len(p["tokens"]))  # leaf/token parity
        trees.append(tree)
        evs = extract_sentence_eventualities_discourse(
            p["tokens"], p["lemmas"], p["pos_tags"], p["dependencies"], tree)
        positions = [e["position"] for e in evs]
        assert positions == sorted(positions)
        para_evs.append(evs)
    rels = extract_paragraph_relations_discourse(parsed, para_evs, trees)
    eids = {e["eid"] for evs in para_evs for e in evs}
    for hid, tid, sense, w in rels:
        assert hid in eids and tid in eids and 0.0 < w <= 1.0
    return parsed, para_evs, rels


@settings(max_examples=200, deadline=None)
@given(TEXTS)
def test_discourse_path_total_on_arbitrary_text(text):
    """The v2.0 path (constituency tree + connective scan + clause split +
    per-clause re-extraction + SS relations) must be total over garbage."""
    _discourse_pipeline(text)


@settings(max_examples=80, deadline=None)
@given(TEXTS)
def test_discourse_path_deterministic(text):
    a = _discourse_pipeline(text)
    b = _discourse_pipeline(text)
    assert [[e["eid"] for e in evs] for evs in a[1]] == \
           [[e["eid"] for e in evs] for evs in b[1]]
    assert a[2] == b[2]


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_compiled_lr_scoring_matches_sklearn_semantics(data):
    """The compiled per-family {string: weight} scorer must reproduce
    sklearn-0.22 LogisticRegression.predict over the frozen weights for
    ARBITRARY feature-string dicts: decision = x.coef^T + intercept with
    binary-threshold / argmax semantics (numpy brute force as the oracle)."""
    import numpy as np

    from aser_spark.kernel.discourse import (EXPLICIT_FEATURE_FAMILIES,
                                             SS_ARG_FEATURE_FAMILIES,
                                             merge_feature_vector)
    from aser_spark.kernel.discourse_models import load_discourse_models

    m = load_discourse_models()
    cases = [
        (m.ss_model, SS_ARG_FEATURE_FAMILIES),
        (m.explicit_model, EXPLICIT_FEATURE_FAMILIES),
    ]
    model, families = data.draw(st.sampled_from(cases))

    # build a random strings dict: per family draw a real vocab string,
    # an out-of-vocab string, or (for raw families) a small int
    strings = {}
    for family, kind, lut in model.prog:
        if kind == "raw":
            strings[family] = data.draw(st.integers(0, 3))
            continue
        keys = list(lut)[:50]
        pick = st.one_of(st.sampled_from(keys) if keys else st.just("~oov~"),
                         st.just("~oov~"))
        if kind == "feat":
            strings[family] = data.draw(pick)
        else:
            strings[family] = data.draw(st.lists(pick, max_size=4))

    # numpy oracle over the ORIGINAL frozen matrices
    raw_npz, raw_vocab = _frozen_resources()
    group = "ss" if families is SS_ARG_FEATURE_FAMILIES else "explicit"
    fam_lists = raw_vocab[group]
    full_vocab = {f: {s: i for i, s in enumerate(l)} for f, l in fam_lists.items()}
    full_vocab.setdefault("conn_category",
                          {"subordinator": 0, "coordinator": 1, "adverbial": 2})
    full_vocab.setdefault("conn_nt_position", {"right": 0, "left": 1})
    dim, fd = merge_feature_vector(strings, full_vocab, families)
    coef = raw_npz[f"{group}_coef"]
    b = raw_npz[f"{group}_intercept"]
    x = np.zeros(dim)
    for i, v in fd.items():
        x[i] = v
    scores = x @ coef.T + b
    classes = raw_npz[f"{group}_classes"]
    want = int(classes[int(np.argmax(scores))])

    assert model.predict(strings) == want


def _frozen_resources():
    """(npz, vocab_json) of the packaged classifier resources, cached."""
    if not hasattr(_frozen_resources, "_cache"):
        import gzip
        import io
        import json as _json
        from importlib import resources

        import numpy as np

        pkg = resources.files("aser_spark.resources")
        npz = np.load(io.BytesIO((pkg / "discourse_models.npz").read_bytes()))
        vocab = _json.loads(gzip.decompress(
            (pkg / "discourse_vocab.json.gz").read_bytes()))
        _frozen_resources._cache = (npz, vocab)
    return _frozen_resources._cache
