"""DEV-ONLY: freeze the reference's six discourse LR classifiers + their
feature vocabularies into repo resources, so runtime inference is pure
numpy with no dependency on /root/reference, sklearn, or scipy.

The reference pickles (aser/extract/discourse/*.pkl) are plain
sklearn-0.22.2 LogisticRegression objects; a ``pickle.Unpickler.find_class``
override captures coef_/intercept_/classes_ without importing sklearn.
The vocab files (conn_feats/, argpos_feats/, ss_arg_feats/, ps_arg1_feats/,
ps_arg2_feats/, explicit_feats/, feats/conn_category.txt) are the public
Wang & Lan CoNLL-2015 discourse-parser resources the reference ships
(discourse_parser.py:20-26 credits the source).

Outputs:
  aser_spark/resources/discourse_models.npz    coef/intercept/classes x6
  aser_spark/resources/discourse_vocab.json.gz per-family string lists (in
                                               index order) + conn_category

Usage: python scripts/freeze_discourse_models.py
"""

from __future__ import annotations

import gzip
import json
import pickle
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/aser/extract/discourse")
OUT = REPO / "aser_spark" / "resources"


# Deny-by-default unpickling: /root/reference is untrusted content, so
# only the exact numpy reconstruction globals the sklearn-0.22 LR pickles
# actually use may resolve — anything else (os.system, builtins.eval, …)
# raises instead of executing.
_ALLOWED_GLOBALS = {
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
}


class _StubUnpickler(pickle.Unpickler):
    """Map sklearn/scipy classes to attribute-capturing shells; allow only
    the numpy globals the LR pickles need; refuse everything else."""

    def find_class(self, module, name):
        if module.startswith(("sklearn", "scipy")):
            t = type(name, (), {"__module__": module})

            def _setstate(self, state):
                if isinstance(state, dict):
                    self.__dict__.update(state)
                else:
                    self.__dict__["_state"] = state

            t.__setstate__ = _setstate
            return t
        if (module, name) in _ALLOWED_GLOBALS:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle disallowed global {module}.{name} "
            "from untrusted reference pickle")


def _load_model(path: Path):
    with path.open("rb") as f:
        obj = _StubUnpickler(f).load()
    coef = np.asarray(obj.coef_, dtype=np.float64)
    intercept = np.asarray(obj.intercept_, dtype=np.float64)
    classes = np.asarray(obj.classes_, dtype=np.int64)
    return coef, intercept, classes


def _load_vocab_list(path: Path) -> list:
    out = []
    for line in path.read_text().splitlines():
        line = line.rstrip()
        if line:
            out.append(line)
    return out


# (resource group, model file, feats dir, [family file names in merge order])
GROUPS = {
    "conn": ("conn_extractor.pkl", "conn_feats", [
        "cpos", "prev_conn", "prevpos", "prevpos_cpos", "conn_next",
        "nextpos", "cpos_nextpos", "cparent_to_root_path",
        "compressed_cparent_to_root_path", "self_category", "parent_category",
        "left_category", "right_category", "conn_self_category",
        "conn_parent_category", "conn_left_category", "conn_right_category",
        "self_category_parent_category", "self_category_right_category",
        "self_category_left_category", "parent_category_left_category",
        "parent_category_right_category", "left_category_right_category",
        "conn_lower", "conn", "cparent_to_root_path_node_name",
        "conn_right_ctx", "conn_parent_ctx",
    ]),
    "argpos": ("argpos_classifier.pkl", "argpos_feats", [
        "conn", "cpos", "prev1", "prev1pos", "prev1_conn", "prev1pos_cpos",
        "prev2", "prev2pos", "prev2_conn", "prev2pos_cpos", "next1pos_cpos",
        "next2", "conn_to_root_path",
    ]),
    "ss": ("ss_arg_classifier.pkl", "ss_arg_feats", [
        "conn", "conn_lower", "nt_ctx", "conn_nt_path",
        "conn_nt_path_left_number",
    ]),
    "ps1": ("ps_arg1_classifier.pkl", "ps_arg1_feats", [
        "verb_lemma", "clause_first", "clause_last", "prev_clause_first",
        "conn_lower",
    ]),
    "ps2": ("ps_arg2_classifier.pkl", "ps_arg2_feats", [
        "clause_production_rule", "clause_first",
        "clause_first_prev_last_parse_path", "next", "conn_to_root_path",
        "conn", "prev", "clause_last_next", "conn_lower", "conn_conn_ctx",
        "compressed_cparent_to_root_path", "cpos",
        "cparent_to_root_path_node_name",
    ]),
    "explicit": ("explicit_classifier.pkl", "explicit_feats", [
        "conn", "cpos", "prev_conn", "conn_lower", "self_category",
        "parent_category", "left_category", "right_category",
        "conn_lower_self_category", "conn_lower_parent_category",
        "conn_lower_left_category", "conn_lower_right_category",
        "self_category_parent_category", "self_category_right_category",
        "self_category_left_category", "parent_category_left_category",
        "parent_category_right_category", "left_category_right_category",
        "conn_parent_ctx", "as_prev_conn", "as_prev_cpos", "when_prev_conn",
        "when_prev_cpos",
    ]),
}

# built-in (non-file) family dims per group, in the reference merge
# positions; checked against coef width below via the family tuples in
# aser_spark.kernel.discourse
BUILTIN_DIMS = {
    "conn": 1,           # right_contains_VP raw
    "argpos": 3,         # conn_part {start,middle,end}
    "ss": 3 + 1 + 1 + 2,  # conn_category + left_number + right_number + conn_nt_position
    "ps1": 3,            # conn_category
    "ps2": 3,            # conn_category
    "explicit": 0,
}


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    npz = {}
    vocab = {}
    for group, (pkl, feats_dir, families) in GROUPS.items():
        coef, intercept, classes = _load_model(REF / pkl)
        npz[f"{group}_coef"] = coef
        npz[f"{group}_intercept"] = intercept
        npz[f"{group}_classes"] = classes
        fam_lists = {fam: _load_vocab_list(REF / feats_dir / f"{fam}.txt")
                     for fam in families}
        vocab[group] = fam_lists
        dim = sum(len(v) for v in fam_lists.values()) + BUILTIN_DIMS[group]
        assert dim == coef.shape[1], (group, dim, coef.shape)
        print(f"{group}: coef {coef.shape} classes {classes.tolist()[:4]}... "
              f"vocab dims ok ({dim})")

    conn_category = {}
    for line in (REF / "feats" / "conn_category.txt").read_text().splitlines():
        if line.strip():
            a, b = line.split("#")
            conn_category[a.strip()] = b.strip()
    vocab["conn_category"] = conn_category
    exp_conn = _load_vocab_list(REF / "conn_feats" / "exp_conn.txt")
    vocab["exp_conn"] = exp_conn

    from aser_spark.kernel.discourse import EXPLICIT_CONNECTIVES
    assert set(exp_conn) == set(EXPLICIT_CONNECTIVES), (
        set(exp_conn) ^ set(EXPLICIT_CONNECTIVES))

    np.savez_compressed(OUT / "discourse_models.npz", **npz)
    with gzip.open(OUT / "discourse_vocab.json.gz", "wt") as f:
        json.dump(vocab, f, separators=(",", ":"))
    size_npz = (OUT / "discourse_models.npz").stat().st_size
    size_voc = (OUT / "discourse_vocab.json.gz").stat().st_size
    print(f"wrote {OUT}/discourse_models.npz ({size_npz/1e6:.2f} MB), "
          f"discourse_vocab.json.gz ({size_voc/1e6:.2f} MB)")


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    main()
