"""Numpy inference for the reference's six discourse LR classifiers
(D2 ConnectiveExtractor, D3 ArgumentPositionClassifier, D4 ss_arg,
D5 ps_arg1/ps_arg2, D6 ExplicitSenseClassifier).

The weights are frozen repo resources (scripts/freeze_discourse_models.py
extracts coef_/intercept_/classes_ from the reference's sklearn-0.22.2
pickles, aser/extract/discourse/*.pkl, with a stub unpickler — no sklearn
at runtime).  Decision semantics replicate sklearn LogisticRegression
exactly:

* 1-row coef, 2 classes (conn, argpos): ``predict = classes[score > 0]``
  with ``score = x . coef[0] + intercept[0]``.
* k-row coef (ss 3x, ps1/ps2 2x, explicit 14x):
  ``predict = classes[argmax(x . coef.T + intercept)]``; the reference's
  ``argmax(predict_proba)`` on the explicit model equals argmax of the
  decision because softmax (multinomial) and normalized sigmoids (ovr) are
  both monotone per-row transforms of the decision scores
  (discourse_parser.py:2080-2088).

Sparse features are ``{global_index: value}`` dicts produced by
``aser_spark.kernel.discourse.merge_feature_vector`` (bit-exact vs the
reference featurizers, see fixtures/golden_connective_features.jsonl);
the dot product accumulates in insertion order = ascending index order,
matching scipy's CSR stored-order accumulation.

One process-wide singleton: the worker loads ~3 MB of weights + ~175k
vocab strings once (Spark python workers are reused across tasks), so at
cluster scale this is a per-executor constant, not per-row work.
"""

from __future__ import annotations

import gzip
import json
import threading

import numpy as np

# reference predict_label_dict (discourse_parser.py:1802-1818)
SENSE_LABELS = {
    0: "None", 1: "Precedence", 2: "Succession", 3: "Synchronous",
    4: "Reason", 5: "Result", 6: "Condition", 7: "Contrast",
    8: "Concession", 9: "Conjunction", 10: "Instantiation",
    11: "Restatement", 12: "Alternative", 13: "ChosenAlternative",
    14: "Exception",
}

# built-in (non-file) vocab families (discourse_parser.py:777, 962-963)
_CONN_PART = {"start": 0, "middle": 1, "end": 2}
_CONN_CATEGORY = {"subordinator": 0, "coordinator": 1, "adverbial": 2}
_CONN_NT_POSITION = {"right": 0, "left": 1}


class _LinearModel:
    __slots__ = ("coef", "intercept", "classes")

    def __init__(self, coef, intercept, classes):
        self.coef = np.ascontiguousarray(coef, dtype=np.float64)
        self.intercept = np.ascontiguousarray(intercept, dtype=np.float64)
        self.classes = classes

    def decision(self, feat_dict):
        """x . coef.T + intercept for one sparse row, accumulated in the
        dict's (ascending-index) insertion order per class row."""
        scores = self.intercept.copy()
        coef = self.coef
        for idx, val in feat_dict.items():
            if val == 1:
                scores += coef[:, idx]
            else:
                scores += coef[:, idx] * val
        return scores

    def predict(self, feat_dict):
        scores = self.decision(feat_dict)
        if self.coef.shape[0] == 1:
            return int(self.classes[1] if scores[0] > 0 else self.classes[0])
        return int(self.classes[int(np.argmax(scores))])


class DiscourseModels:
    """Frozen vocab dicts + the six linear models, with decision helpers
    keyed the way the relation pipeline consumes them."""

    def __init__(self, npz, vocab_json):
        def model(group):
            return _LinearModel(npz[f"{group}_coef"],
                                npz[f"{group}_intercept"],
                                npz[f"{group}_classes"])

        self.conn_model = model("conn")
        self.argpos_model = model("argpos")
        self.ss_model = model("ss")
        self.ps1_model = model("ps1")
        self.ps2_model = model("ps2")
        self.explicit_model = model("explicit")

        def index(fam_lists):
            return {fam: {s: i for i, s in enumerate(strings)}
                    for fam, strings in fam_lists.items()}

        self.conn_vocab = index(vocab_json["conn"])
        self.argpos_vocab = index(vocab_json["argpos"])
        self.argpos_vocab["conn_part"] = dict(_CONN_PART)
        self.ss_vocab = index(vocab_json["ss"])
        self.ss_vocab["conn_category"] = dict(_CONN_CATEGORY)
        self.ss_vocab["conn_nt_position"] = dict(_CONN_NT_POSITION)
        self.ps1_vocab = index(vocab_json["ps1"])
        self.ps1_vocab["conn_category"] = dict(_CONN_CATEGORY)
        self.ps2_vocab = index(vocab_json["ps2"])
        self.ps2_vocab["conn_category"] = dict(_CONN_CATEGORY)
        self.explicit_vocab = index(vocab_json["explicit"])
        self.conn_category = vocab_json["conn_category"]

    # --- decisions over feature-STRING dicts (featurizers in discourse.py) ---

    def is_connective(self, strings) -> bool:
        from .discourse import CONNECTIVE_FEATURE_FAMILIES, merge_feature_vector
        _, fd = merge_feature_vector(strings, self.conn_vocab,
                                     CONNECTIVE_FEATURE_FAMILIES)
        return self.conn_model.predict(fd) == 1

    def is_ps(self, strings) -> bool:
        from .discourse import ARGPOS_FEATURE_FAMILIES, merge_feature_vector
        _, fd = merge_feature_vector(strings, self.argpos_vocab,
                                     ARGPOS_FEATURE_FAMILIES)
        return self.argpos_model.predict(fd) == 1

    def ss_label(self, strings) -> int:
        """0 = neither, 1 = part of Arg1, 2 = part of Arg2."""
        from .discourse import SS_ARG_FEATURE_FAMILIES, merge_feature_vector
        _, fd = merge_feature_vector(strings, self.ss_vocab,
                                     SS_ARG_FEATURE_FAMILIES)
        return self.ss_model.predict(fd)

    def ps1_label(self, strings) -> int:
        """0 = remove clause from implicit Arg1, 1 = keep."""
        from .discourse import PS_ARG1_FEATURE_FAMILIES, merge_feature_vector
        _, fd = merge_feature_vector(strings, self.ps1_vocab,
                                     PS_ARG1_FEATURE_FAMILIES)
        return self.ps1_model.predict(fd)

    def ps2_label(self, strings) -> int:
        from .discourse import PS_ARG2_FEATURE_FAMILIES, merge_feature_vector
        _, fd = merge_feature_vector(strings, self.ps2_vocab,
                                     PS_ARG2_FEATURE_FAMILIES)
        return self.ps2_model.predict(fd)

    def sense(self, strings) -> str:
        from .discourse import EXPLICIT_FEATURE_FAMILIES, merge_feature_vector
        _, fd = merge_feature_vector(strings, self.explicit_vocab,
                                     EXPLICIT_FEATURE_FAMILIES)
        return SENSE_LABELS[self.explicit_model.predict(fd)]


_SINGLETON = None
_LOCK = threading.Lock()


def load_discourse_models() -> DiscourseModels:
    """Process-wide lazy singleton (zip-safe resource loading)."""
    global _SINGLETON
    if _SINGLETON is None:
        with _LOCK:
            if _SINGLETON is None:
                import io
                from importlib import resources

                pkg = resources.files("aser_spark.resources")
                npz = np.load(io.BytesIO(
                    (pkg / "discourse_models.npz").read_bytes()))
                vocab = json.loads(gzip.decompress(
                    (pkg / "discourse_vocab.json.gz").read_bytes()))
                _SINGLETON = DiscourseModels(npz, vocab)
    return _SINGLETON
