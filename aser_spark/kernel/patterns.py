"""ASER eventuality pattern programs, pre-compiled for the batch matcher.

The reference encodes 14 dependency-template rules as verbose
``EventualityRule`` objects with string-prefix opcodes parsed at match time
(/root/reference/aser/extract/rule.py:60-1563, matcher dispatch at
/root/reference/aser/extract/eventuality_extractor.py:467-509).  We instead
compile every rule once, at import, into flat opcode tuples over frozenset
label groups — the matcher then does set lookups only, no string parsing in
the hot loop.

Opcode semantics (faithful to the reference matcher, see extractor.py):

* ``BIND  (anchor, labels, var)``   — positive/possible: first/every edge
  ``(gov=bound[anchor], label in labels, dep)`` binds ``var`` to ``dep``.
  In positive position ``var`` must be unbound for singleton label groups
  (EXACT) while multi-label groups (ANY) overwrite — encoded via ``exact``.
* ``RBIND (anchor, label, var)``    — reversed edge: matches
  ``(gov, label, dep=bound[anchor])`` and binds ``var`` to ``gov`` (used by
  the copula rule ``s-be-a``: the adjective governs the verb).
* ``LEFTOVER (anchor, allowed)``    — negative: after selection, every
  *unselected* outgoing edge of ``bound[anchor]`` must carry a label inside
  ``allowed`` or the candidate is rejected (this is how e.g. a dangling
  ``dobj`` vetoes the bare ``s-v`` pattern).
* ``RVETO (anchor, label)``         — negative reversed edge: reject if any
  edge ``(gov, label, dep=bound[anchor])`` exists (vetoes xcomp chains whose
  verbs are themselves clausal complements).
"""

from __future__ import annotations

from typing import NamedTuple

# ---------------------------------------------------------------------------
# The 18 published pattern names, in the reference's canonical order
# (/root/reference/aser/extract/rule.py:39-58).  Four of them (s-v-a, s-be-o,
# s-v-be-o, s-v-o-be-o) have no rule program of their own: they are produced
# by POS-based relabeling of sibling patterns (extractor.relabel_by_pos).
# ---------------------------------------------------------------------------
EVENTUALITY_PATTERNS = (
    "s-v", "s-v-o", "s-v-a", "s-v-o-o", "s-be-a", "s-be-o", "s-v-be-a",
    "s-v-be-o", "s-v-v-o", "s-v-v", "spass-v", "s-v-o-v-o", "s-v-o-be-a",
    "s-v-o-be-o", "spass-v-v-o", "spass-v-o", "there-be-o", "s-v-o-v-o-o",
)

# Sentences containing clause-introducing words are skipped wholesale
# (/root/reference/aser/extract/rule.py:13-19, applied at
#  eventuality_extractor.py:360-362 via SeedRuleASERExtractor).
CLAUSE_SKIP_WORDS = frozenset(
    w for base in ("when", "who", "what", "where", "how", "why", "which")
    for w in (base, base.capitalize())
) | {"?"}

# --- opcodes ---------------------------------------------------------------
BIND, RBIND, LEFTOVER, RVETO = 0, 1, 2, 3


class Op(NamedTuple):
    kind: int
    anchor: str          # variable that must already be bound
    labels: frozenset    # dependency labels (singleton for exact ops)
    var: str             # variable bound on match ("" for checks)
    exact: bool          # True: bind only if var unbound; False: overwrite


def _g(spec: str) -> frozenset:
    return frozenset(spec.split())


# --- label groups (rule.py uses '/'-joined strings; we use frozensets) -----

# Prepositional/possessive modifier labels every core variable may expand
# into (rule.py's ubiquitous "+nmod:…" group, e.g. rule.py:74).
_MODS = _g(
    "nmod:near nmod:into nmod:for nmod:around nmod:with nmod:poss "
    "nmod:inside nmod:at nmod:outside_of nmod:than nmod:from nmod:in "
    "nmod:on nmod:to nmod:away_from amod:as nmod:down nmod:up nmod:tmod "
    "nmod:along nmod:over nmod:out_of nmod:of nmod:without nmod:by "
    "nmod:through nmod:about nmod:agent"
)
# noun-attachment decorations (determiners, adjectives, counts, ...)
_NOUN_DECOR = _g("acl amod neg nummod compound det nmod:poss mark det:qmod case")
_NOUN_DECOR_PRT = _NOUN_DECOR | {"compound:prt"}
# verb decorations (adverbs, negation, auxiliaries, particles)
_VERB_DECOR = _g("advmod neg aux compound:prt")
_VERB_DECOR_MARK = _VERB_DECOR | {"mark"}
_VERB_DECOR_PASS = _VERB_DECOR | {"auxpass"}
_VERB_DECOR_MARK_PASS = _VERB_DECOR_MARK | {"auxpass"}
_ADJ_DECOR = _g("acl advmod neg aux compound:prt det amod compound nmod:poss det:qmod case")
_ADJ_DECOR_SHORT = _g("acl advmod neg aux compound:prt")

# Labels allowed to dangle off a matched verb without vetoing the candidate:
# clause boundaries, punctuation, conjunction glue, and the adverbial-clause
# family (rule.py negative rules; the exact member set matters because any
# OTHER leftover label — dobj, iobj, xcomp, a second nsubj — is a veto).
_ADVCL_FAMILY = _g(
    "advcl:to advcl:though advcl:after advcl:if advcl:while advcl:as "
    "advcl:for advcl:in advcl:since advcl:from advcl:before advcl:because "
    "advcl:based_on advcl:with advcl:although advcl:by advcl:so advcl:at "
    "advcl:on advcl:upon advcl:until advcl:instead_of advcl:despite "
    "advcl:through advcl:unless advcl:in_order advcl:ago"
) | {'advcl:"s'}
_DANGLE_BASE = _g("ccomp parataxis conj:but advcl dep cc punct mark conj:and") | _ADVCL_FAMILY
_DANGLE_AUX = _DANGLE_BASE | {"aux"}                                   # s-v-o verb
_DANGLE_TMOD = _DANGLE_BASE | _g("nmod:tmod nmod:after")               # spass-v verb
_DANGLE_XSUBJ = _DANGLE_TMOD | {"nsubj:xsubj"}                         # xcomp-verb chains
_DANGLE_ADJ = _DANGLE_TMOD | _g("nmod:npmod nsubj:xsubj")              # s-be-a adjective
# rule.py:774's "-ccomp//nsubj:xsubj/..." splits to an empty-string member —
# kept verbatim for bit-faithful semantics (it can never match a real label).
_DANGLE_EMPTY = _DANGLE_BASE | {"", "nsubj:xsubj"}


def _bind(anchor: str, labels, var: str) -> Op:
    """Possible/positive bind op; singleton-label binds are 'exact'."""
    if isinstance(labels, str):
        return Op(BIND, anchor, frozenset((labels,)), var, True)
    return Op(BIND, anchor, labels, var, False)


def _mod_chain(*vars_: str) -> list[Op]:
    """The (X --mods--> XM --case--> XMP) optional expansion pair that
    rule.py repeats for every core variable (e.g. rule.py:71-98)."""
    ops: list[Op] = []
    for v in vars_:
        ops.append(_bind(v, _MODS, v + "M"))
        ops.append(_bind(v + "M", "case", v + "MP"))
    return ops


def _leftover(anchor: str, allowed: frozenset) -> Op:
    return Op(LEFTOVER, anchor, allowed, "", False)


def _rveto(anchor: str, label: str) -> Op:
    return Op(RVETO, anchor, frozenset((label,)), "", False)


class PatternProgram(NamedTuple):
    name: str
    positive: tuple      # Ops, all must match (greedy first-edge, in order)
    possible: tuple      # Ops, each selects every matching edge
    negative: tuple      # LEFTOVER / RVETO checks over unselected edges


def _prog(name, positive, possible, negative) -> PatternProgram:
    return PatternProgram(name, tuple(positive), tuple(possible), tuple(negative))


# ---------------------------------------------------------------------------
# The 14 rule programs.  Positive/possible/negative op ORDER is semantic
# (greedy matching + variable rebinding) and mirrors rule.py's insertion
# order exactly; see the dump-validation test in tests/test_kernel_oracle.py.
# ---------------------------------------------------------------------------
PATTERN_PROGRAMS: dict[str, PatternProgram] = {}

PATTERN_PROGRAMS["s-v"] = _prog(
    "s-v",
    [_bind("V1", "nsubj", "S1")],
    _mod_chain("V1", "S1") + [
        _bind("S1", _NOUN_DECOR_PRT, "NA1"),
        _bind("V1", _VERB_DECOR_MARK, "NA2"),
    ],
    [_leftover("V1", _DANGLE_BASE)],
)

PATTERN_PROGRAMS["s-v-o"] = _prog(
    "s-v-o",
    [_bind("V1", "nsubj", "S1"), _bind("V1", "dobj", "O1")],
    _mod_chain("V1", "S1", "O1") + [
        _bind("V1", _VERB_DECOR, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
        _bind("O1", _NOUN_DECOR, "NA"),
    ],
    [_leftover("V1", _DANGLE_AUX)],
)

PATTERN_PROGRAMS["s-v-o-o"] = _prog(
    "s-v-o-o",
    [_bind("V1", "nsubj", "S1"), _bind("V1", "dobj", "O1"), _bind("V1", "iobj", "O2")],
    _mod_chain("V1", "S1", "O1", "O2") + [
        _bind("S1", _NOUN_DECOR, "NA"),
        _bind("O1", _NOUN_DECOR, "NA"),
        _bind("O2", _NOUN_DECOR, "NA"),
        _bind("V1", _VERB_DECOR, "NA"),
    ],
    [_leftover("V1", _DANGLE_BASE)],
)

PATTERN_PROGRAMS["s-be-a"] = _prog(
    "s-be-a",
    # the adjective A1 governs the copula verb: reversed bind
    # (rule.py s-be-a positive: ("A1", "^cop", "V1") then ("A1","nsubj","S1"))
    [Op(RBIND, "V1", frozenset(("cop",)), "A1", True), _bind("A1", "nsubj", "S1")],
    _mod_chain("A1", "S1") + [
        _bind("A1", _ADJ_DECOR, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
    ],
    [_leftover("A1", _DANGLE_ADJ)],
)

PATTERN_PROGRAMS["s-v-be-a"] = _prog(
    "s-v-be-a",
    [_bind("V1", "nsubj", "S1"), _bind("V1", "xcomp", "A1"), _bind("A1", "cop", "V2")],
    _mod_chain("A1", "V1", "S1") + [
        _bind("V1", _VERB_DECOR_MARK, "NA"),
        _bind("A1", _NOUN_DECOR, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
    ],
    [_leftover("V1", _DANGLE_XSUBJ)],
)

PATTERN_PROGRAMS["s-v-v-o"] = _prog(
    "s-v-v-o",
    [_bind("V1", "nsubj", "S1"), _bind("V1", "xcomp", "V2"), _bind("V2", "dobj", "O1")],
    _mod_chain("O1", "S1", "V1", "V2") + [
        _bind("V1", _VERB_DECOR_MARK, "NA"),
        _bind("V2", _VERB_DECOR_MARK, "NA"),
        _bind("O1", _NOUN_DECOR, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
    ],
    [
        _leftover("V1", _DANGLE_XSUBJ),
        _leftover("V2", _DANGLE_XSUBJ),
        _rveto("V1", "ccomp"),
        _rveto("V2", "ccomp"),
    ],
)

PATTERN_PROGRAMS["s-v-v"] = _prog(
    "s-v-v",
    [_bind("V1", "nsubj", "S1"), _bind("V1", "xcomp", "V2")],
    _mod_chain("V2", "S1", "V1") + [
        _bind("V1", _VERB_DECOR_MARK, "NA"),
        _bind("V2", _VERB_DECOR_MARK, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
    ],
    [_leftover("V1", _DANGLE_XSUBJ), _leftover("V2", _DANGLE_XSUBJ)],
)

PATTERN_PROGRAMS["spass-v"] = _prog(
    "spass-v",
    [_bind("V1", "nsubjpass", "S1")],
    _mod_chain("V1", "S1") + [
        _bind("S1", _NOUN_DECOR, "NA"),
        _bind("V1", _VERB_DECOR_MARK_PASS, "NA"),
    ],
    [_leftover("V1", _DANGLE_TMOD)],
)

PATTERN_PROGRAMS["s-v-o-v-o"] = _prog(
    "s-v-o-v-o",
    [
        _bind("V1", "nsubj", "S1"), _bind("V1", "dobj", "O1"),
        _bind("V1", "xcomp", "V2"), _bind("V2", "dobj", "O2"),
    ],
    _mod_chain("S1", "V1", "V2", "O1", "O2") + [
        _bind("V1", _VERB_DECOR, "NA"),
        _bind("V2", _VERB_DECOR, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
        _bind("O1", _NOUN_DECOR, "NA"),
        _bind("O2", _NOUN_DECOR, "NA"),
    ],
    [_leftover("V1", _DANGLE_BASE), _leftover("V2", _DANGLE_EMPTY)],
)

PATTERN_PROGRAMS["s-v-o-be-a"] = _prog(
    "s-v-o-be-a",
    [
        _bind("V1", "nsubj", "S1"), _bind("V1", "dobj", "O1"),
        _bind("V1", "xcomp", "A1"), _bind("A1", "cop", "V2"),
    ],
    _mod_chain("S1", "V1", "V2", "O1", "O2", "A1") + [
        _bind("V1", _VERB_DECOR, "NA"),
        _bind("V2", _VERB_DECOR, "NA"),
        _bind("A1", _ADJ_DECOR_SHORT, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
        _bind("O1", _NOUN_DECOR, "NA"),
    ],
    [_leftover("V1", _DANGLE_BASE), _leftover("V2", _DANGLE_BASE)],
)

PATTERN_PROGRAMS["spass-v-v-o"] = _prog(
    "spass-v-v-o",
    [_bind("V1", "nsubjpass", "S1"), _bind("V1", "xcomp", "V2"), _bind("V2", "dobj", "O1")],
    _mod_chain("S1", "V1", "V2", "O1") + [
        _bind("V1", _VERB_DECOR_PASS, "NA"),
        _bind("V2", _VERB_DECOR, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
        _bind("O1", _NOUN_DECOR, "NA"),
    ],
    [_leftover("V1", _DANGLE_BASE), _leftover("V2", _DANGLE_BASE)],
)

PATTERN_PROGRAMS["spass-v-o"] = _prog(
    "spass-v-o",
    [_bind("V1", "nsubjpass", "S1"), _bind("V1", "dobj", "O1")],
    _mod_chain("S1", "V1", "O1") + [
        _bind("V1", _VERB_DECOR_PASS, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
        _bind("O1", _NOUN_DECOR, "NA"),
    ],
    [_leftover("V1", _DANGLE_BASE)],
)

PATTERN_PROGRAMS["there-be-o"] = _prog(
    "there-be-o",
    [_bind("V1", "nsubj", "S1"), _bind("V1", "expl", "ex1")],
    _mod_chain("S1", "V1") + [
        _bind("V1", _VERB_DECOR_PASS, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
    ],
    [_leftover("V1", _DANGLE_BASE)],
)

PATTERN_PROGRAMS["s-v-o-v-o-o"] = _prog(
    "s-v-o-v-o-o",
    [
        _bind("V1", "nsubj", "S1"), _bind("V1", "dobj", "O1"),
        _bind("V1", "xcomp", "V2"), _bind("V2", "dobj", "O2"), _bind("V2", "iobj", "O3"),
    ],
    _mod_chain("S1", "V1", "V2", "O1", "O2", "O3") + [
        _bind("V1", _VERB_DECOR, "NA"),
        _bind("V2", _VERB_DECOR, "NA"),
        _bind("S1", _NOUN_DECOR, "NA"),
        _bind("O1", _NOUN_DECOR, "NA"),
        _bind("O2", _NOUN_DECOR, "NA"),
        _bind("O3", _NOUN_DECOR, "NA"),
    ],
    [_leftover("V1", _DANGLE_BASE), _leftover("V2", _DANGLE_EMPTY)],
)
