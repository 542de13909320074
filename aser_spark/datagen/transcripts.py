"""Deterministic synthetic multi-turn transcript corpus.

Schema per BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Design goals (FIXTURES.md §1):
* templated sentences guaranteed to exercise every ASER eventuality pattern
  and every seed connective, so extraction coverage is dense;
* a Zipfian hot-head pool ("i am hungry", ...) to exercise the salted
  aggregation path (head-eventuality skew is the known failure mode at
  10^12-turn scale, SURVEY.md §4);
* per-conversation determinism: row content depends only on (seed, conv_idx),
  so generation distributes embarrassingly via spark.range -> mapInPandas
  and any subset of conversations is reproducible.
"""

from __future__ import annotations

import datetime as _dt
import random

from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

_EPOCH = _dt.datetime(2025, 1, 1)

_PRON_SUBJ = ["i", "you", "he", "she", "we", "they"]
_NP_SUBJ = [
    ("the", "dog"), ("the", "cat"), ("my", "army"), ("the", "team"),
    ("our", "manager"), ("the", "server"), ("a", "bird"), ("the", "child"),
    ("his", "neighbor"), ("the", "engineer"), ("her", "friend"), ("the", "user"),
]
_NOUNS = [
    "boat", "report", "car", "house", "coffee", "letter", "song", "ticket",
    "book", "key", "answer", "plan", "message", "result", "door", "window",
    "cake", "guitar", "picture", "story", "file", "test", "bug", "query",
]
_ADJS = [
    "hungry", "happy", "tired", "smart", "ready", "busy", "angry", "calm",
    "proud", "broken", "clean", "warm", "cold", "suitable", "important",
]
_VI = ["barked", "slept", "worked", "smiled", "laughed", "danced", "waited", "crashed"]
_VI_BASE = ["leave", "sleep", "work", "dance", "wait", "sing", "help"]
_VT = ["found", "bought", "fixed", "wrote", "read", "liked", "opened", "closed", "reviewed", "merged"]
_VT_BASE = ["buy", "fix", "write", "read", "open", "close", "bring", "review"]
_VDI = ["gave", "sent", "showed", "told", "brought"]
_VDI_BASE = ["give", "send", "show", "bring"]
_VBN = ["shipped", "fixed", "merged", "reviewed", "closed", "tested", "deployed"]
_PREPS = ["in", "on", "at", "with", "from", "to", "by", "near"]
_PLACES = ["garden", "kitchen", "office", "school", "station", "store", "room", "city"]
# named entities — the parser's deterministic gazetteer tags these
# PERSON / CITY / ORGANIZATION and emits mention spans (F8 end-to-end)
_PERSON_NAMES = ["Alice", "Bob", "Carol", "Dave", "Erin", "Frank", "Grace", "Heidi"]
_CITY_NAMES = ["Paris", "London", "Tokyo", "Boston"]
_ORG_NAMES = ["Acme", "Globex", "Initech", "Acme Corp", "Globex Corp"]

# Zipf-weighted hot sentences — each canonicalizes to ONE head eventuality,
# creating the skewed keys the salted aggregation must absorb.
HOT_SENTENCES = [
    "i am hungry.",
    "i am tired.",
    "it is fine.",
    "we went home.",
    "he is happy.",
    "that is a problem.",
    "i found the answer.",
    "the test passed.",
    "the build failed.",
    "she was right.",
]
_ZIPF_S = 1.2


def _zipf_weights(n, s):
    w = [1.0 / (k ** s) for k in range(1, n + 1)]
    tot = sum(w)
    return [x / tot for x in w]


_HOT_W = _zipf_weights(len(HOT_SENTENCES), _ZIPF_S)


def _subject(rng):
    r = rng.random()
    if r < 0.12:
        return rng.choice(_PERSON_NAMES), True
    if r < 0.56:
        return rng.choice(_PRON_SUBJ), False
    det, noun = rng.choice(_NP_SUBJ)
    return f"{det} {noun}", True


def _np(rng):
    if rng.random() < 0.10:
        return rng.choice(_ORG_NAMES)
    return f"{rng.choice(['the', 'a', 'my', 'your', 'his', 'her', 'our'])} {rng.choice(_NOUNS)}"


def _pp(rng):
    if rng.random() < 0.22:
        return f"{rng.choice(_PREPS)} {rng.choice(_CITY_NAMES)}"
    return f"{rng.choice(_PREPS)} the {rng.choice(_PLACES)}"


def _simple_clause(rng):
    """One clause guaranteed to fire a specific eventuality pattern."""
    s, _ = _subject(rng)
    kind = rng.randrange(12)
    if kind == 0:      # s-v
        c = f"{s} {rng.choice(_VI)}"
        if rng.random() < 0.4:
            c += " " + rng.choice(["loudly", "quickly", "slowly", "again", "quietly"])
    elif kind == 1:    # s-v + PP
        c = f"{s} {rng.choice(_VI)} {_pp(rng)}"
    elif kind == 2:    # s-v-o
        c = f"{s} {rng.choice(_VT)} {_np(rng)}"
    elif kind == 3:    # s-v-o-o
        c = f"{s} {rng.choice(_VDI)} {rng.choice(['him', 'them', 'us', 'me'])} {_np(rng)}"
    elif kind == 4:    # s-be-a
        be = "was" if rng.random() < 0.5 else _be_for(s)
        c = f"{s} {be} {rng.choice(_ADJS)}"
    elif kind == 5:    # s-be-o
        c = f"{s} {_be_for(s)} a {rng.choice(['teacher', 'doctor', 'farmer', 'manager', 'lawyer'])}"
    elif kind == 6:    # s-v-v / s-v-v-o
        v = rng.choice(["wants", "wanted", "tried", "needs"])
        if rng.random() < 0.5:
            c = f"{s} {v} to {rng.choice(_VI_BASE)}"
        else:
            c = f"{s} {v} to {rng.choice(_VT_BASE)} {_np(rng)}"
    elif kind == 7:    # spass-v
        c = f"the {rng.choice(_NOUNS)} was {rng.choice(_VBN)}"
        if rng.random() < 0.4:
            c += f" by the {rng.choice(['team', 'engineer', 'manager', 'user'])}"
    elif kind == 8:    # there-be-o
        c = f"there {rng.choice(['is', 'was'])} a {rng.choice(['problem', 'bug', 'mistake', 'chance', 'meeting'])}"
    elif kind == 9:    # s-v-a (xcomp JJ)
        c = f"{s} {rng.choice(['felt', 'seemed', 'feels', 'seems'])} {rng.choice(_ADJS)}"
    elif kind == 10:   # s-v-be-a / s-v-o-be-a / s-v-be-o
        r = rng.random()
        if r < 0.3:
            c = f"{s} seems to be {rng.choice(_ADJS)}"
        elif r < 0.55:
            c = f"{s} considered {rng.choice(['him', 'them'])} to be {rng.choice(_ADJS)}"
        elif r < 0.8:
            c = f"{s} seems to be a {rng.choice(['teacher', 'doctor', 'farmer', 'manager'])}"
        else:  # s-v-o-be-o
            c = f"{s} considered {rng.choice(['him', 'them'])} to be a {rng.choice(['teacher', 'doctor', 'lawyer'])}"
    else:              # s-v-o-v-o / s-v-o-v-o-o / spass-v-o
        r = rng.random()
        if r < 0.5:
            c = f"{s} asked {rng.choice(['him', 'them', 'us'])} to {rng.choice(_VT_BASE)} {_np(rng)}"
        elif r < 0.8:
            c = f"{s} asked {rng.choice(['him', 'them'])} to {rng.choice(_VDI_BASE)} {rng.choice(['me', 'us'])} {_np(rng)}"
        elif r < 0.9:
            c = f"{s} was {rng.choice(['given', 'sent', 'shown'])} {_np(rng)}"
        else:  # spass-v-v-o
            c = f"{s} was asked to {rng.choice(_VT_BASE)} {_np(rng)}"
    return c


def _be_for(subj):
    if subj == "i":
        return "am"
    if subj in ("you", "we", "they"):
        return "are"
    return "is"


_INTRA_CONNECTIVES = ["because", "so", "if", "although", "unless", "before", "after", "until"]
_TURN_OPENERS = [
    "so", "then", "however", "but", "and", "meanwhile", "therefore", "also",
    "or", "except", "thus", "at the same time", "for example", "for instance",
    "in other words",
]


def _sentence(rng):
    r = rng.random()
    if r < 0.28:  # Zipfian hot head
        return rng.choices(HOT_SENTENCES, weights=_HOT_W)[0]
    if r < 0.55:  # compound with intra-sentence connective (advcl link)
        a = _simple_clause(rng)
        b = _simple_clause(rng)
        conn = rng.choice(_INTRA_CONNECTIVES)
        return f"{a} {conn} {b}."
    if r < 0.59:  # paired connective (D4 parallel path)
        pair = rng.choice((("either", "or"), ("if", "then")))
        return f"{pair[0]} {_simple_clause(rng)} {pair[1]} {_simple_clause(rng)}."
    if r < 0.63:  # comma parataxis (two clauses, no connective)
        return f"{_simple_clause(rng)}, {_simple_clause(rng)}."
    if r < 0.67:  # sentence-initial subordinator (PDTB arg swap path)
        conn = rng.choice(_INTRA_CONNECTIVES)
        return f"{conn} {_simple_clause(rng)}, {_simple_clause(rng)}."
    if r < 0.71:  # contraction + adjective-complement clause (ccomp)
        subj, be = rng.choice((("i", "'m"), ("you", "'re"), ("it", "'s"), ("we", "'re")))
        return f"{subj}{be} sure {_simple_clause(rng)}."
    return _simple_clause(rng) + "."


def gen_conversation_rows(seed: int, conv_idx: int):
    """All transcript rows for one conversation — pure function of
    (seed, conv_idx)."""
    rng = random.Random((seed << 20) ^ conv_idx)
    conv_id = f"conv-{seed}-{conv_idx:08d}"
    n_turns = rng.randint(4, 12)
    rows = []
    for t in range(n_turns):
        role = "user" if t % 2 == 0 else "assistant"
        tool = None
        if role == "assistant" and rng.random() < 0.12:
            role, tool = "tool", rng.choice(["search", "calculator", "browser"])
        n_sents = rng.randint(1, 3)
        sents = []
        for si in range(n_sents):
            sent = _sentence(rng)
            if si == 0 and t > 0 and rng.random() < 0.35:
                r = rng.random()
                if r < 0.88:
                    sent = f"{rng.choice(_TURN_OPENERS)} {sent}"
                else:  # ChosenAlternative: 'instead' after both eventualities
                    sent = sent[:-1] + " instead."
            sents.append(sent)
        rows.append((
            conv_id, t, role, " ".join(sents), tool,
            _EPOCH + _dt.timedelta(hours=conv_idx % 10000, minutes=t),
        ))
    return rows


def transcripts_df(spark, n_convs: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: spark.range over conversation ids ->
    mapInPandas row builder.  Scales linearly (no shuffle, no driver data)."""
    import pandas as pd

    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)

    def build(batches):
        for pdf in batches:
            out = []
            for conv_idx in pdf["id"]:
                out.extend(gen_conversation_rows(seed, int(conv_idx)))
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    return (
        spark.range(0, n_convs, numPartitions=partitions)
        .mapInPandas(build, schema=TRANSCRIPT_SCHEMA)
    )
