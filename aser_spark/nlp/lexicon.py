"""Closed lexicon for the deterministic parser.

Word -> (POS, lemma) for every word the synthetic transcript generator can
emit, plus suffix fallbacks for out-of-vocabulary words.  Penn Treebank
tags, CoreNLP-style lemmas (e.g. your -> you) so that extracted eventuality
word lists look like the reference's published examples
(/root/reference/aser/extract/eventuality_extractor.py:184-193).
"""

from __future__ import annotations

# --- closed classes ---------------------------------------------------------

PRONOUNS = {
    "i": ("PRP", "i"), "you": ("PRP", "you"), "he": ("PRP", "he"),
    "she": ("PRP", "she"), "it": ("PRP", "it"), "we": ("PRP", "we"),
    "they": ("PRP", "they"), "me": ("PRP", "i"), "him": ("PRP", "he"),
    "her_prp": ("PRP", "she"), "us": ("PRP", "we"), "them": ("PRP", "they"),
}

POSSESSIVES = {
    "my": ("PRP$", "my"), "your": ("PRP$", "you"), "his": ("PRP$", "he"),
    "her": ("PRP$", "she"), "our": ("PRP$", "we"), "their": ("PRP$", "they"),
    "its": ("PRP$", "its"),
}

DETERMINERS = {w: ("DT", w) for w in ("the", "a", "an", "this", "every", "some", "no", "each", "another")}
DETERMINERS["that_dt"] = ("DT", "that")

# BE paradigm — lemma 'be' throughout (CoreNLP convention)
BE_FORMS = {
    "be": "VB", "am": "VBP", "is": "VBZ", "are": "VBP", "was": "VBD",
    "were": "VBD", "been": "VBN", "being": "VBG", "'m": "VBP", "'s": "VBZ",
    "'re": "VBP",
}

MODALS = {w: ("MD", w) for w in ("will", "would", "can", "could", "should", "must", "may", "might", "shall")}
MODALS["'ll"] = ("MD", "will")
MODALS["'d"] = ("MD", "would")

# have/do auxiliaries (also usable as main verbs)
AUX_VERBS = {
    "'ve": ("VBP", "have"),
    "have": ("VBP", "have"), "has": ("VBZ", "have"), "had": ("VBD", "have"),
    "do": ("VBP", "do"), "does": ("VBZ", "do"), "did": ("VBD", "do"),
}

PREPOSITIONS = frozenset(
    "in on at with from to of by for into over about through near around "
    "without along inside down up except".split()
)

# subordinating conjunctions -> advcl:<lemma> clause links
# (wh-subordinators like 'when' are tagged IN here — our grammar treats them
# uniformly; CoreNLP would say WRB, but the clause machinery is identical)
SUBORDINATORS = frozenset(
    "because if although unless before after until while since so "
    "when whenever where once whereas though as lest till that".split()
)

COORDINATORS = frozenset(("and", "but", "or", "nor"))

ADVERBS = frozenset(
    "loudly quickly slowly carefully quietly badly early late again often "
    "always never now here there_rb soon together well instead however "
    "meanwhile therefore thus then also too yesterday tomorrow first "
    "alone everywhere "
    # explicit-connective adverbials (PDTB inventory) the fallback would
    # otherwise misread as nouns
    "accordingly additionally afterward alternatively besides consequently "
    "conversely earlier else finally further furthermore hence indeed "
    "later likewise moreover nevertheless next nonetheless otherwise "
    "overall previously rather regardless separately similarly "
    "simultaneously specifically still thereafter thereby ultimately "
    "yet plus".split()
)

ADJECTIVES = frozenset(
    "hungry happy tired smart suitable ready busy green red blue large "
    "small slow fast important correct broken quiet angry warm cold clean "
    "dirty empty full new old young strong weak rich poor safe easy hard "
    "late_jj early_jj cheap expensive fresh heavy light dark bright calm "
    "proud brave sure same other available stable flaky deterministic "
    "careful helpful useful nice good bad fine great free right wrong".split()
)

NOUNS = frozenset(
    "dog cat bird horse army boat order problem report car house coffee "
    "meeting server file test bug user answer question plan team "
    "accommodation teacher engineer manager idea book garden kitchen song "
    "letter door window table chair road river city town child friend "
    "neighbor doctor lawyer farmer story movie game dinner breakfast lunch "
    "money ticket key phone computer message email result deploy pipeline "
    "cluster dataset model graph node edge query index time way day night "
    "morning week year man woman boy girl people example instance word "
    "words fire water tree flower rain snow sun moon store school office "
    "hospital station airport train bus bike guitar piano picture wall "
    "floor roof room bed sofa lamp clock watch shoe shirt coat hat bag box "
    "cup plate knife fork spoon bottle glass bread cheese apple banana "
    "orange cake soup meat fish rice salt sugar milk tea juice beer wine "
    "mistake chance reason home weekend evening afternoon".split()
)

# verb paradigms: lemma -> (VB, VBZ, VBD, VBN, VBG)
_V = {
    "bark": ("bark", "barks", "barked", "barked", "barking"),
    "find": ("find", "finds", "found", "found", "finding"),
    "want": ("want", "wants", "wanted", "wanted", "wanting"),
    "leave": ("leave", "leaves", "left", "left", "leaving"),
    "buy": ("buy", "buys", "bought", "bought", "buying"),
    "bring": ("bring", "brings", "brought", "brought", "bringing"),
    "ask": ("ask", "asks", "asked", "asked", "asking"),
    "consider": ("consider", "considers", "considered", "considered", "considering"),
    "seem": ("seem", "seems", "seemed", "seemed", "seeming"),
    "feel": ("feel", "feels", "felt", "felt", "feeling"),
    "ship": ("ship", "ships", "shipped", "shipped", "shipping"),
    "send": ("send", "sends", "sent", "sent", "sending"),
    "give": ("give", "gives", "gave", "given", "giving"),
    "show": ("show", "shows", "showed", "shown", "showing"),
    "tell": ("tell", "tells", "told", "told", "telling"),
    "make": ("make", "makes", "made", "made", "making"),
    "run": ("run", "runs", "ran", "run", "running"),
    "fix": ("fix", "fixes", "fixed", "fixed", "fixing"),
    "write": ("write", "writes", "wrote", "written", "writing"),
    "read": ("read", "reads", "read", "read", "reading"),
    "eat": ("eat", "eats", "ate", "eaten", "eating"),
    "drink": ("drink", "drinks", "drank", "drunk", "drinking"),
    "like": ("like", "likes", "liked", "liked", "liking"),
    "need": ("need", "needs", "needed", "needed", "needing"),
    "see": ("see", "sees", "saw", "seen", "seeing"),
    "go": ("go", "goes", "went", "gone", "going"),
    "come": ("come", "comes", "came", "come", "coming"),
    "work": ("work", "works", "worked", "worked", "working"),
    "sleep": ("sleep", "sleeps", "slept", "slept", "sleeping"),
    "play": ("play", "plays", "played", "played", "playing"),
    "open": ("open", "opens", "opened", "opened", "opening"),
    "close": ("close", "closes", "closed", "closed", "closing"),
    "start": ("start", "starts", "started", "started", "starting"),
    "stop": ("stop", "stops", "stopped", "stopped", "stopping"),
    "deploy": ("deploy", "deploys", "deployed", "deployed", "deploying"),
    "test": ("test", "tests", "tested", "tested", "testing"),
    "stay": ("stay", "stays", "stayed", "stayed", "staying"),
    "rain": ("rain", "rains", "rained", "rained", "raining"),
    "win": ("win", "wins", "won", "won", "winning"),
    "lose": ("lose", "loses", "lost", "lost", "losing"),
    "help": ("help", "helps", "helped", "helped", "helping"),
    "call": ("call", "calls", "called", "called", "calling"),
    "wait": ("wait", "waits", "waited", "waited", "waiting"),
    "cook": ("cook", "cooks", "cooked", "cooked", "cooking"),
    "sing": ("sing", "sings", "sang", "sung", "singing"),
    "dance": ("dance", "dances", "danced", "danced", "dancing"),
    "walk": ("walk", "walks", "walked", "walked", "walking"),
    "drive": ("drive", "drives", "drove", "driven", "driving"),
    "smile": ("smile", "smiles", "smiled", "smiled", "smiling"),
    "laugh": ("laugh", "laughs", "laughed", "laughed", "laughing"),
    "cry": ("cry", "cries", "cried", "cried", "crying"),
    "try": ("try", "tries", "tried", "tried", "trying"),
    "learn": ("learn", "learns", "learned", "learned", "learning"),
    "teach": ("teach", "teaches", "taught", "taught", "teaching"),
    "build": ("build", "builds", "built", "built", "building"),
    "break": ("break", "breaks", "broke", "broken", "breaking"),
    "grow": ("grow", "grows", "grew", "grown", "growing"),
    "fall": ("fall", "falls", "fell", "fallen", "falling"),
    "rise": ("rise", "rises", "rose", "risen", "rising"),
    "pass": ("pass", "passes", "passed", "passed", "passing"),
    "fail": ("fail", "fails", "failed", "failed", "failing"),
    "merge": ("merge", "merges", "merged", "merged", "merging"),
    "review": ("review", "reviews", "reviewed", "reviewed", "reviewing"),
    "restart": ("restart", "restarts", "restarted", "restarted", "restarting"),
    "crash": ("crash", "crashes", "crashed", "crashed", "crashing"),
    "say": ("say", "says", "said", "said", "saying"),
    "think": ("think", "thinks", "thought", "thought", "thinking"),
    "know": ("know", "knows", "knew", "known", "knowing"),
    "take": ("take", "takes", "took", "taken", "taking"),
    "hold": ("hold", "holds", "held", "held", "holding"),
    "mean": ("mean", "means", "meant", "meant", "meaning"),
    "keep": ("keep", "keeps", "kept", "kept", "keeping"),
    "become": ("become", "becomes", "became", "become", "becoming"),
    "hear": ("hear", "hears", "heard", "heard", "hearing"),
    # NB: no "meet" entry — "meeting" is a corpus NOUN and lookup checks
    # VERB_FORMS before NOUNS
    "pay": ("pay", "pays", "paid", "paid", "paying"),
    "spend": ("spend", "spends", "spent", "spent", "spending"),
    "stand": ("stand", "stands", "stood", "stood", "standing"),
}

# word -> (tag, lemma) for every inflected verb form
VERB_FORMS: dict[str, tuple] = {}
for lemma, (vb, vbz, vbd, vbn, vbg) in _V.items():
    VERB_FORMS.setdefault(vb, ("VB", lemma))
    VERB_FORMS[vbz] = ("VBZ", lemma)
    VERB_FORMS.setdefault(vbd, ("VBD", lemma))
    if vbn != vbd:
        VERB_FORMS[vbn] = ("VBN", lemma)
    VERB_FORMS[vbg] = ("VBG", lemma)
# ambiguous VBD/VBN forms keep VBD; the parser upgrades ANY VBD to VBN
# after a be/have auxiliary (parser._retag), covering out-of-vocabulary
# regular "-ed" verbs too

IRREGULAR_NOUN_PLURALS = {
    "people": "people", "children": "child", "men": "man", "women": "woman",
    "feet": "foot", "mice": "mouse", "teeth": "tooth",
}


def lookup(token: str):
    """(tag, lemma) for one token, or None if out-of-vocabulary."""
    w = token.lower()
    if w in BE_FORMS:
        return (BE_FORMS[w], "be")
    if w in MODALS:
        return MODALS[w]
    if w in AUX_VERBS:
        return AUX_VERBS[w]
    if w == "not" or w == "n't":
        return ("RB", "not")
    if w == "to":
        return ("TO", "to")
    if w == "there":
        return ("EX", "there")
    if w == "her":
        return POSSESSIVES["her"]  # PRP$ reading; parser may demote to PRP
    if w in PRONOUNS:
        return PRONOUNS[w]
    if w in POSSESSIVES:
        return POSSESSIVES[w]
    if w in DETERMINERS:
        return DETERMINERS[w]
    if w == "that":
        return ("IN", "that")
    if w in COORDINATORS:
        return ("CC", w)
    if w in SUBORDINATORS:
        if w == "so":
            return ("IN", "so")
        return ("IN", w)
    if w in PREPOSITIONS:
        return ("IN", w)
    if w in ADVERBS:
        return ("RB", w)
    if w in ADJECTIVES:
        return ("JJ", w)
    if w in VERB_FORMS:
        return VERB_FORMS[w]
    if w in IRREGULAR_NOUN_PLURALS:
        return ("NNS", IRREGULAR_NOUN_PLURALS[w])
    if w in NOUNS:
        return ("NN", w)
    return None


def fallback(token: str):
    """Suffix-heuristic tag/lemma for out-of-vocabulary tokens."""
    w = token.lower()
    if w in (".", "!", "?", ";"):
        return (".", w)
    if w in (",", ":"):
        return (w, w)
    if not w or not any(c.isalpha() for c in w):
        if w and all(c.isdigit() or c in ".," for c in w):
            return ("CD", w)
        return (".", w)  # other symbols
    if w.endswith("ly"):
        return ("RB", w)
    if w.endswith("ing"):
        return ("VBG", w[:-3])
    if w.endswith("ed"):
        return ("VBD", w[:-2])
    if w.endswith("ies") and len(w) > 4:
        return ("NNS", w[:-3] + "y")
    if w.endswith("es") and len(w) > 3:
        return ("NNS", w[:-2])
    if w.endswith("s") and len(w) > 2:
        return ("NNS", w[:-1])
    if token[0].isupper():
        return ("NNP", w)
    return ("NN", w)


def tag_and_lemma(token: str):
    hit = lookup(token)
    return hit if hit is not None else fallback(token)
