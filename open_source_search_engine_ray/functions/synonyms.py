"""Query-side synonym / word-variation expansion tables.

The reference treats synonyms as core relevance: STO dictionaries +
Wiktionary-derived tables (``Synonyms.cpp:53-140``, ``sto/``), generated
word variations (``word_variations/WordVariations.cpp`` — noun
singular/plural, verb-form and spelling variations, generated partly by
rule and partly by lexicon lookup), possessive strip
(``XmlDoc_Indexing.cpp:1973-2018``), and number variants — its system test
asserts ``'the one'`` expands to ``['the one', 'the', 'one', '1']``
(``test/system/test_search_terms.py:4-18``), all weighted
``synonymWeight = 0.9`` (``Parms.cpp:3879-3886``).

The STO dictionaries are CC-licensed data files this repo does not ship
(no network in the build environment); this module instead implements the
reference's *generative* mechanism (``WordVariationGenerator``) in full
for English, so the effective table is rule-generated and unbounded:

1. number-word ↔ digit variants (both directions, 0-20 + tens + scales);
2. irregular English noun plurals and verb forms (≈270 lemmas — standard
   public-knowledge linguistic facts, typed from grammar, no imported
   data; every form of a lemma expands to the others);
3. regular inflection by rule, both directions: noun -s/-es/-ies/-ves,
   verb -s/-ed/-ing with e-drop and consonant doubling, possessive
   strip, apostrophe-less contractions;
4. British ↔ American spelling by suffix rule (-ise/-ize, -isation/
   -ization, -our/-or, -re/-er, -ogue/-og, -ae-/-oe- simplification,
   single/double-l) plus specific public word pairs;
5. a small curated synonym-set table (the STO-payload stand-in).

**Licensing**: everything here is rule code plus short factual lists of
irregular English forms — facts of the language, not a copied database;
no third-party dictionary is embedded.

``DEFAULT_SYNONYMS`` is a dict-like object usable directly as the
``synonyms=`` argument of ``parse_query`` / ``IndexSearcher.search`` /
``OracleIndex.search``: lookups generate variants on the fly, so the
"table" needs no corpus-sized storage.  Over-generated variants that are
not real words are harmless by construction — they have df=0 in the index
and contribute nothing — but each costs a posting lookup, so expansion is
capped at ``MAX_VARIANTS`` per token.  Expansion semantics (OR-unit of
{base, variants}, weight 0.9, base term's requiredness transfers to the
unit) live in ``query/parse.py``.
"""

from __future__ import annotations

MAX_VARIANTS = 8

NUMBER_WORDS = {
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "ten": "10", "eleven": "11", "twelve": "12", "thirteen": "13",
    "fourteen": "14", "fifteen": "15", "sixteen": "16", "seventeen": "17",
    "eighteen": "18", "nineteen": "19", "twenty": "20", "thirty": "30",
    "forty": "40", "fifty": "50", "sixty": "60", "seventy": "70",
    "eighty": "80", "ninety": "90", "hundred": "100", "thousand": "1000",
    "million": "1000000", "billion": "1000000000",
}
DIGIT_WORDS = {v: k for k, v in NUMBER_WORDS.items()}

# curated sets: every member expands to the others (the STO-payload
# stand-in — ordinary public-knowledge English synonym groups)
SYNONYM_SETS: list[list[str]] = [
    ["fast", "quick", "rapid", "speedy"],
    ["big", "large", "huge"],
    ["small", "little", "tiny"],
    ["car", "auto", "automobile"],
    ["begin", "start", "commence"],
    ["end", "finish", "conclude"],
    ["buy", "purchase"],
    ["sick", "ill"],
    ["smart", "intelligent", "clever"],
    ["happy", "glad", "joyful"],
    ["sad", "unhappy"],
    ["road", "street"],
    ["movie", "film"],
    ["picture", "photo", "image"],
    ["error", "mistake", "fault"],
    ["fix", "repair", "mend"],
    ["test", "check", "verify"],
    ["delete", "remove", "erase"],
    ["search", "find", "lookup"],
    ["build", "construct", "assemble"],
]
_SET_INDEX: dict[str, list[str]] = {}
for _s in SYNONYM_SETS:
    for _w in _s:
        _SET_INDEX[_w] = [x for x in _s if x != _w]

# --- irregular morphology (public-knowledge English grammar facts) ---------

IRREGULAR_NOUNS: dict[str, str] = {
    "man": "men", "woman": "women", "child": "children", "person": "people",
    "foot": "feet", "tooth": "teeth", "goose": "geese", "mouse": "mice",
    "louse": "lice", "ox": "oxen", "die": "dice", "penny": "pence",
    "criterion": "criteria", "phenomenon": "phenomena", "datum": "data",
    "medium": "media", "memorandum": "memoranda", "curriculum": "curricula",
    "bacterium": "bacteria", "stratum": "strata", "addendum": "addenda",
    "erratum": "errata", "analysis": "analyses", "basis": "bases",
    "crisis": "crises", "thesis": "theses", "hypothesis": "hypotheses",
    "diagnosis": "diagnoses", "oasis": "oases", "axis": "axes",
    "parenthesis": "parentheses", "synthesis": "syntheses",
    "synopsis": "synopses", "ellipsis": "ellipses", "emphasis": "emphases",
    "appendix": "appendices", "index": "indices", "matrix": "matrices",
    "vertex": "vertices", "vortex": "vortices", "apex": "apices",
    "radius": "radii", "alumnus": "alumni", "focus": "foci",
    "fungus": "fungi", "nucleus": "nuclei", "stimulus": "stimuli",
    "syllabus": "syllabi", "cactus": "cacti", "locus": "loci",
    "genus": "genera", "corpus": "corpora", "opus": "opera",
    "larva": "larvae", "alga": "algae", "antenna": "antennae",
    "formula": "formulae", "nebula": "nebulae", "vertebra": "vertebrae",
    "alumna": "alumnae", "schema": "schemata", "stigma": "stigmata",
    "automaton": "automata", "leaf": "leaves", "loaf": "loaves",
    "calf": "calves", "half": "halves", "knife": "knives",
    "life": "lives", "wife": "wives", "shelf": "shelves",
    "thief": "thieves", "wolf": "wolves", "elf": "elves",
    "scarf": "scarves", "hoof": "hooves", "dwarf": "dwarves",
    "echo": "echoes", "hero": "heroes", "potato": "potatoes",
    "tomato": "tomatoes", "torpedo": "torpedoes", "veto": "vetoes",
    "cargo": "cargoes", "embargo": "embargoes", "mosquito": "mosquitoes",
    "quiz": "quizzes",
}
_PLURAL_TO_SING = {v: k for k, v in IRREGULAR_NOUNS.items()}

# unchanging plurals — never add/strip s
UNCOUNTABLE = frozenset([
    "sheep", "deer", "fish", "moose", "series", "species", "aircraft",
    "news", "mathematics", "physics", "economics", "measles", "swine",
    "salmon", "trout", "bison", "corps", "means", "offspring", "shrimp",
])

# base: (past, participle); forms where past == participle repeat it
IRREGULAR_VERBS: dict[str, tuple[str, str]] = {
    "be": ("was", "been"), "have": ("had", "had"), "do": ("did", "done"),
    "say": ("said", "said"), "go": ("went", "gone"), "get": ("got", "gotten"),
    "make": ("made", "made"), "know": ("knew", "known"),
    "think": ("thought", "thought"), "take": ("took", "taken"),
    "see": ("saw", "seen"), "come": ("came", "come"),
    "want": ("wanted", "wanted"), "find": ("found", "found"),
    "give": ("gave", "given"), "tell": ("told", "told"),
    "run": ("ran", "run"), "keep": ("kept", "kept"),
    "hold": ("held", "held"), "write": ("wrote", "written"),
    "stand": ("stood", "stood"), "hear": ("heard", "heard"),
    "let": ("let", "let"), "mean": ("meant", "meant"),
    "set": ("set", "set"), "meet": ("met", "met"), "pay": ("paid", "paid"),
    "sit": ("sat", "sat"), "speak": ("spoke", "spoken"),
    "lie": ("lay", "lain"), "lead": ("led", "led"),
    "read": ("read", "read"), "grow": ("grew", "grown"),
    "lose": ("lost", "lost"), "fall": ("fell", "fallen"),
    "send": ("sent", "sent"), "build": ("built", "built"),
    "understand": ("understood", "understood"), "draw": ("drew", "drawn"),
    "break": ("broke", "broken"), "spend": ("spent", "spent"),
    "cut": ("cut", "cut"), "rise": ("rose", "risen"),
    "drive": ("drove", "driven"), "buy": ("bought", "bought"),
    "wear": ("wore", "worn"), "choose": ("chose", "chosen"),
    "seek": ("sought", "sought"), "throw": ("threw", "thrown"),
    "catch": ("caught", "caught"), "deal": ("dealt", "dealt"),
    "win": ("won", "won"), "forget": ("forgot", "forgotten"),
    "lay": ("laid", "laid"), "sell": ("sold", "sold"),
    "fight": ("fought", "fought"), "bear": ("bore", "borne"),
    "teach": ("taught", "taught"), "eat": ("ate", "eaten"),
    "sing": ("sang", "sung"), "strike": ("struck", "struck"),
    "hang": ("hung", "hung"), "shake": ("shook", "shaken"),
    "ride": ("rode", "ridden"), "feed": ("fed", "fed"),
    "shoot": ("shot", "shot"), "fly": ("flew", "flown"),
    "beat": ("beat", "beaten"), "drink": ("drank", "drunk"),
    "hide": ("hid", "hidden"), "bring": ("brought", "brought"),
    "begin": ("began", "begun"), "become": ("became", "become"),
    "leave": ("left", "left"), "feel": ("felt", "felt"),
    "put": ("put", "put"), "show": ("showed", "shown"),
    "sleep": ("slept", "slept"), "steal": ("stole", "stolen"),
    "swim": ("swam", "swum"), "swear": ("swore", "sworn"),
    "swing": ("swung", "swung"), "tear": ("tore", "torn"),
    "wake": ("woke", "woken"), "weave": ("wove", "woven"),
    "freeze": ("froze", "frozen"), "blow": ("blew", "blown"),
    "bend": ("bent", "bent"), "bind": ("bound", "bound"),
    "bite": ("bit", "bitten"), "bleed": ("bled", "bled"),
    "burst": ("burst", "burst"), "cast": ("cast", "cast"),
    "cling": ("clung", "clung"), "creep": ("crept", "crept"),
    "dig": ("dug", "dug"), "dream": ("dreamt", "dreamt"),
    "feed": ("fed", "fed"), "flee": ("fled", "fled"),
    "fling": ("flung", "flung"), "forbid": ("forbade", "forbidden"),
    "forgive": ("forgave", "forgiven"), "grind": ("ground", "ground"),
    "kneel": ("knelt", "knelt"), "lend": ("lent", "lent"),
    "light": ("lit", "lit"), "quit": ("quit", "quit"),
    "ring": ("rang", "rung"), "shed": ("shed", "shed"),
    "shine": ("shone", "shone"), "shrink": ("shrank", "shrunk"),
    "shut": ("shut", "shut"), "sink": ("sank", "sunk"),
    "slide": ("slid", "slid"), "sow": ("sowed", "sown"),
    "spin": ("spun", "spun"), "spit": ("spat", "spat"),
    "split": ("split", "split"), "spread": ("spread", "spread"),
    "spring": ("sprang", "sprung"), "stick": ("stuck", "stuck"),
    "sting": ("stung", "stung"), "stink": ("stank", "stunk"),
    "strive": ("strove", "striven"), "sweep": ("swept", "swept"),
    "tread": ("trod", "trodden"), "weep": ("wept", "wept"),
    "wind": ("wound", "wound"), "withdraw": ("withdrew", "withdrawn"),
    "wring": ("wrung", "wrung"), "arise": ("arose", "arisen"),
    "awake": ("awoke", "awoken"), "bet": ("bet", "bet"),
    "burn": ("burnt", "burnt"), "cost": ("cost", "cost"),
    "hit": ("hit", "hit"), "hurt": ("hurt", "hurt"),
    "learn": ("learnt", "learnt"), "prove": ("proved", "proven"),
    "smell": ("smelt", "smelt"), "spell": ("spelt", "spelt"),
    "spill": ("spilt", "spilt"), "spoil": ("spoilt", "spoilt"),
}
# every irregular form → the other forms of its lemma
_VERB_FORMS: dict[str, list[str]] = {}
for _b, (_p, _pp) in IRREGULAR_VERBS.items():
    _forms = list(dict.fromkeys([_b, _p, _pp]))
    for _f in _forms:
        _VERB_FORMS.setdefault(_f, [])
        for _o in _forms:
            if _o != _f and _o not in _VERB_FORMS[_f]:
                _VERB_FORMS[_f].append(_o)

# --- British ↔ American spelling -------------------------------------------

# specific public word pairs first (rule exceptions included)
UK_US_PAIRS: list[tuple[str, str]] = [
    ("grey", "gray"), ("tyre", "tire"), ("kerb", "curb"),
    ("cheque", "check"), ("draught", "draft"), ("plough", "plow"),
    ("mould", "mold"), ("moult", "molt"), ("smoulder", "smolder"),
    ("sceptic", "skeptic"), ("sceptical", "skeptical"),
    ("aluminium", "aluminum"), ("aeroplane", "airplane"),
    ("maths", "math"), ("pyjamas", "pajamas"), ("whisky", "whiskey"),
    ("jewellery", "jewelry"), ("programme", "program"),
    ("storey", "story"), ("gaol", "jail"), ("annexe", "annex"),
    ("artefact", "artifact"), ("behove", "behoove"),
    ("cosy", "cozy"), ("doughnut", "donut"), ("furore", "furor"),
    ("liquorice", "licorice"), ("mollusc", "mollusk"),
    ("omelette", "omelet"), ("speciality", "specialty"),
    ("manoeuvre", "maneuver"), ("oesophagus", "esophagus"),
    ("anaemia", "anemia"), ("anaesthesia", "anesthesia"),
    ("encyclopaedia", "encyclopedia"), ("mediaeval", "medieval"),
    ("paediatric", "pediatric"), ("archaeology", "archeology"),
    ("foetus", "fetus"), ("oestrogen", "estrogen"),
    ("diarrhoea", "diarrhea"), ("leukaemia", "leukemia"),
]
_UK_US: dict[str, str] = {}
for _a, _b2 in UK_US_PAIRS:
    _UK_US[_a] = _b2
    _UK_US[_b2] = _a

# suffix rules applied both directions: (uk_suffix, us_suffix)
_UK_US_SUFFIX: list[tuple[str, str]] = [
    ("isation", "ization"), ("isations", "izations"),
    ("ise", "ize"), ("ised", "ized"), ("ises", "izes"), ("ising", "izing"),
    ("yse", "yze"), ("ysed", "yzed"), ("yses", "yzes"), ("ysing", "yzing"),
    ("our", "or"), ("ours", "ors"), ("ourite", "orite"),
    ("ourites", "orites"), ("ourful", "orful"), ("ouring", "oring"),
    ("oured", "ored"),
    ("tre", "ter"), ("tres", "ters"),
    ("logue", "log"), ("logues", "logs"),
    ("lled", "led"), ("lling", "ling"), ("ller", "ler"), ("llers", "lers"),
]
# words where -our/-or etc. must NOT convert (rule exceptions)
_UK_US_BLOCK = frozenset([
    "four", "your", "hour", "sour", "tour", "pour", "flour", "dour",
    "velour", "amour", "our", "ours", "hours", "tours", "doctor",
    "error", "mirror", "actor", "motor", "tailor", "sailor", "mayor",
])


def _spelling_variants(low: str) -> list[str]:
    out: list[str] = []
    if low in _UK_US:
        out.append(_UK_US[low])
    if low in _UK_US_BLOCK:
        return out
    for a, b in _UK_US_SUFFIX:
        if low.endswith(a) and len(low) > len(a) + 1:
            out.append(low[:-len(a)] + b)
        elif low.endswith(b) and len(low) > len(b) + 1:
            out.append(low[:-len(b)] + a)
    return out


# --- regular inflection rules ----------------------------------------------

_VOWELS = "aeiou"


def _pluralize(low: str) -> list[str]:
    if low in IRREGULAR_NOUNS:
        return [IRREGULAR_NOUNS[low]]
    if low in UNCOUNTABLE or low in _PLURAL_TO_SING:
        return []
    if low.endswith(("s", "x", "z", "ch", "sh")):
        return [low + "es"]
    if low.endswith("o"):
        return [low + "es", low + "s"]    # -o plurals vary; df=0 is free
    if low.endswith("y") and len(low) > 2 and low[-2] not in _VOWELS:
        return [low[:-1] + "ies"]
    return [low + "s"]


def _singularize(low: str) -> list[str]:
    if low in _PLURAL_TO_SING:
        return [_PLURAL_TO_SING[low]]
    if low in UNCOUNTABLE:
        return []
    out: list[str] = []
    if low.endswith("ies") and len(low) > 4:
        out.append(low[:-3] + "y")
    elif low.endswith("ves") and len(low) > 4:
        out.append(low[:-3] + "f")
        out.append(low[:-3] + "fe")
    elif low.endswith("es") and len(low) > 3:
        if low.endswith(("ses", "xes", "zes", "ches", "shes")):
            out.append(low[:-2])
        else:
            out.append(low[:-1])        # e.g. "tables" -> "table"
    elif low.endswith("s") and len(low) > 3 and not low.endswith("ss"):
        out.append(low[:-1])
    return out


def _verb_variants(low: str) -> list[str]:
    """Regular verb-form generation + stripping (rule direction both
    ways); irregulars come from the table and suppress the bogus regular
    forms (``went`` must not yield ``wented``), while irregular BASES
    still take the regular -ing/-s path (``run`` → ``running``)."""
    out = list(_VERB_FORMS.get(low, ()))
    n = len(low)
    irr_base = low in IRREGULAR_VERBS
    irr_form = low in _VERB_FORMS and not irr_base  # past/participle
    # generate inflected forms from a plausible base
    if low.isalpha() and n >= 2 and not irr_form \
            and low not in _PLURAL_TO_SING:
        if low.endswith("e") and not low.endswith(("ee", "ye", "oe")):
            out.append(low[:-1] + "ing")                  # make→making
            if not irr_base:
                out.append(low + "d")
        elif low.endswith("y") and low[-2:-1] not in _VOWELS:
            out.append(low + "ing")                       # try→trying
            if not irr_base:
                out.append(low[:-1] + "ied")
        else:
            out.append(low + "ing")
            if not irr_base:
                out.append(low + "ed")
            # CVC doubling (stop→stopped) — generate both; fake forms
            # have df=0 and cost one lookup
            if (n >= 3 and low[-1] not in _VOWELS + "wxy"
                    and low[-2] in _VOWELS and low[-3] not in _VOWELS):
                out.append(low + low[-1] + "ing")
                if not irr_base:
                    out.append(low + low[-1] + "ed")
    # strip inflections back to base candidates
    if irr_form:
        return out
    if low.endswith("ing") and n > 5:
        stem = low[:-3]
        out.append(stem)                                  # walking→walk
        out.append(stem + "e")                            # making→make
        if len(stem) >= 2 and stem[-1] == stem[-2]:
            out.append(stem[:-1])                         # running→run
    elif low.endswith("ied") and n > 4:
        out.append(low[:-3] + "y")                        # tried→try
    elif low.endswith("ed") and n > 4:
        stem = low[:-2]
        out.append(stem)                                  # walked→walk
        out.append(stem + "e" if not stem.endswith("e") else stem[:-1])
        if len(stem) >= 2 and stem[-1] == stem[-2]:
            out.append(stem[:-1])                         # stopped→stop
    return out


# ---------------------------------------------------------------------------
# non-English generative morphology (Synonyms.cpp:53-140 covers many
# languages via Wiktionary/STO dictionaries; the dictionaries are data
# files this repo does not ship, so — like the English path above — the
# MECHANISM is implemented generatively from public grammar rules for the
# languages whose query-stopword sets exist: de/fr/es/it/pt.  Wrong
# guesses cost a df=0 lookup and nothing else.)
# ---------------------------------------------------------------------------

LANG_NUMBER_WORDS: dict[str, dict[str, str]] = {
    "de": {"null": "0", "eins": "1", "zwei": "2", "drei": "3",
           "vier": "4", "fünf": "5", "sechs": "6", "sieben": "7",
           "acht": "8", "neun": "9", "zehn": "10", "elf": "11",
           "zwölf": "12", "zwanzig": "20", "dreißig": "30",
           "hundert": "100", "tausend": "1000"},
    "fr": {"zéro": "0", "un": "1", "deux": "2", "trois": "3",
           "quatre": "4", "cinq": "5", "six": "6", "sept": "7",
           "huit": "8", "neuf": "9", "dix": "10", "onze": "11",
           "douze": "12", "vingt": "20", "trente": "30", "cent": "100",
           "mille": "1000"},
    "es": {"cero": "0", "uno": "1", "dos": "2", "tres": "3",
           "cuatro": "4", "cinco": "5", "seis": "6", "siete": "7",
           "ocho": "8", "nueve": "9", "diez": "10", "once": "11",
           "doce": "12", "veinte": "20", "treinta": "30", "cien": "100",
           "mil": "1000"},
    "it": {"zero": "0", "uno": "1", "due": "2", "tre": "3",
           "quattro": "4", "cinque": "5", "sei": "6", "sette": "7",
           "otto": "8", "nove": "9", "dieci": "10", "undici": "11",
           "dodici": "12", "venti": "20", "trenta": "30", "cento": "100",
           "mille": "1000"},
    "pt": {"zero": "0", "um": "1", "dois": "2", "três": "3",
           "quatro": "4", "cinco": "5", "seis": "6", "sete": "7",
           "oito": "8", "nove": "9", "dez": "10", "onze": "11",
           "doze": "12", "vinte": "20", "trinta": "30", "cem": "100",
           "mil": "1000"},
}
_LANG_DIGIT_WORDS = {lg: {v: k for k, v in tbl.items()}
                     for lg, tbl in LANG_NUMBER_WORDS.items()}


def _variants_de(low: str) -> list[str]:
    """German noun inflection candidates, both directions (plural classes
    -e/-en/-n/-er/-s; umlaut shifts are lexical and left to df=0)."""
    out = [low + s for s in ("e", "en", "n", "er", "s")]
    for s in ("en", "er", "e", "n", "s"):
        if low.endswith(s) and len(low) - len(s) >= 3:
            out.append(low[: -len(s)])
    return out


def _variants_fr(low: str) -> list[str]:
    out: list[str] = []
    if low.endswith("aux") and len(low) > 4:
        out.append(low[:-3] + "al")            # journaux → journal
    if low.endswith(("s", "x")) and len(low) > 3:
        out.append(low[:-1])
    if not low.endswith(("s", "x", "z")):
        out.append(low + "s")
        if low.endswith(("eau", "eu")):
            out.append(low + "x")              # châteaux, jeux
    if low.endswith("al") and len(low) > 3:
        out.append(low[:-2] + "aux")
    return out


def _variants_es(low: str) -> list[str]:
    out: list[str] = []
    if low.endswith("ces") and len(low) > 4:
        out.append(low[:-3] + "z")             # voces → voz
    elif low.endswith("es") and len(low) > 3:
        out.append(low[:-2])
        out.append(low[:-1])                   # clases → clase
    elif low.endswith("s") and len(low) > 3:
        out.append(low[:-1])
    if low.endswith("z"):
        out.append(low[:-1] + "ces")
    elif low.endswith(tuple("aeiou")):
        out.append(low + "s")
    else:
        out.append(low + "es")
    return out


def _variants_it(low: str) -> list[str]:
    out: list[str] = []
    if low.endswith("o") and len(low) > 2:
        out.append(low[:-1] + "i")             # libro → libri
    elif low.endswith("a") and len(low) > 2:
        out.append(low[:-1] + "e")             # casa → case
    elif low.endswith("e") and len(low) > 2:
        out.append(low[:-1] + "i")             # cane → cani
        out.append(low[:-1] + "a")             # case → casa
    elif low.endswith("i") and len(low) > 2:
        out.append(low[:-1] + "o")
        out.append(low[:-1] + "e")
    return out


def _variants_pt(low: str) -> list[str]:
    out: list[str] = []
    if low.endswith("ões") and len(low) > 4:
        out.append(low[:-3] + "ão")            # nações → nação
    elif low.endswith("ns") and len(low) > 3:
        out.append(low[:-2] + "m")             # homens? (-ns → -m)
    elif low.endswith("es") and len(low) > 3:
        out.append(low[:-2])
        out.append(low[:-1])
    elif low.endswith("s") and len(low) > 3:
        out.append(low[:-1])
    if low.endswith("ão"):
        out.append(low[:-2] + "ões")
    elif low.endswith("m"):
        out.append(low[:-1] + "ns")
    elif low.endswith(tuple("aeiou")):
        out.append(low + "s")
    else:
        out.append(low + "es")
    return out


_LANG_RULES = {"de": _variants_de, "fr": _variants_fr, "es": _variants_es,
               "it": _variants_it, "pt": _variants_pt}


def variants_for(token: str, lang: str = "en") -> list[str]:
    """All expansion alternatives for one lowercase query token, capped at
    ``MAX_VARIANTS`` (priority: number, curated set, irregular forms,
    possessive/contraction, plural/singular, verb forms, spelling).
    ``lang`` selects the generative ruleset; unknown languages fall back
    to no expansion (never apply English morphology to another
    language's tokens)."""
    low = token.lower()
    if lang != "en":
        rules = _LANG_RULES.get(lang)
        if rules is None:
            return []
        out = []
        nw = LANG_NUMBER_WORDS.get(lang, {})
        dw = _LANG_DIGIT_WORDS.get(lang, {})
        if low in nw:
            out.append(nw[low])
        if low in dw:
            out.append(dw[low])
        if low.isalpha() and len(low) >= 2:
            out.extend(rules(low))
        seen = {low}
        uniq = [v for v in out if not (v in seen or seen.add(v))]
        return uniq[:MAX_VARIANTS]
    out: list[str] = []
    if low in NUMBER_WORDS:
        out.append(NUMBER_WORDS[low])
    if low in DIGIT_WORDS:
        out.append(DIGIT_WORDS[low])
    out.extend(_SET_INDEX.get(low, ()))
    if low.endswith("'s") and len(low) > 2:       # possessive strip
        out.append(low[:-2])
    elif "'" in low:                              # we're → were
        out.append(low.replace("'", ""))
    elif low.isalpha() and len(low) >= 2:
        # irregular forms first — the cap must never truncate them in
        # favor of rule-generated guesses
        out.extend(_VERB_FORMS.get(low, ()))
        out.extend(_pluralize(low))
        out.extend(_singularize(low))
        out.extend(_verb_variants(low))
        out.extend(_spelling_variants(low))
    # dedup, preserve order, never echo the base
    seen = {low}
    uniq = []
    for v in out:
        if v not in seen:
            seen.add(v)
            uniq.append(v)
    return uniq[:MAX_VARIANTS]


class GenerativeSynonyms:
    """Dict-like synonym source: ``.get(token)`` generates variants on
    demand — usable anywhere a ``dict[str, list[str]]`` table is.  One
    instance per language (``lang`` selects the ruleset)."""

    def __init__(self, lang: str = "en"):
        self.lang = lang

    def get(self, token: str, default=()):
        v = variants_for(token, self.lang)
        return v if v else default

    def __contains__(self, token: str) -> bool:
        return bool(variants_for(token, self.lang))


DEFAULT_SYNONYMS = GenerativeSynonyms()
_TABLES: dict[str, GenerativeSynonyms] = {"en": DEFAULT_SYNONYMS}


def synonyms_table(lang: str) -> GenerativeSynonyms:
    """Per-language synonym table (cached) — ``synonyms="default"`` in
    the engine/oracle resolves through this, so query expansion follows
    the query language."""
    t = _TABLES.get(lang)
    if t is None:
        t = _TABLES[lang] = GenerativeSynonyms(lang)
    return t
