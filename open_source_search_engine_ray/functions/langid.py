"""Character-n-gram language identification (TextCat method).

The reference ships CLD2-grade language ID (``FxLanguage.cpp``); the
model-free public-method analogue is Cavnar & Trenkle's rank-order
character-n-gram classifier ("N-Gram-Based Text Categorization", SDAIR
1994): build a ranked profile of the document's most frequent padded
character 1..4-grams and pick the language whose reference profile
minimizes the out-of-place distance.

Reference profiles are derived at import time from embedded per-language
common-word lists (public linguistic knowledge — the ~40 highest-
frequency function words of each language), Zipf-weighted by rank.
Non-Latin scripts are decided by script detection first (a Cyrillic /
CJK / Arabic / ... document never needs the n-gram distance; ru-vs-uk and
zh-vs-ja are split on discriminating characters), which covers the
script-exclusive languages exactly the way wide-coverage classifiers do.

This is the ROWS-ONLY quality upgrade over the SQL-checkable 4-language
marker heuristic in ``pipelines/text_analysis.lang_id`` — both are
exposed; the marker heuristic stays the oracle-checked path.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

# ~40 most common function words per Latin-script language (rank order)
LATIN_WORDS: dict[str, str] = {
    "en": "the of and to in is you that it he was for on are as with his"
          " they at be this have from or one had by word but not what all"
          " were we when your can said there use an each which she do how",
    "de": "der die und in den von zu das mit sich des auf für ist im dem"
          " nicht ein eine als auch es an werden aus er hat dass sie nach"
          " wird bei einer um am sind noch wie einem über einen so zum",
    "fr": "le de un être et à il avoir ne je son que se qui dans en du"
          " elle au ce les pour pas sur par plus pouvoir avec tout faire"
          " mettre autre on mais nous comme ou si leur y dire deux",
    "es": "el la de que y a en un ser se no haber por con su para como"
          " estar tener le lo todo pero más hacer o poder decir este ir"
          " otro ese si me ya ver porque cuando él muy sin sobre",
    "it": "il di che e la a un essere per in una mi sono ho lo ha le ti"
          " con si non come più ma io questo qui sei del tu hai al cosa"
          " gli se anche tutto della mio era c'è due molto",
    "pt": "o de a e que do da em um para é com não uma os no se na por"
          " mais as dos como mas foi ao ele das tem à seu sua ou ser"
          " quando muito há nos já está eu também só pelo pela isso",
    "nl": "de het een van ik te dat die in en hij zijn is was op aan met"
          " als voor had er maar om hem dan zou of wat mijn men dit zo"
          " door over ze zich bij ook je naar heeft hebben nog",
    "sv": "och det att i en jag hon som han på den med var sig för så"
          " till är men ett om hade de av icke mig du henne då sin nu"
          " har inte hans honom skulle hennes där min man vid kan",
    "da": "og i jeg det at en den til er som på de med han af for ikke"
          " der var mig sig men et har om vi min havde ham hun nu over"
          " da fra du ud sin dem os op man hans hvor eller hvad",
    "no": "og i jeg det at en et den til er som på de med han av ikke"
          " der så var meg seg men har om vi min mitt ha hadde hun nå"
          " over da ved fra du ut sin dem noen kunne mot dette",
    "fi": "ja on ei se että hän oli mutta niin kun mitä tämä sitä joka"
          " kaikki jos minä sen olen voi kuin ne hänen nyt vain mukaan"
          " myös siitä jo pitää sitten tai missä hyvin paljon koko",
    "pl": "w i nie na się że do to jak co tak jest po a mnie za ja z ale"
          " mi o tym już ty czy tylko od przez bardzo być go jego ma"
          " było pan ich może coś tego nic jeszcze przy",
    "cs": "a se na v je že s z do to jak já ale tak mi co pro když jsem"
          " být něco ten ho ní o u by byl mě tě může ještě při jsou"
          " podle ani jejich musí dnes",
    "ro": "de la a în și să nu cu o pe ce mai pentru dar mi este că se"
          " eu din sunt un ea lui dacă au fost avea unei prin după care"
          " sau între ani sale două fără",
    "hu": "a az és hogy nem is egy ez van de volt vagy meg ha már csak"
          " mi én el így azt amit mert lesz te ő minden még mint ki"
          " nagyon itt úgy most aki majd",
    "tr": "bir bu ne ve için mi o ben de var ama gibi daha çok ile şey"
          " sen bana beni onun benim biz sadece her zaman kadar sonra"
          " ise ya da değil en diye bütün şu",
    "id": "yang dan di itu dengan untuk tidak ini dari dalam akan pada"
          " juga saya ke karena ada mereka kita bisa kami atau seperti"
          " dia sudah saja jika tapi telah lebih harus banyak",
    "vi": "của và các có được một là không người trong cho tôi đã với"
          " này những như để lại khi thì cũng đó về anh em ông bà đi"
          " ra nói làm gì năm",
}

# Cyrillic: ru vs uk split on discriminating letters
CYRILLIC_WORDS = {
    "ru": "и в не на я быть он с что а по это она этот к но они мы как"
          " из у который то за свой весь год от так о для ты же все"
          " бы мочь вот человек только",
    "uk": "і в не на я бути він з що а по це вона цей до але вони ми як"
          " із у який то за свій увесь рік від так про для є ти ж усі"
          " би могти ось людина тільки",
}

# script blocks decided without n-grams (script-exclusive languages)
_SCRIPT_RANGES = [
    (0x0370, 0x03FF, "el"),
    (0x0590, 0x05FF, "he"),
    (0x0600, 0x06FF, "ar"),
    (0x0900, 0x097F, "hi"),
    (0x0E00, 0x0E7F, "th"),
    (0x3040, 0x30FF, "ja"),          # kana → Japanese, even amid CJK
    (0x4E00, 0x9FFF, "zh"),
    (0xAC00, 0xD7AF, "ko"),
    (0x1100, 0x11FF, "ko"),
    (0x0400, 0x04FF, "_cyr"),        # ru/uk resolved below
]

PROFILE_LEN = 300     # TextCat profile depth
MAX_NGRAM = 4
DOC_PREFIX_CHARS = 1000


def _ngram_counts(text: str) -> Counter:
    c: Counter = Counter()
    for word in text.split():
        w = f"_{word}_"
        L = len(w)
        for n in range(1, MAX_NGRAM + 1):
            for i in range(L - n + 1):
                c[w[i:i + n]] += 1
    return c


def _profile_from_counts(counts: Counter) -> dict[str, int]:
    top = [g for g, _ in sorted(counts.items(),
                                key=lambda kv: (-kv[1], kv[0]))
           [:PROFILE_LEN]]
    return {g: r for r, g in enumerate(top)}


def _profile_from_words(words: str) -> dict[str, int]:
    # Zipf-weight the rank-ordered word list: earlier words count more
    c: Counter = Counter()
    toks = words.split()
    for i, w in enumerate(toks):
        weight = max(1, (len(toks) - i) // 2)
        for g, n in _ngram_counts(w).items():
            c[g] += n * weight
    return _profile_from_counts(c)


LATIN_PROFILES = {lg: _profile_from_words(ws)
                  for lg, ws in LATIN_WORDS.items()}
CYRILLIC_PROFILES = {lg: _profile_from_words(ws)
                     for lg, ws in CYRILLIC_WORDS.items()}

LANGID_LANGS = sorted(set(LATIN_WORDS) | set(CYRILLIC_WORDS) |
                      {lang for _, _, lang in _SCRIPT_RANGES
                       if not lang.startswith("_")})


def _oop_distance(doc_prof: dict[str, int], ref: dict[str, int]) -> int:
    """TextCat out-of-place distance: Σ |rank_doc − rank_ref|, missing
    n-grams cost the maximum displacement."""
    d = 0
    for g, r in doc_prof.items():
        d += abs(r - ref[g]) if g in ref else PROFILE_LEN
    return d


def classify(text: str) -> tuple[str, float]:
    """→ (language code, confidence in [0,1]); ("und", 0.0) for empty
    or unrecognizable text."""
    t = (text or "")[:DOC_PREFIX_CHARS]
    if not t.strip():
        return "und", 0.0
    # script vote
    script_hits: Counter = Counter()
    n_alpha = 0
    for ch in t:
        cp = ord(ch)
        if cp < 128:
            if ch.isalpha():
                n_alpha += 1
            continue
        # only LETTERS count toward the script-share denominator —
        # smart punctuation / symbols / emoji would otherwise dilute
        # CJK or Cyrillic mass below the 0.3 threshold and misroute
        # the text to the Latin TextCat path
        if not ch.isalpha():
            continue
        n_alpha += 1
        for lo, hi, lang in _SCRIPT_RANGES:
            if lo <= cp <= hi:
                script_hits[lang] += 1
                break
    if script_hits and n_alpha:
        # kana presence decides Japanese BEFORE the plurality vote:
        # formal-register Japanese is routinely kanji-heavy, so a
        # CJK-majority count would mislabel it Chinese.  The kana share
        # is measured RELATIVE to the CJK mass (≥5%) so a Chinese text
        # quoting a short katakana name doesn't flip — kanji-heavy
        # Japanese still clears the bar easily (okurigana/particles put
        # real Japanese well above 10% kana)
        ja_hits = script_hits.get("ja", 0)
        cjk_like = ja_hits + script_hits.get("zh", 0)
        if (ja_hits >= 2 and cjk_like and n_alpha
                and cjk_like / n_alpha >= 0.3
                and ja_hits / cjk_like >= 0.05):
            return "ja", round(min(1.0, cjk_like / n_alpha), 6)
        lang, hits = script_hits.most_common(1)[0]
        share = hits / n_alpha
        if share >= 0.3:
            if lang != "_cyr":
                return lang, round(min(1.0, share), 6)
            # ru vs uk: n-gram distance over the Cyrillic profiles
            prof = _profile_from_counts(_ngram_counts(t.lower()))
            best = min(CYRILLIC_PROFILES,
                       key=lambda lg: _oop_distance(
                           prof, CYRILLIC_PROFILES[lg]))
            return best, round(min(1.0, share), 6)
    # Latin path: TextCat distance
    prof = _profile_from_counts(_ngram_counts(t.lower()))
    if not prof:
        return "und", 0.0
    dists = {lg: _oop_distance(prof, ref)
             for lg, ref in LATIN_PROFILES.items()}
    ranked = sorted(dists.items(), key=lambda kv: kv[1])
    best, d0 = ranked[0]
    worst = len(prof) * PROFILE_LEN
    margin = (ranked[1][1] - d0) / max(1, worst) if len(ranked) > 1 else 0.0
    conf = max(0.0, 1.0 - d0 / max(1, worst))
    return best, round(min(1.0, conf + margin), 6)
