"""Porter stemming (the EnglishAnalyzer chain's stemmer).

Restates the published Porter algorithm (Porter 1980, "An algorithm
for suffix stripping", Program 14(3):130-137; reference implementation
at tartarus.org) exactly as the reference ships it — Release 3 with
the two documented bug fixes (the 'aed'/'eed'/'oed' step-3 guard and
the bare-'ion' step-5 guard):
  lucene/analysis/common/src/java/org/apache/lucene/analysis/en/PorterStemmer.java:130-488
Chain placement mirrors EnglishAnalyzer.createComponents
(EnglishAnalyzer.java:110-119): StandardTokenizer -> possessive-'s
strip -> lowercase -> stop -> PorterStem; words of length <= 2 are
returned unchanged (PorterStemmer.java:479).

Scale note: stemming is applied to the DISTINCT terms of each Arrow
batch (np.unique + map), never per occurrence — at 100 TB the token
stream is huge but the per-batch vocabulary is small, so the Python
cost is O(|vocab|) per batch, not O(|tokens|).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List

_VOWELS = frozenset("aeiou")


class _Stem:
    """One stemming pass. b is the char list; k is the last live index;
    j marks the candidate suffix start (set by ends())."""

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str):
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    def cons(self, i: int) -> bool:
        c = self.b[i]
        if c in _VOWELS:
            return False
        if c == "y":
            return True if i == 0 else not self.cons(i - 1)
        return True

    def m(self) -> int:
        """Consonant-sequence count of b[0..j]: <c>(vc){m}<v>."""
        n = 0
        i = 0
        while True:
            if i > self.j:
                return n
            if not self.cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > self.j:
                    return n
                if self.cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > self.j:
                    return n
                if not self.cons(i):
                    break
                i += 1
            i += 1

    def vowel_in_stem(self) -> bool:
        return any(not self.cons(i) for i in range(self.j + 1))

    def doublec(self, j: int) -> bool:
        if j < 1 or self.b[j] != self.b[j - 1]:
            return False
        return self.cons(j)

    def cvc(self, i: int) -> bool:
        """consonant-vowel-consonant ending at i, last cons not w/x/y
        (the restore-final-e test: cav(e) yes, snow/box/tray no)."""
        if i < 2 or not self.cons(i) or self.cons(i - 1) or not self.cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def ends(self, s: str) -> bool:
        o = self.k - len(s) + 1
        if o < 0:
            return False
        if self.b[o:self.k + 1] != list(s):
            return False
        self.j = self.k - len(s)
        return True

    def setto(self, s: str):
        self.b[self.j + 1:self.k + 1] = list(s)
        self.k = self.j + len(s)

    def r(self, s: str):
        if self.m() > 0:
            self.setto(s)

    def step1(self):
        """Plurals and -ed/-ing: caresses->caress, ponies->poni,
        agreed->agree, matting->mat, mating->mate."""
        if self.b[self.k] == "s":
            if self.ends("sses"):
                self.k -= 2
            elif self.ends("ies"):
                self.setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self.ends("eed"):
            if self.m() > 0:
                self.k -= 1
        elif (self.ends("ed") or self.ends("ing")) and self.vowel_in_stem():
            self.k = self.j
            if self.ends("at"):
                self.setto("ate")
            elif self.ends("bl"):
                self.setto("ble")
            elif self.ends("iz"):
                self.setto("ize")
            elif self.doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self.m() == 1 and self.cvc(self.k):
                self.setto("e")

    def step2(self):
        """Terminal y -> i when the stem has another vowel."""
        if self.ends("y") and self.vowel_in_stem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"),
              ("eli", "e"), ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
              ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def step3(self):
        """Double suffices to single: -ization -> -ize (m > 0)."""
        if self.k == 0:
            return  # 'aed'/'eed'/'oed' guard (Release-3 Bug 1)
        for suf, rep in self._STEP3.get(self.b[self.k - 1], ()):
            if self.ends(suf):
                self.r(rep)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def step4(self):
        """-ic-, -full, -ness etc. (m > 0)."""
        for suf, rep in self._STEP4.get(self.b[self.k], ()):
            if self.ends(suf):
                self.r(rep)
                return

    _STEP5 = {
        "a": ("al",), "c": ("ance", "ence"), "e": ("er",), "i": ("ic",),
        "l": ("able", "ible"), "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",), "t": ("ate", "iti"), "u": ("ous",),
        "v": ("ive",), "z": ("ize",),
    }

    def step5(self):
        """Strip -ant, -ence etc. in context m > 1."""
        if self.k == 0:
            return
        c = self.b[self.k - 1]
        if c == "o":
            if self.ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass  # bare-'ion' guard (Release-3 Bug 2)
            elif self.ends("ou"):
                pass
            else:
                return
        else:
            for suf in self._STEP5.get(c, ()):
                if self.ends(suf):
                    break
            else:
                return
        if self.m() > 1:
            self.k = self.j

    def step6(self):
        """Final -e if m > 1 (or m == 1 and not cvc); -ll -> -l."""
        self.j = self.k
        if self.b[self.k] == "e":
            a = self.m()
            if a > 1 or (a == 1 and not self.cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self.doublec(self.k) and self.m() > 1:
            self.k -= 1

    def run(self) -> str:
        if self.k > 1:  # length <= 2: unchanged (PorterStemmer.java:479)
            self.step1()
            self.step2()
            self.step3()
            self.step4()
            self.step5()
            self.step6()
        return "".join(self.b[: self.k + 1])


@lru_cache(maxsize=65536)
def porter_stem(word: str) -> str:
    """Stem one (already lowercased) token."""
    return _Stem(word).run()


def strip_possessive(token: str) -> str:
    """EnglishPossessiveFilter: drop trailing 's / ’s / ʼs
    (EnglishPossessiveFilter.java — runs before lowercase in the
    reference; tokens here are handled case-insensitively)."""
    if len(token) >= 2 and token[-1] in ("s", "S") and token[-2] in ("'", "’", "ʼ"):
        return token[:-2]
    return token


def stem_tokens(tokens: List[str]) -> List[str]:
    return [porter_stem(t) for t in tokens]


# ---------------------------------------------------------------------------
# Light stemmers (the language-pack tier): restatements of the published
# UniNE / CLEF algorithms by Jacques Savoy ("Light Stemming Approaches
# for the French, Portuguese, German and Hungarian Languages", SAC 2006;
# "Report on CLEF-2001 Experiments") exactly as the reference ships them:
#   lucene/analysis/common/.../de/GermanLightStemmer.java:55-138
#   lucene/analysis/common/.../es/SpanishLightStemmer.java:55-109
#   lucene/analysis/common/.../fr/FrenchLightStemmer.java:55-267
#   lucene/analysis/common/.../it/ItalianLightStemmer.java:55-117
#   lucene/analysis/common/.../en/EnglishMinimalStemmer.java:25-46
# Like porter_stem, these run at DICTIONARY level (distinct terms per
# Arrow batch), so the Python cost is O(|vocab|) not O(|tokens|).
# ---------------------------------------------------------------------------

_DE_FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")
# Savoy's CLEF accent fold (Spanish/Italian share the same 5-vowel table)
_CLEF_FOLD = str.maketrans("àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii")
_DE_ST_END = frozenset("bdfghklmnt")


@lru_cache(maxsize=65536)
def german_light_stem(word: str) -> str:
    """GermanLightStemmer (UniNE): fold umlauts/accents, then two
    suffix-stripping passes (plural/case endings -ern/-em/-en/-er/-es/
    -e/-s, then superlative/inflection -est/-er/-en/-st)."""
    s = word.translate(_DE_FOLD)
    n = len(s)
    # step 1 (GermanLightStemmer.java:104-122)
    if n > 5 and s.endswith("ern"):
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST_END:
        n -= 1
    # step 2 (GermanLightStemmer.java:124-136)
    if n > 5 and s[n - 3:n] == "est":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "rn":
        n -= 2
    elif n > 4 and s[n - 2:n] == "st" and s[n - 3] in _DE_ST_END:
        n -= 2
    return s[:n]


@lru_cache(maxsize=65536)
def spanish_light_stem(word: str) -> str:
    """SpanishLightStemmer (CLEF-2001): fold accents, strip plural /
    gender endings (-os/-as/-es -> stem, -ces -> -z, final o/a/e)."""
    if len(word) < 5:
        return word
    s = word.translate(_CLEF_FOLD)
    n = len(s)
    last = s[n - 1]
    if last in "oae":
        return s[:n - 1]
    if last == "s":
        if s[n - 4:n - 1] == "ese":
            return s[:n - 2]
        if s[n - 3:n - 1] == "ce":
            return s[:n - 3] + "z"
        if s[n - 2] in "oae":
            return s[:n - 2]
    return s


@lru_cache(maxsize=65536)
def italian_light_stem(word: str) -> str:
    """ItalianLightStemmer (CLEF-2001): fold accents, strip the final
    vowel (plural -i/-e collapse with -io/-hi/-he/-ia handling)."""
    if len(word) < 6:
        return word
    s = word.translate(_CLEF_FOLD)
    n = len(s)
    last, prev = s[n - 1], s[n - 2]
    if last == "e":
        return s[:n - 2] if prev in "ih" else s[:n - 1]
    if last == "i":
        return s[:n - 2] if prev in "hi" else s[:n - 1]
    if last in "ao":
        return s[:n - 2] if prev == "i" else s[:n - 1]
    return s


@lru_cache(maxsize=65536)
def english_minimal_stem(word: str) -> str:
    """EnglishMinimalStemmer (Harman's S-stemmer): plural-only —
    -ies -> -y (not after a/e), keep -us/-ss, keep -Ves vowel plurals,
    else strip the final s."""
    n = len(word)
    if n < 3 or word[n - 1] != "s":
        return word
    p = word[n - 2]
    if p in "us":
        return word
    if p == "e":
        if n > 3 and word[n - 3] == "i" and word[n - 4] not in "ae":
            return word[:n - 3] + "y"
        if word[n - 3] in "iaoe":
            return word
    return word[:n - 1]


_FR_NORM_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(s: str) -> str:
    """FrenchLightStemmer.norm (FrenchLightStemmer.java:229-266): fold
    accents, squeeze letter runs, strip -ie, final r/e/e, final double."""
    if len(s) > 4:
        s = s.translate(_FR_NORM_FOLD)
        out = [s[0]]
        for ch in s[1:]:
            if ch == out[-1] and ch.isalpha():
                continue
            out.append(ch)
        s = "".join(out)
    if len(s) > 4 and s.endswith("ie"):
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


@lru_cache(maxsize=65536)
def french_light_stem(word: str) -> str:
    """FrenchLightStemmer (UniNE): plural -x/-s strip, the derivational
    suffix table (-issement/-issant/-ement/-ficatrice/.../-ation/-ition
    with their stem repairs), then norm()."""
    s = list(word)
    n = len(s)
    if n > 5 and s[n - 1] == "x":
        if s[n - 3] == "a" and s[n - 2] == "u" and s[n - 4] != "e":
            s[n - 2] = "l"  # chevaux -> cheval
        n -= 1
    if n > 3 and s[n - 1] == "x":
        n -= 1
    if n > 3 and s[n - 1] == "s":
        n -= 1
    w = "".join(s[:n])

    def fin(t: str) -> str:
        return _fr_norm(t)

    if n > 9 and w.endswith("issement"):
        return fin(w[:n - 6][:-1] + "r")
    if n > 8 and w.endswith("issant"):
        return fin(w[:n - 4][:-1] + "r")
    if n > 6 and w.endswith("ement"):
        w = w[:n - 4]
        if len(w) > 3 and w.endswith("ive"):
            w = w[:-1]
            w = w[:-1] + "f"
        return fin(w)
    if n > 11 and w.endswith("ficatrice"):
        return fin(w[:n - 5][:-2] + "er")
    if n > 10 and w.endswith("ficateur"):
        return fin(w[:n - 4][:-2] + "er")
    if n > 9 and w.endswith("catrice"):
        t = w[:n - 3]
        return fin(t[:-4] + "que" + t[-1])  # ...catr -> ...quer ('r' kept)
    if n > 8 and w.endswith("cateur"):
        return fin(w[:n - 2][:-4] + "quer")
    if n > 8 and w.endswith("atrice"):
        return fin(w[:n - 4][:-2] + "er")
    if n > 7 and w.endswith("ateur"):
        return fin(w[:n - 3][:-2] + "er")
    if n > 6 and w.endswith("trice"):
        w = w[:n - 1][:-3] + "eur"
        n = len(w)
    if n > 5 and w.endswith("ième"):
        return fin(w[:n - 4])
    if n > 7 and w.endswith("teuse"):
        return fin(w[:n - 2][:-1] + "r")
    if n > 6 and w.endswith("teur"):
        return fin(w[:n - 1][:-1] + "r")
    if n > 5 and w.endswith("euse"):
        return fin(w[:n - 2])
    if n > 8 and w.endswith("ère"):
        return fin(w[:n - 1][:-2] + "er")
    if n > 7 and w.endswith("ive"):
        return fin(w[:n - 1][:-1] + "f")
    if n > 4 and (w.endswith("folle") or w.endswith("molle")):
        return fin(w[:n - 2][:-1] + "u")  # folle/molle -> fou/mou
    if n > 9 and w.endswith("nnelle"):
        return fin(w[:n - 5])
    if n > 9 and w.endswith("nnel"):
        return fin(w[:n - 3])
    if n > 4 and w.endswith("ète"):
        w = w[:n - 1][:-2] + "et"
        n = len(w)
    if n > 8 and w.endswith("ique"):
        w = w[:n - 4]
        n = len(w)
    if n > 8 and w.endswith("esse"):
        return fin(w[:n - 3])
    if n > 7 and w.endswith("inage"):
        return fin(w[:n - 3])
    if n > 9 and w.endswith("isation"):
        w = w[:n - 7]
        if len(w) > 5 and w.endswith("ual"):
            w = w[:-3] + "uel"  # -ualisation -> -uel
        return fin(w)
    if n > 9 and w.endswith("isateur"):
        return fin(w[:n - 7])
    if n > 8 and w.endswith("ation"):
        return fin(w[:n - 5])
    if n > 8 and w.endswith("ition"):
        return fin(w[:n - 5])
    return fin(w)


_PT_FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")


def _pt_remove_suffix(w: str) -> str:
    """PortugueseLightStemmer.removeSuffix (plural/adverb endings with
    their singular repairs: -ões/-ães -> -ão, -eis -> -el, ...)."""
    n = len(w)
    if n > 4 and w.endswith("es") and w[n - 3] in "rslz":
        return w[:n - 2]
    if n > 3 and w.endswith("ns"):
        return w[:n - 2] + "m"
    if n > 4 and (w.endswith("eis") or w.endswith("éis")):
        return w[:n - 3] + "el"
    if n > 4 and w.endswith("ais"):
        return w[:n - 3] + "al"
    if n > 4 and w.endswith("óis"):
        return w[:n - 3] + "ol"
    if n > 4 and w.endswith("is"):
        return w[:n - 1] + "l"
    if n > 3 and (w.endswith("ões") or w.endswith("ães")):
        return w[:n - 3] + "ão"
    if n > 6 and w.endswith("mente"):
        return w[:n - 5]
    if n > 3 and w[n - 1] == "s":
        return w[:n - 1]
    return w


def _pt_norm_feminine(w: str) -> str:
    """PortugueseLightStemmer.normFeminine: -a forms back to the
    masculine citation form (-osa -> -oso, -ona -> -ão, -esa -> -ês)."""
    n = len(w)
    if n > 7 and (w.endswith("inha") or w.endswith("iaca")
                  or w.endswith("eira")):
        return w[:n - 1] + "o"
    if n > 6:
        if w[n - 3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return w[:n - 1] + "o"
        if w.endswith("ona"):
            return w[:n - 3] + "ão"
        if w.endswith("ora"):
            return w[:n - 1]
        if w.endswith("esa"):
            return w[:n - 3] + "ês"
        if w.endswith("na"):
            return w[:n - 1] + "o"
    return w


@lru_cache(maxsize=65536)
def portuguese_light_stem(word: str) -> str:
    """PortugueseLightStemmer (UniNE, Savoy SAC 2006): plural suffix
    removal with singular repairs, feminine normalization, final-vowel
    strip, then accent fold (reference:
    analysis/common/.../pt/PortugueseLightStemmer.java:64-206)."""
    if len(word) < 4:
        return word
    w = _pt_remove_suffix(word)
    if len(w) > 3 and w[-1] == "a":
        w = _pt_norm_feminine(w)
    if len(w) > 4 and w[-1] in "eao":
        w = w[:-1]
    return w.translate(_PT_FOLD)


_SV_4 = ("arne", "erna", "ande", "else", "aste", "orna", "aren")
_SV_2 = ("ar", "er", "or", "en", "at", "te", "et")


@lru_cache(maxsize=65536)
def swedish_light_stem(word: str) -> str:
    """SwedishLightStemmer (Savoy, CLEF-2003): plural -s, then the
    definite/comparative suffix ladder (reference:
    analysis/common/.../sv/SwedishLightStemmer.java:64-111)."""
    w = word
    n = len(w)
    if n > 4 and w[n - 1] == "s":
        n -= 1
        w = w[:n]
    if n > 7 and (w.endswith("elser") or w.endswith("heten")):
        return w[:n - 5]
    if n > 6 and w[n - 4:] in _SV_4:
        return w[:n - 4]
    if n > 5 and w[n - 3:] in ("are", "ast", "het"):
        return w[:n - 3]
    if n > 4 and w[n - 2:] in _SV_2:
        return w[:n - 2]
    if n > 3 and w[n - 1] in "taen":
        return w[:n - 1]
    return w


_RU_4 = ("иями", "оями")
_RU_3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
         "ери", "ими", "ого", "ому", "ыми", "оев")
_RU_2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
         "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
         "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")


@lru_cache(maxsize=65536)
def russian_light_stem(word: str) -> str:
    """RussianLightStemmer (Dolamic & Savoy, "Indexing and Searching
    Strategies for the Russian Language"): case-ending removal + final
    normalization (reference:
    analysis/common/.../ru/RussianLightStemmer.java:64-153)."""
    w = word
    n = len(w)
    # removeCase
    if n > 6 and w[n - 4:] in _RU_4:
        w = w[:n - 4]
    elif n > 5 and w[n - 3:] in _RU_3:
        w = w[:n - 3]
    elif n > 4 and w[n - 2:] in _RU_2:
        w = w[:n - 2]
    elif n > 3 and w[n - 1] in "аеиоуйыяь":
        w = w[:n - 1]
    # normalize
    n = len(w)
    if n > 3:
        if w[n - 1] in "ьи":
            return w[:n - 1]
        if w[n - 1] == "н" and w[n - 2] == "н":
            return w[:n - 1]
    return w


_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_VOWELS = frozenset("aeiouy")
_HU_CASE3 = ("nak", "nek", "val", "vel", "ert", "rol", "ban", "ben",
             "bol", "nal", "nel", "hoz", "hez", "tol")
_HU_CASE2 = ("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be",
             "ul", "ig")


def _hu_remove_case(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("kent"):
        return w[:n - 4]
    if n > 5:
        if w[n - 3:] in _HU_CASE3:
            return w[:n - 3]
        if (w.endswith("al") or w.endswith("el")) \
                and w[n - 3] not in _HU_VOWELS and w[n - 3] == w[n - 4]:
            return w[:n - 3]
    if n > 4:
        if w[n - 2:] in _HU_CASE2:
            return w[:n - 2]
        if (w.endswith("on") or w.endswith("en")) \
                and w[n - 3] not in _HU_VOWELS:
            return w[:n - 2]
        c = w[n - 1]
        if c in "tn":
            return w[:n - 1]
        if c in "ae" and w[n - 2] == w[n - 3] and w[n - 2] not in _HU_VOWELS:
            return w[:n - 2]
    return w


def _hu_remove_possessive(w: str) -> str:
    n = len(w)
    if n > 6:
        if w[n - 5] not in _HU_VOWELS \
                and w[n - 4:] in ("atok", "otok", "etek"):
            return w[:n - 4]
        if w[n - 4:] in ("itek", "itok"):
            return w[:n - 4]
    if n > 5:
        if w[n - 4] not in _HU_VOWELS and w[n - 3:] in ("unk", "tok", "tek"):
            return w[:n - 3]
        if w[n - 4] in _HU_VOWELS and w.endswith("juk"):
            return w[:n - 3]
        if w.endswith("ink"):
            return w[:n - 3]
    if n > 4:
        if w[n - 3] not in _HU_VOWELS \
                and w[n - 2:] in ("am", "em", "om", "ad", "ed", "od", "uk"):
            return w[:n - 2]
        if w[n - 3] in _HU_VOWELS and w[n - 2:] in ("nk", "ja", "je"):
            return w[:n - 2]
        if w[n - 2:] in ("im", "id", "ik"):
            return w[:n - 2]
    if n > 3:
        c = w[n - 1]
        if c in "ae" and w[n - 2] not in _HU_VOWELS:
            return w[:n - 1]
        if c in "md" and w[n - 2] in _HU_VOWELS:
            return w[:n - 1]
        if c == "i":
            return w[:n - 1]
    return w


@lru_cache(maxsize=65536)
def hungarian_light_stem(word: str) -> str:
    """HungarianLightStemmer (UniNE, Savoy SAC 2006): accent fold, case
    suffixes, possessive suffixes, plural -k, final-vowel normalize
    (reference: analysis/common/.../hu/HungarianLightStemmer.java:
    64-239)."""
    w = word.translate(_HU_FOLD)
    w = _hu_remove_case(w)
    w = _hu_remove_possessive(w)
    n = len(w)
    # removePlural (with the intentional a/o/e fallthrough to -1)
    if n > 3 and w[n - 1] == "k":
        if w[n - 2] in "aoe" and n > 4:
            w = w[:n - 2]
        else:
            w = w[:n - 1]
    # normalize
    n = len(w)
    if n > 3 and w[n - 1] in "aeio":
        w = w[:n - 1]
    return w


_FI_FOLD = str.maketrans("äåö", "aao")
_FI_VOWELS = frozenset("aeiouy")


def _fi_step1(w: str) -> str:
    n = len(w)
    if n > 8:
        if w.endswith("kin"):
            return _fi_step1(w[:n - 3])
        if w.endswith("ko"):
            return _fi_step1(w[:n - 2])
    if n > 11:
        if w.endswith("dellinen"):
            return w[:n - 8]
        if w.endswith("dellisuus"):
            return w[:n - 9]
    return w


def _fi_step3(w: str) -> str:
    n = len(w)
    if n > 8:
        if w.endswith("nnen"):
            return w[:n - 4] + "s"
        if w.endswith("ntena"):
            return w[:n - 5] + "s"
        if w.endswith("tten"):
            return w[:n - 4]
        if w.endswith("eiden"):
            return w[:n - 5]
    if n > 6:
        if w[n - 4:] in ("neen", "niin", "seen", "teen", "inen"):
            return w[:n - 4]
        if w[n - 3] == "h" and w[n - 2] in _FI_VOWELS and w[n - 1] == "n":
            return w[:n - 3]
        if w.endswith("den"):
            return w[:n - 3] + "s"
        if w.endswith("ksen"):
            return w[:n - 4] + "s"
        if w[n - 3:] in ("ssa", "sta", "lla", "lta", "tta", "ksi", "lle"):
            return w[:n - 3]
    if n > 5:
        if w[n - 2:] in ("na", "ne"):
            return w[:n - 2]
        if w.endswith("nei"):
            return w[:n - 3]
    if n > 4:
        if w[n - 2:] in ("ja", "ta"):
            return w[:n - 2]
        if w[n - 1] == "a":
            return w[:n - 1]
        if w[n - 1] == "n" and w[n - 2] in _FI_VOWELS:
            return w[:n - 2]
        if w[n - 1] == "n":
            return w[:n - 1]
    return w


@lru_cache(maxsize=65536)
def finnish_light_stem(word: str) -> str:
    """FinnishLightStemmer (Savoy, CLEF-2003): recursive clitic strip
    (-kin/-ko), derivational + case endings with -hde -> -ksi repair,
    then k/p/t gemination squeeze (reference:
    analysis/common/.../fi/FinnishLightStemmer.java:64-259)."""
    if len(word) < 4:
        return word
    w = word.translate(_FI_FOLD)
    w = _fi_step1(w)
    # step2
    n = len(w)
    if n > 5:
        if w[n - 3:] in ("lla", "tse", "sti"):
            w = w[:n - 3]
        elif w.endswith("ni"):
            w = w[:n - 2]
        elif w.endswith("aa"):
            w = w[:n - 1]
    w = _fi_step3(w)
    # norm1
    n = len(w)
    if n > 5 and w.endswith("hde"):
        w = w[:n - 3] + "ksi"
    n = len(w)
    if n > 4 and (w.endswith("ei") or w.endswith("at")):
        w = w[:n - 2]
    elif n > 3 and w[n - 1] in "tsjeai":
        w = w[:n - 1]
    # norm2
    n = len(w)
    if n > 8 and w[n - 1] in "eou":
        w = w[:n - 1]
        n -= 1
    if n > 4:
        if w[n - 1] == "i":
            w = w[:n - 1]
            n -= 1
        if n > 4:
            out = [w[0]]
            for ch in w[1:]:
                if ch == out[-1] and ch in "kpt":
                    continue
                out.append(ch)
            w = "".join(out)
    return w


def _no_light_stem(word: str, bokmaal: bool, nynorsk: bool) -> str:
    """NorwegianLightStemmer (Savoy CLEF light-stemmer family;
    reference: analysis/common/.../no/NorwegianLightStemmer.java:87-175):
    possessive -s, then one pass down the Bokmål/Nynorsk suffix ladder."""
    w = word
    n = len(w)
    if n > 4 and w[n - 1] == "s":
        n -= 1
        w = w[:n]
    if n > 7 and ((bokmaal and w[n - 5:] in ("heter", "heten"))
                  or (nynorsk and w.endswith("heita"))):
        return w[:n - 5]
    if n > 8 and nynorsk and w[n - 6:] in ("heiter", "leiken", "leikar"):
        return w[:n - 6]
    if n > 5 and (w.endswith("dom") or (bokmaal and w.endswith("het"))):
        return w[:n - 3]
    if n > 6 and nynorsk and w[n - 4:] in ("heit", "semd", "leik"):
        return w[:n - 4]
    if n > 7 and w[n - 5:] in ("elser", "elsen"):
        return w[:n - 5]
    if n > 6 and ((bokmaal and w[n - 4:] in ("ende", "este", "eren"))
                  or (nynorsk and w[n - 4:] in ("ande", "aste", "aren"))
                  or w.endswith("else")):
        return w[:n - 4]
    if n > 5 and ((bokmaal and w[n - 3:] in ("ere", "est"))
                  or (nynorsk and w[n - 3:] in ("are", "ast", "ane"))
                  or w.endswith("ene")):
        return w[:n - 3]
    if n > 4 and (w[n - 2:] in ("er", "en", "et", "te")
                  or (nynorsk and w.endswith("ar"))
                  or (bokmaal and w.endswith("st"))):
        return w[:n - 2]
    if n > 3 and w[n - 1] in "aen":
        return w[:n - 1]
    return w


@lru_cache(maxsize=65536)
def norwegian_light_stem(word: str) -> str:
    """Bokmål light stem (the filter's default flag set;
    NorwegianLightStemFilter.java:44-47)."""
    return _no_light_stem(word, True, False)


@lru_cache(maxsize=65536)
def norwegian_nn_light_stem(word: str) -> str:
    """Nynorsk light stem (NorwegianLightStemmer NYNORSK flag)."""
    return _no_light_stem(word, False, True)


@lru_cache(maxsize=65536)
def norwegian_minimal_stem(word: str) -> str:
    """NorwegianMinimalStemmer (Bokmål): known noun plural forms +
    genitive -s only (reference:
    analysis/common/.../no/NorwegianMinimalStemmer.java:82-112)."""
    w = word
    n = len(w)
    if n > 4 and w[n - 1] == "s":
        n -= 1
        w = w[:n]
    if n > 5 and w.endswith("ene"):
        return w[:n - 3]
    if n > 4 and w[n - 2:] in ("er", "en", "et"):
        return w[:n - 2]
    if n > 3 and w[n - 1] in "ae":
        return w[:n - 1]
    return w


_CZ_3 = ("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
         "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
         "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
_CZ_2 = ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
         "mi", "ou")


@lru_cache(maxsize=65536)
def czech_stem(word: str) -> str:
    """CzechStemmer (Dolamic & Savoy, "Indexing and stemming approaches
    for the Czech language"): case-ending removal, possessive removal,
    final palatalization normalization (reference:
    analysis/common/.../cz/CzechStemmer.java:44-172)."""
    w = word
    n = len(w)
    # removeCase
    if n > 7 and w.endswith("atech"):
        w = w[:n - 5]
    elif n > 6 and w[n - 4:] in ("ětem", "etem", "atům"):
        w = w[:n - 4]
    elif n > 5 and w[n - 3:] in _CZ_3:
        w = w[:n - 3]
    elif n > 4 and w[n - 2:] in _CZ_2:
        w = w[:n - 2]
    elif n > 3 and w[n - 1] in "aeiouůyáéíýě":
        w = w[:n - 1]
    # removePossessives
    n = len(w)
    if n > 5 and w[n - 2:] in ("ov", "in", "ův"):
        w = w[:n - 2]
    # normalize
    n = len(w)
    if n == 0:
        return w
    if w.endswith("čt"):
        return w[:n - 2] + "ck"
    if w.endswith("št"):
        return w[:n - 2] + "sk"
    if w[n - 1] in "cč":
        return w[:n - 1] + "k"
    if w[n - 1] in "zž":
        return w[:n - 1] + "h"
    if n > 1 and w[n - 2] == "e":
        return w[:n - 2] + w[n - 1]  # e* > *
    if n > 2 and w[n - 2] == "ů":
        return w[:n - 2] + "o" + w[n - 1]  # *ů* -> *o*
    return w


#: (suffix, min vowel count in the word beyond the suffix's own,
#:  fires palatalization) — order matters (longest-match ladder),
#: LatvianStemmer.java:53-72
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
)

_LV_VOWELS = set("aeiouāīēū")


def _lv_unpalatalize(w: str, removed: str) -> str:
    """LatvianStemmer.unpalatalize (reference .java:96-156): undo
    declension II/V/VI palatalization after the suffix strip. `removed`
    is the first character of the stripped suffix (s[len] in the Java,
    the char just past the new end)."""
    if removed == "u":
        if w.endswith("kš"):
            return w[:-2] + "kst"
        if w.endswith("ņņ"):
            return w[:-2] + "nn"
    if w[-2:] in ("pj", "bj", "mj", "vj"):
        return w[:-1]
    for old, new in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                     ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
        if w.endswith(old):
            return w[:-2] + new
    if w.endswith("č"):
        return w[:-1] + "c"
    if w.endswith("ļ"):
        return w[:-1] + "l"
    if w.endswith("ņ"):
        return w[:-1] + "n"
    return w


@lru_cache(maxsize=65536)
def latvian_stem(word: str) -> str:
    """LatvianStemmer (light stemmer, Latvian declension I-VI case/
    number endings + definite adjective endings; reference:
    analysis/common/.../lv/LatvianStemmer.java:38-52): strip the first
    matching affix whose removal leaves at least one vowel and >= 3
    chars, firing unpalatalization for II/V/VI noun suffixes."""
    w = word
    nv = sum(1 for ch in w if ch in _LV_VOWELS)
    for affix, vc, palatalizes in _LV_AFFIXES:
        if nv > vc and len(w) >= len(affix) + 3 and w.endswith(affix):
            stem = w[: len(w) - len(affix)]
            return _lv_unpalatalize(stem, affix[0]) if palatalizes else stem
    return w


def _bg_remove_article(w: str) -> str:
    n = len(w)
    if n > 6 and w.endswith("ият"):
        return w[:n - 3]
    if n > 5 and w[n - 2:] in ("ът", "то", "те", "та", "ия"):
        return w[:n - 2]
    if n > 4 and w.endswith("ят"):
        return w[:n - 2]
    return w


def _bg_remove_plural(w: str) -> str:
    n = len(w)
    if n > 6:
        if w.endswith("овци"):
            return w[:n - 3]
        if w.endswith("ове"):
            return w[:n - 3]
        if w.endswith("еве"):
            return w[:n - 3] + "й"  # еве -> й
    if n > 5:
        if w.endswith("ища"):
            return w[:n - 3]
        if w.endswith("та"):
            return w[:n - 2]
        if w.endswith("ци"):
            return w[:n - 2] + "к"  # ци -> к
        if w.endswith("зи"):
            return w[:n - 2] + "г"  # зи -> г
        if w[n - 3] == "е" and w[n - 1] == "и":
            return w[:n - 3] + "я" + w[n - 2]  # еXи -> яX
    if n > 4:
        if w.endswith("си"):
            return w[:n - 2] + "х"  # си -> х
        if w.endswith("и"):
            return w[:n - 1]
    return w


@lru_cache(maxsize=65536)
def bulgarian_stem(word: str) -> str:
    """BulgarianStemmer (the "light stemmer" of Nakov, BulStem; also
    Savoy's CLEF family): definite-article + plural removal, final
    vowel strip, ен/ъ normalization (reference:
    analysis/common/.../bg/BulgarianStemmer.java:40-73)."""
    w = word
    if len(w) < 4:
        return w
    if len(w) > 5 and w.endswith("ища"):
        return w[:-3]
    w = _bg_remove_article(w)
    w = _bg_remove_plural(w)
    if len(w) > 3:
        if w.endswith("я"):
            w = w[:-1]
        if w and w[-1] in "аое":
            w = w[:-1]
    n = len(w)
    if n > 4 and w.endswith("ен"):
        w = w[:n - 2] + "н"  # ен -> н
    n = len(w)
    if n > 5 and w[n - 2] == "ъ":
        w = w[:n - 2] + w[n - 1]  # ъN -> N
    return w


_HI_5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_HI_4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
         "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
         "ियों", "ियां")
_HI_3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
         "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
         "ुआं")
_HI_2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
         "ती", "ता", "ाँ", "ां", "ों", "ें")
_HI_1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


@lru_cache(maxsize=65536)
def hindi_stem(word: str) -> str:
    """HindiStemmer (Ramanathan & Rao, "A Lightweight Stemmer for
    Hindi" — the published suffix ladder the reference implements;
    analysis/common/.../hi/HindiStemmer.java:32-120): longest-match
    strip of the inflectional suffix classes, gated by minimum stem
    length per class."""
    w = word
    n = len(w)
    if n > 6 and w[n - 5:] in _HI_5:
        return w[:n - 5]
    if n > 5 and w[n - 4:] in _HI_4:
        return w[:n - 4]
    if n > 4 and w[n - 3:] in _HI_3:
        return w[:n - 3]
    if n > 3 and w[n - 2:] in _HI_2:
        return w[:n - 2]
    if n > 2 and w[n - 1:] in _HI_1:
        return w[:n - 1]
    return w


#: dictionary-level stemmer registry for the light-analyzer chains
LIGHT_STEMMERS = {
    "german_light": german_light_stem,
    "spanish_light": spanish_light_stem,
    "french_light": french_light_stem,
    "italian_light": italian_light_stem,
    "english_minimal": english_minimal_stem,
    "portuguese_light": portuguese_light_stem,
    "swedish_light": swedish_light_stem,
    "russian_light": russian_light_stem,
    "hungarian_light": hungarian_light_stem,
    "finnish_light": finnish_light_stem,
    "norwegian_light": norwegian_light_stem,
    "norwegian_nn_light": norwegian_nn_light_stem,
    "norwegian_minimal": norwegian_minimal_stem,
    "czech": czech_stem,
    "latvian": latvian_stem,
    "bulgarian": bulgarian_stem,
    "hindi": hindi_stem,
}
