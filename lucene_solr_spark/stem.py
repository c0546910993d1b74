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
