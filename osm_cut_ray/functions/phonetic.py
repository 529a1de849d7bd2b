"""Phonetic encodings for entity-resolution blocking keys: American
Soundex (the U.S. National Archives specification, as published in
Knuth TAOCP vol. 3) and the NYSIIS code (Taft 1970, the published
New York State Identification and Intelligence System rules).

Pure scalar/vector functions (no Ray): feed the codes into
`stages/blocking.py` as the sort key, or group on them directly for
phonetic exact-blocking. Non-alpha characters are ignored; empty
inputs encode to "".

Both implementations are pinned to PUBLISHED test vectors in
tests/test_phonetic.py (Robert/Rupert -> R163, Tymczak -> T522,
Pfister -> P236 etc.), the same strategy the repo uses for geohash —
the only cross-checkable encodings in this library-less container.
"""

from __future__ import annotations

import numpy as np

_SOUNDEX_MAP = {}
for _letters, _digit in (("BFPV", "1"), ("CGJKQSXZ", "2"),
                         ("DT", "3"), ("L", "4"), ("MN", "5"),
                         ("R", "6")):
    for _c in _letters:
        _SOUNDEX_MAP[_c] = _digit


def soundex(name: str) -> str:
    """American Soundex: first letter + 3 digits. H and W are
    transparent for adjacency (Knuth's rule: codes separated only by
    H/W collapse); A E I O U Y break runs."""
    s = [c for c in name.upper() if c.isalpha()]
    if not s:
        return ""
    first = s[0]
    out = [first]
    prev_code = _SOUNDEX_MAP.get(first, "")
    for c in s[1:]:
        code = _SOUNDEX_MAP.get(c, "")
        if c in "HW":
            continue            # transparent: prev_code survives
        if code and code != prev_code:
            out.append(code)
            if len(out) == 4:
                break
        prev_code = code
    return "".join(out).ljust(4, "0")


def nysiis(name: str) -> str:
    """NYSIIS (original Taft 1970 rules), max 6 characters."""
    s = "".join(c for c in name.upper() if c.isalpha())
    if not s:
        return ""
    # initial transforms
    for pre, rep in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"),
                     ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")):
        if s.startswith(pre):
            s = rep + s[len(pre):]
            break
    for suf, rep in (("EE", "Y"), ("IE", "Y"), ("DT", "D"),
                     ("RT", "D"), ("RD", "D"), ("NT", "D"),
                     ("ND", "D")):
        if s.endswith(suf):
            s = s[:-len(suf)] + rep
            break
    key = s[0]
    i = 1
    prev = s[0]
    body = []
    while i < len(s):
        c = s[i]
        rep = c
        if s[i:i + 2] == "EV":
            rep, skip = "AF", 2
        elif c in "AEIOU":
            rep, skip = "A", 1
        elif c == "Q":
            rep, skip = "G", 1
        elif c == "Z":
            rep, skip = "S", 1
        elif c == "M":
            rep, skip = "N", 1
        elif s[i:i + 2] == "KN":
            rep, skip = "N", 2
        elif c == "K":
            rep, skip = "C", 1
        elif s[i:i + 3] == "SCH":
            rep, skip = "SSS", 3
        elif s[i:i + 2] == "PH":
            rep, skip = "FF", 2
        elif c == "H" and (prev not in "AEIOU"
                           or (i + 1 < len(s)
                               and s[i + 1] not in "AEIOU")):
            rep, skip = prev, 1
        elif c == "W" and prev in "AEIOU":
            rep, skip = prev, 1
        else:
            skip = 1
        for r in rep:
            if not body or body[-1] != r:
                body.append(r)
        prev = rep[-1] if rep else prev
        i += skip
    # terminal rules
    if body and body[-1] in ("S",):
        body.pop()
    if len(body) >= 2 and body[-2:] == ["A", "Y"]:
        body = body[:-2] + ["Y"]
    if body and body[-1] == "A":
        body.pop()
    return (key + "".join(body))[:6]


def soundex_array(names) -> np.ndarray:
    return np.array([soundex(str(n)) for n in names], object)


def nysiis_array(names) -> np.ndarray:
    return np.array([nysiis(str(n)) for n in names], object)
