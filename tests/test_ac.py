"""Dictionary-automaton engines: AhoCorasick vs VectorScanner vs brute
force, including the overlapping/nested-pattern cases a regex
alternation cannot express (VERDICT round-1 item 2)."""

import random
import re

import numpy as np
import pytest

from xlink_ray.functions.ac import AhoCorasick, VectorScanner


def brute_all(text: str, patterns: list[str]) -> set[tuple[int, int]]:
    out = set()
    for pid, p in enumerate(patterns):
        start = 0
        while True:
            i = text.find(p, start)
            if i < 0:
                break
            out.add((i, pid))
            start = i + 1  # overlapping
    return out


NESTED = ["he", "she", "his", "hers", "h", "ers", "e"]


def test_ac_overlapping_nested():
    text = "ushers and his heroes"
    ac = AhoCorasick(NESTED)
    assert set(ac.find_all(text)) == brute_all(text, NESTED)


def test_vector_scanner_equals_ac_nested():
    text = "ushers she h hhh hershey"
    ac = AhoCorasick(NESTED)
    vs = VectorScanner(NESTED)
    starts, pids = vs.find_all(VectorScanner.codepoints(text))
    assert set(zip(starts.tolist(), pids.tolist())) == set(ac.find_all(text))


def test_self_overlapping_pattern():
    # 'aa' occurs 3 times (overlapping) in 'aaaa' — regex findall sees 2
    text = "aaaa"
    vs = VectorScanner(["aa"])
    starts, _ = vs.find_all(VectorScanner.codepoints(text))
    assert starts.tolist() == [0, 1, 2]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_equivalence(seed):
    rng = random.Random(seed)
    alpha = "abc"
    patterns = list({"".join(rng.choice(alpha) for _ in range(rng.randint(1, 4)))
                     for _ in range(12)})
    text = "".join(rng.choice(alpha + " ") for _ in range(400))
    ac = AhoCorasick(patterns)
    vs = VectorScanner(patterns)
    exp = brute_all(text, patterns)
    assert set(ac.find_all(text)) == exp
    starts, pids = vs.find_all(VectorScanner.codepoints(text))
    assert set(zip(starts.tolist(), pids.tolist())) == exp


def test_nonoverlapping_matches_regex_semantics():
    # greedy leftmost/longest-at-position == longest-first re alternation
    rng = random.Random(9)
    patterns = list({"".join(rng.choice("ab") for _ in range(rng.randint(1, 3)))
                     for _ in range(6)})
    rx = re.compile("|".join(re.escape(p) for p in sorted(patterns, key=len, reverse=True)))
    vs = VectorScanner(patterns)
    pat_index = {p: i for i, p in enumerate(patterns)}
    for trial in range(20):
        text = "".join(rng.choice("ab ") for _ in range(120))
        exp = [(m.start(), pat_index[m.group(0)]) for m in rx.finditer(text)]
        starts, pids = vs.find_nonoverlapping(VectorScanner.codepoints(text))
        assert list(zip(starts.tolist(), pids.tolist())) == exp


def test_unicode_and_separator():
    patterns = ["北京", "京大", "大学"]
    vs = VectorScanner(patterns)
    ac = AhoCorasick(patterns)
    text = "北京大学\x00北京"
    starts, pids = vs.find_all(VectorScanner.codepoints(text))
    assert set(zip(starts.tolist(), pids.tolist())) == set(ac.find_all(text))
    # no match spans the NUL separator
    assert all(s + len(patterns[p]) <= 4 or s >= 5 for s, p in zip(starts.tolist(), pids.tolist()))


def test_scales_past_regex_limit():
    # a vocabulary far beyond what a compiled alternation tolerates
    patterns = [f"entity{i:05d}" for i in range(20000)]
    vs = VectorScanner(patterns)
    text = "x entity00000 y entity19999 z entity00500entity00501"
    starts, pids = vs.find_all(VectorScanner.codepoints(text))
    got = {(s, p) for s, p in zip(starts.tolist(), pids.tolist())}
    assert got == {(2, 0), (16, 19999), (30, 500), (41, 501)}
