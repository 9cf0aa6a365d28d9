"""Fidelity linker — the reference's online prediction path P1-P2 +
P8-P10 (reference modules/prob_gm_predictors/xlink.py:38-354,
modules/MentionParser.py:70-100) as a batch actor stage, semantics
reproduced including output-visible bugs (SURVEY.md §7.4.2):

* ``solve_conflict``: sort matches by start, group transitively
  overlapping intervals, keep the FIRST longest-label match per group,
* ``predict_has_prob``: unambiguous embedded mentions seed every
  candidate's context-entities similarity (the seed list includes the
  mention's own candidate); believe v2 = ces × cws × P(e|m)^0.02;
  keep iff link_prob(m) > 0.008 and (believe + link_prob)/2 > 0.2,
* ``predict_no_prob``: candidates pass at cws > 0.3; the seed
  "max" selection never updates ``max_sim``, so the LAST candidate
  with a computed cws wins (reference xlink.py:217-222 bug —
  reproduced); believe = 0.5·cws + 0.5·ces, keep > 0.5,
* ``merge_two_result``: ``len(mentions_has_prob) is not None`` is
  always truthy (reference xlink.py:299,310), so only mentions with a
  mention-level believe score — exactly the has-prob results — ever
  reach the merged output; no-prob mentions are computed and then
  always discarded. Reproduced faithfully; the no-prob list is still
  exposed via ``link_document(..., return_no_prob=True)`` for parity
  inspection.

Deliberate divergences (documented, unreachable on embedded
dictionaries): candidates lacking an embedding are skipped where the
reference would raise (has-prob step 2 ``candidates[0]`` on an empty
list; ``None > -1`` in the no-prob seed loop).

Scan note: candidate generation needs ALL dictionary matches
(including overlapping ones — the conflict grouping is transitive);
the scanner is ``functions.ac.VectorScanner`` (vectorized AC
automaton, all-overlapping match set — tests pin equality with
``AhoCorasick``). The word parser is whitespace split (the reference's
EnWordParser; its bd path uses jieba, unavailable here — see
``functions.segment`` for the CJK path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from xlink_ray.functions.ac import VectorScanner

__all__ = ["LinkerState", "link_document", "FidelityLinkActor", "merge_trie_results", "MultiDictParser"]

CONTEXT_WINDOW = 50
POPULARITY_POWER = 0.02
LINK_PROB_TH = 0.008
MENTION_BELIEVE_TH = 0.2
NO_PROB_CWS_TH = 0.3
NO_PROB_SEED_TH = 0.45
NO_PROB_BELIEVE_TH = 0.5
NO_PROB_W = 0.5


class LinkerState:
    def __init__(
        self,
        ma_dict: dict[str, list[str]],
        tt_dict: dict[str, list[str]],
        e_given_m: dict[tuple[str, str], float],
        link_prob: dict[str, float],
        word_vecs: dict[str, np.ndarray],
        entity_vecs: dict[str, np.ndarray],
    ):
        self.ma_dict = {m: list(c) for m, c in ma_dict.items()}
        self.tt_dict = {m: list(c) for m, c in tt_dict.items()}
        self.ma_scanner = _DictScanner(self.ma_dict)
        self.tt_scanner = _DictScanner(self.tt_dict)
        self.e_given_m = e_given_m
        self.link_prob = link_prob
        self.word_vecs = {w: np.asarray(v, dtype=np.float64) for w, v in word_vecs.items()}
        self.entity_vecs = {e: np.asarray(v, dtype=np.float64) for e, v in entity_vecs.items()}


class _DictScanner:
    """Dictionary automaton over a (mention → candidates) dict: all
    overlapping matches via ``VectorScanner`` (AC-equivalent)."""

    def __init__(self, dict_: dict[str, list[str]]):
        self.mentions = list(dict_.keys())
        self.cands = [dict_[m] for m in self.mentions]
        self.scanner = VectorScanner(self.mentions) if self.mentions else None

    def scan(self, text: str):
        """All (start, end, label, candidates) matches, overlapping
        included — the match set of the reference's automaton."""
        if self.scanner is None or not text:
            return []
        starts, pids = self.scanner.find_all(VectorScanner.codepoints(text))
        return [
            (int(s), int(s) + len(self.mentions[p]), self.mentions[p], self.cands[p])
            for s, p in zip(starts, pids)
        ]


def _scan_all(text: str, scanner: "_DictScanner"):
    return scanner.scan(text)


def _solve_conflict(matches):
    """Reference MentionParser.solve_conflict:70-100."""
    if not matches:
        return []
    matches = sorted(matches, key=lambda it: it[0])
    out = []
    group = [matches[0]]
    end = matches[0][1]
    for item in matches[1:]:
        if item[0] < end:
            group.append(item)
            end = max(item[1], end)
        else:
            out.append(_first_longest(group))
            group = [item]
            end = item[1]
    out.append(_first_longest(group))
    return out


def _first_longest(group):
    best_len, best = -1, None
    for item in group:
        if len(item[2]) > best_len:
            best_len = len(item[2])
            best = item
    return best


def _context_words(state: LinkerState, text: str, start: int, end: int):
    lo = max(0, start - CONTEXT_WINDOW)
    hi = min(len(text), end + CONTEXT_WINDOW)
    prev = [w for w in text[lo:start].split() if w in state.word_vecs]
    after = [w for w in text[end:hi].split() if w in state.word_vecs]
    return prev, after


def _cws(state: LinkerState, entity_id: str, context_words) -> float:
    """Reference cal_candidate_context_words_sim (xlink.py:318-326)."""
    if len(context_words) == 0:
        return 0.0
    dim = len(next(iter(state.word_vecs.values()))) if state.word_vecs else 0
    ctx = np.zeros(dim)
    for w in context_words:
        ctx += state.word_vecs[w]
    ctx /= len(context_words)
    ev = state.entity_vecs[entity_id]
    return float(np.matmul(ev, ctx) / (np.linalg.norm(ev, 2) * np.linalg.norm(ctx, 2)))


def _ces(state: LinkerState, entity_id: str, seed_entity_ids) -> float:
    """Reference cal_candidate_context_entities_sim (xlink.py:328-336):
    empty seed set → 1."""
    if len(seed_entity_ids) == 0:
        return 1.0
    dim = len(next(iter(state.entity_vecs.values())))
    ctx = np.zeros(dim)
    for eid in seed_entity_ids:
        ctx += state.entity_vecs[eid]
    ctx /= len(seed_entity_ids)
    ev = state.entity_vecs[entity_id]
    return float(np.matmul(ev, ctx) / (np.linalg.norm(ev, 2) * np.linalg.norm(ctx, 2)))


def _predict_has_prob(state: LinkerState, document: str):
    mentions = _solve_conflict(_scan_all(document, state.ma_scanner))
    enriched = []  # (start, end, label, cands, ctx_words)
    seeds = []  # seed entity ids (unambiguous embedded mentions)
    for start, end, label, cands in mentions:
        prev, after = _context_words(state, document, start, end)
        ctx = prev + after
        if len(cands) == 1 and cands[0] in state.entity_vecs:
            seeds.append(cands[0])
        enriched.append((start, end, label, cands, ctx))

    results = []
    for start, end, label, cands, ctx in enriched:
        scored = []
        for eid in cands:
            if eid not in state.entity_vecs:
                continue  # divergence: reference would crash downstream
            cws = _cws(state, eid, ctx)
            ces = _ces(state, eid, seeds)
            egm = state.e_given_m.get((label, eid))
            believe = ces * cws * float(np.power(egm, POPULARITY_POWER)) if egm is not None else 0.0
            scored.append((eid, believe))
        if not scored:
            continue
        # stable sort by believe desc keeps first-listed candidate on ties
        scored.sort(key=lambda t: t[1], reverse=True)
        best_eid, best_believe = scored[0]
        lp = state.link_prob.get(label)
        if lp is not None and lp > LINK_PROB_TH:
            mention_believe = (best_believe + lp) / 2.0
            if mention_believe > MENTION_BELIEVE_TH:
                results.append((start, end, label, best_eid, mention_believe, "ma"))
    return results


def _predict_no_prob(state: LinkerState, document: str):
    mentions = _solve_conflict(_scan_all(document, state.tt_scanner))
    kept = []  # (start, end, label, [(eid, cws)], has_seed)
    for start, end, label, cands in mentions:
        prev, after = _context_words(state, document, start, end)
        ctx = prev + after
        scored = []
        for eid in cands:
            if eid in state.entity_vecs:
                scored.append((eid, _cws(state, eid, ctx)))
        if any(c > NO_PROB_CWS_TH for _, c in scored):
            kept.append([start, end, label, scored, None])

    # seed selection — reference bug reproduced: max_sim never updated,
    # so the LAST candidate with a computed cws wins
    seed_ids = []
    for m in kept:
        max_cand = None
        for eid, c in m[3]:
            if c > -1:
                max_cand = (eid, c)
        if max_cand is not None and max_cand[1] > NO_PROB_SEED_TH:
            seed_ids.append(max_cand[0])
            m[4] = max_cand  # resolved seed mention

    results = []
    for start, end, label, scored, resolved in kept:
        if resolved is None:
            seeds_for_m = seed_ids
        else:
            own = {eid for eid, _ in scored}
            seeds_for_m = [s for s in seed_ids if s not in own]
        best = None
        for eid, c in scored:
            believe = NO_PROB_W * c + (1 - NO_PROB_W) * _ces(state, eid, seeds_for_m)
            if best is None or believe > best[1]:
                best = (eid, believe)
        if best is not None and best[1] > NO_PROB_BELIEVE_TH:
            results.append((start, end, label, best[0], best[1], "tt"))
    return results


def link_document(state: LinkerState, document: str, return_no_prob: bool = False):
    """P8 ∥ P9 → P10 merge. Reference merge bug reproduced: only
    mentions with a mention-level believe score (the has-prob results)
    survive; the no-prob list is discarded by the always-truthy
    ``is not None`` test (xlink.py:299,310)."""
    has_prob = _predict_has_prob(state, document)
    no_prob = _predict_no_prob(state, document)
    merged = sorted(has_prob, key=lambda t: t[0])
    if return_no_prob:
        return merged, no_prob
    return merged


def merge_trie_results(
    parse_result: "dict[str, list]", weights: "dict[str, float]"
):
    """P3 multi-trie k-way heap merge — reference
    modules/MentionParser.py:141-210, reproduced exactly, quirks
    included:

    * per-trie lists must be start-sorted (the per-trie parser output);
      heads go into a heap keyed (start, end, name, weight, idx),
    * items whose start < the smallest head's end form a conflict
      group (the smallest is always its own member); the single-member
      case emits and advances, otherwise the highest-WEIGHT member
      survives IN THE HEAP (emitted on a later round) and every other
      member is deleted and advanced — first member wins weight ties
      (strict ``>``),
    * the deletion matcher compares only (start, end) — its third
      clause is the reference's ``head_item[2] == head_item[2]``
      always-true typo — so when two tries yield identical spans the
      FIRST heap-array match is removed regardless of which trie it
      came from. Reproduced as spec.

    Items are (start, end, payload) tuples; returns merged payload
    tuples in emission order.
    """
    import heapq

    head_items: list = []
    idx_state: dict[str, int] = {}
    for name in parse_result:
        if len(parse_result[name]) == 0:
            continue
        start, end, payload = parse_result[name][0]
        heapq.heappush(head_items, (start, end, name, weights[name], 0, payload))

    valid: list = []
    while len(head_items) > 0:
        conflict_items = []
        smallest = head_items[0]
        for item in head_items:
            if item[0] < smallest[1]:
                conflict_items.append(item)
        if len(conflict_items) == 1:
            valid.append((smallest[0], smallest[1], smallest[5]))
            heapq.heappop(head_items)
            start, end, name, w, idx, payload = smallest
            if idx + 1 < len(parse_result[name]):
                nstart, nend, npayload = parse_result[name][idx + 1]
                heapq.heappush(
                    head_items, (nstart, nend, name, weights[name], idx + 1, npayload)
                )
        else:
            highest_weight = conflict_items[0][3]
            highest_idx = 0
            for i in range(1, len(conflict_items)):
                if conflict_items[i][3] > highest_weight:
                    highest_weight = conflict_items[i][3]
                    highest_idx = i
            for i, item in enumerate(conflict_items):
                if i != highest_idx:
                    for hi, head_item in enumerate(head_items):
                        # reference typo: third clause compares a value
                        # to itself — only (start, end) discriminate
                        if head_item[0] == item[0] and head_item[1] == item[1]:
                            del head_items[hi]
                            break
                    start, end, name, w, idx, payload = item
                    if idx + 1 < len(parse_result[name]):
                        nstart, nend, npayload = parse_result[name][idx + 1]
                        head_items.append(
                            (nstart, nend, name, weights[name], idx + 1, npayload)
                        )
            heapq.heapify(head_items)
    return valid


class MultiDictParser:
    """P3 front end: K dictionaries with weights → per-document merged
    mention list. Each dictionary scans with the vectorized automaton
    and resolves its own overlaps first (reference
    TrieTreeMentionParser.parse → solve_conflict), then the k-way heap
    merge arbitrates across dictionaries by weight."""

    def __init__(self, dicts: "dict[str, dict[str, list[str]]]", weights: "dict[str, float]"):
        self.scanners = {name: _DictScanner(d) for name, d in dicts.items()}
        self.weights = dict(weights)

    def parse(self, text: str):
        per_trie = {}
        for name, scanner in self.scanners.items():
            matches = _solve_conflict(scanner.scan(text))
            per_trie[name] = [
                (start, end, (label, cands)) for start, end, label, cands in matches
            ]
        return [
            (start, end, label, cands)
            for start, end, (label, cands) in merge_trie_results(per_trie, self.weights)
        ]


class FidelityLinkActor:
    """Actor-pool stage: corpus (doc_id, text) → reference-fidelity
    links (doc_id, start, end, label, entity_id, believe, parse_from)."""

    def __init__(self, state_ref: "ray.ObjectRef"):
        self.state = ray.get(state_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "start": [], "end": [], "label": [],
                "entity_id": [], "believe": [], "parse_from": []}
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for start, end, label, eid, believe, pfrom in link_document(self.state, text):
                rows["doc_id"].append(did)
                rows["start"].append(start)
                rows["end"].append(end)
                rows["label"].append(label)
                rows["entity_id"].append(eid)
                rows["believe"].append(believe)
                rows["parse_from"].append(pfrom)
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.string()),
                "start": pa.array(rows["start"], pa.int64()),
                "end": pa.array(rows["end"], pa.int64()),
                "label": pa.array(rows["label"], pa.string()),
                "entity_id": pa.array(rows["entity_id"], pa.string()),
                "believe": pa.array(rows["believe"], pa.float64()),
                "parse_from": pa.array(rows["parse_from"], pa.string()),
            }
        )
