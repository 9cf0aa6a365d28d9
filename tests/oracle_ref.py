"""Single-process transcription oracles of reference algorithms, used
ONLY by tests as the source of truth (SURVEY.md §5.2). Implemented with
a cursor scan — deliberately a different decomposition from
xlink_ray.stages.extract (which uses split), so the two implementations
cross-check each other against reference utils/mention.py:1-41
semantics.
"""

from __future__ import annotations


def ref_extract(doc: str) -> tuple[list[tuple[str, str, int]], str]:
    i = doc.find("[[")
    if i < 0:
        return [], doc
    mentions: list[tuple[str, str, int]] = []
    plain = doc[:i]
    cur = i + 2
    n = len(doc)
    while cur <= n:
        nxt = doc.find("[[", cur)
        seg = doc[cur:nxt] if nxt >= 0 else doc[cur:]
        seg_segs = seg.split("]]")
        if "|" in seg_segs[0]:
            iid, mention = seg_segs[0].split("|", 1)
            mentions.append((mention, iid, len(plain)))
            plain += mention
            if len(seg_segs) > 1:
                plain += seg_segs[1]
        if nxt < 0:
            break
        cur = nxt + 2
    return mentions, plain
