"""Per-read oracle for BBDuk scan semantics (tests only).

Direct Python transliteration of the reference loops:
  countSetKmers  — bbduk/BBDukProcessorS.java:1534-1596
  ktrim          — :1993-2140 (including short-kmer Scanning4/Scanning5)
  getValue       — bbduk/BBDukIndexMod.java:461-513 (qhdist recursion)

Used as ground truth against the vectorized kernels in ops/bbduk_scan.py.
The table here is a plain dict {canonical_key: id}.
"""

from __future__ import annotations

from ..ops.kmers import kmer_mask, length_mask, rc_kmer

BIG = 999999999


def get_value(table, kmer, rkmer, klen, mid_mask, qhdist, rcomp=True):
    mx = max(kmer, rkmer) if rcomp else kmer
    mm = mid_mask if klen is not None else -1
    key = (mx & mm) | length_mask(klen)
    vid = table.get(key, 0)
    if vid < 1 and qhdist > 0:
        for j in range(4):
            for i in range(klen):
                temp = (kmer & ~(3 << (2 * i))) | (j << (2 * i))
                if temp != kmer:
                    rtemp = rc_kmer(temp, klen)
                    vid = get_value(
                        table, temp, rtemp, klen, mid_mask, qhdist - 1, rcomp
                    )
                    if vid >= 1:
                        return vid
    return vid


def _bounds(n, restrict_left, restrict_right):
    start = 0 if restrict_right < 1 else max(0, n - restrict_right)
    stop = n if restrict_left < 1 else min(n, restrict_left)
    return start, stop


def full_scan(codes, table, k, minlen2, mid_mask=-1, qhdist=0,
              restrict_left=0, restrict_right=0):
    """The shared rolling loop; yields (i, id) for every eligible hit."""
    n = len(codes)
    mask = kmer_mask(k)
    kmer = rkmer = 0
    ln = 0
    start, stop = _bounds(n, restrict_left, restrict_right)
    hits = []
    for i in range(start, stop):
        c = codes[i]
        defined = c < 4
        x = int(c) if defined else 0
        x2 = (3 - int(c)) if defined else 0
        kmer = ((kmer << 2) | x) & mask
        rkmer = ((rkmer >> 2) | (x2 << (2 * (k - 1)))) & mask
        if not defined:
            ln = 0
            rkmer = 0
        else:
            ln += 1
        if ln >= minlen2 and i >= k - 1:
            vid = get_value(table, kmer, rkmer, k, mid_mask, qhdist)
            if vid > 0:
                hits.append((i, vid))
    return hits


def count_set_kmers(codes, table, k, max_bad_kmers, minlen2=None, mid_mask=-1,
                    qhdist=0, restrict_left=0, restrict_right=0):
    """Returns (found, credited_id). found stops at max_bad_kmers+1."""
    if len(codes) < k:
        return 0, 0
    minlen2 = minlen2 or k
    found = 0
    for i, vid in full_scan(codes, table, k, minlen2, mid_mask, qhdist,
                            restrict_left, restrict_right):
        if found == max_bad_kmers:
            return found + 1, vid
        found += 1
    return found, 0


def ktrim(codes, table, k, mink, ktrim_left, ktrim_right, qhdist=0,
          restrict_left=0, restrict_right=0, trim_pad=0, exclusive=False):
    """Returns (found, id0, keep_from, keep_to) — keep range inclusive,
    or None when no hit. Replicates ktrim() for a single direction or both
    (ktrimTips is two separate calls by the driver)."""
    n = len(codes)
    min_needed = max(1, min(k, mink) if mink else k)
    if n < min_needed:
        return 0, 0, None, None
    start, stop = _bounds(n, restrict_left, restrict_right)
    found = 0
    id0 = 0
    min_loc, max_loc = BIG, -1
    min_loc_ex, max_loc_ex = BIG, -1
    for i, vid in full_scan(codes, table, k, k, -1, qhdist,
                            restrict_left, restrict_right):
        if id0 <= 0:
            id0 = vid
        min_loc = min(min_loc, i - k + 1)
        max_loc = i
        found += 1
    if min_loc != min_loc_ex:
        min_loc_ex = min_loc + k
    if max_loc != max_loc_ex:
        max_loc_ex = max_loc - k
    if mink and found == 0:
        mask = kmer_mask(k)
        if ktrim_left:
            kmer = rkmer = 0
            ln = 0
            for i in range(start, min(k, stop)):
                c = codes[i]
                x = int(c) if c < 4 else 0
                x2 = (3 - int(c)) if c < 4 else 0
                kmer = ((kmer << 2) | x) & mask
                rkmer = rkmer | (x2 << (2 * ln))
                ln += 1
                if ln >= mink:
                    vid = get_value(table, kmer, rkmer, ln, -1, qhdist)
                    if vid > 0:
                        if id0 <= 0:
                            id0 = vid
                        min_loc = 0
                        min_loc_ex = min(min_loc_ex, i + 1)
                        max_loc = max(max_loc, i)
                        max_loc_ex = max(max_loc_ex, 0)
                        found += 1
        if ktrim_right:
            kmer = rkmer = 0
            ln = 0
            for i in range(stop - 1, max(-1, stop - k), -1):
                c = codes[i]
                x = int(c) if c < 4 else 0
                x2 = (3 - int(c)) if c < 4 else 0
                kmer = kmer | (x << (2 * ln))
                rkmer = ((rkmer << 2) | x2) & mask
                ln += 1
                if ln >= mink:
                    vid = get_value(table, kmer, rkmer, ln, -1, qhdist)
                    if vid > 0:
                        if id0 <= 0:
                            id0 = vid
                        min_loc = i
                        min_loc_ex = min(min_loc_ex, n)
                        max_loc = n - 1
                        max_loc_ex = max(max_loc_ex, i - 1)
                        found += 1
    if found == 0:
        return 0, 0, None, None
    if trim_pad:
        max_loc = _mid(0, max_loc + trim_pad, n)
        min_loc = _mid(0, min_loc - trim_pad, n)
        max_loc_ex = _mid(0, max_loc_ex + trim_pad, n)
        min_loc_ex = _mid(0, min_loc_ex - trim_pad, n)
    if ktrim_left:
        a = (max_loc_ex + 1) if exclusive else (max_loc + 1)
        keep_from, keep_to = _trim_to(n, a, n - 1)
    else:
        b = (min_loc_ex - 1) if exclusive else (min_loc - 1)
        keep_from, keep_to = _trim_to(n, 0, b)
    return found, id0, keep_from, keep_to


def _mid(a, b, c):
    return sorted((a, b, c))[1]


def _trim_to(n, left_loc, right_loc):
    """trimToPosition semantics with minResultingLength=1
    (shared/TrimRead.java:273, trimByAmount :306-330): over-trims keep the
    single leftmost base. Returns (found..) tail as (keep_from, keep_to)."""
    left_amt = max(left_loc, 0)
    right_amt = max(n - right_loc - 1, 0)
    if left_amt + right_amt + 1 > n:
        right_amt = max(1, n - 1)
        left_amt = 0
    return (left_amt, n - 1 - right_amt)
