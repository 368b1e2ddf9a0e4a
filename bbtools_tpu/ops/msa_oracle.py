"""Per-alignment numpy oracle of MultiStateAligner11ts (tests only).

Direct row-order transliteration of fillUnlimited (:643-860) and
fillLimitedX (:128-610) over 2-bit codes (code >= 4 == 'N'). Returns the
three packed matrices (score, time separated) plus the reference's result
tuple {rows, maxCol, maxState, maxScore}. Used as ground truth for the
batched wavefront kernel in ops/msa.py.
"""

from __future__ import annotations

import numpy as np

from .msa_constants import (
    POINTS_SUB3,
    BARRIER_D1,
    BARRIER_I1,
    LIMIT_FOR_COST_3,
    LIMIT_FOR_COST_4,
    LIMIT_FOR_COST_5,
    MASK5,
    MAX_TIME,
    MIN_SCORE_ADJUST,
    MODE_DEL,
    MODE_INS,
    MODE_MS,
    POINTS_DEL,
    POINTS_DEL2,
    POINTS_DEL3,
    POINTS_DEL4,
    POINTS_DEL5,
    POINTS_DEL_REF_N,
    POINTS_INS_ARRAY,
    POINTS_MATCH,
    POINTS_MATCH2,
    POINTS_NOCALL,
    POINTS_SUB,
    POINTS_SUB_ARRAY,
    POINTS_SUBR,
    calc_del_score,
    calc_ins_score,
)


def _init(rows, cols):
    score = np.zeros((3, rows + 1, cols + 1), dtype=np.int64)
    time = np.zeros((3, rows + 1, cols + 1), dtype=np.int64)
    # column 0: cumulative insertion penalties (ctor :91-101)
    col0 = np.zeros(rows + 1, dtype=np.int64)
    for i in range(rows + 1):
        prev = 0 if i < 2 else col0[i - 1]
        col0[i] = prev + POINTS_INS_ARRAY[min(i, 603)]
    for m in range(3):
        score[m, :, 0] = col0
    return score, time


def _del_ext(streak):
    if streak == 0:
        return POINTS_DEL
    if streak < LIMIT_FOR_COST_3:
        return POINTS_DEL2
    if streak < LIMIT_FOR_COST_4:
        return POINTS_DEL3
    if streak < LIMIT_FOR_COST_5:
        return POINTS_DEL4
    return POINTS_DEL5 if (streak & MASK5) == 0 else 0


def fill_unlimited(read, ref):
    """read/ref: uint8 code arrays. Returns (score, time, result)."""
    rows, cols = len(read), len(ref)
    score, time = _init(rows, cols)
    maxgain = (rows - 1) * POINTS_MATCH2 + POINTS_MATCH
    subfloor = -2 * maxgain
    B_I2 = rows - BARRIER_I1
    B_I2b = cols - 1
    B_D2 = rows - BARRIER_D1
    for row in range(1, rows + 1):
        for col in range(1, cols + 1):
            call1 = read[row - 1]
            ref1 = ref[col - 1]
            match = call1 == ref1 and ref1 < 4
            prev_match = (
                row >= 2 and col >= 2
                and read[row - 2] == ref[col - 2] and ref[col - 2] < 4
            )
            # MS
            s_diag = score[MODE_MS, row - 1, col - 1]
            s_del = score[MODE_DEL, row - 1, col - 1]
            s_ins = score[MODE_INS, row - 1, col - 1]
            streak = time[MODE_MS, row - 1, col - 1]
            if match:
                sMS = s_diag + (POINTS_MATCH2 if prev_match else POINTS_MATCH)
                sD = s_del + POINTS_MATCH
                sI = s_ins + POINTS_MATCH
                if sMS >= sD and sMS >= sI:
                    sc, tm = sMS, (streak + 1 if prev_match else 1)
                elif sD >= sI:
                    sc, tm = sD, 1
                else:
                    sc, tm = sI, 1
            else:
                if ref1 < 4 and call1 < 4:
                    sMS = s_diag + (
                        (POINTS_SUBR if streak <= 1 else POINTS_SUB)
                        if prev_match
                        else POINTS_SUB_ARRAY[min(streak + 1, 603)]
                    )
                else:
                    sMS = s_diag + POINTS_NOCALL
                sD = s_del + POINTS_SUB
                sI = s_ins + POINTS_SUB
                if sMS >= sD and sMS >= sI:
                    sc, tm = sMS, (1 if prev_match else streak + 1)
                elif sD >= sI:
                    sc, tm = sD, 1
                else:
                    sc, tm = sI, 1
            if tm > MAX_TIME:
                tm = MAX_TIME - MASK5
            score[MODE_MS, row, col] = sc
            time[MODE_MS, row, col] = tm
            # DEL
            if row < BARRIER_D1 or row > B_D2:
                score[MODE_DEL, row, col] = subfloor
                time[MODE_DEL, row, col] = 0
            else:
                streak = time[MODE_DEL, row, col - 1]
                sMS = score[MODE_MS, row, col - 1] + POINTS_DEL
                sD = score[MODE_DEL, row, col - 1] + _del_ext(streak)
                if ref1 >= 4:
                    sMS += POINTS_DEL_REF_N
                    sD += POINTS_DEL_REF_N
                if sMS >= sD:
                    sc, tm = sMS, 1
                else:
                    sc, tm = sD, streak + 1
                if tm > MAX_TIME:
                    tm = MAX_TIME - MASK5
                score[MODE_DEL, row, col] = sc
                time[MODE_DEL, row, col] = tm
            # INS
            if (row < BARRIER_I1 and col > 1) or (row > B_I2 and col < B_I2b):
                score[MODE_INS, row, col] = subfloor
                time[MODE_INS, row, col] = 0
            else:
                streak = time[MODE_INS, row - 1, col]
                sMS = score[MODE_MS, row - 1, col] + POINTS_INS_ARRAY[1]
                sI = (
                    score[MODE_INS, row - 1, col]
                    + POINTS_INS_ARRAY[min(streak + 1, 603)]
                )
                if sMS >= sI:
                    sc, tm = sMS, 1
                else:
                    sc, tm = sI, streak + 1
                if tm > MAX_TIME:
                    tm = MAX_TIME - MASK5
                score[MODE_INS, row, col] = sc
                time[MODE_INS, row, col] = tm
    return score, time, _final(score, rows, cols)


def _final(score, rows, cols):
    max_col, max_state, max_score = -1, -1, -(1 << 62)
    for state in range(3):
        for col in range(1, cols + 1):
            x = score[state, rows, col]
            if x > max_score:
                max_score = x
                max_col = col
                max_state = state
    return rows, max_col, max_state, int(max_score)


def fill_limited(read, ref, min_score):
    """fillLimitedX transliteration (with the pruning invariant); computes
    every cell (equivalent to the live-band skipping, see ops/msa.py doc).
    Returns (score, time, result-or-None)."""
    rows, cols = len(read), len(ref)
    # dispatch condition (:137): delegate to unlimited
    if min_score < 1 or (cols + rows < 90) or (cols > rows + min(170, rows + 20)):
        sc, tm, res = fill_unlimited(read, ref)
        return sc, tm, res
    min_score = min_score - MIN_SCORE_ADJUST
    score, time = _init(rows, cols)
    maxgain = (rows - 1) * POINTS_MATCH2 + POINTS_MATCH
    floor = min_score - maxgain
    subfloor = floor - 5 * POINTS_MATCH2
    B_I2 = rows - BARRIER_I1
    B_I2b = cols - 1
    B_D2 = rows - BARRIER_D1
    # vert/horiz limits (:204-230)
    vert = np.zeros(rows + 1, dtype=np.int64)
    vert[rows] = min_score
    prev_def = False
    for i in range(rows - 1, -1, -1):
        if read[i] < 4:
            vert[i] = max(vert[i + 1] - (POINTS_MATCH2 if prev_def else POINTS_MATCH), floor)
            prev_def = True
        else:
            vert[i] = max(vert[i + 1] - POINTS_NOCALL, floor)
            prev_def = False
    horiz = np.zeros(cols + 1, dtype=np.int64)
    horiz[cols] = min_score
    prev_def = False
    for i in range(cols - 1, -1, -1):
        if ref[i] < 4:
            horiz[i] = max(horiz[i + 1] - (POINTS_MATCH2 if prev_def else POINTS_MATCH), floor)
            prev_def = True
        else:
            horiz[i] = max(horiz[i + 1] - 0, floor)  # POINTS_NOREF
            prev_def = False
    for row in range(1, rows + 1):
        vlimit = vert[row]
        for col in range(1, cols + 1):
            call1 = read[row - 1]
            ref1 = ref[col - 1]
            match = call1 == ref1 and ref1 < 4
            prev_match = (
                row >= 2 and col >= 2
                and read[row - 2] == ref[col - 2] and ref[col - 2] < 4
            )
            limit = max(vlimit, horiz[col])
            limit3 = max(floor, (limit - POINTS_MATCH2) if match else (limit - POINTS_SUB3))
            del_needed = max(0, row - col - 1)
            ins_needed = max(0, (rows - row) - (cols - col) - 1)
            del_penalty = int(calc_del_score(del_needed))
            ins_penalty = int(calc_ins_score(ins_needed))
            s_diag_ms = score[MODE_MS, row - 1, col - 1]
            s_del_ms = score[MODE_DEL, row - 1, col - 1]
            s_ins_ms = score[MODE_INS, row - 1, col - 1]
            s_diag_del = score[MODE_MS, row, col - 1]
            s_del_del = score[MODE_DEL, row, col - 1]
            s_diag_ins = score[MODE_MS, row - 1, col]
            s_ins_ins = score[MODE_INS, row - 1, col]
            # MS
            if s_diag_ms <= limit3 and s_del_ms <= limit3 and s_ins_ms <= limit3:
                score[MODE_MS, row, col] = subfloor
                time[MODE_MS, row, col] = 0
            else:
                streak = time[MODE_MS, row - 1, col - 1]
                if match:
                    sMS = s_diag_ms + (POINTS_MATCH2 if prev_match else POINTS_MATCH)
                    sD = s_del_ms + POINTS_MATCH
                    sI = s_ins_ms + POINTS_MATCH
                    if sMS >= sD and sMS >= sI:
                        sc, tm = sMS, (streak + 1 if prev_match else 1)
                    elif sD >= sI:
                        sc, tm = sD, 1
                    else:
                        sc, tm = sI, 1
                else:
                    if ref1 < 4 and call1 < 4:
                        sMS = s_diag_ms + (
                            (POINTS_SUBR if streak <= 1 else POINTS_SUB)
                            if prev_match
                            else POINTS_SUB_ARRAY[min(streak + 1, 603)]
                        )
                    else:
                        sMS = s_diag_ms + POINTS_NOCALL
                    sD = s_del_ms + POINTS_SUB
                    sI = s_ins_ms + POINTS_SUB
                    if sMS >= sD and sMS >= sI:
                        sc, tm = sMS, (1 if prev_match else streak + 1)
                    elif sD >= sI:
                        sc, tm = sD, 1
                    else:
                        sc, tm = sI, 1
                if del_needed > 0:
                    limit2 = limit - del_penalty
                elif ins_needed > 0:
                    limit2 = limit - ins_penalty
                else:
                    limit2 = limit
                if sc < limit2:
                    sc = subfloor
                if tm > MAX_TIME:
                    tm = MAX_TIME - MASK5
                score[MODE_MS, row, col] = sc
                time[MODE_MS, row, col] = tm
            # DEL
            if (s_diag_del <= limit and s_del_del <= limit) or row < BARRIER_D1 or row > B_D2:
                score[MODE_DEL, row, col] = subfloor
                time[MODE_DEL, row, col] = 0
            else:
                streak = time[MODE_DEL, row, col - 1]
                sMS = s_diag_del + POINTS_DEL
                sD = s_del_del + _del_ext(streak)
                if ref1 >= 4:
                    sMS += POINTS_DEL_REF_N
                    sD += POINTS_DEL_REF_N
                if sMS >= sD:
                    sc, tm = sMS, 1
                else:
                    sc, tm = sD, streak + 1
                if ins_needed > 0:
                    limit2 = limit - ins_penalty
                elif del_needed > 0:
                    limit2 = limit - int(calc_del_score(tm + del_needed)) + int(calc_del_score(tm))
                else:
                    limit2 = limit
                if sc < limit2:
                    sc = subfloor
                if tm > MAX_TIME:
                    tm = MAX_TIME - MASK5
                score[MODE_DEL, row, col] = sc
                time[MODE_DEL, row, col] = tm
            # INS
            if (
                (s_diag_ins <= limit and s_ins_ins <= limit)
                or (row < BARRIER_I1 and col > 1)
                or (row > B_I2 and col < B_I2b)
            ):
                score[MODE_INS, row, col] = subfloor
                time[MODE_INS, row, col] = 0
            else:
                streak = time[MODE_INS, row - 1, col]
                sMS = s_diag_ins + POINTS_INS_ARRAY[1]
                sI = s_ins_ins + POINTS_INS_ARRAY[min(streak + 1, 603)]
                if sMS >= sI:
                    sc, tm = sMS, 1
                else:
                    sc, tm = sI, streak + 1
                if del_needed > 0:
                    limit2 = limit - del_penalty
                elif ins_needed > 0:
                    limit2 = limit - int(calc_ins_score(tm + ins_needed)) + int(calc_ins_score(tm))
                else:
                    limit2 = limit
                if sc < limit2:
                    sc = subfloor
                if tm > MAX_TIME:
                    tm = MAX_TIME - MASK5
                score[MODE_INS, row, col] = sc
                time[MODE_INS, row, col] = tm
    rows_, max_col, max_state, max_score = _final(score, rows, cols)
    if max_score < min_score:
        return score, time, None
    return score, time, (rows_, max_col, max_state, max_score)


def traceback(score, time, read, ref, row, col, state):
    """traceback2 transliteration (:1167-1266) on oracle matrices."""
    out = []
    while row > 0 and col > 0:
        t = time[state, row, col]
        if state == MODE_MS:
            if t > 1:
                prev = state
            else:
                sd = score[MODE_MS, row - 1, col - 1]
                sD = score[MODE_DEL, row - 1, col - 1]
                sI = score[MODE_INS, row - 1, col - 1]
                prev = (
                    MODE_MS
                    if sd >= sD and sd >= sI
                    else (MODE_DEL if sD >= sI else MODE_INS)
                )
            c = read[row - 1]
            r = ref[col - 1]
            if c == r:
                out.append(ord("m"))
            elif c >= 4 or r >= 4:
                out.append(ord("N"))
            else:
                out.append(ord("S"))
            row -= 1
            col -= 1
        elif state == MODE_DEL:
            if t > 1:
                prev = state
            else:
                sd = score[MODE_MS, row, col - 1]
                sD = score[MODE_DEL, row, col - 1]
                prev = MODE_MS if sd >= sD else MODE_DEL
            out.append(ord("D"))
            col -= 1
        else:
            if t > 1:
                prev = state
            else:
                sd = score[MODE_MS, row - 1, col]
                sI = score[MODE_INS, row - 1, col]
                prev = MODE_MS if sd >= sI else MODE_INS
            cols = score.shape[2] - 1
            if col == 0:
                out.append(ord("X"))
            elif col >= cols:
                out.append(ord("Y"))
            else:
                out.append(ord("I"))
            row -= 1
        state = prev
    if col != row:
        while row > 0:
            out.append(ord("X"))
            row -= 1
            col -= 1
    return bytes(out[::-1])
