"""Static-schedule invariants for the pairing's segment decompositions
(round 5): the fused paths rebuild the Miller event schedule and the |x|
exponentiation ladder from segment lists — these must reconstruct the
originals exactly, or the fused/unfused paths silently diverge.

Pure-Python (no device work): fast-lane safe. The fused-vs-unfused value
equality itself is covered by the slow lane (tests/test_pairing.py) and
the TPU-lane oracle checks.
"""

from ark_blst_tpu.curves import pairing as DP
from ark_blst_tpu.oracle import pairing as OP


def test_event_segments_reconstruct_schedule():
    for k in (1, 2, 3, 7, 9, len(DP.MILLER_EVENTS)):
        ev = DP.MILLER_EVENTS[:k]
        rebuilt = []
        for n_dbl, has_add in DP._event_segments(ev):
            rebuilt += [True] * n_dbl
            if has_add:
                rebuilt.append(False)
        assert rebuilt == ev, f"segments do not reconstruct events[:{k}]"


def test_event_schedule_matches_reference_structure():
    # 63 doubling + 5 addition events = 68 coefficient triples, the
    # G2Prepared length (/root/reference/src/g2.rs:650-694)
    assert len(DP.MILLER_EVENTS) == 68
    assert sum(DP.MILLER_EVENTS) == 63
    assert DP.MILLER_EVENTS.count(False) == 5


def test_x_segments_reconstruct_ladder():
    # replaying the segments as square-and-multiply must produce |x|
    val = 1  # leading bit
    for n_sqr, do_mul in DP._X_SEGMENTS:
        for _ in range(n_sqr):
            val <<= 1
        if do_mul:
            val += 1
    assert val == OP.X_ABS
    # weight-6 |x|: 5 multiplies after the leading bit
    assert sum(1 for _, m in DP._X_SEGMENTS if m) == 5
    assert sum(n for n, _ in DP._X_SEGMENTS) == OP.X_ABS.bit_length() - 1
