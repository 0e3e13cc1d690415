"""NumPy golden-model implementations — the oracle every device path is
differentially tested against (the reference's own test strategy:
CPU sequential scan as oracle, algorithms/test_MSV.cpp:19-31).

``msv_oracle`` mirrors the reference recurrence (MSV_HMM.cpp:74-113) in
float32 with a rolling row (the reference's full [L][m+5] matrix is a
memory quirk, not a semantic one — SURVEY.md §3.5).
"""

from __future__ import annotations

import numpy as np

from ..models.msv import MSVProfile, length_transitions

NEG_INF = np.float32(-np.inf)


def msv_oracle(profile: MSVProfile, tokens: np.ndarray) -> np.float32:
    """Score one sequence (int tokens, no sentinel) against an MSV profile.

    Recurrence per residue i (reference MSV_HMM.cpp:100-111):
        M_j = emit[aa][j] + max(M_{j-1}^prev, B^prev + tr_B_Mk)
        E   = max_j M_j
        J   = max(J^prev + tr_loop, E + tr_E_J)
        C   = max(C^prev + tr_loop, E + tr_E_C)
        N   = N^prev + tr_loop
        B   = max(N + tr_move, J + tr_move)
    returning C_final + tr_move (MSV_HMM.cpp:112).
    """
    tokens = np.asarray(tokens)
    L = tokens.shape[0]
    tr_loop, tr_move = length_transitions(L)

    m = profile.model_length
    scores = profile.scores  # [20, m]

    M = np.full(m, NEG_INF, dtype=np.float32)  # previous row, M0..M_{m-1}
    J = NEG_INF
    C = NEG_INF
    N = np.float32(0.0)
    B = tr_move

    for i in range(L):
        emit = scores[tokens[i]]  # [m]
        # shift: new M_j uses previous M_{j-1}; M0 slot never updates
        shifted = np.concatenate(([NEG_INF], M[:-1])).astype(np.float32)
        newM = (emit + np.maximum(shifted, B + profile.tr_B_Mk)).astype(np.float32)
        newM[0] = NEG_INF  # dummy M0 (emit[0] is -inf anyway)
        E = np.float32(newM[1:].max()) if m > 1 else NEG_INF
        J = np.maximum(np.float32(J + tr_loop), np.float32(E + profile.tr_E_J))
        C = np.maximum(np.float32(C + tr_loop), np.float32(E + profile.tr_E_C))
        N = np.float32(N + tr_loop)
        B = np.maximum(np.float32(N + tr_move), np.float32(J + tr_move))
        M = newM

    return np.float32(C + tr_move)


def msv_oracle_batch(profile: MSVProfile, tokens: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Oracle over a padded batch [B, Lmax]; returns float32 [B]."""
    return np.array(
        [msv_oracle(profile, tokens[b, : lengths[b]]) for b in range(tokens.shape[0])],
        dtype=np.float32,
    )


def _shift(x: np.ndarray) -> np.ndarray:
    """j-1 shift with -inf fill (state axis)."""
    return np.concatenate(([NEG_INF], x[:-1])).astype(np.float32)


def _p7_oracle(p7, tokens: np.ndarray, combine, reduce_) -> np.float32:
    """Sequential full-profile DP in float32 — the golden model for both
    Viterbi (max) and Forward (logaddexp). Delete chain evaluated in
    strict left-to-right scalar order."""
    tokens = np.asarray(tokens)
    seq_len = tokens.shape[0]
    mr = p7.num_states
    from ..models.msv import length_transitions  # local import, avoids cycle

    tr_loop, tr_move = length_transitions(seq_len)

    m = np.full(mr, NEG_INF, dtype=np.float32)
    i_st = np.full(mr, NEG_INF, dtype=np.float32)
    d = np.full(mr, NEG_INF, dtype=np.float32)
    j_st = NEG_INF
    c_st = NEG_INF
    n_st = np.float32(0.0)
    b_st = tr_move

    for t in range(seq_len):
        aa = tokens[t]
        ms = p7.msc[aa]
        is_ = p7.isc[aa]
        diag = combine(
            combine(_shift(m + p7.tmm), _shift(i_st + p7.tim)), _shift(d + p7.tdm)
        )
        new_m = (ms + combine(diag, np.float32(b_st + p7.tr_B_Mk))).astype(np.float32)
        new_i = (is_ + combine(m + p7.tmi, i_st + p7.tii)).astype(np.float32)
        new_d = np.full(mr, NEG_INF, dtype=np.float32)
        for j in range(1, mr):
            new_d[j] = combine(
                np.float32(new_m[j - 1] + p7.tmd[j - 1]),
                np.float32(new_d[j - 1] + p7.tdd[j - 1]),
            )
        e_st = combine(reduce_(new_m), reduce_(new_d)) if mr else NEG_INF
        j_st = combine(np.float32(j_st + tr_loop), np.float32(e_st + p7.tr_E_J))
        c_st = combine(np.float32(c_st + tr_loop), np.float32(e_st + p7.tr_E_C))
        n_st = np.float32(n_st + tr_loop)
        b_st = combine(np.float32(n_st + tr_move), np.float32(j_st + tr_move))
        m, i_st, d = new_m, new_i, new_d

    return np.float32(c_st + tr_move)


def viterbi_oracle(p7, tokens: np.ndarray) -> np.float32:
    """Full local Viterbi score, sequential float32 golden model."""
    return _p7_oracle(p7, tokens, np.maximum, np.max)


def forward_oracle(p7, tokens: np.ndarray) -> np.float32:
    """Forward (log-space) score, sequential float32 golden model."""
    return _p7_oracle(p7, tokens, np.logaddexp, np.logaddexp.reduce)


def viterbi_oracle_batch(p7, tokens: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    return np.array(
        [viterbi_oracle(p7, tokens[b, : lengths[b]]) for b in range(tokens.shape[0])],
        dtype=np.float32,
    )


def forward_oracle_batch(p7, tokens: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    return np.array(
        [forward_oracle(p7, tokens[b, : lengths[b]]) for b in range(tokens.shape[0])],
        dtype=np.float32,
    )
