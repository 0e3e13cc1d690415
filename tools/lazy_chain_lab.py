#!/usr/bin/env python
"""Measure the lazy delete-chain certificate violation rate (CPU, NumPy).

Round-3 design question for the EXACT Viterbi kernel: run only K
Hillis-Steele delete-chain passes per residue (covering D-runs shorter
than 2^K) plus a monotone tail bound T for longer runs, and fall back to
the full chain ONLY when the bound could change a downstream output.
With e_skip_d (E excludes D — exact for real profiles), D's sole
consumer is the next residue's diagonal max

    diag_stay[j] = max(M[j]+tmm[j], I[j]+tim[j], D[j]+tdm[j])

so the per-step certificate is

    viol = any_j (T > a_K[j]) and (T + tdm[j] > floor[j])

with a_K the K-pass chain state, floor[j] = max(new_m+tmm, new_i+tim)[j],
and T an upper bound on every run of length >= 2^K:

    T_tight = max(a0) + 2^K * max(tdd)          (one extra reduce)
    T_loose = max(new_m) + max(tmd) + 2^K*max(tdd)   (reuses the E reduce)

If viol never fires on the bench workload (random sequences), the lazy
kernel runs the K-pass chain at full speed and the fallback path is dead;
every fire costs the remaining full-chain passes for that step. This lab
measures fire rates per step for K = 1..6 over the reference's random
corpus distribution, plus the real-protein test sequences, for several
profiles. Exactness is separately guaranteed by construction (fallback =
the exact full chain; certificate soundness is max-plus monotonicity —
same argument as ops/pallas_p7._p7_filter_kernel's tail bound).
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from hmm_fasta_viterbi_tpu import parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.models.msv import length_transitions  # noqa: E402
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile  # noqa: E402

NEG = np.float32(-1e30)


def chain_consts(tdd_s: np.ndarray, mr: int, n_passes: int) -> np.ndarray:
    """[mr, n_passes] f32 H-S pass constants (prepare_p7_device logic)."""
    rows = np.arange(mr)
    out = np.full((mr, n_passes), NEG, dtype=np.float32)
    c_cur = np.full(mr, NEG, dtype=np.float32)
    c_cur[:] = tdd_s
    for k in range(n_passes):
        s = 1 << k
        out[:, k] = np.where(rows < s, NEG, c_cur)
        rolled = np.roll(c_cur, s)
        c_cur = (c_cur + np.where(rows < s, np.float32(0.0), rolled)).astype(np.float32)
    return out


def measure(p7: P7Profile, tokens: np.ndarray, ks=(1, 2, 3, 4, 5, 6)):
    mr = p7.num_states
    B, L = tokens.shape
    msc = np.maximum(p7.msc, NEG).astype(np.float32)  # [20, mr]
    isc = np.maximum(p7.isc, NEG).astype(np.float32)
    tmm, tmi, tmd = p7.tmm, p7.tmi, p7.tmd
    tim, tii, tdm = p7.tim, p7.tii, p7.tdm
    tdd_s = np.concatenate(([NEG], p7.tdd[:-1])).astype(np.float32)
    tdd_fin = p7.tdd[np.isfinite(p7.tdd)]
    tdd_max = float(tdd_fin.max()) if tdd_fin.size else float(NEG)
    tmd_fin = tmd[np.isfinite(tmd)]
    tmd_max = float(tmd_fin.max()) if tmd_fin.size else float(NEG)

    kmax = max(ks)
    n_passes = max(1, int(np.ceil(np.log2(max(mr, 2)))))
    consts_full = chain_consts(tdd_s, mr, n_passes)
    consts = consts_full[:, :kmax]
    # v3 per-row certificate: Cmax_j = exact max over DROPPED passes'
    # constants at row j (kernel chain_t col 15)
    cmax_rows = {
        K: (
            consts_full[:, K:n_passes].max(axis=1)
            if K < n_passes else np.full(mr, NEG, dtype=np.float32)
        )
        for K in ks
    }
    col = lambda v: np.nan_to_num(v, neginf=NEG)[:, None].astype(np.float32)
    tmm_c, tmi_c, tmd_c = col(tmm), col(tmi), col(tmd)
    tim_c, tii_c, tdm_c = col(tim), col(tii), col(tdm)

    lengths = np.full(B, L, dtype=np.int32)
    tr_loop, tr_move = length_transitions(lengths)
    tr_loop = tr_loop.astype(np.float32)
    tr_move = tr_move.astype(np.float32)

    m = np.full((mr, B), NEG, dtype=np.float32)
    i_st = np.full((mr, B), NEG, dtype=np.float32)
    d = np.full((mr, B), NEG, dtype=np.float32)
    j_st = np.full(B, NEG, dtype=np.float32)
    c_st = np.full(B, NEG, dtype=np.float32)
    n_st = np.zeros(B, dtype=np.float32)
    b_st = tr_move.copy()

    viol_steps = {k: 0 for k in ks}
    viol_steps_loose = {k: 0 for k in ks}
    viol_elems = {k: 0 for k in ks}
    viol_steps_v3 = {k: 0 for k in ks}

    for t in range(L):
        tok = tokens[:, t]
        ms = msc[tok].T  # [mr, B]
        is_ = isc[tok].T
        diag_stay = np.maximum(np.maximum(m + tmm_c, i_st + tim_c), d + tdm_c)
        diag = np.full_like(diag_stay, NEG)
        diag[1:] = diag_stay[:-1]
        new_m = ms + np.maximum(diag, b_st + np.float32(p7.tr_B_Mk))
        new_i = is_ + np.maximum(m + tmi_c, i_st + tii_c)
        a0 = np.full_like(new_m, NEG)
        a0[1:] = new_m[:-1] + tmd_c[:-1]

        # H-S passes, cumulative; record viol per K
        a = a0.copy()
        e_st = new_m.max(axis=0)
        a0_max = a0.max(axis=0)
        floor = np.maximum(new_m + tmm_c, new_i + tim_c)
        for k in range(kmax):
            s = 1 << k
            rolled = np.full_like(a, NEG)
            rolled[s:] = a[:-s]
            a = np.maximum(a, rolled + consts[:, k:k + 1])
            K = k + 1
            if K in viol_steps:
                aux = np.float32(tdd_max * (1 << K))
                t_tight = a0_max + aux  # [B]
                t_loose = e_st + np.float32(tmd_max) + aux
                v = (t_tight[None, :] > a) & (t_tight[None, :] + tdm_c > floor)
                vl = (t_loose[None, :] > a) & (t_loose[None, :] + tdm_c > floor)
                viol_steps[K] += int(v.any(axis=0).sum())
                viol_steps_loose[K] += int(vl.any(axis=0).sum())
                viol_elems[K] += int(v.sum())
                # v3: per-row Cmax, compared against new_pd
                new_pd = np.maximum(floor, a + tdm_c)
                t_row = (
                    (e_st[None, :] + np.float32(tmd_max))
                    + cmax_rows[K][:, None]
                ) + tdm_c
                viol_steps_v3[K] += int((t_row > new_pd).any(axis=0).sum())
        new_d = a
        # finish the chain exactly for the actual recurrence
        k = kmax
        while (1 << k) < mr:
            s = 1 << k
            rolled = np.full_like(new_d, NEG)
            rolled[s:] = new_d[:-s]
            cc = chain_consts(tdd_s, mr, k + 1)[:, k:k + 1]
            new_d = np.maximum(new_d, rolled + cc)
            k += 1

        j_st = np.maximum(j_st + tr_loop, e_st + np.float32(p7.tr_E_J))
        c_st = np.maximum(c_st + tr_loop, e_st + np.float32(p7.tr_E_C))
        n_st = n_st + tr_loop
        b_st = np.maximum(n_st + tr_move, j_st + tr_move)
        m, i_st, d = new_m, new_i, new_d

    lane_steps = L * B
    return {
        k: (
            viol_steps[k] / lane_steps,
            viol_steps_loose[k] / lane_steps,
            viol_elems[k] / (lane_steps * mr),
            viol_steps_v3[k] / lane_steps,
        )
        for k in ks
    }


def main():
    rng = np.random.default_rng(0)
    B, L = 8, 1024
    rand_tokens = rng.integers(0, 20, size=(B, L)).astype(np.int32)
    for name in ("1400", "2405", "100", "500"):
        hmm = parse_hmm(REPO / "data" / "profile_HMMs" / f"{name}.hmm")
        p7 = P7Profile.from_profile(hmm)
        tdd_fin = p7.tdd[np.isfinite(p7.tdd)]
        print(f"== {name}.hmm M={p7.num_states} tdd_max={tdd_fin.max():.4f} "
              f"tmd_max={p7.tmd[np.isfinite(p7.tmd)].max():.4f}")
        rates = measure(p7, rand_tokens)
        for k, (tight, loose, elem, v3) in rates.items():
            print(f"  K={k}: viol/lane-step tight={tight:.4%} "
                  f"loose={loose:.4%} elem={elem:.3e} v3={v3:.4%}")


if __name__ == "__main__":
    main()
