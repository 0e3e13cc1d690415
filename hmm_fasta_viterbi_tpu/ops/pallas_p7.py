"""Pallas TPU kernels for the full-profile Viterbi and Forward scans.

Same TPU-first layout as the MSV kernel (ops/pallas_msv.py): match
states on SUBLANES ([M_pad, 128] f32 tiles), 128 sequences on LANES,
the whole residue recurrence on-chip in a ``fori_loop`` with the DP
carry (M, I, D rows + J/C/N/B specials) resident in VMEM across
L-chunks of the grid. One kernel, two semirings: (max, +) for Viterbi
and (logsumexp, +) for Forward, selected at trace time.

The profile-HMM-specific hard part is the same-row delete chain

    D_j = combine(M_{j-1} + tmd[j-1],  D_{j-1} + tdd[j-1])

— sequential along the state axis in scalar form (the reference never
built this stage; its transition rows are parsed but unused,
SURVEY.md quirk 10). Here it runs as a Hillis-Steele affine prefix
scan in ceil(log2 M_pad) sublane-roll passes. The affine multiplier
(the tdd window sums) is STEP-INVARIANT, so every pass's additive
constant — including the -inf mask that kills wrapped-around rolls —
is precomputed once per kernel invocation, reducing each in-loop pass
to roll + add + combine. This is the TPU-native replacement for
HMMER's striped lazy-F fixup loop (and for the O(M) scalar chain of
the NumPy oracle, ops/reference.py:_p7_oracle).

Emission selection reuses the MSV kernel's exact 3-term bf16 split
one-hot matmul, for both match and insert scores (6 MXU passes/step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.msv import length_transitions
from ..models.p7 import P7Profile
from .pallas_msv import (
    LANES,
    NEG_INF,
    PAD_SCORE,
    PAD_TOKEN,
    _round_up,
    bf16_round_up,
    blank_ragged_tail,
    f32_round_up,
    pick_lanes,
)

import logging

logger = logging.getLogger(__name__)

# 128 (r5, was 256): once the K=60 emission fold made these kernels
# VPU-bound, 128-residue chunks measured faster at every unroll
# (tools/vit_lab.py sweep; production A/B bitwise-equal — lazy Viterbi
# 368.5 -> 302.0 ms, Forward 346.3 -> 313.3 ms at batch 2048, M=1400)
DEFAULT_L_CHUNK = 128
STEP_UNROLL = 8
# lazy-Viterbi hardware-compile verdicts keyed by (m_pad, l_chunk,
# group_cert): Mosaic can reject schedules the interpreter accepts
# (seen on chip with an unroll-sized dynamic slice); viterbi_pallas
# probes the first call per shape and falls back to eager on rejection
_LAZY_HW_VERDICT: dict = {}
# filter-mode delete chain: Hillis-Steele passes kept (covers D-runs of
# length < 2**K exactly); longer runs are upper-bounded by one
# max(a0)+tail term whose penalty is 2^K * max(tdd). The window is
# auto-picked per profile as the smallest K whose tail penalty reaches
# FILTER_TAIL_DAMP_NATS: measured on 1400.hmm (tdd_max = -0.374), K=3
# (tail -3.0) leaves a 9-nat median gap and passes 25% of random
# sequences at p<=1e-3, while K=4 (tail -6.0) leaves 0.08 nats median /
# 3.4 max and passes 0.0% — as selective as the exact kernel at ~1.8x
# its speed. See docs/PERFORMANCE.md. The threshold sits a quarter nat
# under the measured-adequate 6.0 so the tuning profile itself (tail
# 5.99) picks K=4, not K=5.
FILTER_TAIL_DAMP_NATS = 5.75


def pick_p7_unroll(m_pad: int, l_chunk: int, base: int = 8) -> int:
    """VMEM-driven step-unroll clamp shared by every p7-layout kernel
    (exact, filter, prob-space Forward, posterior passes): three
    [M_pad, lanes] carries plus per-step temporaries scale with the
    unrolled body, so larger models unroll less. One definition so a
    retuning cannot leave the kernels divergent."""
    unroll = base
    if m_pad > 1536:
        unroll = min(unroll, 2)
    elif m_pad > 768:
        unroll = min(unroll, 4)
    while l_chunk % unroll:
        unroll //= 2
    return max(unroll, 1)


def _split3(x):
    """Exact 3-term bf16 decomposition of an f32 matrix (hi, mid, lo)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _select3(parts, onehot):
    """emit = (hi + mid + lo) @ onehot, f32-exact in 3 MXU passes."""
    dn = (((1,), (0,)), ((), ()))
    hi, mid, lo = parts
    acc = jax.lax.dot_general(hi, onehot, dn, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(mid, onehot, dn, preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(lo, onehot, dn, preferred_element_type=jnp.float32)
    return acc


def _select1(scores_bf16, onehot):
    """emit = scores @ onehot in ONE bf16 MXU pass (exact: a one-hot
    select sums a single bf16 term into the f32 accumulator)."""
    dn = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        scores_bf16, onehot, dn, preferred_element_type=jnp.float32
    )


def _cat3(x):
    """[M, 60] exact 3-term split stacked along the CONTRACTION axis.

    Round 5: ``_select1(_cat3(x), _onehot3(iota60, tok))`` returns the
    same f32-exact emission as 3 ``_select3`` passes in ONE MXU pass —
    the tiled one-hot selects hi[j,tok] + mid[j,tok] + lo[j,tok] into
    one f32 accumulator, and any accumulation order of the three
    disjoint-mantissa terms is exact (each partial sum is representable
    in f32). The K=20 passes were the measured majority of the exact
    step cost (the 1-pass bf16 MSV filter runs 2.6x the exact kernel's
    rate, r4 bench), so folding 3 passes into one K=60 matmul attacks
    the chain-free step directly (VERDICT r4 item 2)."""
    hi, mid, lo = _split3(x)
    return jnp.concatenate([hi, mid, lo], axis=1)


def _onehot3(iota60, tok):
    """[60, lanes] one-hot tiled 3x along K: row r selects token r % 20
    (bf16-exact 0/1). PAD_TOKEN (127) matches no row — emission 0."""
    return (
        (iota60 == tok) | (iota60 == tok + 20) | (iota60 == tok + 40)
    ).astype(jnp.bfloat16)


def _lse2(x, y):
    """logaddexp without NaN at (-inf, -inf); Pallas-lowerable ops only."""
    mx = jnp.maximum(x, y)
    d = jnp.minimum(x, y) - mx
    out = mx + jnp.log1p(jnp.exp(d))
    return jnp.where(jnp.isnan(d), mx, out)  # both -inf


def _lse_reduce0(x):
    """logsumexp over axis 0 (states), [M_pad, LANES] -> [1, LANES];
    all--inf columns stay -inf (no NaN)."""
    mx = jnp.max(x, axis=0, keepdims=True)
    sub = jnp.where(x == mx, jnp.float32(0.0), x - mx)
    return mx + jnp.log(jnp.sum(jnp.exp(sub), axis=0, keepdims=True))


def _p7_kernel(
    msc_ref,  # [M_pad, 20] f32 VMEM match scores (pad rows PAD_SCORE)
    isc_ref,  # [M_pad, 20] f32 VMEM insert scores (pad rows PAD_SCORE)
    trans_ref,  # [M_pad, 8] f32 VMEM cols: tmm tmi tmd tim tii tdm tdd_s pad
    chain_ref,  # [M_pad, 16] f32 VMEM: per-pass delete-chain constants
    tokens_ref,  # [L_CHUNK, LANES] int32 VMEM
    lengths_ref,  # [1, LANES] int32 VMEM
    tr_row_ref,  # [2, LANES] f32 VMEM: tr_loop; tr_move
    tr_const_ref,  # [1, 3] f32 SMEM: tr_B_Mk, tr_E_C, tr_E_J
    m_in_ref,  # [M_pad, LANES] f32
    i_in_ref,  # [M_pad, LANES] f32
    d_in_ref,  # [M_pad, LANES] f32
    s_in_ref,  # [4, LANES] f32: J, C, N, B
    # outputs:
    score_ref,  # [1, LANES] f32: C + tr_move
    m_out_ref,
    i_out_ref,
    d_out_ref,
    s_out_ref,
    *,
    unroll: int,
    forward: bool,
    e_skip_d: bool = False,
):
    l_idx = pl.program_id(1)
    chunk_len, lanes = tokens_ref.shape
    m_pad = msc_ref.shape[0]

    combine = _lse2 if forward else jnp.maximum
    reduce0 = _lse_reduce0 if forward else (
        lambda x: jnp.max(x, axis=0, keepdims=True)
    )
    # Viterbi only: E = max(new_m) is EXACT when all tmd/tdd <= 0 —
    # every D value is fl(a0 + nonpositive consts) with
    # a0 = fl(new_m + tmd), and f32 rounding is monotone, so D can
    # never win the E max (see e_skip_d_ok). Saves one [M_pad, LANES]
    # combine per residue. Never valid for Forward (logsumexp SUMS D).
    e_skip_d = e_skip_d and not forward

    msc_cat = _cat3(msc_ref[:, :])
    isc_cat = _cat3(isc_ref[:, :])
    tmm = trans_ref[:, 0:1]
    tmi = trans_ref[:, 1:2]
    tmd = trans_ref[:, 2:3]
    tim = trans_ref[:, 3:4]
    tii = trans_ref[:, 4:5]
    tdm = trans_ref[:, 5:6]
    # (col 6, the shifted tdd, only enters via the chain constants)

    tr_b_mk = tr_const_ref[0, 0]
    tr_e_c = tr_const_ref[0, 1]
    tr_e_j = tr_const_ref[0, 2]
    tr_loop = tr_row_ref[0:1, :]
    tr_move = tr_row_ref[1:2, :]
    lengths = lengths_ref[0:1, :]

    # ---- delete-chain pass constants (host-precomputed) --------------
    # Hillis-Steele pass k (distance s = 2^k) updates
    #   A <- combine(A, roll(A, s) + C_k)
    # where column k of chain_ref holds the current window multiplier
    # (tdd window sums) with rows j < s forced to -inf (identity under
    # combine) so wrapped-around rolls die. Step-invariant, packed into
    # ONE lane-padded array (separate [M_pad, 1] consts each pad to 128
    # lanes in VMEM — 11 of them OOMed the 16 MB budget at M=1400).
    n_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))

    def delete_chain(a):
        for k in range(n_passes):
            rolled = pltpu.roll(a, shift=1 << k, axis=0)
            a = combine(a, rolled + chain_ref[:, k:k + 1])
        return a

    @pl.when(l_idx == 0)
    def _():
        m_out_ref[:, :] = m_in_ref[:, :]
        i_out_ref[:, :] = i_in_ref[:, :]
        d_out_ref[:, :] = d_in_ref[:, :]
        s_out_ref[:, :] = s_in_ref[:, :]

    m0 = m_out_ref[:, :]
    i0 = i_out_ref[:, :]
    d0 = d_out_ref[:, :]
    s0 = s_out_ref[:, :]

    aa_iota = jax.lax.broadcasted_iota(jnp.int32, (60, lanes), 0)
    base = l_idx * chunk_len

    def one_step(t, m, i_st, d, j_st, c_st, n_st, b_st):
        tok = tokens_ref[pl.ds(t, 1), :]
        onehot = _onehot3(aa_iota, tok)
        ms = _select1(msc_cat, onehot)  # [M_pad, LANES] f32-exact, 1 pass
        is_ = _select1(isc_cat, onehot)

        # M: combine of {B entry, M/I/D diagonal}; the three j-1 shifts
        # share one roll by combining before rolling. No row0 mask is
        # needed: the LAST row of the rolled operand is always -inf —
        # kill_last forces tmm/tim/tdm/tmd[mr-1] = -inf (models/p7.py),
        # and pad rows carry -inf transitions — so the wrap-around row
        # arrives as the max identity by construction.
        diag_stay = combine(combine(m + tmm, i_st + tim), d + tdm)
        diag = pltpu.roll(diag_stay, shift=1, axis=0)
        new_m = ms + combine(diag, b_st + tr_b_mk)
        # I: vertical within node
        new_i = is_ + combine(m + tmi, i_st + tii)
        # D: same-row affine chain (see module docstring)
        a0 = pltpu.roll(new_m + tmd, shift=1, axis=0)
        new_d = delete_chain(a0)
        # E: local exit from every M and D (score 0); D provably never
        # wins the max when e_skip_d (see above)
        e_st = reduce0(new_m) if e_skip_d else reduce0(combine(new_m, new_d))
        new_j = combine(j_st + tr_loop, e_st + tr_e_j)
        new_c = combine(c_st + tr_loop, e_st + tr_e_c)
        new_n = n_st + tr_loop
        new_b = combine(new_n + tr_move, new_j + tr_move)

        # only the specials are masked for ragged lanes: a finished
        # lane's M/I/D rows keep evolving but feed nothing unmasked
        valid = (base + t) < lengths
        return (
            new_m,
            new_i,
            new_d,
            jnp.where(valid, new_j, j_st),
            jnp.where(valid, new_c, c_st),
            jnp.where(valid, new_n, n_st),
            jnp.where(valid, new_b, b_st),
        )

    def step(u, carry):
        m, i_st, d, j_st, c_st, n_st, b_st = carry
        for k in range(unroll):
            m, i_st, d, j_st, c_st, n_st, b_st = one_step(
                u * unroll + k, m, i_st, d, j_st, c_st, n_st, b_st
            )
        return (m, i_st, d, j_st, c_st, n_st, b_st)

    m, i_st, d, j_st, c_st, n_st, b_st = jax.lax.fori_loop(
        0, chunk_len // unroll, step,
        (m0, i0, d0, s0[0:1, :], s0[1:2, :], s0[2:3, :], s0[3:4, :]),
    )

    m_out_ref[:, :] = m
    i_out_ref[:, :] = i_st
    d_out_ref[:, :] = d
    s_out_ref[:, :] = jnp.concatenate([j_st, c_st, n_st, b_st], axis=0)
    score_ref[:, :] = c_st + tr_move


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_chunk", "interpret", "unroll", "forward", "e_skip_d", "lazy_k",
        "group_cert",
    ),
)
def p7_pallas_call(
    msc_t: jax.Array,  # [M_pad, 20] f32
    isc_t: jax.Array,  # [M_pad, 20] f32
    trans_t: jax.Array,  # [M_pad, 8] f32
    chain_t: jax.Array,  # [M_pad, 16] f32 delete-chain pass constants
    tokens_t: jax.Array,  # [L_pad, B_pad] int32
    lengths: jax.Array,  # [B_pad] int32
    tr_rows: jax.Array,  # [2, B_pad] f32
    tr_consts: jax.Array,  # [1, 3] f32 ([1, 5] when lazy_k > 0)
    m_init: jax.Array,  # [M_pad, B_pad] f32
    i_init: jax.Array,
    d_init: jax.Array,
    s_init: jax.Array,  # [4, B_pad] f32
    l_chunk: int = DEFAULT_L_CHUNK,
    interpret: bool = False,
    unroll: int = STEP_UNROLL,
    forward: bool = False,
    e_skip_d: bool = False,
    lazy_k: int = 0,
    group_cert: bool = False,
):
    """Raw kernel invocation over padded operands. Returns
    (scores [B_pad], m/i/d carries [M_pad, B_pad], s carry [4, B_pad]).
    Set ``e_skip_d`` only when e_skip_d_ok(p7) (Viterbi E-reduce skips
    the provably-dominated D term). ``lazy_k > 0`` selects the lazily-
    certified truncated-chain kernel (_p7_lazy_kernel; requires Viterbi
    + e_skip_d, tr_consts [1, 5] from prepare_p7_device_lazy; the
    d-carry slot then transports pre_diag, not D — use one kernel mode
    consistently across chunk/hop resumes)."""
    m_pad, twenty = msc_t.shape
    l_pad, b_pad = tokens_t.shape
    assert twenty == 20 and b_pad % LANES == 0 and l_pad % l_chunk == 0
    assert m_pad % 8 == 0
    assert lazy_k == 0 or (not forward and e_skip_d)
    # three [M_pad, lanes] carries + ~15 per-step [M_pad, lanes]
    # temporaries (emission selects, diag, chain passes): scale the
    # unroll down for large models to bound the VMEM scoped allocation;
    # 256-lane tiles (more ILP on the chain) when batch and VMEM allow
    lanes = pick_lanes(b_pad, m_pad, widest=512, m_cap=2048)
    unroll = pick_p7_unroll(m_pad, l_chunk, unroll)
    num_b = b_pad // lanes
    num_l = l_pad // l_chunk
    lengths2d = lengths.reshape(1, b_pad)

    carry_spec = pl.BlockSpec(
        (m_pad, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec((4, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM)
    if lazy_k > 0:
        kern = functools.partial(
            _p7_lazy_kernel, unroll=unroll, lazy_k=lazy_k,
            group_cert=group_cert,
        )
    else:
        kern = functools.partial(
            _p7_kernel, unroll=unroll, forward=forward, e_skip_d=e_skip_d
        )
    score, m_out, i_out, d_out, s_out = pl.pallas_call(
        kern,
        grid=(num_b, num_l),
        in_specs=[
            pl.BlockSpec((m_pad, 20), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 20), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 8), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 16), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_chunk, lanes), lambda b, l: (l, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            carry_spec,
            carry_spec,
            carry_spec,
            s_spec,
        ],
        # carries update in place: init inputs alias the carry outputs
        # (saves 3x [M_pad, B_pad] VMEM blocks + copies)
        input_output_aliases={8: 1, 9: 2, 10: 3, 11: 4},
        out_specs=(
            pl.BlockSpec((1, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            carry_spec,
            carry_spec,
            carry_spec,
            s_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((4, b_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # the lazy kernel's dual chunk body (truncated + replay)
            # spills ~106 MB of scoped stack at 512 lanes; v5e has
            # 128 MiB VMEM/core, so give it the headroom (measured OOM
            # at 100 MB: campaign r4 chain-lab, 106.21M requested)
            vmem_limit_bytes=(118 if lazy_k > 0 else 100) * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        msc_t, isc_t, trans_t, chain_t, tokens_t, lengths2d, tr_rows,
        tr_consts, m_init, i_init, d_init, s_init,
    )
    return score[0], m_out, i_out, d_out, s_out


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_chunk", "interpret", "forward", "e_skip_d", "lazy_k", "group_cert"
    ),
)
def _p7_pallas_padded(
    msc_t, isc_t, trans_t, chain_t, tokens_i8_t, lengths, tr_rows,
    tr_consts, l_chunk: int, interpret: bool, forward: bool,
    e_skip_d: bool = False, lazy_k: int = 0, group_cert: bool = False,
):
    """Jitted wrapper: DP init built on device; returns scores [B_pad]."""
    m_pad = msc_t.shape[0]
    b_pad = tokens_i8_t.shape[1]
    neg = jnp.float32(NEG_INF)
    core_init = jnp.full((m_pad, b_pad), neg, dtype=jnp.float32)
    s_init = jnp.stack(
        [
            jnp.full((b_pad,), neg, dtype=jnp.float32),  # J
            jnp.full((b_pad,), neg, dtype=jnp.float32),  # C
            jnp.zeros((b_pad,), dtype=jnp.float32),  # N
            tr_rows[1],  # B = tr_move
        ]
    )
    score, *_ = p7_pallas_call(
        msc_t,
        isc_t,
        trans_t,
        chain_t,
        tokens_i8_t.astype(jnp.int32),
        lengths,
        tr_rows,
        tr_consts,
        core_init,
        core_init,
        core_init,
        s_init,
        l_chunk=l_chunk,
        interpret=interpret,
        forward=forward,
        e_skip_d=e_skip_d,
        lazy_k=lazy_k,
        group_cert=group_cert,
    )
    return score


def _fwd_prob_kernel(
    modds_ref,  # [M_pad, 20] f32 VMEM match odds ratios (pad rows 0)
    iodds_ref,  # [M_pad, 20] f32 VMEM insert odds ratios (pad rows 0)
    trans_ref,  # [M_pad, 8] f32 VMEM transition PROBABILITIES (pad 0)
    chain_ref,  # [M_pad, W] f32 VMEM: tdd window PRODUCTS, W = chain window
    tokens_ref,  # [L_CHUNK, LANES] int32
    lengths_ref,  # [1, LANES] int32
    tr_row_ref,  # [2, LANES] f32: tr_loop, tr_move (LOG space, final move)
    tr_prob_ref,  # [2, LANES] f32: p_loop, p_move (host-exact PROBABILITIES)
    tr_const_ref,  # [1, 3] f32 SMEM: B->Mk, E->C, E->J PROBABILITIES
    m_in_ref,  # [M_pad, LANES] f32 prob-space carries
    i_in_ref,
    d_in_ref,
    s_in_ref,  # [8, LANES] f32: J C N B log_scale kahan_comp (6-7 unused)
    score_ref,  # [1, LANES] f32 log-space score
    m_out_ref,
    i_out_ref,
    d_out_ref,
    s_out_ref,
    *,
    unroll: int,
):
    """Forward filter in scaled probability space (the HMMER production
    design: odds-ratio f32 DP with periodic renormalisation, infernal/
    HMMER3 'sparse forward' lineage). (logsumexp, +) becomes (+, x):
    the delete chain's per-pass logaddexp collapses to one FMA and the
    E-reduction to a plain sum. One rescale per unroll group keeps the
    dynamic range inside f32 (range per step is bounded by the largest
    odds ratio ~e^8; groups of <=8 steps stay far from overflow)."""
    l_idx = pl.program_id(1)
    chunk_len, lanes = tokens_ref.shape
    m_pad = modds_ref.shape[0]

    modds_cat = _cat3(modds_ref[:, :])
    iodds_cat = _cat3(iodds_ref[:, :])
    tmm = trans_ref[:, 0:1]
    tmi = trans_ref[:, 1:2]
    tmd = trans_ref[:, 2:3]
    tim = trans_ref[:, 3:4]
    tii = trans_ref[:, 4:5]
    tdm = trans_ref[:, 5:6]

    p_b_mk = tr_const_ref[0, 0]
    p_e_c = tr_const_ref[0, 1]
    p_e_j = tr_const_ref[0, 2]
    # host-exact probabilities: an in-kernel exp() of the log values has
    # TPU-transcendental relative bias ~1e-6 which COMPOUNDS once per
    # residue (measured 4e-2 nats of drift at L = 36864)
    p_loop = tr_prob_ref[0:1, :]  # [1, LANES]
    p_move = tr_prob_ref[1:2, :]
    lengths = lengths_ref[0:1, :]
    # the chain window is encoded in the chain array's column count
    # (prepare_p7_device_prob trims the dropped passes — see
    # pick_prob_chain_window for the truncation error bound)
    n_passes = chain_ref.shape[1]

    @pl.when(l_idx == 0)
    def _():
        m_out_ref[:, :] = m_in_ref[:, :]
        i_out_ref[:, :] = i_in_ref[:, :]
        d_out_ref[:, :] = d_in_ref[:, :]
        s_out_ref[:, :] = s_in_ref[:, :]

    m0 = m_out_ref[:, :]
    i0 = i_out_ref[:, :]
    d0 = d_out_ref[:, :]
    s0 = s_out_ref[:, :]

    aa_iota = jax.lax.broadcasted_iota(jnp.int32, (60, lanes), 0)
    base = l_idx * chunk_len

    def delete_chain(a):
        for k in range(n_passes):
            rolled = pltpu.roll(a, shift=1 << k, axis=0)
            a = a + rolled * chain_ref[:, k:k + 1]
        return a

    def one_step(t, m, i_st, d, j_st, c_st, n_st, b_st):
        tok = tokens_ref[pl.ds(t, 1), :]
        onehot = _onehot3(aa_iota, tok)
        ms = _select1(modds_cat, onehot)
        is_ = _select1(iodds_cat, onehot)

        # no row0 masks: kill_last makes the last transition probability
        # 0 (exp(-inf)) and pad rows are all-zero, so the wrapped roll
        # row arrives as the additive identity by construction
        diag_stay = m * tmm + i_st * tim + d * tdm
        diag = pltpu.roll(diag_stay, shift=1, axis=0)
        new_m = ms * (diag + b_st * p_b_mk)
        new_i = is_ * (m * tmi + i_st * tii)
        a0 = pltpu.roll(new_m * tmd, shift=1, axis=0)
        new_d = delete_chain(a0)
        e_st = jnp.sum(new_m + new_d, axis=0, keepdims=True)
        new_j = j_st * p_loop + e_st * p_e_j
        new_c = c_st * p_loop + e_st * p_e_c
        new_n = n_st * p_loop
        new_b = new_n * p_move + new_j * p_move

        valid = (base + t) < lengths
        return (
            new_m,
            new_i,
            new_d,
            jnp.where(valid, new_j, j_st),
            jnp.where(valid, new_c, c_st),
            jnp.where(valid, new_n, n_st),
            jnp.where(valid, new_b, b_st),
        )

    def step(u, carry):
        m, i_st, d, j_st, c_st, n_st, b_st, log_scale, comp = carry
        for k in range(unroll):
            m, i_st, d, j_st, c_st, n_st, b_st = one_step(
                u * unroll + k, m, i_st, d, j_st, c_st, n_st, b_st
            )
        # renormalise (scale-invariant: the log accumulator compensates,
        # so it is safe to apply to finished lanes too)
        s = jnp.maximum(
            jnp.maximum(jnp.max(m, axis=0, keepdims=True), c_st),
            jnp.maximum(n_st, jnp.float32(1e-30)),
        )
        inv = 1.0 / s
        # Kahan-compensated log-scale sum: thousands of small f32
        # increments onto a growing accumulator otherwise drift by
        # ~ulp(total) * n_groups (measured 4e-2 nats at L = 36864)
        y = jnp.log(s) - comp
        t_sum = log_scale + y
        comp = (t_sum - log_scale) - y
        return (
            m * inv,
            i_st * inv,
            d * inv,
            j_st * inv,
            c_st * inv,
            n_st * inv,
            b_st * inv,
            t_sum,
            comp,
        )

    m, i_st, d, j_st, c_st, n_st, b_st, log_scale, comp = jax.lax.fori_loop(
        0, chunk_len // unroll, step,
        (m0, i0, d0, s0[0:1, :], s0[1:2, :], s0[2:3, :], s0[3:4, :],
         s0[4:5, :], s0[5:6, :]),
    )

    m_out_ref[:, :] = m
    i_out_ref[:, :] = i_st
    d_out_ref[:, :] = d
    pad = jnp.zeros((2, lanes), dtype=jnp.float32)
    s_out_ref[:, :] = jnp.concatenate(
        [j_st, c_st, n_st, b_st, log_scale, comp, pad], axis=0
    )
    # final C->T move stays in log space (tr_row is the log value)
    score_ref[:, :] = jnp.log(c_st) + log_scale + tr_row_ref[1:2, :]


def prepare_p7_device(p7: P7Profile, m_pad: int | None = None):
    """Host-side packing: (msc_t, isc_t, trans_t, chain_t, tr_consts).

    Emission pads/clamps use the finite PAD_SCORE (the bf16 split of
    -inf would NaN); transition columns keep true -inf semantics.
    ``chain_t[:, k]`` is the Hillis-Steele pass-k additive constant for
    the delete chain: the tdd window sum composed over 2^k links, with
    rows j < 2^k forced to -inf (kills wrapped-around rolls).
    """
    mr = p7.num_states
    m_pad = m_pad or _round_up(max(mr, 8), 8)
    msc_t = np.full((m_pad, 20), PAD_SCORE, dtype=np.float32)
    msc_t[:mr] = np.maximum(p7.msc.T, PAD_SCORE)
    isc_t = np.full((m_pad, 20), PAD_SCORE, dtype=np.float32)
    isc_t[:mr] = np.maximum(p7.isc.T, PAD_SCORE)
    trans_t = np.full((m_pad, 8), NEG_INF, dtype=np.float32)
    tdd_s = np.concatenate(([np.float32(NEG_INF)], p7.tdd[:-1]))
    for col, vec in enumerate(
        (p7.tmm, p7.tmi, p7.tmd, p7.tim, p7.tii, p7.tdm, tdd_s)
    ):
        trans_t[:mr, col] = vec

    chain_t = np.full((m_pad, 16), NEG_INF, dtype=np.float32)
    n_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))
    assert n_passes <= 16, "chain_t supports m_pad <= 65536"
    rows = np.arange(m_pad)
    c_cur = np.full(m_pad, NEG_INF, dtype=np.float32)
    c_cur[:mr] = tdd_s
    for k in range(n_passes):
        s = 1 << k
        chain_t[:, k] = np.where(rows < s, np.float32(NEG_INF), c_cur)
        rolled = np.roll(c_cur, s)
        with np.errstate(invalid="ignore"):
            c_cur = (c_cur + np.where(rows < s, np.float32(0.0), rolled)).astype(
                np.float32
            )

    tr_consts = np.array(
        [[p7.tr_B_Mk, p7.tr_E_C, p7.tr_E_J]], dtype=np.float32
    )
    return msc_t, isc_t, trans_t, chain_t, tr_consts


def _f32_up(x64: np.ndarray) -> np.ndarray:
    """Round f64 values to f32 toward +inf (output >= input; -inf kept)."""
    y = x64.astype(np.float32)
    below = y.astype(np.float64) < x64
    bumped = np.nextafter(y, np.float32(np.inf), dtype=np.float32)
    return np.where(below, bumped, y).astype(np.float32)


def _p7_filter_kernel(
    msc_ref,  # [M_pad, 20] bf16 VMEM match scores rounded UP
    isc_ref,  # [M_pad, 20] bf16 VMEM insert scores rounded UP
    trans_ref,  # [M_pad, 8] f32 VMEM (exact kernel layout)
    chain_ref,  # [M_pad, 16] f32 VMEM chain consts (chain mode only)
    tokens_ref,  # [L_CHUNK, LANES] int32
    lengths_ref,  # [1, LANES] int32
    tr_row_ref,  # [2, LANES] f32: tr_loop; tr_move
    tr_const_ref,  # [1, 4] f32 SMEM: tr_B_Mk, tr_E_C, tr_E_J, aux
    m_in_ref,  # [M_pad, LANES] f32
    i_in_ref,
    d_in_ref,
    s_in_ref,  # [8, LANES] f32: J C N B E (5-7 pad)
    score_ref,  # [1, LANES] f32
    m_out_ref,
    i_out_ref,
    d_out_ref,
    s_out_ref,
    *,
    unroll: int,
    filter_window: int,
    e_skip_d: bool,
):
    """Upper-bound Viterbi filter (HMMER ViterbiFilter's role).

    Soundness-preserving accelerations over the exact max-plus kernel,
    all riding on monotonicity (every operand >= its exact counterpart
    -> result >= exact score):

    * one bf16 MXU pass per emission select (scores pre-rounded up);
    * truncated Hillis-Steele delete chain: ``filter_window`` passes
      cover D-runs < 2^K exactly; any longer run's value is
        a0[j-s] + (window sum of s >= 2^K tdd links)
          <= max(a0) + 2^K * max(tdd)            (tdd <= 0)
      so ONE combine with that bound (aux, SMEM col 3) upper-bounds the
      full chain. A *global*-max bound for ALL runs (skipping the chain
      entirely) was measured catastrophically loose — it lets paths
      re-enter the best column every residue, inflating scores by
      ~1.9 nats/step on 1400.hmm — so the bound is only used for the
      tail beyond the window, where the 2^K tdd penalty pins it;
    * ``e_skip_d``: E = max(new_m) EXACTLY when all tmd/tdd <= 0 —
      new_d[j] = max_s fl(a0[j-s] + C_s) <= max(a0) <= max(new_m)
      under monotone f32 rounding, so D never wins the E max (this one
      is an equality, also used by the exact kernel).
    """
    l_idx = pl.program_id(1)
    chunk_len, lanes = tokens_ref.shape
    m_pad = msc_ref.shape[0]

    msc = msc_ref[:, :]
    isc = isc_ref[:, :]
    tmm = trans_ref[:, 0:1]
    tmi = trans_ref[:, 1:2]
    tim = trans_ref[:, 3:4]
    tii = trans_ref[:, 4:5]
    tmd = trans_ref[:, 2:3]
    tdm = trans_ref[:, 5:6]

    tr_b_mk = tr_const_ref[0, 0]
    tr_e_c = tr_const_ref[0, 1]
    tr_e_j = tr_const_ref[0, 2]
    aux = tr_const_ref[0, 3]
    tr_loop = tr_row_ref[0:1, :]
    tr_move = tr_row_ref[1:2, :]
    lengths = lengths_ref[0:1, :]

    full_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))
    n_passes = min(max(filter_window, 1), full_passes)
    truncated = n_passes < full_passes

    def delete_chain(a):
        a0 = a
        for k in range(n_passes):
            rolled = pltpu.roll(a, shift=1 << k, axis=0)
            a = jnp.maximum(a, rolled + chain_ref[:, k:k + 1])
        if truncated:
            a = jnp.maximum(a, jnp.max(a0, axis=0, keepdims=True) + aux)
        return a

    @pl.when(l_idx == 0)
    def _():
        m_out_ref[:, :] = m_in_ref[:, :]
        i_out_ref[:, :] = i_in_ref[:, :]
        d_out_ref[:, :] = d_in_ref[:, :]
        s_out_ref[:, :] = s_in_ref[:, :]

    m0 = m_out_ref[:, :]
    i0 = i_out_ref[:, :]
    d0 = d_out_ref[:, :]
    s0 = s_out_ref[:, :]

    aa_iota = jax.lax.broadcasted_iota(jnp.int32, (20, lanes), 0)
    base = l_idx * chunk_len

    def one_step(t, m, i_st, d, j_st, c_st, n_st, b_st, e_prev):
        tok = tokens_ref[pl.ds(t, 1), :]
        onehot = (aa_iota == tok).astype(jnp.bfloat16)
        ms = _select1(msc, onehot)  # [M_pad, LANES]
        is_ = _select1(isc, onehot)

        diag_stay = jnp.maximum(
            jnp.maximum(m + tmm, i_st + tim), d + tdm
        )
        diag = pltpu.roll(diag_stay, shift=1, axis=0)
        new_m = ms + jnp.maximum(diag, b_st + tr_b_mk)
        a0 = pltpu.roll(new_m + tmd, shift=1, axis=0)
        new_d = delete_chain(a0)
        if e_skip_d:
            e_st = jnp.max(new_m, axis=0, keepdims=True)
        else:
            e_st = jnp.max(
                jnp.maximum(new_m, new_d), axis=0, keepdims=True
            )
        new_i = is_ + jnp.maximum(m + tmi, i_st + tii)

        new_j = jnp.maximum(j_st + tr_loop, e_st + tr_e_j)
        new_c = jnp.maximum(c_st + tr_loop, e_st + tr_e_c)
        new_n = n_st + tr_loop
        new_b = jnp.maximum(new_n + tr_move, new_j + tr_move)

        valid = (base + t) < lengths
        return (
            new_m,
            new_i,
            new_d,
            jnp.where(valid, new_j, j_st),
            jnp.where(valid, new_c, c_st),
            jnp.where(valid, new_n, n_st),
            jnp.where(valid, new_b, b_st),
            e_st,
        )

    def step(u, carry):
        for k in range(unroll):
            carry = one_step(u * unroll + k, *carry)
        return carry

    m, i_st, d, j_st, c_st, n_st, b_st, e_st = jax.lax.fori_loop(
        0, chunk_len // unroll, step,
        (m0, i0, d0, s0[0:1, :], s0[1:2, :], s0[2:3, :], s0[3:4, :],
         s0[4:5, :]),
    )

    m_out_ref[:, :] = m
    i_out_ref[:, :] = i_st
    d_out_ref[:, :] = d
    pad = jnp.full((3, lanes), jnp.float32(NEG_INF))
    s_out_ref[:, :] = jnp.concatenate(
        [j_st, c_st, n_st, b_st, e_st, pad], axis=0
    )
    score_ref[:, :] = c_st + tr_move


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_chunk", "interpret", "unroll", "filter_window", "e_skip_d"
    ),
)
def _p7_filter_padded(
    msc_bf, isc_bf, trans_t, chain_t, tokens_i8_t, lengths, tr_rows,
    tr_consts, l_chunk: int, interpret: bool,
    filter_window: int, e_skip_d: bool = False, unroll: int = STEP_UNROLL,
):
    """Jitted filter wrapper over padded operands -> scores [B_pad]."""
    m_pad = msc_bf.shape[0]
    l_pad, b_pad = tokens_i8_t.shape
    lanes = pick_lanes(b_pad, m_pad, widest=512, m_cap=2048)
    unroll = pick_p7_unroll(m_pad, l_chunk, unroll)
    num_b = b_pad // lanes
    num_l = l_pad // l_chunk
    lengths2d = lengths.reshape(1, b_pad)

    neg = jnp.float32(NEG_INF)
    core_init = jnp.full((m_pad, b_pad), neg, dtype=jnp.float32)
    s_init = jnp.stack(
        [
            jnp.full((b_pad,), neg, dtype=jnp.float32),  # J
            jnp.full((b_pad,), neg, dtype=jnp.float32),  # C
            jnp.zeros((b_pad,), dtype=jnp.float32),  # N
            tr_rows[1],  # B = tr_move
            jnp.full((b_pad,), neg, dtype=jnp.float32),  # E
            jnp.full((b_pad,), neg, dtype=jnp.float32),
            jnp.full((b_pad,), neg, dtype=jnp.float32),
            jnp.full((b_pad,), neg, dtype=jnp.float32),
        ]
    )

    carry_spec = pl.BlockSpec(
        (m_pad, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec((8, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM)
    score, *_ = pl.pallas_call(
        functools.partial(
            _p7_filter_kernel,
            unroll=unroll,
            filter_window=filter_window,
            e_skip_d=e_skip_d,
        ),
        grid=(num_b, num_l),
        in_specs=[
            pl.BlockSpec((m_pad, 20), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 20), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 8), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 16), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_chunk, lanes), lambda b, l: (l, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            carry_spec,
            carry_spec,
            carry_spec,
            s_spec,
        ],
        input_output_aliases={8: 1, 9: 2, 10: 3, 11: 4},
        out_specs=(
            pl.BlockSpec((1, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            carry_spec,
            carry_spec,
            carry_spec,
            s_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, b_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        msc_bf, isc_bf, trans_t, chain_t,
        tokens_i8_t.astype(jnp.int32), lengths2d, tr_rows, tr_consts,
        core_init, core_init, core_init, s_init,
    )
    return score[0]


def _p7_lazy_kernel(
    msc_ref,  # [M_pad, 20] f32 VMEM match scores (pad rows PAD_SCORE)
    isc_ref,  # [M_pad, 20] f32 VMEM insert scores (pad rows PAD_SCORE)
    trans_ref,  # [M_pad, 8] f32 VMEM cols: tmm tmi tmd tim tii tdm tdd_s pad
    chain_ref,  # [M_pad, 16] f32 VMEM: per-pass delete-chain constants
    tokens_ref,  # [L_CHUNK, LANES] int32 VMEM
    lengths_ref,  # [1, LANES] int32 VMEM
    tr_row_ref,  # [2, LANES] f32 VMEM: tr_loop; tr_move
    tr_const_ref,  # [1, 5] f32 SMEM: tr_B_Mk, tr_E_C, tr_E_J, aux, tmd_max
    m_in_ref,  # [M_pad, LANES] f32
    i_in_ref,  # [M_pad, LANES] f32
    d_in_ref,  # [M_pad, LANES] f32: the PRE_DIAG carry (see below)
    s_in_ref,  # [4, LANES] f32: J, C, N, B
    # outputs:
    score_ref,  # [1, LANES] f32: C + tr_move
    m_out_ref,
    i_out_ref,
    d_out_ref,  # pre_diag carry out
    s_out_ref,
    *,
    unroll: int,
    lazy_k: int,
    group_cert: bool = False,
):
    """EXACT Viterbi with a lazily-certified truncated delete chain.

    Round-3 rework of the (max, +) path of :func:`_p7_kernel` — same
    scores bit-for-bit, ~half the per-step chain work:

    * only ``lazy_k`` Hillis-Steele passes run per residue (covering
      D-runs shorter than 2**lazy_k exactly);
    * the contribution of any LONGER run to row j is upper-bounded
      PER ROW by ``t_row_j = fl(fl(fl(e + tmd_max) + Cmax_j) + tdm_j)``
      with e = max(new_m) (the E reduce, already computed), Cmax_j =
      the exact host-side max over the DROPPED passes' chain constants
      at row j (chain_t column 15), and the additions performed in
      this exact order in-kernel: every dropped-pass value at row j is
      fl(a_val + C_k[j]) with a_val <= max(a0) <= fl(e + tmd_max), and
      correctly-rounded addition is monotone in each operand, so
      fl(fl(a_val + C_k[j]) + tdm_j) <= t_row_j with NO ulp slack
      games — the kernel reproduces the bound's own rounding path;
    * with e_skip_d (required: E = max(new_m) exactly), D's ONLY
      consumer is the next residue's diagonal max via
      ``pre_diag = max(floor, new_d + tdm)``, so the truncation is
      invisible unless the bounded tail could win that max:
      ``viol_vec = t_row > new_pd`` (new_pd computed from the
      truncated chain — if t_row <= new_pd the improved D + tdm can't
      change pre_diag anywhere, by the same monotonicity);
    * the certificate is accumulated (vector OR) across the WHOLE
      L-chunk in a register carry and checked ONCE per chunk: two
      complementary ``pl.when`` branches either commit the truncated
      result or replay the entire chunk with the full chain — the
      chunk's ENTRY state is still sitting untouched in the out-refs
      (they are only written by whichever branch runs), so the replay
      needs no scratch at all. Round-3 v1 branched per STEP through a
      VMEM scratch roundtrip (measured perf-NEUTRAL: the store+load+
      branch cost exactly the saved chain passes); v2 branched per
      unroll-GROUP with an entry-copy scratch (+6 % only — the
      per-group carry roundtrip still dominated). ``lax.cond`` is NOT
      used: Mosaic predicates vector-valued conds — both branches
      execute — measured as a net LOSS at every window
      (tools/chain_lab.py round 3); ``pl.when`` lowers to a real branch.

    Emission selects stay per-step (one [M_pad, 20] x [20, LANES] MXU
    pass each): v1's group-batched selects measured ~5 % SLOWER than
    per-step (43.5 vs 45.6 GCUPS at K=11) — the selects already overlap
    with the VPU chain (p7_lab ablation), so batching only added
    concat/VMEM cost.

    Because floor is already in hand, the carry stores
    ``pre_diag = max(floor, new_d + tdm)`` instead of D itself: the next
    step's diagonal becomes one roll (its f32 values are identical to
    the eager kernel's max(m+tmm, i+tim, d+tdm) — same operands, same
    single-max tree). The d-carry slot transports pre_diag across
    chunks and sp-wavefront hops; fresh state (-inf everywhere) is
    unchanged.

    This is the TPU replacement for HMMER's striped lazy-F fixup loop
    (nhmmer/ViterbiFilter lineage): run the cheap chain, check a
    monotone certificate, repair rarely. Reference role: the production
    rescore stage the reference parses transitions for but never built
    (data_readers/Profile_HMM.hpp:32-42).

    ``group_cert`` amortizes the certificate over each unroll GROUP:
    per step only a running ``e_g = max(e_g, e_st)`` (lane row) and
    ``pd_min = min(pd_min, new_pd)`` are kept; one t_row bound per
    group uses e_g >= every e(t) and compares against pd_min <= every
    new_pd(t) — both relaxations are monotone under correctly-rounded
    f32 max/min/add, so soundness is unchanged (a group fire is still
    >= any per-step fire). Cuts the per-step certificate cost from 4
    [M_pad, LANES] ops to 1 + 4/unroll at the price of a slightly
    hotter (still chunk-granular) fallback; fire rates re-measured in
    tools/chain_lab.py --group-cert.
    """
    l_idx = pl.program_id(1)
    chunk_len, lanes = tokens_ref.shape
    m_pad = msc_ref.shape[0]

    msc_cat = _cat3(msc_ref[:, :])
    isc_cat = _cat3(isc_ref[:, :])
    tmm = trans_ref[:, 0:1]
    tmi = trans_ref[:, 1:2]
    tmd = trans_ref[:, 2:3]
    tim = trans_ref[:, 3:4]
    tii = trans_ref[:, 4:5]
    tdm = trans_ref[:, 5:6]

    tr_b_mk = tr_const_ref[0, 0]
    tr_e_c = tr_const_ref[0, 1]
    tr_e_j = tr_const_ref[0, 2]
    tmd_max = tr_const_ref[0, 4]
    tr_loop = tr_row_ref[0:1, :]
    tr_move = tr_row_ref[1:2, :]
    lengths = lengths_ref[0:1, :]
    cmax = chain_ref[:, 15:16]  # per-row max dropped-pass constant

    n_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))
    k_run = min(max(lazy_k, 1), n_passes)

    @pl.when(l_idx == 0)
    def _():
        m_out_ref[:, :] = m_in_ref[:, :]
        i_out_ref[:, :] = i_in_ref[:, :]
        d_out_ref[:, :] = d_in_ref[:, :]
        s_out_ref[:, :] = s_in_ref[:, :]

    aa_iota = jax.lax.broadcasted_iota(jnp.int32, (60, lanes), 0)
    base = l_idx * chunk_len

    def one_step(t, m, i_st, pre_diag, j_st, c_st, n_st, b_st,
                 n_chain, want_cert):
        tok = tokens_ref[pl.ds(t, 1), :]
        onehot = _onehot3(aa_iota, tok)
        ms = _select1(msc_cat, onehot)  # [M_pad, LANES] f32-exact, 1 pass
        is_ = _select1(isc_cat, onehot)

        diag = pltpu.roll(pre_diag, shift=1, axis=0)
        new_m = ms + jnp.maximum(diag, b_st + tr_b_mk)
        new_i = is_ + jnp.maximum(m + tmi, i_st + tii)
        a = pltpu.roll(new_m + tmd, shift=1, axis=0)
        for k in range(n_chain):
            rolled = pltpu.roll(a, shift=1 << k, axis=0)
            a = jnp.maximum(a, rolled + chain_ref[:, k:k + 1])

        e_st = jnp.max(new_m, axis=0, keepdims=True)  # e_skip_d (exact)
        floor = jnp.maximum(new_m + tmm, new_i + tim)
        new_pd = jnp.maximum(floor, a + tdm)
        viol_vec = None
        if want_cert and not group_cert:
            # the rounding path of this bound mirrors the dropped
            # passes' own (see docstring) — addition order matters.
            # The violation flag is CARRIED as f32 0/1, not bool:
            # loop-carried vector<i1> fails Mosaic legalization
            # ('scf.for' legalize error, campaign r4 chain1400 stage)
            t_row = ((e_st + tmd_max) + cmax) + tdm  # [M_pad, LANES]
            viol_vec = (t_row > new_pd).astype(jnp.float32)

        new_j = jnp.maximum(j_st + tr_loop, e_st + tr_e_j)
        new_c = jnp.maximum(c_st + tr_loop, e_st + tr_e_c)
        new_n = n_st + tr_loop
        new_b = jnp.maximum(new_n + tr_move, new_j + tr_move)

        valid = (base + t) < lengths
        return (
            new_m,
            new_i,
            new_pd,
            jnp.where(valid, new_j, j_st),
            jnp.where(valid, new_c, c_st),
            jnp.where(valid, new_n, n_st),
            jnp.where(valid, new_b, b_st),
        ), (e_st if group_cert else viol_vec)

    def write_carry(carry):
        m, i_st, pd, j_st, c_st, n_st, b_st = carry
        m_out_ref[:, :] = m
        i_out_ref[:, :] = i_st
        d_out_ref[:, :] = pd
        s_out_ref[0:1, :] = j_st
        s_out_ref[1:2, :] = c_st
        s_out_ref[2:3, :] = n_st
        s_out_ref[3:4, :] = b_st

    def read_carry():
        s = s_out_ref[:, :]
        return (
            m_out_ref[:, :], i_out_ref[:, :], d_out_ref[:, :],
            s[0:1, :], s[1:2, :], s[2:3, :], s[3:4, :],
        )

    def run_chunk(n_chain, want_cert):
        """Whole-chunk register-carried loop from the out-ref state."""
        def step(u, carry):
            if want_cert:
                carry, vacc = carry
            e_g = pd_min = None
            for k in range(unroll):
                carry, aux = one_step(
                    u * unroll + k, *carry, n_chain, want_cert
                )
                if want_cert and group_cert:
                    e_g = aux if e_g is None else jnp.maximum(e_g, aux)
                    pd = carry[2]
                    pd_min = pd if pd_min is None else jnp.minimum(pd_min, pd)
                elif want_cert:
                    vacc = jnp.maximum(vacc, aux)
            if want_cert and group_cert:
                # one group bound: e_g >= every e(t), pd_min <= every
                # new_pd(t); same rounding path as the per-step cert
                t_row = ((e_g + tmd_max) + cmax) + tdm
                vacc = jnp.maximum(
                    vacc, (t_row > pd_min).astype(jnp.float32)
                )
            return (carry, vacc) if want_cert else carry

        init = read_carry()
        if want_cert:
            init = (init, jnp.zeros((m_pad, lanes), jnp.float32))
        return jax.lax.fori_loop(0, chunk_len // unroll, step, init)

    if k_run >= n_passes:
        # no truncation: the certificate-free A/B baseline (the eager
        # schedule with the pre_diag carry)
        write_carry(run_chunk(n_passes, False))
    else:
        carry, vacc = run_chunk(k_run, True)
        viol = jnp.max(vacc) > 0.0

        # registers cannot be conditionally overwritten by pl.when, so
        # the branch pair merges through the out-refs: the chunk's
        # entry state is still in them (only these writes touch them)
        @pl.when(jnp.logical_not(viol))
        def _():
            write_carry(carry)

        @pl.when(viol)
        def _():
            write_carry(run_chunk(n_passes, False))

    score_ref[:, :] = s_out_ref[1:2, :] + tr_move


# auto-picked lazy window: smallest K whose dropped-pass constants damp
# by at least this many nats below the best M cell. The v3 PER-ROW
# certificate (Cmax_j, vs v1's global max) measures 0 fires at 12 nats
# across the 100/500/1400/2405 profiles on random sequences
# (tools/lazy_chain_lab.py v3 column); the repair granularity is a
# whole 256-residue chunk x lane-block, so only a true-zero fire rate
# keeps the fallback cold — pick conservatively, not at the measured
# edge (2405 fires 0.02 %/lane-step one K lower)
LAZY_TAIL_DAMP_NATS = 12.0


def pick_lazy_window(chain_t: np.ndarray, trans_t: np.ndarray,
                     n_passes: int) -> int:
    """Smallest chain window K whose per-row certificate constant
    ``max_j (Cmax_j(K) + tdm_j)`` damps by >= LAZY_TAIL_DAMP_NATS —
    i.e. the bound the v3 certificate adds to e_st is at least that
    far below the best M cell for EVERY row, so the fallback stays
    cold unless the live pd gap exceeds it (measured-zero fire rates
    at 12 nats on 100/500/1400/2405, tools/lazy_chain_lab.py). Full
    chain when no window damps (e.g. tdd >= 0 columns)."""
    tdm = trans_t[:, 5]
    for k in range(1, n_passes):
        cmax = chain_t[:, k:n_passes].max(axis=1)
        if float((cmax + tdm).max()) <= -LAZY_TAIL_DAMP_NATS:
            return k
    return n_passes


def prepare_p7_device_lazy(
    p7: P7Profile, m_pad: int | None = None, lazy_k: int | None = None
):
    """Host packing for the lazy exact Viterbi kernel: the standard
    prepare_p7_device arrays with (a) chain_t column 15 holding the
    per-row EXACT max over the DROPPED passes' chain constants (the
    certificate's Cmax_j — a max of already-rounded f32 values, no
    further rounding) and (b) a widened SMEM const row [tr_B_Mk,
    tr_E_C, tr_E_J, aux, tmd_max] where tmd_max bounds max(a0) via the
    E reduce (aux is the v1 global-tail slot, kept for layout
    stability; the v3 kernel reads only tmd_max + column 15). Returns
    (msc_t, isc_t, trans_t, chain_t, consts5, lazy_k)."""
    mr = p7.num_states
    m_pad = m_pad or _round_up(max(mr, 8), 8)
    msc_t, isc_t, trans_t, chain_t, _ = prepare_p7_device(p7, m_pad)
    n_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))
    if n_passes > 15:
        # chain_t col 15 is the certificate column; at m_pad > 32768 all
        # 16 columns are chain passes, so no truncated window exists —
        # degrade to the certificate-free full chain (lazy_k == n_passes
        # selects the eager schedule inside _p7_lazy_kernel)
        lazy_k = n_passes
    elif lazy_k is None:
        lazy_k = pick_lazy_window(chain_t, trans_t, n_passes)
    lazy_k = min(max(lazy_k, 1), n_passes)

    chain_t = np.array(chain_t, copy=True)
    if lazy_k < n_passes:
        chain_t[:, 15] = chain_t[:, lazy_k:n_passes].max(axis=1)
    elif n_passes <= 15:  # at 16 passes col 15 is real chain data
        chain_t[:, 15] = NEG_INF
    dropped = chain_t[:, lazy_k:n_passes]
    finite = dropped[np.isfinite(dropped)]
    finite = finite[finite > NEG_INF / 2]
    aux = np.float32(finite.max()) if finite.size else np.float32(NEG_INF)
    tmd_fin = p7.tmd[np.isfinite(p7.tmd)]
    tmd_max = np.float32(tmd_fin.max()) if tmd_fin.size else np.float32(NEG_INF)
    consts5 = np.array(
        [[p7.tr_B_Mk, p7.tr_E_C, p7.tr_E_J, aux, tmd_max]], dtype=np.float32
    )
    return msc_t, isc_t, trans_t, chain_t, consts5, lazy_k


def e_skip_d_ok(p7: P7Profile) -> bool:
    """True when E = max(new_m) is EXACTLY the full E-reduction (D
    states can never win the E max): requires every tmd and tdd <= 0 —
    genuine log-probabilities, true for any real profile (the '*' quirk
    yields exactly 0, which is fine). Proof sketch: every D value is
    some fl(a0 + nonpositive consts) with a0 = fl(new_m + tmd) and f32
    rounding monotone, hence <= max(new_m)."""
    return bool(
        np.all(p7.tmd[np.isfinite(p7.tmd)] <= 0.0)
        and np.all(p7.tdd[np.isfinite(p7.tdd)] <= 0.0)
    )


def pick_filter_window(p7: P7Profile, m_pad: int) -> int:
    """Smallest chain window whose tail penalty 2^K * |max(tdd)| reaches
    FILTER_TAIL_DAMP_NATS — enough damping that the long-run bound stays
    within a few nats of the true chain (measured: 0.0% false-survivor
    inflation at the cascade threshold), while profiles with strong
    deletion penalties get away with fewer passes."""
    full_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))
    finite = p7.tdd[np.isfinite(p7.tdd)]
    tdd_max = float(finite.max()) if finite.size else float(NEG_INF)
    if tdd_max >= 0.0 or not np.isfinite(tdd_max):
        return full_passes
    need = FILTER_TAIL_DAMP_NATS / -tdd_max
    return int(np.clip(np.ceil(np.log2(max(need, 1.0))), 1, full_passes))


def prepare_p7_device_filter(
    p7: P7Profile,
    m_pad: int | None = None,
    window_log2: int | None = None,
):
    """Host packing for the upper-bound Viterbi FILTER kernel.

    Returns (msc_bf16, isc_bf16, trans_t, chain_t, tr_consts4, window,
    e_skip_d); pass ``window``/``e_skip_d`` as the kernel's static
    flags. Soundness (filter score >= exact score for every sequence —
    the zero-false-negative contract shared with
    pallas_msv.prepare_scores_t_filter) rests on max-plus monotonicity:

    * emissions rounded UP to bf16;
    * delete-chain pass constants built from one-ulp-bumped tdd links
      with f64 window sums rounded up — >= any f32 evaluation order the
      exact kernel or oracle used;
    * D-runs beyond the truncated window folded into the
      max(a0) + 2^K*max(tdd) tail term (see _p7_filter_kernel).

    The reference has no Viterbi stage at all (SURVEY.md scope note);
    this mirrors HMMER's ViterbiFilter role in the cascade.
    """
    mr = p7.num_states
    m_pad = m_pad or _round_up(max(mr, 8), 8)
    msc_t, isc_t, trans_t, _, _ = prepare_p7_device(p7, m_pad)
    msc_bf = bf16_round_up(msc_t)
    isc_bf = bf16_round_up(isc_t)

    # shifted-tdd links (window-of-1 values), one-ulp bumped
    tdd_s = np.concatenate(([np.float32(NEG_INF)], p7.tdd[:-1]))
    tdd_up = f32_round_up(tdd_s)
    finite = tdd_up[np.isfinite(tdd_up)]
    tdd_max = float(finite.max()) if finite.size else float(NEG_INF)

    full_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))
    if window_log2 is None:
        window_log2 = pick_filter_window(p7, m_pad)
    window = min(max(window_log2, 1), full_passes)
    if tdd_max > 0.0:
        # tdd > 0 (malformed profile: prob > 1) breaks the geometric
        # tail bound — run the full chain (still a valid filter)
        window = full_passes
    aux = (
        _f32_up(np.float64(tdd_max) * (1 << window))
        if window < full_passes
        else np.float32(NEG_INF)
    )

    chain_t = np.full((m_pad, 16), NEG_INF, dtype=np.float32)
    rows = np.arange(m_pad)
    c_cur = np.full(m_pad, -np.inf, dtype=np.float64)
    c_cur[:mr] = tdd_up[:mr].astype(np.float64)
    with np.errstate(invalid="ignore"):
        for k in range(window):
            s = 1 << k
            chain_t[:, k] = np.where(
                rows < s, np.float32(NEG_INF), _f32_up(c_cur)
            )
            rolled = np.roll(c_cur, s)
            c_cur = c_cur + np.where(rows < s, 0.0, rolled)

    tr_consts = np.array(
        [[p7.tr_B_Mk, p7.tr_E_C, p7.tr_E_J, aux]], dtype=np.float32
    )
    return (
        msc_bf, isc_bf, trans_t, chain_t, tr_consts, window,
        e_skip_d_ok(p7),
    )


def viterbi_filter_pallas(
    p7: P7Profile,
    tokens,
    lengths,
    l_chunk: int = DEFAULT_L_CHUNK,
    interpret: bool = False,
    window_log2: int | None = None,
) -> jax.Array:
    """Upper-bound Viterbi filter scores; f32 [B], every entry >= the
    exact viterbi_pallas score of the same sequence (differential-
    tested). Use to prune before the exact stage — HMMER ViterbiFilter's
    role, built on TPU-native one-sided rounding instead of saturating
    i16 SIMD. ``window_log2=None`` auto-picks per profile
    (pick_filter_window)."""
    tokens_t, lengths_p, tr_rows, b, l_chunk = _prepare_tokens(
        tokens, lengths, l_chunk
    )
    msc_bf, isc_bf, trans_t, chain_t, tr_consts, window, e_skip = (
        prepare_p7_device_filter(p7, window_log2=window_log2)
    )
    score = _p7_filter_padded(
        jnp.asarray(msc_bf),
        jnp.asarray(isc_bf),
        jnp.asarray(trans_t),
        jnp.asarray(chain_t),
        jnp.asarray(tokens_t),
        jnp.asarray(lengths_p),
        jnp.asarray(tr_rows),
        jnp.asarray(tr_consts),
        l_chunk=l_chunk,
        interpret=interpret,
        filter_window=window,
        e_skip_d=e_skip,
    )
    return score[:b]


# Truncated prob-space delete chain (round 3): conservative workload
# bound and target aggregate relative error for pick_prob_chain_window.
PROB_CHAIN_L_MAX = 1.0e6
PROB_CHAIN_REL_ERR = 1e-9


def pick_prob_chain_window(p7: P7Profile, m_pad: int | None = None) -> int:
    """Smallest Hillis-Steele window K whose truncation error is
    provably invisible in the SUM-space (Forward / posterior) kernels.

    Unlike the max-plus Viterbi chain (where one dropped D-run can win a
    max outright and the lazy kernel needs a per-step certificate +
    repair), the probability-space chain is a plain sum, so truncation
    admits a deterministic aggregate bound: a run of length >= 2^K
    contributes a0_i * (product of >= 2^K tdd probabilities); summing the
    geometric tail over run lengths and rows, the mass dropped from one
    step's E-sum is at most

        e_st * Cmax_K / (1 - tdd_max)

    with Cmax_K = max over rows of the dropped passes' window-product
    constants (each dropped term's coefficient is one such product), and
    e_st >= sum(new_m) >= max(a0)/tmd_max the step total it is measured
    against. First-order error compounding through the recurrence is
    additive, so the score's aggregate relative error is bounded by
    L * Cmax_K / (1 - tdd_max). This picks the smallest K with

        -log(Cmax_K) >= log(PROB_CHAIN_L_MAX / PROB_CHAIN_REL_ERR)
                        - log1p(-tdd_max)

    i.e. rel err <= 1e-9 for any sequence up to a million residues —
    orders below the Forward tolerance (2e-3) and below f32 resolution,
    and one-sided (truncation only ever underestimates). On the data
    profiles this keeps 6 of 11-12 passes at M=1400/2405 (damping -47
    nats) — the sum-space sibling of the lazy Viterbi window, needing no
    in-kernel certificate at all."""
    mr = p7.num_states
    m_pad = m_pad or _round_up(max(mr, 8), 8)
    n_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))
    # log-space per-pass window-sum constants (prepare_p7_device's
    # recursion, f64 — this is an error bound, not kernel data)
    tdd_s = np.concatenate(([np.float64(-np.inf)], p7.tdd[:-1].astype(np.float64)))
    rows = np.arange(m_pad)
    c_cur = np.full(m_pad, -np.inf)
    c_cur[:mr] = tdd_s
    chain_log = np.full((m_pad, n_passes), -np.inf)
    for k in range(n_passes):
        s = 1 << k
        chain_log[:, k] = np.where(rows < s, -np.inf, c_cur)
        with np.errstate(invalid="ignore"):
            c_cur = c_cur + np.where(rows < s, 0.0, np.roll(c_cur, s))
    fin = tdd_s[np.isfinite(tdd_s)]
    if fin.size == 0:
        return 1  # no D->D links anywhere: a single pass is exact
    tdd_max_p = float(np.exp(fin.max()))
    if tdd_max_p >= 1.0:
        return n_passes  # degenerate profile: no damping to lean on
    need = (
        np.log(PROB_CHAIN_L_MAX / PROB_CHAIN_REL_ERR)
        - np.log1p(-tdd_max_p)
    )
    for k in range(1, n_passes):
        cmax = chain_log[:, k:n_passes].max()
        if -cmax >= need:
            return k
    return n_passes


def prepare_p7_device_prob(p7: P7Profile, m_pad: int | None = None):
    """Host packing for the probability-space Forward kernel:
    (modds_t, iodds_t, trans_probs_t, chain_prod_t, tr_consts_prob).

    Everything is a plain probability / odds ratio; 0 is the natural
    absorbing pad value (no -inf anywhere), and the delete-chain pass
    constants are tdd window PRODUCTS with wrapped rows zeroed. The
    returned chain array carries exactly ``pick_prob_chain_window``
    columns — the kernels run one pass per column, so the truncation
    needs no plumbing (the window IS the array shape).
    """
    mr = p7.num_states
    m_pad = m_pad or _round_up(max(mr, 8), 8)
    with np.errstate(over="ignore"):
        modds = np.exp(p7.msc.T.astype(np.float64)).astype(np.float32)
        iodds = np.exp(p7.isc.T.astype(np.float64)).astype(np.float32)
        tprob = [
            np.exp(v.astype(np.float64)).astype(np.float32)
            for v in (p7.tmm, p7.tmi, p7.tmd, p7.tim, p7.tii, p7.tdm)
        ]
        tdd_p = np.exp(p7.tdd.astype(np.float64)).astype(np.float32)

    modds_t = np.zeros((m_pad, 20), dtype=np.float32)
    modds_t[:mr] = modds
    iodds_t = np.zeros((m_pad, 20), dtype=np.float32)
    iodds_t[:mr] = iodds
    trans_t = np.zeros((m_pad, 8), dtype=np.float32)
    for col, vec in enumerate(tprob):
        trans_t[:mr, col] = vec

    # chain pass constants: window products of c_j = tdd[j-1], trimmed
    # to the provably-sufficient window (see pick_prob_chain_window)
    n_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))
    assert n_passes <= 16
    window = pick_prob_chain_window(p7, m_pad)
    chain_t = np.zeros((m_pad, window), dtype=np.float32)
    rows = np.arange(m_pad)
    c_cur = np.zeros(m_pad, dtype=np.float32)
    c_cur[1:mr] = tdd_p[: mr - 1]
    for k in range(window):
        s = 1 << k
        chain_t[:, k] = np.where(rows < s, np.float32(0.0), c_cur)
        c_cur = (c_cur * np.where(rows < s, np.float32(1.0), np.roll(c_cur, s))).astype(
            np.float32
        )

    tr_consts = np.exp(
        np.array([[p7.tr_B_Mk, p7.tr_E_C, p7.tr_E_J]], dtype=np.float64)
    ).astype(np.float32)
    return modds_t, iodds_t, trans_t, chain_t, tr_consts


@functools.partial(jax.jit, static_argnames=("l_chunk", "interpret", "unroll"))
def fwd_prob_pallas_call(
    modds_t, iodds_t, trans_t, chain_t, tokens_t, lengths, tr_rows,
    tr_probs, tr_consts, m_init, i_init, d_init, s_init,
    l_chunk: int = DEFAULT_L_CHUNK, interpret: bool = False,
    unroll: int = STEP_UNROLL,
):
    """Raw prob-space Forward invocation with explicit DP carries
    (resume support for the sp-axis wavefront). Returns
    (scores [B_pad], m/i/d carries, s carry [8, B_pad] incl. the
    log-scale and Kahan rows)."""
    m_pad = modds_t.shape[0]
    l_pad, b_pad = tokens_t.shape
    lanes = pick_lanes(b_pad, m_pad, widest=512, m_cap=2048)
    unroll = pick_p7_unroll(m_pad, l_chunk, unroll)
    num_b = b_pad // lanes
    num_l = l_pad // l_chunk
    lengths2d = lengths.reshape(1, b_pad)

    carry_spec = pl.BlockSpec(
        (m_pad, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec((8, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM)
    score, m_out, i_out, d_out, s_out = pl.pallas_call(
        functools.partial(_fwd_prob_kernel, unroll=unroll),
        grid=(num_b, num_l),
        in_specs=[
            pl.BlockSpec((m_pad, 20), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 20), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 8), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            # chain block width = the truncated window (column count IS
            # the pass count — prepare_p7_device_prob)
            pl.BlockSpec(
                (m_pad, chain_t.shape[1]), lambda b, l: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((l_chunk, lanes), lambda b, l: (l, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            carry_spec,
            carry_spec,
            carry_spec,
            s_spec,
        ],
        input_output_aliases={9: 1, 10: 2, 11: 3, 12: 4},
        out_specs=(
            pl.BlockSpec((1, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            carry_spec,
            carry_spec,
            carry_spec,
            s_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, b_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        modds_t, iodds_t, trans_t, chain_t,
        tokens_t.astype(jnp.int32), lengths2d, tr_rows, tr_probs,
        tr_consts, m_init, i_init, d_init, s_init,
    )
    return score[0], m_out, i_out, d_out, s_out


@functools.partial(jax.jit, static_argnames=("l_chunk", "interpret", "unroll"))
def _fwd_prob_padded(
    modds_t, iodds_t, trans_t, chain_t, tokens_i8_t, lengths, tr_rows,
    tr_probs, tr_consts, l_chunk: int, interpret: bool,
    unroll: int = STEP_UNROLL,
):
    """Jitted prob-space Forward over padded operands -> scores [B_pad].
    ``tr_probs`` [2, B_pad] carries host-exact p_loop/p_move rows."""
    m_pad = modds_t.shape[0]
    b_pad = tokens_i8_t.shape[1]
    core_init = jnp.zeros((m_pad, b_pad), dtype=jnp.float32)
    s_init = jnp.zeros((8, b_pad), dtype=jnp.float32)
    s_init = s_init.at[2].set(1.0)  # N = 1
    s_init = s_init.at[3].set(tr_probs[1])  # B = move prob
    score, *_ = fwd_prob_pallas_call(
        modds_t, iodds_t, trans_t, chain_t, tokens_i8_t, lengths,
        tr_rows, tr_probs, tr_consts, core_init, core_init, core_init,
        s_init, l_chunk=l_chunk, interpret=interpret, unroll=unroll,
    )
    return score


def length_transition_probs(lengths: np.ndarray) -> np.ndarray:
    """[2, B] host-exact p_loop = L/(L+3), p_move = 3/(L+3) rows (f64
    division, one correctly-rounded f32 narrowing — no log/exp trip)."""
    lengths = np.asarray(lengths, dtype=np.float64)
    p_loop = lengths / (lengths + 3.0)
    p_move = 3.0 / (lengths + 3.0)
    return np.stack([p_loop, p_move]).astype(np.float32)


def _prepare_tokens(tokens, lengths, l_chunk):
    tokens = np.asarray(tokens)
    lengths_np = np.asarray(lengths, dtype=np.int32)
    b, seq_len = tokens.shape
    b_pad = _round_up(max(b, 1), LANES)
    l_chunk = min(l_chunk, _round_up(max(seq_len, 1), 32))
    l_pad = _round_up(max(seq_len, 1), l_chunk)
    tokens_t = np.full((l_pad, b_pad), PAD_TOKEN, dtype=np.int8)
    tokens_t[:seq_len, :b] = tokens.T
    lengths_p = np.zeros(b_pad, dtype=np.int32)
    lengths_p[:b] = lengths_np
    blank_ragged_tail(tokens_t, lengths_p)
    tr_loop, tr_move = length_transitions(lengths_p)
    tr_rows = np.stack([tr_loop, tr_move]).astype(np.float32)
    return tokens_t, lengths_p, tr_rows, b, l_chunk


def _run(p7, tokens, lengths, l_chunk, interpret, forward):
    tokens_t, lengths_p, tr_rows, b, l_chunk = _prepare_tokens(
        tokens, lengths, l_chunk
    )
    msc_t, isc_t, trans_t, chain_t, tr_consts = prepare_p7_device(p7)
    score = _p7_pallas_padded(
        jnp.asarray(msc_t),
        jnp.asarray(isc_t),
        jnp.asarray(trans_t),
        jnp.asarray(chain_t),
        jnp.asarray(tokens_t),
        jnp.asarray(lengths_p),
        jnp.asarray(tr_rows),
        jnp.asarray(tr_consts),
        l_chunk=l_chunk,
        interpret=interpret,
        forward=forward,
        e_skip_d=(not forward) and e_skip_d_ok(p7),
    )
    return score[:b]


def viterbi_pallas(
    p7: P7Profile,
    tokens,
    lengths,
    l_chunk: int = DEFAULT_L_CHUNK,
    interpret: bool = False,
    lazy: bool = True,
    lazy_k: int | None = None,
    group_cert: bool = False,
    hw_fallback: bool = True,
) -> jax.Array:
    """Full local Viterbi scores via the Pallas kernel; f32 [B].

    Drop-in for ops.p7_scan.viterbi_xla (differential-tested). The
    default runs the lazily-certified truncated-chain kernel
    (_p7_lazy_kernel — exact scores, ~half the chain work); set
    ``lazy=False`` for the eager full-chain kernel (A/B reference).

    The first lazy call per (m_pad, l_chunk) shape is synchronously
    materialized to force the (possibly remote) Mosaic compile: Mosaic
    can reject a schedule the CPU interpreter accepts, and a rejection
    here falls back to the eager kernel with a warning instead of
    propagating at the caller's np.asarray."""
    if lazy and e_skip_d_ok(p7):
        tokens_t, lengths_p, tr_rows, b, l_chunk = _prepare_tokens(
            tokens, lengths, l_chunk
        )
        msc_t, isc_t, trans_t, chain_t, consts5, k = prepare_p7_device_lazy(
            p7, lazy_k=lazy_k
        )
        shape_key = (msc_t.shape[0], l_chunk, bool(group_cert))
        if not hw_fallback or _LAZY_HW_VERDICT.get(shape_key) is not False:
            # hw_fallback=False: callers validating the lazy kernel
            # itself (tools/validate_hw.py) must see a compile failure,
            # not a silent eager-vs-eager comparison. The probe wraps
            # dispatch AND materialization: a local TPU raises compile
            # errors at dispatch, the axon tunnel at np.asarray
            # (block_until_ready is not a reliable barrier there)
            probe = (
                hw_fallback
                and not interpret
                and shape_key not in _LAZY_HW_VERDICT
            )
            try:
                score = _p7_pallas_padded(
                    jnp.asarray(msc_t),
                    jnp.asarray(isc_t),
                    jnp.asarray(trans_t),
                    jnp.asarray(chain_t),
                    jnp.asarray(tokens_t),
                    jnp.asarray(lengths_p),
                    jnp.asarray(tr_rows),
                    jnp.asarray(consts5),
                    l_chunk=l_chunk,
                    interpret=interpret,
                    forward=False,
                    e_skip_d=True,
                    lazy_k=k,
                    group_cert=group_cert,
                )
                if probe:
                    np.asarray(score)
                    _LAZY_HW_VERDICT[shape_key] = True
                return score[:b]
            except Exception as e:
                if not probe:
                    raise
                logger.warning(
                    "lazy Viterbi kernel failed to compile for "
                    "m_pad=%d (%s: %.200s); falling back to eager",
                    shape_key[0], type(e).__name__, e,
                )
                _LAZY_HW_VERDICT[shape_key] = False
    return _run(p7, tokens, lengths, l_chunk, interpret, forward=False)


def forward_pallas(
    p7: P7Profile,
    tokens,
    lengths,
    l_chunk: int = DEFAULT_L_CHUNK,
    interpret: bool = False,
    prob_space: bool = True,
) -> jax.Array:
    """Forward scores via the Pallas kernel; f32 [B] (log-odds nats).

    ``prob_space=True`` (default) runs the scaled-probability kernel —
    the HMMER production-Forward design, ~4x faster than log-space on
    TPU (the delete chain's logaddexp passes become FMAs); set False for
    the bit-careful log-space semiring kernel."""
    if not prob_space:
        return _run(p7, tokens, lengths, l_chunk, interpret, forward=True)
    tokens_t, lengths_p, tr_rows, b, l_chunk = _prepare_tokens(
        tokens, lengths, l_chunk
    )
    packed = prepare_p7_device_prob(p7)
    score = _fwd_prob_padded(
        *(jnp.asarray(x) for x in packed[:4]),
        jnp.asarray(tokens_t),
        jnp.asarray(lengths_p),
        jnp.asarray(tr_rows),
        jnp.asarray(length_transition_probs(lengths_p)),
        jnp.asarray(packed[4]),
        l_chunk=l_chunk,
        interpret=interpret,
    )
    return score[:b]
