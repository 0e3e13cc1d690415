"""Pallas forward-backward posterior-coverage kernels.

The domain-envelope report needs, for every hit, the per-position summed
match posterior (coverage): cov[t] = sum_j alpha[t, j] * beta[t, j] / P.
The lax.scan route (ops.p7_scan.posterior_coverage_batch_xla) is
gather-bound at a few GCUPS; these kernels run the same decode as two
Pallas passes in the prob-space p7 layout (batch on lanes, states on
sublanes — ops.pallas_p7):

* forward pass: the scaled-probability Forward kernel, additionally
  STREAMING each step's scaled M row and the group log-scale to HBM
  ([L_pad, M_pad, B_pad] f32 — the checkpoint trade: ~2x HBM traffic
  instead of O(L*M) VMEM, which cannot fit);
* backward pass: the suffix recurrence (reference oracle:
  ops.reference.backward_oracle; lax.scan: ops.p7_scan.backward_scan)
  in scaled probability space, iterated over the SAME grid with the
  length axis reversed; each step reads the forward row back from HBM
  and emits cov[t] = (sum_j fm[t,j] * bm[t,j]) * exp(lsf[t] + lsb - P)
  on the fly, so the posterior matrix itself never exists anywhere.

The suffix delete chain mirrors the prefix chain of the forward kernels
with roll direction reversed and window PRODUCTS accumulated downward
(host-precomputed per profile, prepare_suffix_chain).

Numerics: scores match the xla decode within the Forward tolerance; the
coverage consumer thresholds at 0.5, far above kernel error.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.p7 import P7Profile
from .pallas_msv import LANES, blank_ragged_tail, _round_up
from .pallas_p7 import (
    _select3,
    _split3,
    length_transition_probs,
    pick_p7_unroll,
    pick_prob_chain_window,
    prepare_p7_device_prob,
)
from ..models.msv import length_transitions

logger = logging.getLogger(__name__)

# VMEM budget: the streamed fm block (l_chunk * m_pad * lanes * 2 B —
# round 3 streams alpha rows in BF16, halving both the VMEM block and
# the HBM traffic; the coverage consumer thresholds at 0.5, ~250x the
# bf16-induced error) double-buffers on top of the DP carries and step
# temporaries; 32 bf16 rows at M=1400 x 128 lanes is ~11.5 MB/buffer
POST_L_CHUNK = 32
STEP_UNROLL = 8
# hardware-compile verdicts for the bf16-stream posterior kernel, keyed
# by (m_pad, l_chunk, lanes); see posterior_coverage_batch_pallas
_POST_HW_VERDICT: dict = {}
# HBM budget for the streamed alpha rows of one dispatch; batch_chunk
# auto-picks the widest lane multiple that fits
POST_HBM_BYTES = 3 << 30


def prepare_suffix_chain(p7: P7Profile, m_pad: int | None = None) -> np.ndarray:
    """[m_pad, W] suffix-chain pass constants: window PRODUCTS of
    c_j = tdd[j] accumulated downward; pass k adds roll_up(a, 2^k) * C_k
    with rows j >= m_pad - 2^k zeroed (wrapped rolls die).

    W = pick_prob_chain_window — the same provably-sufficient truncated
    window as the forward chain (the suffix constants are the same tdd
    window products read from the other end, so the dropped-run mass
    bound is identical); the kernels run one pass per column."""
    mr = p7.num_states
    m_pad = m_pad or _round_up(max(mr, 8), 8)
    with np.errstate(over="ignore"):
        tdd_p = np.exp(p7.tdd.astype(np.float64)).astype(np.float32)
    window = pick_prob_chain_window(p7, m_pad)
    chain = np.zeros((m_pad, window), dtype=np.float32)
    rows = np.arange(m_pad)
    c_cur = np.zeros(m_pad, dtype=np.float32)
    c_cur[: mr] = tdd_p[: mr]  # kill_last already zeroed the final link
    for k in range(window):
        s = 1 << k
        dead = rows >= m_pad - s
        chain[:, k] = np.where(dead, np.float32(0.0), c_cur)
        c_cur = (c_cur * np.where(dead, np.float32(1.0), np.roll(c_cur, -s))).astype(
            np.float32
        )
    return chain


def _fwd_save_kernel(
    modds_ref, iodds_ref, trans_ref, chain_ref,
    tokens_ref, lengths_ref, tr_prob_ref, tr_row_ref, tr_const_ref,
    m_in_ref, i_in_ref, d_in_ref, s_in_ref,
    score_ref, fm_ref, ls_ref, m_out_ref, i_out_ref, d_out_ref, s_out_ref,
    *, unroll: int,
):
    """Prob-space Forward, streaming per-step scaled M rows (fm) and the
    in-effect log-scale (ls) to HBM. Math identical to
    ops.pallas_p7._fwd_prob_kernel (see its docstring for the rescale /
    Kahan rationale); only the stores are new."""
    l_idx = pl.program_id(1)
    chunk_len, lanes = tokens_ref.shape
    m_pad = modds_ref.shape[0]

    modds_parts = _split3(modds_ref[:, :])
    iodds_parts = _split3(iodds_ref[:, :])
    tmm = trans_ref[:, 0:1]
    tmi = trans_ref[:, 1:2]
    tmd = trans_ref[:, 2:3]
    tim = trans_ref[:, 3:4]
    tii = trans_ref[:, 4:5]
    tdm = trans_ref[:, 5:6]

    p_loop = tr_prob_ref[0:1, :]
    p_move = tr_prob_ref[1:2, :]
    # per-profile scalars ride SMEM (a lane-row would only reach the
    # first 128-lane block)
    pk_b_mk = tr_const_ref[0, 0]
    pk_e_c = tr_const_ref[0, 1]
    pk_e_j = tr_const_ref[0, 2]
    lengths = lengths_ref[0:1, :]
    n_passes = chain_ref.shape[1]  # truncated window (column count)

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

    def delete_chain(a):
        for k in range(n_passes):
            rolled = pltpu.roll(a, shift=1 << k, axis=0)
            a = a + rolled * chain_ref[:, k:k + 1]
        return a

    def one_step(t, m, i_st, d, j_st, c_st, n_st, b_st, log_scale):
        tok = tokens_ref[pl.ds(t, 1), :]
        onehot = (aa_iota == tok).astype(jnp.bfloat16)
        ms = _select3(modds_parts, onehot)
        is_ = _select3(iodds_parts, onehot)

        diag_stay = m * tmm + i_st * tim + d * tdm
        diag = pltpu.roll(diag_stay, shift=1, axis=0)
        new_m = ms * (diag + b_st * pk_b_mk)
        new_i = is_ * (m * tmi + i_st * tii)
        a0 = pltpu.roll(new_m * tmd, shift=1, axis=0)
        new_d = delete_chain(a0)
        e_st = jnp.sum(new_m + new_d, axis=0, keepdims=True)
        new_j = j_st * p_loop + e_st * pk_e_j
        new_c = c_st * p_loop + e_st * pk_e_c
        new_n = n_st * p_loop
        new_b = new_n * p_move + new_j * p_move

        valid = (base + t) < lengths
        # stream the scaled alpha_M row (BF16 — see module docstring) +
        # its scale for the backward pass
        fm_ref[pl.ds(t, 1), :, :] = (
            jnp.where(valid, new_m, 0.0).astype(jnp.bfloat16)[None]
        )
        ls_ref[pl.ds(t, 1), :] = log_scale
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
                u * unroll + k, m, i_st, d, j_st, c_st, n_st, b_st, log_scale
            )
        s = jnp.maximum(
            jnp.maximum(jnp.max(m, axis=0, keepdims=True), c_st),
            jnp.maximum(n_st, jnp.float32(1e-30)),
        )
        inv = 1.0 / s
        y = jnp.log(s) - comp
        t_sum = log_scale + y
        comp = (t_sum - log_scale) - y
        # the streamed rows of the NEXT group carry the updated scale;
        # rows of THIS group were stored against the old one, and the
        # rescale multiplies them out of the carry only
        return (
            m * inv, i_st * inv, d * inv, j_st * inv, c_st * inv,
            n_st * inv, b_st * inv, t_sum, comp,
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
    score_ref[:, :] = jnp.log(c_st) + log_scale + tr_row_ref[1:2, :]


def _bwd_cov_kernel(
    modds_ref, iodds_ref, trans_ref, schain_ref,
    tokens_ref, lengths_ref, tr_prob_ref, tr_const_ref, total_ref,
    fm_ref, ls_ref,
    bm_in_ref, bi_in_ref, s_in_ref,
    cov_ref, bm_out_ref, bi_out_ref, s_out_ref,
    *, unroll: int,
):
    """Scaled-probability BACKWARD pass emitting coverage rows.

    Grid l reversed (index maps); within a block, steps run descending.
    Carry: beta_M/beta_I [m_pad, lanes] + specials [8, lanes]
    (b_j, b_c, b_n, lsb, kahan, pad3). At each lane's final position the
    carry resets to the L-boundary values (multihit local model:
    b_c = p_move, b_m = tmd*up(bd_L) + be_L — reference
    ops/p7_scan.py backward_scan init).
    """
    l_idx = pl.program_id(1)
    num_l = pl.num_programs(1)
    chunk_len, lanes = tokens_ref.shape
    m_pad = modds_ref.shape[0]

    modds_parts = _split3(modds_ref[:, :])
    iodds_parts = _split3(iodds_ref[:, :])
    tmm = trans_ref[:, 0:1]
    tmi = trans_ref[:, 1:2]
    tmd = trans_ref[:, 2:3]
    tim = trans_ref[:, 3:4]
    tii = trans_ref[:, 4:5]
    tdm = trans_ref[:, 5:6]

    p_loop = tr_prob_ref[0:1, :]
    p_move = tr_prob_ref[1:2, :]
    pk_b_mk = tr_const_ref[0, 0]
    pk_e_c = tr_const_ref[0, 1]
    pk_e_j = tr_const_ref[0, 2]
    lengths = lengths_ref[0:1, :]
    total = total_ref[0:1, :]
    n_passes = schain_ref.shape[1]  # truncated window (column count)

    def suffix_chain(a):
        for k in range(n_passes):
            # roll UP by 2^k == roll down by m_pad - 2^k (Pallas rolls
            # are non-negative); wrapped rows die on the chain consts
            rolled = pltpu.roll(a, shift=(m_pad - (1 << k)) % m_pad, axis=0)
            a = a + rolled * schain_ref[:, k:k + 1]
        return a

    def roll_up(x):
        return pltpu.roll(x, shift=m_pad - 1, axis=0)

    # L-boundary carry values (loop-invariant; pad rows are harmless —
    # they multiply kill_last'ed / zero transitions everywhere they
    # could propagate)
    bc_l = p_move  # [1, lanes]
    be_l = pk_e_c * bc_l
    bd_l = suffix_chain(jnp.broadcast_to(be_l, (m_pad, lanes)))
    bm_l = tmd * roll_up(bd_l) + be_l

    @pl.when(l_idx == 0)
    def _():
        bm_out_ref[:, :] = bm_in_ref[:, :]
        bi_out_ref[:, :] = bi_in_ref[:, :]
        s_out_ref[:, :] = s_in_ref[:, :]

    bm0 = bm_out_ref[:, :]
    bi0 = bi_out_ref[:, :]
    s0 = s_out_ref[:, :]

    aa_iota = jax.lax.broadcasted_iota(jnp.int32, (20, lanes), 0)
    # REVERSED grid: this block covers global positions
    # [(num_l-1-l_idx)*chunk, ...); index maps already fetch that block
    base = (num_l - 1 - l_idx) * chunk_len

    def one_step(u, bm, bi, b_j, b_c, b_n, lsb, comp):
        t = chunk_len - 1 - u  # descend within the block
        pos = base + t
        at_end = pos == (lengths - 1)
        valid = pos < lengths

        # install the boundary at each lane's last position
        bm = jnp.where(at_end, bm_l, bm)
        bi = jnp.where(at_end, 0.0, bi)
        b_j = jnp.where(at_end, 0.0, b_j)
        b_c = jnp.where(at_end, bc_l, b_c)
        b_n = jnp.where(at_end, 0.0, b_n)
        lsb = jnp.where(at_end, 0.0, lsb)
        comp = jnp.where(at_end, 0.0, comp)

        # coverage at position t pairs alpha row t with beta row t
        fm = fm_ref[pl.ds(t, 1), :, :][0].astype(jnp.float32)
        lsf = ls_ref[pl.ds(t, 1), :]
        cov = jnp.sum(fm * bm, axis=0, keepdims=True)
        cov = cov * jnp.exp(lsf + lsb - total)
        cov_ref[pl.ds(t, 1), :] = jnp.where(valid, cov, 0.0)

        # update with token t -> beta at t-1
        tok = tokens_ref[pl.ds(t, 1), :]
        onehot = (aa_iota == tok).astype(jnp.bfloat16)
        ms = _select3(modds_parts, onehot)
        is_ = _select3(iodds_parts, onehot)

        memit = ms * bm
        iemit = is_ * bi
        m_next = roll_up(memit)
        new_bspec = pk_b_mk * jnp.sum(memit, axis=0, keepdims=True)
        new_j = p_loop * b_j + p_move * new_bspec
        new_n = p_loop * b_n + p_move * new_bspec
        new_c = p_loop * b_c
        new_e = pk_e_c * new_c + pk_e_j * new_j
        new_i = tim * m_next + tii * iemit
        a0 = tdm * m_next + new_e
        new_d = suffix_chain(a0)
        new_m = tmm * m_next + tmi * iemit + tmd * roll_up(new_d) + new_e

        return (
            jnp.where(valid, new_m, bm),
            jnp.where(valid, new_i, bi),
            jnp.where(valid, new_j, b_j),
            jnp.where(valid, new_c, b_c),
            jnp.where(valid, new_n, b_n),
            lsb,
            comp,
        )

    def step(g, carry):
        bm, bi, b_j, b_c, b_n, lsb, comp = carry
        for k in range(unroll):
            bm, bi, b_j, b_c, b_n, lsb, comp = one_step(
                g * unroll + k, bm, bi, b_j, b_c, b_n, lsb, comp
            )
        # rescale (scale-invariant; Kahan-compensated like forward)
        s = jnp.maximum(
            jnp.maximum(jnp.max(bm, axis=0, keepdims=True), b_c),
            jnp.maximum(b_n, jnp.float32(1e-30)),
        )
        inv = 1.0 / s
        y = jnp.log(s) - comp
        t_sum = lsb + y
        comp = (t_sum - lsb) - y
        return (bm * inv, bi * inv, b_j * inv, b_c * inv, b_n * inv,
                t_sum, comp)

    bm, bi, b_j, b_c, b_n, lsb, comp = jax.lax.fori_loop(
        0, chunk_len // unroll, step,
        (bm0, bi0, s0[0:1, :], s0[1:2, :], s0[2:3, :], s0[3:4, :],
         s0[4:5, :]),
    )

    bm_out_ref[:, :] = bm
    bi_out_ref[:, :] = bi
    pad = jnp.zeros((3, lanes), dtype=jnp.float32)
    s_out_ref[:, :] = jnp.concatenate(
        [b_j, b_c, b_n, lsb, comp, pad], axis=0
    )


def _pick(m_pad: int, lanes: int = LANES) -> tuple[int, int]:
    l_chunk = POST_L_CHUNK if m_pad <= 1536 else POST_L_CHUNK // 2
    # wider lane tiles multiply the fm VMEM block; keep it ~constant
    l_chunk = max(8, l_chunk // max(lanes // LANES, 1))
    return l_chunk, pick_p7_unroll(m_pad, l_chunk, STEP_UNROLL)


@functools.partial(jax.jit, static_argnames=("interpret", "lanes"))
def _posterior_padded(
    modds_t, iodds_t, trans_t, chain_t, schain_t, tokens_i8_t, lengths,
    tr_rows, tr_probs, tr_consts, interpret: bool, lanes: int = LANES,
):
    """Two pallas passes over padded operands.

    Returns (cov [L_pad, B_pad] f32, totals [B_pad] f32 log-space).
    ``tr_probs`` is [2, B_pad] (host-exact p_loop/p_move rows);
    ``tr_consts`` is the [1, 3] (B->Mk, E->C, E->J) probability scalars
    (SMEM — a lane row would only reach the first 128-lane block).
    """
    m_pad = modds_t.shape[0]
    l_pad, b_pad = tokens_i8_t.shape
    l_chunk, unroll = _pick(m_pad, lanes)
    assert l_pad % l_chunk == 0 and b_pad % lanes == 0
    num_b = b_pad // lanes
    num_l = l_pad // l_chunk
    lengths2d = lengths.reshape(1, b_pad)
    tokens32 = tokens_i8_t.astype(jnp.int32)

    core0 = jnp.zeros((m_pad, b_pad), dtype=jnp.float32)
    s0 = jnp.zeros((8, b_pad), dtype=jnp.float32)
    s0 = s0.at[2].set(1.0)  # N = 1
    s0 = s0.at[3].set(tr_probs[1])  # B = move prob

    carry_spec = pl.BlockSpec(
        (m_pad, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec((8, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM)
    prof_specs = [
        pl.BlockSpec((m_pad, 20), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m_pad, 20), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m_pad, 8), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
        # chain block width = the truncated window (column count IS the
        # pass count — prepare_p7_device_prob / prepare_suffix_chain)
        pl.BlockSpec(
            (m_pad, chain_t.shape[1]), lambda b, l: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    tok_spec = pl.BlockSpec(
        (l_chunk, lanes), lambda b, l: (l, b), memory_space=pltpu.VMEM
    )
    row_spec = pl.BlockSpec((1, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM)
    probs_spec = pl.BlockSpec((2, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    fm_spec = pl.BlockSpec(
        (l_chunk, m_pad, lanes), lambda b, l: (l, 0, b), memory_space=pltpu.VMEM
    )
    ls_spec = pl.BlockSpec(
        (l_chunk, lanes), lambda b, l: (l, b), memory_space=pltpu.VMEM
    )

    score, fm, ls, *_ = pl.pallas_call(
        functools.partial(_fwd_save_kernel, unroll=unroll),
        grid=(num_b, num_l),
        in_specs=prof_specs + [
            tok_spec, row_spec, probs_spec,
            pl.BlockSpec((2, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            smem_spec,
            carry_spec, carry_spec, carry_spec, s_spec,
        ],
        input_output_aliases={9: 3, 10: 4, 11: 5, 12: 6},
        out_specs=(
            row_spec, fm_spec, ls_spec,
            carry_spec, carry_spec, carry_spec, s_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((l_pad, m_pad, b_pad), jnp.bfloat16),
            jax.ShapeDtypeStruct((l_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, b_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # 512-lane tiles spill ~102MB of scoped stack (measured OOM
            # at 100MB, r4 post_lab); v5e has 128MiB VMEM/core
            vmem_limit_bytes=118 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        modds_t, iodds_t, trans_t, chain_t, tokens32, lengths2d,
        tr_probs, tr_rows, tr_consts, core0, core0, core0, s0,
    )

    rev = lambda b, l: ((num_l - 1 - l), b)  # noqa: E731
    rev3 = lambda b, l: ((num_l - 1 - l), 0, b)  # noqa: E731
    tok_rev = pl.BlockSpec((l_chunk, lanes), rev, memory_space=pltpu.VMEM)
    fm_rev = pl.BlockSpec((l_chunk, m_pad, lanes), rev3, memory_space=pltpu.VMEM)
    ls_rev = pl.BlockSpec((l_chunk, lanes), rev, memory_space=pltpu.VMEM)
    cov_rev = pl.BlockSpec((l_chunk, lanes), rev, memory_space=pltpu.VMEM)
    sb0 = jnp.zeros((8, b_pad), dtype=jnp.float32)

    cov, *_ = pl.pallas_call(
        functools.partial(_bwd_cov_kernel, unroll=unroll),
        grid=(num_b, num_l),
        in_specs=prof_specs[:3] + [
            pl.BlockSpec(
                (m_pad, schain_t.shape[1]), lambda b, l: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            tok_rev, row_spec, probs_spec, smem_spec, row_spec,
            fm_rev, ls_rev,
            carry_spec, carry_spec, s_spec,
        ],
        input_output_aliases={11: 1, 12: 2, 13: 3},
        out_specs=(cov_rev, carry_spec, carry_spec, s_spec),
        out_shape=(
            jax.ShapeDtypeStruct((l_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((8, b_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            # 512-lane tiles spill ~102MB of scoped stack (measured OOM
            # at 100MB, r4 post_lab); v5e has 128MiB VMEM/core
            vmem_limit_bytes=118 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        modds_t, iodds_t, trans_t, schain_t, tokens32, lengths2d,
        tr_probs, tr_consts, score, fm, ls, core0, core0, sb0,
    )
    return cov, score[0]




@functools.partial(jax.jit, static_argnames=("threshold",))
def _device_mask(cov, threshold: float):
    """uint8 0/1 of ``cov >= threshold`` — computed on device so the
    host transfer is 1/4 the f32 coverage rows."""
    return (cov >= jnp.float32(threshold)).astype(jnp.uint8)


def _maybe_mask(cov_tot, threshold):
    cov, tot = cov_tot
    if threshold is None:
        return cov, tot
    return (np.asarray(cov) >= np.float32(threshold)).astype(np.uint8), tot


def posterior_coverage_batch_pallas(
    p7: P7Profile,
    tokens,
    lengths,
    interpret: bool = False,
    batch_chunk: int | None = None,
    lanes: int = LANES,
    mesh=None,
    hw_fallback: bool = True,
    mask_threshold: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Batched coverage via the two-pass Pallas decode.

    Same contract as ops.p7_scan.posterior_coverage_batch_xla:
    (coverage [B, L_pad] f32 zeroed past each length, totals [B]).
    ``batch_chunk`` bounds the bf16 [L_pad, M_pad, B_chunk] forward-row
    stream resident in HBM at once; the default auto-picks the widest
    chunk under POST_HBM_BYTES (round 3 — was a fixed 128-lane loop,
    which serialized hit batches host-side). ``mesh`` shards the hit
    batch over the mesh's db axis (parallel.database
    make_db_posterior_scanner) — the --domains path rides the mesh like
    every other stage.

    ``mask_threshold`` (round 5): threshold the coverage ON DEVICE and
    return a uint8 0/1 mask instead of f32 rows — the only thing the
    --domains envelope extractor reads is ``cov >= 0.5``, and the f32
    transfer was ~1/3 of the decode's e2e wall on the remote tunnel
    (4 MB at ~47 MB/s per 1024x1024 hit batch; docs/PERFORMANCE.md
    round-5 floor table). Thresholding commutes with the host version
    exactly (same f32 compare, just executed on device).
    """
    tokens = np.asarray(tokens, dtype=np.int32)
    lengths_np = np.asarray(lengths, dtype=np.int32)
    b, seq_len = tokens.shape
    m_pad = _round_up(max(p7.num_states, 8), 8)
    l_chunk, _ = _pick(m_pad, lanes)
    l_pad = _round_up(max(seq_len, 1), l_chunk)

    # the streamed bf16 alpha rows cost l_pad * m_pad * b_pad * 2 B of
    # HBM per dispatch; auto-pick the widest batch chunk under the
    # budget (round 3: was a fixed 128-lane host loop), and fall back to
    # the lax.scan decode only when even one lane-block cannot fit
    gran = lanes
    if mesh is not None:
        from ..parallel.mesh import DB_AXIS

        gran = lanes * mesh.shape[DB_AXIS]
    bytes_per_lane = l_pad * m_pad * 2
    if bytes_per_lane * gran > POST_HBM_BYTES:
        from .p7_scan import posterior_coverage_batch_xla

        return _maybe_mask(
            posterior_coverage_batch_xla(p7, tokens, lengths_np),
            mask_threshold,
        )
    if batch_chunk is None:
        batch_chunk = max(
            gran, POST_HBM_BYTES // (bytes_per_lane * gran) * gran
        )

    packed = prepare_p7_device_prob(p7)
    schain = prepare_suffix_chain(p7)
    dev = tuple(jnp.asarray(x) for x in packed[:4])
    schain_dev = jnp.asarray(schain)
    tr_consts = jnp.asarray(packed[4])  # [1, 3] probability scalars

    out_dtype = np.float32 if mask_threshold is None else np.uint8
    cov_out = np.zeros((b, l_pad), dtype=out_dtype)
    tot_out = np.zeros(b, dtype=np.float32)
    scan_fn = None
    if mesh is not None:
        from ..parallel.database import make_db_posterior_scanner

        scan_fn = make_db_posterior_scanner(
            mesh, interpret=interpret, lanes=lanes
        )
    hw_key = (m_pad, l_chunk, lanes)
    if hw_fallback and not interpret and _POST_HW_VERDICT.get(hw_key) is False:
        # this shape's kernel already failed Mosaic compile
        from .p7_scan import posterior_coverage_batch_xla

        return _maybe_mask(
            posterior_coverage_batch_xla(p7, tokens, lengths_np),
            mask_threshold,
        )
    for lo in range(0, b, batch_chunk):
        hi = min(lo + batch_chunk, b)
        nb = hi - lo
        b_pad = _round_up(nb, gran)
        tok_t = np.full((l_pad, b_pad), 127, dtype=np.int8)
        tok_t[:seq_len, :nb] = tokens[lo:hi].T
        lens_p = np.zeros(b_pad, dtype=np.int32)
        lens_p[:nb] = lengths_np[lo:hi]
        blank_ragged_tail(tok_t, lens_p)
        tr_loop, tr_move = length_transitions(lens_p)
        tr_rows = np.stack([tr_loop, tr_move]).astype(np.float32)
        probs2 = length_transition_probs(lens_p)  # [2, B_pad]

        if scan_fn is not None:
            cov, tot = scan_fn(
                *dev, schain_dev,
                jnp.asarray(tok_t), jnp.asarray(lens_p),
                jnp.asarray(tr_rows), jnp.asarray(probs2), tr_consts,
            )
        else:
            cov, tot = _posterior_padded(
                *dev, schain_dev,
                jnp.asarray(tok_t), jnp.asarray(lens_p),
                jnp.asarray(tr_rows), jnp.asarray(probs2), tr_consts,
                interpret=interpret, lanes=lanes,
            )
        if mask_threshold is not None:
            cov = _device_mask(cov, float(mask_threshold))
        try:
            cov_np = np.asarray(cov)
        except Exception as e:  # pragma: no cover — hardware only
            # the bf16 alpha-stream kernel landed after the tunnel's
            # last up-window and has never been through real Mosaic
            # codegen; a compile rejection (a failure class interpret
            # mode cannot see) must not kill the --domains path
            if not hw_fallback or interpret:
                raise
            logger.warning(
                "pallas posterior kernel failed to compile for m_pad=%d "
                "(%s: %.200s); falling back to the lax.scan decode",
                m_pad, type(e).__name__, e,
            )
            _POST_HW_VERDICT[hw_key] = False
            from .p7_scan import posterior_coverage_batch_xla

            return _maybe_mask(
                posterior_coverage_batch_xla(p7, tokens, lengths_np),
                mask_threshold,
            )
        _POST_HW_VERDICT[hw_key] = True
        cov_out[lo:hi] = cov_np[:, :nb].T
        tot_out[lo:hi] = np.asarray(tot)[:nb]
    return cov_out, tot_out
