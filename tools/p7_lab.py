"""p7 kernel ablation lab: where does the Viterbi step time go?

Variants (PERF BOUNDS ONLY — ablations compute wrong scores):
  full      — production math
  nochain   — delete chain replaced by D = a0 (bounds chain cost)
  noisc     — insert emission matmul skipped (is_ = 0)
  nomm      — both emission matmuls skipped (constant emissions)
  chainonly — only the delete chain + E (no M/I updates)
Run: python tools/p7_lab.py [--batch 1024] [--m 1400] [--unroll N]
"""

from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hmm_fasta_viterbi_tpu import parse_hmm
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile
from hmm_fasta_viterbi_tpu.ops.pallas_msv import LANES, NEG_INF
from hmm_fasta_viterbi_tpu.ops.pallas_p7 import (
    _split3,
    _select3,
    _prepare_tokens,
    prepare_p7_device,
)


def _kernel(
    msc_ref, isc_ref, trans_ref, chain_ref, tokens_ref, lengths_ref,
    tr_row_ref, tr_const_ref, m_in_ref, i_in_ref, d_in_ref, s_in_ref,
    score_ref, m_out_ref, i_out_ref, d_out_ref, s_out_ref,
    *, unroll, skip_chain, skip_isc, skip_msc, chain_only,
):
    l_idx = pl.program_id(1)
    chunk_len, lanes = tokens_ref.shape
    m_pad = msc_ref.shape[0]
    combine = jnp.maximum

    msc_parts = _split3(msc_ref[:, :])
    isc_parts = _split3(isc_ref[:, :])
    tmm = trans_ref[:, 0:1]
    tmi = trans_ref[:, 1:2]
    tmd = trans_ref[:, 2:3]
    tim = trans_ref[:, 3:4]
    tii = trans_ref[:, 4:5]
    tdm = trans_ref[:, 5:6]

    tr_b_mk = tr_const_ref[0, 0]
    tr_e_c = tr_const_ref[0, 1]
    tr_e_j = tr_const_ref[0, 2]
    tr_loop = tr_row_ref[0:1, :]
    tr_move = tr_row_ref[1:2, :]
    lengths = lengths_ref[0:1, :]
    n_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))

    def delete_chain(a):
        if skip_chain:
            return a
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

    aa_iota = jax.lax.broadcasted_iota(jnp.int32, (20, lanes), 0)
    row0_mask = jax.lax.broadcasted_iota(jnp.int32, (m_pad, lanes), 0) == 0
    base = l_idx * chunk_len
    neg = jnp.float32(NEG_INF)

    def one_step(t, m, i_st, d, j_st, c_st, n_st, b_st):
        tok = tokens_ref[pl.ds(t, 1), :]
        onehot = (aa_iota == tok).astype(jnp.bfloat16)
        ms = jnp.float32(0.1) if skip_msc else _select3(msc_parts, onehot)
        is_ = jnp.float32(0.1) if skip_isc else _select3(isc_parts, onehot)

        if chain_only:
            a0 = jnp.where(row0_mask, neg, pltpu.roll(m + tmd, shift=1, axis=0))
            new_d = delete_chain(a0)
            e_st = jnp.max(combine(m, new_d), axis=0, keepdims=True)
            new_j = combine(j_st + tr_loop, e_st + tr_e_j)
            new_c = combine(c_st + tr_loop, e_st + tr_e_c)
            new_n = n_st + tr_loop
            new_b = combine(new_n + tr_move, new_j + tr_move)
            valid = (base + t) < lengths
            return (m, i_st, new_d,
                    jnp.where(valid, new_j, j_st),
                    jnp.where(valid, new_c, c_st),
                    jnp.where(valid, new_n, n_st),
                    jnp.where(valid, new_b, b_st))

        diag_stay = combine(combine(m + tmm, i_st + tim), d + tdm)
        diag = jnp.where(row0_mask, neg, pltpu.roll(diag_stay, shift=1, axis=0))
        new_m = ms + combine(diag, b_st + tr_b_mk)
        new_i = is_ + combine(m + tmi, i_st + tii)
        a0 = jnp.where(row0_mask, neg, pltpu.roll(new_m + tmd, shift=1, axis=0))
        new_d = delete_chain(a0)
        e_st = jnp.max(combine(new_m, new_d), axis=0, keepdims=True)
        new_j = combine(j_st + tr_loop, e_st + tr_e_j)
        new_c = combine(c_st + tr_loop, e_st + tr_e_c)
        new_n = n_st + tr_loop
        new_b = combine(new_n + tr_move, new_j + tr_move)
        valid = (base + t) < lengths
        return (new_m, new_i, new_d,
                jnp.where(valid, new_j, j_st),
                jnp.where(valid, new_c, c_st),
                jnp.where(valid, new_n, n_st),
                jnp.where(valid, new_b, b_st))

    def step(u, carry):
        m, i_st, d, j_st, c_st, n_st, b_st = carry
        for k in range(unroll):
            m, i_st, d, j_st, c_st, n_st, b_st = one_step(
                u * unroll + k, m, i_st, d, j_st, c_st, n_st, b_st)
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


@functools.partial(jax.jit, static_argnames=(
    "l_chunk", "unroll", "skip_chain", "skip_isc", "skip_msc", "chain_only",
    "lanes"))
def lab_call(msc_t, isc_t, trans_t, chain_t, tokens_t, lengths, tr_rows,
             tr_consts, l_chunk=256, unroll=4, skip_chain=False,
             skip_isc=False, skip_msc=False, chain_only=False, lanes=LANES):
    m_pad = msc_t.shape[0]
    l_pad, b_pad = tokens_t.shape
    assert b_pad % lanes == 0, (b_pad, lanes)
    num_b = b_pad // lanes
    num_l = l_pad // l_chunk
    lengths2d = lengths.reshape(1, b_pad)
    neg = jnp.float32(NEG_INF)
    core_init = jnp.full((m_pad, b_pad), neg, dtype=jnp.float32)
    s_init = jnp.stack([
        jnp.full((b_pad,), neg, dtype=jnp.float32),
        jnp.full((b_pad,), neg, dtype=jnp.float32),
        jnp.zeros((b_pad,), dtype=jnp.float32),
        tr_rows[1],
    ])
    carry_spec = pl.BlockSpec((m_pad, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((4, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM)
    score, *_ = pl.pallas_call(
        functools.partial(_kernel, unroll=unroll, skip_chain=skip_chain,
                          skip_isc=skip_isc, skip_msc=skip_msc,
                          chain_only=chain_only),
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
            carry_spec, carry_spec, carry_spec, s_spec,
        ],
        input_output_aliases={8: 1, 9: 2, 10: 3, 11: 4},
        out_specs=(
            pl.BlockSpec((1, lanes), lambda b, l: (0, b), memory_space=pltpu.VMEM),
            carry_spec, carry_spec, carry_spec, s_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((4, b_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(msc_t, isc_t, trans_t, chain_t, tokens_t, lengths2d, tr_rows,
      tr_consts, core_init, core_init, core_init, s_init)
    return score[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--m", type=int, default=1400)
    ap.add_argument("--seq-len", type=int, default=3500)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="full,nochain,noisc,nomm,chainonly")
    ap.add_argument(
        "--lanes", type=int, default=LANES,
        help="lane-tile width (batch per tile); the production Viterbi "
        "schedule uses 512 — the round-1 chain=49%% ablation was at 128",
    )
    args = ap.parse_args()

    p7 = P7Profile.from_profile(
        parse_hmm(REPO / "data" / "profile_HMMs" / f"{args.m}.hmm"))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 20, size=(args.batch, args.seq_len)).astype(np.int32)
    lengths = np.full(args.batch, args.seq_len, dtype=np.int32)
    cells = int(lengths.astype(np.int64).sum()) * (p7.model_length - 1)

    tokens_t, lengths_p, tr_rows, b, l_chunk = _prepare_tokens(tokens, lengths, 256)
    msc_t, isc_t, trans_t, chain_t, tr_consts = prepare_p7_device(p7)
    dev = [jnp.asarray(x) for x in
           (msc_t, isc_t, trans_t, chain_t, tokens_t.astype(np.int32),
            lengths_p, tr_rows, tr_consts)]

    cfg = {
        "full": dict(),
        "nochain": dict(skip_chain=True),
        "noisc": dict(skip_isc=True),
        "nomm": dict(skip_isc=True, skip_msc=True),
        "chainonly": dict(chain_only=True),
    }
    for name in args.variants.split(","):
        kw = cfg[name]
        def call():
            return lab_call(*dev, l_chunk=l_chunk, unroll=args.unroll,
                            lanes=args.lanes, **kw)
        np.asarray(call())
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter(); np.asarray(call()); best = min(best, time.perf_counter()-t0)
        print(f"{name:10s} {cells/best/1e9:8.2f} GCUPS {best*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
