"""Kernel experiment lab: time MSV Pallas variants on the real chip.

Variants (all must stay within 1e-4 of the oracle on a ragged batch):
  v0    — current production kernel (ops/pallas_msv.py)
  nomask  — drop the [M_pad, LANES] validity select on the M carry; only
            the 4 special rows are masked (the M carry of a finished lane
            is garbage, but nothing reads it: specials are frozen)
  split3  — manual 3-term bf16 split of the score matrix + DEFAULT
            precision matmuls (3 MXU passes) instead of Precision.HIGHEST
            (6 passes on f32 x f32)
  group   — one emission matmul per unroll group: [M,20] @ [20, U*128]
Run: python tools/kernel_lab.py [--batch 4096] [--m 1400]
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

from hmm_fasta_viterbi_tpu import MSVProfile, parse_hmm
from hmm_fasta_viterbi_tpu.models.msv import length_transitions
from hmm_fasta_viterbi_tpu.ops.pallas_msv import (
    LANES,
    NEG_INF,
    PAD_SCORE,
    prepare_scores_t,
    _prepare_batch,
)
from hmm_fasta_viterbi_tpu.ops.reference import msv_oracle_batch


def _variant_kernel(
    scores_ref, tokens_ref, lengths_ref, tr_row_ref, tr_const_ref,
    m_in_ref, s_in_ref, score_ref, m_out_ref, s_out_ref,
    *, unroll, mask_m, split3, group,
):
    p_idx = pl.program_id(0)
    l_idx = pl.program_id(2)
    chunk_len, lanes = tokens_ref.shape
    m_pad = scores_ref.shape[1]
    scores = scores_ref[0, :, :]

    if split3:
        s_hi = scores.astype(jnp.bfloat16)
        r1 = scores - s_hi.astype(jnp.float32)
        s_mid = r1.astype(jnp.bfloat16)
        s_lo = (r1 - s_mid.astype(jnp.float32)).astype(jnp.bfloat16)

    tr_b_mk = tr_const_ref[p_idx, 0]
    tr_e_c = tr_const_ref[p_idx, 1]
    tr_e_j = tr_const_ref[p_idx, 2]
    tr_loop = tr_row_ref[0:1, :]
    tr_move = tr_row_ref[1:2, :]
    lengths = lengths_ref[0:1, :]

    @pl.when(l_idx == 0)
    def _():
        m_out_ref[:, :] = m_in_ref[:, :]
        s_out_ref[:, :] = s_in_ref[:, :]

    m0 = m_out_ref[:, :]
    s0 = s_out_ref[:, :]

    aa_iota = jax.lax.broadcasted_iota(jnp.int32, (20, lanes), 0)
    row0_mask = jax.lax.broadcasted_iota(jnp.int32, (m_pad, lanes), 0) == 0
    base = l_idx * chunk_len

    def emit_of(onehot):
        if split3:
            oh = onehot.astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            acc = jax.lax.dot_general(
                s_hi, oh, dn, preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                s_mid, oh, dn, preferred_element_type=jnp.float32)
            acc += jax.lax.dot_general(
                s_lo, oh, dn, preferred_element_type=jnp.float32)
            return acc
        return jax.lax.dot_general(
            scores, onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def dp_step(t, emit, m, j_st, c_st, n_st, b_st):
        shifted = jnp.where(
            row0_mask, jnp.float32(NEG_INF), pltpu.roll(m, shift=1, axis=0)
        )
        new_m = emit + jnp.maximum(shifted, b_st + tr_b_mk)
        e_st = jnp.max(new_m, axis=0, keepdims=True)
        new_j = jnp.maximum(j_st + tr_loop, e_st + tr_e_j)
        new_c = jnp.maximum(c_st + tr_loop, e_st + tr_e_c)
        new_n = n_st + tr_loop
        new_b = jnp.maximum(new_n + tr_move, new_j + tr_move)
        valid = (base + t) < lengths
        return (
            jnp.where(valid, new_m, m) if mask_m else new_m,
            jnp.where(valid, new_j, j_st),
            jnp.where(valid, new_c, c_st),
            jnp.where(valid, new_n, n_st),
            jnp.where(valid, new_b, b_st),
        )

    def step(u, carry):
        m, j_st, c_st, n_st, b_st = carry
        if group:
            toks = tokens_ref[pl.ds(u * unroll, unroll), :]  # [U, LANES]
            oh = (
                jax.lax.broadcasted_iota(jnp.int32, (20, unroll, lanes), 0)
                == toks[None]
            ).astype(jnp.float32).reshape(20, unroll * lanes)
            emit_g = emit_of(oh)  # [M_pad, U*LANES]
            for k in range(unroll):
                emit = emit_g[:, k * lanes:(k + 1) * lanes]
                m, j_st, c_st, n_st, b_st = dp_step(
                    u * unroll + k, emit, m, j_st, c_st, n_st, b_st)
        else:
            for k in range(unroll):
                t = u * unroll + k
                tok = tokens_ref[pl.ds(t, 1), :]
                onehot = (aa_iota == tok).astype(jnp.float32)
                emit = emit_of(onehot)
                m, j_st, c_st, n_st, b_st = dp_step(
                    t, emit, m, j_st, c_st, n_st, b_st)
        return (m, j_st, c_st, n_st, b_st)

    m, j_st, c_st, n_st, b_st = jax.lax.fori_loop(
        0, chunk_len // unroll, step,
        (m0, s0[0:1, :], s0[1:2, :], s0[2:3, :], s0[3:4, :]),
    )
    m_out_ref[:, :] = m
    s_out_ref[:, :] = jnp.concatenate([j_st, c_st, n_st, b_st], axis=0)
    score_ref[0, :, :] = c_st + tr_move


@functools.partial(
    jax.jit,
    static_argnames=("l_chunk", "unroll", "mask_m", "split3", "group"),
)
def variant_call(
    scores_t, tokens_t, lengths, tr_rows, tr_consts,
    l_chunk=512, unroll=8, mask_m=True, split3=False, group=False,
):
    num_p, m_pad, _ = scores_t.shape
    l_pad, b_pad = tokens_t.shape
    num_b = b_pad // LANES
    num_l = l_pad // l_chunk
    lengths2d = lengths.reshape(1, b_pad)
    neg = jnp.float32(NEG_INF)
    m_init = jnp.full((m_pad, b_pad), neg, dtype=jnp.float32)
    s_init = jnp.stack([
        jnp.full((b_pad,), neg, dtype=jnp.float32),
        jnp.full((b_pad,), neg, dtype=jnp.float32),
        jnp.zeros((b_pad,), dtype=jnp.float32),
        tr_rows[1],
    ])
    score, m_out, s_out = pl.pallas_call(
        functools.partial(
            _variant_kernel, unroll=unroll, mask_m=mask_m,
            split3=split3, group=group,
        ),
        grid=(num_p, num_b, num_l),
        in_specs=[
            pl.BlockSpec((1, m_pad, 20), lambda p, b, l: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_chunk, LANES), lambda p, b, l: (l, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LANES), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((m_pad, LANES), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LANES), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, LANES), lambda p, b, l: (p, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, LANES), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, LANES), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_p, 1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((4, b_pad), jnp.float32),
        ),
    )(scores_t, tokens_t, lengths2d, tr_rows, tr_consts, m_init, s_init)
    return score[:, 0, :]


def run_variant(profile, tokens, lengths, reps=3, **kw):
    tokens_t, lengths_p, tr_rows, b, l_chunk = _prepare_batch(
        tokens, lengths, kw.pop("l_chunk", 512))
    scores_t = jnp.asarray(prepare_scores_t(profile)[None])
    tr_consts = jnp.asarray(
        np.array([[profile.tr_B_Mk, profile.tr_E_C, profile.tr_E_J]],
                 dtype=np.float32))
    dev = dict(
        scores_t=scores_t,
        tokens_t=jnp.asarray(tokens_t.astype(np.int32)),
        lengths=jnp.asarray(lengths_p),
        tr_rows=jnp.asarray(tr_rows),
        tr_consts=tr_consts,
    )

    def call():
        return variant_call(l_chunk=l_chunk, **dev, **kw)

    out = np.asarray(call())  # warmup/compile + correctness sample
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(call())
        best = min(best, time.perf_counter() - t0)
    return out[0, :b], best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--m", type=int, default=1400)
    ap.add_argument("--seq-len", type=int, default=3500)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="v0,nomask,split3,group,combo")
    args = ap.parse_args()

    profile = MSVProfile.from_profile(
        parse_hmm(REPO / "data" / "profile_HMMs" / f"{args.m}.hmm"))
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 20, size=(args.batch, args.seq_len)).astype(np.int32)
    lengths = np.full(args.batch, args.seq_len, dtype=np.int32)

    # small ragged set for correctness
    ctok = rng.integers(0, 20, size=(8, 300)).astype(np.int32)
    clen = np.array([300, 150, 1, 17, 300, 299, 64, 2], dtype=np.int32)
    want = msv_oracle_batch(profile, ctok, clen)

    cfg = {
        "v0": dict(),
        "nomask": dict(mask_m=False),
        "split3": dict(split3=True),
        "group": dict(group=True, unroll=4),
        "combo": dict(mask_m=False, split3=True, group=True, unroll=4),
    }
    cells = int(lengths.astype(np.int64).sum()) * (profile.model_length - 1)
    for name in args.variants.split(","):
        kw = cfg[name]
        got_c, _ = run_variant(profile, ctok, clen, reps=1, **kw)
        err = np.abs(got_c - want).max()
        _, secs = run_variant(profile, tokens, lengths, reps=args.reps, **kw)
        print(f"{name:8s} {cells/secs/1e9:8.2f} GCUPS  {secs*1e3:8.1f} ms  "
              f"maxerr {err:.2e} {'OK' if err < 1e-4 else 'FAIL'}")


if __name__ == "__main__":
    main()
