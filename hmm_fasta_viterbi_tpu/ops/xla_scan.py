"""XLA-compiled MSV scan: the whole residue recurrence inside ONE program.

This is the TPU-first answer to the reference's launch-bound OpenCL host
loop (algorithms/MSV_HMM.cpp:269-430 enqueues ~L*(3+log2 M) kernels per
sequence — SURVEY.md §3.2): here the full scan is a single
``jax.lax.scan`` under ``jit``, batched over sequences, with the E-state
reduction fused into each step. Emission selection uses an exact gather
(``scores_real[tok]``), so scores match the float32 oracle bit-for-bit up
to libm ulp differences — well inside the reference's 1e-4 tolerance
(algorithms/test_MSV.cpp:10-12).

The per-step recurrence mirrors MSV_HMM.cpp:100-111; see
ops.reference.msv_oracle for the annotated math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.msv import MSVProfile, length_transitions

NEG_INF = float(-np.inf)


@functools.partial(jax.jit, static_argnames=("unroll",))
def msv_scan_batch(
    scores_real: jax.Array,  # [20, Mr] f32, finite
    tr_B_Mk: jax.Array,  # f32 scalar
    tr_E_C: jax.Array,  # f32 scalar
    tr_E_J: jax.Array,  # f32 scalar
    tokens: jax.Array,  # [B, L] int32 (0..19; padded steps masked)
    lengths: jax.Array,  # [B] int32
    tr_loop: jax.Array,  # [B] f32 (precomputed log(L/(L+3)))
    tr_move: jax.Array,  # [B] f32 (precomputed log(3/(L+3)))
    unroll: int = 4,
) -> jax.Array:
    """Score a padded batch of sequences; returns f32 [B] log-odds."""
    batch, seq_len = tokens.shape
    num_states = scores_real.shape[1]
    neg_inf = jnp.float32(NEG_INF)

    init = (
        jnp.full((batch, num_states), neg_inf, dtype=jnp.float32),  # M row
        jnp.full((batch,), neg_inf, dtype=jnp.float32),  # J
        jnp.full((batch,), neg_inf, dtype=jnp.float32),  # C
        jnp.zeros((batch,), dtype=jnp.float32),  # N
        tr_move.astype(jnp.float32),  # B (dp[0][B] = tr_move)
    )

    def step(carry, x):
        m_row, j_st, c_st, n_st, b_st = carry
        tok, i = x  # tok [B], i scalar step index
        emit = scores_real[tok]  # exact gather -> [B, Mr]
        shifted = jnp.concatenate(
            [jnp.full((batch, 1), neg_inf, dtype=jnp.float32), m_row[:, :-1]], axis=1
        )
        new_m = emit + jnp.maximum(shifted, (b_st + tr_B_Mk)[:, None])
        e_st = jnp.max(new_m, axis=1)
        new_j = jnp.maximum(j_st + tr_loop, e_st + tr_E_J)
        new_c = jnp.maximum(c_st + tr_loop, e_st + tr_E_C)
        new_n = n_st + tr_loop
        new_b = jnp.maximum(new_n + tr_move, new_j + tr_move)

        valid = i < lengths  # padded steps are no-ops on the carry
        carry = (
            jnp.where(valid[:, None], new_m, m_row),
            jnp.where(valid, new_j, j_st),
            jnp.where(valid, new_c, c_st),
            jnp.where(valid, new_n, n_st),
            jnp.where(valid, new_b, b_st),
        )
        return carry, None

    xs = (tokens.T, jnp.arange(seq_len, dtype=jnp.int32))
    (m_row, j_st, c_st, n_st, b_st), _ = jax.lax.scan(step, init, xs, unroll=unroll)
    del m_row, j_st, n_st, b_st
    return c_st + tr_move  # final C->T move (MSV_HMM.cpp:112)


def msv_xla(
    profile: MSVProfile,
    tokens: np.ndarray | jax.Array,
    lengths: np.ndarray | jax.Array,
    unroll: int = 4,
) -> jax.Array:
    """Convenience wrapper: prepares f32 constants on host and scans."""
    tr_loop, tr_move = length_transitions(np.asarray(lengths))
    return msv_scan_batch(
        jnp.asarray(profile.scores_real),
        jnp.float32(profile.tr_B_Mk),
        jnp.float32(profile.tr_E_C),
        jnp.float32(profile.tr_E_J),
        jnp.asarray(tokens, dtype=jnp.int32),
        jnp.asarray(lengths, dtype=jnp.int32),
        jnp.asarray(tr_loop, dtype=jnp.float32),
        jnp.asarray(tr_move, dtype=jnp.float32),
        unroll=unroll,
    )
