"""Viterbi and Forward scans for the full profile HMM (JAX, single
program), batched over sequences like the MSV path.

Both stages share one implementation parameterized by a (max,+) /
(logsumexp,+) semiring. The profile-HMM-specific hard part on TPU is the
same-row delete chain

    D_j(i) = combine(M_{j-1}(i) + tmd[j-1],  D_{j-1}(i) + tdd[j-1])

which is sequential along the state axis in scalar form; here it runs as
an ASSOCIATIVE affine scan: elements (a_j, c_j) with
    (a1, c1) (+) (a2, c2) = (combine(a2, a1 + c2), c1 + c2)
computed by ``jax.lax.associative_scan`` in O(log M) vector passes —
the TPU-native replacement for HMMER's striped lazy-F fixup loop.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.msv import length_transitions
from ..models.p7 import P7Profile

NEG_INF = float(-np.inf)


@dataclasses.dataclass(frozen=True)
class Semiring:
    combine: Callable  # binary: max or logaddexp
    reduce: Callable  # (x, axis) -> reduced


VITERBI = Semiring(combine=jnp.maximum, reduce=jnp.max)
FORWARD = Semiring(
    combine=jnp.logaddexp,
    reduce=lambda x, axis: jax.scipy.special.logsumexp(x, axis=axis),
)


def _shift_state(x: jax.Array) -> jax.Array:
    """j-1 shift along the last (state) axis, -inf fill at j=0."""
    pad = jnp.full(x.shape[:-1] + (1,), NEG_INF, dtype=x.dtype)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


def _delete_chain(sr: Semiring, a: jax.Array, c: jax.Array) -> jax.Array:
    """Affine scan along states: D_j = combine(a_j, D_{j-1} + c_j)."""

    def op(left, right):
        a1, c1 = left
        a2, c2 = right
        return sr.combine(a2, a1 + c2), c1 + c2

    d, _ = jax.lax.associative_scan(op, (a, jnp.broadcast_to(c, a.shape)), axis=-1)
    return d


def p7_scan(
    sr: Semiring,
    msc: jax.Array,  # [20, Mr]
    isc: jax.Array,  # [20, Mr]
    trans: jax.Array,  # [7, Mr] rows: tmm tmi tmd tim tii tdm tdd
    tr_B_Mk: jax.Array,
    tr_E_C: jax.Array,
    tr_E_J: jax.Array,
    tokens: jax.Array,  # [B, L] int32
    lengths: jax.Array,  # [B] int32
    tr_loop: jax.Array,  # [B] f32
    tr_move: jax.Array,  # [B] f32
    unroll: int = 1,
) -> jax.Array:
    """Score a padded batch; returns f32 [B] (C_final + tr_move)."""
    batch, seq_len = tokens.shape
    neg_inf = jnp.float32(NEG_INF)
    tmm, tmi, tmd, tim, tii, tdm, tdd = (trans[k] for k in range(7))
    # the delete-chain multiplier indexes j-1: c_j = tdd[j-1]
    tdd_s = _shift_state(tdd)

    num_states = msc.shape[1]
    init = (
        jnp.full((batch, num_states), neg_inf, dtype=jnp.float32),  # M
        jnp.full((batch, num_states), neg_inf, dtype=jnp.float32),  # I
        jnp.full((batch, num_states), neg_inf, dtype=jnp.float32),  # D
        jnp.full((batch,), neg_inf, dtype=jnp.float32),  # J
        jnp.full((batch,), neg_inf, dtype=jnp.float32),  # C
        jnp.zeros((batch,), dtype=jnp.float32),  # N
        tr_move.astype(jnp.float32),  # B
    )

    def step(carry, x):
        m, i_st, d, j_st, c_st, n_st, b_st = carry
        tok, i = x
        ms = msc[tok]  # [B, Mr]
        is_ = isc[tok]

        # M: best of {B entry, M/I/D diagonal} (combine-reduced)
        diag = sr.combine(
            sr.combine(_shift_state(m + tmm), _shift_state(i_st + tim)),
            _shift_state(d + tdm),
        )
        new_m = ms + sr.combine(diag, (b_st + tr_B_Mk)[:, None])
        # I: vertical within node
        new_i = is_ + sr.combine(m + tmi, i_st + tii)
        # D: same-row affine chain along states
        new_d = _delete_chain(sr, _shift_state(new_m + tmd), tdd_s)
        # E: local exit from every M and D (score 0)
        e_st = sr.combine(sr.reduce(new_m, axis=1), sr.reduce(new_d, axis=1))
        new_j = sr.combine(j_st + tr_loop, e_st + tr_E_J)
        new_c = sr.combine(c_st + tr_loop, e_st + tr_E_C)
        new_n = n_st + tr_loop
        new_b = sr.combine(new_n + tr_move, new_j + tr_move)

        valid = i < lengths
        vc = valid[:, None]
        carry = (
            jnp.where(vc, new_m, m),
            jnp.where(vc, new_i, i_st),
            jnp.where(vc, new_d, d),
            jnp.where(valid, new_j, j_st),
            jnp.where(valid, new_c, c_st),
            jnp.where(valid, new_n, n_st),
            jnp.where(valid, new_b, b_st),
        )
        return carry, None

    xs = (tokens.T, jnp.arange(seq_len, dtype=jnp.int32))
    carry, _ = jax.lax.scan(step, init, xs, unroll=unroll)
    return carry[4] + tr_move  # C + final move


_viterbi_jit = jax.jit(functools.partial(p7_scan, VITERBI), static_argnames=("unroll",))
_forward_jit = jax.jit(functools.partial(p7_scan, FORWARD), static_argnames=("unroll",))


def _pack(profile: P7Profile):
    trans = np.stack(
        [profile.tmm, profile.tmi, profile.tmd, profile.tim, profile.tii,
         profile.tdm, profile.tdd]
    ).astype(np.float32)
    return (
        jnp.asarray(profile.msc),
        jnp.asarray(profile.isc),
        jnp.asarray(trans),
        jnp.float32(profile.tr_B_Mk),
        jnp.float32(profile.tr_E_C),
        jnp.float32(profile.tr_E_J),
    )


def _run(jitted, profile, tokens, lengths, unroll=1):
    tr_loop, tr_move = length_transitions(np.asarray(lengths))
    return jitted(
        *_pack(profile),
        jnp.asarray(tokens, dtype=jnp.int32),
        jnp.asarray(lengths, dtype=jnp.int32),
        jnp.asarray(tr_loop, dtype=jnp.float32),
        jnp.asarray(tr_move, dtype=jnp.float32),
        unroll=unroll,
    )


def viterbi_xla(profile: P7Profile, tokens, lengths, unroll: int = 1) -> jax.Array:
    """Full local Viterbi filter scores, f32 [B]."""
    return _run(_viterbi_jit, profile, tokens, lengths, unroll)


def forward_xla(profile: P7Profile, tokens, lengths, unroll: int = 1) -> jax.Array:
    """Forward filter scores (log-space), f32 [B]."""
    return _run(_forward_jit, profile, tokens, lengths, unroll)
