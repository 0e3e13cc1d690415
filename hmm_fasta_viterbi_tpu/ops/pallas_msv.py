"""Pallas TPU kernel for the MSV max-plus DP scan.

This single kernel replaces the reference's six OpenCL kernels and its
host-driven launch loop (algorithms/MSV_kernels.cl, MSV_HMM.cpp:269-430):
the whole residue recurrence runs on-chip, with the DP carry resident in
VMEM — zero host<->device round-trips per residue versus the reference's
~L*(3+log2 M) kernel launches (SURVEY.md §3.2).

Layout (TPU-first, not a translation):
* batch on LANES   — 128/256 sequences per tile (pick_lanes; wider tiles
  buy ILP on the serial step chain), full VPU width on the special-state
  updates and the B->Mk broadcast;
* M states on SUBLANES — [M_pad, 128] f32 DP tile; the j-1 shift is a
  sublane rotate; the E reduction is a cross-sublane max;
* grid (P, B_tiles, L_chunks): the residue loop is a ``fori_loop``
  (unrolled 8 steps so Mosaic overlaps the E-reduce/MXU/VPU chains of
  adjacent steps) over an L-chunk grid dimension, the carry held in the
  output buffers (block index independent of the chunk index, so Mosaic
  keeps it in VMEM across chunks); the leading P dimension scans a STACK
  of same-shape profiles against the staged database in one call — the
  reference sweep workload (benchmark_MSV.cpp) with the host round-trip
  amortized over all profiles of an M-bucket.

Emission selection — the reference's per-residue buffer rebind
(MSV_HMM.cpp:383-387) — becomes a one-hot MXU matmul:
``scoresT [M_pad, 20] @ onehot [20, 128]``. The score matrix is split
ONCE per kernel invocation into three bf16 terms (hi + mid + lo) whose
f32-accumulated products reconstruct every f32 score EXACTLY (24-bit
mantissa across 3x(8-bit+implicit) pieces; the one-hot side is
bf16-exact), so selection is bit-identical to a host gather — measured
maxerr 0.0 against the NumPy oracle. Three explicit bf16 passes beat
``Precision.HIGHEST`` (which must split BOTH f32 operands -> 6 passes)
by ~1.6x end to end; the selection runs at the MXU's K=20 gather
speed-of-light. The "generic vs specialized" axis of the reference
(MSV_spec_kernels.cl) collapses into jit: shapes and the L-chunk layout
are compile-time constants, while per-profile transition scalars stay
runtime SMEM values so one compiled kernel serves every profile stack
of a given padded shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.msv import MSVProfile, length_transitions

NEG_INF = float(-np.inf)
# finite stand-in for -inf in rows that feed the MXU (padded score rows);
# far below any reachable DP value (|scores| < 40, L <= ~1e6) yet safe
# from f32 overflow when accumulated
PAD_SCORE = -1.0e30

LANES = 128  # minimum batch tile / padding granularity
# padding token: OUTSIDE the 20-letter alphabet so padded steps select a
# zero one-hot column (emission identity). A real-residue pad (0 = 'A')
# lets a finished lane's unmasked prob-space M row compound that
# residue's odds once per pad step — f32 overflow -> inf log_scale
# (found by TPU fuzz). 127 fits int8 and is clamp-safe for XLA gathers.
PAD_TOKEN = 127


def blank_ragged_tail(tokens_t: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """In-place: overwrite each lane's positions >= lengths[lane] with PAD_TOKEN.

    Staging fills only the [seq_len:, :] and [:, b:] pad regions; a RAGGED
    batch (per-lane length < batch max) otherwise keeps whatever the caller
    padded rows with (FastaDatabase.encode pads with 0 = 'A'). Real-residue
    tail tokens are live in the prob-space Forward kernel: finished lanes'
    unmasked M/I carries compound that residue's odds each pad step, the
    per-group rescale divides the frozen C state until it underflows, and
    the score comes back -inf (silent false negative). Every host staging
    path must route through this helper.
    """
    l_pad = tokens_t.shape[0]
    lengths = np.asarray(lengths, dtype=np.int32)
    tokens_t[np.arange(l_pad, dtype=np.int32)[:, None] >= lengths[None, :]] = (
        PAD_TOKEN
    )
    return tokens_t


def pick_lanes(b_pad: int, m_pad: int, widest: int, m_cap: int) -> int:
    """Widest lane tile that divides the padded batch, subject to a VMEM
    cap on M (wider tiles multiply the [M_pad, lanes] carries): wider
    tiles buy ILP on the serial DP step chain."""
    lanes = widest
    while lanes > LANES and (b_pad % lanes != 0 or m_pad > m_cap):
        lanes //= 2
    return max(lanes, LANES)
DEFAULT_L_CHUNK = 256
STEP_UNROLL = 32  # fori_loop body unroll (tools/kernel_lab.py sweep)


def _msv_kernel(
    scores_ref,  # [1, M_pad, 20] f32 VMEM (this profile; pad rows PAD_SCORE)
    tokens_ref,  # [L_CHUNK, LANES] int32 VMEM (residues for this chunk)
    lengths_ref,  # [1, LANES] int32 VMEM
    tr_row_ref,  # [2, LANES] f32 VMEM: row 0 = tr_loop, row 1 = tr_move
    tr_const_ref,  # [P, 3] f32 SMEM (full): tr_B_Mk, tr_E_C, tr_E_J rows
    m_in_ref,  # [M_pad, LANES] f32 VMEM: initial M carry
    s_in_ref,  # [4, LANES] f32 VMEM: initial J, C, N, B carry
    # outputs:
    score_ref,  # [1, 1, LANES] f32: running C + tr_move (per profile)
    m_out_ref,  # [M_pad, LANES] f32: M carry (persists across chunks;
    #             holds the LAST profile's carry when P > 1)
    s_out_ref,  # [4, LANES] f32: specials carry
    *,
    unroll: int,
    exact: bool = True,
    skip_row0_guard: bool = False,
    emit_k60: bool = True,
):
    p_idx = pl.program_id(0)
    l_idx = pl.program_id(2)
    chunk_len, lanes = tokens_ref.shape
    m_pad = scores_ref.shape[1]
    scores = scores_ref[0, :, :]

    if exact:
        # exact 3-term bf16 split of the f32 score matrix, hoisted out of
        # the residue loop: emit = (hi + mid + lo) @ onehot reconstructs
        # f32 exactly (24-bit mantissa across 3 disjoint 8-bit bf16
        # pieces; any f32 accumulation order of the three selected terms
        # is exact because every partial sum is representable)
        s_hi = scores.astype(jnp.bfloat16)
        _r1 = scores - s_hi.astype(jnp.float32)
        s_mid = _r1.astype(jnp.bfloat16)
        s_lo = (_r1 - s_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        if emit_k60:
            # round 5: fold the 3 passes into ONE matmul by stacking the
            # split terms along the CONTRACTION axis — [M_pad, 60] @
            # [60, lanes] with the one-hot tiled 3x. Bitwise-identical
            # output (same three terms enter the same f32 accumulator);
            # ~3x fewer MXU passes per step, and the K=20 passes were
            # the measured majority of the exact step cost (the 1-pass
            # bf16 filter runs 2.6x the exact kernel's rate, r4 bench)
            s_cat = jnp.concatenate([s_hi, s_mid, s_lo], axis=1)
    else:
        # filter mode: scores_ref is ALREADY bf16, rounded UP on the host
        # (prepare_scores_t_filter) — one MXU pass, upper-bound scores
        s_hi = scores

    tr_b_mk = tr_const_ref[p_idx, 0]
    tr_e_c = tr_const_ref[p_idx, 1]
    tr_e_j = tr_const_ref[p_idx, 2]
    tr_loop = tr_row_ref[0:1, :]  # [1, LANES]
    tr_move = tr_row_ref[1:2, :]
    lengths = lengths_ref[0:1, :]

    # first chunk (re)loads the caller's carry — also the reset point
    # when the profile grid index advances; later chunks resume from the
    # out buffers (same block across the l grid dim -> stays in VMEM)
    @pl.when(l_idx == 0)
    def _():
        m_out_ref[:, :] = m_in_ref[:, :]
        s_out_ref[:, :] = s_in_ref[:, :]

    m0 = m_out_ref[:, :]
    s0 = s_out_ref[:, :]

    aa_iota = jax.lax.broadcasted_iota(jnp.int32, (20, lanes), 0)
    if exact and emit_k60:
        aa_iota60 = jax.lax.broadcasted_iota(jnp.int32, (60, lanes), 0)
    row0_mask = jax.lax.broadcasted_iota(jnp.int32, (m_pad, lanes), 0) == 0
    base = l_idx * chunk_len

    def one_step(t, m, j_st, c_st, n_st, b_st):
        tok = tokens_ref[pl.ds(t, 1), :]  # [1, LANES] int32
        # selection on the MXU (see module docstring)
        dn = (((1,), (0,)), ((), ()))
        if exact and emit_k60:
            # one-hot tiled 3x along K: row r selects token r % 20
            onehot = (
                (aa_iota60 == tok)
                | (aa_iota60 == tok + 20)
                | (aa_iota60 == tok + 40)
            ).astype(jnp.bfloat16)  # [60, LANES], exact
            emit = jax.lax.dot_general(
                s_cat, onehot, dn, preferred_element_type=jnp.float32
            )  # [M_pad, LANES] — f32-exact, see s_cat comment
        else:
            onehot = (aa_iota == tok).astype(jnp.bfloat16)  # [20, LANES]
            emit = jax.lax.dot_general(
                s_hi, onehot, dn, preferred_element_type=jnp.float32
            )
            if exact:
                emit += jax.lax.dot_general(
                    s_mid, onehot, dn, preferred_element_type=jnp.float32
                )
                emit += jax.lax.dot_general(
                    s_lo, onehot, dn, preferred_element_type=jnp.float32
                )  # [M_pad, LANES]

        # j-1 shift as a sublane rotate; the wrapped row 0 is replaced by
        # the dummy-M0 -inf (dp[:, 0] never updates — MSV_HMM.cpp:86,100).
        # Filter mode skips the guard when the caller guarantees pad rows
        # exist (m_pad > mr): the wrapped-in pad row sits at ~-1e30 and
        # loses every max exactly like -inf.
        shifted = pltpu.roll(m, shift=1, axis=0)
        if not skip_row0_guard:
            shifted = jnp.where(row0_mask, jnp.float32(NEG_INF), shifted)
        new_m = emit + jnp.maximum(shifted, b_st + tr_b_mk)
        e_st = jnp.max(new_m, axis=0, keepdims=True)  # [1, LANES]
        new_j = jnp.maximum(j_st + tr_loop, e_st + tr_e_j)
        new_c = jnp.maximum(c_st + tr_loop, e_st + tr_e_c)
        new_n = n_st + tr_loop
        new_b = jnp.maximum(new_n + tr_move, new_j + tr_move)

        valid = (base + t) < lengths  # [1, LANES] bool
        # filter mode skips the M-carry mask: a finished lane's M rows
        # keep evolving but feed only the masked specials, and filter
        # scans never chain their M carry across calls
        return (
            jnp.where(valid, new_m, m) if exact else new_m,
            jnp.where(valid, new_j, j_st),
            jnp.where(valid, new_c, c_st),
            jnp.where(valid, new_n, n_st),
            jnp.where(valid, new_b, b_st),
        )

    def step(u, carry):
        m, j_st, c_st, n_st, b_st = carry
        for k in range(unroll):  # static unroll: overlaps adjacent steps
            m, j_st, c_st, n_st, b_st = one_step(
                u * unroll + k, m, j_st, c_st, n_st, b_st
            )
        return (m, j_st, c_st, n_st, b_st)

    m, j_st, c_st, n_st, b_st = jax.lax.fori_loop(
        0, chunk_len // unroll, step,
        (m0, s0[0:1, :], s0[1:2, :], s0[2:3, :], s0[3:4, :]),
    )

    m_out_ref[:, :] = m
    s_out_ref[:, :] = jnp.concatenate([j_st, c_st, n_st, b_st], axis=0)
    score_ref[0, :, :] = c_st + tr_move  # final C->T move (MSV_HMM.cpp:112)


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_chunk", "interpret", "unroll", "exact", "skip_row0_guard",
        "widest", "emit_k60",
    ),
)
def msv_pallas_call(
    scores_t: jax.Array,  # [P, M_pad, 20] f32 (rows >= Mr set to PAD_SCORE)
    tokens_t: jax.Array,  # [L_pad, B_pad] int32
    lengths: jax.Array,  # [B_pad] int32
    tr_rows: jax.Array,  # [2, B_pad] f32 (tr_loop; tr_move)
    tr_consts: jax.Array,  # [P, 3] f32 (tr_B_Mk, tr_E_C, tr_E_J per profile)
    m_init: jax.Array,  # [M_pad, B_pad] f32
    s_init: jax.Array,  # [4, B_pad] f32 (J, C, N, B rows)
    l_chunk: int = DEFAULT_L_CHUNK,
    interpret: bool = False,
    unroll: int = STEP_UNROLL,
    exact: bool = True,
    skip_row0_guard: bool = False,
    widest: int = 512,
    emit_k60: bool = True,
):
    """Raw kernel invocation over padded operands.

    Returns (scores [P, B_pad], m_carry [M_pad, B_pad], s_carry
    [4, B_pad]); the carries belong to the LAST profile of the stack and
    enable block chaining (parallel.seqblocks boundary exchange) in the
    P == 1 case.
    """
    num_p, m_pad, twenty = scores_t.shape
    l_pad, b_pad = tokens_t.shape
    assert twenty == 20 and b_pad % LANES == 0 and l_pad % l_chunk == 0
    assert m_pad % 8 == 0
    # 512-lane tiles win once the K=60 emission fold halves per-step MXU
    # traffic: 520.9 vs 403.1 GCUPS at M=1400 exact, 511.2 vs 352.2 at
    # M=2405 filter (r5 ab_lab on chip); the r4 "512 regresses exact"
    # verdict predates the fold — see docs/PERFORMANCE.md round 5
    lanes = pick_lanes(
        b_pad, m_pad, widest=widest, m_cap=2048 if widest <= 256 else 4096
    )
    # unrolling keeps several [M_pad, 128] panels live; scale it down for
    # large models to bound VMEM (unroll 32 measured through m_pad 2432,
    # the data's maximum; beyond that is extrapolated conservatively)
    if m_pad > 4096:
        unroll = min(unroll, 4)
        if l_pad % 256 == 0:
            l_chunk = min(l_chunk, 256)
    elif m_pad > 2432:
        unroll = min(unroll, 16)
    while l_chunk % unroll:
        unroll //= 2
    num_b = b_pad // lanes
    num_l = l_pad // l_chunk

    lengths2d = lengths.reshape(1, b_pad)

    grid = (num_p, num_b, num_l)
    score, m_out, s_out = pl.pallas_call(
        functools.partial(
            _msv_kernel, unroll=unroll, exact=exact,
            skip_row0_guard=skip_row0_guard, emit_k60=emit_k60,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m_pad, 20), lambda p, b, l: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((l_chunk, lanes), lambda p, b, l: (l, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, lanes), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # [P, 3] consts, full
            pl.BlockSpec((m_pad, lanes), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, lanes), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, lanes), lambda p, b, l: (p, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, lanes), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, lanes), lambda p, b, l: (0, b), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_p, 1, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, b_pad), jnp.float32),
            jax.ShapeDtypeStruct((4, b_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scores_t, tokens_t, lengths2d, tr_rows, tr_consts, m_init, s_init)
    return score[:, 0, :], m_out, s_out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_chunk", "interpret", "exact", "skip_row0_guard", "unroll",
        "widest", "emit_k60",
    ),
)
def _msv_pallas_padded(
    scores_t: jax.Array,  # [P, M_pad, 20] f32
    tokens_i8_t: jax.Array,  # [L_pad, B_pad] int8 (small upload; widened here)
    lengths: jax.Array,  # [B_pad] int32
    tr_rows: jax.Array,  # [2, B_pad] f32
    tr_consts: jax.Array,  # [P, 3] f32
    l_chunk: int,
    interpret: bool,
    exact: bool = True,
    skip_row0_guard: bool = False,
    unroll: int = STEP_UNROLL,
    widest: int = 512,
    emit_k60: bool = True,
) -> jax.Array:
    """Jitted wrapper building the DP init ON DEVICE (zero extra host
    transfer — the host->device tunnel latency dominates small scans).

    Returns scores [P, B_pad].
    """
    m_pad = scores_t.shape[1]
    b_pad = tokens_i8_t.shape[1]
    neg = jnp.float32(NEG_INF)
    m_init = jnp.full((m_pad, b_pad), neg, dtype=jnp.float32)
    s_init = jnp.stack(
        [
            jnp.full((b_pad,), neg, dtype=jnp.float32),  # J
            jnp.full((b_pad,), neg, dtype=jnp.float32),  # C
            jnp.zeros((b_pad,), dtype=jnp.float32),  # N
            tr_rows[1],  # B = tr_move (dp[0][B], MSV_HMM.cpp:97)
        ]
    )
    score, _, _ = msv_pallas_call(
        scores_t,
        tokens_i8_t.astype(jnp.int32),
        lengths,
        tr_rows,
        tr_consts,
        m_init,
        s_init,
        l_chunk=l_chunk,
        interpret=interpret,
        exact=exact,
        skip_row0_guard=skip_row0_guard,
        unroll=unroll,
        widest=widest,
        emit_k60=emit_k60,
    )
    return score


def prepare_scores_t(profile: MSVProfile, m_pad: int | None = None) -> np.ndarray:
    """[M_pad, 20] transposed real-state scores, padded rows = PAD_SCORE."""
    mr = profile.num_states
    m_pad = m_pad or _round_up(mr, 8)
    out = np.full((m_pad, 20), PAD_SCORE, dtype=np.float32)
    # clamp: a hypothetical -inf score (emission prob underflowing to 0)
    # must stay finite — the kernel's bf16 split of -inf would NaN, while
    # PAD_SCORE loses every max identically to -inf
    out[:mr, :] = np.maximum(profile.scores_real.T, PAD_SCORE)
    return out


def bf16_round_up(f32: np.ndarray):
    """Round an f32 array to bf16 toward +inf (every output >= input).

    The one-sided rounding that makes filter kernels sound: max-plus DP
    is monotone in every score, so feeding values rounded UP yields a
    guaranteed upper bound on the exact result."""
    f32 = np.asarray(f32, dtype=np.float32)
    hi = f32.astype(jnp.bfloat16)  # round-to-nearest
    hi_f32 = hi.astype(np.float32)
    below = hi_f32 < f32
    u = hi.view(np.uint16)
    # next bf16 toward +inf: raw+1 for positives, raw-1 for negatives
    # (+0 -> smallest positive subnormal is raw 1, also handled by +1)
    bumped = np.where(u & 0x8000, u - 1, u + 1).astype(np.uint16)
    return np.where(below, bumped, u).view(jnp.bfloat16)


def f32_round_up(x: np.ndarray) -> np.ndarray:
    """Bump finite f32 entries one ulp toward +inf (-inf stays -inf).

    Used on host-precomputed constants whose f64-exact value was rounded
    to nearest: one ulp of slack guarantees >= any f32 evaluation order
    the exact kernels / oracle may have used."""
    x = np.asarray(x, dtype=np.float32)
    out = np.nextafter(x, np.float32(np.inf), dtype=np.float32)
    return np.where(np.isfinite(x), out, x)


def prepare_scores_t_filter(profile: MSVProfile, m_pad: int | None = None) -> np.ndarray:
    """[M_pad, 20] BF16 score matrix rounded UP (toward +inf).

    Filter-mode contract: every emission score is >= its f32 value, and
    max-plus DP is monotone in the emissions, so the filter score is a
    guaranteed UPPER BOUND on the exact score — thresholding on it can
    produce no false negatives (the same one-sided-bias idea as HMMER's
    biased u8 MSV filter), only extra survivors for the exact rescore.
    """
    return bf16_round_up(prepare_scores_t(profile, m_pad))


def _prepare_batch(tokens, lengths, l_chunk):
    tokens = np.asarray(tokens)
    lengths_np = np.asarray(lengths, dtype=np.int32)
    b, seq_len = tokens.shape
    b_pad = _round_up(max(b, 1), LANES)
    l_chunk = min(l_chunk, _round_up(max(seq_len, 1), 32))
    l_pad = _round_up(max(seq_len, 1), l_chunk)
    # int8 transport: tokens are 0..19, so ship 1/4 the bytes through the
    # (high-latency) host->device path and widen on device
    tokens_t = np.full((l_pad, b_pad), PAD_TOKEN, dtype=np.int8)
    tokens_t[:seq_len, :b] = tokens.T
    lengths_p = np.zeros(b_pad, dtype=np.int32)
    lengths_p[:b] = lengths_np
    blank_ragged_tail(tokens_t, lengths_p)
    tr_loop, tr_move = length_transitions(lengths_p)
    tr_rows = np.stack([tr_loop, tr_move]).astype(np.float32)
    return tokens_t, lengths_p, tr_rows, b, l_chunk


def msv_pallas(
    profile: MSVProfile,
    tokens: np.ndarray | jax.Array,
    lengths: np.ndarray | jax.Array,
    l_chunk: int = DEFAULT_L_CHUNK,
    interpret: bool = False,
) -> jax.Array:
    """Score a padded batch with the Pallas kernel; returns f32 [B].

    Same contract as ops.xla_scan.msv_xla (drop-in, differential-tested).
    """
    tokens_t, lengths_p, tr_rows, b, l_chunk = _prepare_batch(tokens, lengths, l_chunk)
    scores_t = prepare_scores_t(profile)[None]
    tr_consts = np.array(
        [[profile.tr_B_Mk, profile.tr_E_C, profile.tr_E_J]], dtype=np.float32
    )
    score = _msv_pallas_padded(
        jnp.asarray(scores_t),
        jnp.asarray(tokens_t),
        jnp.asarray(lengths_p),
        jnp.asarray(tr_rows),
        jnp.asarray(tr_consts),
        l_chunk=l_chunk,
        interpret=interpret,
    )
    return score[0, :b]


def msv_pallas_stacked(
    profiles: list[MSVProfile],
    tokens: np.ndarray | jax.Array,
    lengths: np.ndarray | jax.Array,
    l_chunk: int = DEFAULT_L_CHUNK,
    interpret: bool = False,
) -> jax.Array:
    """Scan a STACK of profiles (padded to one shared M_pad) in one kernel
    call; returns f32 [P, B] — the sweep workload in one device round
    trip per M-bucket."""
    assert profiles, "empty profile stack"
    tokens_t, lengths_p, tr_rows, b, l_chunk = _prepare_batch(tokens, lengths, l_chunk)
    m_pad = _round_up(max(p.num_states for p in profiles), 8)
    scores_t = np.stack([prepare_scores_t(p, m_pad) for p in profiles])
    tr_consts = np.array(
        [[p.tr_B_Mk, p.tr_E_C, p.tr_E_J] for p in profiles], dtype=np.float32
    )
    score = _msv_pallas_padded(
        jnp.asarray(scores_t),
        jnp.asarray(tokens_t),
        jnp.asarray(lengths_p),
        jnp.asarray(tr_rows),
        jnp.asarray(tr_consts),
        l_chunk=l_chunk,
        interpret=interpret,
    )
    return score[:, :b]
