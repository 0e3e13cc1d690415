"""Long-sequence block sharding: a wavefront pipeline over the ``sp`` axis.

The MSV recurrence is strictly sequential along residues, but its
cross-block state is tiny — the M row plus the (J, C, N, B) specials at
the block boundary (SURVEY.md §5 "long-context"). So residue blocks of
one sequence are pipelined across chips: device p scans residue block
``[p*Lblk, (p+1)*Lblk)`` of sequence r during wavefront round ``t = p + r``
and hands the boundary carry to device p+1 over ICI via ``ppermute``.

With R sequences (rows) per shard-group and S sequence-shards, the
pipeline takes S + R - 1 rounds of one block-scan each — efficiency
R/(S+R-1), approaching 1 for deep batches, and enabling scans of
sequences far longer than one chip could time-step economically.

Composes with the ``db`` axis: tokens sharded P(db, sp) run an
independent wavefront per database shard.

Everything is SPMD inside one jitted ``shard_map`` — no host round-trips
(contrast: the reference crosses the host<->device boundary ~L*(3+log2 M)
times per sequence, SURVEY.md §3.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.msv import MSVProfile, length_transitions
from ..ops.recurrence import MSVCarry, MSVParams, block_scan, init_carry
from .mesh import DB_AXIS, SP_AXIS

NEG_INF = float(-np.inf)


def _wavefront(
    scores_real, tr_B_Mk, tr_E_C, tr_E_J, tokens, lengths, tr_loop, tr_move,
    unroll, group,
):
    """Per-device body under shard_map.

    ``tokens`` is the local block [R, Lblk] (rows = local database shard,
    columns = this device's residue block); lengths/tr_* are the local
    [R] rows; scores are replicated. Rows advance through the pipeline
    ``group`` at a time (the in-flight microbatch), so each round scans a
    [group, Lblk] block — wider groups amortize per-round overhead and
    fill VPU sublanes; rounds = S + R/group - 1.
    """
    sp_size = jax.lax.axis_size(SP_AXIS)
    p = jax.lax.axis_index(SP_AXIS)
    rows, block_len = tokens.shape
    num_states = scores_real.shape[1]
    num_groups = rows // group
    start_index = p * block_len  # global index of this block's first residue

    def group_params(g0):
        return MSVParams(
            scores_real=scores_real,
            tr_B_Mk=tr_B_Mk,
            tr_E_C=tr_E_C,
            tr_E_J=tr_E_J,
            lengths=jax.lax.dynamic_slice(lengths, (g0,), (group,)),
            tr_loop=jax.lax.dynamic_slice(tr_loop, (g0,), (group,)),
            tr_move=jax.lax.dynamic_slice(tr_move, (g0,), (group,)),
        )

    def round_body(t, state):
        carry_in, out = state
        g = t - p  # wavefront: device p scans row-group g at round p + g
        valid = (g >= 0) & (g < num_groups)
        g0 = jnp.clip(g, 0, num_groups - 1) * group
        params = group_params(g0)

        # device 0 starts fresh sequences each round; downstream devices
        # resume from the boundary carry received from device p-1
        fresh = init_carry(params, group, num_states)
        carry = jax.tree.map(
            lambda f, c: jnp.where(p == 0, f, c), fresh, carry_in
        )

        toks = jax.lax.dynamic_slice(tokens, (g0, 0), (group, block_len))
        new_carry = block_scan(params, carry, toks, start_index=start_index, unroll=unroll)
        # masked rounds must not corrupt the in-flight carry
        new_carry = jax.tree.map(
            lambda n, o: jnp.where(valid, n, o), new_carry, carry_in
        )

        # last pipeline stage emits the final scores for this group
        score = new_carry.c + params.tr_move
        emit = (p == sp_size - 1) & valid
        cur = jax.lax.dynamic_slice(out, (g0,), (group,))
        out = jax.lax.dynamic_update_slice(
            out, jnp.where(emit, score, cur), (g0,)
        )

        # boundary-carry exchange p -> p+1 over ICI
        carry_out = jax.tree.map(
            lambda x: jax.lax.ppermute(
                x, SP_AXIS, [(i, (i + 1) % sp_size) for i in range(sp_size)]
            ),
            new_carry,
        )
        return carry_out, out

    carry0 = MSVCarry(
        m=jnp.zeros((group, num_states), dtype=jnp.float32),
        j=jnp.zeros((group,), dtype=jnp.float32),
        c=jnp.zeros((group,), dtype=jnp.float32),
        n=jnp.zeros((group,), dtype=jnp.float32),
        b=jnp.zeros((group,), dtype=jnp.float32),
    )
    out0 = jnp.zeros((rows,), dtype=jnp.float32)
    num_rounds = sp_size + num_groups - 1
    _, out = jax.lax.fori_loop(0, num_rounds, round_body, (carry0, out0))
    # only the last stage wrote scores; replicate over sp
    return jax.lax.psum(out, SP_AXIS)


@functools.lru_cache(maxsize=32)
def make_seqblock_scanner(mesh: Mesh, unroll: int = 4, group: int = 8):
    """Build the jitted sharded scan fn for a (db, sp) mesh (cached)."""
    fn = functools.partial(_wavefront, unroll=unroll, group=group)
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(),  # scores_real (replicated)
            P(), P(), P(),  # tr_B_Mk, tr_E_C, tr_E_J
            P(DB_AXIS, SP_AXIS),  # tokens: rows over db, residue blocks over sp
            P(DB_AXIS), P(DB_AXIS), P(DB_AXIS),  # lengths, tr_loop, tr_move
        ),
        out_specs=P(DB_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


def _wavefront_pallas(
    scores_t, tr_consts, tokens_t, lengths, tr_rows, l_chunk, interpret,
):
    """Per-device body: the Pallas MSV kernel as the block scanner.

    Layout is the staged pipeline layout — tokens [Lblk, B_local] int8
    (residue block on this device, 128-lane row-groups), DP carry
    [M_pad, 128] + specials [4, 128] hopping p -> p+1 over ICI. This is
    the production sp-axis path: the lax.scan wavefront (above) stays as
    the CPU-portable reference, while each block here runs at the
    kernel's full single-chip rate.
    """
    from ..ops.pallas_msv import LANES, msv_pallas_call

    sp_size = jax.lax.axis_size(SP_AXIS)
    p = jax.lax.axis_index(SP_AXIS)
    block_len, b_local = tokens_t.shape
    m_pad = scores_t.shape[1]
    num_groups = b_local // LANES
    neg = jnp.float32(NEG_INF)

    # the kernel masks with block-LOCAL step indices; shift lengths so
    # local_t < lengths - p*Lblk  <=>  global residue index < length
    local_lengths = jnp.clip(lengths - p * block_len, 0, block_len).astype(jnp.int32)

    def fresh_state(tr_move_g):
        m = jnp.full((m_pad, LANES), neg, dtype=jnp.float32)
        s = jnp.stack(
            [
                jnp.full((LANES,), neg, dtype=jnp.float32),  # J
                jnp.full((LANES,), neg, dtype=jnp.float32),  # C
                jnp.zeros((LANES,), dtype=jnp.float32),  # N
                tr_move_g,  # B = tr_move
            ]
        )
        return m, s

    def round_body(t, state):
        carry_m, carry_s, out = state
        g = t - p
        valid = (g >= 0) & (g < num_groups)
        g0 = jnp.clip(g, 0, num_groups - 1) * LANES

        toks = jax.lax.dynamic_slice(tokens_t, (0, g0), (block_len, LANES))
        lens_g = jax.lax.dynamic_slice(local_lengths, (g0,), (LANES,))
        tr_rows_g = jax.lax.dynamic_slice(tr_rows, (0, g0), (2, LANES))

        fresh_m, fresh_s = fresh_state(tr_rows_g[1])
        m_in = jnp.where(p == 0, fresh_m, carry_m)
        s_in = jnp.where(p == 0, fresh_s, carry_s)

        score, m_out, s_out = msv_pallas_call(
            scores_t,
            toks.astype(jnp.int32),
            lens_g,
            tr_rows_g,
            tr_consts,
            m_in,
            s_in,
            l_chunk=min(l_chunk, block_len),
            interpret=interpret,
        )
        # masked rounds must not corrupt the in-flight carry
        m_out = jnp.where(valid, m_out, carry_m)
        s_out = jnp.where(valid, s_out, carry_s)

        emit = (p == sp_size - 1) & valid
        cur = jax.lax.dynamic_slice(out, (g0,), (LANES,))
        out = jax.lax.dynamic_update_slice(
            out, jnp.where(emit, score[0], cur), (g0,)
        )

        perm = [(i, (i + 1) % sp_size) for i in range(sp_size)]
        carry_m = jax.lax.ppermute(m_out, SP_AXIS, perm)
        carry_s = jax.lax.ppermute(s_out, SP_AXIS, perm)
        return carry_m, carry_s, out

    m0 = jnp.full((m_pad, LANES), neg, dtype=jnp.float32)
    s0 = jnp.zeros((4, LANES), dtype=jnp.float32)
    out0 = jnp.zeros((b_local,), dtype=jnp.float32)
    num_rounds = sp_size + num_groups - 1
    _, _, out = jax.lax.fori_loop(0, num_rounds, round_body, (m0, s0, out0))
    return jax.lax.psum(out, SP_AXIS)


@functools.lru_cache(maxsize=32)
def make_seqblock_scanner_pallas(
    mesh: Mesh, l_chunk: int = 256, interpret: bool = False
):
    """Jitted (db, sp)-sharded scan with the Pallas kernel per block.

    fn(scores_t [1, M_pad, 20], tr_consts [1, 3],
       tokens_i8_t [L_pad, B_pad], lengths [B_pad], tr_rows [2, B_pad])
    -> scores [B_pad]; L_pad divides sp * l_chunk, B_pad divides db * 128.
    Cached per (mesh, l_chunk, interpret) so repeated scans reuse the
    jitted executable instead of recompiling the wavefront.
    """
    fn = functools.partial(
        _wavefront_pallas, l_chunk=l_chunk, interpret=interpret
    )
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(),  # scores_t (replicated)
            P(),  # tr_consts
            P(SP_AXIS, DB_AXIS),  # tokens: residue blocks x batch shards
            P(DB_AXIS),  # lengths
            P(None, DB_AXIS),  # tr_rows
        ),
        out_specs=P(DB_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


def msv_scan_seqblocks_pallas(
    profile: MSVProfile,
    tokens: np.ndarray,
    lengths: np.ndarray,
    mesh: Mesh,
    l_chunk: int = 256,
    interpret: bool = False,
) -> np.ndarray:
    """Pallas-kernel wavefront scan (see make_seqblock_scanner_pallas)."""
    from ..ops.pallas_msv import LANES, prepare_scores_t

    num_db = mesh.shape[DB_AXIS]
    num_sp = mesh.shape[SP_AXIS]
    tokens = np.asarray(tokens, dtype=np.int32)
    lengths = np.asarray(lengths, dtype=np.int32)
    b, seq_len = tokens.shape

    lane_block = num_db * LANES
    pad_b = -(-b // lane_block) * lane_block
    l_chunk = min(l_chunk, -(-seq_len // (num_sp * 32)) * 32)
    block = num_sp * l_chunk
    pad_l = -(-seq_len // block) * block
    from ..ops.pallas_msv import PAD_TOKEN, blank_ragged_tail

    tokens_t = np.full((pad_l, pad_b), PAD_TOKEN, dtype=np.int8)
    tokens_t[:seq_len, :b] = tokens.T
    lengths_p = np.zeros(pad_b, dtype=np.int32)
    lengths_p[:b] = lengths
    blank_ragged_tail(tokens_t, lengths_p)
    tr_loop, tr_move = length_transitions(lengths_p)
    tr_rows = np.stack([tr_loop, tr_move]).astype(np.float32)

    scores_t = prepare_scores_t(profile)[None]
    tr_consts = np.array(
        [[profile.tr_B_Mk, profile.tr_E_C, profile.tr_E_J]], dtype=np.float32
    )
    scanner = make_seqblock_scanner_pallas(mesh, l_chunk=l_chunk, interpret=interpret)
    out = scanner(
        jnp.asarray(scores_t),
        jnp.asarray(tr_consts),
        jnp.asarray(tokens_t),
        jnp.asarray(lengths_p),
        jnp.asarray(tr_rows),
    )
    return np.asarray(out)[:b]


def msv_scan_seqblocks(
    profile: MSVProfile,
    tokens: np.ndarray,
    lengths: np.ndarray,
    mesh: Mesh,
    unroll: int = 4,
    group: int = 8,
) -> np.ndarray:
    """Scan with residue blocks sharded over ``sp`` (and rows over ``db``).

    Tokens are padded so rows divide db * group and columns divide the
    sp axis; pad steps/rows are masked by the true lengths.
    """
    num_db = mesh.shape[DB_AXIS]
    num_sp = mesh.shape[SP_AXIS]
    tokens = np.asarray(tokens, dtype=np.int32)
    lengths = np.asarray(lengths, dtype=np.int32)
    b, seq_len = tokens.shape

    group = min(group, max(1, -(-b // num_db)))
    pad_b = -(-b // (num_db * group)) * num_db * group
    pad_l = -(-seq_len // num_sp) * num_sp
    padded = np.zeros((pad_b, pad_l), dtype=np.int32)
    padded[:b, :seq_len] = tokens
    lengths_p = np.zeros(pad_b, dtype=np.int32)
    lengths_p[:b] = lengths
    tr_loop, tr_move = length_transitions(lengths_p)

    scanner = make_seqblock_scanner(mesh, unroll=unroll, group=group)
    out = scanner(
        jnp.asarray(profile.scores_real),
        jnp.float32(profile.tr_B_Mk),
        jnp.float32(profile.tr_E_C),
        jnp.float32(profile.tr_E_J),
        jnp.asarray(padded),
        jnp.asarray(lengths_p),
        jnp.asarray(tr_loop),
        jnp.asarray(tr_move),
    )
    return np.asarray(out)[:b]


# ---- p7 stages over the sp axis (round 2) -----------------------------

def _wavefront_pallas_p7(
    msc, isc, trans, chain, tr_consts, tokens_t, lengths, tr_rows,
    tr_probs, l_chunk, interpret, forward, e_skip_d, lazy_k=0,
):
    """Per-device wavefront body with the Viterbi / prob-space Forward
    Pallas kernel as the block scanner — the full-cascade extension of
    :func:`_wavefront_pallas`. Carry per hop: M/I/D rows [M_pad, 128] +
    specials ([4] Viterbi; [8] Forward, incl. the log-scale and Kahan
    rows, which make the per-block rescaling exactly resumable)."""
    from ..ops.pallas_msv import LANES
    from ..ops.pallas_p7 import fwd_prob_pallas_call, p7_pallas_call

    sp_size = jax.lax.axis_size(SP_AXIS)
    p = jax.lax.axis_index(SP_AXIS)
    block_len, b_local = tokens_t.shape
    m_pad = msc.shape[0]
    num_groups = b_local // LANES
    neg = jnp.float32(NEG_INF)
    s_rows = 8 if forward else 4

    local_lengths = jnp.clip(lengths - p * block_len, 0, block_len).astype(
        jnp.int32
    )

    def fresh_state(tr_rows_g, tr_probs_g):
        if forward:
            core = jnp.zeros((m_pad, LANES), dtype=jnp.float32)
            s = jnp.zeros((8, LANES), dtype=jnp.float32)
            s = s.at[2].set(1.0)  # N = 1
            s = s.at[3].set(tr_probs_g[1])  # B = move prob
            return core, s
        core = jnp.full((m_pad, LANES), neg, dtype=jnp.float32)
        s = jnp.stack(
            [
                jnp.full((LANES,), neg, dtype=jnp.float32),  # J
                jnp.full((LANES,), neg, dtype=jnp.float32),  # C
                jnp.zeros((LANES,), dtype=jnp.float32),  # N
                tr_rows_g[1],  # B = tr_move
            ]
        )
        return core, s

    def round_body(t, state):
        m_c, i_c, d_c, s_c, out = state
        g = t - p
        valid = (g >= 0) & (g < num_groups)
        g0 = jnp.clip(g, 0, num_groups - 1) * LANES

        toks = jax.lax.dynamic_slice(tokens_t, (0, g0), (block_len, LANES))
        lens_g = jax.lax.dynamic_slice(local_lengths, (g0,), (LANES,))
        trr_g = jax.lax.dynamic_slice(tr_rows, (0, g0), (2, LANES))
        trp_g = jax.lax.dynamic_slice(tr_probs, (0, g0), (2, LANES))

        fresh_core, fresh_s = fresh_state(trr_g, trp_g)
        m_in = jnp.where(p == 0, fresh_core, m_c)
        i_in = jnp.where(p == 0, fresh_core, i_c)
        d_in = jnp.where(p == 0, fresh_core, d_c)
        s_in = jnp.where(p == 0, fresh_s, s_c)

        lc = min(l_chunk, block_len)
        if forward:
            score, m_o, i_o, d_o, s_o = fwd_prob_pallas_call(
                msc, isc, trans, chain, toks.astype(jnp.int32), lens_g,
                trr_g, trp_g, tr_consts, m_in, i_in, d_in, s_in,
                l_chunk=lc, interpret=interpret,
            )
        else:
            score, m_o, i_o, d_o, s_o = p7_pallas_call(
                msc, isc, trans, chain, toks.astype(jnp.int32), lens_g,
                trr_g, tr_consts, m_in, i_in, d_in, s_in,
                l_chunk=lc, interpret=interpret, forward=False,
                e_skip_d=e_skip_d, lazy_k=lazy_k,
            )
        m_o = jnp.where(valid, m_o, m_c)
        i_o = jnp.where(valid, i_o, i_c)
        d_o = jnp.where(valid, d_o, d_c)
        s_o = jnp.where(valid, s_o, s_c)

        emit = (p == sp_size - 1) & valid
        cur = jax.lax.dynamic_slice(out, (g0,), (LANES,))
        out = jax.lax.dynamic_update_slice(
            out, jnp.where(emit, score, cur), (g0,)
        )

        perm = [(i, (i + 1) % sp_size) for i in range(sp_size)]
        m_c, i_c, d_c, s_c = (
            jax.lax.ppermute(x, SP_AXIS, perm) for x in (m_o, i_o, d_o, s_o)
        )
        return m_c, i_c, d_c, s_c, out

    from ..ops.pallas_msv import LANES as _L

    core0 = (
        jnp.zeros((m_pad, _L), dtype=jnp.float32)
        if forward
        else jnp.full((m_pad, _L), neg, dtype=jnp.float32)
    )
    s0 = jnp.zeros((s_rows, _L), dtype=jnp.float32)
    out0 = jnp.zeros((b_local,), dtype=jnp.float32)
    num_rounds = sp_size + num_groups - 1
    *_, out = jax.lax.fori_loop(
        0, num_rounds, round_body, (core0, core0, core0, s0, out0)
    )
    return jax.lax.psum(out, SP_AXIS)


@functools.lru_cache(maxsize=32)
def make_seqblock_scanner_p7(
    mesh: Mesh,
    forward: bool = False,
    l_chunk: int = 256,
    interpret: bool = False,
    e_skip_d: bool = False,
    lazy_k: int = 0,
):
    """Jitted (db, sp)-sharded Viterbi / Forward stage scan: residue
    blocks of each sequence pipeline across the sp axis with the p7
    Pallas kernels as block scanners (the sp analogue of
    make_db_p7_scanner)."""
    fn = functools.partial(
        _wavefront_pallas_p7,
        l_chunk=l_chunk,
        interpret=interpret,
        forward=forward,
        e_skip_d=e_skip_d,
        lazy_k=lazy_k,
    )
    mapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(),  # profile arrays + tr_consts
            P(SP_AXIS, DB_AXIS),  # tokens: residue blocks x batch shards
            P(DB_AXIS),  # lengths
            P(None, DB_AXIS),  # tr_rows
            P(None, DB_AXIS),  # tr_probs
        ),
        out_specs=P(DB_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


def p7_scan_seqblocks_pallas(
    p7,
    tokens: np.ndarray,
    lengths: np.ndarray,
    mesh: Mesh,
    stage: str = "viterbi",
    l_chunk: int = 256,
    interpret: bool = False,
) -> np.ndarray:
    """Viterbi/Forward scores with residue blocks sharded over sp —
    long-sequence support for the FULL cascade, not just MSV."""
    from ..ops import pallas_p7
    from ..ops.pallas_msv import LANES, PAD_TOKEN, blank_ragged_tail

    assert stage in ("viterbi", "forward")
    forward = stage == "forward"
    num_db = mesh.shape[DB_AXIS]
    num_sp = mesh.shape[SP_AXIS]
    tokens = np.asarray(tokens, dtype=np.int32)
    lengths = np.asarray(lengths, dtype=np.int32)
    b, seq_len = tokens.shape

    lane_block = num_db * LANES
    pad_b = -(-b // lane_block) * lane_block
    l_chunk = min(l_chunk, -(-seq_len // (num_sp * 32)) * 32)
    block = num_sp * l_chunk
    pad_l = -(-seq_len // block) * block

    tokens_t = np.full((pad_l, pad_b), PAD_TOKEN, dtype=np.int8)
    tokens_t[:seq_len, :b] = tokens.T
    lengths_p = np.zeros(pad_b, dtype=np.int32)
    lengths_p[:b] = lengths
    blank_ragged_tail(tokens_t, lengths_p)
    tr_loop, tr_move = length_transitions(lengths_p)
    tr_rows = np.stack([tr_loop, tr_move]).astype(np.float32)
    tr_probs = pallas_p7.length_transition_probs(lengths_p)

    lazy_k = 0
    if forward:
        packed = pallas_p7.prepare_p7_device_prob(p7)
        e_skip = False
    else:
        e_skip = pallas_p7.e_skip_d_ok(p7)
        if e_skip:
            *packed, lazy_k = pallas_p7.prepare_p7_device_lazy(p7)
        else:
            packed = pallas_p7.prepare_p7_device(p7)
    scanner = make_seqblock_scanner_p7(
        mesh, forward=forward, l_chunk=l_chunk, interpret=interpret,
        e_skip_d=e_skip, lazy_k=lazy_k,
    )
    out = scanner(
        *(jnp.asarray(x) for x in packed),
        jnp.asarray(tokens_t),
        jnp.asarray(lengths_p),
        jnp.asarray(tr_rows),
        jnp.asarray(tr_probs),
    )
    return np.asarray(out)[:b]


# ---- end-to-end sp search (round 3) -----------------------------------

import dataclasses as _dataclasses


@_dataclasses.dataclass
class _HostStaged:
    """Host-side stand-in for StagedDatabase: the wavefront scanners pad
    and shard per call (each stage re-pads to its survivor subset's max
    length), so 'staging' just pins the encoded arrays."""

    tokens: np.ndarray
    lengths: np.ndarray
    num_sequences: int


class SeqblockScanner:
    """MSVScanner-compatible adapter that routes EVERY stage through the
    sp-axis wavefront pipelines — the end-to-end long-sequence engine
    (``--mesh db=N,sp=M`` with sp > 1). Drop-in for
    pipeline.SearchPipeline: MSV -> Viterbi -> Forward all scan residue
    blocks across the sp axis with ppermute boundary-carry hops; the
    survivor orchestration (thresholds, restaging subsets) is unchanged.

    The bf16 prefilter kernels have no wavefront variant, so
    ``scan_filter``/``scan_p7_filter`` run the exact wavefronts — a
    trivially sound upper bound (score >= itself); prefer fast=False
    with this scanner (the prefilter pass would just duplicate work).
    """

    backend = "pallas"
    mesh = None  # no db-mesh scanner branches; sharding lives in sp_mesh

    def __init__(self, sp_mesh: Mesh, l_chunk: int = 256, interpret: bool | None = None):
        self.sp_mesh = sp_mesh
        self.l_chunk = l_chunk
        self.interpret = (
            jax.default_backend() == "cpu" if interpret is None else interpret
        )

    def stage(self, tokens: np.ndarray, lengths: np.ndarray) -> _HostStaged:
        tokens = np.asarray(tokens)
        return _HostStaged(
            tokens, np.asarray(lengths, np.int32), tokens.shape[0]
        )

    def stage_fasta(self, db) -> _HostStaged:
        return self.stage(*db.encode())

    def scan(self, profile: MSVProfile, staged: _HostStaged):
        return msv_scan_seqblocks_pallas(
            profile, staged.tokens, staged.lengths, self.sp_mesh,
            l_chunk=self.l_chunk, interpret=self.interpret,
        )

    def scan_filter(self, profile: MSVProfile, staged: _HostStaged):
        return self.scan(profile, staged)

    def scan_p7(self, p7, staged: _HostStaged, stage: str = "viterbi"):
        return p7_scan_seqblocks_pallas(
            p7, staged.tokens, staged.lengths, self.sp_mesh, stage=stage,
            l_chunk=self.l_chunk, interpret=self.interpret,
        )

    def scan_p7_filter(self, p7, staged: _HostStaged, window_log2=None):
        return self.scan_p7(p7, staged, stage="viterbi")

    def scan_many(self, profiles, staged: _HostStaged, mode: str = "exact"):
        return {
            p.name: np.asarray(self.scan(p, staged)) for p in profiles
        }
