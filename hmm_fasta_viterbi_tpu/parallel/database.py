"""Database-sharded MSV scan: the primary pod-scale axis.

Sequences are independent, so the scan is pure data parallelism: shard
the token batch over the ``db`` mesh axis with ``NamedSharding`` and let
XLA run the identical scan program per shard; scores come back sharded
and are gathered (or top-k-reduced) at the end. This is capability the
reference lacks entirely — it scans one sequence at a time on one device
(benchmark_helper.hpp:19-39; SURVEY.md §5 "distributed communication").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..models.msv import MSVProfile, length_transitions
from ..ops.xla_scan import msv_scan
from .mesh import DB_AXIS


@functools.partial(jax.jit, static_argnames=("unroll",))
def _scan_jit(scores_real, tr_B_Mk, tr_E_C, tr_E_J, tokens, lengths, tr_loop, tr_move, unroll=4):
    return msv_scan(scores_real, tr_B_Mk, tr_E_C, tr_E_J, tokens, lengths, tr_loop, tr_move, unroll)


def pad_batch_to_mesh(tokens: np.ndarray, lengths: np.ndarray, num_shards: int):
    """Pad the batch so it divides the db axis; pad rows have length 0
    (scored -inf, dropped by the caller via the returned true size)."""
    b = tokens.shape[0]
    padded = -(-b // num_shards) * num_shards
    if padded != b:
        tokens = np.concatenate(
            [tokens, np.zeros((padded - b, tokens.shape[1]), dtype=tokens.dtype)]
        )
        lengths = np.concatenate([lengths, np.zeros(padded - b, dtype=lengths.dtype)])
    return tokens, lengths, b


def msv_scan_sharded(
    profile: MSVProfile,
    tokens: np.ndarray,
    lengths: np.ndarray,
    mesh: Mesh,
    unroll: int = 4,
) -> np.ndarray:
    """Scan a database sharded over the mesh's ``db`` axis.

    Returns float32 [B] scores (gathered to host, padding rows removed).
    """
    num_db = mesh.shape[DB_AXIS]
    tokens, lengths, true_b = pad_batch_to_mesh(
        np.asarray(tokens, dtype=np.int32), np.asarray(lengths, dtype=np.int32), num_db
    )
    tr_loop, tr_move = length_transitions(lengths)

    row_sharding = NamedSharding(mesh, PartitionSpec(DB_AXIS, None))
    vec_sharding = NamedSharding(mesh, PartitionSpec(DB_AXIS))
    rep = NamedSharding(mesh, PartitionSpec())

    args = (
        jax.device_put(jnp.asarray(profile.scores_real), rep),
        jax.device_put(jnp.float32(profile.tr_B_Mk), rep),
        jax.device_put(jnp.float32(profile.tr_E_C), rep),
        jax.device_put(jnp.float32(profile.tr_E_J), rep),
        jax.device_put(jnp.asarray(tokens), row_sharding),
        jax.device_put(jnp.asarray(lengths), vec_sharding),
        jax.device_put(jnp.asarray(tr_loop), vec_sharding),
        jax.device_put(jnp.asarray(tr_move), vec_sharding),
    )
    scores = _scan_jit(*args, unroll=unroll)
    return np.asarray(scores)[:true_b]


@functools.lru_cache(maxsize=32)
def make_db_scanner(
    mesh: Mesh,
    l_chunk: int = 512,
    interpret: bool = False,
    exact: bool = True,
    skip_row0_guard: bool = False,
    stacked: bool = False,
    widest: int = 512,
):
    """Pallas-kernel database scan sharded over ``db`` via shard_map.

    Each device runs the MSV Pallas kernel on its local batch shard —
    the pod-scale production path (XLA cannot auto-partition a
    pallas_call, so the partitioning is explicit). Inputs use the staged
    layout of pipeline.MSVScanner: tokens [L_pad, B_pad] int8 with B_pad
    divisible by db * 128.

    Returns a jitted fn(scores_t, tokens_i8_t, lengths, tr_rows,
    tr_consts) -> scores [B_pad] (or [G, B_pad] with ``stacked=True``,
    the multi-profile sweep kernel). ``exact=False`` runs the bf16
    upper-bound MSV prefilter kernel (scan_filter semantics).
    """
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_msv import _msv_pallas_padded

    def local_scan(scores_t, tokens_i8_t, lengths, tr_rows, tr_consts):
        out = _msv_pallas_padded(
            scores_t, tokens_i8_t, lengths, tr_rows, tr_consts,
            l_chunk=l_chunk, interpret=interpret,
            exact=exact, skip_row0_guard=skip_row0_guard, widest=widest,
        )
        return out if stacked else out[0]

    mapped = jax.shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(P(), P(None, DB_AXIS), P(DB_AXIS), P(None, DB_AXIS), P()),
        out_specs=P(None, DB_AXIS) if stacked else P(DB_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=32)
def make_db_p7_scanner(
    mesh: Mesh,
    stage: str = "viterbi",
    l_chunk: int = 256,
    interpret: bool = False,
    e_skip_d: bool = False,
    lazy_k: int = 0,
):
    """db-sharded Viterbi / Forward stage scan (the full-cascade analogue
    of :func:`make_db_scanner`): each device runs the p7 Pallas kernel
    on its local batch shard.

    Returns a jitted fn matching the stage's padded-wrapper signature
    (ops.pallas_p7._p7_pallas_padded for ``viterbi``; the prob-space
    ops.pallas_p7._fwd_prob_padded for ``forward``) -> scores [B_pad].
    """
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_p7 import _fwd_prob_padded, _p7_pallas_padded

    assert stage in ("viterbi", "forward")
    if stage == "viterbi":

        def local(msc, isc, trans, chain, tok, lens, trr, trc):
            return _p7_pallas_padded(
                msc, isc, trans, chain, tok, lens, trr, trc,
                l_chunk=l_chunk, interpret=interpret, forward=False,
                e_skip_d=e_skip_d, lazy_k=lazy_k,
            )

        in_specs = (
            P(), P(), P(), P(),
            P(None, DB_AXIS), P(DB_AXIS), P(None, DB_AXIS), P(),
        )
    else:

        def local(modds, iodds, trans, chain, tok, lens, trr, trp, trc):
            return _fwd_prob_padded(
                modds, iodds, trans, chain, tok, lens, trr, trp, trc,
                l_chunk=l_chunk, interpret=interpret,
            )

        in_specs = (
            P(), P(), P(), P(),
            P(None, DB_AXIS), P(DB_AXIS), P(None, DB_AXIS),
            P(None, DB_AXIS), P(),
        )

    mapped = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=P(DB_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=32)
def make_db_p7_filter_scanner(
    mesh: Mesh,
    l_chunk: int = 256,
    interpret: bool = False,
    filter_window: int = 16,
    e_skip_d: bool = False,
):
    """db-sharded upper-bound Viterbi prefilter (ops.pallas_p7
    _p7_filter_padded under shard_map); statics must match the packing
    from prepare_p7_device_filter."""
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_p7 import _p7_filter_padded

    def local(msc, isc, trans, chain, tok, lens, trr, trc):
        return _p7_filter_padded(
            msc, isc, trans, chain, tok, lens, trr, trc,
            l_chunk=l_chunk, interpret=interpret,
            filter_window=filter_window, e_skip_d=e_skip_d,
        )

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(),
            P(None, DB_AXIS), P(DB_AXIS), P(None, DB_AXIS), P(),
        ),
        out_specs=P(DB_AXIS),
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.lru_cache(maxsize=32)
def make_db_posterior_scanner(
    mesh: Mesh, interpret: bool = False, lanes: int = 128
):
    """db-sharded batched posterior-coverage decode (round 3: the
    --domains path rides the mesh like every other stage): each device
    runs the two-pass Pallas forward-backward
    (ops.pallas_posterior._posterior_padded) on its local hit shard.

    Returns a jitted fn(modds, iodds, trans, chain, schain, tokens_i8_t
    [L_pad, B_pad], lengths [B_pad], tr_rows, tr_probs, tr_consts) ->
    (cov [L_pad, B_pad], totals [B_pad]); B_pad must divide
    db * lanes."""
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_posterior import _posterior_padded

    def local(modds, iodds, trans, chain, schain, tok, lens, trr, trp, trc):
        return _posterior_padded(
            modds, iodds, trans, chain, schain, tok, lens, trr, trp, trc,
            interpret=interpret, lanes=lanes,
        )

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(),
            P(None, DB_AXIS), P(DB_AXIS), P(None, DB_AXIS),
            P(None, DB_AXIS), P(),
        ),
        out_specs=(P(None, DB_AXIS), P(DB_AXIS)),
        check_vma=False,
    )
    return jax.jit(mapped)


@functools.partial(jax.jit, static_argnames=("k",))
def top_k_hits(scores: jax.Array, k: int):
    """Distributed top-k over (possibly sharded) scores.

    Returns (values, indices); under jit with sharded input, XLA inserts
    the cross-device reduction (per-shard top-k + all-gather + final
    top-k) automatically.
    """
    return jax.lax.top_k(scores, k)
