"""End-to-end scan pipeline: the user-facing engine API.

The reference never finished its CLI (main.cpp is a stub — SURVEY.md
component #16); this module is the production entry: stage a sequence
database on device once, then scan any number of profiles against it
(the reference sweep workload, algorithms/benchmark_MSV.cpp, does exactly
this shape of work: one FASTA x 24 profiles).

Design for TPU economics:
* tokens ship int8 and live on device across profile scans;
* profile score matrices are tiny ([20, M] ~ 200 KB) and cached on
  device keyed by profile identity;
* M is padded to a bucket grid so the 24-profile sweep reuses a handful
  of compiled kernels instead of one per distinct LENG;
* sequence length pads to l_chunk * 2^k buckets for the same reason.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import logging
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from .io.fastaio import FastaDatabase
from .models.msv import MSVProfile, length_transitions
from .ops import pallas_msv
from .ops.pallas_p7 import length_transition_probs
from .ops.xla_scan import msv_scan_batch

logger = logging.getLogger(__name__)

Backend = Literal["auto", "pallas", "xla"]

# MSV lane schedule: 512-lane tiles win for BOTH filter and exact once
# the K=60 emission fold halves per-step MXU traffic (r5 ab_lab: exact
# 520.9 vs 403.1 at M=1400; filter 511.2 vs 352.2 at M=2405). The r4
# "exact keeps 256" verdict predates the fold.
FILTER_WIDEST = 512
# r5 ab_lab measured the 512-lane filter at M=2405 too: 511.2 vs 352.2
# GCUPS (ADVICE r4 wanted the big-M shape measured before shipping the
# global default — it now is, and 512 wins at every measured M)


def _filter_widest(m_pad: int) -> int:
    return FILTER_WIDEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@jax.jit
def _transpose_blank_device(tok_bl: jax.Array, lengths: jax.Array):
    """[B_pad, L_pad] int8 -> kernel layout [L_pad, B_pad] with every
    lane's positions >= lengths[lane] forced to PAD_TOKEN — the
    blank_ragged_tail contract (see its docstring for why real-residue
    tails corrupt the prob-space Forward kernel), executed on device."""
    t = tok_bl.T
    pos = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    return jnp.where(
        pos >= lengths[None, :], jnp.int8(pallas_msv.PAD_TOKEN), t
    )


@dataclasses.dataclass
class StagedDatabase:
    """Device-resident encoded sequence database."""

    tokens_i8_t: jax.Array  # [L_pad, B_pad] int8 (pallas layout)
    lengths: jax.Array  # [B_pad] int32
    tr_rows: jax.Array  # [2, B_pad] f32 (log-space loop/move)
    tr_probs: jax.Array  # [2, B_pad] f32 (host-exact probability rows)
    num_sequences: int  # true B before padding
    _tokens32: jax.Array | None = dataclasses.field(default=None, repr=False)

    @property
    def tokens(self) -> jax.Array:
        """[B_pad, L_pad] int32 (xla-path layout), built lazily — the
        pallas path never pays the widened transpose (4x HBM + an eager
        op dispatch per staging)."""
        if self._tokens32 is None:
            self._tokens32 = self.tokens_i8_t.T.astype(jnp.int32)
        return self._tokens32

    @property
    def total_residues(self) -> int:
        return int(np.asarray(self.lengths).sum())


class MSVScanner:
    """Profile-HMM MSV scan engine.

    >>> scanner = MSVScanner()
    >>> staged = scanner.stage(tokens, lengths)
    >>> scores = scanner.scan(profile, staged)
    """

    @classmethod
    def from_config(cls, config) -> "MSVScanner":
        """Build from a runtime.config.EngineConfig. ``use_mesh`` builds
        a (mesh_db x mesh_sp) device mesh and shards every scan over its
        db axis (EngineConfig mesh knobs — VERDICT r1 #3)."""
        mesh = None
        if getattr(config, "use_mesh", False):
            from .parallel.mesh import make_scan_mesh

            mesh = make_scan_mesh(db=config.mesh_db, sp=config.mesh_sp)
        return cls(
            backend=config.backend,
            l_chunk=config.l_chunk,
            m_bucket=config.m_bucket,
            mesh=mesh,
        )

    def __init__(
        self,
        backend: Backend = "auto",
        l_chunk: int = pallas_msv.DEFAULT_L_CHUNK,
        m_bucket: int = 256,
        interpret: bool = False,
        mesh=None,
    ):
        if backend == "auto":
            backend = "pallas" if jax.default_backend() != "cpu" or interpret else "xla"
        if backend == "pallas" and jax.default_backend() == "cpu":
            # Pallas has no native CPU lowering; interpret mode runs the
            # same kernel logic (used by CI and the virtual-mesh paths)
            interpret = True
        self.backend = backend
        self.l_chunk = l_chunk
        self.m_bucket = m_bucket
        self.interpret = interpret
        # multi-chip: a jax.sharding.Mesh with a "db" axis; every scan
        # shards the staged batch across it via shard_map'd kernels
        # (parallel.database). Requires the pallas backend.
        self.mesh = mesh
        if mesh is not None and backend != "pallas":
            raise ValueError("mesh sharding requires the pallas backend")
        # cache entries are (profile_object, payload): the stored strong
        # reference pins the object so its id() can never be recycled to
        # a different profile (id-keyed caches silently return a STALE
        # entry when a collected profile's address is reused — found as
        # a 1-in-several-runs test flake with 100%-wrong scores).
        # LRU-bounded: a Pfam-scale sweep iterates thousands of profiles
        # once; without eviction every profile's device pack stays pinned
        # in HBM for the process lifetime (ADVICE r3)
        self._profile_cache: collections.OrderedDict = collections.OrderedDict()
        # lazy-Viterbi hardware-compile verdicts, keyed by (m_pad,
        # l_chunk) shape (NOT by profile id — see the stale-id note
        # above): Mosaic can reject a schedule the CPU interpreter
        # accepts (seen on chip: "index in dimension 0 is not a
        # multiple of 8" from an unroll-sized dynamic slice), and the
        # lazy kernel landed after the last tunnel-up window. True =
        # compiled + ran on this backend; False = fell back to eager.
        self._lazy_hw: dict = {}

    #: max cached entries (a profile contributes a handful of keys —
    #: MSV pack, p7 packs, fused statics); 64 comfortably covers the
    #: 24-profile sweep while bounding Pfam-scale runs
    _CACHE_MAX = 64

    def _cache_get(self, key, obj):
        hit = self._profile_cache.get(key)
        if hit is not None and hit[0] is obj:
            self._profile_cache.move_to_end(key)
            return hit[1]
        return None

    def _cache_put(self, key, obj, payload):
        self._profile_cache[key] = (obj, payload)
        self._profile_cache.move_to_end(key)
        while len(self._profile_cache) > self._CACHE_MAX:
            self._profile_cache.popitem(last=False)  # evict LRU device pack
        return payload

    # -- mesh plumbing ---------------------------------------------------
    def _b_gran(self) -> int:
        """Batch padding granularity: every db shard must hold whole
        128-lane tiles."""
        if self.mesh is None:
            return pallas_msv.LANES
        from .parallel.mesh import DB_AXIS

        return pallas_msv.LANES * self.mesh.shape[DB_AXIS]

    def _dev(self, arr, b_axis: int):
        """Upload ``arr`` (B_pad along dim ``b_axis``), sharded over the
        mesh's db axis when a mesh is configured."""
        if self.mesh is None:
            return jnp.asarray(arr)
        from jax.sharding import NamedSharding, PartitionSpec

        from .parallel.mesh import DB_AXIS

        spec = [None] * np.ndim(arr)
        spec[b_axis] = DB_AXIS
        return jax.device_put(
            arr, NamedSharding(self.mesh, PartitionSpec(*spec))
        )

    # -- staging ---------------------------------------------------------
    def stage(self, tokens: np.ndarray, lengths: np.ndarray) -> StagedDatabase:
        """Pad + upload a token batch once; reusable across profiles.

        Round 5: the kernel-layout transpose + ragged-tail blank run ON
        DEVICE (a trivial jit) — the host-side strided int32->int8
        transposed store was 197 of the 241 ms staging cost per
        4096 x 3500 batch, the streamed search's largest producer
        section. The host now does one contiguous cast-store (24 ms)
        and uploads the same int8 byte count. The mesh path keeps the
        host transpose (its upload is sharded along the batch axis of
        the ALREADY-transposed layout)."""
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths, dtype=np.int32)
        b, seq_len = tokens.shape

        b_pad = _round_up(max(b, 1), self._b_gran())
        # one compile per (L bucket, B bucket) pair; a database is staged
        # once, so l_chunk-granular buckets beat power-of-2 padding waste
        l_pad = _round_up(max(seq_len, 1), self.l_chunk)

        lengths_p = np.zeros(b_pad, dtype=np.int32)
        lengths_p[:b] = lengths
        if self.mesh is None:
            tok = np.full((b_pad, l_pad), pallas_msv.PAD_TOKEN, dtype=np.int8)
            tok[:b, :seq_len] = tokens  # contiguous cast-store
            tokens_dev = _transpose_blank_device(
                jnp.asarray(tok), jnp.asarray(lengths_p)
            )
        else:
            tok_t = np.full(
                (l_pad, b_pad), pallas_msv.PAD_TOKEN, dtype=np.int8
            )
            tok_t[:seq_len, :b] = tokens.T
            pallas_msv.blank_ragged_tail(tok_t, lengths_p)
            tokens_dev = self._dev(tok_t, 1)
        tr_loop, tr_move = length_transitions(lengths_p)

        return StagedDatabase(
            tokens_i8_t=tokens_dev,
            lengths=self._dev(lengths_p, 0),
            tr_rows=self._dev(
                np.stack([tr_loop, tr_move]).astype(np.float32), 1
            ),
            tr_probs=self._dev(length_transition_probs(lengths_p), 1),
            num_sequences=b,
        )

    def stage_fasta(self, db: FastaDatabase) -> StagedDatabase:
        tokens, lengths = db.encode()
        return self.stage(tokens, lengths)

    def stage_device(
        self, tokens_i8_t: jax.Array, lengths: np.ndarray, num_sequences: int | None = None
    ) -> StagedDatabase:
        """Stage an ALREADY-ON-DEVICE token block (no host upload).

        ``tokens_i8_t`` is int8 [L_pad, B_pad] in the kernel layout with
        L_pad % l_chunk == 0 and B_pad % 128 == 0; ``lengths`` is the
        host-side [B_pad] array. CONTRACT: every lane's positions >=
        lengths[lane] must already hold PAD_TOKEN (see
        ops.pallas_msv.blank_ragged_tail) — real-residue ragged tails
        corrupt the prob-space Forward kernel. Used by the benchmark (device-generated
        corpora: the remote-tunnel upload of a 57 MB batch costs ~75 s)
        and by callers slicing an existing staged database.
        """
        l_pad, b_pad = tokens_i8_t.shape
        assert b_pad % self._b_gran() == 0 and l_pad % self.l_chunk == 0
        lengths_p = np.asarray(lengths, dtype=np.int32)
        assert lengths_p.shape == (b_pad,)
        tr_loop, tr_move = length_transitions(lengths_p)
        if self.mesh is not None:
            tokens_i8_t = self._dev(tokens_i8_t, 1)  # reshard over db
        return StagedDatabase(
            tokens_i8_t=tokens_i8_t,
            lengths=self._dev(lengths_p, 0),
            tr_rows=self._dev(
                np.stack([tr_loop, tr_move]).astype(np.float32), 1
            ),
            tr_probs=self._dev(length_transition_probs(lengths_p), 1),
            num_sequences=num_sequences if num_sequences is not None else b_pad,
        )

    def stage_bucketed(
        self,
        tokens: np.ndarray,
        lengths: np.ndarray,
        waste_factor: float = 0.25,
    ) -> "BucketedDatabase":
        """Stage a ragged batch as length-sorted buckets (see
        :class:`BucketedDatabase`). ``waste_factor`` caps per-sequence
        padding: a bucket closes when the next (longer) sequence's
        rounded length exceeds the bucket's shortest by more than this
        fraction."""
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths, dtype=np.int32)
        b = tokens.shape[0]
        order = np.argsort(lengths, kind="stable")

        buckets: list[StagedDatabase] = []
        bucket_order: list[np.ndarray] = []
        start = 0
        while start < b:
            lo = max(int(lengths[order[start]]), 1)
            cap = _round_up(max(int(lo * (1.0 + waste_factor)), 1), self.l_chunk)
            end = start
            while end < b and lengths[order[end]] <= cap:
                end += 1
            idx = order[start:end]
            l_max = max(int(lengths[idx].max()), 1)  # stage() rounds up
            buckets.append(self.stage(tokens[idx, :l_max], lengths[idx]))
            bucket_order.append(idx)
            start = end
        return BucketedDatabase(
            buckets=buckets, order=bucket_order, num_sequences=b
        )

    def scan_bucketed(
        self, profile: MSVProfile, bucketed: "BucketedDatabase"
    ) -> np.ndarray:
        """Score every sequence of a bucketed database -> f32 [B] in the
        ORIGINAL order."""
        out = np.empty(bucketed.num_sequences, dtype=np.float32)
        for staged, idx in zip(bucketed.buckets, bucketed.order):
            out[idx] = np.asarray(self.scan(profile, staged))
        return out

    # -- profile upload (cached) ----------------------------------------
    def _device_profile(self, profile: MSVProfile):
        key = id(profile)
        hit = self._cache_get(key, profile)
        if hit is not None:
            return hit
        mr = profile.num_states
        m_pad = _round_up(mr, self.m_bucket if self.backend == "pallas" else 8)
        scores_t = pallas_msv.prepare_scores_t(profile, m_pad)[None]  # [1, M_pad, 20]
        tr_consts = np.array(
            [[profile.tr_B_Mk, profile.tr_E_C, profile.tr_E_J]], dtype=np.float32
        )
        entry = (jnp.asarray(scores_t), jnp.asarray(tr_consts), mr)
        return self._cache_put(key, profile, entry)

    # -- scan ------------------------------------------------------------
    def scan(self, profile: MSVProfile, staged: StagedDatabase) -> jax.Array:
        """Score every staged sequence against one profile -> f32 [B]."""
        scores_t, tr_consts, _ = self._device_profile(profile)
        if self.mesh is not None:
            from .parallel.database import make_db_scanner

            scan = make_db_scanner(
                self.mesh, l_chunk=self.l_chunk, interpret=self.interpret
            )
            out = scan(
                scores_t,
                staged.tokens_i8_t,
                staged.lengths,
                staged.tr_rows,
                tr_consts,
            )
        elif self.backend == "pallas":
            out = pallas_msv._msv_pallas_padded(
                scores_t,
                staged.tokens_i8_t,
                staged.lengths,
                staged.tr_rows,
                tr_consts,
                l_chunk=self.l_chunk,
                interpret=self.interpret,
            )[0]
        else:
            # xla path consumes the untransposed finite score matrix
            out = msv_scan_batch(
                scores_t[0].T[:, : profile.num_states],
                tr_consts[0, 0],
                tr_consts[0, 1],
                tr_consts[0, 2],
                staged.tokens,
                staged.lengths,
                staged.tr_rows[0],
                staged.tr_rows[1],
            )
        return out[: staged.num_sequences]

    def scan_filter(self, profile: MSVProfile, staged: StagedDatabase) -> jax.Array:
        """Fast MSV prefilter: one-MXU-pass bf16 kernel whose scores are
        a guaranteed UPPER BOUND on the exact scores (host rounds the
        score matrix up; max-plus is monotone — see
        pallas_msv.prepare_scores_t_filter). Thresholding on these scores
        cannot drop a true hit; rescore survivors with :meth:`scan`.
        Pallas backend only (falls back to the exact scan elsewhere)."""
        if self.backend != "pallas":
            return self.scan(profile, staged)
        key = (id(profile), "filter")
        dev = self._cache_get(key, profile)
        if dev is None:
            # mr + 1 guarantees at least one ~-1e30 pad row, which lets
            # the kernel skip the per-step row0 wrap guard (27% faster)
            m_pad = _round_up(profile.num_states + 1, self.m_bucket)
            scores_t = pallas_msv.prepare_scores_t_filter(profile, m_pad)[None]
            tr_consts = np.array(
                [[profile.tr_B_Mk, profile.tr_E_C, profile.tr_E_J]],
                dtype=np.float32,
            )
            dev = self._cache_put(
                key, profile, (jnp.asarray(scores_t), jnp.asarray(tr_consts))
            )
        if self.mesh is not None:
            from .parallel.database import make_db_scanner

            scan = make_db_scanner(
                self.mesh,
                l_chunk=self.l_chunk,
                interpret=self.interpret,
                exact=False,
                skip_row0_guard=True,
                widest=_filter_widest(dev[0].shape[1]),
            )
            out = scan(
                dev[0], staged.tokens_i8_t, staged.lengths,
                staged.tr_rows, dev[1],
            )
        else:
            out = pallas_msv._msv_pallas_padded(
                dev[0],
                staged.tokens_i8_t,
                staged.lengths,
                staged.tr_rows,
                dev[1],
                l_chunk=self.l_chunk,
                interpret=self.interpret,
                exact=False,
                skip_row0_guard=True,
                widest=_filter_widest(dev[0].shape[1]),
            )[0]
        return out[: staged.num_sequences]

    def scan_p7_filter(
        self, p7, staged: StagedDatabase, window_log2: int | None = None
    ) -> jax.Array:
        """Upper-bound Viterbi prefilter over a staged database -> f32
        [B]. Every score >= the exact scan_p7(stage="viterbi") score
        (pallas_p7.prepare_p7_device_filter contract): thresholding on
        it cannot drop a hit, only pass extra survivors to the exact
        rescore. Falls back to the exact scan off the pallas backend."""
        if self.backend != "pallas":
            return self.scan_p7(p7, staged, stage="viterbi")
        from .ops import pallas_p7

        # window_log2=None auto-picks per profile (pick_filter_window)
        key = (id(p7), "p7_filter", window_log2)
        dev = self._cache_get(key, p7)
        if dev is None:
            packed = pallas_p7.prepare_p7_device_filter(
                p7, window_log2=window_log2
            )
            dev = self._cache_put(
                key,
                p7,
                tuple(jnp.asarray(x) for x in packed[:5]) + packed[5:],
            )
        if self.mesh is not None:
            from .parallel.database import make_db_p7_filter_scanner

            scan = make_db_p7_filter_scanner(
                self.mesh,
                l_chunk=self.l_chunk,
                interpret=self.interpret,
                filter_window=dev[5],
                e_skip_d=dev[6],
            )
            out = scan(
                *dev[:4], staged.tokens_i8_t, staged.lengths,
                staged.tr_rows, dev[4],
            )
        else:
            out = pallas_p7._p7_filter_padded(
                *dev[:4],
                staged.tokens_i8_t,
                staged.lengths,
                staged.tr_rows,
                dev[4],
                l_chunk=self.l_chunk,
                interpret=self.interpret,
                filter_window=dev[5],
                e_skip_d=dev[6],
            )
        return out[: staged.num_sequences]

    # -- full-profile stages over a staged database -----------------------
    def _p7_chunk(self) -> int:
        """L-chunk for the Viterbi/Forward stage kernels: 128 measured
        faster than the staging default 256 once the K=60 emission fold
        made these kernels VPU-bound (r5 vit_lab sweep + production-path
        A/B: lazy 368.5 -> 302.0 ms, forward 346.3 -> 313.3 ms at batch
        2048, bitwise-equal scores). Staged l_pad is a multiple of
        self.l_chunk, so 128 divides it whenever self.l_chunk does."""
        return 128 if self.l_chunk % 128 == 0 else self.l_chunk

    def scan_p7(self, p7, staged: StagedDatabase, stage: str = "viterbi") -> jax.Array:
        """Viterbi/Forward scores of every staged sequence -> f32 [B].

        Pallas backend scans the device-resident tokens directly (no
        per-call host upload — the p7 kernels' raw throughput); the xla
        backend falls back to the lax.scan path.
        """
        assert stage in ("viterbi", "forward")
        if self.backend == "pallas":
            from .ops import pallas_p7

            eskip = stage == "viterbi" and pallas_p7.e_skip_d_ok(p7)
            key = (id(p7), "p7", stage)
            dev = self._cache_get(key, p7)
            if dev is None:
                if stage == "forward":
                    packed = pallas_p7.prepare_p7_device_prob(p7)
                    lazy_k = 0
                elif eskip:
                    # lazily-certified truncated-chain exact kernel
                    # (round 3: same scores, ~half the chain work)
                    *packed, lazy_k = pallas_p7.prepare_p7_device_lazy(p7)
                else:
                    packed = pallas_p7.prepare_p7_device(p7)
                    lazy_k = 0
                dev = self._cache_put(
                    key, p7,
                    tuple(jnp.asarray(x) for x in packed) + (lazy_k,),
                )
            if self.mesh is not None:
                from .parallel.database import make_db_p7_scanner

                scan = make_db_p7_scanner(
                    self.mesh,
                    stage=stage,
                    l_chunk=self._p7_chunk(),
                    interpret=self.interpret,
                    e_skip_d=eskip,
                    lazy_k=dev[5],
                )
                args = (
                    *dev[:4], staged.tokens_i8_t, staged.lengths,
                    staged.tr_rows,
                )
                if stage == "forward":
                    args = args + (staged.tr_probs,)
                out = scan(*args, dev[4])
            elif stage == "forward":
                # scaled-probability Forward kernel (see ops.pallas_p7)
                out = pallas_p7._fwd_prob_padded(
                    *dev[:4],
                    staged.tokens_i8_t,
                    staged.lengths,
                    staged.tr_rows,
                    staged.tr_probs,
                    dev[4],
                    l_chunk=self._p7_chunk(),
                    interpret=self.interpret,
                )
            else:
                shape_key = (int(dev[0].shape[0]), self._p7_chunk())
                if dev[5] and self._lazy_hw.get(shape_key) is False:
                    # this shape's lazy kernel already failed Mosaic
                    # compile — rebuild (and re-cache) the eager pack
                    packed = pallas_p7.prepare_p7_device(p7)
                    dev = self._cache_put(
                        key, p7,
                        tuple(jnp.asarray(x) for x in packed) + (0,),
                    )

                def _vit(d):
                    return pallas_p7._p7_pallas_padded(
                        *d[:4],
                        staged.tokens_i8_t,
                        staged.lengths,
                        staged.tr_rows,
                        d[4],
                        l_chunk=self._p7_chunk(),
                        interpret=self.interpret,
                        forward=False,
                        e_skip_d=eskip,
                        lazy_k=d[5],
                    )

                if not dev[5] or shape_key in self._lazy_hw:
                    out = _vit(dev)
                else:
                    # first use of this lazy shape on this backend:
                    # force the (possibly remote) Mosaic compile NOW so
                    # a rejection falls back instead of killing the
                    # scan. The try wraps dispatch AND materialization:
                    # a local TPU raises at dispatch, the axon tunnel
                    # at np.asarray (block_until_ready is not a
                    # reliable barrier there — memory: tpu quirks)
                    try:
                        out = _vit(dev)
                        np.asarray(out)
                        self._lazy_hw[shape_key] = True
                    except Exception as e:  # pragma: no cover — hw only
                        logger.warning(
                            "lazy Viterbi kernel failed to compile for "
                            "m_pad=%d (%s: %.200s); falling back to the "
                            "eager full-chain kernel",
                            shape_key[0], type(e).__name__, e,
                        )
                        self._lazy_hw[shape_key] = False
                        packed = pallas_p7.prepare_p7_device(p7)
                        dev = self._cache_put(
                            key, p7,
                            tuple(jnp.asarray(x) for x in packed) + (0,),
                        )
                        out = _vit(dev)
        else:
            from .ops.p7_scan import forward_xla, viterbi_xla

            fn = viterbi_xla if stage == "viterbi" else forward_xla
            out = fn(
                p7,
                np.asarray(staged.tokens),
                np.asarray(staged.lengths),
            )
        return out[: staged.num_sequences]

    def scan_many_bucketed(
        self,
        profiles: list[MSVProfile],
        bucketed: "BucketedDatabase",
        mode: str = "exact",
    ) -> dict[str, np.ndarray]:
        """Stacked multi-profile sweep over a length-bucketed database
        (VERDICT r1 #6: the sweep24 optimization composed with ragged
        staging). One stacked kernel call per (M bucket x length bucket)
        instead of profiles x buckets serial scans; results scattered
        back to the original sequence order."""
        results = {
            p.name: np.empty(bucketed.num_sequences, dtype=np.float32)
            for p in profiles
        }
        for staged, idx in zip(bucketed.buckets, bucketed.order):
            sub = self.scan_many(profiles, staged, mode=mode)
            for name, scores in sub.items():
                results[name][idx] = scores
        return results

    def scan_many(
        self,
        profiles: list[MSVProfile],
        staged: StagedDatabase,
        mode: str = "exact",
    ) -> dict[str, np.ndarray]:
        """Sweep: scan the staged database against many profiles.

        On the pallas backend, profiles are grouped by padded-M bucket
        and each bucket runs as ONE stacked kernel call (grid dimension
        over profiles) — the 24-profile reference sweep costs a handful
        of device round trips instead of 24. ``mode="filter"`` runs the
        one-pass bf16 upper-bound kernel instead (scan_filter semantics:
        every score >= its exact value).
        """
        assert mode in ("exact", "filter")
        if self.backend != "pallas":
            return {p.name: np.asarray(self.scan(p, staged)) for p in profiles}
        filt = mode == "filter"

        buckets: dict[int, list[MSVProfile]] = {}
        for p in profiles:
            # +1 in filter mode guarantees a pad row (skip_row0_guard)
            m_pad = _round_up(p.num_states + (1 if filt else 0), self.m_bucket)
            buckets.setdefault(m_pad, []).append(p)

        prep = pallas_msv.prepare_scores_t_filter if filt else pallas_msv.prepare_scores_t
        results: dict[str, np.ndarray] = {}
        for m_pad, group in sorted(buckets.items()):
            scores_t = np.stack([prep(p, m_pad) for p in group])
            tr_consts = np.array(
                [[p.tr_B_Mk, p.tr_E_C, p.tr_E_J] for p in group], dtype=np.float32
            )
            if self.mesh is not None:
                from .parallel.database import make_db_scanner

                scan = make_db_scanner(
                    self.mesh,
                    l_chunk=self.l_chunk,
                    interpret=self.interpret,
                    exact=not filt,
                    skip_row0_guard=filt,
                    stacked=True,
                )
                out = np.asarray(
                    scan(
                        jnp.asarray(scores_t),
                        staged.tokens_i8_t,
                        staged.lengths,
                        staged.tr_rows,
                        jnp.asarray(tr_consts),
                    )
                )[:, : staged.num_sequences]
            else:
                out = np.asarray(
                    pallas_msv._msv_pallas_padded(
                        jnp.asarray(scores_t),
                        staged.tokens_i8_t,
                        staged.lengths,
                        staged.tr_rows,
                        jnp.asarray(tr_consts),
                        l_chunk=self.l_chunk,
                        interpret=self.interpret,
                        exact=not filt,
                        skip_row0_guard=filt,
                    )
                )[:, : staged.num_sequences]
            for p, scores in zip(group, out):
                results[p.name] = scores
        return results


def gumbel_score_threshold(p: float, mu: float, lam: float) -> float:
    """Smallest nat score with Gumbel P-value <= p (exact f64 inverse):
    pv(b) <= p  <=>  b_bits >= mu - ln(-ln(1-p)) / lambda."""
    import math

    bits = mu - math.log(-math.log1p(-p)) / lam
    return bits * math.log(2.0)


def _conservative_f32(x: float) -> np.float32:
    """One-ulp-down f32 threshold: device pruning with it passes a
    SUPERSET of what the host's exact f64 decision passes (extras get
    exact-rescored and re-thresholded on host — never a lost hit)."""
    return np.nextafter(np.float32(x), np.float32(-np.inf), dtype=np.float32)


def _compact_matrix(alive: jax.Array, cap: int):
    """[B] bool -> ([B, cap] f32 one-hot compaction matrix, count).

    Survivor b (in original order) maps to column cumsum(alive)[b]-1.
    Built from cumsum + compare only: XLA's argsort AND gather each
    cost ~20 ms on TPU at ANY size (measured — they lower to serial
    index loops), while cumsum/compare/matmul are vector-native.
    Survivors beyond ``cap`` get no column (the host checks the count
    and falls back)."""
    pos = jnp.cumsum(alive.astype(jnp.int32)) - 1
    onehot = alive[:, None] & (
        pos[:, None] == jnp.arange(cap, dtype=jnp.int32)[None, :]
    )
    return onehot.astype(jnp.float32), jnp.sum(alive.astype(jnp.int32))


def _compact_i8(x_i8: jax.Array, onehot_f32: jax.Array) -> jax.Array:
    """Column compaction [L, B] int8 @ [B, cap] -> [L, cap] int8 via a
    one-hot bf16 MXU matmul (tokens are small ints — exact in bf16; the
    one-hot sums exactly one term into the f32 accumulator)."""
    out = jax.lax.dot_general(
        x_i8.astype(jnp.bfloat16), onehot_f32.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(jnp.int8)


def _compact_f32(x: jax.Array, onehot_f32: jax.Array) -> jax.Array:
    """Row compaction [R, B] f32 @ [B, cap] -> [R, cap], EXACT: with
    Precision.HIGHEST the bf16-split one-hot select reconstructs each
    f32 value bit-exactly (1.0 splits exactly; single-term sum)."""
    return jax.lax.dot_general(
        x, onehot_f32, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "l_chunk", "interpret", "cap1", "cap2", "filter_window",
        "e_skip_d", "lazy_k",
    ),
)
def _fused_cascade(
    # MSV filter + exact (per-profile device arrays)
    msv_filter_t, msv_scores_t, msv_consts,
    # Viterbi filter pack
    vf_msc, vf_isc, vf_trans, vf_chain, vf_consts,
    # Viterbi exact pack
    v_msc, v_isc, v_trans, v_chain, v_consts,
    # Forward (prob space) pack
    f_modds, f_iodds, f_trans, f_chain, f_consts,
    # staged database
    tokens_i8_t, lengths, tr_rows, tr_probs,
    # conservative f32 nat-score thresholds: [msv, viterbi]
    thresholds,
    l_chunk: int,
    interpret: bool,
    cap1: int,
    cap2: int,
    filter_window: int,
    e_skip_d: bool,
    lazy_k: int = 0,
):
    """The whole hmmsearch acceleration cascade as ONE XLA program.

    MSV filter -> device threshold -> compact survivors (cap1 lanes) ->
    exact MSV rescore -> threshold -> compact (cap2) -> Viterbi filter
    -> Viterbi exact -> Forward, with every intermediate crossing
    staying on device. The host-orchestrated cascade pays this
    environment's ~36 ms dispatch latency per stage crossing (~6x);
    fused, the program dispatches once.

    Pruning uses one-ulp-down f32 score thresholds (superset of the
    host's f64 decisions); the host recomputes final P-values from the
    returned scores, so MSV/Viterbi decisions match the unfused
    pipeline exactly (max-plus scores are padding-invariant). Caveat:
    Forward runs here at the full database L_pad while the staged
    pipeline restages survivors at their subset's max length, so
    Forward scores agree only within the prob-space kernel's rounding
    (~5e-4 nats) — a hit whose forward P-value sits within that of the
    threshold can flip between the two paths.
    NO index vectors cross stages: compaction is cumsum + one-hot
    matmuls (sort/gather-free — see _compact_matrix), and the host
    reconstructs the survivor index maps from the returned scores with
    the same f32 threshold compares. Returns (filt, n1, exact1, n2,
    vfilt, n3, vit, fwd); any n over its cap signals capacity overflow
    (host falls back to the staged pipeline).
    """
    from .ops import pallas_p7

    # stage 1: MSV filter over the full database
    filt = pallas_msv._msv_pallas_padded(
        msv_filter_t, tokens_i8_t, lengths, tr_rows, msv_consts,
        l_chunk=l_chunk, interpret=interpret,
        exact=False, skip_row0_guard=True,
    )[0]
    alive1 = (filt >= thresholds[0]) & (lengths > 0)
    oh1, n1 = _compact_matrix(alive1, cap1)

    len_f = lengths.astype(jnp.float32)[None, :]
    # tr_loop is -inf for length-0 pad lanes and (-inf)*0 NaNs the
    # one-hot matmul; survivors always have length > 0, so a finite
    # stand-in is exact for every selected column
    tr_rows_fin = jnp.where(
        jnp.isfinite(tr_rows), tr_rows, jnp.float32(pallas_msv.PAD_SCORE)
    )
    sub_tok1 = _compact_i8(tokens_i8_t, oh1)
    sub_len1 = _compact_f32(len_f, oh1)[0].astype(jnp.int32)
    sub_trr1 = _compact_f32(tr_rows_fin, oh1)
    sub_trp1 = _compact_f32(tr_probs, oh1)
    in1 = jnp.arange(cap1, dtype=jnp.int32) < n1

    # stage 2: exact MSV rescore of filter survivors
    exact1 = pallas_msv._msv_pallas_padded(
        msv_scores_t, sub_tok1, sub_len1, sub_trr1, msv_consts,
        l_chunk=l_chunk, interpret=interpret,
    )[0]
    alive2 = in1 & (exact1 >= thresholds[0])
    oh2, n2 = _compact_matrix(alive2, cap2)
    sub_tok2 = _compact_i8(sub_tok1, oh2)
    sub_len2 = _compact_f32(sub_len1.astype(jnp.float32)[None, :], oh2)[0].astype(jnp.int32)
    sub_trr2 = _compact_f32(sub_trr1, oh2)
    sub_trp2 = _compact_f32(sub_trp1, oh2)

    # stage 3: Viterbi filter on the cap2 survivor lanes, then exact
    # Viterbi / Forward unconditionally — a measured lax.cond skip costs
    # MORE than the 128-lane kernels it would skip (~65 ms of
    # conditional overhead vs ~28 ms of kernels on v5e)
    vfilt = pallas_p7._p7_filter_padded(
        vf_msc, vf_isc, vf_trans, vf_chain, sub_tok2, sub_len2,
        sub_trr2, vf_consts, l_chunk=l_chunk, interpret=interpret,
        filter_window=filter_window, e_skip_d=e_skip_d,
    )
    alive3 = (jnp.arange(cap2, dtype=jnp.int32) < n2) & (
        vfilt >= thresholds[1]
    )
    cap3 = min(cap2, pallas_msv.LANES)
    oh3, n3 = _compact_matrix(alive3, cap3)
    sub_tok3 = _compact_i8(sub_tok2, oh3)
    sub_len3 = _compact_f32(sub_len2.astype(jnp.float32)[None, :], oh3)[0].astype(jnp.int32)
    sub_trr3 = _compact_f32(sub_trr2, oh3)
    sub_trp3 = _compact_f32(sub_trp2, oh3)
    vit = pallas_p7._p7_pallas_padded(
        v_msc, v_isc, v_trans, v_chain, sub_tok3, sub_len3,
        sub_trr3, v_consts, l_chunk=l_chunk, interpret=interpret,
        forward=False, e_skip_d=e_skip_d, lazy_k=lazy_k,
    )
    fwd = pallas_p7._fwd_prob_padded(
        f_modds, f_iodds, f_trans, f_chain, sub_tok3, sub_len3,
        sub_trr3, sub_trp3, f_consts, l_chunk=l_chunk,
        interpret=interpret,
    )
    return filt, n1, exact1, n2, vfilt, n3, vit, fwd


def select_p7_fns(backend: str, interpret: bool = False):
    """(viterbi_fn, forward_fn) for a backend: Pallas kernels on TPU
    (ops.pallas_p7), lax.scan elsewhere (ops.p7_scan)."""
    if backend == "pallas":
        from .ops.pallas_p7 import forward_pallas, viterbi_pallas

        return (
            functools.partial(viterbi_pallas, interpret=interpret),
            functools.partial(forward_pallas, interpret=interpret),
        )
    from .ops.p7_scan import forward_xla, viterbi_xla

    return viterbi_xla, forward_xla


@dataclasses.dataclass
class BucketedDatabase:
    """A ragged database staged as length-sorted buckets.

    Real protein databases are heavily length-skewed (most sequences a
    few hundred aa, a tail out to tens of thousands); padding everything
    to the global maximum wastes the DP grid on padding cells. Buckets
    bound that waste: sequences are sorted by length, grouped so no
    bucket pads a sequence by more than ``waste_factor`` of its rounded
    length, and each bucket is staged separately. Scans run per bucket
    and results are scattered back to the original order.
    """

    buckets: list[StagedDatabase]
    order: list[np.ndarray]  # original indices per bucket
    num_sequences: int

    @property
    def padded_cells_saved(self) -> float:
        """Fraction of padded residues avoided vs single-bucket staging."""
        if not self.buckets:
            return 0.0
        per_bucket = sum(
            s.tokens_i8_t.shape[0] * s.num_sequences for s in self.buckets
        )
        max_l = max(s.tokens_i8_t.shape[0] for s in self.buckets)
        single = max_l * self.num_sequences
        return 1.0 - per_bucket / single if single else 0.0


@dataclasses.dataclass
class SearchResult:
    """Outcome of the staged acceleration pipeline for one profile."""

    msv_scores: np.ndarray  # [B] f32 (all sequences)
    msv_pvalues: np.ndarray
    viterbi_scores: np.ndarray  # [B] f32, NaN where not computed
    viterbi_pvalues: np.ndarray
    forward_scores: np.ndarray  # [B] f32, NaN where not computed
    forward_pvalues: np.ndarray
    passed_msv: np.ndarray  # [B] bool
    passed_viterbi: np.ndarray
    passed_forward: np.ndarray

    @property
    def hits(self) -> np.ndarray:
        return np.flatnonzero(self.passed_forward)


class SearchPipeline:
    """hmmsearch-style acceleration cascade: MSV -> Viterbi -> Forward.

    The reference implements only the MSV stage of this pipeline
    (SURVEY.md scope note); the full cascade is this engine's extension,
    using HMMER3's standard stage thresholds. Each stage only rescoring
    the survivors of the previous one.
    """

    @classmethod
    def from_config(cls, config, scanner: MSVScanner | None = None) -> "SearchPipeline":
        return cls(
            scanner=scanner or MSVScanner.from_config(config),
            msv_p=config.msv_p,
            viterbi_p=config.viterbi_p,
            forward_p=config.forward_p,
        )

    def __init__(
        self,
        scanner: MSVScanner | None = None,
        msv_p: float = 0.02,
        viterbi_p: float = 1e-3,
        forward_p: float = 1e-5,
        fast_msv: bool = False,
        fast_viterbi: bool = False,
        fused: bool = False,
    ):
        self.scanner = scanner or MSVScanner()
        self.msv_p = msv_p
        self.viterbi_p = viterbi_p
        self.forward_p = forward_p
        # fast_msv: run the one-pass bf16 upper-bound prefilter first and
        # exactly rescore only its survivors (no false negatives by
        # construction — scan_filter docstring)
        self.fast_msv = fast_msv
        # fast_viterbi: same one-sided-rounding trick applied to the
        # Viterbi stage (truncated-chain bf16 filter kernel, HMMER
        # ViterbiFilter's role) — exact-rescore only its survivors
        self.fast_viterbi = fast_viterbi
        # fused: run the whole cascade as ONE device program
        # (_fused_cascade) when the backend allows; identical hit sets,
        # ~one dispatch instead of ~six. Falls back to the staged path
        # on capacity overflow / non-pallas / mesh scanners.
        self.fused = fused
        # derived MSVProfile/P7Profile per hmm object (pinned, same
        # stale-id discipline as MSVScanner._profile_cache): streamed
        # scans/sweeps call search() once per batch, and handing the
        # scanner a FRESH derived profile each call would grow its
        # id-keyed device caches by one pinned entry (profile pack +
        # device arrays) per batch — an unbounded leak that also
        # re-uploads the profile every batch. LRU-bounded like
        # MSVScanner._profile_cache (ADVICE r3): sweeps over thousands
        # of profiles must not pin every derived pack forever
        self._derived_cache: collections.OrderedDict = collections.OrderedDict()

    _DERIVED_MAX = 32

    def _derived(self, hmm):
        hit = self._derived_cache.get(id(hmm))
        if hit is not None and hit[0] is hmm:
            self._derived_cache.move_to_end(id(hmm))
            return hit[1], hit[2]
        from .models.p7 import P7Profile

        msvp = MSVProfile.from_profile(hmm)
        p7 = P7Profile.from_profile(hmm)
        self._derived_cache[id(hmm)] = (hmm, msvp, p7)
        while len(self._derived_cache) > self._DERIVED_MAX:
            self._derived_cache.popitem(last=False)
        return msvp, p7

    def _p7_fns(self):
        """Viterbi/Forward implementations following the scanner backend
        (Pallas kernels on TPU, lax.scan on CPU/XLA)."""
        return select_p7_fns(self.scanner.backend, self.scanner.interpret)

    def _fused_packs(self, hmm):
        """Device arrays + statics for _fused_cascade, cached per hmm."""
        from .ops import pallas_p7

        sc = self.scanner
        # thresholds bake the pipeline's p-value cutoffs into the cached
        # device array — key them, or a second pipeline sharing this
        # scanner would prune with the first one's cutoffs
        key = (id(hmm), "fused", self.msv_p, self.viterbi_p)
        entry = sc._cache_get(key, hmm)
        if entry is not None:
            return entry
        from .models.p7 import P7Profile

        msvp = MSVProfile.from_profile(hmm)
        p7 = P7Profile.from_profile(hmm)
        mr = msvp.num_states
        m_pad_f = _round_up(mr + 1, sc.m_bucket)  # +1: skip_row0_guard
        m_pad = _round_up(mr, sc.m_bucket)
        msv_filter_t = pallas_msv.prepare_scores_t_filter(msvp, m_pad_f)[None]
        msv_scores_t = pallas_msv.prepare_scores_t(msvp, m_pad)[None]
        msv_consts = np.array(
            [[msvp.tr_B_Mk, msvp.tr_E_C, msvp.tr_E_J]], dtype=np.float32
        )
        vf_pack = pallas_p7.prepare_p7_device_filter(p7)
        eskip = pallas_p7.e_skip_d_ok(p7)
        if eskip:
            *v_pack, v_lazy_k = pallas_p7.prepare_p7_device_lazy(p7)
        else:
            v_pack, v_lazy_k = pallas_p7.prepare_p7_device(p7), 0
        f_pack = pallas_p7.prepare_p7_device_prob(p7)
        thr = np.array(
            [
                _conservative_f32(
                    gumbel_score_threshold(
                        self.msv_p,
                        hmm.stats_local_msv_mu,
                        hmm.stats_local_msv_lambda,
                    )
                ),
                _conservative_f32(
                    gumbel_score_threshold(
                        self.viterbi_p,
                        hmm.stats_local_viterbi_mu,
                        hmm.stats_local_viterbi_lambda,
                    )
                ),
            ],
            dtype=np.float32,
        )
        entry = (
            tuple(
                jnp.asarray(x)
                for x in (
                    msv_filter_t, msv_scores_t, msv_consts,
                    *vf_pack[:5], *v_pack, *f_pack, thr,
                )
            ),
            vf_pack[5],  # filter_window
            vf_pack[6],  # e_skip_d (== e_skip_d_ok(p7))
            v_lazy_k,
        )
        return sc._cache_put(key, hmm, entry)

    def _search_fused(self, hmm, staged: StagedDatabase):
        """One-dispatch cascade; None when ineligible or over capacity."""
        from .models import stats

        sc = self.scanner
        if sc.backend != "pallas" or sc.mesh is not None:
            return None
        arrays, window, eskip, v_lazy_k = self._fused_packs(hmm)
        b = staged.num_sequences
        b_pad = staged.tokens_i8_t.shape[1]
        cap1 = int(np.clip(
            _round_up(int(b_pad * self.msv_p * 6) + 64, pallas_msv.LANES),
            pallas_msv.LANES, b_pad,
        ))
        cap2 = int(np.clip(
            _round_up(int(b_pad * self.msv_p * 2) + 64, pallas_msv.LANES),
            pallas_msv.LANES, cap1,
        ))
        out = _fused_cascade(
            *arrays[:-1],
            staged.tokens_i8_t, staged.lengths, staged.tr_rows,
            staged.tr_probs, arrays[-1],
            l_chunk=sc.l_chunk, interpret=sc.interpret,
            cap1=cap1, cap2=cap2, filter_window=window, e_skip_d=eskip,
            lazy_k=v_lazy_k,
        )
        filt, n1, exact1, n2, vfilt, n3, vit, fwd = (
            np.asarray(x) for x in out
        )
        cap3 = min(cap2, pallas_msv.LANES)
        if int(n1) > cap1 or int(n2) > cap2 or int(n3) > cap3:
            logger.info(
                "fused cascade capacity overflow (n1=%d n2=%d n3=%d) — "
                "falling back to the staged pipeline", n1, n2, n3,
            )
            return None

        # reconstruct the device's survivor->column maps on host by
        # replaying the SAME f32 threshold compares on the returned
        # scores (the device ships no index vectors — compaction is
        # matmul-only)
        thr = np.asarray(arrays[-1])
        lengths_np = np.asarray(staged.lengths)
        sel1 = np.flatnonzero((filt >= thr[0]) & (lengths_np > 0))
        assert sel1.size == int(n1)
        alive2 = (np.arange(cap1) < sel1.size) & (exact1 >= thr[0])
        cols2 = np.flatnonzero(alive2)
        glob2 = sel1[cols2]
        alive3 = (np.arange(cap2) < cols2.size) & (vfilt >= thr[1])
        cols3 = np.flatnonzero(alive3)
        glob3 = glob2[cols3]

        # host-side EXACT (f64) decisions from the returned scores — the
        # device pruned with one-ulp-down thresholds, a superset
        msv_scores = filt[:b].copy()
        in_b1 = sel1 < b
        msv_scores[sel1[in_b1]] = exact1[: sel1.size][in_b1]
        msv_pv = stats.msv_pvalue(msv_scores, hmm)
        passed_msv = msv_pv <= self.msv_p

        nan = np.float32(np.nan)
        vit_scores = np.full(b, nan, dtype=np.float32)
        vit_pv = np.full(b, np.nan)
        fwd_scores = np.full(b, nan, dtype=np.float32)
        fwd_pv = np.full(b, np.nan)

        # vfilt is indexed by stage-2 SLOT RANK (column k of the second
        # compaction holds lane glob2[k]) — NOT by the stage-1 slot
        # index cols2[k]
        keep2 = (glob2 < b) & passed_msv[np.minimum(glob2, b - 1)]
        vit_scores[glob2[keep2]] = vfilt[: cols2.size][keep2]
        # vit/fwd columns are stage-3 compaction slots: column k holds
        # the lane glob3[k]
        k3 = np.arange(cols3.size)
        keep3 = (glob3 < b) & passed_msv[np.minimum(glob3, b - 1)]
        vit_scores[glob3[keep3]] = vit[k3[keep3]]
        has_vit = np.isfinite(vit_scores)
        vit_pv[has_vit] = stats.viterbi_pvalue(vit_scores[has_vit], hmm)
        passed_vit = np.nan_to_num(vit_pv, nan=1.0) <= self.viterbi_p

        keep4 = keep3 & passed_vit[np.minimum(glob3, b - 1)]
        fwd_scores[glob3[keep4]] = fwd[k3[keep4]]
        has_fwd = np.isfinite(fwd_scores)
        fwd_pv[has_fwd] = stats.forward_pvalue(fwd_scores[has_fwd], hmm)
        passed_fwd = np.nan_to_num(fwd_pv, nan=1.0) <= self.forward_p

        return SearchResult(
            msv_scores=msv_scores,
            msv_pvalues=msv_pv,
            viterbi_scores=vit_scores,
            viterbi_pvalues=vit_pv,
            forward_scores=fwd_scores,
            forward_pvalues=fwd_pv,
            passed_msv=passed_msv,
            passed_viterbi=passed_vit,
            passed_forward=passed_fwd,
        )

    def search(self, hmm, staged: StagedDatabase, tokens: np.ndarray, lengths: np.ndarray) -> SearchResult:
        """Run the cascade. ``hmm`` is a ProfileHMM; ``tokens``/``lengths``
        are the host-side arrays used to rescore survivor subsets."""
        from .models import stats

        if self.fused:
            fused_result = self._search_fused(hmm, staged)
            if fused_result is not None:
                return fused_result

        msv_profile, p7 = self._derived(hmm)
        if self.fast_msv and self.scanner.backend == "pallas":
            # upper-bound prefilter, then exact rescore of candidates:
            # a sequence the filter rejects is exactly rejected too
            # (copy: np.asarray of a jax.Array is a read-only view)
            msv_scores = np.array(self.scanner.scan_filter(msv_profile, staged))
            cand = np.flatnonzero(stats.msv_pvalue(msv_scores, hmm) <= self.msv_p)
            if cand.size:
                l_max = max(int(lengths[cand].max()), 1)
                sub = self.scanner.stage(tokens[cand, :l_max], lengths[cand])
                msv_scores[cand] = np.asarray(self.scanner.scan(msv_profile, sub))
        else:
            msv_scores = np.asarray(self.scanner.scan(msv_profile, staged))
        return self._finish_cascade(hmm, p7, msv_scores, tokens, lengths)

    def search_bucketed(
        self, hmm, bucketed, tokens: np.ndarray, lengths: np.ndarray
    ) -> SearchResult:
        """The cascade over a length-bucketed staging
        (MSVScanner.stage_bucketed): the MSV stage runs per bucket,
        bounding ragged-padding waste on length-skewed databases; the
        p7 stages restage survivors compactly exactly as in search().
        --fast's bf16 MSV prefilter runs per bucket too. The fused
        single-program cascade needs one staged database and is not
        offered here."""
        from .models import stats

        msv_profile, p7 = self._derived(hmm)
        if self.fast_msv and self.scanner.backend == "pallas":
            msv_scores = np.empty(bucketed.num_sequences, dtype=np.float32)
            for staged, idx in zip(bucketed.buckets, bucketed.order):
                msv_scores[idx] = np.asarray(
                    self.scanner.scan_filter(msv_profile, staged)
                )
            cand = np.flatnonzero(
                stats.msv_pvalue(msv_scores, hmm) <= self.msv_p
            )
            if cand.size:
                l_max = max(int(lengths[cand].max()), 1)
                sub = self.scanner.stage(tokens[cand, :l_max], lengths[cand])
                msv_scores[cand] = np.asarray(
                    self.scanner.scan(msv_profile, sub)
                )
        else:
            msv_scores = self.scanner.scan_bucketed(msv_profile, bucketed)
        return self._finish_cascade(hmm, p7, msv_scores, tokens, lengths)

    def _finish_cascade(
        self, hmm, p7, msv_scores: np.ndarray,
        tokens: np.ndarray, lengths: np.ndarray,
    ) -> SearchResult:
        """Viterbi/Forward rescoring of MSV survivors (shared by the
        staged, bucketed, and prefiltered entry points)."""
        from .models import stats

        viterbi_fn, forward_fn = self._p7_fns()
        b = len(msv_scores)
        msv_pv = stats.msv_pvalue(msv_scores, hmm)
        passed_msv = msv_pv <= self.msv_p

        vit_scores = np.full(b, np.nan, dtype=np.float32)
        vit_pv = np.full(b, np.nan)
        fwd_scores = np.full(b, np.nan, dtype=np.float32)
        fwd_pv = np.full(b, np.nan)
        passed_vit = np.zeros(b, dtype=bool)
        passed_fwd = np.zeros(b, dtype=bool)

        def _stage_subset(sel: np.ndarray):
            l_max = max(int(lengths[sel].max()), 1)
            return self.scanner.stage(tokens[sel, :l_max], lengths[sel])

        def _p7_stage(sel: np.ndarray, p7, stage: str) -> np.ndarray:
            # route through the scanner (device-resident staging, and
            # mesh-sharded when the scanner carries a mesh) on pallas;
            # lax.scan fns elsewhere
            if self.scanner.backend == "pallas":
                return np.asarray(
                    self.scanner.scan_p7(p7, _stage_subset(sel), stage=stage)
                )
            fn = viterbi_fn if stage == "viterbi" else forward_fn
            return np.asarray(fn(p7, tokens[sel], lengths[sel]))

        idx = np.flatnonzero(passed_msv)
        if idx.size:
            if self.fast_viterbi and self.scanner.backend == "pallas":
                # upper-bound prefilter: its p-values LOWER-bound the
                # exact ones (pvalue is decreasing in score), so a
                # filter rejection is an exact rejection; rescore only
                # the filter's survivors with the exact kernel
                vf = np.array(
                    self.scanner.scan_p7_filter(p7, _stage_subset(idx))
                )
                vit_scores[idx] = vf
                vit_pv[idx] = stats.viterbi_pvalue(vf, hmm)
                idx = idx[vit_pv[idx] <= self.viterbi_p]
                if idx.size:
                    vs = _p7_stage(idx, p7, "viterbi")
                    vit_scores[idx] = vs
                    vit_pv[idx] = stats.viterbi_pvalue(vs, hmm)
                    passed_vit[idx] = vit_pv[idx] <= self.viterbi_p
            else:
                vs = _p7_stage(idx, p7, "viterbi")
                vit_scores[idx] = vs
                vit_pv[idx] = stats.viterbi_pvalue(vs, hmm)
                passed_vit[idx] = vit_pv[idx] <= self.viterbi_p

            idx2 = np.flatnonzero(passed_vit)
            if idx2.size:
                fs = _p7_stage(idx2, p7, "forward")
                fwd_scores[idx2] = fs
                fwd_pv[idx2] = stats.forward_pvalue(fs, hmm)
                passed_fwd[idx2] = fwd_pv[idx2] <= self.forward_p

        return SearchResult(
            msv_scores=msv_scores,
            msv_pvalues=msv_pv,
            viterbi_scores=vit_scores,
            viterbi_pvalues=vit_pv,
            forward_scores=fwd_scores,
            forward_pvalues=fwd_pv,
            passed_msv=passed_msv,
            passed_viterbi=passed_vit,
            passed_forward=passed_fwd,
        )
