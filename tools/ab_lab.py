"""Round-5 on-chip A/B lab: measures each round-5 kernel change against
its round-4 baseline configuration on the real chip.

Stages (run individually to bound tunnel-loss blast radius):

    python tools/ab_lab.py msv_k60       # K=60 emission fold vs 3-pass
    python tools/ab_lab.py msv_lanes     # exact MSV 256 vs 512 lanes (K=60)
    python tools/ab_lab.py viterbi       # lazy exact Viterbi (K=60 step)
    python tools/ab_lab.py forward       # truncated prob-space Forward
    python tools/ab_lab.py posterior     # block-gated two-pass decode
    python tools/ab_lab.py filter2405    # M=2405 filter 256 vs 512 lanes

Every stage prints best-of-3 GCUPS (+ bitwise/tolerance checks where the
variants must agree). Headline shapes match bench.py rows so results are
directly comparable with BENCH_r{N} artifacts.
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hmm_fasta_viterbi_tpu import MSVProfile, parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.bench.harness import random_tokens  # noqa: E402
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile  # noqa: E402
from hmm_fasta_viterbi_tpu.ops.pallas_msv import (  # noqa: E402
    _msv_pallas_padded,
    _round_up,
    prepare_scores_t,
)
from hmm_fasta_viterbi_tpu.pipeline import MSVScanner  # noqa: E402

PROFILES = REPO / "data" / "profile_HMMs"


def best_of(fn, reps: int = 3):
    out = np.asarray(fn())  # warm/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        times.append(time.perf_counter() - t0)
    return out, min(times), times


def _staged(sc, batch, seq_len):
    from bench import stage_random_device

    return stage_random_device(sc, batch, seq_len)


def _msv_args(sc, staged, m_name="1400.hmm", m_bucket=256):
    p = MSVProfile.from_profile(parse_hmm(PROFILES / m_name))
    scores_t = jnp.asarray(
        prepare_scores_t(p, _round_up(p.num_states, m_bucket))[None]
    )
    tr_consts = jnp.asarray(
        np.array([[p.tr_B_Mk, p.tr_E_C, p.tr_E_J]], dtype=np.float32)
    )
    return p, scores_t, tr_consts


def stage_msv_k60(sc, batch=16384, seq_len=3500):
    staged = _staged(sc, batch, seq_len)
    p, scores_t, tr_consts = _msv_args(sc, staged)
    cells = batch * seq_len * (p.model_length - 1)
    base = None
    for k60 in (False, True):
        out, best, times = best_of(lambda: _msv_pallas_padded(
            scores_t, staged.tokens_i8_t, staged.lengths, staged.tr_rows,
            tr_consts, l_chunk=256, interpret=False, emit_k60=k60))
        print(f"msv emit_k60={k60}: {cells/best/1e9:.1f} GCUPS "
              f"({best*1e3:.1f} ms) reps={[round(t, 4) for t in times]}",
              flush=True)
        if base is None:
            base = out
        else:
            print("  bitwise equal to 3-pass:", bool((out == base).all()),
                  flush=True)


def stage_msv_lanes(sc, batch=16384, seq_len=3500):
    # K=60 halves the MXU traffic per step; the r4 "512 regresses exact"
    # verdict may no longer hold — remeasure the lane schedule
    staged = _staged(sc, batch, seq_len)
    p, scores_t, tr_consts = _msv_args(sc, staged)
    cells = batch * seq_len * (p.model_length - 1)
    for widest in (256, 512):
        out, best, times = best_of(lambda: _msv_pallas_padded(
            scores_t, staged.tokens_i8_t, staged.lengths, staged.tr_rows,
            tr_consts, l_chunk=256, interpret=False, widest=widest))
        print(f"msv exact widest={widest}: {cells/best/1e9:.1f} GCUPS "
              f"({best*1e3:.1f} ms)", flush=True)


def stage_viterbi(sc, batch=2048, seq_len=3500):
    from hmm_fasta_viterbi_tpu.ops.pallas_p7 import viterbi_pallas

    p7 = P7Profile.from_profile(parse_hmm(PROFILES / "1400.hmm"))
    tokens, lengths = random_tokens(batch, seq_len, seed=0)
    cells = batch * seq_len * (p7.model_length - 1)
    eager, best_e, _ = best_of(
        lambda: viterbi_pallas(p7, tokens, lengths, lazy=False))
    print(f"viterbi eager: {cells/best_e/1e9:.1f} GCUPS "
          f"({best_e*1e3:.1f} ms)", flush=True)
    lazy, best_l, times = best_of(
        lambda: viterbi_pallas(p7, tokens, lengths, lazy=True,
                               hw_fallback=False))
    print(f"viterbi lazy:  {cells/best_l/1e9:.1f} GCUPS "
          f"({best_l*1e3:.1f} ms) reps={[round(t, 4) for t in times]}",
          flush=True)
    print("  lazy bitwise == eager:", bool((np.asarray(lazy) ==
                                            np.asarray(eager)).all()),
          flush=True)


def stage_forward(sc, batch=2048, seq_len=3500):
    from hmm_fasta_viterbi_tpu.ops.pallas_p7 import forward_pallas

    p7 = P7Profile.from_profile(parse_hmm(PROFILES / "1400.hmm"))
    tokens, lengths = random_tokens(batch, seq_len, seed=0)
    cells = batch * seq_len * (p7.model_length - 1)
    _, best, times = best_of(lambda: forward_pallas(p7, tokens, lengths))
    print(f"forward: {cells/best/1e9:.1f} GCUPS ({best*1e3:.1f} ms) "
          f"reps={[round(t, 4) for t in times]}", flush=True)


def stage_posterior(sc, batch=1024, seq_len=1024):
    from hmm_fasta_viterbi_tpu.ops.pallas_posterior import (
        posterior_coverage_batch_pallas,
    )

    p7 = P7Profile.from_profile(parse_hmm(PROFILES / "1400.hmm"))
    tokens, lengths = random_tokens(batch, seq_len, seed=2)
    cells = batch * seq_len * (p7.model_length - 1)
    _, best, times = best_of(lambda: posterior_coverage_batch_pallas(
        p7, tokens, lengths, hw_fallback=False, lanes=512)[0])
    print(f"posterior B={batch} L={seq_len}: {cells/best/1e9:.2f} GCUPS "
          f"({best*1e3:.1f} ms) reps={[round(t, 4) for t in times]}",
          flush=True)
    # ragged correctness vs the lax.scan decode (exercises BOTH branch
    # variants of the r5 block-gated kernels)
    from hmm_fasta_viterbi_tpu.ops.p7_scan import posterior_coverage_batch_xla

    rl = np.array([256, 1, 97, 200, 13, 256], dtype=np.int32)
    rt = np.random.default_rng(7).integers(0, 20, (6, 256)).astype(np.int32)
    pc, pt = posterior_coverage_batch_pallas(p7, rt, rl, hw_fallback=False)
    wc, wt = posterior_coverage_batch_xla(p7, rt, rl)
    n = min(pc.shape[1], wc.shape[1])
    err = max(np.abs(pc[:, :n] - wc[:, :n]).max(), np.abs(pt - wt).max())
    print(f"  ragged maxerr {err:.3e} (tol 5e-3)", flush=True)


def stage_filter2405(sc, batch=8192, seq_len=3500):
    from hmm_fasta_viterbi_tpu.ops.pallas_msv import prepare_scores_t_filter

    staged = _staged(sc, batch, seq_len)
    p = MSVProfile.from_profile(parse_hmm(PROFILES / "2405.hmm"))
    m_pad = _round_up(p.num_states + 1, 256)
    scores_t = jnp.asarray(prepare_scores_t_filter(p, m_pad)[None])
    tr_consts = jnp.asarray(
        np.array([[p.tr_B_Mk, p.tr_E_C, p.tr_E_J]], dtype=np.float32)
    )
    cells = batch * seq_len * (p.model_length - 1)
    for widest in (256, 512):
        _, best, _ = best_of(lambda: _msv_pallas_padded(
            scores_t, staged.tokens_i8_t, staged.lengths, staged.tr_rows,
            tr_consts, l_chunk=256, interpret=False, exact=False,
            skip_row0_guard=True, widest=widest))
        print(f"filter M=2405 widest={widest}: {cells/best/1e9:.1f} GCUPS "
              f"({best*1e3:.1f} ms)", flush=True)


STAGES = {
    "msv_k60": stage_msv_k60,
    "msv_lanes": stage_msv_lanes,
    "viterbi": stage_viterbi,
    "forward": stage_forward,
    "posterior": stage_posterior,
    "filter2405": stage_filter2405,
}


def main() -> int:
    names = sys.argv[1:] or list(STAGES)
    sc = MSVScanner()
    for n in names:
        print(f"== {n} ==", flush=True)
        STAGES[n](sc)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
