"""Round-5 Viterbi schedule lab: the K=60 emission fold shifted the
exact/lazy Viterbi kernels from MXU-bound to VPU-bound, so the r4
schedule (l_chunk 256, unroll 4 at m_pad>768, 512 lanes) needs a
re-sweep. Also probes a 1024-lane exact-MSV tile (the 512-lane
promotion's headroom check).

    python tools/vit_lab.py sweep      # (l_chunk, unroll) x {lazy, eager}
    python tools/vit_lab.py msv1024    # exact MSV 512 vs 1024 lanes
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax.numpy as jnp  # noqa: E402

from hmm_fasta_viterbi_tpu import MSVProfile, parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile  # noqa: E402
from hmm_fasta_viterbi_tpu.ops import pallas_p7  # noqa: E402
from hmm_fasta_viterbi_tpu.bench.harness import random_tokens  # noqa: E402

PROFILES = REPO / "data" / "profile_HMMs"
B, L = 2048, 3500


def _time(fn, reps=3):
    out = np.asarray(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return out, min(ts)


def stage_sweep():
    p7 = P7Profile.from_profile(parse_hmm(PROFILES / "1400.hmm"))
    tokens, lengths = random_tokens(B, L, seed=0)
    cells = B * L * (p7.model_length - 1)
    msc, isc, trans, chain, consts5, auto_k = (
        pallas_p7.prepare_p7_device_lazy(p7)
    )
    m_pad = msc.shape[0]
    print(f"m_pad={m_pad} auto_k={auto_k}", flush=True)
    packed = pallas_p7.prepare_p7_device(p7, m_pad)
    e_skip = pallas_p7.e_skip_d_ok(p7)
    base_ref = {}
    orig_pick = pallas_p7.pick_p7_unroll
    try:
        for l_chunk in (256, 128):
            tok_t, lens_p, tr_rows, b, l_chunk_eff = (
                pallas_p7._prepare_tokens(tokens, lengths, l_chunk)
            )
            b_pad = tok_t.shape[1]
            neg = jnp.float32(pallas_p7.NEG_INF)

            def inits():
                # fresh buffers per call: p7_pallas_call aliases the
                # carry inputs to outputs (donation), so they cannot be
                # reused across eager invocations
                core0 = jnp.full((m_pad, b_pad), neg, dtype=jnp.float32)
                s0 = jnp.stack([
                    jnp.full((b_pad,), neg, dtype=jnp.float32),
                    jnp.full((b_pad,), neg, dtype=jnp.float32),
                    jnp.zeros((b_pad,), dtype=jnp.float32),
                    jnp.asarray(tr_rows[1]),
                ])
                return core0, s0

            tok_dev = jnp.asarray(tok_t).astype(jnp.int32)
            lens_dev = jnp.asarray(lens_p)
            rows_dev = jnp.asarray(tr_rows)
            for unroll in (2, 4, 8):
                # honor the requested unroll exactly (VMEM willing);
                # p7_pallas_call is NOT jitted at top level, so each
                # call re-traces and the patched pick takes effect
                pallas_p7.pick_p7_unroll = (
                    lambda m, lc, base=8, _u=unroll: _u
                )
                for mode in ("lazy", "eager"):
                    label = f"l_chunk={l_chunk_eff} unroll={unroll} {mode}"
                    try:
                        if mode == "lazy":
                            def run():
                                core0, s0 = inits()
                                return pallas_p7.p7_pallas_call(
                                    jnp.asarray(msc), jnp.asarray(isc),
                                    jnp.asarray(trans), jnp.asarray(chain),
                                    tok_dev, lens_dev, rows_dev,
                                    jnp.asarray(consts5),
                                    core0, core0, core0, s0,
                                    l_chunk=l_chunk_eff, interpret=False,
                                    forward=False, e_skip_d=True,
                                    lazy_k=auto_k,
                                )[0]
                        else:
                            def run():
                                core0, s0 = inits()
                                return pallas_p7.p7_pallas_call(
                                    jnp.asarray(packed[0]),
                                    jnp.asarray(packed[1]),
                                    jnp.asarray(packed[2]),
                                    jnp.asarray(packed[3]),
                                    tok_dev, lens_dev, rows_dev,
                                    jnp.asarray(packed[4]),
                                    core0, core0, core0, s0,
                                    l_chunk=l_chunk_eff, interpret=False,
                                    forward=False, e_skip_d=e_skip,
                                )[0]
                        out, best = _time(run)
                        key = mode
                        if key not in base_ref:
                            base_ref[key] = out
                        eq = bool((out[:b] == base_ref[key][:b]).all())
                        print(f"{label}: {cells/best/1e9:.1f} GCUPS "
                              f"({best*1e3:.1f} ms) bitwise_vs_first={eq}",
                              flush=True)
                    except Exception as e:  # noqa: BLE001
                        print(f"{label}: FAILED {type(e).__name__}: "
                              f"{str(e)[:160]}", flush=True)
    finally:
        pallas_p7.pick_p7_unroll = orig_pick


def stage_msv1024():
    from hmm_fasta_viterbi_tpu.ops.pallas_msv import (
        _msv_pallas_padded, _round_up, prepare_scores_t,
    )
    from hmm_fasta_viterbi_tpu.pipeline import MSVScanner
    from bench import stage_random_device

    sc = MSVScanner()
    batch, seq_len = 16384, 3500
    staged = stage_random_device(sc, batch, seq_len)
    p = MSVProfile.from_profile(parse_hmm(PROFILES / "1400.hmm"))
    scores_t = jnp.asarray(
        prepare_scores_t(p, _round_up(p.num_states, 256))[None]
    )
    tr_consts = jnp.asarray(
        np.array([[p.tr_B_Mk, p.tr_E_C, p.tr_E_J]], dtype=np.float32)
    )
    cells = batch * seq_len * (p.model_length - 1)
    base = None
    for widest in (512, 1024):
        try:
            def run():
                return _msv_pallas_padded(
                    scores_t, staged.tokens_i8_t, staged.lengths,
                    staged.tr_rows, tr_consts, l_chunk=256,
                    interpret=False, widest=widest)
            out, best = _time(run)
            eq = "" if base is None else (
                f" bitwise={bool((out == base).all())}")
            base = out if base is None else base
            print(f"msv exact widest={widest}: {cells/best/1e9:.1f} GCUPS "
                  f"({best*1e3:.1f} ms){eq}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"widest={widest}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


def main() -> int:
    names = sys.argv[1:] or ["sweep", "msv1024"]
    for n in names:
        print(f"== {n} ==", flush=True)
        {"sweep": stage_sweep, "msv1024": stage_msv1024}[n]()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
